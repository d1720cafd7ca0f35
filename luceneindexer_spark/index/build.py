"""Inverted-index build: per-partition sorted posting runs → salted
repartition-by-term shuffle → block-compressed global postings (incl.
per-doc-length postings under the DOCLEN_TERM sentinel — the norms
store) + stats, resumable via the checkpoint manifest.

Reference parity: this replaces the Lucene index build the wrapper drives at
``lucene/cLuceneIndexWriter.java:80-125`` (analyze → in-memory segment →
flush → background merge). The Spark shape (SURVEY.md §3.1):

    docmap (stored-fields row store, dense deterministic doc_id)
      → tokenize (vectorized Arrow batches, tokenizer.tokenize_batch)
      → per-partition (term, range) runs, delta+varint encoded   [mapInArrow]
      → repartition(P, term, range_id)   ← the salted repartition-by-term
      → sortWithinPartitions(term, range_id, first_docid)
      → merge runs → 128-posting blocks w/ per-block max-tf      [mapInArrow]
      → write parquet partitionBy(bucket), per-wave dirs + manifest rows

Skew handling (BASELINE.json north_rule): the shuffle key is
(term, range_id) where range_id = doc_id // range_size is a doc-space shard.
A hot term (>50% of docs) therefore spreads over n_ranges reducers instead of
one, and any single group is structurally bounded by range_size postings —
the salt is data-independent, so no second balancing pass is needed. The
doc-partitioned layout is also what makes query fan-out embarrassingly
parallel (query.engine scores per range then takes a global top-k).

Resumability: the unit is the doc-id range. Ranges are statically assigned to
waves (wave = range // ranges_per_wave); a wave's output dirs are
deterministic, written with mode=overwrite, and its manifest rows are appended
only after the write succeeds — so a kill at any point either loses an
unrecorded wave (rebuilt identically, overwritten) or nothing. Restart
rebuilds only waves with pending ranges and re-tokenizes only those ranges'
docs (predicate pushdown on the doc_id-sorted docmap parquet).
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codecs import (BLOCK_SIZE, positions_decode, positions_encode,
                      varint_decode, varint_encode_grouped)
from ..corpus import build_docmap
from ..tokenizer import tokenize_flat_arrow
from . import manifest as mf

RUNS_SCHEMA = (
    "term string, range_id long, first_docid long, n int, cf long, "
    "max_tf int, docs_enc binary, tfs_enc binary, pos_enc binary"
)

POSTINGS_SCHEMA = (
    "term string, range_id long, df long, cf long, max_tf int, "
    "block_first array<long>, block_last array<long>, block_maxtf array<int>, "
    "block_mintf array<int>, "
    "block_n array<int>, block_off_d array<int>, block_off_t array<int>, "
    "docs_enc binary, tfs_enc binary, pos_enc binary"
)

#: pyarrow twin of POSTINGS_SCHEMA — the merge stage emits RecordBatches
#: directly (mapInArrow), so the batch schema must match field-for-field
POSTINGS_PA_SCHEMA = pa.schema([
    ("term", pa.string()), ("range_id", pa.int64()), ("df", pa.int64()),
    ("cf", pa.int64()), ("max_tf", pa.int32()),
    ("block_first", pa.list_(pa.int64())), ("block_last", pa.list_(pa.int64())),
    ("block_maxtf", pa.list_(pa.int32())), ("block_mintf", pa.list_(pa.int32())),
    ("block_n", pa.list_(pa.int32())), ("block_off_d", pa.list_(pa.int32())),
    ("block_off_t", pa.list_(pa.int32())),
    ("docs_enc", pa.binary()), ("tfs_enc", pa.binary()),
    ("pos_enc", pa.binary()),
])


def _bin_view(arr: "pa.Array") -> tuple[np.ndarray, memoryview]:
    """(byte_offsets, data) views of a Binary/LargeBinary Arrow array chunk —
    zero-copy; offsets honor ``arr.offset`` so sliced arrays work. Safe under
    nulls too: Arrow requires the offsets vector to stay monotonic, so null
    slots are well-defined (skippable) spans — callers mask them out."""
    dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=dt)[
        arr.offset:arr.offset + len(arr) + 1]
    buf = arr.buffers()[2]
    return (off.astype(np.int64, copy=False),
            memoryview(buf) if buf is not None else memoryview(b""))


@dataclass
class IndexPaths:
    root: str

    @property
    def docmap(self): return os.path.join(self.root, "docmap")
    @property
    def postings(self): return os.path.join(self.root, "postings")
    @property
    def term_stats(self): return os.path.join(self.root, "term_stats")
    @property
    def corpus_stats(self): return os.path.join(self.root, "corpus_stats")

    def wave_dir(self, base: str, wave: int) -> str:
        return os.path.join(base, f"wave={wave}")


class BuildInterrupted(RuntimeError):
    """Raised by the _stop_after_waves test hook to simulate a killed job."""


# ---------------------------------------------------------------------------
# stage UDFs (all Arrow-batched; no per-posting Python)
# ---------------------------------------------------------------------------

#: sentinel "term" whose postings carry per-doc token counts (tf == doclen).
#: The tokenizer can never emit an empty string, so "" is collision-free.
#: This is the norms store (Lucene's per-doc norms, SURVEY §1.4) expressed
#: as just another posting list — built, merged, compressed, and queried
#: through the identical pipeline, so the corpus is tokenized exactly ONCE.
DOCLEN_TERM = ""

#: Metadata fields are fulltext fields too (reference parity: the wrapper
#: tokenizes and indexes ALL document fields — ``cLuceneIndexWriter.java:
#: 102-113`` ``new Field(tag, value, TextField.TYPE_STORED)`` — and its
#: parsed mode runs analyzed per-field clauses, ``cLuceneIndexReader.java:
#: 320-338``). A field column's tokens are namespaced ``<field>:<token>``
#: and its per-doc token counts ride under the ``<field>:`` sentinel (the
#: field's norms), all through the SAME runs→merge→blocks pipeline. ":"
#: never occurs in a tokenizer term, so the namespace is collision-free.


def field_sentinel(field: str) -> str:
    """Norms sentinel of a metadata field ("" = the content field)."""
    return "" if field in ("", "content") else f"{field}:"


def _build_run_columns(doc_ids: np.ndarray, uniq: np.ndarray,
                       codes: np.ndarray, lens: np.ndarray,
                       range_size: int, positions: bool,
                       sentinel: str = DOCLEN_TERM) -> dict | None:
    """Shared core of the run builders: tokenized batch → RUNS_SCHEMA
    columns (main term runs + ``sentinel`` norms runs appended — DOCLEN_TERM
    for content, ``<field>:`` for a metadata field), as plain python/numpy
    values. Returns None for an empty batch."""
    if codes.size == 0:
        return None
    doc_rep = np.repeat(doc_ids, lens)

    order = np.lexsort((doc_rep, codes))
    c = codes[order]
    d = doc_rep[order]
    newg = np.empty(c.size, dtype=bool)
    newg[0] = True
    newg[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
    g_start = np.flatnonzero(newg)
    tfs = np.diff(np.append(g_start, c.size)).astype(np.int64)
    g_code = c[g_start]
    g_doc = d[g_start]

    rg = g_doc // range_size
    runb = np.empty(g_code.size, dtype=bool)
    runb[0] = True
    runb[1:] = (g_code[1:] != g_code[:-1]) | (rg[1:] != rg[:-1])
    run_start = np.flatnonzero(runb)

    gaps = np.empty_like(g_doc)
    gaps[0] = g_doc[0]
    gaps[1:] = np.diff(g_doc)
    gaps[run_start] = g_doc[run_start]

    d_buf, d_off = varint_encode_grouped(gaps, run_start)
    t_buf, t_off = varint_encode_grouped(tfs - 1, run_start)
    run_n = np.diff(np.append(run_start, g_code.size)).astype(np.int32)
    run_cf = np.add.reduceat(tfs, run_start)
    run_maxtf = np.maximum.reduceat(tfs, run_start).astype(np.int32)

    d_mv = memoryview(d_buf)
    t_mv = memoryview(t_buf)
    n_runs = run_start.size

    if positions:
        # token position within its doc, in the sorted domain: the lexsort
        # is stable, so tokens of one (term, doc) group keep their original
        # in-doc order → per-group positions ascending
        doc_tok_start = np.cumsum(lens) - lens
        pos_in_doc = (np.arange(codes.size, dtype=np.int64)
                      - np.repeat(doc_tok_start, lens))
        pos_sorted = pos_in_doc[order]
        # delta-reset at every (term, doc) GROUP start; run r's bytes are
        # its groups' contiguous slice of the shared buffer
        p_buf, p_off = positions_encode(pos_sorted, g_start)
        p_mv = memoryview(p_buf)
        run_bounds = np.append(p_off[run_start], p_off[-1])
        pos_col = [bytes(p_mv[run_bounds[i]:run_bounds[i + 1]])
                   for i in range(n_runs)]
    else:
        pos_col = [None] * n_runs

    # DOCLEN_TERM runs: docs with >=1 token, tf = doclen
    nz = np.flatnonzero(lens > 0)
    order2 = np.argsort(doc_ids[nz], kind="stable")
    sd = doc_ids[nz][order2]
    sl = lens[nz][order2]
    srg = sd // range_size
    sstart = np.flatnonzero(
        np.concatenate(([True], srg[1:] != srg[:-1])))
    sgaps = np.empty_like(sd)
    sgaps[0] = sd[0]
    sgaps[1:] = np.diff(sd)
    sgaps[sstart] = sd[sstart]
    sd_buf, sd_off = varint_encode_grouped(sgaps, sstart)
    sl_buf, sl_off = varint_encode_grouped(sl - 1, sstart)
    sd_mv = memoryview(sd_buf)
    sl_mv = memoryview(sl_buf)
    sn = np.diff(np.append(sstart, sd.size)).astype(np.int32)

    return {
        "term": (list(uniq[g_code[run_start]])
                 + [sentinel] * sstart.size),
        "range_id": np.concatenate([rg[run_start], srg[sstart]]),
        "first_docid": np.concatenate([g_doc[run_start], sd[sstart]]),
        "n": np.concatenate([run_n, sn]),
        "cf": np.concatenate([run_cf, np.add.reduceat(sl, sstart)]),
        "max_tf": np.concatenate(
            [run_maxtf, np.maximum.reduceat(sl, sstart).astype(np.int32)]),
        "docs_enc": ([bytes(d_mv[d_off[i]:d_off[i + 1]])
                      for i in range(n_runs)]
                     + [bytes(sd_mv[sd_off[i]:sd_off[i + 1]])
                        for i in range(sstart.size)]),
        "tfs_enc": ([bytes(t_mv[t_off[i]:t_off[i + 1]])
                     for i in range(n_runs)]
                    + [bytes(sl_mv[sl_off[i]:sl_off[i + 1]])
                       for i in range(sstart.size)]),
        "pos_enc": pos_col + [None] * sstart.size,
    }


def _runs_generator_arrow(range_size: int, positions: bool = False,
                          field_cols: tuple[str, ...] = ()):
    """mapInArrow tokenize→runs stage: consumes pyarrow RecordBatches and
    tokenizes STRAIGHT from the Arrow string buffers (tokenize_flat_arrow) —
    no pandas conversion, no per-doc Python strings, no big-string join.
    This is the memory-traffic-minimal build path (the dominant stage's
    working set is what a bandwidth-bound 32-way node pays for). With
    ``positions=True`` each run row additionally carries the per-(doc, term)
    token positions (delta+varint, codecs.positions_encode) emitted from the
    SAME tokenize pass — the corpus is tokenized exactly once either way.

    ``field_cols``: metadata columns (batch columns 2..) indexed as
    namespaced fulltext fields — tokens ``<field>:<tok>``, per-field doclen
    sentinel ``<field>:``, per-field position space (phrase-capable). Each
    field's tokens flow through the same run builder, so one batch yields
    one concatenated run frame for all fields."""
    import pyarrow as pa

    def gen(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            doc_ids = rb.column(0).to_numpy(zero_copy_only=False)
            doc_ids = np.asarray(doc_ids, dtype=np.int64)
            frames = []
            for ci, field in enumerate(("content",) + tuple(field_cols)):
                uniq, codes, lens = tokenize_flat_arrow(rb.column(ci + 1))
                if field != "content" and uniq.size:
                    # namespace the (vocab-sized) unique terms only
                    pref = field + ":"
                    uniq = np.array([pref + t for t in uniq], dtype=object)
                cols = _build_run_columns(
                    doc_ids, uniq, codes, lens, range_size, positions,
                    sentinel=field_sentinel(field))
                if cols is not None:
                    frames.append(cols)
            if not frames:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(sum((list(c["term"]) for c in frames), []),
                             type=pa.string()),
                    pa.array(np.concatenate(
                        [c["range_id"] for c in frames]), type=pa.int64()),
                    pa.array(np.concatenate(
                        [c["first_docid"] for c in frames]),
                        type=pa.int64()),
                    pa.array(np.concatenate(
                        [c["n"] for c in frames]), type=pa.int32()),
                    pa.array(np.concatenate(
                        [c["cf"] for c in frames]), type=pa.int64()),
                    pa.array(np.concatenate(
                        [c["max_tf"] for c in frames]), type=pa.int32()),
                    pa.array(sum((list(c["docs_enc"]) for c in frames), []),
                             type=pa.binary()),
                    pa.array(sum((list(c["tfs_enc"]) for c in frames), []),
                             type=pa.binary()),
                    pa.array(sum((list(c["pos_enc"]) for c in frames), []),
                             type=pa.binary()),
                ],
                names=["term", "range_id", "first_docid", "n", "cf",
                       "max_tf", "docs_enc", "tfs_enc", "pos_enc"])

    return gen


BLOCK = BLOCK_SIZE  # output postings block size (shared with codecs)


def _merge_rows_vec(tbl: "pa.Table") -> "pa.RecordBatch":
    """Merge a batch of COMPLETE (term, range_id) run groups into one
    block-encoded postings row per group — fully vectorized across groups,
    Arrow in / Arrow out (no pandas materialization on either side).

    This is the memory-traffic-minimal merge the 4N-core scaling target
    needs: the run buffers are read straight out of the Arrow binary
    column's data buffer (already contiguous — no ``b"".join`` copy), ONE
    varint decode covers every run in the batch (varints are
    self-delimiting), one global cumsum-with-reset rebuilds absolute docIDs,
    one reduceat family computes all per-block metadata, and ONE grouped
    varint encode emits all output blocks. Output rows are assembled as
    Arrow arrays from shared buffers + offset vectors — zero per-group
    Python, zero per-group object allocation (the round-2 version looped
    over groups building Python lists/bytes, ~10 ops per group; at corpus
    scale a merge partition holds millions of (term, range) groups).

    Runs arrive sorted by (term, range_id, first_docid); concatenated docIDs
    of one group are therefore ascending in the common case (tokenize tasks
    cover contiguous doc intervals). The rare interleaved group is fixed up
    in place with an argsort (positions decoded/permuted only for that
    group); duplicate docIDs raise.
    """
    term_arr = tbl.column("term").chunk(0)
    rids = tbl.column("range_id").to_numpy()
    ns = tbl.column("n").to_numpy().astype(np.int64, copy=False)
    denc = tbl.column("docs_enc").chunk(0)
    tenc = tbl.column("tfs_enc").chunk(0)
    penc = tbl.column("pos_enc").chunk(0)
    nrows = tbl.num_rows
    total = int(ns.sum())
    d_off, d_data = _bin_view(denc)
    t_off, t_data = _bin_view(tenc)
    has_pos = penc.null_count < nrows
    # positional builds mix validity per TERM KIND (regular terms carry
    # positions, DOCLEN/field sentinels don't) — a group is one term, so
    # validity is uniform within a group; check its first run like the
    # per-row ``is not None`` this replaces
    pvalid = (penc.is_valid().to_numpy(zero_copy_only=False)
              if 0 < penc.null_count < nrows else None)
    if has_pos:
        p_off, p_data = _bin_view(penc)

    # ---- decode every run in one pass ----
    gaps = varint_decode(d_data[d_off[0]:d_off[-1]], total).astype(np.int64)
    tfs = varint_decode(t_data[t_off[0]:t_off[-1]], total).astype(np.int64) + 1
    run_starts = np.zeros(nrows, dtype=np.int64)
    np.cumsum(ns[:-1], out=run_starts[1:])
    c = np.cumsum(gaps)
    base = c[run_starts] - gaps[run_starts]
    docs = c - np.repeat(base, ns)

    # ---- group boundaries (term, range_id) over runs ----
    newg = np.empty(nrows, dtype=bool)
    newg[0] = True
    if nrows > 1:
        newg[1:] = (pc.not_equal(term_arr.slice(1), term_arr.slice(0, nrows - 1))
                    .to_numpy(zero_copy_only=False)
                    | (rids[1:] != rids[:-1]))
    g_first_run = np.flatnonzero(newg)
    ngroups = g_first_run.size
    g_nruns = np.diff(np.append(g_first_run, nrows))
    gp_starts = run_starts[g_first_run]               # posting-span starts
    gp_ends = np.append(gp_starts[1:], total)
    gn = gp_ends - gp_starts                          # postings per group

    # ---- fix the rare interleaved group in place ----
    pos_override: dict[int, bytes] = {}
    if total > 1:
        viol = np.flatnonzero(np.diff(docs) <= 0) + 1
        at_gstart = gp_starts[
            np.searchsorted(gp_starts, viol, side="right") - 1] == viol
        viol = viol[~at_gstart]
    else:
        viol = np.empty(0, dtype=np.int64)
    if viol.size:
        for g in np.unique(np.searchsorted(gp_starts, viol, "right") - 1):
            s, e = int(gp_starts[g]), int(gp_ends[g])
            dg, tg = docs[s:e], tfs[s:e]
            order = np.argsort(dg, kind="stable")
            if dg.size > 1 and not (np.diff(dg[order]) > 0).all():
                raise ValueError(
                    "duplicate doc_id across runs for one term+range")
            r0, r1 = int(g_first_run[g]), int(g_first_run[g] + g_nruns[g])
            if has_pos and (pvalid is None or pvalid[r0]):
                # decode the group's flat positions, permute per-doc slices
                # into merged doc order, re-encode (index arithmetic only)
                flat = np.concatenate([
                    positions_decode(bytes(p_data[p_off[r]:p_off[r + 1]]),
                                     tfs[run_starts[r]:run_starts[r] + ns[r]])
                    for r in range(r0, r1)])
                offs = np.cumsum(tg) - tg
                new_lens = tg[order]
                starts_new = np.cumsum(new_lens) - new_lens
                idx = (np.arange(flat.size, dtype=np.int64)
                       - np.repeat(starts_new, new_lens)
                       + np.repeat(offs[order], new_lens))
                pos_override[int(g)] = positions_encode(
                    flat[idx], starts_new)[0]
            docs[s:e] = dg[order]
            tfs[s:e] = tg[order]

    # ---- block layout across ALL groups at once ----
    nb_g = (gn + BLOCK - 1) // BLOCK
    tot_blocks = int(nb_g.sum())
    blk_g0 = np.cumsum(nb_g) - nb_g                   # first block of group
    within = (np.arange(tot_blocks, dtype=np.int64)
              - np.repeat(blk_g0, nb_g))
    bstarts = np.repeat(gp_starts, nb_g) + within * BLOCK
    bends = np.minimum(bstarts + BLOCK, np.repeat(gp_ends, nb_g))
    block_first = docs[bstarts]
    block_last = docs[bends - 1]
    # group spans are contiguous, so consecutive bstarts delimit each block:
    # reduceat over bstarts covers exactly [bstarts[i], bstarts[i+1])
    block_maxtf = np.maximum.reduceat(tfs, bstarts).astype(np.int32)
    block_mintf = np.minimum.reduceat(tfs, bstarts).astype(np.int32)
    block_n = (bends - bstarts).astype(np.int32)

    # ---- one grouped varint encode for every output block ----
    out_gaps = np.empty(total, dtype=np.int64)
    out_gaps[0] = 0
    np.subtract(docs[1:], docs[:-1], out=out_gaps[1:])
    out_gaps[bstarts] = 0                             # block leaders omitted
    keep = np.ones(total, dtype=bool)
    keep[bstarts] = False
    kept_before = np.cumsum(keep) - keep
    od_buf, od_offs = varint_encode_grouped(out_gaps[keep],
                                            kept_before[bstarts])
    ot_buf, ot_offs = varint_encode_grouped(tfs - 1, bstarts)

    # ---- per-group aggregates ----
    g_cf = np.add.reduceat(tfs, gp_starts).astype(np.int64, copy=False)
    g_maxtf = np.maximum.reduceat(tfs, gp_starts).astype(np.int32)

    # ---- assemble output arrays (offset vectors over shared buffers) ----
    blk_bounds = np.append(blk_g0, tot_blocks)
    blk_offs32 = pa.array(blk_bounds.astype(np.int32), pa.int32())

    def _blist(vals: np.ndarray, typ) -> pa.ListArray:
        return pa.ListArray.from_arrays(blk_offs32, pa.array(vals, typ))

    def _bin_out(offs: np.ndarray, data, valid: np.ndarray | None = None
                 ) -> pa.Array:
        """Binary array over one shared data buffer: per-group byte spans.
        (bytes full-range slices return the original object; memoryview
        slices are zero-copy — no buffer duplication either way). ``valid``
        marks null groups; their spans stay in the offsets vector (Arrow
        requires monotonic offsets even under nulls) but readers skip them."""
        base = int(offs[0])
        vbuf = (None if valid is None else
                pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()))
        return pa.Array.from_buffers(pa.binary(), ngroups, [
            vbuf,
            pa.py_buffer((offs - base).astype(np.int32).tobytes()),
            pa.py_buffer(data[base:int(offs[-1])])],
            null_count=0 if valid is None else int(ngroups - valid.sum()))

    off_d_vals = (od_offs[:-1] - np.repeat(od_offs[blk_g0], nb_g)
                  ).astype(np.int32)
    off_t_vals = (ot_offs[:-1] - np.repeat(ot_offs[blk_g0], nb_g)
                  ).astype(np.int32)

    if not has_pos:
        pos_out = pa.nulls(ngroups, pa.binary())
    elif not pos_override:
        # a group's runs are consecutive rows, so its merged positions are
        # ONE contiguous byte span of the input buffer — offsets taken at
        # group boundaries, no join, no copy
        pos_out = _bin_out(
            p_off[np.append(g_first_run, nrows)], p_data,
            valid=None if pvalid is None else pvalid[g_first_run])
    else:
        pe_l = []
        for g in range(ngroups):
            ov = pos_override.get(g)
            r0 = int(g_first_run[g])
            if ov is not None:
                pe_l.append(ov)
            elif pvalid is not None and not pvalid[r0]:
                pe_l.append(None)
            else:
                pe_l.append(bytes(
                    p_data[p_off[r0]:p_off[r0 + int(g_nruns[g])]]))
        pos_out = pa.array(pe_l, pa.binary())

    term_out = pc.take(term_arr, pa.array(g_first_run, pa.int64()))
    if term_out.type != pa.string():
        term_out = term_out.cast(pa.string())
    return pa.RecordBatch.from_arrays([
        term_out,
        pa.array(rids[g_first_run], pa.int64()),
        pa.array(gn.astype(np.int64, copy=False), pa.int64()),
        pa.array(g_cf, pa.int64()),
        pa.array(g_maxtf, pa.int32()),
        _blist(block_first, pa.int64()), _blist(block_last, pa.int64()),
        _blist(block_maxtf, pa.int32()), _blist(block_mintf, pa.int32()),
        _blist(block_n, pa.int32()),
        _blist(off_d_vals, pa.int32()), _blist(off_t_vals, pa.int32()),
        _bin_out(od_offs[blk_bounds], od_buf),
        _bin_out(ot_offs[blk_bounds], ot_buf),
        pos_out,
    ], schema=POSTINGS_PA_SCHEMA)


def _merge_generator():
    """mapInArrow fn over run rows sorted by (term, range_id, first_docid)
    within each shuffle partition; carries the trailing (possibly incomplete)
    group across Arrow batch boundaries (zero-copy table slices) and hands
    complete-group tables to the vectorized merger (_merge_rows_vec)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pending: pa.Table | None = None
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if pending is not None and pending.num_rows:
                tbl = pa.concat_tables([pending, tbl])
                pending = None
            tbl = tbl.combine_chunks()
            n = tbl.num_rows
            if n == 0:
                continue
            terms = tbl.column("term").chunk(0)
            rids = tbl.column("range_id").to_numpy()
            newg = np.empty(n, dtype=bool)
            newg[0] = True
            if n > 1:
                newg[1:] = (pc.not_equal(terms.slice(1),
                                         terms.slice(0, n - 1))
                            .to_numpy(zero_copy_only=False)
                            | (rids[1:] != rids[:-1]))
            boundaries = np.flatnonzero(newg)
            if boundaries.size == 1:
                pending = tbl  # single (possibly incomplete) group
                continue
            last_start = int(boundaries[-1])
            pending = tbl.slice(last_start)
            yield _merge_rows_vec(tbl.slice(0, last_start))
        if pending is not None and pending.num_rows:
            yield _merge_rows_vec(pending.combine_chunks())

    return gen


# ---------------------------------------------------------------------------
# build driver
# ---------------------------------------------------------------------------

def compute_snapshot(docmap: DataFrame) -> str:
    """Deterministic input-snapshot id: doc count + xor-ish hash of all
    content sha256 values (order-insensitive)."""
    r = docmap.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("content_sha256")).alias("h")).collect()[0]
    return f"n{r['n']}-h{(r['h'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"


def _corpus_profile(docmap: DataFrame) -> dict:
    """ONE aggregation job for everything the build needs from the docmap:
    snapshot hash, doc count, max doc_id. (avgdl comes from the DOCLEN_TERM
    postings at stats time — the docmap is never tokenized.)"""
    r = docmap.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("content_sha256")).alias("h"),
        F.max("doc_id").alias("mx")).collect()[0]
    n = int(r["n"])
    return {
        "snapshot": f"n{n}-h{(r['h'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}",
        "n_docs": n,
        "max_id": int(r["mx"]) if r["mx"] is not None else -1,
    }


def auto_range_size(max_id: int) -> int:
    """Scale-aware default for docs-per-range: the power of two in
    [2^10, 2^16] giving ~128 ranges. A pure function of the docmap's max
    doc id ONLY — not of the build's parallelism — so a killed build
    resumed at any partition count recomputes the identical value and the
    checkpoint manifest's per-range lineage stays valid."""
    target = max(1, (max_id + 1) // 128)
    return 1 << max(10, min(16, (target - 1).bit_length()))


def build_index(
    spark: SparkSession,
    corpus: DataFrame | None,
    out_dir: str,
    *,
    n_buckets: int = 8,
    range_size: int | None = None,
    waves: int = 1,
    positions: bool = False,
    field_cols: tuple[str, ...] = (),
    merge_partitions: int | None = None,
    docmap_partitions: int | None = None,
    arrow_batch_rows: int | None = 128,
    scan_parallelism: int | None = None,
    wave_tag: str = "",
    resume: bool = True,
    _stop_after_waves: int | None = None,
) -> dict:
    """Build (or resume) the full index at out_dir. Returns a report dict.

    corpus may be None on resume if the docmap was already written.

    range_size (docs per posting range — the unit of scorer parallelism,
    resume granularity, and compaction) defaults to a SCALE-AWARE choice:
    the power of two in [2^10, 2^16] giving ~128 ranges, so a default
    build always has enough ranges to occupy a cluster at query time (a
    fixed 2^16 default left a 200k-doc index with 4 ranges — a 4-task
    ceiling on every scorer cogroup regardless of executor count) while a
    10^12-doc corpus still caps at 2^16 docs/range (~15M ranges, metadata
    control-plane sized). The planned geometry (range_size, n_buckets,
    positions, fields) is persisted to a ``_plan.json`` sidecar before
    wave 0: a resume with range_size=None reuses the PERSISTED value (not
    the recomputed default — a checkpoint planned under a different
    default or an explicit --range-size the user omits on resume would
    otherwise silently mix geometries), and an explicit mismatch errors.
    Pass an explicit range_size to pin it on a fresh build.

    scan_parallelism targets EXACTLY that many tokenize-scan splits (it also
    sets spark.sql.files.minPartitionNum, without which Spark silently floors
    the split count at defaultParallelism). Used by bench.py to throttle the
    tokenize stage honestly when evidencing N-vs-4N scaling; leave None in
    production (default: >= 2x merge_partitions splits for load balancing).
    """
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    sc = spark.sparkContext
    merge_partitions = merge_partitions or sc.defaultParallelism
    report: dict = {"waves_built": 0, "ranges_built": 0, "resumed": False}

    # ---- stage 0: docmap (stored-fields row store) ----
    t0 = time.time()
    if resume and os.path.exists(os.path.join(paths.docmap, "_SUCCESS")):
        docmap = spark.read.parquet(paths.docmap)
        report["resumed"] = True
    else:
        if corpus is None:
            raise ValueError("no docmap on disk and no corpus given")
        docmap = build_docmap(
            corpus, partitions=docmap_partitions or sc.defaultParallelism,
            write_path=paths.docmap)
    prof = _corpus_profile(docmap)
    snapshot = prof["snapshot"]
    n_docs = prof["n_docs"]
    max_id = prof["max_id"]
    report["n_docs"] = n_docs
    report["snapshot"] = snapshot
    report["docmap_s"] = time.time() - t0

    # ---- plan ranges and waves ----
    # Geometry sidecar (ADVICE r4): manifest completion rows key on
    # (stage, snapshot) with no range-size component, so a resume planned
    # under a different geometry would silently mix geometries. The planned
    # values are persisted before wave 0; a resume with range_size=None
    # prefers the persisted value over the auto default (covering checkpoints
    # from eras with a different default), and an explicit mismatch on any
    # layout-determining knob (range_size, n_buckets, positions, fields)
    # errors instead of corrupting.
    plan = mf.read_plan(out_dir) if resume else None
    if plan is not None:
        if range_size is None:
            range_size = int(plan["range_size"])
        for knob, val in (("range_size", range_size),
                          ("n_buckets", n_buckets),
                          ("positions", positions),
                          ("fields", list(field_cols))):
            if knob in plan and plan[knob] != val:
                raise ValueError(
                    f"resume geometry mismatch: this index was planned with "
                    f"{knob}={plan[knob]!r} but the resume specifies "
                    f"{val!r}; pass the planned value (or resume=False to "
                    f"rebuild from scratch)")
    if range_size is None:
        range_size = auto_range_size(max_id)
    if plan is None or plan.get("snapshot") != snapshot:
        mf.write_plan(out_dir, {
            "range_size": range_size, "n_buckets": n_buckets,
            "positions": positions, "fields": list(field_cols),
            "snapshot": snapshot, "planned_at": mf.now_iso()})
    report["range_size"] = range_size
    # from MAX doc_id, not the row count: incremental appends start new docs
    # at the next range boundary, leaving id gaps (streaming.incremental)
    n_ranges = max(1, math.ceil((max_id + 1) / range_size))
    ranges_per_wave = max(1, math.ceil(n_ranges / max(1, waves)))
    n_waves = math.ceil(n_ranges / ranges_per_wave)
    done = mf.completed_partitions(spark, out_dir, "postings", snapshot)
    pending_by_wave: dict[int, list[int]] = {}
    for r in range(n_ranges):
        if r not in done:
            pending_by_wave.setdefault(r // ranges_per_wave, []).append(r)
    attempt = mf.max_attempt(spark, out_dir, "postings") + 1
    report["n_ranges"] = n_ranges
    report["pending_ranges"] = sum(len(v) for v in pending_by_wave.values())

    rng_col = (F.col("doc_id") / F.lit(range_size)).cast("long")

    # ---- per-wave build ----
    waves_done = 0
    timings: dict[str, float] = {}
    report["timings"] = timings

    def _mark(name: str, t: float) -> None:
        timings[name] = timings.get(name, 0.0) + (time.time() - t)

    # The tokenize stage reads the docmap parquet DIRECTLY: the docmap was
    # written doc_id-sorted with ~one file per writer partition, so sizing
    # the file splits (maxPartitionBytes below any single file, openCost 0)
    # yields >= merge_partitions contiguous-doc-interval tasks WITHOUT the
    # repartitionByRange this stage previously paid — that was a full
    # shuffle of every content byte plus a boundary-sampling pass over the
    # table, eliminated entirely. Falls back to repartitionByRange when the
    # docmap has too few files (e.g. a foreign docmap on resume); the merge
    # handles interleaved runs either way.
    import glob as _glob
    dm_files = _glob.glob(os.path.join(paths.docmap, "*.parquet"))
    n_files = len(dm_files)
    scan_split = n_files >= max(2, merge_partitions // 2)
    conf = spark.conf
    saved = {k: conf.get(k) for k in (
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes",
        "spark.sql.files.minPartitionNum",
        "spark.sql.execution.arrow.maxRecordsPerBatch")}
    if scan_split:
        sizes = sorted(os.path.getsize(f) for f in dm_files)
        data_bytes = sum(sizes)
        if scan_parallelism:
            # exact, BALANCED split-count target (bench throttling).
            # Spark's split planner slices files into pieces of
            # maxSplitBytes = min(maxPartitionBytes, max(openCost,
            # bytes/minPartitionNum)) and greedily bins the pieces, so two
            # things go wrong with a naive "dir_bytes / P" setting: (a)
            # minPartitionNum defaults to defaultParallelism, whose
            # bytes/minPartitionNum term silently wins the min() and the
            # scan runs defaultParallelism-wide; (b) with one docmap file
            # per target split, any file a few bytes over the average is
            # sliced in two and the spill piece becomes a (P+1)-th split —
            # a full extra task WAVE at throttled parallelism (measured:
            # +40% core time at 8-way from a 9th straggler split).
            # minPartitionNum=1 hands control to maxPartitionBytes alone;
            # capacity = max(biggest file, data/P) * 1.02 packs the
            # near-equal major files one-per-bin (build_docmap's
            # maxRecordsPerFile guarantees them) into P balanced splits;
            # row-remainder tail files land in small extra bins whose tasks
            # are negligible second-wave work, never a half-file straggler.
            cap = max(sizes[-1],
                      math.ceil(data_bytes / scan_parallelism))
            conf.set("spark.sql.files.maxPartitionBytes",
                     str(int(cap * 1.02) + 1))
            conf.set("spark.sql.files.minPartitionNum", "1")
        else:
            conf.set("spark.sql.files.maxPartitionBytes",
                     str(max(1 << 20, data_bytes // (2 * merge_partitions))))
        conf.set("spark.sql.files.openCostInBytes", "0")
    if arrow_batch_rows:
        # bound each worker's tokenize batch so the working set (~12x the
        # batch's text bytes in mask/hash intermediates) stays CACHE-sized,
        # not merely arena-sized: a measured sweep (round 3, warm fast-phase
        # host, 50k 3KB docs) halved 8-way core time and cut 32-way from
        # 7.4s to ~3.0s going 2048 -> 128 rows (plateau 96-192; per-batch
        # fixed costs take over below ~64). Intermediates that fit a core's
        # L2/L3 slice stop competing for DRAM bandwidth — the same property
        # that keeps executor memory flat at 10^12-file scale regardless of
        # document size
        conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                 str(arrow_batch_rows))
    try:
        for w in sorted(pending_by_wave):
            wave_ranges = pending_by_wave[w]
            tw = time.time()
            lo = min(wave_ranges) * range_size
            hi = (max(wave_ranges) + 1) * range_size
            sub = (docmap
                   .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
                   .filter(rng_col.isin(wave_ranges)))

            tok_in = sub.select("doc_id", "content", *field_cols)
            if not scan_split:
                tok_in = tok_in.repartitionByRange(merge_partitions, "doc_id")
            if "scan_partitions" not in report:
                report["scan_partitions"] = tok_in.rdd.getNumPartitions()
            # Arrow-native tokenize stage: record batches flow JVM -> Python
            # and back WITHOUT a pandas materialization, and the tokenizer
            # reads the Arrow string buffers directly (tokenize_flat_arrow)
            runs = tok_in.mapInArrow(
                _runs_generator_arrow(range_size, positions, field_cols),
                RUNS_SCHEMA)
            merged = (runs
                      .repartition(merge_partitions, "term", "range_id")
                      .sortWithinPartitions("term", "range_id", "first_docid")
                      .mapInArrow(_merge_generator(), POSTINGS_SCHEMA)
                      .withColumn("bucket",
                                  F.pmod(F.xxhash64("term"),
                                         F.lit(n_buckets)).cast("int")))
            wave_post_dir = paths.wave_dir(paths.postings,
                                           f"{wave_tag}{w}")
            # Write via ONE extra shuffle of the (compact, already-encoded)
            # postings, hashed on bucket, term-sorted within each task:
            # exactly n_buckets term-sorted files per wave instead of
            # merge_tasks x n_buckets concurrent dynamic-partition writers.
            # Measured (this host, 50k docs, par32): dynamic partitionBy
            # write 2.2 s fast-phase / 13.5 s slow-phase vs 0.4 s / 1.6 s
            # for this plan — writer buffers for hundreds of open files are
            # exactly the allocation pattern the VM's serialized page-fault
            # handler punishes, and hundreds of tiny files per wave is the
            # wrong layout at 10^12-file scale anyway (manifest bloat, open
            # costs, unsorted row groups defeating term min/max pruning).
            # Size n_buckets >= cluster write parallelism at real scale.
            (merged
             .repartition(merge_partitions, "bucket")
             .sortWithinPartitions("bucket", "term", "range_id")
             .write.mode("overwrite").partitionBy("bucket")
             .parquet(wave_post_dir))
            _mark("postings_write", tw)

            # per-range manifest stats: postings counts from ONE pass over the
            # (tiny) written wave; doc counts from the docmap slice (counts EVERY
            # doc in the range, including empty/all-stopword docs — the A7
            # progress-counter semantics; DOCLEN_TERM df would count only
            # tokenized docs)
            tm = time.time()
            written = spark.read.parquet(wave_post_dir)
            stats_rows = (written.filter(F.col("term") != DOCLEN_TERM)
                          .groupBy("range_id").agg(F.sum("df").alias("np"))
                          .collect())
            post_stats = {int(r["range_id"]): int(r["np"]) for r in stats_rows}
            doc_stats = {int(r["rid"]): int(r["nd"]) for r in
                         (sub.groupBy(rng_col.alias("rid"))
                          .agg(F.count("*").alias("nd")).collect())}
            wave_bytes = mf.dir_bytes(wave_post_dir)
            wall = time.time() - tw
            mf.append_rows(spark, out_dir, [{
                "stage": "postings", "partition_id": r, "wave": w,
                "input_snapshot": snapshot,
                "n_docs": doc_stats.get(r, 0),
                "n_postings": post_stats.get(r, 0),
                "bytes": wave_bytes // max(1, len(wave_ranges)),
                "wall_time_s": wall / max(1, len(wave_ranges)),
                "status": mf.STATUS_COMPLETE, "attempt": attempt,
                "finished_at": mf.now_iso(),
            } for r in wave_ranges])
            _mark("manifest", tm)
            waves_done += 1
            report["waves_built"] = waves_done
            report["ranges_built"] += len(wave_ranges)
            if _stop_after_waves is not None and waves_done >= _stop_after_waves:
                raise BuildInterrupted(
                    f"test hook: stopped after {waves_done} wave(s)")
    finally:
        for key, v in saved.items():
            conf.set(key, v) if v is not None else conf.unset(key)

    # ---- global stats + publish ----
    t1 = time.time()
    postings_all = spark.read.option("basePath", paths.postings).parquet(
        paths.postings)
    # one pass: per-term stats (DOCLEN_TERM excluded) + total token count
    # (the DOCLEN_TERM rows' cf = Σ doclen) for avgdl
    stats_df = (postings_all.groupBy("term")
                .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"),
                     F.max("max_tf").alias("max_tf"))
                .persist())
    (stats_df.filter(F.col("term") != DOCLEN_TERM)
     .coalesce(min(merge_partitions, 8))
     .write.mode("overwrite").parquet(paths.term_stats))
    dl_row = stats_df.filter(F.col("term") == DOCLEN_TERM).collect()
    total_tokens = int(dl_row[0]["cf"]) if dl_row else 0
    stats_df.unpersist()
    avgdl = (total_tokens / n_docs) if n_docs else 0.0

    mf.write_local_parquet(paths.corpus_stats, {
        "n_docs": [n_docs], "avgdl": [avgdl],
        "range_size": [range_size], "n_buckets": [n_buckets],
        "n_ranges": [n_ranges], "snapshot": [snapshot],
        "positions": [positions], "n_waves": [n_waves],
        "fields": [",".join(field_cols)]},
        schema="n_docs long, avgdl double, range_size long, n_buckets int, "
               "n_ranges int, snapshot string, positions boolean, "
               "n_waves int, fields string")
    report["stats_s"] = time.time() - t1

    mf.publish(out_dir, {
        "snapshot": snapshot, "n_docs": n_docs, "n_ranges": n_ranges,
        "n_buckets": n_buckets, "range_size": range_size,
        "positions": positions, "published_at": mf.now_iso(),
    })
    report["total_s"] = time.time() - t0
    return report
