"""Posting-list codecs: vectorized varint (LEB128) + delta encoding + 128-entry
blocks with per-block max-tf metadata.

This is the Spark-native analog of Lucene's block postings format (the
reference exercises it through ``IndexWriter.updateDocument`` at
``LuceneIndexer/src/main/java/LuceneIndexer/lucene/cLuceneIndexWriter.java:115``;
the Lucene50 format delta-encodes docID gaps in packed blocks of 128 with skip
data — public Lucene knowledge, pinned by the reference's pom.xml:159-164).
We keep the semantics (sorted docIDs, gap encoding, per-block max term
frequency for block-max pruning) but choose LEB128 varint bytes stored in
parquet ``binary`` columns, encoded/decoded with vectorized numpy — no per-row
Python in the hot path (BASELINE.json input_hint).

All functions are pure numpy and unit/property-tested (tests/test_codecs.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128

_U7 = np.uint64(7)
_LOW7 = np.uint64(0x7F)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative int64/uint64 values.

    Vectorized: O(max_bytes) numpy passes, no Python per-value loop.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp = tmp >> _U7
    starts = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    total = int(starts[-1] + nbytes[-1])
    out = np.empty(total, dtype=np.uint8)
    max_b = int(nbytes.max())
    for j in range(max_b):
        mask = nbytes > j
        idx = starts[mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)) & _LOW7
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array. Vectorized via reduceat."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (arr & 0x80) == 0
    starts = np.flatnonzero(np.concatenate(([True], is_end[:-1])))
    # position of each byte within its token
    token_len = np.diff(np.append(starts, arr.size))
    pos = np.arange(arr.size, dtype=np.int64) - np.repeat(starts, token_len)
    vals = (arr & 0x7F).astype(np.uint64) << (pos.astype(np.uint64) * _U7)
    out = np.add.reduceat(vals, starts)
    if count is not None and out.size != count:
        raise ValueError(f"decoded {out.size} values, expected {count}")
    return out


def varint_encode_grouped(values: np.ndarray, starts: np.ndarray
                          ) -> tuple[bytes, np.ndarray]:
    """Encode many concatenated groups in ONE vectorized pass.

    ``starts`` are group start indices into ``values`` (ascending, starts[0]==0).
    Returns (buffer, byte_offsets) where group i's bytes are
    ``buffer[byte_offsets[i]:byte_offsets[i+1]]`` (byte_offsets has len(starts)+1).
    Used by the per-partition run builder so posting-run encoding is a single
    numpy pass per Arrow batch instead of a Python loop per term.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    starts = np.asarray(starts, dtype=np.int64)
    if v.size == 0:
        return b"", np.zeros(starts.size + 1, dtype=np.int64)
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp = tmp >> _U7
    byte_starts = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=byte_starts[1:])
    total = int(byte_starts[-1] + nbytes[-1])
    out = np.empty(total, dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        idx = byte_starts[mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)) & _LOW7
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    # byte offset of each group = byte_start of its first value (or total if empty)
    ends = np.append(byte_starts, total)
    offsets = np.empty(starts.size + 1, dtype=np.int64)
    offsets[:-1] = ends[starts]
    offsets[-1] = total
    return out.tobytes(), offsets


def run_encode(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """Encode one per-partition posting RUN (pre-merge intermediate):
    docs = varint([first_abs, gap1, gap2, ...]), tfs = varint(tf-1)."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    gaps = np.empty(doc_ids.size, dtype=np.int64)
    gaps[0] = doc_ids[0]
    gaps[1:] = np.diff(doc_ids)
    return varint_encode(gaps), varint_encode(np.asarray(tfs, np.int64) - 1)


def run_decode(docs_enc: bytes, tfs_enc: bytes, n: int
               ) -> tuple[np.ndarray, np.ndarray]:
    gaps = varint_decode(docs_enc, n).astype(np.int64)
    docs = np.cumsum(gaps)
    tfs = varint_decode(tfs_enc, n).astype(np.int64) + 1
    return docs, tfs


@dataclass
class EncodedPostings:
    """One term's postings for one doc-range, block-compressed.

    Field layout mirrors the parquet schema of the postings table
    (index/build.py POSTINGS_SCHEMA).
    """

    n: int                      # number of postings
    max_tf: int                 # max tf across the whole run
    block_first: np.ndarray     # int64, first docID of each block
    block_last: np.ndarray      # int64, last docID of each block
    block_maxtf: np.ndarray     # int32, max tf within each block
    block_mintf: np.ndarray     # int32, min tf within each block (for norms
    #                             rows this is the block's MIN doclen — the
    #                             metadata-only doclen lower bound block-max
    #                             WAND needs for score upper bounds)
    block_off_d: np.ndarray     # int32, byte offset of each block in docs_enc
    block_off_t: np.ndarray     # int32, byte offset of each block in tfs_enc
    block_n: np.ndarray         # int32, postings per block
    docs_enc: bytes             # concat varint(gap) per block (first stored raw)
    tfs_enc: bytes              # concat varint(tf - 1) per block


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray,
                    block_size: int = BLOCK_SIZE) -> EncodedPostings:
    """Encode a strictly-ascending docID array + parallel tf array into blocks.

    Per block: docIDs are stored as varint gaps from the block's ``first``
    (gap of posting 0 is 0), tfs as varint(tf-1); per-block max-tf recorded
    for block-max WAND pruning (BASELINE.json north_rule).
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        raise ValueError("empty postings run")
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("doc_ids must be strictly ascending")
    if (tfs < 1).any():
        raise ValueError("tfs must be >= 1")

    starts = np.arange(0, n, block_size, dtype=np.int64)
    ends = np.minimum(starts + block_size, n)
    nb = starts.size

    # gaps within blocks: delta to previous docID, block-first stored as gap 0
    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = 0
    gaps[1:] = np.diff(doc_ids)
    gaps[starts] = 0  # block leaders carry no gap (first docID kept in metadata)

    block_first = doc_ids[starts]
    block_last = doc_ids[ends - 1]
    block_n = (ends - starts).astype(np.int32)
    block_maxtf = np.maximum.reduceat(tfs, starts).astype(np.int32)
    block_mintf = np.minimum.reduceat(tfs, starts).astype(np.int32)

    d_chunks: list[bytes] = []
    t_chunks: list[bytes] = []
    off_d = np.zeros(nb, dtype=np.int32)
    off_t = np.zeros(nb, dtype=np.int32)
    pos_d = 0
    pos_t = 0
    for i in range(nb):
        s, e = int(starts[i]), int(ends[i])
        db = varint_encode(gaps[s + 1:e])          # leader's gap omitted
        tb = varint_encode(tfs[s:e] - 1)
        off_d[i] = pos_d
        off_t[i] = pos_t
        pos_d += len(db)
        pos_t += len(tb)
        d_chunks.append(db)
        t_chunks.append(tb)

    return EncodedPostings(
        n=int(n), max_tf=int(tfs.max()),
        block_first=block_first, block_last=block_last,
        block_maxtf=block_maxtf, block_mintf=block_mintf,
        block_off_d=off_d, block_off_t=off_t,
        block_n=block_n, docs_enc=b"".join(d_chunks), tfs_enc=b"".join(t_chunks),
    )


def decode_block(ep: EncodedPostings, i: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single block -> (doc_ids int64, tfs int64). Used for skipping."""
    nb = ep.block_first.size
    bn = int(ep.block_n[i])
    d_end = int(ep.block_off_d[i + 1]) if i + 1 < nb else len(ep.docs_enc)
    t_end = int(ep.block_off_t[i + 1]) if i + 1 < nb else len(ep.tfs_enc)
    gaps = varint_decode(ep.docs_enc[int(ep.block_off_d[i]):d_end], bn - 1)
    docs = np.empty(bn, dtype=np.int64)
    docs[0] = ep.block_first[i]
    if bn > 1:
        np.cumsum(gaps.astype(np.int64), out=docs[1:])
        docs[1:] += ep.block_first[i]
    tfs = varint_decode(ep.tfs_enc[int(ep.block_off_t[i]):t_end], bn).astype(np.int64) + 1
    return docs, tfs


def decode_postings(ep: EncodedPostings) -> tuple[np.ndarray, np.ndarray]:
    """Full decode -> (doc_ids, tfs). Round-trip inverse of encode_postings."""
    parts = [decode_block(ep, i) for i in range(ep.block_first.size)]
    docs = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    return docs, tfs


def positions_decode(pos_enc: bytes, lens: np.ndarray) -> np.ndarray:
    """Decode a flat positions buffer back to absolute token positions.

    The buffer holds, per document (``lens[i]`` values each), the doc's sorted
    token positions delta-encoded (first absolute, then gaps), varint-packed.
    Returns the flat int64 positions array (``lens.sum()`` values); document
    i's positions are the next ``lens[i]`` entries. Fully vectorized:
    cumsum-with-reset via a per-doc base subtraction.
    """
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    vals = varint_decode(pos_enc, total).astype(np.int64)
    if total == 0:
        return vals
    starts = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    nz = lens > 0
    csum = np.cumsum(vals)
    base = np.zeros(lens.size, dtype=np.int64)
    base[nz] = csum[starts[nz]] - vals[starts[nz]]
    return csum - np.repeat(base, lens)


def positions_encode(positions: np.ndarray, starts: np.ndarray
                     ) -> tuple[bytes, np.ndarray]:
    """Delta+varint encode per-doc sorted position lists stored flat.

    ``starts`` are doc start indices into ``positions`` (ascending,
    starts[0] == 0; empty docs not represented — a doc's slice must be
    non-empty). Returns (buffer, byte_offsets) like varint_encode_grouped.
    Inverse of positions_decode given the same per-doc lens.
    """
    positions = np.ascontiguousarray(positions, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    if positions.size == 0:
        return b"", np.zeros(starts.size + 1, dtype=np.int64)
    deltas = np.empty_like(positions)
    deltas[0] = positions[0]
    deltas[1:] = np.diff(positions)
    deltas[starts] = positions[starts]
    return varint_encode_grouped(deltas, starts)


def decode_blocks_overlapping(ep: EncodedPostings, lo: int, hi: int
                              ) -> tuple[np.ndarray, np.ndarray]:
    """Decode only blocks whose [first,last] docID range intersects [lo,hi].

    This is the skip-list analog: block metadata lets the intersection jump
    past blocks that cannot contain candidate docIDs.
    """
    sel = np.flatnonzero((ep.block_last >= lo) & (ep.block_first <= hi))
    if sel.size == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    parts = [decode_block(ep, int(i)) for i in sel]
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]))
