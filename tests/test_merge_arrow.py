"""Direct (Spark-free) tests of the Arrow-native merge stage.

The merge generator consumes RecordBatches of RUNS_SCHEMA rows sorted by
(term, range_id, first_docid) and emits POSTINGS_SCHEMA RecordBatches.
These tests drive it with hand-built batches to pin the paths a full
build only hits probabilistically:

- mixed pos_enc validity in ONE batch (positional builds carry null
  positions under the DOCLEN/field sentinels — regression: round 3's
  first Arrow merge treated validity as all-or-nothing and decoded the
  null slots' undefined spans),
- the interleaved-run fixup (docIDs across runs out of order → argsort +
  per-group position permutation),
- the trailing-group carry across batch boundaries.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from luceneindexer_spark.codecs import (positions_decode, positions_encode,
                                        varint_decode, varint_encode_grouped)
from luceneindexer_spark.index.build import (POSTINGS_PA_SCHEMA,
                                             _merge_generator)

RUNS_PA = pa.schema([
    ("term", pa.string()), ("range_id", pa.int64()),
    ("first_docid", pa.int64()), ("n", pa.int32()), ("cf", pa.int64()),
    ("max_tf", pa.int32()), ("docs_enc", pa.binary()),
    ("tfs_enc", pa.binary()), ("pos_enc", pa.binary()),
])


def _run_row(term, range_id, docs, tfs, pos=None):
    """One RUNS row: docs absolute ascending, tfs per doc, pos flat sorted
    positions (len == sum(tfs)) or None."""
    docs = np.asarray(docs, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    gaps = np.empty_like(docs)
    gaps[0] = docs[0]
    gaps[1:] = np.diff(docs)
    d_buf, _ = varint_encode_grouped(gaps, np.array([0]))
    t_buf, _ = varint_encode_grouped(tfs - 1, np.array([0]))
    p_buf = None
    if pos is not None:
        starts = (np.cumsum(tfs) - tfs).astype(np.int64)
        p_buf, _ = positions_encode(np.asarray(pos, dtype=np.int64), starts)
    return {"term": term, "range_id": range_id,
            "first_docid": int(docs[0]), "n": len(docs),
            "cf": int(tfs.sum()), "max_tf": int(tfs.max()),
            "docs_enc": d_buf, "tfs_enc": t_buf, "pos_enc": p_buf}


def _batch(rows):
    return pa.RecordBatch.from_pylist(rows, schema=RUNS_PA)


def _merge(batches):
    out = list(_merge_generator()(iter(batches)))
    assert all(rb.schema.equals(POSTINGS_PA_SCHEMA) for rb in out)
    return pa.Table.from_batches(out).to_pylist()


def _decode_group(row):
    """Reconstruct absolute docIDs + tfs of one postings row from its
    block-encoded form (block leaders carried in block_first)."""
    docs = []
    n_total = sum(row["block_n"])
    for b, (first, nb, off) in enumerate(zip(
            row["block_first"], row["block_n"], row["block_off_d"])):
        end = (row["block_off_d"][b + 1]
               if b + 1 < len(row["block_off_d"]) else len(row["docs_enc"]))
        gaps = varint_decode(row["docs_enc"][off:end], nb - 1)
        docs.extend(np.concatenate(([first], first + np.cumsum(gaps)))
                    if nb > 1 else [first])
    tfs = varint_decode(row["tfs_enc"], n_total).astype(np.int64) + 1
    return np.asarray(docs, dtype=np.int64), tfs


def test_mixed_pos_validity_and_interleaved_fixup():
    # sentinel rows ("" = DOCLEN) carry NO positions; term "a" carries them;
    # term "a" arrives as two runs whose docIDs interleave (0,2 then 1)
    rows = [
        _run_row("", 0, [0, 1, 2], [5, 6, 7]),            # norms, pos=None
        _run_row("a", 0, [0, 2], [1, 2], pos=[4, 1, 3]),  # doc0:[4] doc2:[1,3]
        _run_row("a", 0, [1], [2], pos=[0, 2]),           # doc1:[0,2]
    ]
    out = _merge([_batch(rows)])
    assert [r["term"] for r in out] == ["", "a"]
    norms, a = out
    assert norms["pos_enc"] is None          # validity survives the merge
    docs, tfs = _decode_group(a)
    assert docs.tolist() == [0, 1, 2]        # fixup re-sorted the interleave
    assert tfs.tolist() == [1, 2, 2]
    flat = positions_decode(a["pos_enc"], tfs)
    assert flat.tolist() == [4, 0, 2, 1, 3]  # per-doc slices follow doc order
    ndocs, ntfs = _decode_group(norms)
    assert ndocs.tolist() == [0, 1, 2] and ntfs.tolist() == [5, 6, 7]


def test_trailing_group_carried_across_batches():
    b1 = _batch([_run_row("a", 0, [0], [1]),
                 _run_row("b", 0, [0], [3])])    # "b" is trailing: must wait
    b2 = _batch([_run_row("b", 0, [1], [4])])    # ...for its second run
    out = _merge([b1, b2])
    assert [(r["term"], r["df"]) for r in out] == [("a", 1), ("b", 2)]
    docs, tfs = _decode_group(out[1])
    assert docs.tolist() == [0, 1] and tfs.tolist() == [3, 4]


def test_duplicate_docid_across_runs_raises():
    b = _batch([_run_row("a", 0, [0, 1], [1, 1]),
                _run_row("a", 0, [1], [2])])
    with pytest.raises(ValueError, match="duplicate doc_id"):
        _merge([b])
