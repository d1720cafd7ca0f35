import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from luceneindexer_spark.codecs import (
    BLOCK_SIZE,
    decode_block,
    decode_blocks_overlapping,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**21, 2**42, 2**63 - 1], dtype=np.uint64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varint_roundtrip_property(values):
    vals = np.array(values, dtype=np.uint64)
    assert (varint_decode(varint_encode(vals), len(values)) == vals).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
             max_size=1000, unique=True),
    st.data(),
)
def test_postings_roundtrip_property(doc_ids, data):
    docs = np.array(sorted(doc_ids), dtype=np.int64)
    tfs = np.array(
        data.draw(st.lists(st.integers(1, 10_000), min_size=len(docs),
                           max_size=len(docs))),
        dtype=np.int64,
    )
    ep = encode_postings(docs, tfs)
    d, t = decode_postings(ep)
    assert (d == docs).all()
    assert (t == tfs).all()
    assert ep.n == len(docs)
    assert ep.max_tf == tfs.max()


def test_block_metadata():
    n = 1000
    docs = np.arange(0, 5 * n, 5, dtype=np.int64)
    tfs = (np.arange(n, dtype=np.int64) % 37) + 1
    ep = encode_postings(docs, tfs)
    nb = ep.block_first.size
    assert nb == -(-n // BLOCK_SIZE)
    for i in range(nb):
        bd, bt = decode_block(ep, i)
        s = i * BLOCK_SIZE
        e = min(s + BLOCK_SIZE, n)
        assert (bd == docs[s:e]).all()
        assert (bt == tfs[s:e]).all()
        assert ep.block_maxtf[i] == tfs[s:e].max()
        assert ep.block_first[i] == docs[s]
        assert ep.block_last[i] == docs[e - 1]


def test_block_skipping_decode():
    docs = np.arange(0, 10_000, 2, dtype=np.int64)
    tfs = np.ones(docs.size, dtype=np.int64)
    ep = encode_postings(docs, tfs)
    lo, hi = 4000, 4500
    d, _ = decode_blocks_overlapping(ep, lo, hi)
    # superset of the true range, subset of full list
    want = docs[(docs >= lo) & (docs <= hi)]
    assert np.isin(want, d).all()
    assert d.size < docs.size
    d2, _ = decode_blocks_overlapping(ep, 10**9, 2 * 10**9)
    assert d2.size == 0


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 1], dtype=np.int64), np.array([1, 1]))
    with pytest.raises(ValueError):
        encode_postings(np.array([1, 2], dtype=np.int64), np.array([0, 1]))
    with pytest.raises(ValueError):
        encode_postings(np.array([], dtype=np.int64), np.array([], dtype=np.int64))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.integers(0, 1 << 20), min_size=1, max_size=30,
                         unique=True),
                min_size=1, max_size=20))
def test_positions_roundtrip_property(doc_positions):
    """positions_encode/decode round-trips arbitrary per-doc sorted
    position lists (the per-doc delta reset is the tricky part)."""
    from luceneindexer_spark.codecs import positions_decode, positions_encode
    doc_positions = [sorted(p) for p in doc_positions]
    lens = np.array([len(p) for p in doc_positions], dtype=np.int64)
    flat = np.array([x for p in doc_positions for x in p], dtype=np.int64)
    starts = np.cumsum(lens) - lens
    buf, _offs = positions_encode(flat, starts)
    out = positions_decode(buf, lens)
    assert np.array_equal(out, flat)
