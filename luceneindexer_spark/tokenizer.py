"""Code-aware tokenizer — the engine's term-space definition.

The reference analyzes every field with ``StandardAnalyzer`` configured with an
EMPTY stopword set (writer: ``lucene/cLuceneIndexWriter.java:66``, reader:
``lucene/cLuceneIndexReader.java:336``), i.e. UAX#29 word-break + lowercase.
Per BASELINE.json north_star our tokenizer is additionally *code-aware*:
camelCase/snake_case splitting + a stopword filter, applied symmetrically at
index and query time (the reference's phrase mode skips query-side analysis —
``cLuceneIndexReader.java:291-295`` — an asymmetry we deliberately fix, see
SURVEY.md §1.3).

Pinned specification (any change invalidates golden outputs):
  1. insert a space at acronym boundaries:   ([A-Z]+)([A-Z][a-z])  -> "\\1 \\2"
  2. insert a space at lower/upper boundaries: ([a-z0-9])([A-Z])   -> "\\1 \\2"
  3. lowercase
  4. terms = maximal runs of [a-z0-9]  (underscores/punct split snake_case)
  5. drop stopwords (STOPWORDS below)

The same spec is expressible in ANSI-ish SQL (``duckdb_tokens_cte``) so the
driver's DuckDB oracle can reproduce the term space independently.

Hot path: vectorized pandas str ops + numpy stopword mask — no per-row Python
(BASELINE.json input_hint).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StringType

ACRONYM_RE = r"([A-Z]+)([A-Z][a-z])"
CAMEL_RE = r"([a-z0-9])([A-Z])"
TERM_RE = r"[a-z0-9]+"

# Zero-width equivalents of the two pinned boundary rules. `re.sub` with a
# backreference TEMPLATE ("\1 \2") expands the template in Python PER MATCH
# (re._parser.expand_template — measured as the single largest cost of the
# whole indexing pipeline on camelCase-dense code); a lookaround pattern with
# a constant " " replacement stays entirely in the C matcher. Equivalence
# with the template form is property-tested (test_tokenizer).
ACRONYM_ZW = r"(?<=[A-Z])(?=[A-Z][a-z])"
CAMEL_ZW = r"(?<=[a-z0-9])(?=[A-Z])"

# Pinned minimal English stopword list. The reference uses an empty set; the
# north_star mandates "stopword filter", so we pin a small, documented one.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "as", "at", "by", "be", "this", "that", "with", "from",
)
_STOP_SET = frozenset(STOPWORDS)
_STOP_ARR = np.array(STOPWORDS, dtype=object)

_ACRONYM_C = re.compile(ACRONYM_RE)
_CAMEL_C = re.compile(CAMEL_RE)
_ACRONYM_ZW_C = re.compile(ACRONYM_ZW)
_CAMEL_ZW_C = re.compile(CAMEL_ZW)
_TERM_C = re.compile(TERM_RE)


def tokenize_text(s: str | None) -> list[str]:
    """Pure-Python reference implementation (used in tests as the oracle for
    the vectorized batch path; NOT used in the Spark hot path)."""
    if not s:
        return []
    s = _ACRONYM_ZW_C.sub(" ", s)
    s = _CAMEL_ZW_C.sub(" ", s)
    toks = _TERM_C.findall(s.lower())
    return [t for t in toks if t not in _STOP_SET]


_SEP = "\x01"  # never alphanumeric; regex classes can't match across it


def tokenize_flat(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch tokenizer core — the hot path: one C-level regex pass over ONE
    joined string, then a single factorize.

    Returns (uniq_terms object-array, codes int64, doc_counts int64):
    token i (in document order) is ``uniq_terms[codes[i]]``; document d owns
    the next ``doc_counts[d]`` tokens. Stopwords are dropped via a mask over
    the (tiny) unique-term vocabulary — never over the token stream.

    Used by the pandas-facing surfaces (tokenize_batch / oracle paths).
    The index BUILD instead flows through ``tokenize_flat_arrow`` (byte-
    domain core straight off the Arrow string buffers — no pandas
    conversion, no per-doc Python strings); ``tokenize_flat_np`` is the
    same core fed from Python strings, property-tested identical to this
    regex path.
    """
    # replacing the separator with a space is tokenization-invariant: both
    # are non-alnum, match neither regex class, and delimit [a-z0-9]+ runs
    docs = ["" if t is None else str(t).replace(_SEP, " ") for t in texts]
    n = len(docs)
    if n == 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    big = _SEP.join(docs)
    big = _ACRONYM_ZW_C.sub(" ", big)
    big = _CAMEL_ZW_C.sub(" ", big)
    big = big.lower()
    parts = big.split(_SEP)
    tok_lists = [_TERM_C.findall(p) for p in parts]
    counts = np.fromiter((len(x) for x in tok_lists), np.int64, n)
    total = int(counts.sum())
    if total == 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
                counts)
    flat = np.empty(total, dtype=object)
    pos = 0
    for x in tok_lists:
        flat[pos:pos + len(x)] = x
        pos += len(x)
    codes, uniq = pd.factorize(flat, sort=False)
    stop_mask = np.isin(uniq, _STOP_ARR)
    if stop_mask.any():
        keep = ~stop_mask[codes]
        row_ids = np.repeat(np.arange(n), counts)
        counts = np.bincount(row_ids[keep], minlength=n).astype(np.int64)
        codes = codes[keep]
        # re-factorize to drop stopword entries from the vocabulary
        kept_terms = uniq[~stop_mask]
        remap = np.full(uniq.size, -1, dtype=np.int64)
        remap[np.flatnonzero(~stop_mask)] = np.arange(kept_terms.size)
        codes = remap[codes]
        uniq = kept_terms
    return np.asarray(uniq, dtype=object), codes, counts


# ---------------------------------------------------------------------------
# numpy byte-domain tokenizer (alternative implementation)
# ---------------------------------------------------------------------------
# The regex path allocates one Python str per token — allocator/memory
# traffic becomes the bottleneck at corpus scale. This path stays entirely
# in numpy uint8/uint64 arrays: boundary masks replace the two regex
# substitutions, token identity comes from a 2x64-bit segment rolling hash
# (wraparound-mod-2^64 polynomial, invertible odd base) grouped by a typed
# lexsort, and Python strings are materialized only for the UNIQUE
# vocabulary (one slice per distinct term). ``tokenize_flat_arrow`` feeds
# this core zero-copy from Arrow buffers — the index build's default path.

_B1 = np.uint64(0x9E3779B97F4A7C15)   # odd → invertible mod 2^64
_B2 = np.uint64(0xC2B2AE3D27D4EB4F)
_B1_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))
_B2_INV = np.uint64(pow(0xC2B2AE3D27D4EB4F, -1, 1 << 64))

# Byte-classification LUTs. _CLS bits: 1=upper, 2=lower, 4=digit.
_CLS_LUT = np.zeros(256, dtype=np.uint8)
_CLS_LUT[65:91] = 1
_CLS_LUT[97:123] = 2
_CLS_LUT[48:58] = 4
_LOW_LUT = np.arange(256, dtype=np.uint8)
_LOW_LUT[65:91] += 32  # ASCII lowercase fold


class _Arena:
    """Per-worker-process grow-only scratch memory.

    WHY THIS EXISTS: this host (and any busy multi-tenant box) serializes
    page-fault handling across processes — a fresh multi-MB numpy allocation
    per batch costs far more than the compute on it, and 32 concurrent
    faulting workers queue behind the handler, inverting scaling. Reusing
    grow-only buffers keeps every kernel pass on warm, already-faulted pages
    (measured: warm pages ~6 GB/s during the same host phase where a fresh
    50 MB allocation took seconds). Power tables are pure constants of the
    hash bases — cached, they turn _seg_hash's two full+accumulate passes
    per call into slices.

    Single-threaded use only (one Python worker = one task at a time);
    callers must not return views of scratch buffers.
    """
    __slots__ = ("bufs", "pows")

    def __init__(self) -> None:
        self.bufs: dict = {}
        self.pows: dict = {}

    def buf(self, name: str, n: int, dtype) -> np.ndarray:
        b = self.bufs.get(name)
        if b is None or b.size < n or b.dtype != np.dtype(dtype):
            b = np.empty(max(int(n * 5 // 4) + 64, 1 << 12), dtype=dtype)
            self.bufs[name] = b
        return b[:n]

    def powers(self, base: np.uint64, n: int) -> np.ndarray:
        """p[i] = base^i mod 2^64 for i < n (grow-only cache)."""
        p = self.pows.get(int(base))
        if p is None or p.size < n:
            size = max(int(n * 5 // 4) + 64, 1 << 12)
            p = np.empty(size, dtype=np.uint64)
            p[0] = np.uint64(1)
            with np.errstate(over="ignore"):
                np.multiply.accumulate(
                    np.full(size - 1, base, dtype=np.uint64), out=p[1:])
            self.pows[int(base)] = p
        return p


_ARENA = _Arena()


def _seg_hash(c: np.ndarray, starts: np.ndarray, ends: np.ndarray,
              base: np.uint64, base_inv: np.uint64,
              arena: _Arena | None = None, tag: str = "") -> np.ndarray:
    """Polynomial hash of each [start, end) segment of byte array c, all
    arithmetic wrapping mod 2^64. hash(s,e) = Σ c[j]·B^(e-1-j), computed as
    (S[e-1] − S[s-1])·P[e-1] with P[i]=B^i prefix products and
    S[i]=Σ c[j]·B^{-j} (exact closed form verified by the property tests —
    position-invariant: equal byte segments hash equal anywhere in c).

    With an arena, the B^i / B^-i tables come from the grow-only cache and
    the weighted prefix sum runs in a reused buffer — zero fresh multi-MB
    allocations per call (see _Arena docstring)."""
    n = c.size
    arena = arena if arena is not None else _Arena()
    with np.errstate(over="ignore"):
        pinv = arena.powers(base_inv, n)
        p = arena.powers(base, n)
        s = arena.buf("segsum" + tag, n, np.uint64)
        np.multiply(c, pinv[:n], out=s, casting="unsafe")
        np.add.accumulate(s, out=s)
        hi = s[ends - 1]
        lo = np.where(starts > 0, s[starts - 1], np.uint64(0))
        return (hi - lo) * p[ends - 1]


def tokenize_flat_np(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch tokenizer core — numpy byte-domain implementation.

    Semantics identical to ``tokenize_flat`` (property-tested): acronym +
    camelCase boundary split, lowercase, [a-z0-9]+ terms, stopword filter.
    Zero per-token Python objects; see tokenize_flat's docstring for when to
    prefer which.
    """
    docs = ["" if t is None else str(t).replace(_SEP, " ") for t in texts]
    n = len(docs)
    if n == 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    big = _SEP.join(docs).encode("utf-8")
    return _tokenize_sep_bytes(np.frombuffer(big, dtype=np.uint8), n)


def tokenize_flat_arrow(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch tokenizer over a pyarrow String/LargeString array, ZERO-COPY on
    the document bytes: the Arrow value buffer is scattered once into a
    separator-delimited uint8 stream (0x01 between docs; in-content 0x01
    mapped to space — tokenization-invariant) and handed to the byte-domain
    core. No per-doc Python strings, no pandas conversion — the memory-
    traffic-minimal path for mapInArrow build stages."""
    import pyarrow as pa
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset:arr.offset + n + 1].astype(np.int64)
    data_buf = arr.buffers()[2]
    data = (np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None
            else np.empty(0, dtype=np.uint8))
    lens = np.diff(offsets)
    if arr.null_count != 0:
        # the Arrow spec allows non-empty UNDEFINED byte extents under null
        # slots (e.g. arrays from take/filter kernels): mask them out via
        # the validity bitmap so they are never copied
        valid = np.asarray(arr.is_valid())
        lens = np.where(valid, lens, 0)
    total = int(lens.sum())
    # per-doc slice memcpy into a reused stream buffer (n is cache-sized —
    # a short Python loop of memcpys beats building total-sized int64
    # scatter-index arrays, and the arena keeps the pages warm)
    out = _ARENA.buf("stream", total + n, np.uint8)
    doc_off = np.cumsum(lens) - lens + np.arange(n, dtype=np.int64)
    for d in range(n):
        ln = lens[d]
        if ln:
            o, s0 = doc_off[d], offsets[d]
            out[o:o + ln] = data[s0:s0 + ln]
    # in-content 0x01 → space (tokenization-invariant), then separators
    eq = _ARENA.buf("stream_eq", total + n, np.uint8)
    np.equal(out, 1, out=eq, casting="unsafe")
    out[eq.view(bool)] = 32
    out[doc_off + lens] = 1
    return _tokenize_sep_bytes(out, n)


def _tokenize_sep_bytes(b: np.ndarray, n: int
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Byte-domain tokenizer core over a \\x01-separated utf-8 stream of
    ``n`` documents (n-1 or n separators — trailing separator harmless).

    Every full-stream pass writes into the per-process _ARENA (warm reused
    pages — see _Arena) and token byte-segments are hashed IN PLACE in the
    original stream (a token is a contiguous alnum run, so no compaction /
    position-remap pass is needed). Returned arrays never alias scratch.
    """
    empty = (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
             np.zeros(n, dtype=np.int64))
    if b.size == 0:
        return empty

    m = b.size
    A = _ARENA
    cls = A.buf("cls", m, np.uint8)
    np.take(_CLS_LUT, b, out=cls)          # 1=upper, 2=lower, 4=digit

    # boundary[i] == True → split between i and i+1 (both alnum):
    #   acronym rule ([A-Z]+)([A-Z][a-z]): upper[i] & upper[i+1] & lower[i+2]
    #   camel rule ([a-z0-9])([A-Z]):      (lower|digit)[i] & upper[i+1]
    # masks are uint8 0/1 in scratch; slices stand in for shifted copies
    t = A.buf("t", m, np.uint8)
    boundary = A.buf("boundary", m, np.uint8)
    boundary[-1:] = 0
    if m >= 2:
        np.bitwise_and(cls[:-1], 6, out=t[:-1])        # lower|digit at i
        np.minimum(t[:-1], 1, out=t[:-1])
        np.bitwise_and(t[:-1], cls[1:], out=boundary[:-1])  # & upper(i+1)
    if m >= 3:
        acr = A.buf("acr", m, np.uint8)
        np.bitwise_and(cls[:-2], 1, out=acr[:-2])           # upper at i
        np.bitwise_and(acr[:-2], cls[1:-1], out=acr[:-2])   # & upper at i+1
        np.right_shift(cls[2:], 1, out=t[:-2])
        np.bitwise_and(t[:-2], 1, out=t[:-2])               # lower at i+2
        np.bitwise_and(acr[:-2], t[:-2], out=acr[:-2])
        np.bitwise_or(boundary[:-2], acr[:-2], out=boundary[:-2])

    alnum = A.buf("alnum", m, np.uint8)
    np.minimum(cls, 1, out=alnum)                            # alnum = cls>0

    # token starts: alnum & (not prev_alnum | prev_boundary)
    start_m = A.buf("start_m", m, np.uint8)
    start_m[0:1] = alnum[0:1]
    if m >= 2:
        np.subtract(1, alnum[:-1], out=t[1:])                # ~prev_alnum
        np.bitwise_or(t[1:], boundary[:-1], out=t[1:])
        np.bitwise_and(alnum[1:], t[1:], out=start_m[1:])
    starts_pos = np.flatnonzero(start_m)
    if starts_pos.size == 0:
        return empty
    # token ends: alnum & (not next_alnum | boundary)
    end_m = A.buf("end_m", m, np.uint8)
    end_m[-1:] = alnum[-1:]
    if m >= 2:
        np.subtract(1, alnum[1:], out=t[:-1])                # ~next_alnum
        np.bitwise_or(t[:-1], boundary[:-1], out=t[:-1])
        np.bitwise_and(alnum[:-1], t[:-1], out=end_m[:-1])
    ends_pos = np.flatnonzero(end_m) + 1  # exclusive

    # lowercase fold (single LUT gather); hash token segments directly in
    # the original stream — token bytes are contiguous alnum runs, and the
    # rolling hash is position-invariant (see _seg_hash)
    c_low = A.buf("c_low", m, np.uint8)
    np.take(_LOW_LUT, b, out=c_low)

    h1 = _seg_hash(c_low, starts_pos, ends_pos, _B1, _B1_INV, A, "1")
    h2 = _seg_hash(c_low, starts_pos, ends_pos, _B2, _B2_INV, A, "2")
    lens = (ends_pos - starts_pos).astype(np.uint64)
    # group identical (h1, h2, len) keys via a TYPE-SPECIALIZED lexsort —
    # np.unique on a structured dtype falls back to a generic-comparator
    # argsort that is ~10x slower on multi-million-token batches
    order = np.lexsort((lens, h2, h1))
    k1, k2, k3 = h1[order], h2[order], lens[order]
    newg = np.empty(order.size, dtype=bool)
    newg[0] = True
    newg[1:] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1]) | (k3[1:] != k3[:-1])
    gid_sorted = np.cumsum(newg) - 1
    codes = np.empty(order.size, dtype=np.int64)
    codes[order] = gid_sorted
    first_idx = order[np.flatnonzero(newg)]

    # materialize ONLY the unique terms (vocab-sized Python work)
    uniq = np.empty(first_idx.size, dtype=object)
    for j, i in enumerate(first_idx):
        s0, e0 = int(starts_pos[i]), int(ends_pos[i])
        uniq[j] = c_low[s0:e0].tobytes().decode("ascii")

    # doc assignment via separator positions
    np.equal(b, 1, out=t, casting="unsafe")
    sep_pos = np.flatnonzero(t)
    doc_of_tok = np.searchsorted(sep_pos, starts_pos)
    counts = np.bincount(doc_of_tok, minlength=n).astype(np.int64)

    # stopword filter over the vocabulary
    stop_mask = np.isin(uniq, _STOP_ARR)
    if stop_mask.any():
        keep = ~stop_mask[codes]
        counts = np.bincount(doc_of_tok[keep], minlength=n).astype(np.int64)
        codes = codes[keep]
        kept_terms = uniq[~stop_mask]
        remap = np.full(uniq.size, -1, dtype=np.int64)
        remap[np.flatnonzero(~stop_mask)] = np.arange(kept_terms.size)
        codes = remap[codes]
        uniq = kept_terms
    return uniq, codes, counts


def tokenize_batch(s: pd.Series) -> pd.Series:
    """Vectorized batch tokenizer returning a Series of lists of str
    (Arrow array<string>). Built on tokenize_flat."""
    if len(s) == 0:
        return pd.Series([], index=s.index, dtype=object)
    uniq, codes, counts = tokenize_flat(s.to_numpy())
    toks = uniq[codes] if codes.size else np.empty(0, dtype=object)
    bounds = np.cumsum(counts)[:-1]
    return pd.Series([list(x) for x in np.split(toks, bounds)], index=s.index)


def doclen_batch(s: pd.Series) -> pd.Series:
    """Token count per document WITHOUT materializing/transferring the token
    arrays (the docmap build needs only doclen — shipping array<string> back
    through Arrow just to take its size would dominate the stage)."""
    _, _, counts = tokenize_flat(s.to_numpy())
    return pd.Series(counts, index=s.index)


@pandas_udf(ArrayType(StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:
    return tokenize_batch(s)


@pandas_udf(IntegerType())
def doclen_udf(s: pd.Series) -> pd.Series:
    return doclen_batch(s).astype("int32")


def with_tokens(df, text_col: str, out_col: str = "tokens"):
    """df + tokens column (vectorized Arrow UDF) + doclen column."""
    return (df.withColumn(out_col, tokenize_udf(F.col(text_col)))
              .withColumn("doclen", F.size(F.col(out_col))))


def with_doclen(df, text_col: str):
    """df + doclen only — no token-array Arrow transfer (docmap hot path)."""
    return df.withColumn("doclen", doclen_udf(F.col(text_col)))


def _sql_quote(t: str) -> str:
    return "'" + t.replace("'", "''") + "'"


def duckdb_tokens_pos_cte(table: str, doc_id_col: str, text_col: str) -> str:
    """Like duckdb_tokens_cte but emitting (doc_id, term, pos) where pos is
    the 0-based index in the STOPWORD-FILTERED token stream — the same
    position space the positional index stores (index.build._runs_generator
    numbers tokens after tokenize_flat's stopword drop). Stopwords are
    filtered from the LIST before subscripting so positions stay dense."""
    stop = ", ".join(_sql_quote(t) for t in STOPWORDS)
    return f"""
    SELECT {doc_id_col} AS doc_id, unnest(toks) AS term,
           generate_subscripts(toks, 1) - 1 AS pos
    FROM (
      SELECT {doc_id_col},
             list_filter(regexp_extract_all(
               lower(regexp_replace(regexp_replace({text_col},
                     '{ACRONYM_RE}', '\\1 \\2', 'g'),
                     '{CAMEL_RE}', '\\1 \\2', 'g')),
               '{TERM_RE}'), t -> t <> '' AND t NOT IN ({stop})) AS toks
      FROM {table}
    )
    """


def duckdb_tokens_cte(table: str, doc_id_col: str, text_col: str) -> str:
    """A DuckDB SQL fragment producing (doc_id, term) rows under the SAME
    pinned tokenizer spec — used by __spark_entry__.oracle_sql so the driver's
    independent DuckDB run reproduces our term space."""
    stop = ", ".join(_sql_quote(t) for t in STOPWORDS)
    return f"""
    SELECT {doc_id_col} AS doc_id, t AS term
    FROM (
      SELECT {doc_id_col},
             unnest(regexp_extract_all(
               lower(regexp_replace(regexp_replace({text_col},
                     '{ACRONYM_RE}', '\\1 \\2', 'g'),
                     '{CAMEL_RE}', '\\1 \\2', 'g')),
               '{TERM_RE}')) AS t
      FROM {table}
    )
    WHERE t <> '' AND t NOT IN ({stop})
    """
