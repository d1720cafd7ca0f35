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
_TERM_C = re.compile(TERM_RE)


def tokenize_text(s: str | None) -> list[str]:
    """Pure-Python reference implementation (used in tests as the oracle for
    the vectorized batch path; NOT used in the Spark hot path)."""
    if not s:
        return []
    s = _ACRONYM_C.sub(r"\1 \2", s)
    s = _CAMEL_C.sub(r"\1 \2", s)
    toks = _TERM_C.findall(s.lower())
    return [t for t in toks if t not in _STOP_SET]


_SEP = "\x01"  # never alphanumeric; regex classes can't match across it


def tokenize_flat(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch tokenizer core: one C-level regex pass over ONE joined string.

    Returns (uniq_terms object-array, codes int64, doc_counts int64):
    token i (in document order) is ``uniq_terms[codes[i]]``; document d owns
    the next ``doc_counts[d]`` tokens. Stopwords are dropped via a mask over
    the (tiny) unique-term vocabulary — never over the token stream.

    This shape feeds the posting-run builder directly (it needs exactly the
    factorized stream), so the hot path does regex + factorize ONCE.
    """
    # replacing the separator with a space is tokenization-invariant: both
    # are non-alnum, match neither regex class, and delimit [a-z0-9]+ runs
    docs = ["" if t is None else str(t).replace(_SEP, " ") for t in texts]
    n = len(docs)
    if n == 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    big = _SEP.join(docs)
    big = _ACRONYM_C.sub(r"\1 \2", big)
    big = _CAMEL_C.sub(r"\1 \2", big)
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
