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
from pyspark.sql.types import ArrayType, StringType

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


def tokenize_batch(s: pd.Series) -> pd.Series:
    """Vectorized batch tokenizer: pandas str ops + one numpy stopword mask.

    Returns a Series of lists of str (Arrow array<string>)."""
    base = (
        s.fillna("")
        .str.replace(ACRONYM_RE, r"\1 \2", regex=True)
        .str.replace(CAMEL_RE, r"\1 \2", regex=True)
        .str.lower()
        .str.findall(TERM_RE)
    )
    lists = base.to_numpy()
    if lists.size == 0:
        return base
    counts = np.fromiter((len(x) for x in lists), dtype=np.int64, count=lists.size)
    if counts.sum() == 0:
        return pd.Series([[] for _ in range(lists.size)], index=s.index)
    flat = np.concatenate([np.asarray(x, dtype=object) if len(x) else
                           np.empty(0, dtype=object) for x in lists])
    keep = ~np.isin(flat, _STOP_ARR)
    row_ids = np.repeat(np.arange(counts.size), counts)
    kept_counts = np.bincount(row_ids[keep], minlength=counts.size)
    kept_flat = flat[keep]
    bounds = np.cumsum(kept_counts)[:-1]
    out = np.split(kept_flat, bounds)
    return pd.Series([list(x) for x in out], index=s.index)


@pandas_udf(ArrayType(StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:
    return tokenize_batch(s)


def with_tokens(df, text_col: str, out_col: str = "tokens"):
    """df + tokens column (vectorized Arrow UDF) + doclen column."""
    return (df.withColumn(out_col, tokenize_udf(F.col(text_col)))
              .withColumn("doclen", F.size(F.col(out_col))))


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
