"""Naive pure-DataFrame BM25 oracle — the pinned executable reference
semantics (SURVEY.md §5.2 item 3).

The reference's scoring is Lucene's BM25 (default ``IndexSearcher`` similarity
since Lucene 6.0, exercised at ``lucene/cLuceneIndexReader.java:340``):
  idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
  s    = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
with k1=1.2, b=0.75, summed over query terms, conjunctive (all terms MUST
match — the wrapper only ever emits ``Occur.MUST`` clauses,
``cLuceneIndexReader.java:287-301``). Unlike Lucene we use the EXACT document
length instead of the 1-byte-quantized norm (documented deviation, SURVEY.md
§1.4) — the fast path (query.engine) must be rank- and score-identical to
THIS oracle.

Everything here is built-in Catalyst (explode → hash agg → broadcast join →
TakeOrderedAndProject): no UDFs except the shared tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from ..tokenizer import tokenize_text, with_tokens


def query_terms(query: str) -> list[str]:
    """Tokenize a query with the SAME pinned tokenizer as the index side
    (fixing the reference's phrase-mode asymmetry, SURVEY.md §1.3), dedup
    preserving first occurrence."""
    seen: dict[str, None] = {}
    for t in tokenize_text(query):
        seen.setdefault(t)
    return list(seen)


def bm25_score_expr(k1: float = BM25_K1, b: float = BM25_B):
    """BM25 per-(doc,term) contribution as a Catalyst column expression over
    columns tf, df, doclen and literals n_docs/avgdl (joined in beforehand)."""
    idf = F.log1p((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (F.lit(1.0 - b)
                             + F.lit(b) * F.col("doclen") / F.col("avgdl"))
    return idf * tf * F.lit(k1 + 1.0) / norm


def bm25_topk_oracle(docmap: DataFrame, query: str, k: int = 10,
                     mode: str = "and") -> DataFrame:
    """Top-k BM25 over a docmap (doc_id, content, doclen) — naive path.

    mode="and": conjunctive over query terms (reference semantics).
    mode="phrase": additionally require the exact token sequence to occur
    (normalized token stream), reference "whole words" mode
    (``cLuceneIndexReader.java:285-301``); scored like "and" (documented
    deviation from Lucene's phrase-frequency scoring).

    Returns (doc_id, score) ordered by (score desc, doc_id asc), k rows max.
    """
    terms = query_terms(query)
    spark = docmap.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")

    toks = with_tokens(docmap.select("doc_id", "content"), "content")
    corpus_stats = toks.agg(
        F.count("*").alias("n_docs"),
        (F.sum("doclen") / F.count("*")).alias("avgdl"))

    tf = (toks.select("doc_id", "doclen", F.explode("tokens").alias("term"))
          .filter(F.col("term").isin(terms))
          .groupBy("doc_id", "doclen", "term").agg(F.count("*").alias("tf")))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored_terms = (
        tf.join(F.broadcast(df_tbl), "term")
          .crossJoin(F.broadcast(corpus_stats))
          .withColumn("contrib", bm25_score_expr())
    )
    scored = (
        scored_terms.groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"),
             F.count("*").alias("_nt"))
        .filter(F.col("_nt") == len(terms))     # conjunctive MUST semantics
        .select("doc_id", "score")
    )

    if mode == "phrase":
        phrase = " " + " ".join(tokenize_text(query)) + " "
        norm_text = F.concat(F.lit(" "), F.concat_ws(" ", F.col("tokens")),
                             F.lit(" "))
        phrase_docs = toks.filter(norm_text.contains(phrase)).select("doc_id")
        scored = scored.join(phrase_docs, "doc_id")

    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
