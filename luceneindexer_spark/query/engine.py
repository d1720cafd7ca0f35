"""Query engine over the compressed inverted index — the fast path.

Reference parity: search entry point ``lucene/cLuceneIndexReader.java:272-397``
(conjunctive BooleanQuery of MUST clauses → Lucene doc-at-a-time posting
intersection with skip lists → BM25 → TopDocs). Spark shape (SURVEY.md §3.2):

  tokenize query (driver, same pinned tokenizer)
    → prune postings scan to the query terms' buckets (partition pruning)
      and terms (parquet predicate pushdown)
    → cogroup with norms by range_id → per-range vectorized intersection:
      rarest-term-first (explicit conjunction ordering, SURVEY.md §4.1),
      block metadata skips blocks outside the candidate docID window
      (the skip-list analog), per-block max-tf bounds available for
      score-upper-bound pruning → exact BM25 (k1=1.2 b=0.75, fp64,
      term-sorted accumulation for determinism) → per-range top-k
    → global TakeOrderedAndProject: orderBy(score desc, doc_id asc).limit(k)
    → optional hydrate: broadcast-join the k rows back to the docmap
      (stored-fields analog of ``searcher.doc(id)``, R:352-359).

Unlike the reference (k = Integer.MAX_VALUE at R:340 — collects ALL hits),
this is a real top-k with a deterministic tie-break.

Scale: postings are doc-range-partitioned, so query fan-out is one small
shuffle of only the query terms' rows, each range scored independently —
no single node ever sees a whole hot-term posting list.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from ..codecs import EncodedPostings, decode_blocks_overlapping, decode_postings
from ..index.build import DOCLEN_TERM, IndexPaths
from .oracle import query_terms


@dataclass
class IndexMeta:
    n_docs: int
    avgdl: float
    range_size: int
    n_buckets: int
    n_ranges: int
    snapshot: str
    positions: bool


def load_meta(spark: SparkSession, root: str) -> IndexMeta:
    r = spark.read.parquet(IndexPaths(root).corpus_stats).collect()[0]
    return IndexMeta(
        n_docs=r["n_docs"], avgdl=float(r["avgdl"]),
        range_size=int(r["range_size"]), n_buckets=int(r["n_buckets"]),
        n_ranges=int(r["n_ranges"]), snapshot=r["snapshot"],
        positions=bool(r["positions"]))


def _buckets_of(terms: list[str], n_buckets: int,
                spark: SparkSession) -> dict[str, int]:
    # must match F.pmod(F.xxhash64(term), n_buckets) used at build time;
    # computed via one tiny local DataFrame to reuse the JVM hash exactly
    rows = (spark.createDataFrame([(t,) for t in terms], "term string")
            .select("term", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
                    .cast("int").alias("b")).collect())
    return {r["term"]: int(r["b"]) for r in rows}


def _ep_from_row(row) -> EncodedPostings:
    return EncodedPostings(
        n=int(row.df), max_tf=int(row.max_tf),
        block_first=np.asarray(row.block_first, dtype=np.int64),
        block_last=np.asarray(row.block_last, dtype=np.int64),
        block_maxtf=np.asarray(row.block_maxtf, dtype=np.int32),
        block_off_d=np.asarray(row.block_off_d, dtype=np.int32),
        block_off_t=np.asarray(row.block_off_t, dtype=np.int32),
        block_n=np.asarray(row.block_n, dtype=np.int32),
        docs_enc=bytes(row.docs_enc), tfs_enc=bytes(row.tfs_enc),
    )


def _idf(n_docs: int, df: int) -> float:
    return float(np.log1p((n_docs - df + 0.5) / (df + 0.5)))


def _make_range_scorer(terms_by_rarity: list[str], idf_by_term: dict[str, float],
                       avgdl: float, k: int, k1: float = BM25_K1,
                       b: float = BM25_B):
    """cogroup-applyInPandas fn: one (range_id) group of postings rows +
    the range's DOCLEN_TERM postings row (norms) → local top-k
    (doc_id, score)."""
    score_order = sorted(terms_by_rarity)  # deterministic accumulation order

    def score_range(_key, post_pdf: pd.DataFrame, norms_pdf: pd.DataFrame
                    ) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "score": pd.Series(dtype=np.float64)})
        if len(norms_pdf) == 0 or len(post_pdf) == 0:
            return empty
        by_term = {r.term: _ep_from_row(r) for r in post_pdf.itertuples()}
        if any(t not in by_term for t in terms_by_rarity):
            return empty  # conjunctive MUST: every term must exist in range

        # rarest-first intersection with block skipping
        cand, tf0 = decode_postings(by_term[terms_by_rarity[0]])
        tfs_by_term: dict[str, np.ndarray] = {terms_by_rarity[0]: tf0}
        for t in terms_by_rarity[1:]:
            if cand.size == 0:
                return empty
            d2, t2 = decode_blocks_overlapping(
                by_term[t], int(cand[0]), int(cand[-1]))
            cand_new, i1, i2 = np.intersect1d(
                cand, d2, assume_unique=True, return_indices=True)
            if cand_new.size == 0:
                return empty
            for prev, arr in tfs_by_term.items():
                tfs_by_term[prev] = arr[i1]
            tfs_by_term[t] = t2[i2]
            cand = cand_new

        # doclens come from the DOCLEN_TERM posting list (tf == doclen);
        # only blocks overlapping the candidate window are decoded
        nep = _ep_from_row(next(norms_pdf.itertuples()))
        nd, ntf = decode_blocks_overlapping(nep, int(cand[0]), int(cand[-1]))
        dl = ntf[np.searchsorted(nd, cand)].astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(cand.size, dtype=np.float64)
        for t in score_order:
            tf = tfs_by_term[t].astype(np.float64)
            score += idf_by_term[t] * tf * (k1 + 1.0) / (tf + norm)

        if cand.size > k:
            # argpartition alone breaks ties arbitrarily; keep EVERY doc tied
            # with the kth score so the lexsort can apply the deterministic
            # (score desc, doc_id asc) tie-break the oracle uses
            part = np.argpartition(-score, k - 1)
            kth = score[part[k - 1]]
            sel = np.flatnonzero(score >= kth)
            order = sel[np.lexsort((cand[sel], -score[sel]))][:k]
        else:
            order = np.lexsort((cand, -score))
        return pd.DataFrame({"doc_id": cand[order], "score": score[order]})

    return score_range


class QuerySession:
    """Long-lived query serving session: postings/norms/term-stats loaded once
    and optionally cached in memory. The reference reopens its IndexReader on
    every query (``cIndex.java:134-137``) — we instead serve from a cached
    DataFrame (SURVEY.md §3.2 Spark shape) for p50 latency."""

    def __init__(self, spark: SparkSession, root: str, cache: bool = False):
        self.spark = spark
        self.root = root
        self.meta = load_meta(spark, root)
        self.paths = IndexPaths(root)
        self.post = spark.read.parquet(self.paths.postings)
        # norms = the DOCLEN_TERM posting rows of the same table (tf==doclen)
        self.norms = self.post.filter(F.col("term") == DOCLEN_TERM)
        self.stats = spark.read.parquet(self.paths.term_stats)
        self._cached = cache
        if cache:
            # cache the metadata-heavy small tables fully; postings cached
            # column-pruned (the binary blobs dominate — keep them too: the
            # whole index is the working set of a serving node)
            self.post = self.post.persist()
            self.norms = self.norms.persist()
            self.stats = self.stats.persist()
            self.post.count()
            self.norms.count()
            self.stats.count()

    def close(self) -> None:
        if self._cached:
            for df in (self.post, self.norms, self.stats):
                df.unpersist()

    def topk(self, query: str, k: int = 10, mode: str = "and") -> DataFrame:
        spark = self.spark
        meta = self.meta
        empty = spark.createDataFrame([], "doc_id long, score double")
        terms = query_terms(query)
        if not terms:
            return empty
        stats = self.stats.filter(F.col("term").isin(terms)).collect()
        df_by_term = {r["term"]: int(r["df"]) for r in stats}
        if any(t not in df_by_term for t in terms):
            return empty  # a MUST term absent from the corpus
        idf_by_term = {t: _idf(meta.n_docs, df_by_term[t]) for t in terms}
        terms_by_rarity = sorted(terms, key=lambda t: (df_by_term[t], t))

        if mode == "phrase":
            return _phrase_topk(spark, self.root, meta, query, terms,
                                idf_by_term, k)

        if self._cached:
            # in-memory scan: bucket pruning buys nothing, and skipping the
            # ranges-collect saves a whole Spark job per query
            post = self.post.filter(F.col("term").isin(terms))
            norms = self.norms
        else:
            # disk path: bucket pruning = parquet partition pruning; the
            # ranges filter keeps the cogroup from touching norms of ranges
            # where no query term occurs
            bmap = _buckets_of(terms + [DOCLEN_TERM], meta.n_buckets, spark)
            buckets = sorted({bmap[t] for t in terms})
            post = self.post.filter(F.col("bucket").isin(buckets)
                                    & F.col("term").isin(terms))
            ranges = [int(r["range_id"]) for r in
                      post.select("range_id").distinct().collect()]
            if not ranges:
                return empty
            norms = self.norms.filter(
                (F.col("bucket") == bmap[DOCLEN_TERM])
                & F.col("range_id").isin(ranges))

        scored = (post.groupby("range_id")
                  .cogroup(norms.groupby("range_id"))
                  .applyInPandas(
                      _make_range_scorer(terms_by_rarity, idf_by_term,
                                         meta.avgdl, k),
                      "doc_id long, score double"))
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


    def topk_batch(self, queries: dict[str, str], k: int = 10) -> DataFrame:
        """Score a BATCH of conjunctive queries in ONE distributed pass:
        returns (query_id, doc_id, score, rank<=k). Amortizes job overhead
        across queries — the throughput-oriented serving path (single-query
        p50 in local mode is dominated by fixed job costs; a real deployment
        batches the query stream exactly like this)."""
        spark = self.spark
        meta = self.meta
        all_terms = sorted({t for q in queries.values()
                            for t in query_terms(q)})
        out_schema = "query_id string, doc_id long, score double"
        if not all_terms:
            return spark.createDataFrame([], out_schema + ", rank int")
        stats = self.stats.filter(F.col("term").isin(all_terms)).collect()
        df_by_term = {r["term"]: int(r["df"]) for r in stats}
        plans = []  # (qid, terms_by_rarity, idf_by_term)
        for qid, q in queries.items():
            terms = query_terms(q)
            if not terms or any(t not in df_by_term for t in terms):
                continue
            idf = {t: _idf(meta.n_docs, df_by_term[t]) for t in terms}
            plans.append((qid, sorted(terms, key=lambda t: (df_by_term[t], t)),
                          idf))
        if not plans:
            return spark.createDataFrame([], out_schema + ", rank int")
        live_terms = sorted({t for _, ts, _ in plans for t in ts})
        post = self.post.filter(F.col("term").isin(live_terms))
        norms = self.norms
        avgdl, kk = meta.avgdl, k

        def score_ranges(_key, post_pdf: pd.DataFrame, norms_pdf: pd.DataFrame
                         ) -> pd.DataFrame:
            out = []
            scorers = {
                qid: _make_range_scorer(ts, idf, avgdl, kk)
                for qid, ts, idf in plans}
            for qid, ts, idf in plans:
                sub = post_pdf[post_pdf["term"].isin(ts)]
                r = scorers[qid](_key, sub, norms_pdf)
                if len(r):
                    r = r.copy()
                    r.insert(0, "query_id", qid)
                    out.append(r)
            if not out:
                return pd.DataFrame({"query_id": pd.Series(dtype=object),
                                     "doc_id": pd.Series(dtype=np.int64),
                                     "score": pd.Series(dtype=np.float64)})
            return pd.concat(out, ignore_index=True)

        scored = (post.groupby("range_id")
                  .cogroup(norms.groupby("range_id"))
                  .applyInPandas(score_ranges, out_schema))
        from pyspark.sql import Window
        w = (Window.partitionBy("query_id")
             .orderBy(F.desc("score"), F.asc("doc_id")))
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))


def bm25_topk(spark: SparkSession, root: str, query: str, k: int = 10,
              mode: str = "and") -> DataFrame:
    """Top-k BM25 over the compressed index; rank-identical to
    query.oracle.bm25_topk_oracle. Returns (doc_id, score). One-shot
    convenience wrapper — use QuerySession for serving."""
    return QuerySession(spark, root, cache=False).topk(query, k, mode)


METADATA_FIELDS = ("repo", "path", "commit", "lang")


def search_fields(spark: SparkSession, root: str, fields: dict[str, str],
                  k: int = 10, mode: str = "and") -> DataFrame:
    """Reference-parity multi-field conjunctive search
    (``cLuceneIndexReader.java:272-397``: one MUST clause per non-empty UI
    field — Path/Filename/Extension/Category…). Spark shape: the ``content``
    clause runs through the inverted index (BM25-ranked); metadata clauses
    (repo/path/commit/lang — the Path/Filename/Extension/Category analogs)
    become docmap predicates evaluated as a filter on an over-fetched
    candidate set, then re-limited to k. Empty-valued fields are ignored
    (reference P1, ``cSearchTable.java:222-246``).

    Returns (doc_id, score, repo, path, commit, lang) ordered
    (score desc, doc_id asc), at most k rows.
    """
    fields = {f: v for f, v in fields.items() if v and str(v).strip()}
    meta_preds = {f: v for f, v in fields.items() if f in METADATA_FIELDS}
    content_q = fields.get("content", "")
    docmap = spark.read.parquet(IndexPaths(root).docmap)

    def apply_meta(df: DataFrame) -> DataFrame:
        for f, v in meta_preds.items():
            df = df.filter(F.lower(F.col(f)).contains(str(v).lower()))
        return df

    if not content_q:
        # pure metadata search: predicate pushdown on the docmap scan,
        # deterministic doc_id order (no scores)
        return (apply_meta(docmap)
                .select("doc_id", F.lit(0.0).alias("score"),
                        "repo", "path", "commit", "lang")
                .orderBy("doc_id").limit(k))

    # over-fetch: metadata predicates can only shrink the candidate set, so
    # fetch enough BM25 candidates that k usually survive; correctness does
    # not depend on the factor (worst case returns fewer than k, exactly like
    # a too-selective reference query)
    fetch = max(k * 10, 100)
    hits = QuerySession(spark, root, cache=False).topk(content_q, fetch, mode)
    return (apply_meta(docmap.join(F.broadcast(hits), "doc_id"))
            .select("doc_id", "score", "repo", "path", "commit", "lang")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def load_doclens(spark: SparkSession, root: str) -> DataFrame:
    """(doc_id, doclen) decoded from the DOCLEN_TERM posting rows — the
    row-expanded view of the norms store (used by the phrase scorer, which
    needs doclens as a joinable column)."""
    post = (spark.read.parquet(IndexPaths(root).postings)
            .filter(F.col("term") == DOCLEN_TERM))

    def gen(batches):
        for pdf in batches:
            for r in pdf.itertuples():
                d, t = decode_postings(_ep_from_row(r))
                yield pd.DataFrame({"doc_id": d, "doclen": t})

    return post.mapInPandas(gen, "doc_id long, doclen long")


def _phrase_topk(spark: SparkSession, root: str, meta: IndexMeta, query: str,
                 terms_dedup: list[str], idf_by_term: dict[str, float],
                 k: int) -> DataFrame:
    """Phrase ("whole words") mode over the positional index — reference
    ``PhraseQuery`` path (R:285-301). Consecutive-position chain evaluated
    with built-in array functions; scored as the conjunctive BM25 of the
    constituent terms (documented deviation from Lucene's phrase-freq
    scoring; the oracle uses the same definition)."""
    from ..tokenizer import tokenize_text
    seq = tokenize_text(query)          # with duplicates, in order
    if not seq:
        return spark.createDataFrame([], "doc_id long, score double")
    if not meta.positions:
        raise ValueError("index was built without positions=True")
    paths = IndexPaths(root)
    buckets = sorted(set(_buckets_of(sorted(set(seq)), meta.n_buckets,
                                     spark).values()))
    pos = (spark.read.parquet(paths.positions)
           .filter(F.col("bucket").isin(buckets)
                   & F.col("term").isin(list(set(seq)))))

    joined = None
    for i, t in enumerate(seq):
        side = (pos.filter(F.col("term") == t)
                .select("doc_id", F.col("positions").alias(f"p{i}")))
        joined = side if joined is None else joined.join(side, "doc_id")
    chain = F.filter(
        F.col("p0"),
        lambda p: reduce(lambda a, c: a & c,
                         [F.array_contains(F.col(f"p{i}"), p + F.lit(i))
                          for i in range(1, len(seq))],
                         F.lit(True)))
    cand = joined.filter(F.size(chain) > 0).select("doc_id")

    # BM25 over the deduped constituent terms, tf = positions count
    tf = (pos.join(F.broadcast(cand), "doc_id")
          .select("doc_id", "term", F.size("positions").alias("tf")))
    dl = load_doclens(spark, root)
    idf_map = F.create_map(*[F.lit(x) for t in sorted(idf_by_term)
                             for x in (t, idf_by_term[t])])
    scored = (
        tf.join(dl, "doc_id")
        .withColumn("contrib",
                    idf_map[F.col("term")] * F.col("tf") * F.lit(BM25_K1 + 1.0)
                    / (F.col("tf") + F.lit(BM25_K1)
                       * (F.lit(1.0 - BM25_B)
                          + F.lit(BM25_B) * F.col("doclen") / F.lit(meta.avgdl))))
        .groupBy("doc_id").agg(F.sum("contrib").alias("score"),
                               F.count("*").alias("_nt"))
        .filter(F.col("_nt") == len(terms_dedup))
        .select("doc_id", "score"))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def hydrate(spark: SparkSession, root: str, topk: DataFrame) -> DataFrame:
    """Join top-k hits back to stored fields (analog of ``searcher.doc(id)`` →
    ``eDocument.from``, R:352-359) — broadcast the k rows, not the corpus."""
    docmap = spark.read.parquet(IndexPaths(root).docmap)
    return (docmap.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "score", "repo", "path", "commit", "lang",
                    "size", "content_sha256")
            .orderBy(F.desc("score"), F.asc("doc_id")))
