"""Round-3 additions: Lucene IndexSearcher.explain / DirectSpellChecker /
CheckIndex analogs — component-level exactness and corruption detection."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from luceneindexer_spark.corpus import HOT_TERM, synth_corpus
from luceneindexer_spark.index.build import build_index
from luceneindexer_spark.index.check import check_index
from luceneindexer_spark.query import engine
from luceneindexer_spark.tokenizer import tokenize_text, with_tokens


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_explain"))
    corpus = synth_corpus(spark, 300, partitions=4)
    build_index(spark, corpus, root, n_buckets=4, range_size=64, waves=1,
                positions=True)
    docmap = spark.read.parquet(f"{root}/docmap")
    return root, docmap


def test_explain_components_reproduce_scores(built, spark):
    """explain's per-(doc, term) rows must (a) cover exactly the top-k docs,
    (b) sum to the hit scores, and (c) carry tf/doclen/df that match a naive
    tokenizer recompute on the raw docmap — every Explanation component is
    checked against ground truth, not against the engine itself."""
    root, docmap = built
    query = f"{HOT_TERM} def"
    sess = engine.QuerySession(spark, root)
    hits = {int(r.doc_id): float(r.score)
            for r in sess.topk(query, k=8).collect()}
    rows = sess.explain(query, k=8).collect()

    assert {int(r.doc_id) for r in rows} == set(hits)
    terms = sorted({r.term for r in rows})
    assert terms == ["def", HOT_TERM.lower()] or len(terms) == 2

    # (b) contribs sum to the reported score (both rounded to 6dp)
    by_doc: dict[int, float] = {}
    for r in rows:
        by_doc[int(r.doc_id)] = by_doc.get(int(r.doc_id), 0.0) + r.contrib
    for d, s in hits.items():
        assert abs(by_doc[d] - s) < 5e-6

    # or-mode: the breakdown covers the disjunctive hit set and still sums
    # to the or-mode scores (docs may carry 1 or 2 term rows)
    or_hits = {int(r.doc_id): float(r.score)
               for r in sess.topk(query, k=8, mode="or").collect()}
    or_rows = sess.explain(query, k=8, mode="or").collect()
    assert {int(r.doc_id) for r in or_rows} == set(or_hits)
    acc: dict[int, float] = {}
    for r in or_rows:
        acc[int(r.doc_id)] = acc.get(int(r.doc_id), 0.0) + r.contrib
    for d, s in or_hits.items():
        assert abs(acc[d] - s) < 5e-6

    # (c) tf / doclen / df vs a naive recompute over the raw content
    toks = with_tokens(docmap.select("doc_id", "content"), "content")
    naive = (toks.select("doc_id", "doclen",
                         F.explode("tokens").alias("term"))
             .filter(F.col("term").isin(list({r.term for r in rows})))
             .groupBy("doc_id", "doclen", "term")
             .agg(F.count("*").alias("tf")))
    nmap = {(int(r.doc_id), r.term): (int(r.tf), int(r.doclen))
            for r in naive.collect()}
    dfmap = {r.term: int(r.df) for r in
             naive.groupBy("term").agg(F.count("*").alias("df")).collect()}
    n_docs = docmap.count()
    for r in rows:
        tf, dl = nmap[(int(r.doc_id), r.term)]
        assert (int(r.tf), int(r.doclen)) == (tf, dl)
        assert int(r.df) == dfmap[r.term]
        idf = float(np.log1p((n_docs - r.df + 0.5) / (r.df + 0.5)))
        assert abs(r.idf - round(idf, 6)) < 1e-9


def test_suggest_matches_naive_ranking(built, spark):
    """suggest == a driver-side recompute over the full dictionary:
    levenshtein<=2, never the source term, (dist, df desc, term asc)."""
    root, _ = built
    sess = engine.QuerySession(spark, root)
    stats = {r.term: int(r.df)
             for r in sess.stats.collect() if ":" not in r.term and r.term}
    q = "sharedloger"          # typo of the planted hot term

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = sorted(((lev(t, q), -df, t) for t, df in stats.items()
                   if 1 <= lev(t, q) <= 2))[:5]
    got = [(int(r.dist), -int(r.df), r.suggestion)
           for r in sess.suggest(q, n=5).collect()]
    assert got == [w for w in want]
    assert all(g[2] != q for g in got)


def test_check_index_clean_and_detects_tampering(built, spark, tmp_path):
    """A healthy index audits clean AND the summary equals corpus-derived
    truth; a tampered term_stats table is caught as a stats mismatch — the
    audit is a real cross-check, not a constant."""
    root, docmap = built
    row = check_index(spark, root).collect()[0]
    assert row.structural_violations == 0
    assert row.stats_mismatches == 0

    toks = with_tokens(docmap.select("doc_id", "content"), "content")
    flat = toks.select("doc_id", F.explode("tokens").alias("term"))
    truth = flat.agg(
        F.count_distinct("term").alias("vocab"),
        F.count("*").alias("cf"),
        F.count_distinct("doc_id", "term").alias("df")).collect()[0]
    assert row.n_docs == docmap.count()
    assert row.vocab_size == truth.vocab
    assert row.sum_total_term_freq == truth.cf
    assert row.sum_doc_freq == truth.df

    # tamper: bump one term's df in a linked copy's term_stats
    bad = str(tmp_path / "tampered")
    os.makedirs(bad)
    for sub in ("docmap", "postings", "corpus_stats"):
        os.symlink(os.path.join(root, sub), os.path.join(bad, sub))
    import shutil
    shutil.copy(os.path.join(root, "_PUBLISHED"),
                os.path.join(bad, "_PUBLISHED"))
    st = spark.read.parquet(os.path.join(root, "term_stats"))
    (st.withColumn("df", F.when(F.col("term") == HOT_TERM.lower(),
                                F.col("df") + 1).otherwise(F.col("df")))
     .write.mode("overwrite").parquet(os.path.join(bad, "term_stats")))
    bad_row = check_index(spark, bad).collect()[0]
    assert bad_row.stats_mismatches == 1
    assert bad_row.structural_violations == 0
