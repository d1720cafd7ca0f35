"""Docstring/schema parity sweep (VERDICT r2 #9): every documented op
output schema is pinned here as an assertion on the LAZY plan's columns, so
a docstring that drifts from the realized schema fails the suite instead of
misleading a user. Cheap: plans are never executed except where an op
eagerly samples its input."""

import pytest
from pyspark.sql import functions as F

from luceneindexer_spark.ops import dedup as D
from luceneindexer_spark.ops import maintenance as M
from luceneindexer_spark.ops import similarity as S
from luceneindexer_spark.ops import textstats as T


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "alpha beta gamma delta words one"),
         (1, "alpha beta gamma delta words one"),
         (2, "totally different content here")],
        "doc_id long, text string").persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
         (2, [1.0, 0.0, 0.0, 1e-6])],
        "vec_id long, embedding array<double>").persist()


def test_dedup_schemas(docs):
    assert D.exact_duplicate_groups(docs, "doc_id", "text").columns == [
        "content_sha256", "cnt", "min_id", "max_id"]
    assert D.exact_dedup(docs, "doc_id", "text").columns == docs.columns
    sigs = D.minhash_signatures(docs, "doc_id", "text")
    assert sigs.columns[0] == "id"
    assert sigs.columns[1:] == [f"sig_{i}" for i in range(len(sigs.columns) - 1)]
    cand = D.lsh_candidate_pairs(sigs)
    assert cand.columns == ["id_a", "id_b"]
    assert D.jaccard_verify(docs, cand, "doc_id", "text", 0.5).columns == [
        "id_a", "id_b", "jaccard"]
    assert D.simhash(docs, "doc_id", "text").columns == ["id", "simhash"]
    assert D.simhash_dedup_pairs(docs, "doc_id", "text").columns == [
        "id_a", "id_b", "hamming"]
    assert D.minhash_dedup_pairs(docs, "doc_id", "text").columns == [
        "id_a", "id_b", "jaccard"]
    assert D.dedup_drop_list(cand).columns == ["id"]


def test_embedding_schemas(emb):
    assert D.embedding_dedup_pairs(emb, "vec_id", "embedding").columns == [
        "id_a", "id_b", "cosine"]
    assert S.cosine_topk(emb, [1.0, 0.0, 0.0, 0.0]).columns == [
        "id", "cosine"]
    idx = S.build_sketch_index(emb)
    assert idx.columns == ["id", "sketch", "n_planes", "vec"]
    assert S.ann_lsh_topk(idx, [1.0, 0.0, 0.0, 0.0]).columns == [
        "id", "cosine"]
    assert S.knn_join(emb, emb, k=2).columns == [
        "id_l", "id_r", "cosine", "rank"]


def test_textstats_schemas(docs):
    assert T.lang_id(docs, "doc_id", "text").columns == ["id", "pred_lang"]
    assert T.quality_features(docs, "doc_id", "text").columns == [
        "id", "n_chars", "n_tokens", "avg_token_len", "stopword_ratio",
        "alnum_ratio", "quality"]
    assert T.token_counts(docs, "doc_id", "text").columns == [
        "id", "ws_tokens", "bpeish_tokens"]
    assert T.fingerprints(docs, "doc_id", "text").columns == ["id", "fp"]
    assert T.fingerprint_summary(docs, "doc_id", "text").columns == [
        "id", "n_fp", "min_fp", "max_fp", "xor_fp"]


def test_maintenance_schemas(spark, docs):
    docmap = docs.select(
        "doc_id", F.lit("r").alias("repo"), F.lit("p").alias("path"),
        F.lit("c").alias("commit"), F.lit("en").alias("lang"),
        F.lit(1).cast("long").alias("size"),
        F.lit("h").alias("content_sha256"), F.col("text").alias("content"))
    assert M.browse(docmap).columns == [
        "doc_id", "repo", "path", "commit", "lang", "size"]
    dele = spark.createDataFrame([(1,)], "doc_id long")
    assert M.apply_deletes(docmap, dele).columns == docmap.columns
