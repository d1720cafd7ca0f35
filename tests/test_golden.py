"""E2E golden test (SURVEY.md §5.2 item 4): the committed golden top-k
outputs — produced once by the pinned naive-DataFrame oracle over the
deterministic seed-42 corpus — must be reproduced exactly by BOTH the oracle
(regression lock on the executable reference semantics) and the compressed-
index fast path (rank identity, 1e-6 score tolerance), plus the multi-field
search surface."""

import json
import os

import pytest

from luceneindexer_spark.corpus import build_docmap, synth_corpus
from luceneindexer_spark.index.build import build_index
from luceneindexer_spark.query import engine
from luceneindexer_spark.query.oracle import bm25_topk_oracle

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "topk_seed42_n300.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, golden):
    root = str(tmp_path_factory.mktemp("idx_golden"))
    corpus = synth_corpus(spark, golden["corpus"]["n_docs"], partitions=4)
    build_index(spark, corpus, root, n_buckets=4, range_size=64, waves=1,
                positions=True)
    docmap = spark.read.parquet(f"{root}/docmap")
    return root, docmap


def _check(rows, spec):
    want = spec["results"]
    assert len(rows) == len(want), spec["q"]
    for got, w in zip(rows, want):
        assert got.doc_id == w["doc_id"], (spec["q"], w["rank"])
        assert abs(got.score - w["score"]) < 1e-6, (spec["q"], w["rank"])


def test_goldens_vs_oracle(built, golden):
    _, docmap = built
    for spec in golden["queries"]:
        rows = bm25_topk_oracle(docmap, spec["q"], k=spec["k"],
                                mode=spec["mode"]).collect()
        _check(rows, spec)


def test_goldens_vs_fast_path(built, spark, golden):
    root, _ = built
    for spec in golden["queries"]:
        rows = engine.bm25_topk(spark, root, spec["q"], k=spec["k"],
                                mode=spec["mode"]).collect()
        _check(rows, spec)


def test_search_fields_conjunction(built, spark):
    root, docmap = built
    # content + metadata clause: every hit satisfies BOTH
    r = engine.search_fields(spark, root,
                             {"content": "sharedlogger", "lang": "python"},
                             k=10)
    rows = r.collect()
    assert 0 < len(rows) <= 10
    assert all(x.lang == "python" for x in rows)
    # scores match the pure content query for the same doc_ids
    base = {x.doc_id: x.score for x in
            engine.bm25_topk(spark, root, "sharedlogger", k=1000).collect()}
    for x in rows:
        assert abs(base[x.doc_id] - x.score) < 1e-9
    # pure metadata search (no content clause)
    m = engine.search_fields(spark, root, {"repo": "org1/"}, k=5).collect()
    assert len(m) == 5 and all("org1/" in x.repo for x in m)
    # empty fields are ignored (reference P1)
    e = engine.search_fields(spark, root,
                             {"content": "sharedlogger", "lang": "  "},
                             k=3).collect()
    assert len(e) == 3
