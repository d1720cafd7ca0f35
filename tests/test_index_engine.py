"""E2E: build the index on a deterministic synthetic corpus, verify the fast
path (compressed postings + block-max intersection) is rank- and
score-identical to the naive DataFrame oracle; verify invariants, upsert
semantics, and kill/resume via the checkpoint manifest (SURVEY.md §5.2)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from luceneindexer_spark.corpus import HOT_TERM, PHRASE, RARE_TERM, synth_corpus
from luceneindexer_spark.index.build import BuildInterrupted, build_index
from luceneindexer_spark.index import manifest as mf
from luceneindexer_spark.query import engine
from luceneindexer_spark.query.oracle import bm25_topk_oracle

N_DOCS = 300
RANGE_SIZE = 64


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx"))
    corpus = synth_corpus(spark, N_DOCS, partitions=4)
    report = build_index(spark, corpus, root, n_buckets=4,
                         range_size=RANGE_SIZE, waves=2, positions=True)
    docmap = spark.read.parquet(f"{root}/docmap")
    return root, corpus, docmap, report


QUERY_SET = [
    (RARE_TERM, "and"),
    (HOT_TERM, "and"),
    (f"{HOT_TERM} mergeSegments", "and"),
    ("getUserName queryParser scoreDocs", "and"),
    ("get_user_name", "and"),          # snake_case splits like camelCase
    ("tokenStream", "and"),
    ("postingList varintGap", "and"),
    (PHRASE, "phrase"),
    ("the a of", "and"),               # stopword-only → empty
    ("nosuchterm tokenStream", "and"),  # absent MUST term → empty
]


@pytest.mark.parametrize("query,mode", QUERY_SET)
def test_fast_path_rank_identical_to_oracle(built, spark, query, mode):
    root, _, docmap, _ = built
    want = [(r.doc_id, r.score) for r in
            bm25_topk_oracle(docmap, query, k=10, mode=mode).collect()]
    got = [(r.doc_id, r.score) for r in
           engine.bm25_topk(spark, root, query, k=10, mode=mode).collect()]
    assert [w[0] for w in want] == [g[0] for g in got]
    for (_, ws), (_, gs) in zip(want, got):
        assert abs(ws - gs) < 1e-9


def test_range_prune_bounded_for_hot_terms(built, spark, monkeypatch):
    """VERDICT r3 wrong #1: the uncached range-prune collect is bounded —
    when the rarest term's df exceeds RANGE_PRUNE_MAX, NO distinct-range
    set is collected to the driver (monkeypatched collector proves it) and
    the unpruned plan returns the identical ranking."""
    root, _, docmap, _ = built
    want = [(r.doc_id, round(r.score, 9)) for r in
            engine.bm25_topk(spark, root, HOT_TERM, k=10).collect()]

    def boom(self, post, terms):  # noqa: ARG001
        raise AssertionError("ranges collected for a hot term")

    monkeypatch.setattr(engine, "RANGE_PRUNE_MAX", 0)
    monkeypatch.setattr(engine.QuerySession, "_collect_range_ids", boom)
    got = [(r.doc_id, round(r.score, 9)) for r in
           engine.bm25_topk(spark, root, HOT_TERM, k=10).collect()]
    assert got == want and got
    # conjunction with a deny rider exercises the unpruned deny/norms path
    got2 = engine.bm25_topk(spark, root, f"{HOT_TERM} mergeSegments",
                            k=10).collect()
    assert len(got2) == 10


def test_k_larger_than_hits_and_k100(built, spark):
    root, _, docmap, _ = built
    want = [r.doc_id for r in
            bm25_topk_oracle(docmap, HOT_TERM, k=100).collect()]
    got = [r.doc_id for r in
           engine.bm25_topk(spark, root, HOT_TERM, k=100).collect()]
    assert want == got and len(got) == 100
    got3 = engine.bm25_topk(spark, root, RARE_TERM, k=100).collect()
    assert len(got3) == 3  # rare term planted in exactly 3 docs


def test_per_row_sha256_invariant(built, spark):
    """BASELINE.json input_hint: content sha256 equality vs the source table."""
    root, corpus, docmap, _ = built
    joined = docmap.alias("d").join(
        corpus.alias("c"), ["repo", "path", "commit"], "inner")
    n = docmap.count()
    assert joined.count() == n
    bad = joined.filter(
        F.col("d.content_sha256")
        != F.sha2(F.col("c.content").cast("binary"), 256)).count()
    assert bad == 0
    # doc_ids dense 0..N-1
    r = docmap.agg(F.min("doc_id"), F.max("doc_id"),
                   F.countDistinct("doc_id")).collect()[0]
    assert (r[0], r[1], r[2]) == (0, n - 1, n)


def test_upsert_latest_commit_wins(built, spark):
    root, corpus, docmap, _ = built
    multi = (corpus.groupBy("repo", "path")
             .agg(F.count("*").alias("c"), F.max("commit").alias("latest"))
             .filter("c > 1"))
    assert multi.count() > 0
    picked = docmap.join(multi, ["repo", "path"])
    assert picked.filter(F.col("commit") != F.col("latest")).count() == 0


def test_postings_match_naive_tf(built, spark):
    """Σ df in postings == distinct (term, doc) pairs from a naive explode."""
    root, _, docmap, _ = built
    from luceneindexer_spark.tokenizer import with_tokens
    naive = (with_tokens(docmap.select("doc_id", "content"), "content")
             .select("doc_id", F.explode("tokens").alias("term"))
             .groupBy("term", "doc_id").count())
    from luceneindexer_spark.index.build import DOCLEN_TERM
    post = (spark.read.parquet(f"{root}/postings")
            .filter(F.col("term") != DOCLEN_TERM))
    assert post.agg(F.sum("df")).collect()[0][0] == naive.count()
    assert post.agg(F.sum("cf")).collect()[0][0] == \
        naive.agg(F.sum("count")).collect()[0][0]
    # the DOCLEN_TERM rows carry Σ doclen as cf (norms-as-postings)
    dl = (spark.read.parquet(f"{root}/postings")
          .filter(F.col("term") == DOCLEN_TERM))
    assert dl.agg(F.sum("cf")).collect()[0][0] == \
        naive.agg(F.sum("count")).collect()[0][0]


def test_hot_term_spread_across_ranges(built, spark):
    """Skew handling: the planted hot term's postings live in EVERY doc-range
    (the structural salt), never in one reducer's row."""
    root, _, _, report = built
    post = spark.read.parquet(f"{root}/postings")
    hot = post.filter(F.col("term") == HOT_TERM.lower())
    assert hot.count() == report["n_ranges"]
    assert hot.agg(F.max("df")).collect()[0][0] <= RANGE_SIZE


def test_resume_rebuilds_only_unfinished(spark, tmp_path):
    root = str(tmp_path / "idx_resume")
    corpus = synth_corpus(spark, N_DOCS, partitions=4)
    with pytest.raises(BuildInterrupted):
        build_index(spark, corpus, root, n_buckets=4, range_size=RANGE_SIZE,
                    waves=3, _stop_after_waves=1)
    m = mf.read_manifest(spark, root)
    done1 = {r["partition_id"] for r in m.filter("status='complete'").collect()}
    assert 0 < len(done1) < -(-N_DOCS // RANGE_SIZE)
    wave0 = sorted(glob.glob(f"{root}/postings/wave=*"))[0]
    mtimes = {p: os.path.getmtime(p) for p in
              glob.glob(f"{wave0}/**/*.parquet", recursive=True)}

    report = build_index(spark, corpus, root, n_buckets=4,
                         range_size=RANGE_SIZE, waves=3, resume=True)
    assert report["resumed"] is True
    assert report["pending_ranges"] == -(-N_DOCS // RANGE_SIZE) - len(done1)
    # completed wave's files untouched by the resumed build
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t
    m2 = mf.read_manifest(spark, root)
    att = {r["partition_id"]: r["attempt"]
           for r in m2.filter("status='complete'").collect()}
    assert all(att[r] == 1 for r in done1)
    assert all(a == 2 for r, a in att.items() if r not in done1)

    # resumed index answers identically to a from-scratch build
    fresh_root = str(tmp_path / "idx_fresh")
    build_index(spark, corpus, fresh_root, n_buckets=4,
                range_size=RANGE_SIZE, waves=1)
    for q in (RARE_TERM, HOT_TERM, "getUserName queryParser"):
        a = [(r.doc_id, round(r.score, 9)) for r in
             engine.bm25_topk(spark, root, q, k=10).collect()]
        b = [(r.doc_id, round(r.score, 9)) for r in
             engine.bm25_topk(spark, fresh_root, q, k=10).collect()]
        assert a == b


def test_published_marker(built):
    root, _, _, report = built
    pub = mf.published(root)
    assert pub is not None
    assert pub["snapshot"] == report["snapshot"]
    assert pub["n_docs"] == report["n_docs"]


def test_wave_write_layout_one_file_per_bucket(built, spark):
    """The wave write routes the merged postings through a bucket shuffle:
    exactly ONE parquet file per non-empty bucket per wave (not
    merge_tasks x n_buckets dynamic-partition writers), and rows inside a
    file are term-sorted so term min/max row-group pruning works."""
    root, _, _, report = built
    wave_dirs = sorted(glob.glob(os.path.join(root, "postings", "wave=*")))
    assert wave_dirs, "no wave dirs written"
    for wd in wave_dirs:
        for bucket_dir in sorted(glob.glob(os.path.join(wd, "bucket=*"))):
            files = glob.glob(os.path.join(bucket_dir, "*.parquet"))
            assert len(files) == 1, (
                f"{bucket_dir}: expected one file per bucket per wave, "
                f"got {len(files)}")
            import pyarrow.parquet as pq
            terms = pq.read_table(files[0], columns=["term"])["term"]
            vals = terms.to_pylist()
            assert vals == sorted(vals), f"{files[0]} not term-sorted"


def test_scan_parallelism_targets_split_count(spark, tmp_path):
    """build_index(scan_parallelism=k) must yield exactly k tokenize-scan
    splits (requires setting spark.sql.files.minPartitionNum — without it
    Spark floors the split count at defaultParallelism)."""
    root = str(tmp_path / "idx_sp")
    corpus = synth_corpus(spark, 200, partitions=4)
    rep = build_index(spark, corpus, root, n_buckets=4, range_size=RANGE_SIZE,
                      waves=1, merge_partitions=2, docmap_partitions=2,
                      scan_parallelism=2)
    assert rep["scan_partitions"] == 2
    # the conf is restored after the build
    assert spark.conf.get("spark.sql.files.minPartitionNum", None) is None
    # and the index it produced is queryable + correct
    qs = engine.QuerySession(spark, root)
    got = qs.topk(HOT_TERM, k=5).collect()
    assert len(got) == 5


def test_auto_range_size_scale_aware(spark, tmp_path):
    """Default range_size is scale-aware (~128 ranges, clamped to
    [2^10, 2^16] docs per range) and a pure function of the docmap's max
    doc id — independent of the build's parallelism, so a resume at a
    different partition count recomputes the identical value."""
    from luceneindexer_spark.index.build import auto_range_size

    # pure-function contract across the scale sweep
    assert auto_range_size(500) == 1 << 10            # clamp floor
    assert auto_range_size(200_000 - 1) == 1 << 11    # 200k -> 98 ranges
    assert auto_range_size(1_000_000 - 1) == 1 << 13  # ~128 ranges
    assert auto_range_size(10_000_000 - 1) == 1 << 16  # clamp cap reached
    assert auto_range_size(10**12) == 1 << 16         # 10^12 docs: cap
    for n in (200_000, 1_000_000, 50_000_000):
        rs = auto_range_size(n - 1)
        assert 1 << 10 <= rs <= 1 << 16
        assert (n + rs - 1) // rs >= 64 or rs == 1 << 10

    # a default build records the choice and is queryable; the value
    # matches the pure function of its own docmap
    root = str(tmp_path / "idx_auto")
    corpus = synth_corpus(spark, 300, partitions=4)
    rep = build_index(spark, corpus, root, n_buckets=4, waves=1,
                      merge_partitions=2, docmap_partitions=2)
    assert rep["range_size"] == auto_range_size(N_DOCS - 1) == 1 << 10
    meta = engine.load_meta(spark, root)
    assert meta.range_size == 1 << 10
    qs = engine.QuerySession(spark, root)
    assert len(qs.topk(HOT_TERM, k=5).collect()) == 5


def test_federated_topk_exact_multi_root_merge(built, spark, tmp_path):
    """U1 federation (reference cIndex.java:59-69 searchAll): two published
    roots — the base index and a copy-root with its own tombstone list
    deleting the query's rank-1 doc — merged exactly: the federated top-k
    equals the per-root union re-ranked by (score desc, doc_id, root_id)."""
    import os
    import shutil

    root, _, _, _ = built
    root2 = str(tmp_path / "fed_root2")
    os.makedirs(root2)
    for sub in ("docmap", "postings", "term_stats", "corpus_stats"):
        os.symlink(os.path.join(root, sub), os.path.join(root2, sub))
    shutil.copy(os.path.join(root, "_PUBLISHED"),
                os.path.join(root2, "_PUBLISHED"))
    from luceneindexer_spark.ops.maintenance import append_deletes
    query = f"{HOT_TERM} mergeSegments"
    top1 = engine.bm25_topk(spark, root, query, k=1).collect()[0]
    append_deletes(spark, root2, [int(top1.doc_id)])

    k = 10
    got = engine.federated_topk(spark, [root, root2], query, k=k).collect()
    assert [r["root_id"] for r in got]  # non-empty
    # expected: union of per-root top-k, re-sorted, cut at k
    per_root = []
    for i, r_ in enumerate((root, root2)):
        for row in engine.bm25_topk(spark, r_, query, k=k).collect():
            per_root.append((i, int(row.doc_id), float(row.score)))
    want = sorted(per_root, key=lambda t: (-t[2], t[1], t[0]))[:k]
    assert [(r.root_id, r.doc_id) for r in got] == [
        (i, d) for i, d, _ in want]
    for g, (_, _, s) in zip(got, want):
        assert abs(g.score - s) < 1e-9
    # the tombstoned doc appears once (root 0 only)
    hits = [(r.root_id, r.doc_id) for r in got
            if r.doc_id == int(top1.doc_id)]
    assert hits == [(0, int(top1.doc_id))]
    # single-root federation degenerates to plain topk with root_id 0
    solo = engine.federated_topk(spark, [root], query, k=5).collect()
    plain = engine.bm25_topk(spark, root, query, k=5).collect()
    assert [(r.root_id, r.doc_id) for r in solo] == [
        (0, r.doc_id) for r in plain]


def test_resume_geometry_pinned_by_plan_sidecar(spark, tmp_path):
    """ADVICE r4 (medium): manifest completion rows carry no geometry, so a
    resume must re-plan under the original range_size. The _plan.json
    sidecar (written before wave 0) makes that explicit: a resume with
    range_size omitted reuses the persisted value instead of the auto
    default, and an explicit mismatch on any layout knob errors."""
    root = str(tmp_path / "idx_geom")
    corpus = synth_corpus(spark, N_DOCS, partitions=4)
    with pytest.raises(BuildInterrupted):
        build_index(spark, corpus, root, n_buckets=4, range_size=RANGE_SIZE,
                    waves=4, _stop_after_waves=1)
    assert mf.read_plan(root)["range_size"] == RANGE_SIZE
    # explicit mismatches error instead of silently mixing geometries
    with pytest.raises(ValueError, match="geometry mismatch"):
        build_index(spark, None, root, n_buckets=4,
                    range_size=RANGE_SIZE * 2, resume=True)
    with pytest.raises(ValueError, match="geometry mismatch"):
        build_index(spark, None, root, n_buckets=8, range_size=RANGE_SIZE,
                    resume=True)
    # range_size omitted on resume -> persisted 64, NOT auto_range_size
    # (1024 at this corpus size, which would treat done range ids as
    # complete under the wrong geometry)
    rep = build_index(spark, None, root, n_buckets=4, waves=4, resume=True)
    assert rep["range_size"] == RANGE_SIZE
    assert rep["resumed"] is True
    meta = engine.load_meta(spark, root)
    assert meta.range_size == RANGE_SIZE
    assert len(engine.bm25_topk(spark, root, HOT_TERM, k=5).collect()) == 5


def test_docmap_head_hash_option(spark):
    """First-block hashing (reference cCryptographer.java:643-646): with
    hash_head_bytes the docmap's content_sha256 covers only the content
    head — identical for docs sharing a head, different from the full
    hash on longer docs; the default stays the full-content invariant."""
    import hashlib

    from luceneindexer_spark.corpus import build_docmap

    rows = [("r", "a.py", "c1", "py", "sameHeadXX tail one"),
            ("r", "b.py", "c1", "py", "sameHeadXX tail two"),
            ("r", "c.py", "c1", "py", "short")]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    dm = {r.path: r for r in
          build_docmap(corpus, partitions=2, hash_head_bytes=10).collect()}
    assert (dm["a.py"].content_sha256 == dm["b.py"].content_sha256
            == hashlib.sha256(b"sameHeadXX").hexdigest())
    # shorter-than-head docs hash their full content
    assert dm["c.py"].content_sha256 == hashlib.sha256(b"short").hexdigest()
    # size still reflects the FULL content, and the default is unchanged
    assert dm["a.py"].size == len("sameHeadXX tail one")
    full = {r.path: r for r in build_docmap(corpus, partitions=2).collect()}
    assert full["a.py"].content_sha256 == hashlib.sha256(
        b"sameHeadXX tail one").hexdigest()
    assert full["a.py"].content_sha256 != full["b.py"].content_sha256
