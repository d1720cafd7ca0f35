"""Incremental/streaming surface (SURVEY.md §2.9): micro-batch append keeps
query results identical to the oracle over the appended docmap; the
file-watcher stream ingests a backlog via availableNow."""

import os

import pytest
from pyspark.sql import functions as F

from luceneindexer_spark.corpus import synth_corpus
from luceneindexer_spark.index.build import build_index
from luceneindexer_spark.query import engine
from luceneindexer_spark.query.oracle import bm25_topk_oracle
from luceneindexer_spark.streaming.incremental import (append_documents,
                                                       watch_corpus)


def _new_docs(spark, n, tag):
    # distinct (repo, path) keyspace so appends never collide with the base
    return (spark.range(n).select(
        F.format_string(f"inc/{tag}-repo%d", F.col("id") % 3).alias("repo"),
        F.format_string(f"src/{tag}/f%d.py", F.col("id")).alias("path"),
        F.sha2(F.format_string(f"{tag}/%d", F.col("id")), 256)
        .substr(1, 40).alias("commit"),
        F.lit("python").alias("lang"),
        F.format_string(
            "def newFeatureFn%d(): return sharedlogger mergeSegments "
            "incrementalToken tag%d", F.col("id"), F.col("id") % 5)
        .alias("content")))


def test_append_then_query_matches_oracle(spark, tmp_path):
    root = str(tmp_path / "idx")
    base = synth_corpus(spark, 200, partitions=2)
    build_index(spark, base, root, n_buckets=4, range_size=64, waves=1)

    add = _new_docs(spark, 37, "b1")
    rep = append_documents(spark, root, add)
    assert rep["ranges_built"] >= 1

    docmap = spark.read.parquet(os.path.join(root, "docmap"))
    assert docmap.count() == 237
    # new docs got ids from the next range boundary (no rewrite of old ranges)
    new_ids = (docmap.filter(F.col("repo").startswith("inc/"))
               .agg(F.min("doc_id"), F.max("doc_id")).collect()[0])
    assert new_ids[0] == 256                # ceil(200/64)=4 ranges → 4*64
    assert new_ids[1] == 256 + 36

    for q in ("incrementalToken", "sharedlogger",
              "newFeatureFn3 incrementalToken"):
        want = [(r.doc_id, round(r.score, 9)) for r in
                bm25_topk_oracle(docmap, q, k=10).collect()]
        got = [(r.doc_id, round(r.score, 9)) for r in
               engine.bm25_topk(spark, root, q, k=10).collect()]
        assert got == want, q


def test_second_append_and_dedup_within_batch(spark, tmp_path):
    root = str(tmp_path / "idx2")
    build_index(spark, synth_corpus(spark, 100, partitions=2), root,
                n_buckets=4, range_size=64, waves=1)
    # batch with two commits for one key → latest-commit-wins (debounce analog)
    one = _new_docs(spark, 5, "x")
    dup = one.withColumn("commit", F.concat(F.lit("z"),
                                            F.col("commit").substr(2, 39))) \
             .withColumn("content", F.concat(F.col("content"),
                                             F.lit(" revisedAgain")))
    append_documents(spark, root, one.unionByName(dup))
    docmap = spark.read.parquet(os.path.join(root, "docmap"))
    added = docmap.filter(F.col("repo").startswith("inc/"))
    assert added.count() == 5
    # 'z…' commits sort after the originals → revised contents won
    assert added.filter(~F.col("content").contains("revisedAgain")).count() == 0


def test_cross_batch_upsert_supersedes_old_version(spark, tmp_path):
    """A newer commit of an existing (repo, path) must REPLACE the old doc:
    the old doc_id is tombstoned and stops surfacing from index queries
    (reference updateDocument = delete-by-term + add)."""
    root = str(tmp_path / "idx_up")
    build_index(spark, synth_corpus(spark, 100, partitions=2), root,
                n_buckets=4, range_size=64, waves=1)
    v1 = _new_docs(spark, 4, "v")
    append_documents(spark, root, v1)
    old_hits = engine.bm25_topk(spark, root, "incrementalToken",
                                k=20).collect()
    assert len(old_hits) == 4
    old_ids = {r.doc_id for r in old_hits}

    # same keys, strictly newer commits ('z' sorts after sha hex), new token
    v2 = (v1.withColumn("commit", F.concat(F.lit("z"),
                                           F.col("commit").substr(2, 39)))
          .withColumn("content",
                      F.concat(F.col("content"), F.lit(" supersededToken"))))
    append_documents(spark, root, v2)

    new_hits = engine.bm25_topk(spark, root, "supersededToken", k=20).collect()
    assert len(new_hits) == 4
    assert {r.doc_id for r in new_hits}.isdisjoint(old_ids)
    # old versions are gone from every query, not just the new-token one
    inc = engine.bm25_topk(spark, root, "incrementalToken", k=20).collect()
    assert {r.doc_id for r in inc} == {r.doc_id for r in new_hits}

    # an OLDER commit arriving later is dropped (latest-commit-wins)
    v0 = (v1.withColumn("commit", F.concat(F.lit("0"),
                                           F.col("commit").substr(2, 39)))
          .withColumn("content", F.lit("staleResurrection")))
    append_documents(spark, root, v0)
    assert engine.bm25_topk(spark, root, "staleResurrection",
                            k=5).count() == 0

    # vacuum view = live docs only
    from luceneindexer_spark.ops.maintenance import vacuum_docmap
    live = vacuum_docmap(spark, root)
    assert live.filter(F.col("repo").startswith("inc/")).count() == 4


def test_append_retry_is_idempotent(spark, tmp_path):
    """Replaying the same micro-batch (at-least-once foreachBatch) must be a
    no-op: no duplicate doc_ids, identical query results."""
    root = str(tmp_path / "idx_idem")
    build_index(spark, synth_corpus(spark, 100, partitions=2), root,
                n_buckets=4, range_size=64, waves=1)
    batch = _new_docs(spark, 6, "r1")
    append_documents(spark, root, batch)
    docmap1 = spark.read.parquet(os.path.join(root, "docmap"))
    n1 = docmap1.count()
    want = [(r.doc_id, round(r.score, 9)) for r in
            engine.bm25_topk(spark, root, "incrementalToken", k=20).collect()]

    append_documents(spark, root, batch)  # the retry
    docmap2 = spark.read.parquet(os.path.join(root, "docmap"))
    assert docmap2.count() == n1
    assert (docmap2.groupBy("doc_id").count().filter("count > 1").count()
            == 0)
    got = [(r.doc_id, round(r.score, 9)) for r in
           engine.bm25_topk(spark, root, "incrementalToken", k=20).collect()]
    assert got == want


def test_reappend_resurrects_deleted_doc(spark, tmp_path):
    """Re-appending a previously deleted document at the SAME commit must
    restore it (reference updateDocument = delete+add), i.e. the stale
    tombstone is removed instead of the row being silently dropped forever."""
    from luceneindexer_spark.ops.maintenance import read_deletes
    from luceneindexer_spark.ops.maintenance import append_deletes

    root = str(tmp_path / "idx_rez")
    build_index(spark, synth_corpus(spark, 100, partitions=2), root,
                n_buckets=4, range_size=64, waves=1)
    batch = _new_docs(spark, 3, "rz")
    append_documents(spark, root, batch)
    hits = engine.bm25_topk(spark, root, "incrementalToken", k=10).collect()
    assert len(hits) == 3
    victim = hits[0].doc_id

    append_deletes(spark, root, [int(victim)])
    assert {r.doc_id for r in
            engine.bm25_topk(spark, root, "incrementalToken",
                             k=10).collect()} == {
        r.doc_id for r in hits} - {victim}

    # same batch replayed (equal commits) → the victim is resurrected
    append_documents(spark, root, batch)
    got = {r.doc_id for r in
           engine.bm25_topk(spark, root, "incrementalToken", k=10).collect()}
    assert got == {r.doc_id for r in hits}
    assert read_deletes(spark, root).count() == 0
    # and no duplicate rows were appended
    docmap = spark.read.parquet(os.path.join(root, "docmap"))
    assert docmap.filter(F.col("repo").startswith("inc/")).count() == 3


def test_upsert_tombstones_never_hit_driver(spark, tmp_path, monkeypatch):
    """VERDICT r3 wrong #2: the supersede/resurrect sets must flow as
    DataFrames (anti-joins), never as Python lists — the list-based
    maintenance entry points are poisoned and a full supersede+resurrect
    cycle must still work."""
    import luceneindexer_spark.ops.maintenance as mnt

    root = str(tmp_path / "idx_nolist")
    build_index(spark, synth_corpus(spark, 100, partitions=2), root,
                n_buckets=4, range_size=64, waves=1)
    batch = _new_docs(spark, 4, "nl")
    append_documents(spark, root, batch)

    def boom(*a, **kw):
        raise AssertionError("driver-list tombstone path used")

    monkeypatch.setattr(mnt, "append_deletes", boom)
    monkeypatch.setattr(mnt, "remove_deletes", boom)
    # supersede: newer commits tombstone the old generation via the df path
    v2 = (batch.withColumn("commit", F.concat(F.lit("z"),
                                              F.col("commit").substr(2, 39)))
          .withColumn("content",
                      F.concat(F.col("content"), F.lit(" nolistToken"))))
    append_documents(spark, root, v2)
    assert engine.bm25_topk(spark, root, "nolistToken", k=10).count() == 4
    from luceneindexer_spark.ops.maintenance import read_deletes
    assert read_deletes(spark, root).count() == 4
    # resurrect: replaying v2 (equal commits) with every v2 id tombstoned
    ids = [int(r.doc_id) for r in
           engine.bm25_topk(spark, root, "nolistToken", k=10).collect()]
    (spark.createDataFrame([(i,) for i in ids], "doc_id long")
     .coalesce(1).write.mode("append")
     .parquet(mnt.delete_list_path(root)))
    assert engine.bm25_topk(spark, root, "nolistToken", k=10).count() == 0
    append_documents(spark, root, v2)
    assert engine.bm25_topk(spark, root, "nolistToken", k=10).count() == 4


def test_large_batch_uses_scalable_numbering(spark, tmp_path, monkeypatch):
    """Above LARGE_BATCH_ROWS the append numbering degrades to the
    range-partitioned path; ids stay dense, contiguous, and deterministic
    (identical to what the window path would assign)."""
    import luceneindexer_spark.streaming.incremental as inc

    root = str(tmp_path / "idx_big")
    build_index(spark, synth_corpus(spark, 100, partitions=2), root,
                n_buckets=4, range_size=64, waves=1)
    monkeypatch.setattr(inc, "LARGE_BATCH_ROWS", 10)
    batch = _new_docs(spark, 40, "bg")  # 40 > 10 → scalable path
    append_documents(spark, root, batch)
    docmap = spark.read.parquet(os.path.join(root, "docmap"))
    added = docmap.filter(F.col("repo").startswith("inc/"))
    ids = sorted(r.doc_id for r in added.select("doc_id").collect())
    assert ids == list(range(128, 128 + 40))  # ceil(100/64)*64 = 128
    # numbering order matches the (repo, path, commit) global order
    by_order = [r.doc_id for r in
                added.orderBy("repo", "path", "commit").collect()]
    assert by_order == ids
    got = engine.bm25_topk(spark, root, "incrementalToken", k=50).collect()
    assert len(got) == 40


def test_watch_corpus_ingests_backlog(spark, tmp_path):
    root = str(tmp_path / "idx3")
    build_index(spark, synth_corpus(spark, 100, partitions=2), root,
                n_buckets=4, range_size=64, waves=1)
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    _new_docs(spark, 12, "w1").coalesce(1).write.mode("append").parquet(src)
    q = watch_corpus(spark, root, src, str(tmp_path / "ckpt"))
    q.awaitTermination()
    docmap = spark.read.parquet(os.path.join(root, "docmap"))
    assert docmap.count() == 112
    got = engine.bm25_topk(spark, root, "incrementalToken", k=20).collect()
    assert len(got) == 12


def test_windowed_watermark_drops_late_events(spark, tmp_path):
    """Watermarked windowed agg, append mode, across TWO deterministic
    passes (same checkpoint, new file between passes): pass 1 finalizes
    windows 00 and 01; pass 2's too-late event (00:45, far below the
    watermark) is DROPPED — window 00 is never re-emitted — while the
    carried state of window 02 finalizes with events from BOTH passes."""
    import datetime as dt

    from luceneindexer_spark.streaming.windowed import run_windowed_batch

    src = str(tmp_path / "ev_src")
    ck = str(tmp_path / "ev_ck")
    os.makedirs(src)
    schema = "ts timestamp, event_type string, value double"

    def ts(h, m):
        return dt.datetime(2026, 1, 1, h, m)

    import glob
    import shutil

    def stage_file(df, name):
        # the file stream source lists only the top level — land each
        # batch as a single part file directly in src/
        tmp = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    batch_a = spark.createDataFrame(
        [(ts(0, 5), "a", 1.0), (ts(0, 35), "a", 1.0),
         (ts(1, 5), "a", 1.0), (ts(1, 35), "a", 1.0),
         (ts(2, 5), "a", 1.0)], schema)
    stage_file(batch_a, "a")
    sink = str(tmp_path / "ev_sink")
    out1 = run_windowed_batch(spark, src, ck, batch_a.schema,
                              delay="30 minutes", sink_dir=sink)
    rows1 = {(r.win_start.hour, r.event_type): int(r.n)
             for r in out1.collect()}
    # watermark after pass 1 = 02:05 − 30min = 01:35; finalized = windows
    # with end <= 01:35 → only window 00 (windows 01, 02 stay pending)
    assert rows1 == {(0, "a"): 2}

    batch_b = spark.createDataFrame(
        [(ts(0, 45), "a", 1.0),    # too late: below the 01:35 watermark
         (ts(2, 35), "a", 1.0)],   # watermark → 02:05, finalizes window 01
        schema)
    stage_file(batch_b, "b")
    out2 = run_windowed_batch(spark, src, ck, batch_a.schema,
                              delay="30 minutes", sink_dir=sink)
    rows2 = {(r.win_start.hour, r.event_type): int(r.n)
             for r in out2.collect()}
    # the 00:45 straggler is DROPPED: were it accepted, window 00 (state
    # already evicted) would re-emit as a fresh (0, 'a'): 1 row here
    assert rows2 == {(1, "a"): 2}

    batch_c = spark.createDataFrame([(ts(3, 31), "a", 1.0)], schema)
    stage_file(batch_c, "c")
    out3 = run_windowed_batch(spark, src, ck, batch_a.schema,
                              delay="30 minutes", sink_dir=sink)
    rows3 = {(r.win_start.hour, r.event_type): int(r.n)
             for r in out3.collect()}
    # window 02 finalizes with events from BOTH pass 1 (02:05) and pass 2
    # (02:35) — windowed state carried across micro-batches
    assert rows3 == {(2, "a"): 2}


def test_first_seen_dedups_across_micro_batches(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: keys replayed in a LATER
    micro-batch are dropped (state store carries seen-keys across batches);
    within-batch duplicates collapse to one row with the right count."""
    import json as _json
    import time as _time

    from luceneindexer_spark.streaming.stateful import first_seen

    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_batch(name, rows):
        # one json file per micro-batch (maxFilesPerTrigger=1)
        with open(os.path.join(src, name), "w") as f:
            for k, ts in rows:
                f.write(_json.dumps({"k": k, "ts": ts}) + "\n")

    # batch 1: a twice, b once     batch 2: a replayed, c new
    write_batch("b1.json", [("a", 100), ("a", 101), ("b", 200)])
    _time.sleep(0.05)
    write_batch("b2.json", [("a", 300), ("c", 400)])

    events = (spark.readStream.schema("k string, ts long")
              .option("maxFilesPerTrigger", "1").json(src))
    out = first_seen(events, "k")
    q = (out.writeStream.format("memory").queryName("first_seen_t")
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = {r.key: (r.first_ts, r.n_events)
            for r in spark.sql("SELECT * FROM first_seen_t").collect()}
    # every key exactly once, from its FIRST batch, with that batch's count
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"] == (100, 2)     # two in-batch occurrences collapsed
    assert rows["b"] == (200, 1)
    assert rows["c"] == (400, 1)     # later-batch new key still emitted


def test_sessionize_gap_boundaries(spark):
    """sessionize: events merge while each lands within gap of the
    previous — INCLUSIVE at exactly gap (pinned: the oracle's break
    condition must be diff > gap, not >=) — and break beyond it; keys
    never share sessions."""
    import datetime as dt

    from luceneindexer_spark.streaming.windowed import sessionize
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0, 1.0),
        (1, t0 + 59 * m, 2.0),          # < gap: merges
        (1, t0 + 119 * m, 4.0),         # chains
        (1, t0 + 179 * m, 8.0),         # EXACTLY gap after prev: merges
        (1, t0 + 240 * m, 16.0),        # 61 min > gap: new session
        (2, t0, 32.0),                  # other key, own session
    ]
    df = spark.createDataFrame(rows,
                               "user_id long, ts timestamp, value double")
    got = sorted(
        (int(r.user_id), r.session_start, int(r.n_events),
         float(r.value_sum))
        for r in sessionize(df, "user_id", gap="60 minutes").collect())
    assert got == [
        (1, t0, 4, 15.0),
        (1, t0 + 240 * m, 1, 16.0),
        (2, t0, 1, 32.0),
    ]


def _one_doc(spark, path, commit, token):
    return spark.createDataFrame(
        [("inc/dbn", path, commit, "python", f"def f(): return {token}")],
        "repo string, path string, commit string, lang string, "
        "content string")


def test_watch_debounce_continuous_one_generation(spark, tmp_path):
    """ST2 in continuous mode (reference cFolderWatcher.java:432-448): two
    rapid versions of one doc, then quiet — exactly ONE index generation
    (the latest commit) results; the first version never reaches the index.
    processingTime trigger + injected clock, fully deterministic."""
    from luceneindexer_spark.streaming.incremental import flush_pending

    root = str(tmp_path / "idx_dbn")
    build_index(spark, synth_corpus(spark, 100, partitions=2), root,
                n_buckets=4, range_size=64, waves=1)
    src = str(tmp_path / "incoming_dbn")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt_dbn")
    clock = {"t": 1000.0}
    q = watch_corpus(spark, root, src, ckpt,
                     trigger_interval="1 seconds", debounce_s=30.0,
                     _clock=lambda: clock["t"])
    docmap_path = os.path.join(root, "docmap")
    try:
        _one_doc(spark, "src/dbn/a.py", "commit-a1",
                 "debounceTokenOld").coalesce(1).write.mode(
            "append").parquet(src)
        q.processAllAvailable()
        assert spark.read.parquet(docmap_path).count() == 100  # pending

        clock["t"] += 5.0   # within the quiet window: v2 re-arms the timer
        _one_doc(spark, "src/dbn/a.py", "commit-a2",
                 "debounceTokenNew").coalesce(1).write.mode(
            "append").parquet(src)
        q.processAllAvailable()
        assert spark.read.parquet(docmap_path).count() == 100  # re-armed

        clock["t"] += 40.0  # past the quiet window; a later event flushes
        _one_doc(spark, "src/dbn/b.py", "commit-b1",
                 "otherDoc").coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    docmap = spark.read.parquet(docmap_path)
    a_rows = docmap.filter(F.col("path") == "src/dbn/a.py").collect()
    assert [(r.commit) for r in a_rows] == ["commit-a2"]  # ONE generation
    assert docmap.count() == 101                          # b.py still held
    # the superseded v1 is nowhere: not in the docmap, not queryable
    assert engine.bm25_topk(spark, root, "debounceTokenOld", k=5).count() == 0
    assert engine.bm25_topk(spark, root, "debounceTokenNew", k=5).count() == 1
    # shutdown drain (the reference's queue drain on stop)
    assert flush_pending(spark, root, ckpt) == 1
    assert spark.read.parquet(docmap_path).count() == 102


def test_watch_debounce_available_now_across_runs(spark, tmp_path):
    """The same quiet-period compaction across TWO availableNow watcher runs
    sharing a checkpoint (the scheduled-rescan mode): v1 staged by run 1,
    v2 arriving in run 2 supersedes it in the pool; the forced drain emits
    exactly one generation."""
    from luceneindexer_spark.streaming.incremental import flush_pending

    root = str(tmp_path / "idx_dbn2")
    build_index(spark, synth_corpus(spark, 100, partitions=2), root,
                n_buckets=4, range_size=64, waves=1)
    src = str(tmp_path / "incoming_dbn2")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt_dbn2")
    clock = {"t": 2000.0}
    _one_doc(spark, "src/dbn/c.py", "commit-c1",
             "debounceAcrossRuns").coalesce(1).write.mode(
        "append").parquet(src)
    q = watch_corpus(spark, root, src, ckpt, debounce_s=30.0,
                     _clock=lambda: clock["t"])
    q.awaitTermination()
    clock["t"] += 5.0
    _one_doc(spark, "src/dbn/c.py", "commit-c2",
             "debounceAcrossRuns").coalesce(1).write.mode(
        "append").parquet(src)
    q = watch_corpus(spark, root, src, ckpt, debounce_s=30.0,
                     _clock=lambda: clock["t"])
    q.awaitTermination()
    docmap_path = os.path.join(root, "docmap")
    assert spark.read.parquet(docmap_path).count() == 100  # both runs held
    assert flush_pending(spark, root, ckpt) == 1
    docmap = spark.read.parquet(docmap_path)
    c_rows = docmap.filter(F.col("path") == "src/dbn/c.py").collect()
    assert [r.commit for r in c_rows] == ["commit-c2"]


def test_debounce_staging_swap_crash_repair(spark, tmp_path):
    """A crash between _swap_dir's two renames leaves the pool at
    <stage>.old with no live dir; the next debounce entry (or drain) must
    restore it — held docs may never silently vanish."""
    from luceneindexer_spark.streaming.incremental import flush_pending

    root = str(tmp_path / "idx_repair")
    build_index(spark, synth_corpus(spark, 100, partitions=2), root,
                n_buckets=4, range_size=64, waves=1)
    src = str(tmp_path / "incoming_repair")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt_repair")
    clock = {"t": 500.0}
    _one_doc(spark, "src/r.py", "commit-r1", "repairedToken").coalesce(
        1).write.mode("append").parquet(src)
    q = watch_corpus(spark, root, src, ckpt, debounce_s=30.0,
                     _clock=lambda: clock["t"])
    q.awaitTermination()
    stage = ckpt + "_debounce"
    assert os.path.exists(os.path.join(stage, "_SUCCESS"))
    os.rename(stage, stage + ".old")        # simulate the crash window
    assert flush_pending(spark, root, ckpt) == 1
    docmap = spark.read.parquet(os.path.join(root, "docmap"))
    assert docmap.filter(F.col("path") == "src/r.py").count() == 1
