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
    for sub in INDEX_SUBDIRS:
        shutil.rmtree(os.path.join(root, sub), ignore_errors=True)


def vacuum_docmap(spark: SparkSession, root: str) -> DataFrame:
    """Compaction view: docmap minus tombstones (physical rewrite would
    overwrite the docmap + affected postings partitions; returned lazily so
    callers control materialization)."""
    docmap = spark.read.parquet(os.path.join(root, "docmap"))
    return apply_deletes(docmap, read_deletes(spark, root))
