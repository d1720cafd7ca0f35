"""Corpus utilities: deterministic synthetic source-code corpus (BASELINE.json
input_hint shape) + docmap construction.

The reference's "corpus" is the filesystem walked at
``drives/cDrive.java:193-255``; each file becomes a 7-field document
(``lucene/cLuceneIndexWriter.java:102-113``) keyed by absolute path with
upsert semantics (``updateDocument``, W:115). Our corpus is a DataFrame with
columns (repo, path, commit, lang, content); the docmap is the Spark-native
"stored fields" row store (SURVEY.md §1.5): the deduplicated snapshot plus
derived columns (dense doc_id, doclen, content_sha256 — the per-row
invariant).

Scale notes
-----------
- doc_id assignment is a deterministic dense numbering over the global sort
  order (repo, path, commit). We range-repartition by the sort key, then take
  ``row_number`` within each partition plus a broadcast per-partition offset —
  never a single-partition window. The intermediate is persisted so the
  sampled range boundaries cannot drift between the count pass and the
  numbering pass.
- upsert/latest-wins dedup is one window per (repo, path) — this replaces the
  reference's per-document ``updateDocument`` upsert (W:115).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# synthetic corpus (FIXTURES.md §1)
# ---------------------------------------------------------------------------

LANG_BY_EXT = {"py": "python", "java": "java", "scala": "scala",
               "js": "javascript", "go": "go", "md": "markdown"}
_EXTS = list(LANG_BY_EXT)

HOT_TERM = "sharedlogger"          # planted in >50% of docs (skew test)
RARE_TERM = "xyzzyplugh"           # planted in exactly 3 known docs
PHRASE = "block max wand"          # planted exact phrase
DUP_EVERY = 97                     # ~1% exact-duplicate contents

_VOCAB = [
    "getUserName", "parse_json_fast", "HttpClient", "readBuffer", "writeIndex",
    "mergeSegments", "tokenStream", "queryParser", "scoreDocs", "openReader",
    "closeWriter", "deleteStale", "hashContent", "walkTree", "threadPool",
    "commitPoint", "fieldNorm", "termFreq", "docValues", "postingList",
    "blockEncode", "varintGap", "skipData", "maxScore", "heapSelect",
    "def", "class", "return", "import", "public", "static", "void", "int",
    "string", "float", "self", "super", "lambda", "yield", "async", "await",
    "config", "logger", "buffer", "stream", "index", "search", "query",
    "merge", "flush", "cache", "shard", "replica",
]


def _doc_tokens(rng: np.random.Generator, zipf_p: np.ndarray, n: int) -> list[str]:
    idx = rng.choice(len(_VOCAB), size=n, p=zipf_p)
    return [_VOCAB[i] for i in idx]


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42,
                 partitions: int = 8) -> DataFrame:
    """Deterministic synthetic source-code corpus, generated distributively.

    Determinism: every row is derived from its row id alone (per-doc RNG seeded
    with (seed, i)), so the output is independent of partitioning/parallelism.
    """
    ranks = np.arange(1, len(_VOCAB) + 1, dtype=np.float64)
    zipf_p = (ranks ** -1.1) / (ranks ** -1.1).sum()

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                rng = np.random.default_rng((seed, i))
                n = int(rng.integers(20, 400))
                toks = _doc_tokens(rng, zipf_p, n)
                if rng.random() < 0.55:
                    toks.insert(int(rng.integers(0, len(toks))), HOT_TERM)
                if i in (7, 101, 202) and i < n_docs:
                    toks.append(RARE_TERM)
                if i % 53 == 11:
                    toks.extend(PHRASE.split())
                if i % DUP_EVERY == 1 and i >= DUP_EVERY:
                    # exact duplicate of the content of doc (i - DUP_EVERY)
                    j = i - DUP_EVERY
                    rngj = np.random.default_rng((seed, j))
                    nj = int(rngj.integers(20, 400))
                    toks = _doc_tokens(rngj, zipf_p, nj)
                    if rngj.random() < 0.55:
                        toks.insert(int(rngj.integers(0, len(toks))), HOT_TERM)
                    if j in (7, 101, 202):
                        toks.append(RARE_TERM)
                    if j % 53 == 11:
                        toks.extend(PHRASE.split())
                content = " ".join(toks)
                ext = _EXTS[i % len(_EXTS)]
                repo = f"org{i % 7}/repo{i % 23}"
                path = f"src/m{i % 13}/f{i}.{ext}"
                rev = 0
                commit = hashlib.sha256(
                    f"{repo}/{path}/{rev}".encode()).hexdigest()[:40]
                rows.append((repo, path, commit, LANG_BY_EXT[ext], content))
                if i % 20 == 3:  # ~5% of keys get a second revision (upsert test)
                    commit2 = hashlib.sha256(
                        f"{repo}/{path}/1".encode()).hexdigest()[:40]
                    rows.append((repo, path, commit2, LANG_BY_EXT[ext],
                                 content + " revisedLine extraToken"))
            yield pd.DataFrame(rows, columns=["repo", "path", "commit",
                                              "lang", "content"])

    return (spark.range(0, n_docs, numPartitions=partitions)
            .mapInPandas(gen, "repo string, path string, commit string, "
                              "lang string, content string"))


def doc_path_col() -> "F.Column":
    """Deterministic per-doc path for documents-derived docmaps. One third of
    the paths carry camelCase components (readMe<N>/theFile.txt) so the
    parsed multi-field contract can prove ANALYZED metadata matching: the
    token "file" exists only because the code-aware tokenizer splits
    "theFile" at the camel boundary (substring search on the raw path cannot
    produce it as a token). Mirrored exactly in __spark_entry__'s DuckDB
    oracle SQL (DOC_PATH_SQL)."""
    return F.when(
        F.col("doc_id") % 3 == 0,
        F.format_string("doc/readMe%d/theFile.txt", F.col("doc_id"))
    ).otherwise(F.format_string("doc/plain%d/notes.txt", F.col("doc_id")))


#: the same path expression for DuckDB oracles (keep in sync with doc_path_col)
DOC_PATH_SQL = ("CASE WHEN doc_id % 3 = 0 "
                "THEN 'doc/readMe' || doc_id || '/theFile.txt' "
                "ELSE 'doc/plain' || doc_id || '/notes.txt' END")


def corpus_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's `documents` table (doc_id, text, lang, source,
    n_chars) to the corpus shape — source plays repo, doc_id plays path."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("source").alias("repo"),
        doc_path_col().alias("path"),
        F.sha2(F.col("text").cast("binary"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


# ---------------------------------------------------------------------------
# docmap (dedup + dense deterministic doc_id + derived columns)
# ---------------------------------------------------------------------------

DOC_KEY = ("repo", "path")
DOC_ORDER = ("repo", "path", "commit")


def assign_dense_ids(df: DataFrame, partitions: int, start_id: int = 0
                     ) -> tuple[DataFrame, DataFrame]:
    """Deterministic dense ``doc_id`` = ``start_id`` + rank in the global
    (repo, path, commit) order: range-repartition by the sort key, then
    ``row_number`` within each partition plus a broadcast per-partition
    offset — never a single-partition window, so the numbering scales to
    any input size. Returns (numbered_df, persisted_intermediate); the
    caller unpersists the intermediate after materializing (it is persisted
    so the boundary-sampling pass and the count pass see the same rows).
    The exact row count lands on ``numbered_df._dense_total`` (known for
    free from the offset pass — callers size balanced output files off it
    without paying a count job)."""
    sorted_df = (
        df.repartitionByRange(partitions, *DOC_ORDER)
        .sortWithinPartitions(*DOC_ORDER)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["cnt"] for r in
              sorted_df.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = start_id
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv])

    w = Window.partitionBy("_pid").orderBy(*DOC_ORDER)
    numbered = (
        sorted_df
        .withColumn("_local", F.row_number().over(w) - 1)
        .withColumn("doc_id", (offset_map[F.col("_pid")] + F.col("_local"))
                    .cast("long"))
        .drop("_pid", "_local")
    )
    numbered._dense_total = acc - start_id
    return numbered, sorted_df


def build_docmap(corpus: DataFrame, partitions: int | None = None,
                 write_path: str | None = None,
                 hash_head_bytes: int | None = None) -> DataFrame:
    """Latest-commit-wins dedup + deterministic dense doc_id + sha256.

    Returns columns: doc_id, repo, path, commit, lang, size,
    content_sha256, content. Deterministic: doc_id is the rank in the global
    (repo, path, commit) order, independent of parallelism. Never tokenizes —
    doc lengths live in the index's DOCLEN_TERM postings (index.build), so
    the corpus is tokenized exactly once, in the wave build.

    ``hash_head_bytes``: hash only the first N characters of ``content``
    (the reference's first-block hashing option,
    ``cryptopackage/cCryptographer.java:643-646`` — SHA-256 over the first
    4096 bytes as cheap change detection). Default None = full-content
    hash (the per-row invariant the driver contract checks). At 100 TB the
    head mode makes rescan change-detection proportional to file COUNT,
    not byte volume — rehashing unchanged multi-GB blobs is the dominant
    rescan cost otherwise. ``size`` always reflects the full content.
    """
    spark = corpus.sparkSession
    if partitions is None:
        partitions = corpus.sparkSession.sparkContext.defaultParallelism

    latest = (
        corpus.withColumn(
            "_rn", F.row_number().over(
                Window.partitionBy(*DOC_KEY).orderBy(F.desc("commit"))))
        .filter(F.col("_rn") == 1).drop("_rn")
        # persisted because repartitionByRange's boundary-sampling pass would
        # otherwise re-execute the whole dedup window a second time
        .persist()
    )

    docmap, sorted_df = assign_dense_ids(latest, partitions)
    n_total = getattr(docmap, "_dense_total", 0)
    hashed = (F.col("content") if hash_head_bytes is None
              else F.substring("content", 1, int(hash_head_bytes)))
    docmap = (
        docmap
        .withColumn("size", F.length("content").cast("long"))
        .withColumn("content_sha256", F.sha2(hashed.cast("binary"), 256))
        .select("doc_id", "repo", "path", "commit", "lang", "size",
                "content_sha256", "content")
    )
    if write_path is not None:
        # already range-partitioned AND sorted by doc_id: doc_id is the dense
        # rank over the (repo, path, commit) order that defined the range
        # partitioning — writing as-is gives doc_id-clustered row groups for
        # per-wave predicate pushdown with NO extra shuffle/sampling pass.
        # maxRecordsPerFile caps every output file at ceil(N/partitions)
        # rows: the RangePartitioner's sampled boundaries can land 2x off
        # (observed: one partition with twice the rows even at 100x the
        # sample size), and a 2x file is a 2x straggler task for every
        # downstream docmap scan — the tokenize stage above all. The cap
        # restores near-equal major files (plus negligible row-remainder
        # tails) with NO extra shuffle, keeping doc_id clustering intact.
        writer = docmap.write.mode("overwrite")
        if n_total:
            writer = writer.option(
                "maxRecordsPerFile",
                max(1, -(-int(n_total) // max(1, partitions))))
        writer.parquet(write_path)
        sorted_df.unpersist()
        latest.unpersist()
        return spark.read.parquet(write_path)
    return docmap


def docmap_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docmap straight from the driver `documents` table, reusing its dense
    doc_id (already 0..N-1). Used by __spark_entry__ oracle queries. Shares
    build_docmap's exact schema — and like it never tokenizes (doc lengths
    live in the index's DOCLEN_TERM postings), keeping 'tokenized exactly
    once' true for this producer too."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").alias("repo"),
        doc_path_col().alias("path"),
        F.sha2(F.col("text").cast("binary"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("n_chars").cast("long").alias("size"),
        F.sha2(F.col("text").cast("binary"), 256).alias("content_sha256"),
        F.col("text").alias("content"),
    )
