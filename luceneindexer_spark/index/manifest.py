"""Checkpoint manifest: per-partition build lineage + metrics.

Spark-native analog of the reference's scan checkpoint metadata
(``persistance/cMetadata.java:40-43,109-153`` — per-drive ``lastscan`` /
``status`` / ``indexed`` / ``duration`` properties) and of Lucene's commit
point (``cLuceneIndexWriter.java:161,176-195``). Per BASELINE.json north_rule
the manifest records, for every build partition (doc-id range): partition id,
input snapshot, postings written, bytes, wall time — and a killed build
restarts only unfinished partitions (see index.build.build_index resume path).

Rows are appended as small parquet files per completed wave; the final atomic
"commit" is a ``_PUBLISHED`` marker written via tmp-file + rename (the
Spark-native analog of ``IndexWriter.commit``).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "stage string, partition_id long, wave int, input_snapshot string, "
    "n_docs long, n_postings long, bytes long, wall_time_s double, "
    "status string, attempt int, finished_at string"
)

STATUS_COMPLETE = "complete"


def manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifest")


_PA_TYPES = {"string": "string", "long": "int64", "int": "int32",
             "double": "float64", "boolean": "bool_"}


def _pa_schema(ddl: str):
    import pyarrow as pa
    fields = []
    for part in ddl.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        fields.append(pa.field(name, getattr(pa, _PA_TYPES[typ])()))
    return pa.schema(fields)


def write_local_parquet(path: str, columns: dict, schema: str,
                        filename: str = "part-00000.parquet",
                        append: bool = False) -> None:
    """Driver-side parquet write for TINY control tables (manifest rows,
    corpus stats): a direct pyarrow write costs ~ms where a 1-row Spark job
    costs ~0.5s of scheduling — these fixed costs are what caps build
    scaling at small corpus sizes. Fully readable by spark.read.parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    if append:
        filename = f"part-{int(time.time() * 1e6)}-{os.getpid()}.parquet"
    table = pa.Table.from_pydict(columns, schema=_pa_schema(schema))
    tmp = os.path.join(path, "." + filename + ".tmp")
    pq.write_table(table, tmp)
    if not append:
        # overwrite semantics must clear EVERY previous data file, not just
        # our own fixed filename — a prior Spark writer leaves
        # part-00000-<uuid> files that would otherwise survive as stale rows
        for f in os.listdir(path):
            if f.endswith(".parquet") and f != filename:
                try:
                    os.remove(os.path.join(path, f))
                except OSError:
                    pass
    os.replace(tmp, os.path.join(path, filename))


def append_rows(spark: SparkSession, root: str, rows: list[dict]) -> None:
    if not rows:
        return
    cols = ("stage", "partition_id", "wave", "input_snapshot", "n_docs",
            "n_postings", "bytes", "wall_time_s", "status", "attempt",
            "finished_at")
    write_local_parquet(
        manifest_dir(root),
        {c: [r[c] for r in rows] for c in cols},
        MANIFEST_SCHEMA, append=True)


def read_manifest(spark: SparkSession, root: str) -> DataFrame | None:
    path = manifest_dir(root)
    if not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def completed_partitions(spark: SparkSession, root: str, stage: str,
                         snapshot: str) -> dict[int, int]:
    """{partition_id: max attempt} of partitions already complete for this
    stage + input snapshot. Resume = all_partitions − these."""
    m = read_manifest(spark, root)
    if m is None:
        return {}
    rows = (m.filter((F.col("stage") == stage)
                     & (F.col("input_snapshot") == snapshot)
                     & (F.col("status") == STATUS_COMPLETE))
            .groupBy("partition_id").agg(F.max("attempt").alias("attempt"))
            .collect())
    return {int(r["partition_id"]): int(r["attempt"]) for r in rows}


def max_attempt(spark: SparkSession, root: str, stage: str) -> int:
    m = read_manifest(spark, root)
    if m is None:
        return 0
    r = m.filter(F.col("stage") == stage).agg(F.max("attempt")).collect()[0][0]
    return int(r) if r is not None else 0


def dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def now_iso() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def plan_path(root: str) -> str:
    return os.path.join(root, "_plan.json")


def write_plan(root: str, payload: dict) -> None:
    """Persist the build's planned geometry (range_size, n_buckets,
    positions, fields) BEFORE wave 0, tmp+rename. The manifest's
    completed-partition rows key on (stage, snapshot) with no geometry
    component, so a resume MUST re-plan under the identical geometry or
    old-geometry range ids would be treated as complete under a new one
    and the build would silently mix geometries (ADVICE r4). The sidecar
    makes the planned value explicit: resume prefers it over any default
    and errors on an explicit mismatch."""
    tmp = plan_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, plan_path(root))


def read_plan(root: str) -> dict | None:
    p = plan_path(root)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def publish(root: str, payload: dict) -> None:
    """Atomic commit marker (tmp write + rename — the parquet dirs themselves
    are already atomic per Spark's output-commit protocol)."""
    tmp = os.path.join(root, "_PUBLISHED.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(root, "_PUBLISHED"))


def published(root: str) -> dict | None:
    p = os.path.join(root, "_PUBLISHED")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
