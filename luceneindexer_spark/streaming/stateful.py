"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's watcher dedupes only WITHIN its 4-second debounce window
(``drives/folderwatcher/cFolderWatcher.java:432-448``) — an event replayed a
minute later is reprocessed. These operators carry state ACROSS micro-batches
through Spark's versioned state store, the Structured Streaming analog the
task brief names for custom stateful semantics.

Scale shape: state is partitioned by the grouping key exactly like any
keyed aggregation — each task holds only its keys' state rows, checkpointed
incrementally with the query. ``first_seen`` keeps ONE tiny row per key
(the seen marker), so state size is bounded by distinct keys, not events.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen(events: DataFrame, key_col: str) -> DataFrame:
    """Cross-batch exactly-first dedup: emit each key's FIRST occurrence
    ever; every later event with the same key — in the same micro-batch or
    any later one — is dropped. Composed with the at-least-once
    file-watcher source this gives effectively-once processing of new
    documents.

    Input: a streaming DataFrame with (``key_col``, ``ts`` long, ...).
    Output: one (key, first_ts, n_events) row per key, emitted in the
    first micro-batch that contains it (n_events counts that batch's
    occurrences; later batches only bump the state counter — the dedup
    decision record). Join back to the payload stream on (key, first_ts)
    when the full first row is needed; carrying arbitrary payloads through
    the typed state channel would pin a schema per caller.
    """
    out_schema = "key string, first_ts long, n_events long"
    state_schema = "seen boolean, first_ts long, n_events long"

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        n_new = 0
        ts_min = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_new += len(pdf)
            t = int(pdf["ts"].min())
            ts_min = t if ts_min is None else min(ts_min, t)
        if state.exists:
            seen, first_ts, n_events = state.get
            state.update((True, int(first_ts), int(n_events) + n_new))
            return  # key already emitted in an earlier batch: drop all
        if ts_min is None:
            # all-empty invocation with no prior state (possible under
            # future timeout modes): a no-op, not a TypeError in the
            # executor (ADVICE r3)
            return
        state.update((True, int(ts_min), n_new))
        yield pd.DataFrame({"key": [key[0]], "first_ts": [int(ts_min)],
                            "n_events": [n_new]})

    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType, TimestampType
    ts_type = events.schema["ts"].dataType
    # TIMESTAMP(_NTZ) -> epoch seconds (Spark 4 forbids a direct long cast);
    # numeric ts columns cast straight through
    ts_col = (F.col("ts").cast("timestamp").cast("long")
              if isinstance(ts_type, (TimestampType, TimestampNTZType))
              else F.col("ts").cast("long"))
    return (events
            .select(F.col(key_col).cast("string").alias("key"),
                    ts_col.alias("ts"))
            .groupBy("key")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))


def first_seen_events(spark, sf_dir: str) -> DataFrame:
    """Contract wrapper: run ``first_seen`` keyed on user_id over the
    driver's events table as ONE availableNow micro-batch → append-mode
    memory sink. With a single batch the result is SQL-expressible
    (min ts + count per key), which puts the applyInPandasWithState
    operator itself under the hash-checked DuckDB oracle; the cross-batch
    state behavior is pinned by test_first_seen_dedups_across_micro_batches.
    """
    import os
    import tempfile
    import time

    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    stage = tempfile.mkdtemp(prefix="events_state_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(path), link)
    name = f"first_seen_{int(time.time() * 1000) % 10 ** 9}"
    # pin SINGLE-batch behavior explicitly (ADVICE r3): the oracle counts
    # ALL events per key, so availableNow must not split the staged input
    # into several micro-batches (n_events would only reflect the first)
    events = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1_000_000)
              .parquet(stage))
    q = (first_seen(events, "user_id")
         .writeStream.outputMode("append").format("memory")
         .option("checkpointLocation", os.path.join(stage, "ckpt"))
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    data_batches = [p for p in q.recentProgress
                    if int(p.get("numInputRows", 0)) > 0]
    if len(data_batches) != 1:
        raise RuntimeError(
            f"first_seen_events expected ONE data micro-batch, got "
            f"{len(data_batches)}: the per-key n_events would undercount")
    return spark.table(name)
