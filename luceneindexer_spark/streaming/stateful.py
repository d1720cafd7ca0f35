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
        state.update((True, int(ts_min), n_new))
        yield pd.DataFrame({"key": [key[0]], "first_ts": [int(ts_min)],
                            "n_events": [n_new]})

    return (events
            .selectExpr(f"cast({key_col} as string) as key",
                        "cast(ts as long) as ts")
            .groupBy("key")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))
