"""Custom stateful streaming operator: per-user running aggregates via
``applyInPandasWithState`` (SURVEY.md §2B "Streaming: stateful / dedup").

The built-in windows cover time-bucketed state; this is the escape hatch
for arbitrary per-key state machines (session enrichment, running counters,
fraud scores).  State here: (n_events, total_value, max_ts) per user,
emitted once per key when the stream drains (availableNow).

At scale the state store shards by key across executors; the watermark
bounds retention.  Deterministic for tests because the fixture stream is a
single availableNow drain.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register
from .events import read_events_stream, run_to_completion

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, distinct_types bigint"
STATE_SCHEMA = "n bigint, total double, types array<string>"


def running_user_stats(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into per-user state; emit the running totals."""
    if state.exists:
        n, total, types = state.get
        types = list(types)
    else:
        n, total, types = 0, 0.0, []
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        for t in pdf["event_type"]:
            if t not in types:
                types.append(t)
    state.update((n, total, types))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "distinct_types": [len(types)],
        }
    )


@register(
    "stream_stateful_user_stats",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           count(DISTINCT event_type) AS distinct_types
    FROM events
    GROUP BY user_id
    """,
    doc="applyInPandasWithState: per-user running (count, sum, distinct-type) "
    "state machine over the event stream; one availableNow drain makes the "
    "final state equal the batch aggregate (the oracle).",
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir).select("user_id", "event_type", "value")
    stateful = ev.groupBy("user_id").applyInPandasWithState(
        running_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_completion(stateful, spark, output_mode="update")
