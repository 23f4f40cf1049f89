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
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..registry import register
from .events import read_events_stream, run_to_completion

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, distinct_types bigint"
# total in integer MILLI-units (the repo's fixed-point discipline): a raw
# double fold accumulates in micro-batch order while the oracle sums in its
# own order — at a .xx5 representational boundary the 2dp round() diverges
# (hostile-data find).  Per-row floor(v*1000+0.5) is engine-identical, the
# integer sum is order-free, and milli/1000.0 needs no rounding at all.
STATE_SCHEMA = "n bigint, nv bigint, total_milli bigint, types array<string>"


def running_user_stats(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into per-user state; emit the running totals."""
    import numpy as np

    if state.exists:
        n, nv, total_milli, types = state.get
        types = list(types)
    else:
        n, nv, total_milli, types = 0, 0, 0, []
    for pdf in batches:
        n += len(pdf)
        # exact integer milli-units per row (see STATE_SCHEMA note).  NULL
        # values arrive as NaN and must be dropped BEFORE the floor: NaN
        # through floor().astype('int64') is INT64_MIN, silently corrupting
        # the total, while the oracle's sum() skips NULLs (ADVICE r12).
        vals = pdf["value"].to_numpy(dtype="float64")
        vals = vals[~np.isnan(vals)]
        nv += int(vals.size)
        total_milli += int(np.floor(vals * 1000.0 + 0.5).astype("int64").sum())
        for t in pdf["event_type"]:
            # count(DISTINCT event_type) skips NULLs; mirror that here.
            if t is not None and t not in types:
                types.append(t)
    state.update((n, nv, total_milli, types))
    # SQL sum() over zero non-null rows is NULL, not 0 — emit None then.
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total_milli / 1000.0 if nv else None],
            "distinct_types": [len(types)],
        }
    )


@register(
    "stream_stateful_user_stats",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000
             AS total_value,
           count(DISTINCT event_type) AS distinct_types
    FROM events
    GROUP BY user_id
    """,
    doc="applyInPandasWithState: per-user running (count, sum, distinct-type) "
    "state machine over the event stream; the update-mode sink holds one row "
    "per key PER MICRO-BATCH, so the final state is selected as the max-"
    "running-count row per key (the count is strictly monotone across the "
    "batches that touch a key) — correct for any batch split, not just a "
    "single-drain plan.",
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
    sunk = run_to_completion(stateful, spark, output_mode="update")
    return _final_state_rows(sunk, key="user_id", running_count="n_events")


def _final_state_rows(sunk: DataFrame, key: str, running_count: str) -> DataFrame:
    """Update-mode memory sinks accumulate one emitted row per key per
    micro-batch; the FINAL state row is the one with the largest running
    count (strictly increasing: a processor is only invoked for keys with
    rows in the batch).  row_number, not a max-join: one window pass."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy(key).orderBy(F.col(running_count).desc())
    return (
        sunk.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _tws_available() -> bool:
    """transformWithStateInPandas moves state traffic over a protobuf
    channel between the JVM and the Python state server; the ``protobuf``
    package is NOT bundled with pyspark and is absent from this container,
    so the operator is environment-gated (the brief's import-try rule)
    rather than left as a guaranteed-red registry row."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class _TypeTotalsProcessor(StatefulProcessor):
    """Per-event-type running (count, cent-exact total) via typed ValueState.

    The state carries a non-null-value counter ``nv`` alongside (n, cents):
    SQL ``sum()`` over zero non-null rows is NULL, so a key whose every
    ``cents`` is NULL must emit ``total_value`` None — the same contract
    ``running_user_stats`` adopted in r13 (ADVICE r13: carry nv NOW, before
    the protobuf promotion gate, not after)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "n BIGINT, cents BIGINT, nv BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        n, cents, nv = self._agg.get() if self._agg.exists() else (0, 0, 0)
        for pdf in rows:
            n += len(pdf)
            nv += int(pdf["cents"].notna().sum())
            # an all-NULL batch sums to NaN under min_count=1 — guard the
            # int() (the running_user_stats NaN-fold crash class).
            s = pdf["cents"].sum(min_count=1)
            cents += 0 if pd.isna(s) else int(s)
        self._agg.update((n, cents, nv))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n": [n],
                "total_value": [cents / 100.0 if nv > 0 else None],
            }
        )

    def close(self) -> None:
        pass


def stream_tws_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas (Spark 4 successor to
    applyInPandasWithState): a StatefulProcessor with a typed ValueState
    folds each micro-batch into per-event-type (count, cent-exact total);
    the max-count row per key (_final_state_rows) is the final state, equal
    to the batch GROUP BY (the oracle) under ANY micro-batch split.
    The new API brings named/typed state slots (value, list,
    map), timers, and TTL on a mandatory RocksDB state store — at scale
    that means state lives off-heap per key-range instead of executor
    heap, the difference between bounded and OOM for billions of keys.
    Registered only when the protobuf dependency exists (_tws_available)."""
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, sf_dir).select(
        "event_type", F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents")
    )
    out_schema = "event_type string, n bigint, total_value double"
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stateful = ev.groupBy("event_type").transformWithStateInPandas(
            _TypeTotalsProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        sunk = run_to_completion(stateful, spark, output_mode="update")
        return _final_state_rows(sunk, key="event_type", running_count="n")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


# The ANSI-SQL equivalent of stream_tws_type_totals' final state, kept for
# the environment-gated execution test (test_streaming_late.py) — NOT a
# registry oracle: the operator is explicitly OUT of the registry (VERDICT
# r5 item 4) because transformWithStateInPandas has never executed in this
# container (protobuf absent) and an unexercised operator must not enter
# the driver gate.  Where protobuf exists, the xfail test below runs the
# operator end-to-end against this SQL; promote it back into the registry
# only after that test has actually passed in the target environment.
TWS_ORACLE_SQL = """
SELECT event_type, count(*) AS n,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY event_type
"""
