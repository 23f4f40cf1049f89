"""Regression tests for the events physical-schema resolver.

Round 3 failed because batch and streaming each hardcoded the events.ts
physical encoding; when the testdata generator switched TIMESTAMP(NANOS) ->
timestamp[us], batch crashed and streaming silently read micros as nanos.
These tests pin: (a) the resolver derives the schema from the parquet
footer, (b) both encodings normalize to the same TimestampType values,
(c) batch and streaming reads agree.
"""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gcp_cloudsql_to_bigquery_spark.catalog import (
    events_physical_schema,
    load,
    normalize_events_ts,
    table_path,
)
from gcp_cloudsql_to_bigquery_spark.streaming.events import read_events_stream
from gcp_cloudsql_to_bigquery_spark.streaming.events import run_to_completion


def test_resolver_matches_parquet_footer(spark, sf_dir):
    """The resolver's ts type must track the actual footer, not an assumption."""
    footer = pq.read_schema(table_path(sf_dir, "events")).field("ts").type
    resolved = events_physical_schema(spark, sf_dir)["ts"].dataType
    if pa.types.is_integer(footer):
        assert isinstance(resolved, T.LongType)
    else:
        # timestamp[us] without tz -> TIMESTAMP_NTZ; with tz -> TIMESTAMP
        assert isinstance(resolved, (T.TimestampType, T.TimestampNTZType))


def test_load_normalizes_ts_to_timestamp(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert df.filter(F.col("ts").isNull()).count() == 0


def test_both_encodings_normalize_identically(spark, tmp_path):
    """Write the same instants as int64-nanos and as timestamp[us]; both
    paths through normalize_events_ts must yield identical timestamps."""
    instants = [
        datetime.datetime(2024, 1, 1, 0, 0, 0),
        datetime.datetime(2024, 6, 15, 12, 34, 56, 789000),
        datetime.datetime(2025, 12, 31, 23, 59, 59, 999999),
    ]
    micros = [int(dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) for dt in instants]

    p_nanos = os.path.join(tmp_path, "nanos.parquet")
    p_us = os.path.join(tmp_path, "us.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([m * 1000 for m in micros], pa.timestamp("ns"))}),
        p_nanos,
    )
    pq.write_table(pa.table({"ts": pa.array(micros, pa.timestamp("us"))}), p_us)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out_nanos = normalize_events_ts(spark.read.parquet(p_nanos))
    out_us = normalize_events_ts(spark.read.parquet(p_us))
    assert isinstance(out_nanos.schema["ts"].dataType, T.TimestampType)
    assert isinstance(out_us.schema["ts"].dataType, T.TimestampType)
    a = sorted(r["ts"] for r in out_nanos.collect())
    b = sorted(r["ts"] for r in out_us.collect())
    assert a == b == sorted(instants)


def test_stream_and_batch_reads_agree(spark, sf_dir):
    """min/max/count of ts must match between the batch scan and the
    streaming reader — the round-3 silent failure mode (micros-as-nanos)
    shrank every streaming timestamp 1000x and would fail this."""
    batch = load(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
    )
    stream = read_events_stream(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
    )
    b = batch.collect()[0]
    s = run_to_completion(stream, spark).collect()[0]
    assert (b["n"], b["lo"], b["hi"]) == (s["n"], s["lo"], s["hi"])
