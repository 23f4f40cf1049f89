"""Table catalog: named-table abstraction over the testdata parquet layout.

The reference's fundamental abstraction is the named table enumerated from a
catalog query (``/root/reference/app/cloud-sql-query-runner/main.py:52-57``).
Here the catalog is the parquet directory; ``load`` is the scan source and
``register_views`` exposes every table to Spark SQL — the Spark analog of the
reference's "table list in a Pub/Sub message".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# (spark application id, sf_dir, table) -> resolved scan DataFrame.
# Resolving a table costs a file listing + footer schema read through py4j
# (~50-100 ms); a real engine resolves each catalog table ONCE (metastore),
# not once per query.  DataFrames are immutable plan fragments, so reuse is
# safe; the application id changes when a context is stopped/recreated, so
# stale sessions never serve cached entries.
_SCAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one named table.  Catalyst pushes filters and prunes
    columns into this parquet scan — the engine-side analog of the reference
    pushing WHERE/column selection into MySQL (SURVEY.md §4).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read nanos as long and convert to a microsecond
    timestamp (truncation — matches DuckDB's TIMESTAMP_NS→TIMESTAMP cast,
    so oracles stay value-identical)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(table_path(sf_dir, name))
        df = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    _SCAN_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every catalog table as a temp view for the SQL API."""
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def list_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Catalog enumeration (reference operator #1): the list of exportable
    tables.  On parquet the filesystem *is* information_schema.tables."""
    return [t for t in TABLES if os.path.exists(table_path(sf_dir, t))]
