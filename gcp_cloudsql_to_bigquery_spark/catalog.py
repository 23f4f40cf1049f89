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


# (application id, sf_dir) -> resolved events StructType.  The footer read
# costs a file listing + py4j round-trip; like _SCAN_CACHE, resolve once
# per session (a metastore, not a per-query probe).
_EVENTS_SCHEMA_CACHE: dict[tuple[str, str], object] = {}


def events_physical_schema(spark: SparkSession, sf_dir: str):
    """Resolve the events table's PHYSICAL schema from the parquet footer.

    The testdata generator has shipped ``ts`` as TIMESTAMP(NANOS) (readable
    only as int64 under ``nanosAsLong``) and as plain ``timestamp[us]``
    (read as TIMESTAMP_NTZ) in different rounds.  A real engine resolves
    physical layout from file metadata, never from assumptions baked into
    two call sites — this function is the single source of truth for both
    the batch scan and the streaming reader."""
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    cached = _EVENTS_SCHEMA_CACHE.get(key)
    if cached is None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        cached = spark.read.parquet(table_path(sf_dir, "events")).schema
        _EVENTS_SCHEMA_CACHE[key] = cached
    return cached


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Convert ``ts`` to a session-TZ TimestampType regardless of the
    physical parquet encoding:

    - int64 (TIMESTAMP(NANOS) under ``nanosAsLong``): nanos -> micros
      (truncation — matches DuckDB's TIMESTAMP_NS→TIMESTAMP cast, so
      oracles stay value-identical)
    - TIMESTAMP_NTZ (``timestamp[us]`` with isAdjustedToUTC=false): cast
      to TIMESTAMP; the session TZ is pinned to UTC (session.py) so the
      instant is unchanged
    - already TIMESTAMP: pass through
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampType):
        return df
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one named table.  Catalyst pushes filters and prunes
    columns into this parquet scan — the engine-side analog of the reference
    pushing WHERE/column selection into MySQL (SURVEY.md §4).

    ``events.ts`` physical encoding varies by generator version; see
    :func:`normalize_events_ts`."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_events_ts(spark.read.parquet(table_path(sf_dir, name)))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    _SCAN_CACHE[key] = df
    return df


# (sf_dir, table) -> parquet row-group count; a pure file-footer property,
# so keyed on the path alone (no application id) and safe across sessions.
_SPLIT_CACHE: dict[tuple[str, str], int] = {}


def _scan_splits(sf_dir: str, name: str) -> int:
    """How many independent tasks a parquet scan of this table can fan out
    to — the row-group count from the file footer (a row group is the
    atomic scan split unit; ``maxPartitionBytes`` cannot cut inside one).
    Driver-side metadata read, cached per path; 0 when unreadable (caller
    treats that as 'unknown, do not touch the plan')."""
    key = (os.path.abspath(sf_dir), name)
    cached = _SPLIT_CACHE.get(key)
    if cached is None:
        try:
            import pyarrow.parquet as pq

            cached = pq.ParquetFile(table_path(sf_dir, name)).metadata.num_row_groups
        except Exception:
            cached = 0
        _SPLIT_CACHE[key] = cached
    return cached


def load_spread(spark: SparkSession, sf_dir: str, name: str, key: str) -> DataFrame:
    """``load`` plus a scale-adaptive fan-out for EXPENSIVE map-side work
    (guide §2.5 'input skew: one huge unsplittable file … repartition
    immediately after the read').

    The bench/test parquet files carry a SINGLE row group, so every scan is
    one task no matter ``maxPartitionBytes`` — measured r16: the minhash
    signature build (shingle explode + 64 aggregated hashes) and the PPJoin
    prefix machinery serialized ~7-9 s of their pipelines on one core of a
    32-core box.  When the footer says the scan cannot reach the session's
    shuffle width, hash-repartition on the row key so the heavy projection/
    partial-aggregation work downstream runs at full width; a keyed groupBy
    on the same key then reuses this exchange (no second shuffle).  On a
    real corpus (many files / many row groups) ``splits >= width`` and this
    is a NO-OP — the exchange exists only where the layout would otherwise
    cap the job at one core, and it moves each input byte exactly once.

    The spread key is a SYNTHETIC deterministic bucket —
    ``pmod(xxhash64(key), 20*width)`` (guide §2.5: deterministic so task
    retries re-derive the same placement, 20x the partition count so the
    bucket hash spreads evenly) — deliberately NOT the raw row key: a
    downstream ``groupBy(key)`` must KEEP its own exchange, because that
    post-aggregation exchange is the subtree Spark's exchange-reuse
    dedups when the aggregate feeds several consumers.  Spreading on the
    raw key elides that exchange and the reuse point collapses to this
    text-carrying spread — measured r16 on dedup_minhash_lsh: the
    64-hash signature aggregation re-ran once per consumer, 231 ->
    662 task-seconds.

    Only call this for tables feeding provably expensive per-row work
    (shingling, hashing, per-doc kernels) — cheap scans keep the plain
    ``load`` plan shape."""
    df = load(spark, sf_dir, name)
    splits = _scan_splits(sf_dir, name)
    if splits <= 0:
        return df
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    if splits >= width:
        return df
    from pyspark.sql import functions as F

    return df.repartition(
        width, F.pmod(F.xxhash64(F.col(key)), F.lit(20 * width))
    )


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every catalog table as a temp view for the SQL API."""
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def list_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Catalog enumeration (reference operator #1): the list of exportable
    tables.  On parquet the filesystem *is* information_schema.tables."""
    return [t for t in TABLES if os.path.exists(table_path(sf_dir, t))]
