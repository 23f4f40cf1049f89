"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``gcp_cloudsql_to_bigquery_spark.workload`` — the query
registry where every implemented operator from SURVEY.md §2 lives, each with
a PySpark callable and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gcp_cloudsql_to_bigquery_spark import workload
from gcp_cloudsql_to_bigquery_spark.session import configure_existing

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    configure_existing(spark)
    return workload.queries()["q1_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = workload.queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return workload.oracle_sql()
