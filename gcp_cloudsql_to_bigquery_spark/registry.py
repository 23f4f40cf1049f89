"""Query registry — the single source of truth behind ``__spark_entry__.py``.

Every implemented operator registers a named query: a PySpark callable
``fn(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the equivalent
ANSI SQL the DuckDB oracle runs on the same parquet.  The driver hash-compares
the two at sf0.01 (row-count + schema + order-insensitive value-hash), so:

- alias every computed column identically on both sides;
- round floating aggregates (``round(x, 2..6)``) on both sides so
  accumulation-order noise between Spark and DuckDB cannot flip the hash;
- row order is irrelevant (order-insensitive hash), column order too
  (driver sorts columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
