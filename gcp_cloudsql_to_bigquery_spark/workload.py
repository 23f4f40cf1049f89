"""Workload assembly: importing this module populates the query registry.

Each operator module self-registers its queries via ``registry.register``;
``__spark_entry__.py`` re-exports ``queries()`` / ``oracle_sql()`` from here.
"""

from __future__ import annotations

from . import registry
from .operators import relational  # noqa: F401

# Widened per milestone (SURVEY.md §7): joins, aggregates, windows, scalar
# functions, streaming, dedup/similarity/text extensions.
_OPTIONAL_MODULES = (
    "gcp_cloudsql_to_bigquery_spark.operators.joins",
    "gcp_cloudsql_to_bigquery_spark.operators.tpch",
    "gcp_cloudsql_to_bigquery_spark.operators.aggregates",
    "gcp_cloudsql_to_bigquery_spark.operators.windows",
    "gcp_cloudsql_to_bigquery_spark.functions.scalar",
    "gcp_cloudsql_to_bigquery_spark.functions.complex",
    "gcp_cloudsql_to_bigquery_spark.operators.dedup",
    "gcp_cloudsql_to_bigquery_spark.operators.similarity",
    "gcp_cloudsql_to_bigquery_spark.operators.text",
    "gcp_cloudsql_to_bigquery_spark.operators.multimodal",
    "gcp_cloudsql_to_bigquery_spark.operators.curation",
    "gcp_cloudsql_to_bigquery_spark.streaming.events",
    "gcp_cloudsql_to_bigquery_spark.streaming.stateful",
    "gcp_cloudsql_to_bigquery_spark.ingest.routing",
    "gcp_cloudsql_to_bigquery_spark.ingest.queries",
    "gcp_cloudsql_to_bigquery_spark.sources.files",
    "gcp_cloudsql_to_bigquery_spark.operators.scale",
)


def _load_optional() -> None:
    import importlib

    for mod in _OPTIONAL_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # milestone not built yet


_load_optional()

queries = registry.queries
oracle_sql = registry.oracle_sql
REGISTRY = registry.REGISTRY
