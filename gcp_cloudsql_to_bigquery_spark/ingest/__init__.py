"""Reference-parity ELT core (SURVEY.md §2A ops #12-#21, #25).

The literal capability of the reference pipeline — MySQL-catalog-driven
schema mapping, column-name sanitizing, NULL-sentinel handling, BigQuery
JSON schema round-trip, schema-applied truncate-loads, date-partitioned
layout — rebuilt on Spark readers/writers instead of line-by-line string
surgery in 128 MB cloud functions.
"""

from .nulls import NULL_SENTINEL, clean_lines_compat, read_csv_with_sentinel
from .sanitize import sanitize_column, sanitize_columns
from .schema_io import bq_schema_to_struct, struct_to_bq_schema
from .types import BQ_TO_SPARK, datatype_to_bq, mysql_to_spark_type

__all__ = [
    "BQ_TO_SPARK",
    "NULL_SENTINEL",
    "bq_schema_to_struct",
    "clean_lines_compat",
    "datatype_to_bq",
    "mysql_to_spark_type",
    "read_csv_with_sentinel",
    "sanitize_column",
    "sanitize_columns",
    "struct_to_bq_schema",
]
