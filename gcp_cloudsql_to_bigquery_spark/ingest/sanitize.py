"""Column-name sanitizer.

Reference semantics: ``/root/reference/app/csv-cleaner/main.py:36-38`` —
spaces → ``_``, ``/`` → ``_and_``, double-quotes stripped.  Applied to a
DataFrame via ``toDF`` (pure metadata, no data movement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sanitize_column(name: str) -> str:
    return name.replace(" ", "_").replace("/", "_and_").replace('"', "")


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Rename every column through the sanitizer (zero-cost projection)."""
    return df.toDF(*[sanitize_column(c) for c in df.columns])
