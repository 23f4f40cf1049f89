"""MySQL CSV NULL-sentinel handling.

MySQL's CSV export writes NULL as escaped ``\\N``, which lands in the file
as ``"N``; the reference rewrites ``'"N,' → ','`` and ``',"N\\n' → ',\\n'``
line-by-line (``/root/reference/app/csv-cleaner/main.py:21-27``, the
documented GCP known-issue fix).

Two modes (SURVEY.md §7 hard parts):

- **CSV-aware (default, correct)**: let Spark's CSV reader treat the
  sentinel as the null token (``nullValue='"N'`` with quoting disabled for
  that token via unescapedQuoteHandling) — a quoted field *containing*
  ``"N,`` is preserved, single-column ``"N`` lines and ``\\r\\n`` endings
  work.  Fully distributed: no driver-side line pass.
- **line-compat**: byte-for-byte reproduction of the reference transform —
  including its corruption of legitimate ``"N,`` substrings inside quoted
  fields and its two missed positions (lone ``"N`` line, final field under
  ``\\r\\n``).  Exists for parity tests only.  Implemented as distributed
  text transforms (``regexp_replace`` on ``spark.read.text`` lines), not a
  driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_SENTINEL = '"N'


def clean_line_compat_str(line: str) -> str:
    """Reference transform of one line (without trailing newline handling);
    mirror of ``csv-cleaner/main.py:23-27`` for unit parity tests."""
    return line.replace('"N,', ",").replace(',"N\n', ",\n")


def clean_lines_compat(df_text: DataFrame) -> DataFrame:
    """Distributed line-compat clean over a ``spark.read.text`` DataFrame.

    ``spark.read.text`` strips the newline, so the reference's two patterns
    become: ``'"N,' → ','`` anywhere, then a trailing ``,"N`` → ``,``
    (the ``,"N\\n`` case).  A lone ``"N`` line is deliberately untouched —
    that is the reference's bug, reproduced.
    """
    cleaned = F.regexp_replace(F.col("value"), r'"N,', ",")
    cleaned = F.regexp_replace(cleaned, r',"N$', ",")
    return df_text.select(cleaned.alias("value"))


def read_csv_with_sentinel(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "csv-aware",
) -> DataFrame:
    """Schema-applied CSV read with MySQL NULL-sentinel semantics.

    ``csv-aware``: sentinel handled by the parser (correct).  ``line-compat``:
    reference byte behavior — text-transform the lines first, then parse with
    empty-as-null (distributed end to end via from_csv).
    """
    if mode == "csv-aware":
        # The sentinel '"N' is an unterminated quote — no CSV parser option
        # reads it as a null token directly.  Rewrite it to an empty field
        # only at field boundaries (start-of-line or after a comma, followed
        # by comma or end-of-line): fixes all four sentinel positions the
        # reference misses/corrupts (FIXTURES.md B2) while leaving quoted
        # substrings like «"literal ""N, inside"» intact.  Pure JVM regex →
        # fully distributed, then a schema-applied from_csv parse.
        text = spark.read.text(path)
        cleaned = text.select(
            F.regexp_replace(F.col("value"), r'(?:(?<=^)|(?<=,))"N(?=,|$)', "").alias("value")
        )
        parsed = cleaned.select(
            F.from_csv(
                F.col("value"), schema.simpleString(), {"nullValue": "", "header": "false", "escape": '"'}
            ).alias("r")
        )
        return parsed.select([F.col(f"r.{f.name}").alias(f.name) for f in schema.fields])
    if mode == "line-compat":
        text = spark.read.text(path)
        cleaned = clean_lines_compat(text)
        parsed = cleaned.select(
            F.from_csv(
                F.col("value"), schema.simpleString(), {"nullValue": "", "header": "false", "escape": '"'}
            ).alias("r")
        )
        return parsed.select([F.col(f"r.{f.name}").alias(f.name) for f in schema.fields])
    raise ValueError(f"unknown mode {mode!r}; use 'csv-aware' or 'line-compat'")
