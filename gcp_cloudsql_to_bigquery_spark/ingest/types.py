"""MySQL→BigQuery→Spark type mapping.

Reference semantics: ``/root/reference/app/csv-cleaner/datatype_to_bq.py:1-14``
— substring-based, order-sensitive (DATETIME before DATE), five output types,
STRING fallback, deliberately lossy (DECIMAL→FLOAT).  Reimplemented from the
documented behavior, not copied; the quirks are kept under the default
bug-compat mode because parity is the point:

- any type merely *containing* ``INT`` maps to INTEGER (so MySQL ``POINT``
  → INTEGER — the substring trap, FIXTURES.md B1);
- ``DECIMAL`` → FLOAT loses exactness.

``strict=True`` offers the fixed mapping a real deployment would want
(word-boundary matches, DECIMAL preserved).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# BigQuery type → Spark type.  BQ INTEGER is 64-bit → LongType; BQ DATETIME
# is timezone-naive → TimestampNTZType is the exact match, but the oracle
# (DuckDB TIMESTAMP) and the session-TZ pin make TimestampType equivalent
# here; keep NTZ for fidelity.
BQ_TO_SPARK: dict[str, T.DataType] = {
    "DATETIME": T.TimestampNTZType(),
    "DATE": T.DateType(),
    "INTEGER": T.LongType(),
    "FLOAT": T.DoubleType(),
    "STRING": T.StringType(),
}


def datatype_to_bq(mysql_type: str, strict: bool = False) -> str:
    """Map a MySQL ``DATA_TYPE`` string to a BigQuery type name.

    Default mode replicates the reference's substring checks in its exact
    order (DATETIME before DATE before INT before FLOAT/DOUBLE/DECIMAL,
    fallback STRING).  ``strict`` uses word-boundary matching and maps
    DECIMAL to NUMERIC-like exactness (kept as STRING here since the
    five-type system has no NUMERIC; callers wanting DecimalType should map
    the original type themselves).
    """
    t = mysql_type.upper()
    if strict:
        if re.search(r"\bDATETIME\b|\bTIMESTAMP\b", t):
            return "DATETIME"
        if re.search(r"\bDATE\b", t):
            return "DATE"
        if re.search(r"\b(TINY|SMALL|MEDIUM|BIG)?INT(EGER)?\b", t):
            return "INTEGER"
        if re.search(r"\bFLOAT\b|\bDOUBLE\b", t):
            return "FLOAT"
        if re.search(r"\bDECIMAL\b|\bNUMERIC\b", t):
            return "DECIMAL"
        return "STRING"
    # bug-compat: plain substring containment, reference order
    if "DATETIME" in t:
        return "DATETIME"
    if "DATE" in t:
        return "DATE"
    if "INT" in t:
        return "INTEGER"
    if "FLOAT" in t or "DOUBLE" in t or "DECIMAL" in t:
        return "FLOAT"
    return "STRING"


def mysql_to_spark_type(mysql_type: str, strict: bool = False) -> T.DataType:
    """MySQL type string → Spark DataType through the BQ five-type system."""
    bq = datatype_to_bq(mysql_type, strict=strict)
    if bq == "DECIMAL":  # strict mode only
        m = re.search(r"\((\d+)\s*,\s*(\d+)\)", mysql_type)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        return T.DecimalType(38, 9)
    return BQ_TO_SPARK[bq]
