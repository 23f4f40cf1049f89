"""BigQuery JSON schema ↔ Spark StructType round-trip.

Reference emits ``[{"name": …, "type": …, "mode": "NULLABLE"}, …]`` with
every field forced NULLABLE (``/root/reference/app/csv-cleaner/main.py:30-45``).
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from .sanitize import sanitize_column
from .types import BQ_TO_SPARK, datatype_to_bq

_SPARK_TO_BQ: list[tuple[type, str]] = [
    (T.TimestampNTZType, "DATETIME"),
    (T.TimestampType, "DATETIME"),
    (T.DateType, "DATE"),
    (T.LongType, "INTEGER"),
    (T.IntegerType, "INTEGER"),
    (T.ShortType, "INTEGER"),
    (T.ByteType, "INTEGER"),
    (T.DoubleType, "FLOAT"),
    (T.FloatType, "FLOAT"),
    (T.DecimalType, "FLOAT"),
]


def schema_csv_to_bq_json(rows: list[tuple[str, str]]) -> list[dict[str, str]]:
    """The reference's schema-file conversion: (COLUMN_NAME, DATA_TYPE) rows
    from information_schema → BQ JSON schema, names sanitized, every field
    NULLABLE (``csv-cleaner/main.py:34-45``)."""
    return [
        {"name": sanitize_column(name), "type": datatype_to_bq(dtype), "mode": "NULLABLE"}
        for name, dtype in rows
    ]


def bq_schema_to_struct(fields: list[dict[str, str]]) -> T.StructType:
    """BQ JSON schema array → StructType (all nullable, like the reference)."""
    return T.StructType(
        [T.StructField(f["name"], BQ_TO_SPARK[f["type"].upper()], True) for f in fields]
    )


def struct_to_bq_schema(schema: T.StructType) -> list[dict[str, str]]:
    """StructType → BQ JSON schema array (every field NULLABLE, names
    sanitized — reference emit shape)."""
    out = []
    for f in schema.fields:
        bq = "STRING"
        for cls, name in _SPARK_TO_BQ:
            if isinstance(f.dataType, cls):
                bq = name
                break
        out.append({"name": sanitize_column(f.name), "type": bq, "mode": "NULLABLE"})
    return out


def dumps(fields: list[dict[str, str]]) -> str:
    return json.dumps(fields)


def loads(text: str) -> list[dict[str, str]]:
    return json.loads(text)
