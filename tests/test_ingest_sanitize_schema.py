"""Name sanitizer + BQ JSON schema round-trip (FIXTURES.md B1/B3)."""

from pyspark.sql import types as T

from gcp_cloudsql_to_bigquery_spark.ingest.sanitize import sanitize_column
from gcp_cloudsql_to_bigquery_spark.ingest.schema_io import (
    bq_schema_to_struct,
    schema_csv_to_bq_json,
    struct_to_bq_schema,
)


def test_sanitize():
    assert sanitize_column("created at") == "created_at"
    assert sanitize_column("name/alias") == "name_and_alias"
    assert sanitize_column('"quoted"') == "quoted"
    assert sanitize_column("a b/c\"d\"") == "a_b_and_cd"


def test_b1_to_b3_golden():
    rows = [
        ("id", "bigint"),
        ("created at", "datetime"),
        ('"name/alias"', "varchar"),
        ("geo", "point"),
    ]
    out = schema_csv_to_bq_json(rows)
    assert out == [
        {"name": "id", "type": "INTEGER", "mode": "NULLABLE"},
        {"name": "created_at", "type": "DATETIME", "mode": "NULLABLE"},
        {"name": "name_and_alias", "type": "STRING", "mode": "NULLABLE"},
        {"name": "geo", "type": "INTEGER", "mode": "NULLABLE"},
    ]
    # every field NULLABLE, reference main.py:41
    assert all(f["mode"] == "NULLABLE" for f in out)


def test_struct_roundtrip():
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("ts", T.TimestampNTZType(), True),
            T.StructField("d", T.DateType(), True),
            T.StructField("x", T.DoubleType(), True),
            T.StructField("s", T.StringType(), True),
        ]
    )
    bq = struct_to_bq_schema(st)
    back = bq_schema_to_struct(bq)
    assert back == st


def test_struct_downcasts_through_five_types():
    st = T.StructType(
        [
            T.StructField("i32", T.IntegerType(), False),
            T.StructField("f32", T.FloatType(), False),
            T.StructField("dec", T.DecimalType(18, 2), False),
        ]
    )
    bq = struct_to_bq_schema(st)
    assert [f["type"] for f in bq] == ["INTEGER", "FLOAT", "FLOAT"]
    back = bq_schema_to_struct(bq)
    # widened + forced nullable, like the reference
    assert [f.dataType for f in back.fields] == [T.LongType(), T.DoubleType(), T.DoubleType()]
    assert all(f.nullable for f in back.fields)
