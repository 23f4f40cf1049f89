"""Type-mapper unit tests — every branch of the reference's
``datatype_to_bq`` (FIXTURES.md B1; ``/root/reference/app/csv-cleaner/
datatype_to_bq.py:1-14``)."""

from pyspark.sql import types as T

from gcp_cloudsql_to_bigquery_spark.ingest.types import (
    datatype_to_bq,
    mysql_to_spark_type,
)

B1_CASES = [
    ("bigint", "INTEGER"),
    ("tinyint", "INTEGER"),
    ("datetime", "DATETIME"),
    ("date", "DATE"),
    ("decimal", "FLOAT"),
    ("double", "FLOAT"),
    ("float", "FLOAT"),
    ("varchar", "STRING"),
    ("point", "INTEGER"),  # substring trap: POINT contains INT (bug-compat)
    ("text", "STRING"),
]


def test_b1_fixture_mappings():
    for mysql, bq in B1_CASES:
        assert datatype_to_bq(mysql) == bq, mysql


def test_case_insensitive():
    assert datatype_to_bq("DaTeTiMe") == "DATETIME"
    assert datatype_to_bq("BIGINT") == "INTEGER"


def test_datetime_before_date_order():
    # reference checks DATETIME before DATE; a 'datetime' must not hit DATE
    assert datatype_to_bq("datetime") == "DATETIME"
    assert datatype_to_bq("date") == "DATE"


def test_strict_mode_fixes_traps():
    assert datatype_to_bq("point", strict=True) == "STRING"
    assert datatype_to_bq("decimal(18,2)", strict=True) == "DECIMAL"
    assert datatype_to_bq("timestamp", strict=True) == "DATETIME"


def test_spark_types():
    assert mysql_to_spark_type("bigint") == T.LongType()
    assert mysql_to_spark_type("datetime") == T.TimestampNTZType()
    assert mysql_to_spark_type("date") == T.DateType()
    assert mysql_to_spark_type("decimal") == T.DoubleType()  # lossy, bug-compat
    assert mysql_to_spark_type("decimal(18,2)", strict=True) == T.DecimalType(18, 2)
    assert mysql_to_spark_type("json") == T.StringType()
