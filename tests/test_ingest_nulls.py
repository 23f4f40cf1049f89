"""NULL-sentinel tests against the B2 fixture (FIXTURES.md), both modes."""

import os

from pyspark.sql import types as T

from gcp_cloudsql_to_bigquery_spark.ingest.nulls import (
    clean_line_compat_str,
    clean_lines_compat,
    read_csv_with_sentinel,
)

B2 = (
    '1,"alice","N,3.5\n'
    '2,"N,42,"N\n'
    '3,"literal ""N, inside",7.0\n'
    '"N,4,0.1\n'
    '5,"bob",2.0\n'
)


def test_line_compat_str_matches_reference_bytes():
    # the reference transform, byte for byte (csv-cleaner/main.py:23-27)
    lines = [line + "\n" for line in B2.splitlines()]
    out = [clean_line_compat_str(line) for line in lines]
    assert out[0] == '1,"alice",,3.5\n'
    assert out[1] == "2,,42,\n"
    # reference corrupts the quoted-field substring — reproduced:
    assert out[2] == '3,"literal ", inside",7.0\n'
    # leading-field sentinel: '"N,' matches at position 0 → stripped
    assert out[3] == ",4,0.1\n"
    assert out[4] == '5,"bob",2.0\n'


def test_clean_lines_compat_distributed_matches_str_version(spark, tmp_path):
    p = os.path.join(tmp_path, "b2.csv")
    with open(p, "w") as fh:
        fh.write(B2)
    got = [r.value for r in clean_lines_compat(spark.read.text(p)).collect()]
    want = [clean_line_compat_str(line + "\n").rstrip("\n") for line in B2.splitlines()]
    assert got == want


def test_csv_aware_mode_preserves_quoted_substring(spark, tmp_path):
    # 3-column fixture subset parseable as (id, name, val)
    data = '1,"alice","N\n2,"N,3.5\n3,"literal ""N, inside",7.0\n5,"bob",2.0\n'
    p = os.path.join(tmp_path, "data.csv")
    with open(p, "w") as fh:
        fh.write(data)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("val", T.DoubleType(), True),
        ]
    )
    rows = {r.id: r for r in read_csv_with_sentinel(spark, p, schema).collect()}
    assert rows[1].name == "alice" and rows[1].val is None
    assert rows[2].name is None and rows[2].val == 3.5
    # the quoted-field substring the reference corrupts survives CSV-aware mode
    assert rows[3].name == 'literal "N, inside' and rows[3].val == 7.0
    assert rows[5].name == "bob" and rows[5].val == 2.0
