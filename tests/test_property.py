"""Property-based tests (hypothesis) for the pure-Python ELT core —
the sqllogictest-style depth the reference never had (SURVEY.md §5.2)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from gcp_cloudsql_to_bigquery_spark.ingest.nulls import clean_line_compat_str
from gcp_cloudsql_to_bigquery_spark.ingest.sanitize import sanitize_column
from gcp_cloudsql_to_bigquery_spark.ingest.schema_io import (
    bq_schema_to_struct,
    struct_to_bq_schema,
)
from gcp_cloudsql_to_bigquery_spark.ingest.types import BQ_TO_SPARK, datatype_to_bq


@given(st.text(max_size=50))
def test_sanitize_idempotent(name):
    once = sanitize_column(name)
    assert sanitize_column(once) == once


@given(st.text(max_size=50))
def test_sanitize_output_clean(name):
    out = sanitize_column(name)
    assert " " not in out and "/" not in out and '"' not in out


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30))
def test_type_mapper_total_and_closed(t):
    bq = datatype_to_bq(t)
    assert bq in BQ_TO_SPARK  # five-type system is closed
    assert datatype_to_bq(t.upper()) == bq == datatype_to_bq(t.lower())


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30))
def test_strict_mapper_subset(t):
    assert datatype_to_bq(t, strict=True) in {
        "DATETIME", "DATE", "INTEGER", "FLOAT", "DECIMAL", "STRING",
    }


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefghij_ ", min_size=1, max_size=12),
            st.sampled_from(["bigint", "datetime", "date", "double", "varchar", "text"]),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_schema_roundtrip_stable(cols):
    from gcp_cloudsql_to_bigquery_spark.ingest.schema_io import schema_csv_to_bq_json

    bq = schema_csv_to_bq_json(cols)
    st1 = bq_schema_to_struct(bq)
    # second trip is a fixed point
    assert bq_schema_to_struct(struct_to_bq_schema(st1)) == st1


@settings(max_examples=200)
@given(st.text(alphabet='abc,"N\n', max_size=40))
def test_line_compat_never_grows(line):
    # the reference transform only deletes/replaces — output never longer
    assert len(clean_line_compat_str(line)) <= len(line)


@given(st.text(alphabet="abc123", max_size=20))
def test_line_compat_noop_without_sentinel(line):
    assert clean_line_compat_str(line) == line
