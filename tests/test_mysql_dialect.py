"""MySQL-dialect text parity: the SQL strings this engine would send to a
MySQL deployment must be byte-identical to the reference's
(cloud-sql-exporter/main.py:53-55,65; variables.tf:72-75).  The strings are
re-derived here the way the reference derives them (format templates), so a
drift in mysql_dialect.py fails loudly."""

import pytest

from gcp_cloudsql_to_bigquery_spark.sources.mysql_dialect import (
    default_catalog_query,
    export_data_query,
    export_schema_query,
    mysql_source,
    quote_ident,
    quote_literal,
)


def test_export_data_query_reference_parity():
    # reference: "SELECT * FROM `{}`;".format(table)  (main.py:65)
    for table in ("nation", "order-items", "a b c"):
        assert export_data_query(table) == "SELECT * FROM `{}`;".format(table)


def test_export_schema_query_reference_parity():
    # reference: main.py:53-55 — uppercase INFORMATION_SCHEMA, positional
    # interpolation, ORDER BY ORDINAL_POSITION, trailing semicolon
    got = export_schema_query("default", "nation")
    assert got == (
        "SELECT COLUMN_NAME,DATA_TYPE FROM INFORMATION_SCHEMA.COLUMNS "
        "WHERE TABLE_SCHEMA = 'default' AND TABLE_NAME = 'nation' "
        "ORDER BY ORDINAL_POSITION;"
    )


def test_default_catalog_query_reference_parity():
    # reference: variables.tf:72-75 default
    assert default_catalog_query() == (
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_schema = 'default';"
    )


def test_compat_mode_reproduces_reference_nonescaping():
    # the reference never escapes; compat must not either (bug-compat,
    # same policy as ingest/types.py), while strict must
    assert export_data_query("we`ird") == "SELECT * FROM `we`ird`;"
    assert export_data_query("we`ird", mode="strict") == "SELECT * FROM `we``ird`;"
    assert "''" in export_schema_query("d", "o'brien", mode="strict")
    with pytest.raises(ValueError):
        export_data_query("t", mode="nope")


def test_quoting_rules():
    assert quote_ident("plain") == "`plain`"
    assert quote_ident("a`b") == "`a``b`"
    assert quote_literal("o'brien") == "'o''brien'"


def test_mysql_source_dialect_options():
    src = mysql_source("10.0.0.5", "prod", "u", "p")
    opts = src.options_for("nation", partition_column="n_nationkey",
                           lower_bound=0, upper_bound=25)
    assert opts["url"] == "jdbc:mysql://10.0.0.5:3306/prod"
    assert opts["driver"] == "com.mysql.cj.jdbc.Driver"
    # the at-scale quirks: cursor fetch, UTC parity, zero-date, batch writes
    assert opts["useCursorFetch"] == "true"
    assert opts["connectionTimeZone"] == "UTC"
    assert opts["zeroDateTimeBehavior"] == "CONVERT_TO_NULL"
    assert opts["rewriteBatchedStatements"] == "true"
    assert opts["numPartitions"] == "32"
    assert opts["partitionColumn"] == "n_nationkey"
