"""Merge/upsert + SCD2 tests."""

import pytest
from pyspark.sql import functions as F

from gcp_cloudsql_to_bigquery_spark.ingest.merge import scd2_apply, upsert


def test_upsert_schema_mismatch_rejected(spark):
    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(1, "x", 2.0)], "k int, v string, w double")
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert(a, b, "k")


def test_upsert_updates_win_and_inserts_append(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    updates = spark.createDataFrame([(2, "B"), (4, "D")], "k int, v string")
    got = {(r.k, r.v) for r in upsert(target, updates, "k").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}


def test_scd2_closes_and_opens_versions(spark):
    dim = spark.createDataFrame(
        [(1, "alice", "2020-01-01", None, True),
         (1, "alyce", "2019-01-01", "2020-01-01", False),
         (2, "bob", "2020-01-01", None, True)],
        "k int, name string, valid_from string, valid_to string, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "alicia", "2021-06-01")], "k int, name string, valid_from string"
    )
    out = scd2_apply(dim, changes, key="k", effective_col="valid_from")
    rows = {(r.k, r.name): (r.valid_from, r.valid_to, r.is_current) for r in out.collect()}
    assert rows[(1, "alicia")] == ("2021-06-01", None, True)     # new open version
    assert rows[(1, "alice")] == ("2020-01-01", "2021-06-01", False)  # closed
    assert rows[(1, "alyce")] == ("2019-01-01", "2020-01-01", False)  # untouched history
    assert rows[(2, "bob")] == ("2020-01-01", None, True)        # untouched key
    # exactly one current version per key
    n_current = out.filter(F.col("is_current")).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in n_current)
