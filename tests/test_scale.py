"""Scale-pattern tests: bucketed join eliminates exchanges; salted join is
semantics-preserving."""

import pytest
from pyspark.sql import functions as F

from gcp_cloudsql_to_bigquery_spark.catalog import load
from gcp_cloudsql_to_bigquery_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from gcp_cloudsql_to_bigquery_spark.plans.inspect import exchange_count

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored); dropped below
    write_bucketed(
        load(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", "o_orderkey", 8, sort_by="o_orderkey",
    )
    write_bucketed(
        load(spark, SF, "lineitem").select("l_orderkey", "l_quantity"),
        "lineitem_b", "l_orderkey", 8, sort_by="l_orderkey",
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(
            spark, "lineitem_b", "orders_b",
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert exchange_count(j) == 0, "bucketed co-located join must not shuffle"
        # sanity: same rowcount as the plain join
        plain = load(spark, SF, "lineitem").join(
            load(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_does_exchange(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = load(spark, SF, "lineitem").join(
            load(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert exchange_count(plain) >= 2  # both sides shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_preserves_semantics(spark):
    li = load(spark, SF, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    supp = load(spark, SF, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    plain = (
        li.join(supp, "suppkey")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(li, supp, "suppkey", n_salts=4)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
