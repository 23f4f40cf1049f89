"""Relational core: scans with predicates, projection/cast, sort/limit/top-k,
distinct, set operations.

Reference precedent (SURVEY.md §2A): catalog scan + LIKE/IN predicate (#1,
``/root/reference/app/cloud-sql-query-runner/main.py:52-57``), single-column
projection (#2, ``main.py:57``), ORDER BY (#6,
``/root/reference/app/cloud-sql-exporter/main.py:55``).  Everything else in
this module is capability the reference delegates to MySQL/BigQuery (§2B).

Scale notes: every query here is a single parquet scan + narrow transforms —
no shuffle except where semantically required (distinct/set-ops/sort).  Sorts
feeding a LIMIT compile to TakeOrderedAndProject (no global sort at scale);
top-k-per-group uses a window over a single hash partition by group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                        AS sum_qty,
      round(sum(l_extendedprice), 2)                                   AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
      round(avg(l_quantity), 4)                                        AS avg_qty,
      round(avg(l_extendedprice), 4)                                   AS avg_price,
      round(avg(l_discount), 4)                                        AS avg_disc,
      count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship: TPC-H Q1-shaped pricing summary (grouped 8-agg rollup).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "catalog_scan_like_in",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_type LIKE 'SMALL%' OR p_brand IN ('Brand#11', 'Brand#22')
    """,
    doc="Reference op #1: scan + LIKE/IN/OR predicate "
    "(mirrors the table-enumeration query variables.tf:72-75).",
)
def catalog_scan_like_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select("p_partkey", "p_name", "p_brand", "p_type").filter(
        F.col("p_type").like("SMALL%") | F.col("p_brand").isin("Brand#11", "Brand#22")
    )


@register(
    "projection_cast",
    oracle="""
    SELECT
      l_orderkey,
      CAST(l_quantity AS BIGINT)            AS qty_int,
      CAST(l_extendedprice AS VARCHAR)      AS price_str,
      CAST(l_linenumber AS DOUBLE)          AS line_dbl,
      CAST(l_shipdate AS DATE)              AS ship_day
    FROM lineitem
    WHERE l_orderkey < 100
    """,
    doc="Projection + cast matrix (reference ops #2/#15: projection, type map).",
)
def projection_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 100).select(
        "l_orderkey",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_extendedprice").cast("string").alias("price_str"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )


@register(
    "sort_limit_topn",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="Global top-N: ORDER BY + LIMIT → TakeOrderedAndProject (no full sort at scale).",
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price, rn
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
    )
    WHERE rn <= 3
    """,
    doc="Top-K per group: window row_number + filter — the scalable per-group "
    "top-k (single shuffle on the group key).",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", F.round("p_retailprice", 2).alias("price"), "rn")
    )


@register(
    "distinct_values",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    """,
    doc="DISTINCT → hash-aggregate with map-side partial (one shuffle).",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "set_ops",
    oracle="""
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT nationkey, 'both' AS side FROM cust_nations INTERSECT
      SELECT nationkey, 'both' FROM supp_nations
    UNION ALL
    SELECT nationkey, 'cust_only' AS side FROM (
      SELECT nationkey FROM cust_nations EXCEPT SELECT nationkey FROM supp_nations
    )
    """,
    doc="Set operations: UNION ALL / INTERSECT / EXCEPT over nation keys.",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cust.intersect(supp).withColumn("side", F.lit("both"))
    cust_only = cust.exceptAll(supp).withColumn("side", F.lit("cust_only"))
    return both.unionByName(cust_only)


@register(
    "set_ops_multiset",
    oracle="""
    WITH a AS (SELECT o_orderpriority AS pri FROM orders WHERE o_orderkey <= 3000),
         b AS (SELECT o_orderpriority AS pri FROM orders
               WHERE o_orderkey > 1500 AND o_orderkey <= 4500)
    SELECT pri, 'intersect_all' AS op, count(*) AS n
    FROM (SELECT pri FROM a INTERSECT ALL SELECT pri FROM b) GROUP BY pri
    UNION ALL
    SELECT pri, 'except_all' AS op, count(*) AS n
    FROM (SELECT pri FROM a EXCEPT ALL SELECT pri FROM b) GROUP BY pri
    """,
    doc="Multiset set-ops: INTERSECT ALL / EXCEPT ALL preserve duplicate "
    "counts (bag semantics) — different operator than the distinct variants.",
)
def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") <= 3000).select(F.col("o_orderpriority").alias("pri"))
    b = o.filter((F.col("o_orderkey") > 1500) & (F.col("o_orderkey") <= 4500)).select(
        F.col("o_orderpriority").alias("pri")
    )
    ia = a.intersectAll(b).groupBy("pri").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "op", F.lit("intersect_all")
    )
    ea = a.exceptAll(b).groupBy("pri").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "op", F.lit("except_all")
    )
    return ia.unionByName(ea).select("pri", "op", "n")


@register(
    "filter_null_safe_eq",
    oracle="""
    WITH t AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st FROM orders)
    SELECT
      count(CASE WHEN st IS NOT DISTINCT FROM 'F' THEN 1 END)   AS n_f,
      count(CASE WHEN st IS NOT DISTINCT FROM NULL THEN 1 END)  AS n_null,
      count(CASE WHEN st IS DISTINCT FROM 'O' THEN 1 END)       AS n_not_o
    FROM t
    """,
    doc="Null-safe equality (<=> / IS NOT DISTINCT FROM): the join/compare "
    "semantics NULL-heavy ELT data needs (a NULL key still matches itself).",
)
def filter_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("st")
    )
    st = F.col("st")
    return o.agg(
        F.count(F.when(st.eqNullSafe("F"), 1)).alias("n_f"),
        F.count(F.when(st.eqNullSafe(F.lit(None)), 1)).alias("n_null"),
        F.count(F.when(~st.eqNullSafe("O"), 1)).alias("n_not_o"),
    )


@register(
    "agg_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50_exact,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_exact,
           TRUE AS p50_in_bounds, TRUE AS p99_in_bounds
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="percentile_approx (sketch): the constant-memory quantile path at "
    "100 TB.  Sketch outputs are engine-specific, so the query AUDITS "
    "ITSELF: alongside the exact percentiles (which DuckDB states with "
    "quantile_cont) it emits booleans asserting each approximate value "
    "lies inside the exact [p-0.01, p+0.01] rank bracket — 10x looser "
    "than the sketch's 1/1000 rank-error guarantee, so a correct sketch "
    "always passes and a broken one flips the hashed boolean.",
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # r17 (guide §1.2 per-task work): the scalar forms built TWO identical
    # QuantileSummaries sketches and SIX independent exact-percentile
    # value->count buffers over the same column; the array forms compute
    # every requested quantile from ONE sketch and ONE buffer per group —
    # value-identical (the same per-group sorted buffer answers each rank;
    # the same deterministic sketch answers both queries), measured 4.3 s
    # -> 1.3 s warm at sf0.1.
    pe_qs = (0.5, 0.99, 0.49, 0.51, 0.98, 1.0)
    g = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.99)), F.lit(1000)
        ).alias("pa"),
        F.percentile(
            "l_extendedprice", F.array(*[F.lit(q) for q in pe_qs])
        ).alias("pe"),
    )
    return g.select(
        "l_returnflag",
        F.round(F.element_at("pe", 1), 4).alias("p50_exact"),
        F.round(F.element_at("pe", 2), 4).alias("p99_exact"),
        F.element_at("pa", 1)
        .between(F.element_at("pe", 3), F.element_at("pe", 4))
        .alias("p50_in_bounds"),
        F.element_at("pa", 2)
        .between(F.element_at("pe", 5), F.element_at("pe", 6))
        .alias("p99_in_bounds"),
    )


@register(
    "dedup_dropduplicates",
    oracle="""
    SELECT o_custkey, count(*) AS n_status
    FROM (SELECT DISTINCT o_custkey, o_orderstatus FROM orders)
    GROUP BY o_custkey
    """,
    doc="dropDuplicates on a column subset, then per-key cardinality.",
)
def dedup_dropduplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_custkey", "o_orderstatus")
        .dropDuplicates(["o_custkey", "o_orderstatus"])
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_status"))
    )


@register(
    "filter_null_semantics",
    oracle="""
    SELECT
      count(*)                                                   AS n_rows,
      count(CASE WHEN props IS NULL THEN 1 END)                  AS n_null_props,
      count(CASE WHEN value IS NOT NULL AND value > 10 THEN 1 END) AS n_big_value,
      count(coalesce(nullif(event_type, 'view'), NULL))          AS n_non_view
    FROM events
    """,
    doc="NULL-handling predicates: isNull/isNotNull/coalesce/nullif "
    "(engine-side analog of the reference NULL-sentinel semantics, op #12).",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("props").isNull(), 1)).alias("n_null_props"),
        F.count(F.when(F.col("value").isNotNull() & (F.col("value") > 10), 1)).alias("n_big_value"),
        F.count(F.coalesce(F.nullif(F.col("event_type"), F.lit("view")), F.lit(None))).alias(
            "n_non_view"
        ),
    )
