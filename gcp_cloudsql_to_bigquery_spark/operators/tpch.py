"""TPC-H-shaped analytical queries adapted to the fixture schema
(FIXTURES.md §A; no partsupp/commitdate columns, so Q2/Q4/Q18 etc. are
re-shaped onto the columns that exist).

These widen the relational surface with the patterns the simpler queries
don't hit: scalar + correlated subqueries, EXISTS with a predicate,
conditional aggregation, IN over a grouped HAVING, disjunctive multi-column
predicates, join-then-regroup distributions.  All delegated capability in
the reference (SURVEY.md §2A: zero joins/aggregations implemented natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "q2_min_price_supplier",
    oracle="""
    SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey, s_name,
           round(l.l_extendedprice, 2) AS best_price
    FROM lineitem l
    JOIN supplier ON s_suppkey = l.l_suppkey
    WHERE l.l_extendedprice = (
      SELECT min(l2.l_extendedprice) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    ) AND l.l_partkey < 200
    """,
    doc="Q2-flavor: correlated scalar subquery (min price per part) → "
    "rewritten in Spark as groupBy-min + join back (decorrelation by hand, "
    "the plan Catalyst produces for the SQL form too).",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 200)
    supp = load(spark, sf_dir, "supplier")
    mins = (
        li.groupBy(F.col("l_partkey").alias("mp_partkey"))
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    return (
        li.join(
            F.broadcast(mins),
            (li.l_partkey == mins.mp_partkey) & (li.l_extendedprice == mins.min_price),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            li.l_partkey.alias("partkey"),
            li.l_suppkey.alias("suppkey"),
            "s_name",
            F.round(li.l_extendedprice, 2).alias("best_price"),
        )
    )


@register(
    "q4_exists_predicate",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o.o_orderkey
        AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    doc="Q4-flavor: EXISTS with an inter-table predicate → left-semi join on "
    "(key, condition), then group.",
)
def q4_exists_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    slow = o.join(
        li,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, yr, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS yr,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
    doc="Q7-flavor: bidirectional nation-pair revenue by year; dims broadcast, "
    "disjunctive pair predicate applied post-join on broadcast legs.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT yr,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS yr, n_name AS nation,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
    )
    GROUP BY yr
    """,
    doc="Q8-flavor: market share via conditional aggregation (CASE inside "
    "sum over a multi-join).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", vol).otherwise(0)) / F.sum(vol), 6
            ).alias("mkt_share")
        )
    )


@register(
    "q13_custdist",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
    doc="Q13: order-count distribution — left join preserving zero-order "
    "customers, aggregate, re-aggregate the aggregate.",
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q14_promo_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'SMALL%'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    """,
    doc="Q14: conditional-aggregation percentage over a broadcast dim join.",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type").like("SMALL%"), vol).otherwise(0)) / F.sum(vol),
                6,
            ).alias("promo_pct")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey, round(o_totalprice, 2) AS total, qty_sum
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS qty_sum
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) big
      ON big.l_orderkey = o_orderkey
    """,
    doc="Q18: IN over a grouped HAVING → aggregate-then-join (the aggregate "
    "shrinks the fact before the join).",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 150)
        .select("l_orderkey", F.round("raw_qty", 2).alias("qty_sum"))
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", F.round("o_totalprice", 2).alias("total"), "qty_sum")
    )


@register(
    "q19_disjunctive",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)
    """,
    doc="Q19: OR-of-ANDs across both join sides — pushable conjuncts are "
    "extracted by Catalyst, the residual disjunction evaluates post-join.",
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#33") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 30))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "q22_global_avg_anti",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    doc="Q22-flavor: uncorrelated scalar subquery (global average as a "
    "broadcast scalar) + anti join on a filtered right side, then group. "
    "(Anti condition filtered so the result is non-empty at every SF.)",
)
def q22_global_avg_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).collect()[0][0]
    return (
        c.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )
