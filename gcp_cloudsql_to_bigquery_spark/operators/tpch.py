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
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


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
        .join(supp, li.l_suppkey == supp.s_suppkey)
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
    # o_orderdate is a TIMESTAMP: add a true 60-day INTERVAL.  date_add()
    # would silently truncate to DATE first, shifting the comparison to
    # midnight — wrong for any non-midnight order timestamp (hostile-data
    # find; the driver fixture's orderdates are all midnight-aligned)
    slow = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
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
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
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
        .join(s, li.l_suppkey == s.s_suppkey)
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
        li.join(p, li.l_partkey == p.p_partkey)
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
        .join(c, o.o_custkey == c.c_custkey)
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
    j = li.join(p, li.l_partkey == p.p_partkey)
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
    # Uncorrelated scalar subquery bound lazily: 1-row aggregate broadcast
    # into a crossJoin (same pattern as q11/q15/q20) — no eager driver job.
    bound = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        c.crossJoin(F.broadcast(bound))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Q6: pure scan-filter-aggregate — the predicate-pushdown benchmark. "
    "Narrow plan, zero shuffle beyond the final partial-agg exchange; at "
    "100 TB this is a columnar scan whose date/discount/quantity filters all "
    "reach the parquet reader.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT nation, yr,
           round(sum(profit10k) / 10000.0, 2) AS total_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS yr,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000
                        - p_retailprice * l_quantity * 1000) AS BIGINT)
               AS profit10k
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%gear%'
    )
    GROUP BY nation, yr
    """,
    doc="Q9-flavor (no partsupp in the fixture schema, so supply cost is "
    "proxied as 10%% of retail price): profit by supplier nation and order "
    "year.  part/supplier/nation broadcast; the only shuffle is "
    "lineitem⋈orders on orderkey plus the group-by exchange.  Profit is "
    "summed in exact integer ten-thousandths (the term is integer-valued "
    "there: cents x (100 - discount_pct) and retail cents x qty x 10), so "
    "the aggregate is order-independent and bit-identical in both engines — "
    "a plain double sum flips the 2dp rounding at half-cent boundaries, "
    "which the 3dp-exact cost term hits constantly.",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    profit10k = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
        - F.col("p_retailprice") * F.col("l_quantity") * 1000
    ).cast("long")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(F.round(F.sum(profit10k) / 10000.0, 2).alias("total_profit"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name, round(revenue, 2) AS revenue
    FROM (
      SELECT c_custkey, c_name, n_name,
             sum(l_extendedprice * (1 - l_discount)) AS revenue
      FROM customer
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY c_custkey, c_name, n_name
    )
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="Q10: top-20 customers by returned-item revenue in a year window. "
    "Spark side is sort+limit => TakeOrderedAndProject (map-side top-k, "
    "only 20·numPartitions rows reach the driver-side reduce); tie-break on "
    "c_custkey keeps the cutoff deterministic for the oracle compare.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


@register(
    "q11_important_inventory",
    oracle="""
    WITH pv AS (
      SELECT l_partkey AS partkey, sum(l_extendedprice) AS value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY l_partkey
    )
    SELECT partkey, round(value, 2) AS value
    FROM pv
    WHERE value > (SELECT 1.2 * avg(value) FROM pv)
    """,
    doc="Q11-flavor (no partsupp; inventory value proxied by shipped "
    "extended price from the target nations' suppliers): parts whose value "
    "exceeds 1.2x the average — an uncorrelated scalar aggregate consumed "
    "as a HAVING bound.  The per-part aggregate is tiny relative to the "
    "fact, so the scalar pass reuses it; relative (not absolute) threshold "
    "keeps the query non-vacuous at every scale factor.",
)
def q11_important_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    pv = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    bound = pv.agg((F.avg("value") * 1.2).alias("bound"))
    return (
        pv.crossJoin(F.broadcast(bound))
        .filter(F.col("value") > F.col("bound"))
        .select("partkey", F.round("value", 2).alias("value"))
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY
    GROUP BY l_linestatus
    """,
    doc="Q12-flavor (fixture has no shipmode/receiptdate, so 'late' is "
    "shipdate > orderdate + 1y and the group key is linestatus): priority "
    "split of late shipments via conditional counts — one fact⋈fact shuffle "
    "then a 2-group conditional aggregation.",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 365))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             sum(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_rev, 2) AS total_rev
    FROM supplier JOIN rev ON suppkey = s_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
    doc="Q15: top supplier by windowed revenue — the view-plus-max pattern. "
    "The per-supplier aggregate is computed once; its max comes back as a "
    "broadcast scalar, so the equality filter costs no extra scan of the "
    "fact.  Ties (astronomically unlikely over double sums) would all be "
    "returned, matching the SQL semantics exactly.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    best = rev.agg(F.max("total_rev").alias("best_rev"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("best_rev"))
        .join(s, F.col("suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_rev", 2).alias("total_rev"))
    )


@register(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#11'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="Q16-flavor (supplier 'complaints' proxied by negative account "
    "balance; part⋈supplier relationships observed through lineitem since "
    "the fixture has no partsupp): distinct-supplier counts per part "
    "attribute combo, with a NOT IN exclusion list.  The exclusion side is "
    "tiny => broadcast anti join; count(DISTINCT) shuffles (brand,type,"
    "size,suppkey) pairs — already deduplicated map-side by the partial "
    "aggregate.",
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11") & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = load(spark, sf_dir, "lineitem")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice), 2) AS small_qty_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="Q17: correlated per-part average consumed as a row filter — "
    "decorrelated in Spark as a window average over partition(l_partkey) on "
    "the brand-restricted join (the restriction commutes: a part's lines "
    "are the same set either way).  Quantities are integral doubles, so the "
    "avg is bit-exact in both engines and the strict < cannot flip at a "
    "boundary.  One shuffle (window partition), no self-join.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    w = W.partitionBy("l_partkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"))
    )


@register(
    "q20_excess_shippers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey AS suppkey, sum(l_quantity) AS qty
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%gear%'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(qty, 2) AS qty
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN shipped ON suppkey = s_suppkey
    WHERE n_name LIKE 'NATION_1%'
      AND qty > (SELECT avg(qty) FROM shipped)
    """,
    doc="Q20-flavor (no partsupp/availqty; 'excess' = a supplier shipped "
    "more of the pattern-matched parts than the cross-supplier average): "
    "nested IN chain flattened to aggregate → scalar-bound filter → "
    "broadcast joins.  Quantities are integral doubles so the avg bound is "
    "bit-exact in both engines.  Relative threshold + 11-nation prefix "
    "filter keep it non-vacuous at every scale factor.",
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").like("NATION_1%"))
    shipped = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    bound = shipped.agg(F.avg("qty").alias("avg_qty"))
    return (
        shipped.crossJoin(F.broadcast(bound))
        .filter(F.col("qty") > F.col("avg_qty"))
        .join(s, F.col("suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", F.round("qty", 2).alias("qty"))
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY
    ),
    multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1
    ),
    solo AS (
      SELECT l_orderkey FROM late
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) = 1
    )
    SELECT s_name, count(*) AS numwait
    FROM late
    JOIN solo USING (l_orderkey)
    JOIN multi USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
    doc="Q21-flavor ('late' = shipped > 1y after order date; fixture has no "
    "commit/receipt dates): suppliers who were the SOLE late supplier on a "
    "multi-supplier order.  The classic EXISTS / NOT EXISTS pair is "
    "decorrelated into two semi joins against per-order aggregates — both "
    "shuffle on orderkey, the same key as the main fact⋈fact join, so AQE "
    "can reuse the exchange; supplier is broadcast.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 365))
        .select("l_orderkey", "l_suppkey")
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    solo = (
        late.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_late"))
        .filter(F.col("n_late") == 1)
        .select("l_orderkey")
    )
    return (
        late.join(solo, "l_orderkey", "left_semi")
        .join(multi, "l_orderkey", "left_semi")
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
