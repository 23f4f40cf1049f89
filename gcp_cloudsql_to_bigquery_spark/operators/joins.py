"""Join operators: all join types, broadcast strategy, theta/as-of joins.

The reference implements zero joins — they run in MySQL/BigQuery on either
side of the pipeline (SURVEY.md §2A "implements zero of").  This module is
the §2B join surface, Spark-first:

- constant-size dimensions (region: 5 rows, nation: 25 rows at EVERY scale
  factor) are hint-broadcast so fact joins never shuffle the big side;
  SF-proportional dimensions (customer/supplier/part) are left to AQE's
  size-gated broadcast conversion — a hard hint on a table that is GBs at
  TPC-H 100 TB would OOM the build side, while AQE broadcasts exactly when
  the (filtered) dim measures small at runtime;
- the as-of join (Spark lacks a native one) comes in two compositions:
  union + last(ignoreNulls) window (linear, the registered ``join_asof``)
  and equi-join + max(struct) hash-agg (``asof_join`` helper, supports
  tolerance);
- non-equi joins are bucketized (``interval_join``) so they shuffle on
  (key, bucket) instead of planning a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "join_star_q3",
    oracle="""
    -- revenue is cent-quantized PER ITEM before the sum (exact integer
    -- accumulation): round(sum(double)) is summation-order dependent, and
    -- the r14 skewed-volume sweep caught groups whose sums landed within
    -- an ulp of a .xx5 boundary, rounding to different cents per engine
    SELECT l_orderkey,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    """,
    doc="TPC-H Q3-shaped star join: fact-fact equi-join, group-agg. The "
    "customer leg is NOT hint-forced to broadcast: customer grows with SF "
    "(GBs at TPC-H 100 TB) so a hard hint would OOM the build side at "
    "scale — AQE's size-gated BHJ conversion picks broadcast exactly while "
    "the filtered dim actually fits (tests assert no SMJ at test scale).",
)
def join_star_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                        + 0.5
                    ).cast("bigint")
                )
                / 100.0
            ).alias("revenue")
        )
    )


@register(
    "join_q5_region_revenue",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-shaped 6-table join. region/nation are hint-broadcast "
    "(constant-size: 5/25 rows at every SF); customer/supplier scale with "
    "SF, so their legs rely on AQE's size-gated broadcast conversion "
    "instead of a hard hint that would OOM the build side at 100 TB.",
)
def join_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS spend
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    doc="LEFT OUTER join preserving customers with zero orders (count(col) skips NULLs).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
    doc="FULL OUTER join of two pre-aggregated sides (aggregate-before-join "
    "shrinks both shuffle inputs).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, "nationkey", "full").select(
        F.col("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    doc="LEFT SEMI join (EXISTS): no payload columns from the right side, "
    "right side reduced before the join.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    f_orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(f_orders, cust.c_custkey == f_orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    doc="LEFT ANTI join (NOT EXISTS): customers with no high-value order. "
    "(Condition chosen to be non-empty at every SF — every customer has "
    "*some* order in the fixtures, which made the bare version a vacuous "
    "empty-set comparison.)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big_orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, seg.c_mktsegment AS segment
    FROM region
    CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    """,
    doc="CROSS join of two tiny sides (broadcast nested loop; only ever safe "
    "when at least one side is provably small).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").select("r_name")
    seg = load(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    return region.crossJoin(F.broadcast(seg)).select("r_name", F.col("c_mktsegment").alias("segment"))


@register(
    "join_theta_range",
    oracle="""
    SELECT s_suppkey, count(*) AS n_richer_nations
    FROM supplier JOIN nation ON n_nationkey < s_nationkey
    GROUP BY s_suppkey
    """,
    doc="Theta (non-equi) join on a small pair — broadcast nested loop; at scale "
    "a non-equi join must keep one side broadcastable or be bucketized first.",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), nation.n_nationkey < supp.s_nationkey)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer_nations"))
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_time: str,
    start: str,
    end: str,
    bucket_width_sec: int,
) -> DataFrame:
    """Scalable point-in-interval join: bucketize time into fixed-width
    buckets, explode each interval over the buckets it spans, equi-join on
    (key, bucket), then filter exact containment ``start <= t < end``.

    A naive inequality join is a broadcast-nested-loop (quadratic); this
    form shuffles on (key, bucket) like any equi-join.  Choose the bucket
    width near the typical interval length: intervals explode into
    ``len/width + 1`` rows, and each point probes exactly one bucket.
    """
    pt = points.withColumn(
        "_bucket", F.floor(F.col(point_time).cast("timestamp").cast("double") / bucket_width_sec)
    )
    # Inverted intervals (end < start) contain no point — the containment
    # filter below already drops their matches, but F.sequence(hi, lo)
    # silently generates a DESCENDING bucket range, exploding garbage
    # candidate rows proportional to the inversion span.  Guard before the
    # explode: an inverted interval produces zero rows, by contract.
    iv = intervals.filter(F.col(end) >= F.col(start)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("timestamp").cast("double") / bucket_width_sec),
                F.floor(F.col(end).cast("timestamp").cast("double") / bucket_width_sec),
            )
        ),
    )
    joined = pt.join(
        iv,
        (pt[point_key] == iv[interval_key]) & (pt["_bucket"] == iv["_bucket"]),
        "inner",
    )
    return joined.filter(
        (pt[point_time] >= iv[start]) & (pt[point_time] < iv[end])
    ).drop("_bucket")


@register(
    "join_interval_bucketed",
    oracle="""
    WITH ship AS (
      SELECT o_custkey AS custkey, l_shipdate AS ship_ts
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ),
    win AS (
      SELECT o_custkey AS custkey, max(o_orderkey) AS order_key,
             o_orderdate AS win_start,
             o_orderdate + INTERVAL 30 DAY AS win_end
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT order_key, count(*) AS n_ship_in_window
    FROM win JOIN ship ON win.custkey = ship.custkey
                      AND ship.ship_ts >= win.win_start
                      AND ship.ship_ts <  win.win_end
    GROUP BY order_key
    """,
    doc="Point-in-interval join via bucketization: customer shipments falling "
    "in each 30-day post-order window. Bucket+equi-join+filter shuffles on "
    "(key, bucket) — the scale-safe form of an inequality join (a naive "
    "theta join is a nested loop).",
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ship = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("custkey"), F.col("l_shipdate").alias("ship_ts")
    )
    win = orders.groupBy(
        F.col("o_custkey").alias("wk"), F.col("o_orderdate").alias("win_start")
    ).agg(F.max("o_orderkey").alias("order_key")).withColumn(
        "win_end", F.col("win_start") + F.expr("INTERVAL 30 DAYS")
    )
    j = interval_join(
        ship, win,
        point_key="custkey", interval_key="wk",
        point_time="ship_ts", start="win_start", end="win_end",
        bucket_width_sec=30 * 86400,
    )
    return j.groupBy("order_key").agg(F.count(F.lit(1)).alias("n_ship_in_window"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """General as-of join (Spark lacks a native one): for each left row,
    the single right row with the nearest ``right_time`` at-or-before
    (``backward``) / at-or-after (``forward``) ``left_time``, per key.

    Composition: equi-join on the key with the time inequality, then a
    ``max(struct(time, payload))`` (or min) hash-aggregate — map-side
    partials, no sort, one shuffle on the join key.  ``tolerance`` (a
    Column interval / duration expr) bounds the time gap, like
    ``pd.merge_asof(tolerance=...)``.  Right payload columns come back
    prefixed ``asof_``.  Deterministic iff (key, time) is unique on the
    right — pre-collapse the right side otherwise.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    # dataframe-qualified refs so identical column names on both sides work
    lt, rt = left[left_time], right[right_time]
    cond = (left[left_on] == right[right_on]) & (lt >= rt if direction == "backward" else lt <= rt)
    if tolerance is not None:
        cond = cond & ((lt - rt <= tolerance) if direction == "backward" else (rt - lt <= tolerance))
    payload = [c for c in right.columns if c != right_on]
    joined = left.join(right, cond, "inner")
    pick = F.struct(*([right[right_time]] + [right[c] for c in payload if c != right_time]))
    best = (F.max(pick) if direction == "backward" else F.min(pick)).alias("_asof")
    out = joined.groupBy(*[left[c] for c in left.columns]).agg(best)
    for c in payload:
        out = out.withColumn(f"asof_{c}", F.col(f"_asof.{c}"))
    return out.drop("_asof")


@register(
    "join_asof_tolerance",
    oracle="""
    WITH od AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS order_key
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts,
           od.o_orderdate AS asof_o_orderdate, od.order_key AS asof_order_key
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_id < 2000) e
    ASOF JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
    WHERE e.ts - od.o_orderdate <= INTERVAL 8250 DAY
    """,
    doc="asof_join helper with a tolerance window (merge_asof "
    "semantics); oracle is DuckDB's native ASOF JOIN + gap filter.",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "user_id", "ts")
    )
    od = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("order_key"))
    )
    return asof_join(
        events, od,
        left_on="user_id", right_on="o_custkey",
        left_time="ts", right_time="o_orderdate",
        direction="backward",
        tolerance=F.expr("INTERVAL 8250 DAYS"),
    )


@register(
    "join_asof",
    oracle="""
    WITH od AS (
      -- non-null (key, time) stated explicitly: DuckDB's ASOF sorts NULL
      -- times LAST and would match a null-ts probe to the latest order —
      -- an engine null-sort artifact, not as-of semantics (null-KEYS find)
      SELECT o_custkey, o_orderdate,
             max(o_orderkey) AS order_key,
             round(sum(o_totalprice), 2) AS day_spend
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
      GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, od.o_orderdate AS asof_orderdate,
           od.order_key, od.day_spend
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL) e
    ASOF JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
    """,
    doc="As-of join via union + last(ignoreNulls) window: tag order-days and "
    "events into one stream per user, sort once by (time, tag), carry the "
    "last order payload forward onto each event. LINEAR in |left|+|right| — "
    "no multiplicative join intermediate, which is what kills the join+agg "
    "form (joins.asof_join, kept for the tolerance variant) when keys have "
    "many historical matches. The 100 TB as-of shape.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # As-of semantics need a non-null (key, time) on both sides: the
    # oracle's ASOF JOIN drops them via its equi/inequality predicates
    # (NULL never matches); the union+window form must drop them
    # EXPLICITLY or a null-key partition would carry payloads the join
    # semantics forbid (null-KEYS contract)
    events = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("event_id", "user_id", "ts")
    )
    od = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("order_key"),
            F.round(F.sum("o_totalprice"), 2).alias("day_spend"),
        )
    )
    p_type = "struct<o_orderdate:timestamp,order_key:bigint,day_spend:double>"
    right_rows = od.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("tag"),  # orders sort before a same-instant event (ts >= orderdate)
        F.lit(None).cast("bigint").alias("event_id"),
        F.struct("o_orderdate", "order_key", "day_spend").alias("p"),
    )
    left_rows = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.col("event_id"),
        F.lit(None).cast(p_type).alias("p"),
    )
    w = W.partitionBy("k").orderBy("t", "tag").rowsBetween(W.unboundedPreceding, 0)
    carried = F.last("p", ignorenulls=True).over(w)
    return (
        right_rows.unionByName(left_rows)
        .withColumn("c", carried)
        .filter((F.col("tag") == 1) & F.col("c").isNotNull())
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.col("c.o_orderdate").alias("asof_orderdate"),
            F.col("c.order_key").alias("order_key"),
            F.col("c.day_spend").alias("day_spend"),
        )
    )


@register(
    "join_lateral_topn",
    oracle="""
    SELECT n.n_nationkey, n.n_name, c.c_custkey, round(c.c_acctbal, 2) AS bal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) c
    """,
    doc="DataFrame lateral join (Spark 4 lateralJoin + .outer() correlated "
    "references): top-2 customers per nation via a per-row correlated "
    "subquery — the SQL-standard LATERAL shape.  Catalyst decorrelates "
    "the correlated limit into a rank-window plan, so execution is a "
    "single per-key top-n pass (the topk_per_group shape), NOT a "
    "re-executed subquery per outer row — which is what makes LATERAL "
    "usable against a 100 TB inner table.",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    inner = (
        c.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .limit(2)
        .select("c_custkey", "c_acctbal")
    )
    return n.lateralJoin(inner).select(
        "n_nationkey", "n_name", "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )


@register(
    "join_null_aware_anti",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer WHERE c_custkey NOT IN (
         SELECT o_custkey FROM orders WHERE o_totalprice > 400000))
        AS n_not_in_clean,
      (SELECT count(*) FROM customer WHERE c_custkey NOT IN (
         SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END
         FROM orders WHERE o_totalprice > 400000))
        AS n_not_in_nullable
    """,
    doc="NOT IN with a nullable subquery — SQL's three-valued-logic trap "
    "as a first-class operator: one NULL in the IN-list makes every "
    "non-matching row UNKNOWN (filtered), so the correct plan is a "
    "NULL-AWARE anti join, not a plain anti join (which would silently "
    "return the wrong rows).  Catalyst plans this as a null-aware "
    "BroadcastHashJoin (isNullAwareAntiJoin) — correct but requiring the "
    "IN-subquery side to broadcast; at 100 TB you rewrite to NOT EXISTS "
    "(a plain shuffled anti join) once you can PROVE the key non-null, "
    "which is exactly why this query keeps both shapes testable.  The "
    "fixture contrasts the two in one row: the null-free NOT IN counts "
    "real non-buyers; the nullable NOT IN collapses to zero — the trap "
    "made visible and hash-checked on both engines.",
)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
          (SELECT count(*) FROM customer WHERE c_custkey NOT IN (
             SELECT o_custkey FROM orders WHERE o_totalprice > 400000))
            AS n_not_in_clean,
          (SELECT count(*) FROM customer WHERE c_custkey NOT IN (
             SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END
             FROM orders WHERE o_totalprice > 400000))
            AS n_not_in_nullable
        """
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH od AS (
      SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS d,
             max(o_orderkey) AS order_key
      FROM orders GROUP BY o_custkey, d
    ),
    u AS (
      SELECT o_custkey AS k, d AS t, 0 AS tag, CAST(NULL AS BIGINT) AS event_id,
             {'d': d, 'okey': order_key} AS p
      FROM od
      UNION ALL
      SELECT user_id, CAST(ts AS TIMESTAMP), 1, event_id,
             CAST(NULL AS STRUCT(d TIMESTAMP, okey BIGINT))
      FROM events
    ),
    c AS (
      SELECT k, t, tag, event_id,
             -- t NULLS FIRST (Spark ASC default, stated): a null-time
             -- row sits at the timeline head on both sides
             last_value(p IGNORE NULLS) OVER
               (PARTITION BY k ORDER BY t NULLS FIRST, tag
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
             first_value(p IGNORE NULLS) OVER
               (PARTITION BY k ORDER BY t NULLS FIRST, tag
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS pf
      FROM u
    )
    SELECT event_id, k AS user_id,
           CASE WHEN pf.d IS NULL THEN pb.d
                WHEN pb.d IS NULL THEN pf.d
                WHEN date_diff('microsecond', pb.d, t)
                     <= date_diff('microsecond', t, pf.d) THEN pb.d
                ELSE pf.d END AS asof_orderdate,
           CASE WHEN pf.d IS NULL THEN pb.okey
                WHEN pb.d IS NULL THEN pf.okey
                WHEN date_diff('microsecond', pb.d, t)
                     <= date_diff('microsecond', t, pf.d) THEN pb.okey
                ELSE pf.okey END AS order_key,
           CASE WHEN pf.d IS NULL THEN date_diff('microsecond', pb.d, t)
                WHEN pb.d IS NULL THEN date_diff('microsecond', t, pf.d)
                ELSE least(date_diff('microsecond', pb.d, t),
                           date_diff('microsecond', t, pf.d)) END AS gap_us
    FROM c WHERE tag = 1
    """,
    doc="NEAREST as-of join (the bidirectional sibling of join_asof's "
    "backward pick): each event matches the order-day minimizing |gap|, "
    "ties to the at-or-before side — pandas merge_asof(direction="
    "'nearest') semantics, which Spark lacks natively.  Same LINEAR "
    "union+window shape as join_asof: one sort per user carries the last "
    "order payload forward (backward candidate) and the next order "
    "payload backward (forward candidate), then a row-local CASE picks "
    "the closer side — no join blow-up, gaps reported in exact integer "
    "microseconds.  Events before a user's first order / after the last "
    "fall back to the only available side; orderless users keep NULLs.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    od = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", F.col("o_orderdate").cast("timestamp").alias("d"))
        .agg(F.max("o_orderkey").alias("order_key"))
    )
    p_type = "struct<d:timestamp,okey:bigint>"
    right_rows = od.select(
        F.col("o_custkey").alias("k"),
        F.col("d").alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.struct(F.col("d"), F.col("order_key").alias("okey")).alias("p"),
    )
    left_rows = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.col("event_id"),
        F.lit(None).cast(p_type).alias("p"),
    )
    u = right_rows.unionByName(left_rows)
    w_back = (
        W.partitionBy("k")
        .orderBy(F.asc_nulls_first("t"), "tag")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_fwd = (
        W.partitionBy("k")
        .orderBy(F.asc_nulls_first("t"), "tag")
        .rowsBetween(0, W.unboundedFollowing)
    )
    c = u.select(
        "k",
        "t",
        "tag",
        "event_id",
        F.last("p", ignorenulls=True).over(w_back).alias("pb"),
        F.first("p", ignorenulls=True).over(w_fwd).alias("pf"),
    ).filter(F.col("tag") == 1)
    gb = F.unix_micros("t") - F.unix_micros("pb.d")
    gf = F.unix_micros("pf.d") - F.unix_micros("t")
    take_back = F.col("pf.d").isNull() | (F.col("pb.d").isNotNull() & (gb <= gf))
    return c.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.when(take_back, F.col("pb.d")).otherwise(F.col("pf.d")).alias("asof_orderdate"),
        F.when(take_back, F.col("pb.okey")).otherwise(F.col("pf.okey")).alias("order_key"),
        F.when(F.col("pf.d").isNull(), gb)
        .when(F.col("pb.d").isNull(), gf)
        .otherwise(F.least(gb, gf))
        .alias("gap_us"),
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH spans AS (
      SELECT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
             epoch_us(min(CAST(ts AS TIMESTAMP))) AS s_us,
             epoch_us(max(CAST(ts AS TIMESTAMP))) AS e_us
      FROM events
      WHERE user_id % 5 = 0
      GROUP BY user_id, d
      HAVING count(*) >= 2
    ),
    days AS (SELECT DISTINCT d FROM spans),
    win AS (
      SELECT d,
             CAST(epoch_us(CAST(d AS TIMESTAMP)) / 86400000000 AS BIGINT) * 4
               + slot AS window_id,
             epoch_us(CAST(d AS TIMESTAMP)) + slot * 21600000000
               + 900000000 AS w_s_us,
             epoch_us(CAST(d AS TIMESTAMP)) + slot * 21600000000
               + 2100000000 AS w_e_us
      FROM days CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS slot)
    )
    SELECT s.user_id, s.d, w.window_id,
           least(s.e_us, w.w_e_us) - greatest(s.s_us, w.w_s_us) AS overlap_us
    FROM spans s JOIN win w ON s.d = w.d
    WHERE s.s_us < w.w_e_us AND w.w_s_us < s.e_us
    """,
    doc="Interval-overlap range join (the TimescaleDB/PostgreSQL && "
    "operator, re-expressed for a shuffle engine): per-(user, day) "
    "activity spans joined against four deterministic 20-minute "
    "maintenance windows per day, keeping pairs whose time ranges "
    "intersect, with the exact overlap in integer microseconds.  The "
    "KEY scale decision is BINNING: both sides carry an equi-join key "
    "(the day) and the range predicate applies inside the bin, so "
    "Catalyst plans a hash/broadcast equi-join — never the "
    "BroadcastNestedLoopJoin a bare theta-join degenerates to (plan-"
    "asserted).  Intervals crossing bins generalize by exploding one "
    "row per covered bin + distinct — day-bounded spans here make that "
    "a no-op.  All arithmetic in integer epoch microseconds.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    spans = (
        ev.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .drop("n")
    )
    day_us = F.unix_micros(F.col("d").cast("timestamp"))
    win = (
        spans.select("d")
        .distinct()
        .select("d", F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("slot"))
        .select(
            "d",
            ((day_us / F.lit(86400000000)).cast("bigint") * 4 + F.col("slot")).alias(
                "window_id"
            ),
            (day_us + F.col("slot") * 21600000000 + 900000000).alias("w_s_us"),
            (day_us + F.col("slot") * 21600000000 + 2100000000).alias("w_e_us"),
        )
    )
    joined = spans.join(win, "d").filter(
        (F.col("s_us") < F.col("w_e_us")) & (F.col("w_s_us") < F.col("e_us"))
    )
    return joined.select(
        "user_id",
        "d",
        "window_id",
        (F.least("e_us", "w_e_us") - F.greatest("s_us", "w_s_us")).alias("overlap_us"),
    )


@register(
    "join_strategy_hints",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY c.c_mktsegment
    """,
    doc="Join strategy HINTS — the manual override lane every engine "
    "needs when statistics mislead the optimizer: the same logical "
    "orders-customer join is forced onto SHUFFLE_HASH (build a hash "
    "table per partition, no sort) instead of the auto-chosen "
    "broadcast/sort-merge.  Correctness is strategy-invariant (the "
    "oracle states the plain join); the plan test asserts the hint is "
    "actually honored (ShuffledHashJoin present) and that a MERGE hint "
    "on the identical frame yields SortMergeJoin instead.  When to "
    "force SHJ at 100 TB: both sides too big to broadcast, build side "
    "fits per-partition memory, and the sort of SMJ is the bottleneck "
    "— exactly the documented Spark guidance.",
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = load(spark, sf_dir, "customer").hint("SHUFFLE_HASH")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias(
                "revenue_cents"
            ),
        )
    )


@register(
    "join_band_tiering",
    oracle="""
    WITH tiers AS (
      SELECT 'negative' AS tier, CAST(-100000 AS DOUBLE) AS lo, CAST(0 AS DOUBLE) AS hi
      UNION ALL SELECT 'bronze', 0, 3000
      UNION ALL SELECT 'silver', 3000, 7000
      UNION ALL SELECT 'gold', 7000, 100000
    )
    SELECT t.tier,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS bal_cents
    FROM customer c
    JOIN tiers t ON c.c_acctbal >= t.lo AND c.c_acctbal < t.hi
    GROUP BY t.tier
    """,
    doc="Band (inequality) join against a tier dimension — the "
    "value-range lookup every pricing/segmentation model needs "
    "(acctbal -> bronze/silver/gold): customers matched to the tier "
    "whose [lo, hi) band contains their balance.  The tier table is "
    "TINY and the bands are disjoint, so the correct plan is a "
    "BroadcastNestedLoopJoin — the one place BNLJ is RIGHT (k rows x "
    "n rows with k~4 is a scan-speed predicate, and no equi-key "
    "exists); contrast with join_interval_overlap, where both sides "
    "scale and binning restores an equi-join.  An alternative compile "
    "is the CASE ladder (sql_unpivot's pivot style) — the join form "
    "wins when tiers are DATA maintained by analysts, not code.  "
    "Half-open bands pin boundary semantics exactly.",
)
def join_band_tiering(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiers = spark.createDataFrame(
        [
            ("negative", -100000.0, 0.0),
            ("bronze", 0.0, 3000.0),
            ("silver", 3000.0, 7000.0),
            ("gold", 7000.0, 100000.0),
        ],
        "tier string, lo double, hi double",
    )
    c = load(spark, sf_dir, "customer")
    joined = c.join(
        F.broadcast(tiers),
        (c.c_acctbal >= tiers.lo) & (c.c_acctbal < tiers.hi),
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")).alias("bal_cents"),
    )


# Allen's 13 interval relations as one CASE ladder over (as_, ae, bs, be).
# ONE source string feeds Spark (F.expr) and the DuckDB oracle verbatim —
# classification parity by construction.  Ladder order makes arms mutually
# exclusive without compound negations.
_ALLEN_CASE = """
    CASE WHEN ae <  bs THEN 'before'
         WHEN ae =  bs THEN 'meets'
         WHEN as_ >  be THEN 'after'
         WHEN as_ =  be THEN 'met_by'
         WHEN as_ = bs AND ae = be THEN 'equals'
         WHEN as_ = bs AND ae < be THEN 'starts'
         WHEN as_ = bs            THEN 'started_by'
         WHEN ae = be AND as_ > bs THEN 'finishes'
         WHEN ae = be             THEN 'finished_by'
         WHEN as_ > bs AND ae < be THEN 'during'
         WHEN as_ < bs AND ae > be THEN 'contains'
         WHEN as_ < bs            THEN 'overlaps'
         ELSE 'overlapped_by'
    END
"""


@register(
    "join_allen_intervals",
    oracle=f"""
    WITH iv AS (
      SELECT o_custkey AS ck, o_orderkey AS ok,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE)
               + CAST(o_orderkey % 20 + 3 AS INTEGER) AS e
      FROM orders
    ),
    pairs AS (
      SELECT a.s AS as_, a.e AS ae, b.s AS bs, b.e AS be
      FROM iv a JOIN iv b ON a.ck = b.ck AND a.ok < b.ok
    )
    SELECT {_ALLEN_CASE} AS relation,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY relation
    """,
    doc="ALLEN'S INTERVAL ALGEBRA classifier — the full 13-relation "
    "taxonomy (before/meets/overlaps/starts/during/finishes, their six "
    "inverses, equals) over same-customer order-fulfilment windows "
    "(span o_orderkey%20+3 days, deterministic from the key).  Where "
    "join_interval_overlap answers only 'do they intersect', temporal "
    "reasoning (contract overlap audits, process-mining conformance, "
    "temporal-DB coalescing) needs WHICH relation holds; the ladder is "
    "ONE shared CASE string evaluated verbatim by Spark (F.expr) and "
    "the oracle, so classification parity holds by construction, and "
    "ladder order (strict disjunctions first, equalities before "
    "containment) makes the 13 arms exhaustive and mutually exclusive "
    "over day-granular dates.  Scale: the pair join is key-equi on "
    "custkey (one shuffle, quadratic only within a customer's own "
    "orders, ~10 each), and classification is whole-stage-codegen "
    "date compares — no UDF, no range join.",
)
def join_allen_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 20 + 3).cast("int"),
        ).alias("e"),
    )
    a = iv.select("ck", "ok", F.col("s").alias("as_"), F.col("e").alias("ae"))
    b = iv.select(
        F.col("ck").alias("ck2"),
        F.col("ok").alias("ok2"),
        F.col("s").alias("bs"),
        F.col("e").alias("be"),
    )
    pairs = a.join(b, (F.col("ck2") == F.col("ck")) & (F.col("ok") < F.col("ok2")))
    return (
        pairs.select(F.expr(_ALLEN_CASE).alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
