"""Event/behavioral analytics operators: histograms, funnels, retention.

§2B widening (the reference delegates all analytics to BigQuery — SURVEY.md
§2A "implements zero of"): the three query shapes every event warehouse
runs daily, each expressed so the plan scales:

- histogram: one pass of partial counts over bucket ids (no sort);
- funnel: per-user conditional minima in ONE shuffle (no self-joins —
  the n-step funnel is n conditional aggregates over the same grouping);
- retention: week-bucketed distinct activity self-joined on (user, week+1)
  — keyed on high-cardinality (user, week), partial-agged before shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "analytics_value_histogram",
    oracle="""
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events
    GROUP BY bucket
    """,
    doc="Equi-width histogram of event values (width 25): bucket-id "
    "grouping is a single partial-agged shuffle of ~n_buckets rows — the "
    "scalable histogram shape (no sort, no percentile state). Data-QA "
    "companion to profile_table.",
)
def analytics_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.floor(F.col("value") / 25.0).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@register(
    "analytics_funnel_conversion",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      count(*) AS n_users,
      CAST(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
      CAST(sum(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
      CAST(sum(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                         AND first_purchase > first_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_click
    FROM per_user
    """,
    doc="Ordered 3-step funnel (view -> click -> purchase, strictly "
    "increasing first-touch times): n conditional minima in ONE per-user "
    "aggregate, then one global rollup — no event self-joins, so the cost "
    "is a single user-keyed shuffle regardless of funnel depth.",
)
def analytics_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")

    def first(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = e.groupBy("user_id").agg(
        first("view").alias("first_view"),
        first("click").alias("first_click"),
        first("purchase").alias("first_purchase"),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    purchased = clicked & (F.col("first_purchase") > F.col("first_click"))
    as_cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        as_cnt(viewed).alias("viewed"),
        as_cnt(clicked).alias("clicked_after_view"),
        as_cnt(purchased).alias("purchased_after_click"),
    )


@register(
    "analytics_weekly_retention",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800.0) AS BIGINT) AS wk
      FROM events
    )
    SELECT a.wk,
           count(*) AS active,
           CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS retained_next_week
    FROM act a LEFT JOIN act b ON b.user_id = a.user_id AND b.wk = a.wk + 1
    GROUP BY a.wk
    """,
    doc="Week-over-week retention: distinct (user, epoch-week) activity, "
    "left-joined to itself on (user, week+1), counted per cohort week.  "
    "Both join sides share the (user_id, wk) key — partial-agged distinct "
    "before the shuffle, equi-join on a high-cardinality composite key; at "
    "100 TB this is two shuffles of the DISTINCT table, never of raw "
    "events.",
)
def analytics_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    act = e.select(
        "user_id",
        F.floor(F.col("ts").cast("double") / 604800.0).cast("bigint").alias("wk"),
    ).distinct()
    nxt = act.select(F.col("user_id").alias("u2"), (F.col("wk") - 1).alias("wk_prev"))
    joined = act.join(
        nxt, (act.user_id == nxt.u2) & (act.wk == nxt.wk_prev), "left"
    )
    return joined.groupBy("wk").agg(
        F.count(F.lit(1)).alias("active"),
        F.sum(F.when(F.col("u2").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("retained_next_week"),
    )


@register(
    "analytics_cohort_ltv",
    oracle="""
    WITH ev AS (
      SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
      WHERE ts IS NOT NULL  -- no position on the cohort-age axis (contract)
    ),
    cohorts AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id),
    joined AS (
      SELECT c.cohort_wk,
             CAST(date_diff('week', c.cohort_wk, e.wk) AS BIGINT) AS age_weeks,
             e.user_id, e.cents
      FROM ev e JOIN cohorts c ON c.user_id = e.user_id
    ),
    agg AS (
      SELECT cohort_wk, age_weeks,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM joined GROUP BY cohort_wk, age_weeks
    )
    SELECT CAST(cohort_wk AS TIMESTAMP) AS cohort_wk, age_weeks, n_active, cents,
           CAST(sum(cents) OVER (PARTITION BY cohort_wk ORDER BY age_weeks
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
    FROM agg
    """,
    doc="Cohort lifetime-value analysis: users grouped by first-seen week "
    "(the cohort), activity re-keyed to cohort age in weeks, per-"
    "(cohort, age) active-user counts and revenue, and the running "
    "cumulative LTV per cohort — the retention sibling that tracks VALUE "
    "instead of presence (analytics_weekly_retention).  Shape: one "
    "group-agg for cohort assignment, one user-keyed join to re-key "
    "activity (at 100 TB the cohort table is one row per user — shuffle "
    "join on user_id, the natural key), one partial-agg reduce to "
    "(cohort, age) grain, then a window over the tiny cohort×age grid.  "
    "All integer-cent arithmetic, no float drift.",
)
def analytics_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # NULL ts has no cohort-age position (null-KEYS contract; oracle WHERE)
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts")).alias("wk"),
            F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
        )
    )
    cohorts = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    joined = ev.join(cohorts, "user_id").select(
        "cohort_wk",
        (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7).cast("bigint").alias("age_weeks"),
        "user_id",
        "cents",
    )
    agg = joined.groupBy("cohort_wk", "age_weeks").agg(
        F.countDistinct("user_id").alias("n_active"), F.sum("cents").alias("cents")
    )
    w = (
        W.partitionBy("cohort_wk")
        .orderBy("age_weeks")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return agg.select(
        "cohort_wk",
        "age_weeks",
        "n_active",
        "cents",
        F.sum("cents").over(w).alias("cum_cents"),
    )


@register(
    "analytics_audience_overlap",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    sizes AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY event_type
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b ON b.user_id = a.user_id AND a.event_type < b.event_type
      GROUP BY type_a, type_b
    )
    SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_both,
           CAST((2 * 1000000 * i.n_both + (sa.n + sb.n - i.n_both))
                // (2 * (sa.n + sb.n - i.n_both)) AS BIGINT) AS jaccard_x1e6
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
    doc="Audience overlap matrix: for every pair of event types, the exact "
    "intersection of their user audiences and the Jaccard similarity "
    "(segment-overlap analysis, the exact companion to the HLL/bitmap "
    "sketch rollups).  Plan: ONE distinct on (user, type) — the only "
    "pass over raw events — then a user-keyed self-join of that reduced "
    "audience table whose output is bounded by sum_u deg(u)^2 over "
    "DISTINCT types per user (<= k^2/2 rows per user for k event types, "
    "k small and fixed), then a type-pair aggregate.  Audience sizes "
    "join back broadcast-sized.  Never joins raw events to raw events; "
    "exact integer micro-Jaccard output.",
)
def analytics_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    union = F.col("n_a") + F.col("n_b") - F.col("n_both")
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_both").cast("bigint").alias("n_both"),
            ((2 * F.lit(1000000) * F.col("n_both") + union).cast("bigint"))
            .alias("_num"),
        )
        .withColumn(
            "jaccard_x1e6",
            F.expr("_num div (2 * (n_a + n_b - n_both))").cast("bigint"),
        )
        .drop("_num")
    )


@register(
    "analytics_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
      WHERE ts IS NOT NULL  -- a null-time event has no sequence position
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST((2 * 1000000 * n
                 + sum(n) OVER (PARTITION BY from_type))
                // (2 * sum(n) OVER (PARTITION BY from_type)) AS BIGINT)
             AS p_x1e6
    FROM trans
    """,
    doc="First-order event-transition matrix (Markov bigrams): per user, "
    "consecutive event pairs in (ts, event_id) order — the tie-break on "
    "event_id makes the sequence deterministic under equal timestamps — "
    "aggregated into from->to counts and row-normalized transition "
    "probabilities (exact integer micro-probabilities).  The building "
    "block for journey mining and next-event prediction features.  Plan: "
    "one user-keyed window pass over events (lead only, O(1) frame "
    "state), one partial-aggregated groupBy to the k^2-sized transition "
    "table, and the normalizing window runs on that k^2 table — at "
    "100 TB only the first two shuffles touch event-scale data.",
)
def analytics_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # NULL ts has no position in a temporal sequence (null-KEYS contract)
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    trans = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.sum("n").over(W.partitionBy("from_type"))
    return trans.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "CAST((2 * 1000000 * n + sum(n) OVER (PARTITION BY from_type))"
            " div (2 * sum(n) OVER (PARTITION BY from_type)) AS BIGINT)"
        ).alias("p_x1e6"),
    )


@register(
    "analytics_frequent_pairs",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n_orders AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS total FROM baskets),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, CAST(count(*) AS BIGINT) AS n_baskets
      FROM baskets a JOIN baskets b ON b.o = a.o AND a.p < b.p
      GROUP BY part_a, part_b
    )
    SELECT part_a, part_b, n_baskets,
           CAST((2 * 1000000 * n_baskets + total) // (2 * total) AS BIGINT)
             AS support_x1e6
    FROM pairs CROSS JOIN n_orders
    WHERE n_baskets >= 3
    """,
    doc="Frequent-itemset mining, pairwise pass (the candidate-generation "
    "step of Apriori / the 2-itemset half of FP-growth, market-basket "
    "style): parts co-purchased in the same order, with basket support "
    "as an exact integer micro-ratio.  Plan: one distinct to (order, "
    "part) baskets, one ORDER-KEYED self-join whose fan-out is bounded "
    "by basket_size^2 per order (TPC-H baskets are <=7 lines — at "
    "100 TB the bound is the retailer's basket size, never the catalog "
    "or order count), one partial-agged pair count, and the total-order "
    "scalar broadcast via crossJoin.  Support threshold prunes the "
    "long tail before any downstream join.",
)
def analytics_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    baskets = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    total_df = baskets.agg(F.countDistinct("o").cast("bigint").alias("total"))
    a = baskets.select("o", F.col("p").alias("part_a"))
    b = baskets.select("o", F.col("p").alias("part_b"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
        .filter(F.col("n_baskets") >= 3)
    )
    return pairs.crossJoin(F.broadcast(total_df)).select(
        "part_a",
        "part_b",
        "n_baskets",
        F.expr("CAST((2 * 1000000 * n_baskets + total) div (2 * total) AS BIGINT)").alias(
            "support_x1e6"
        ),
    )


_FUNNEL_WINDOW_H = 6  # max hours between consecutive funnel steps


@register(
    "analytics_window_funnel",
    oracle=f"""
    WITH t1 AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS ts1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS ts2
      FROM events e JOIN t1 ON t1.user_id = e.user_id
      WHERE e.event_type = 'click'
        AND CAST(e.ts AS TIMESTAMP) > t1.ts1
        AND CAST(e.ts AS TIMESTAMP) <= t1.ts1 + INTERVAL {_FUNNEL_WINDOW_H} HOUR
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS ts3
      FROM events e JOIN t2 ON t2.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND CAST(e.ts AS TIMESTAMP) > t2.ts2
        AND CAST(e.ts AS TIMESTAMP) <= t2.ts2 + INTERVAL {_FUNNEL_WINDOW_H} HOUR
      GROUP BY e.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_step1,
           CAST(count(t2.user_id) AS BIGINT) AS n_step2,
           CAST(count(t3.user_id) AS BIGINT) AS n_step3,
           CAST((2 * 1000000 * count(t3.user_id) + count(*)) // (2 * count(*))
                AS BIGINT) AS conversion_x1e6
    FROM t1
    LEFT JOIN t2 ON t2.user_id = t1.user_id
    LEFT JOIN t3 ON t3.user_id = t1.user_id
    """,
    doc=f"TIME-BOUNDED sequential funnel (ClickHouse windowFunnel "
    f"semantics, earliest-completion variant): view -> click -> purchase "
    f"where each step must follow the previous within {_FUNNEL_WINDOW_H} "
    f"hours, anchored at each user's EARLIEST qualifying prior step.  "
    f"Unlike analytics_funnel_conversion (unbounded ordering via "
    f"conditional minima in one pass), the time bound makes each step's "
    f"eligibility depend on the previous step's timestamp, so the plan "
    f"is a 3-stage user-keyed chain: aggregate step N's earliest "
    f"timestamp, join back to events, filter the (prev, prev+window] "
    f"range, aggregate step N+1.  All joins and aggregates key on "
    f"user_id — 3 shuffles of (user, ts) pairs, never events x events; "
    f"at 100 TB each stage's right side is one row per surviving user.  "
    f"Timestamps compared at microsecond precision on both engines.",
)
def analytics_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )

    def next_step(prev: DataFrame, prev_col: str, step: str, out_col: str) -> DataFrame:
        bound = F.col(prev_col) + F.expr(f"INTERVAL {_FUNNEL_WINDOW_H} HOURS")
        return (
            ev.filter(F.col("event_type") == step)
            .join(prev, "user_id")
            .filter((F.col("ts") > F.col(prev_col)) & (F.col("ts") <= bound))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_col))
        )

    t2 = next_step(t1, "ts1", "click", "ts2")
    t3 = next_step(t2, "ts2", "purchase", "ts3")
    joined = (
        t1.join(t2.select("user_id", F.lit(1).alias("s2")), "user_id", "left")
        .join(t3.select("user_id", F.lit(1).alias("s3")), "user_id", "left")
    )
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_step1"),
        F.count("s2").cast("bigint").alias("n_step2"),
        F.count("s3").cast("bigint").alias("n_step3"),
        F.expr(
            "CAST((2 * 1000000 * count(s3) + count(*)) div (2 * count(*)) AS BIGINT)"
        ).alias("conversion_x1e6"),
    )


@register(
    "analytics_attribution_last_touch",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    touches AS (
      SELECT user_id, event_type AS channel, ts, event_id FROM ev
      WHERE event_type IN ('view', 'click', 'signup')
    ),
    conv AS (SELECT user_id, ts, event_id, cents FROM ev WHERE event_type = 'purchase'),
    attributed AS (
      SELECT c.event_id AS conversion_id, c.cents, t.channel,
             row_number() OVER (
               PARTITION BY c.event_id
               ORDER BY t.ts DESC, t.event_id DESC) AS rn
      FROM conv c
      JOIN touches t
        ON t.user_id = c.user_id
       AND (t.ts < c.ts OR (t.ts = c.ts AND t.event_id < c.event_id))
       AND t.ts > c.ts - INTERVAL 7 DAY
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM attributed WHERE rn = 1
    GROUP BY channel
    """,
    doc="Last-touch marketing attribution: every purchase is credited to "
    "the most recent view/click/signup touch by the same user within a "
    "7-day lookback, then revenue rolls up per channel.  Spark-first "
    "shape: this is an AS-OF join (union + last-non-null window over the "
    "user timeline — the same linear plan as join_asof, NO range "
    "self-join), so the only event-scale shuffle keys on user_id and the "
    "per-user timeline is swept once in order.  The oracle states the "
    "equivalent declarative form (range join + row_number), which DuckDB "
    "can afford at sf0.01 but which degenerates quadratically per user "
    "at scale — exactly why the implementation picks the sweep.  "
    "Deterministic tie-break: later event_id wins on equal timestamps; "
    "revenue in integer cents.",
)
def analytics_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts"),
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click", "signup")).select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("channel"),
        F.lit(None).cast("long").alias("conv_id"),
        F.lit(None).cast("long").alias("conv_cents"),
    )
    convs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.lit(None).cast("string").alias("channel"),
        F.col("event_id").alias("conv_id"),
        F.col("cents").alias("conv_cents"),
    )
    # one interleaved user timeline; the last non-null (channel, ts, id)
    # seen at or before each row IS the last touch — linear sweep, no join
    timeline = touches.unionByName(convs)
    w = W.partitionBy("user_id").orderBy("t_ts", "t_id")
    lastc = F.last("channel", ignorenulls=True).over(w)
    last_ts = F.last(F.when(F.col("channel").isNotNull(), F.col("t_ts")), ignorenulls=True).over(w)
    swept = timeline.select(
        "conv_id",
        "conv_cents",
        "t_ts",
        lastc.alias("attr_channel"),
        last_ts.alias("attr_ts"),
    ).filter(F.col("conv_id").isNotNull() & F.col("attr_channel").isNotNull())
    within = swept.filter(
        F.col("attr_ts") > F.col("t_ts") - F.expr("INTERVAL 7 DAY")
    )
    return within.groupBy(F.col("attr_channel").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum("conv_cents").alias("revenue_cents"),
    )


@register(
    "analytics_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
            FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
    ),
    paths AS (
      -- || propagates NULL: a trigram STARTING at a null-typed event is a
      -- NULL path (one group) — the impl uses concat (not concat_ws,
      -- which would silently shorten it to a 2-step path)
      SELECT event_type || '>' || e2 || '>' || e3 AS path
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n,
           CAST(row_number() OVER (ORDER BY count(*) DESC, path) AS BIGINT) AS rnk
    FROM paths GROUP BY path
    QUALIFY rnk <= 20
    """,
    doc="User-path analysis (the product-analytics 'top paths' report): "
    "every consecutive event-type trigram along each user's timeline, "
    "counted corpus-wide, top 20.  One window pass per user timeline "
    "(lead x2 over a single shared (user, ts) window spec — one "
    "shuffle), then a partial-agged count on the path string; the final "
    "ranking runs on the k^3-bounded path table (125 rows here), so the "
    "global ORDER BY never touches event-scale data.  Deterministic "
    "order: (ts, event_id).",
)
def analytics_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    # NULLS FIRST pinned on BOTH sides: Spark ASC already places NULL ts
    # first, DuckDB defaults to NULLS LAST — unpinned, a null-ts event
    # (nullkeys tier) shifts every lead() trigram around it (ADVICE r13).
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_first(), "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    # concat, NOT concat_ws: a NULL event_type must null the whole path
    # (matching the oracle's ||), not silently shorten the trigram to a
    # two-step path (null-KEYS sibling-audit find — latent: the divergent
    # paths sat below the top-20 cut on every tier)
    paths = seq.select(
        F.concat(F.col("event_type"), F.lit(">"), F.col("e2"), F.lit(">"), F.col("e3")).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    # Global top-k via orderBy().limit(): TakeOrderedAndProject runs a
    # per-partition top-20 heap + a k-row driver merge — no exchange, no
    # full sort.  The old rank-then-filter shape single-partition-sorted
    # EVERY distinct trigram (r15 registry scan: Spark's
    # InferWindowGroupLimit never fires for empty partition specs, and a
    # cast between the rank and its filter would defeat it anyway); the
    # 20-row rank window after the limit is free and emits the identical
    # rnk because limit and window share the same total order.
    top = counted.orderBy(F.col("n").desc(), "path").limit(20)
    wr = W.orderBy(F.col("n").desc(), "path")
    return top.withColumn("rnk", F.row_number().over(wr).cast("bigint"))


@register(
    "analytics_sequence_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(s) AS BIGINT) AS seq_len,
           CAST((length(s) - length(replace(s, 'vcp', ''))) / 3 AS BIGINT) AS n_vcp,
           CAST((length(s) - length(replace(s, 'vp', ''))) / 2 AS BIGINT)  AS n_vp,
           (length(s) - length(replace(s, 'vcp', ''))) / 3 > 0 AS has_conversion_path
    FROM seq
    """,
    doc="MATCH_RECOGNIZE-lite sequence pattern matching (the Flink/Oracle "
    "row-pattern feature Spark lacks, re-expressed as a symbolic scan): "
    "each user's event timeline is folded into an ordered initial-letter "
    "string (one char per event — v/c/p/s/e), and patterns become exact "
    "substring counts: 'vcp' = view->click->purchase strictly "
    "consecutive, 'vp' = view->purchase consecutive.  The count is the "
    "replace-delta trick ((len - len(remove(pattern)))/len(pattern)) — "
    "non-overlapping leftmost matches, bit-identical across engines "
    "(regex engines differ in match policy; replace does not).  Scale: "
    "ONE shuffle on user_id; per-user state is the timeline string "
    "(bounded by session/user activity); the deterministic order inside "
    "the fold is (ts, event_id) on both sides.  At 100 TB the same plan "
    "runs per (user, day) to bound string length.",
)
def analytics_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.struct(F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("i")).alias(
            "e"
        ),
    )
    seq = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(F.array_sort(F.collect_list("e")), lambda x: x["i"]),
        ).alias("s")
    )
    s = F.col("s")
    n_vcp = ((F.length(s) - F.length(F.replace(s, F.lit("vcp"), F.lit("")))) / 3).cast("bigint")
    n_vp = ((F.length(s) - F.length(F.replace(s, F.lit("vp"), F.lit("")))) / 2).cast("bigint")
    return seq.select(
        "user_id",
        F.length(s).cast("bigint").alias("seq_len"),
        n_vcp.alias("n_vcp"),
        n_vp.alias("n_vp"),
        (n_vcp > 0).alias("has_conversion_path"),
    )


@register(
    "analytics_rfm_segmentation",
    oracle="""
    WITH tx AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS last_order,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    anchor AS (SELECT max(o_orderdate) AS now_ts FROM orders),
    scored AS (
      SELECT custkey,
             CAST((epoch_us(now_ts) - epoch_us(last_order)) // 86400000000
                  AS BIGINT) AS recency_days,
             frequency, monetary_cents,
             -- custkey tiebreak NULLS FIRST: Spark's ASC default, stated
             -- (the NULL-custkey rollup row sits inside tie groups)
             ntile(5) OVER (ORDER BY last_order DESC,
                            custkey NULLS FIRST)                   AS r_score,
             ntile(5) OVER (ORDER BY frequency DESC,
                            custkey NULLS FIRST)                   AS f_score,
             ntile(5) OVER (ORDER BY monetary_cents DESC,
                            custkey NULLS FIRST)                   AS m_score
      FROM tx CROSS JOIN anchor
    )
    SELECT custkey, recency_days, frequency, monetary_cents,
           r_score, f_score, m_score,
           CASE WHEN r_score = 1 AND f_score <= 2 AND m_score <= 2 THEN 'champion'
                WHEN r_score >= 4 AND f_score <= 2                 THEN 'at_risk'
                WHEN f_score >= 4 AND m_score >= 4                 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored
    WHERE custkey % 7 = 0
    """,
    doc="RFM customer segmentation — the canonical marketing-analytics "
    "rollup: per customer, Recency (days since last order, integer "
    "floor-division of epoch micros), Frequency, Monetary (integer "
    "cents), each scored into quintiles (ntile(5) with a deterministic "
    "(metric, custkey) total order — ntile ties are engine-defined "
    "without it), and a rule-based segment label.  Scale: each quintile "
    "is a scale.distributed_ntile pass (range-partitioned exact rank "
    "walk — NO unpartitioned window anywhere, r6); three parallel range "
    "exchanges of the customer rollup replace three single-reducer "
    "sorts.  When exact quintiles can yield to approximate ones, "
    "boundaries from the mergeable quantile sketch "
    "(agg_quantile_sketch) skip the rank pass entirely — the "
    "downstream CASE is unchanged.  One partial-agged groupBy touches "
    "facts.",
)
def analytics_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    tx = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias(
            "monetary_cents"
        ),
    )
    anchor = o.agg(F.max("o_orderdate").alias("now_ts"))
    from .scale import distributed_ntile

    # three exact global quintiles WITHOUT unpartitioned windows: each score
    # is a distributed_ntile pass (range-partitioned rank walk); the three
    # range exchanges parallelize where the old form moved the whole
    # customer rollup through one task three times (VERDICT r5 item 2)
    quintiled = distributed_ntile(
        distributed_ntile(
            distributed_ntile(
                tx,
                5,
                [F.col("last_order").desc(), F.asc_nulls_first("custkey")],
                out_col="r_score",
            ),
            5,
            [F.col("frequency").desc(), F.asc_nulls_first("custkey")],
            out_col="f_score",
        ),
        5,
        [F.col("monetary_cents").desc(), F.asc_nulls_first("custkey")],
        out_col="m_score",
    )
    scored = quintiled.crossJoin(F.broadcast(anchor)).select(
        "custkey",
        F.expr("(unix_micros(CAST(now_ts AS TIMESTAMP)) - unix_micros(CAST(last_order AS TIMESTAMP))) div 86400000000")
        .cast("bigint")
        .alias("recency_days"),
        "frequency",
        "monetary_cents",
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") == 1) & (F.col("f_score") <= 2) & (F.col("m_score") <= 2), "champion")
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "at_risk")
        .when((F.col("f_score") >= 4) & (F.col("m_score") >= 4), "hibernating")
        .otherwise("regular")
    )
    return scored.filter(F.col("custkey") % 7 == 0).withColumn("segment", seg)


@register(
    "analytics_pareto_8020",
    oracle="""
    WITH cust AS (
      SELECT o_custkey AS custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM cust),
    ranked AS (
      SELECT custkey, cents,
             CAST(row_number() OVER (ORDER BY cents DESC, custkey) AS BIGINT) AS rnk,
             CAST(sum(cents) OVER (ORDER BY cents DESC, custkey) AS BIGINT) AS cum
      FROM cust
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_cust FROM cust)
    SELECT CAST(min(rnk) AS BIGINT) AS n_top_customers,
           n_cust,
           CAST((2 * 1000 * min(rnk) + n_cust) // (2 * n_cust) AS BIGINT)
             AS top_share_x1000,
           total AS total_cents
    FROM ranked CROSS JOIN tot CROSS JOIN n
    WHERE 5 * cum >= 4 * total
    GROUP BY n_cust, total
    """,
    doc="Pareto 80/20 concentration analysis: the smallest top-spender "
    "prefix covering >= 80% of revenue (5*cum >= 4*total — pure integer "
    "compare, no percentage floats), reported with the prefix's share "
    "of the customer base in exact per-mille.  One fact-scale "
    "partial-agg groupBy; ranking and the cumulative window run on the "
    "customer rollup via scale.global_order_stats (range-partitioned "
    "exact rank + pid-partitioned running sum — no unpartitioned "
    "window, r6; n_cust rides the same pass).  The concentration readout that drives key-account "
    "and skew decisions (a 90%-one-key revenue table is also a SHUFFLE "
    "skew warning — see join_salted_skew).",
)
def analytics_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale import global_order_stats

    cust = load(spark, sf_dir, "orders").groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias("cents")
    )
    tot = cust.agg(F.sum("cents").alias("total"))
    # exact global (rank, running sum) over cents desc WITHOUT an
    # unpartitioned window: range-partitioned rank walk + pid-partitioned
    # running sum (VERDICT r5 item 2, fixed opportunistically)
    ranked = global_order_stats(
        cust, [F.col("cents").desc(), "custkey"], val_col="cents"
    ).select(
        "custkey",
        "cents",
        F.col("_rn").alias("rnk"),
        F.col("_cum").alias("cum"),
        F.col("_n_total").alias("n_cust"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .filter(5 * F.col("cum") >= 4 * F.col("total"))
        .groupBy("n_cust", "total")
        .agg(F.min("rnk").alias("n_top_customers"))
        .select(
            "n_top_customers",
            "n_cust",
            F.expr("(2 * 1000 * n_top_customers + n_cust) div (2 * n_cust)")
            .cast("bigint")
            .alias("top_share_x1000"),
            F.col("total").alias("total_cents"),
        )
    )


@register(
    "analytics_gini_coefficient",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
      FROM cust
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum((2 * i - 1) * cents) AS BIGINT) AS ws
      FROM ranked
    )
    SELECT n, s AS total_cents,
           CAST(floor((CAST(ws AS DOUBLE) / (n * CAST(s AS DOUBLE)) - 1.0)
                      * 1e6 + 0.5) AS BIGINT) AS gini_x1e6
    FROM agg
    """,
    doc="Gini coefficient of customer revenue — the inequality summary "
    "behind the Pareto prefix (analytics_pareto_8020 gives one point "
    "of the Lorenz curve; Gini integrates it): G = sum((2i-1)*x_(i)) / "
    "(n*sum(x)) - 1 over ascending-sorted values, computed from ONE "
    "ranked pass with integer weighted sums ((2i-1)*cents < 2^63 with "
    "margin) and a single final double expression, 1e-6 quantized.  "
    "Rank ties broken by custkey for determinism.  The rank comes from "
    "scale.global_order_stats (range-partitioned exact rank walk — no "
    "unpartitioned window, r6); the weighted sum is then a plain "
    "partial-agged aggregate.",
)
def analytics_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale import global_order_stats

    cust = load(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias("cents")
    )
    # exact global rank i WITHOUT an unpartitioned window (range-partitioned
    # rank walk) — at a 10^9-customer rollup the old single-reducer sort was
    # the one-task bottleneck (VERDICT r5 item 2, fixed opportunistically)
    ranked = global_order_stats(cust, ["cents", "o_custkey"]).select(
        "cents", F.col("_rn").alias("i")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum((2 * F.col("i") - 1) * F.col("cents")).alias("ws"),
    )
    gini = (
        F.col("ws").cast("double") / (F.col("n") * F.col("s").cast("double")) - 1.0
    )
    return agg.select(
        "n",
        F.col("s").alias("total_cents"),
        F.floor(gini * 1e6 + 0.5).cast("bigint").alias("gini_x1e6"),
    )


@register(
    "analytics_new_vs_returning",
    oracle="""
    WITH firstday AS (
      SELECT user_id,
             CAST(date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS DATE) AS first_d
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events
    )
    SELECT d.d,
           CAST(count(CASE WHEN d.d = f.first_d THEN 1 END) AS BIGINT) AS new_users,
           CAST(count(CASE WHEN d.d > f.first_d THEN 1 END) AS BIGINT)
             AS returning_users
    FROM daily d JOIN firstday f ON f.user_id = d.user_id
    GROUP BY d.d
    """,
    doc="New-vs-returning daily active users — the first split every "
    "growth dashboard makes: each (user, active-day) pair is classed "
    "by whether the day is the user's FIRST-ever active day.  Two "
    "partial-agged passes over events (first-touch min, distinct "
    "user-days) + one user-keyed join; the first-touch table is "
    "user-sized and at 100 TB is maintained INCREMENTALLY (min is a "
    "monoid — merge yesterday's table with today's batch, the "
    "agg_incremental_maintenance pattern) rather than rescanned.  "
    "Integer counts only.",
)
def analytics_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    )
    firstday = ev.groupBy("user_id").agg(F.min("d").alias("first_d"))
    daily = ev.distinct()
    return (
        daily.join(firstday, "user_id")
        .groupBy("d")
        .agg(
            F.count(F.when(F.col("d") == F.col("first_d"), 1)).alias("new_users"),
            F.count(F.when(F.col("d") > F.col("first_d"), 1)).alias("returning_users"),
        )
    )


@register(
    "analytics_trending_decayed",
    oracle="""
    WITH anchor AS (
      SELECT epoch_us(max(CAST(ts AS TIMESTAMP))) AS t_now FROM events
    ),
    terms AS (
      SELECT event_type,
             CAST(floor(pow(2.0, -(CAST(t_now - epoch_us(CAST(ts AS TIMESTAMP))
                                        AS DOUBLE) / 604800000000.0))
                        * 1e9 + 0.5) AS BIGINT) AS w_fp
      FROM events CROSS JOIN anchor
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(w_fp) AS BIGINT) AS decayed_count_x1e9
    FROM terms GROUP BY event_type
    """,
    doc="Exponentially time-decayed counters — the trending/hotness "
    "score of every feed and leaderboard (each event contributes "
    "2^(-age/half-life), half-life 7 days, anchored at the newest "
    "event): recency-weighted popularity WITHOUT windowed recompute, "
    "because the decayed sum is a MONOID under a shared anchor — "
    "partials merge by addition, and advancing the anchor by dt "
    "rescales the whole counter by one multiply (2^(-dt/λ)), which is "
    "how production systems age their counters in O(1).  Float "
    "discipline: each event's weight is quantized ONCE to 1e-9 fixed "
    "point (pow(2, x) on an identical double x — integer micros "
    "difference / literal divisor), so sums are exact integers in any "
    "order.  One partial-agged groupBy; anchor is a broadcast scalar.",
)
def analytics_trending_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us")
    )
    anchor = ev.agg(F.max("t_us").alias("t_now"))
    terms = ev.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.floor(
            F.pow(
                F.lit(2.0),
                -((F.col("t_now") - F.col("t_us")).cast("double") / 604800000000.0),
            )
            * 1e9
            + 0.5
        )
        .cast("bigint")
        .alias("w_fp"),
    )
    return terms.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("w_fp").alias("decayed_count_x1e9"),
    )


@register(
    "analytics_attribution_linear",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    touches AS (
      SELECT user_id, event_type AS channel, ts, event_id FROM ev
      WHERE event_type IN ('view', 'click', 'signup')
    ),
    conv AS (SELECT user_id, ts, event_id, cents FROM ev WHERE event_type = 'purchase'),
    pairs AS (
      SELECT c.event_id AS conversion_id, c.cents, t.channel,
             CAST(count(*) OVER (PARTITION BY c.event_id) AS BIGINT) AS n_touches
      FROM conv c
      JOIN touches t
        ON t.user_id = c.user_id
       AND (t.ts < c.ts OR (t.ts = c.ts AND t.event_id < c.event_id))
       AND t.ts > c.ts - INTERVAL 7 DAY
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(sum((2 * 1000000 * cents + n_touches) // (2 * n_touches))
                AS BIGINT) AS credited_microcents
    FROM pairs GROUP BY channel
    """,
    doc="LINEAR multi-touch attribution — the companion policy to "
    "analytics_attribution_last_touch: every touch inside the 7-day "
    "lookback gets an equal 1/n share of the conversion's revenue "
    "(exact integer micro-cents via the rounded division (2*1e6*c + n) "
    "div (2n) per touch).  Scale shape: unlike last-touch (which "
    "reduces to an as-of sweep), linear NEEDS the full touch set per "
    "conversion, so the honest plan is the user-keyed range join with "
    "the 7-day bound limiting fan-out (bin by day at 100 TB exactly as "
    "join_interval_overlap does; the oracle states the unbinned "
    "equivalent).  Tie semantics identical to the last-touch query "
    "(lexicographic (ts, event_id)).",
)
def analytics_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click", "signup")).select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
        "cents",
    )
    # conv and touches both derive from ev — explicit plan aliases instead
    # of self-join attribute disambiguation (warns "trivially true equals
    # predicate" and is version-fragile)
    pairs = conv.alias("cv").join(
        touches.alias("tc"),
        (F.col("cv.user_id") == F.col("tc.user_id"))
        & (
            (F.col("t_ts") < F.col("c_ts"))
            | ((F.col("t_ts") == F.col("c_ts")) & (F.col("t_id") < F.col("c_id")))
        )
        & (F.col("t_ts") > F.col("c_ts") - F.expr("INTERVAL 7 DAY")),
    ).select("c_id", "cents", "channel")
    w = W.partitionBy("c_id")
    credited = pairs.withColumn("n_touches", F.count(F.lit(1)).over(w))
    share = F.expr("(2 * 1000000 * cents + n_touches) div (2 * n_touches)")
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum(share).cast("bigint").alias("credited_microcents"),
    )


@register(
    "analytics_rolling_wau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    contrib AS (
      SELECT DISTINCT u.user_id, CAST(u.d + CAST(o.off AS INT) AS DATE) AS report_d
      FROM ud u CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o
    )
    SELECT c.report_d AS d,
           CAST(count(DISTINCT c.user_id) AS BIGINT) AS wau
    FROM contrib c JOIN days x ON x.d = c.report_d
    GROUP BY c.report_d
    """,
    doc="Rolling 7-day active users (WAU per day) — the sliding "
    "DISTINCT-over-window aggregate SQL cannot express directly "
    "(COUNT(DISTINCT) OVER RANGE is unsupported everywhere): each "
    "(user, active-day) pair is EXPLODED to the 7 report days it "
    "contributes to, then one distinct count per report day — the "
    "standard bounded-fan-out rewrite (factor = window/granularity = "
    "7, constant), restricted to days that exist in the data.  "
    "Shuffles: one user-day distinct, one (report-day keyed) count-"
    "distinct; both partial-agged.  At 100 TB the same rewrite runs "
    "at (window x key) granularity, or swaps the exact distinct for "
    "mergeable HLL sketches per day unioned over the window "
    "(agg_hll_sketch_rollup) — identical contribution shape.",
)
def analytics_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = (
        load(spark, sf_dir, "events")
        .select(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .distinct()
    )
    days = ud.select("d").distinct()
    offsets = F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    contrib = (
        ud.select("user_id", "d", offsets)
        .select("user_id", F.date_add(F.col("d"), F.col("off")).alias("report_d"))
        .distinct()
    )
    return (
        contrib.join(days.withColumnRenamed("d", "report_d"), "report_d")
        .groupBy(F.col("report_d").alias("d"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@register(
    "analytics_repurchase_intervals",
    oracle="""
    WITH purch AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER w) AS g_us
      FROM purch WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
    ),
    bucketed AS (
      SELECT CASE WHEN g_us < 3600000000        THEN '0_under_1h'
                  WHEN g_us < 86400000000       THEN '1_1h_to_1d'
                  WHEN g_us < 604800000000      THEN '2_1d_to_7d'
                  ELSE '3_over_7d' END AS bucket,
             g_us
      FROM gaps WHERE g_us IS NOT NULL
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(2 * median(g_us) AS BIGINT) AS median_us_x2
    FROM bucketed GROUP BY bucket
    """,
    doc="Repurchase-interval distribution — the time-to-next-purchase "
    "histogram behind every churn model and replenishment campaign: "
    "per-user consecutive purchase gaps (one lag() over the user "
    "timeline — never a self-join) bucketed into behavioral bands "
    "(impulse <1h, same-day, weekly, lapsed), each band reporting its "
    "count and exact median gap in doubled integer microseconds.  One "
    "user-keyed window shuffle on the purchase slice + a 4-group "
    "aggregate.  Deterministic (ts, event_id) ordering.",
)
def analytics_repurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    purch = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "event_id")
    # NULLS FIRST pinned (same contract as analytics_top_paths): a null-ts
    # purchase must sort to the head of the timeline on both engines, else
    # the lag() neighbor of the first real purchase differs (ADVICE r13).
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_first(), "event_id")
    gaps = purch.select(
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(w))
        ).alias("g_us")
    ).filter(F.col("g_us").isNotNull())
    bucket = (
        F.when(F.col("g_us") < 3600000000, "0_under_1h")
        .when(F.col("g_us") < 86400000000, "1_1h_to_1d")
        .when(F.col("g_us") < 604800000000, "2_1d_to_7d")
        .otherwise("3_over_7d")
    )
    return gaps.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        (2 * F.median("g_us")).cast("bigint").alias("median_us_x2"),
    )


# Wilson score interval, z=1.96: ONE expression string evaluated verbatim
# by Spark (F.expr) and DuckDB — every op is +,-,*,/ or sqrt (all IEEE
# correctly-rounded, so both engines produce bit-identical doubles; no
# transcendentals), in an identical evaluation order by construction.
_WILSON = """
    floor(((p + 1.9208 / n {sign} 1.96 * sqrt((p * (1.0 - p) + 0.9604 / n) / n))
           / (1.0 + 3.8416 / n)) * 1e9 + 0.5)
"""


@register(
    "analytics_wilson_ci",
    oracle=f"""
    WITH g AS (
      SELECT o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS s
      FROM orders GROUP BY pri
    ),
    r AS (SELECT pri, n, s, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM g)
    SELECT pri, n, s,
           CAST({_WILSON.format(sign='-')} AS BIGINT) AS wilson_lo_x1e9,
           CAST({_WILSON.format(sign='+')} AS BIGINT) AS wilson_hi_x1e9
    FROM r
    """,
    doc="WILSON SCORE CONFIDENCE INTERVAL (95%) on the fulfilled-order "
    "rate per priority class — the interval A/B dashboards should use "
    "instead of the normal approximation, which collapses (or exits "
    "[0,1]) at small n and extreme rates; Wilson stays valid at both.  "
    "The formula is ONE shared expression string (F.expr on the Spark "
    "side, spliced verbatim into the oracle) built exclusively from "
    "+,-,*,/ and sqrt — all IEEE-754 correctly-rounded, so both engines "
    "produce bit-identical nano-quantized bounds with no libm exposure; "
    "constants (1.9208 = z^2/2 etc.) are pre-folded decimal literals.  "
    "Complements agg_ab_ttest (mean difference) and "
    "agg_bootstrap_poisson_ci (resampled) with the closed-form "
    "proportion interval.  Scale: one partial-agg groupBy; the interval "
    "math runs on the 5-row aggregate.",
)
def analytics_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("s"),
    )
    r = g.select(
        "pri", "n", "s", (F.col("s").cast("double") / F.col("n").cast("double")).alias("p")
    )
    return r.select(
        "pri",
        "n",
        "s",
        F.expr(_WILSON.format(sign="-")).cast("bigint").alias("wilson_lo_x1e9"),
        F.expr(_WILSON.format(sign="+")).cast("bigint").alias("wilson_hi_x1e9"),
    )


@register(
    "analytics_peak_concurrency",
    oracle="""
    WITH pres AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP) + INTERVAL '30 minutes' AS e
      FROM events
      WHERE ts IS NOT NULL  -- a null-time presence has no sweep position
    ),
    deltas AS (
      SELECT event_type, s AS t, 1 AS d FROM pres
      UNION ALL
      SELECT event_type, e AS t, -1 FROM pres
    ),
    run AS (
      SELECT event_type, t, d,
             sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                          ROWS UNBOUNDED PRECEDING) AS conc
      FROM deltas
    )
    SELECT event_type,
           CAST(max(conc) AS BIGINT) AS peak,
           -- null-safe series identity (the NULL event_type series)
           min(CASE WHEN conc = (SELECT max(r2.conc) FROM run r2
                                 WHERE r2.event_type
                                       IS NOT DISTINCT FROM run.event_type)
                    THEN t END)      AS first_peak_at
    FROM run GROUP BY event_type
    """,
    doc="PEAK CONCURRENCY via the BOUNDARY-SWEEP rewrite — the capacity-"
    "planning query ('max simultaneous open sessions, and when') that "
    "naive SQL writes as a point-in-time self-join (O(n^2) and wrong at "
    "boundaries): each 30-min presence interval contributes a +1 at "
    "start and a -1 at end, the running sum over (time, delta) IS the "
    "concurrency curve (ends sort before coincident starts — the "
    "half-open [s,e) convention, so back-to-back intervals never "
    "double-count), max + argmin-time read the peak off the curve.  "
    "Same sweep underlies interval coalescing and room-scheduling; "
    "contrast join_interval_overlap, which enumerates pairs.  Scale: "
    "2 rows per interval, one per-key sort — the sweep is linear and "
    "partitions by event_type; at 100 TB the same sweep runs per time "
    "bucket after a range partition, merging bucket boundaries with "
    "carry-in sums.",
)
def analytics_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # NULL ts has no sweep position (null-KEYS contract; oracle WHERE)
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_type", "ts")
    )
    pres = ev.select(
        "event_type",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    deltas = pres.select("event_type", F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        pres.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = W.partitionBy("event_type").orderBy("t", "d").rowsBetween(W.unboundedPreceding, 0)
    run = deltas.select("event_type", "t", F.sum("d").over(w).alias("conc"))
    peak = run.groupBy("event_type").agg(F.max("conc").alias("peak"))
    return (
        # null-safe: the NULL event_type series joins to its own peak
        run.join(peak.withColumnRenamed("event_type", "et2"),
                 F.col("event_type").eqNullSafe(F.col("et2"))).drop("et2")
        .groupBy("event_type")
        .agg(
            F.max("peak").cast("bigint").alias("peak"),
            F.min(F.when(F.col("conc") == F.col("peak"), F.col("t"))).alias("first_peak_at"),
        )
    )


@register(
    "ts_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(sum(CAST(floor((value - 50.0) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS net
      FROM events WHERE ts IS NOT NULL GROUP BY event_type, d
    ),
    cum AS (
      SELECT event_type, d,
             sum(net) OVER (PARTITION BY event_type ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS equity
      FROM daily
    ),
    dd AS (
      SELECT event_type, d, equity,
             max(equity) OVER (PARTITION BY event_type ORDER BY d
                               ROWS UNBOUNDED PRECEDING) - equity AS drawdown
      FROM cum
    )
    SELECT event_type,
           CAST(max(drawdown) AS BIGINT) AS max_drawdown_cents,
           -- null-safe series identity: the NULL event_type series must
           -- find its own max, not an empty correlated set
           min(CASE WHEN drawdown = (SELECT max(d2.drawdown) FROM dd d2
                                     WHERE d2.event_type
                                           IS NOT DISTINCT FROM dd.event_type)
                    THEN d END)          AS trough_date,
           CAST(max(equity) AS BIGINT)   AS peak_equity_cents
    FROM dd GROUP BY event_type
    """,
    doc="MAXIMUM DRAWDOWN — the risk metric (largest peak-to-trough fall "
    "of a cumulative series) that requires the RUNNING-MAX-MINUS-VALUE "
    "rewrite: the naive form is a max over all (i<=j) pairs, O(n^2); "
    "the one-pass form is cum-sum -> running max -> max gap, two "
    "stacked windows on one sort.  Series: per-type daily net value "
    "(value centered at its design mean 50, so the equity curve "
    "genuinely rises and falls), all integer cents.  The trough date "
    "is the FIRST day attaining the max drawdown (deterministic "
    "tiebreak).  Complements ts_cusum_changepoint (drift detection) "
    "with the worst-case-excursion summary.  Scale: both windows share "
    "one (type, day)-sorted exchange over the calendar-bounded daily "
    "aggregate, never the raw events.",
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # NULL ts has no position on the time axis (null-KEYS contract,
    # stated in the oracle's WHERE)
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_type", "ts", "value")
    )
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("d"),
            F.floor((F.col("value") - 50.0) * 100 + 0.5).cast("bigint").alias("c"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("c").alias("net"))
    )
    w = W.partitionBy("event_type").orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    cum = daily.select("event_type", "d", F.sum("net").over(w).alias("equity"))
    dd = cum.select(
        "event_type",
        "d",
        "equity",
        (F.max("equity").over(w) - F.col("equity")).alias("drawdown"),
    )
    mx = dd.groupBy("event_type").agg(F.max("drawdown").alias("mdd"))
    return (
        # null-safe: the NULL event_type series joins to its own max
        dd.join(mx.withColumnRenamed("event_type", "et2"),
                F.col("event_type").eqNullSafe(F.col("et2"))).drop("et2")
        .groupBy("event_type")
        .agg(
            F.max("mdd").cast("bigint").alias("max_drawdown_cents"),
            F.min(F.when(F.col("drawdown") == F.col("mdd"), F.col("d"))).alias("trough_date"),
            F.max("equity").cast("bigint").alias("peak_equity_cents"),
        )
    )


@register(
    "analytics_association_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n_orders AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS total FROM baskets),
    item AS (SELECT p, CAST(count(*) AS BIGINT) AS n_item FROM baskets GROUP BY p),
    pairs AS (
      SELECT a.p AS ante, b.p AS cons, CAST(count(*) AS BIGINT) AS n_pair
      FROM baskets a JOIN baskets b ON b.o = a.o AND a.p <> b.p
      GROUP BY ante, cons
    )
    SELECT ante, cons, n_pair,
           (n_pair * 1000000) // t.total            AS support_x1e6,
           (n_pair * 1000000) // ia.n_item          AS confidence_x1e6,
           (n_pair * t.total * 1000000) // (ia.n_item * ic.n_item) AS lift_x1e6
    FROM pairs
    JOIN item ia ON ia.p = ante
    JOIN item ic ON ic.p = cons
    CROSS JOIN n_orders t
    WHERE n_pair >= 3
    """,
    doc="ASSOCIATION RULES (directed Apriori stage 2): for every "
    "co-purchased part pair, support / CONFIDENCE / LIFT as exact "
    "integer micro-ratios — the step analytics_frequent_pairs "
    "(undirected support only) feeds: confidence(a->b) = "
    "P(b|a) ranks recommendations, lift>1e6 separates genuine "
    "affinity from popularity coincidence (the metric that kills the "
    "'everyone buys milk' false rules).  Rules are DIRECTED (both "
    "orientations emitted; confidence is asymmetric).  All ratios are "
    "integer-division micro-units — no float, exact parity.  Scale: "
    "the basket self-join shuffles once on the order key (quadratic "
    "only within a basket, ~4 items); item counts broadcast back onto "
    "the pair table; thresholding (n_pair >= 3) happens before the "
    "dimension joins, so the rule table stays sparse.",
)
def analytics_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    total = baskets.agg(F.count_distinct("o").alias("total"))
    item = baskets.groupBy("p").agg(F.count(F.lit(1)).alias("n_item"))
    b2 = baskets.select(F.col("o").alias("o2"), F.col("p").alias("p2"))
    pairs = (
        baskets.join(b2, (F.col("o2") == F.col("o")) & (F.col("p") != F.col("p2")))
        .groupBy(F.col("p").alias("ante"), F.col("p2").alias("cons"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    ia = item.select(F.col("p").alias("ante"), F.col("n_item").alias("n_a"))
    ic = item.select(F.col("p").alias("cons"), F.col("n_item").alias("n_c"))
    return (
        pairs.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(total))
        .select(
            "ante",
            "cons",
            "n_pair",
            F.expr("(n_pair * 1000000) div total").alias("support_x1e6"),
            F.expr("(n_pair * 1000000) div n_a").alias("confidence_x1e6"),
            F.expr("(n_pair * total * 1000000) div (n_a * n_c)").alias("lift_x1e6"),
        )
    )


@register(
    "analytics_survival_km",
    oracle="""
    WITH span AS (
      SELECT o_custkey,
             CAST(min(o_orderdate) AS DATE) AS first_d,
             CAST(max(o_orderdate) AS DATE) AS last_d
      FROM orders GROUP BY o_custkey
    ),
    mx AS (SELECT max(last_d) AS m FROM span),
    subj AS (
      SELECT date_diff('day', first_d, last_d) AS dur,
             CASE WHEN last_d < (SELECT m FROM mx) - 180 THEN 1 ELSE 0 END AS evt
      FROM span
    ),
    per_t AS (
      SELECT dur, count(*) AS c_all, CAST(sum(evt) AS BIGINT) AS d
      FROM subj GROUP BY dur
    ),
    risk AS (
      SELECT dur, d,
             (SELECT count(*) FROM subj) -
               coalesce(sum(c_all) OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
      FROM per_t
    ),
    terms AS (
      SELECT dur, d, CAST(n AS BIGINT) AS n,
             CAST(floor(ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9 + 0.5)
                  AS BIGINT) AS l
      FROM risk WHERE d > 0
    )
    SELECT CAST(dur AS BIGINT) AS t_days, n AS n_at_risk, d AS d_events,
           CAST(floor(exp(CAST(sum(l) OVER (ORDER BY dur
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e9) * 1e6 + 0.5)
                AS BIGINT) AS survival_x1e6
    FROM terms
    """,
    doc="KAPLAN-MEIER SURVIVAL CURVE over customer lifetimes (first to "
    "last order; churn = last order >180 days before the dataset "
    "horizon, later actives right-CENSORED — they leave the risk set "
    "without counting as deaths, the thing naive retention curves get "
    "wrong): S(t) = prod(1 - d_i/n_i) over death times.  The product "
    "is computed in LOG SPACE with each term ln(1-d/n) INTEGER-"
    "quantized to 1e-9 BEFORE the running sum — summation of integers "
    "is order-independent and exact, so cross-engine parity holds with "
    "exactly one libm call per term and one exp at readout (the same "
    "quantize-between-steps discipline as graph_pagerank).  Risk sets "
    "come from one cumulative window over the duration histogram, not "
    "a per-time self-join.  Scale: subjects reduce to a duration "
    "histogram first (partial agg); the curve is calendar-bounded; "
    "censoring needs no extra pass.",
)
def analytics_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    span = o.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_d"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
    )
    mx = span.agg(F.max("last_d").alias("m"))
    subj = span.crossJoin(F.broadcast(mx)).select(
        F.datediff("last_d", "first_d").alias("dur"),
        F.when(F.col("last_d") < F.date_sub("m", 180), 1).otherwise(0).alias("evt"),
    )
    n_total = subj.count()  # bounded: one scalar for the risk-set offset
    per_t = subj.groupBy("dur").agg(
        F.count(F.lit(1)).alias("c_all"), F.sum("evt").alias("d")
    )
    w_prior = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    risk = per_t.select(
        "dur",
        "d",
        (F.lit(n_total) - F.coalesce(F.sum("c_all").over(w_prior), F.lit(0))).alias("n"),
    )
    terms = risk.filter(F.col("d") > 0).select(
        "dur",
        "d",
        F.col("n").cast("bigint").alias("n"),
        F.floor(
            F.log((F.col("n") - F.col("d")).cast("double") / F.col("n").cast("double"))
            * 1e9
            + 0.5
        )
        .cast("bigint")
        .alias("l"),
    )
    w_cum = W.orderBy("dur").rowsBetween(W.unboundedPreceding, 0)
    return terms.select(
        F.col("dur").cast("bigint").alias("t_days"),
        F.col("n").alias("n_at_risk"),
        F.col("d").alias("d_events"),
        F.floor(
            F.exp(F.sum("l").over(w_cum).cast("double") / 1e9) * 1e6 + 0.5
        )
        .cast("bigint")
        .alias("survival_x1e6"),
    )


@register(
    "analytics_state_durations",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS state, CAST(ts AS TIMESTAMP) AS ts,
             lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_ts
      FROM events
      WHERE ts IS NOT NULL  -- a null-time event has no dwell position
    )
    SELECT state,
           CAST(count(next_ts) AS BIGINT) AS n_visits,
           CAST(sum(CASE WHEN next_ts IS NOT NULL
                         THEN epoch_us(next_ts) - epoch_us(ts) END) AS BIGINT)
             AS total_us,
           CAST(sum(CASE WHEN next_ts IS NOT NULL
                         THEN epoch_us(next_ts) - epoch_us(ts) END)
                // count(next_ts) AS BIGINT) AS mean_us
    FROM seq GROUP BY state
    """,
    doc="STATE-MACHINE DWELL TIMES — how long users SIT in each state "
    "(state = last emitted event type, dwell = time to the next event), "
    "the duration half of process mining that "
    "analytics_event_transitions' Markov counts miss: transitions say "
    "where users go, dwell says where the TIME goes (support-queue "
    "triage, funnel stall diagnosis).  One lead() per user over "
    "(ts, event_id) — the unique tiebreak makes simultaneous events "
    "deterministic — then a bounded per-state aggregate; durations in "
    "exact integer microseconds (epoch_us / unix_micros on either "
    "engine), mean via integer division.  Terminal events (no "
    "successor) are open intervals and excluded from both count and "
    "sum on both sides.  Scale: one user-keyed exchange serves the "
    "window; the aggregate reduces map-side to 5 states.",
)
def analytics_state_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # NULL ts has no dwell position (null-KEYS contract; oracle WHERE)
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_id", "event_type", "ts")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("us"),
        F.unix_micros(F.lead("ts").over(w)).alias("next_us"),
    )
    return (
        seq.groupBy("state")
        .agg(
            F.count("next_us").alias("n_visits"),
            F.sum(F.col("next_us") - F.col("us")).alias("total_us"),
        )
        .select(
            "state",
            "n_visits",
            "total_us",
            F.expr("total_us div n_visits").alias("mean_us"),
        )
    )


@register(
    "analytics_fifo_allocation",
    oracle="""
    WITH lots AS (
      SELECT l_partkey AS pk, l_orderkey AS lot_id,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(l_shipdate AS DATE) AS d
      FROM lineitem WHERE l_partkey % 40 = 0
    ),
    demand AS (SELECT pk, CAST(count(*) * 15 AS BIGINT) AS dem
               FROM lots GROUP BY pk),
    run AS (
      SELECT l.pk, l.lot_id, l.qty, l.d, dm.dem,
             -- FIFO order NULLS FIRST (Spark ASC default, stated): a lot
             -- with no ship date sorts as oldest stock on both sides
             coalesce(sum(l.qty) OVER (PARTITION BY l.pk
                        ORDER BY l.d NULLS FIRST, l.lot_id NULLS FIRST
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      FROM lots l JOIN demand dm ON dm.pk = l.pk
    )
    SELECT pk, lot_id, d AS lot_date, qty,
           CAST(least(qty, greatest(dem - prior, 0)) AS BIGINT) AS allocated,
           CAST(qty - least(qty, greatest(dem - prior, 0)) AS BIGINT) AS remaining,
           (prior < dem AND prior + qty >= dem) AS is_boundary_lot
    FROM run
    """,
    doc="FIFO LOT ALLOCATION — the inventory/cost-accounting kernel "
    "(consume the OLDEST stock first) that naive row-by-row logic "
    "serializes and this expresses as ONE prefix sum: a part's demand "
    "is satisfied lot-by-lot in (ship-date, lot) order, and each lot's "
    "allocation is clamp(demand - prior_cumulative, 0, qty) — the "
    "closed form that turns sequential matching into a window "
    "expression (the same prefix-sum-instead-of-loop move as "
    "curation_pack_sequences).  The boundary lot (where demand "
    "exhausts) is flagged; everything is integer quantities.  Demand "
    "is deterministic (15 units x lot count per part).  Scale: one "
    "part-keyed window over the lot table + a broadcast demand join — "
    "FIFO across a billion lots is exactly this plan; the imperative "
    "version cannot shard.",
)
def analytics_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 40 == 0)
    lots = li.select(
        F.col("l_partkey").alias("pk"),
        F.col("l_orderkey").alias("lot_id"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.col("l_shipdate").cast("date").alias("d"),
    )
    demand = lots.groupBy("pk").agg((F.count(F.lit(1)) * 15).alias("dem"))
    w = (
        W.partitionBy("pk")
        .orderBy(F.asc_nulls_first("d"), F.asc_nulls_first("lot_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    run = lots.join(F.broadcast(demand), "pk").select(
        "pk",
        "lot_id",
        "qty",
        "d",
        "dem",
        F.coalesce(F.sum("qty").over(w), F.lit(0)).alias("prior"),
    )
    alloc = F.least(F.col("qty"), F.greatest(F.col("dem") - F.col("prior"), F.lit(0).cast("bigint")))
    return run.select(
        "pk",
        "lot_id",
        F.col("d").alias("lot_date"),
        "qty",
        alloc.alias("allocated"),
        (F.col("qty") - alloc).alias("remaining"),
        ((F.col("prior") < F.col("dem")) & (F.col("prior") + F.col("qty") >= F.col("dem"))).alias(
            "is_boundary_lot"
        ),
    )


@register(
    "analytics_ab_srm_check",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN CAST('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8)
                       AS UBIGINT) % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    counts AS (
      SELECT count(CASE WHEN arm = 'control' THEN 1 END)   AS n_c,
             count(CASE WHEN arm = 'treatment' THEN 1 END) AS n_t
      FROM assigned
    )
    SELECT CAST(n_c AS BIGINT) AS n_control,
           CAST(n_t AS BIGINT) AS n_treatment,
           CAST(floor(CAST((n_c - n_t) * (n_c - n_t) AS DOUBLE) / (n_c + n_t)
                      * 1e6 + 0.5) AS BIGINT) AS chi2_x1e6,
           CAST((n_c - n_t) * (n_c - n_t) AS DOUBLE) / (n_c + n_t) > 10.828
             AS srm_detected
    FROM counts
    """,
    doc="SAMPLE-RATIO-MISMATCH (SRM) GUARDRAIL — the first check every "
    "A/B platform runs before reading any metric: users hash into "
    "50/50 arms, and the observed split is chi-square-tested against "
    "the design ratio (for two equal cells the statistic collapses to "
    "(n_c - n_t)^2 / N — one exact-integer numerator, one division); "
    "crossing the p<0.001 critical value (10.828) flags a broken "
    "randomizer or differential logging loss, which silently biases "
    "every downstream metric (analytics_wilson_ci, agg_ab_ttest "
    "consume the arms this guards).  Assignment is the md5-parity "
    "deterministic bucketing real platforms use — replayable, "
    "stateless, uniform.  Scale: distinct + one two-cell aggregate; "
    "the test runs on two numbers regardless of corpus size.",
)
def analytics_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = load(spark, sf_dir, "events").select("user_id").distinct()
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0,
        "control",
    ).otherwise("treatment")
    counts = users.select(arm.alias("arm")).agg(
        F.count(F.when(F.col("arm") == "control", 1)).alias("n_c"),
        F.count(F.when(F.col("arm") == "treatment", 1)).alias("n_t"),
    )
    chi2 = ((F.col("n_c") - F.col("n_t")) * (F.col("n_c") - F.col("n_t"))).cast(
        "double"
    ) / (F.col("n_c") + F.col("n_t"))
    return counts.select(
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_treatment"),
        F.floor(chi2 * 1e6 + 0.5).cast("bigint").alias("chi2_x1e6"),
        (chi2 > 10.828).alias("srm_detected"),
    )


@register(
    "analytics_longest_streak",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    seq AS (
      SELECT user_id, d,
             CAST(d - DATE '1970-01-01' AS BIGINT)
               - row_number() OVER (PARTITION BY user_id ORDER BY d) AS anchor
      FROM active
    ),
    streaks AS (
      SELECT user_id, anchor, count(*) AS len,
             min(d) AS start_day, max(d) AS end_day
      FROM seq GROUP BY user_id, anchor
    ),
    best AS (
      SELECT *, row_number() OVER (
               PARTITION BY user_id ORDER BY len DESC, start_day) AS r
      FROM streaks
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(len AS BIGINT) AS streak_days,
           start_day, end_day
    FROM best WHERE r = 1 AND len >= 3
    """,
    doc="Longest consecutive-day activity streak per user — the retention/"
    "gamification metric ('your 47-day streak') and the canonical GAPS-"
    "AND-ISLANDS rewrite: consecutive runs share a constant anchor "
    "(epoch_day - row_number), so islands fall out of one GROUP BY with "
    "NO self-join and no iteration.  Two window passes partitioned by "
    "user (dense keys, no skew: each user's active-day list is bounded "
    "by the calendar) + one partial-agged groupBy; at 100 TB the "
    "distinct-day pre-reduction shrinks raw events to |user x day| "
    "before any window state is built.  Pure integer date arithmetic "
    "on both engines.",
)
def analytics_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    active = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    seq = active.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("bigint")
            - F.row_number().over(W.partitionBy("user_id").orderBy("d"))
        ).alias("anchor"),
    )
    streaks = seq.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("d").alias("start_day"),
        F.max("d").alias("end_day"),
    )
    best = streaks.withColumn(
        "r",
        F.row_number().over(
            W.partitionBy("user_id").orderBy(F.col("len").desc(), "start_day")
        ),
    )
    return best.filter((F.col("r") == 1) & (F.col("len") >= 3)).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("len").cast("bigint").alias("streak_days"),
        "start_day",
        "end_day",
    )
