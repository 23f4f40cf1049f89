"""Data-quality / warehouse-maintenance operators: constraint audits and
SCD Type-2 dimension builds.

Reference lineage: the reference's only post-load validation is a row-count
print (``/root/reference/app/bq-importer/main.py:41-43``).  A production
load pipeline extends that into declarative constraint checks (referential
integrity, key uniqueness, null/range rules) and history-preserving
dimension maintenance — both standard BigQuery-side jobs in the reference's
architecture, re-expressed Spark-native here.

Scale notes: every constraint check is one aggregate or one anti-join
keyed on the constraint's own column — no check ever shuffles more than
(key, 1) pairs, and independent checks share nothing, so the whole audit
parallelizes trivially.  The SCD2 build is two window passes over the
change stream (change detection, then interval stitching), both partitioned
by the dimension key — the canonical warehouse pattern at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "dq_constraint_audit",
    oracle="""
    SELECT 'lineitem_orderkey_fk' AS constraint_name,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS violations
    UNION ALL
    SELECT 'orders_custkey_fk',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer_nationkey_fk',
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'orders_pk_unique',
           (SELECT count(*) FROM (
              SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1))
    UNION ALL
    SELECT 'lineitem_qty_range',
           (SELECT count(*) FROM lineitem
            WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50)
    UNION ALL
    SELECT 'orders_price_positive',
           (SELECT count(*) FROM orders
            WHERE o_totalprice IS NULL OR o_totalprice <= 0)
    """,
    doc="Declarative constraint audit over the loaded warehouse: referential "
    "integrity (three FK chains checked with LEFT ANTI joins — the orphan "
    "side only, never a full join materialization), primary-key uniqueness "
    "(group-count > 1), and null/range rules (single-pass conditional "
    "counts).  One row per constraint with its violation count — the shape "
    "a load pipeline writes to its audit table after every batch.  Extends "
    "reference op #21 (post-load row count, bq-importer/main.py:41-43) to "
    "real invariants.  At 100 TB each FK check shuffles only the child "
    "table's key column against the parent's key column (both single-column "
    "projections pushed to the scan), and the checks are independent jobs — "
    "run them concurrently or gate the load on the union, as here.",
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")

    def count_df(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("constraint_name"), F.count(F.lit(1)).alias("violations")
        )

    fk_li = li.select("l_orderkey").join(
        o.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti"
    )
    fk_o = o.select("o_custkey").join(
        c.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti"
    )
    fk_c = c.select("c_nationkey").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nationkey"))),
        "c_nationkey",
        "left_anti",
    )
    pk_dupes = (
        o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") > 1)
    )
    qty_bad = li.filter(
        F.col("l_quantity").isNull() | (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
    )
    price_bad = o.filter(F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0))

    return (
        count_df("lineitem_orderkey_fk", fk_li)
        .unionByName(count_df("orders_custkey_fk", fk_o))
        .unionByName(count_df("customer_nationkey_fk", fk_c))
        .unionByName(count_df("orders_pk_unique", pk_dupes))
        .unionByName(count_df("lineitem_qty_range", qty_bad))
        .unionByName(count_df("orders_price_positive", price_bad))
    )


@register(
    "elt_scd2_dimension",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             -- change-stream order NULLS FIRST (Spark ASC default,
             -- stated): a null-dated order sorts at history start
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate NULLS FIRST,
                                         o_orderkey NULLS FIRST) AS prev_priority
      FROM orders
    ),
    changes AS (
      SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from, o_orderkey
      FROM ordered
      WHERE prev_priority IS NULL OR o_orderpriority <> prev_priority
    )
    SELECT o_custkey, o_orderpriority AS priority, valid_from,
           lead(valid_from) OVER (PARTITION BY o_custkey
                                  ORDER BY valid_from NULLS FIRST,
                                           o_orderkey NULLS FIRST) AS valid_to,
           lead(valid_from) OVER (PARTITION BY o_custkey
                                  ORDER BY valid_from NULLS FIRST,
                                           o_orderkey NULLS FIRST) IS NULL AS is_current
    FROM changes
    """,
    doc="SCD Type-2 dimension build: collapse a change stream (each "
    "customer's order-priority tier over their order history) into validity "
    "intervals — change-point detection with lag() over (key, time), then "
    "interval stitching with lead(), NULL valid_to marking the current row. "
    "This is the history-preserving dimension-maintenance job every "
    "warehouse runs after loads like the reference's.  Two window passes "
    "over the SAME (o_custkey-partitioned, date-ordered) window spec, so "
    "Catalyst plans ONE exchange + one sort for both; ties broken by "
    "o_orderkey for determinism.  At 100 TB: shuffle is (key, priority, date) "
    "triples once, state per task is one partition's rows — no self-joins, "
    "no driver logic.",
)
def elt_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    w_seq = W.partitionBy("o_custkey").orderBy(
        F.asc_nulls_first("o_orderdate"), F.asc_nulls_first("o_orderkey")
    )
    changes = (
        o.withColumn("prev_priority", F.lag("o_orderpriority").over(w_seq))
        .filter(
            F.col("prev_priority").isNull()
            | (F.col("o_orderpriority") != F.col("prev_priority"))
        )
        .select(
            "o_custkey",
            F.col("o_orderpriority"),
            F.col("o_orderdate").alias("valid_from"),
            "o_orderkey",
        )
    )
    # same-day double change: chain intervals in CHRONOLOGICAL order
    # (valid_from, o_orderkey) — the same order change detection used — so
    # is_current always lands on the latest change, not a string-sort winner
    w_iv = W.partitionBy("o_custkey").orderBy(
        F.asc_nulls_first("valid_from"), F.asc_nulls_first("o_orderkey")
    )
    return changes.select(
        "o_custkey",
        F.col("o_orderpriority").alias("priority"),
        "valid_from",
        F.lead("valid_from").over(w_iv).alias("valid_to"),
        F.lead("valid_from").over(w_iv).isNull().alias("is_current"),
    )


@register(
    "join_scd2_point_in_time",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev_priority
      FROM orders
    ),
    changes AS (
      SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from, o_orderkey
      FROM ordered
      WHERE prev_priority IS NULL OR o_orderpriority <> prev_priority
    ),
    dim AS (
      SELECT o_custkey, o_orderpriority AS priority, valid_from,
             lead(valid_from) OVER (PARTITION BY o_custkey
                                    ORDER BY valid_from, o_orderkey) AS valid_to
      FROM changes
    )
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, d.priority
    FROM events e
    LEFT JOIN dim d
      ON d.o_custkey = e.user_id
     AND CAST(e.ts AS TIMESTAMP) >= d.valid_from
     AND (d.valid_to IS NULL OR CAST(e.ts AS TIMESTAMP) < d.valid_to)
    """,
    doc="Point-in-time dimension lookup against the SCD2 history — the "
    "CONSUMER side of elt_scd2_dimension: each event is enriched with "
    "the attribute that was valid AT ITS TIMESTAMP, via the equi-key + "
    "half-open-interval join [valid_from, valid_to).  LEFT join keeps "
    "pre-history events (NULL attribute) honest instead of dropping "
    "them.  Intervals per key are disjoint by construction, so the "
    "residual range predicate matches at most one dimension row per "
    "fact — the join stays one-to-at-most-one with no dedup needed.  At "
    "100 TB: equi-shuffle on the dimension key carries the compact "
    "interval table; the range condition is a residual filter, not a "
    "join explosion.",
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = elt_scd2_dimension(spark, sf_dir).select(
        F.col("o_custkey").alias("d_key"), "priority", "valid_from", "valid_to"
    )
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    cond = (
        (F.col("user_id") == F.col("d_key"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    )
    return ev.join(dim, cond, "left").select("event_id", "user_id", "ts", "priority")


@register(
    "dq_reconciliation_rowhash",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS k,
             CAST(o_orderdate AS DATE) AS d,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    b AS (  -- replica with injected per-row corruption
      SELECT k, d, cents + CASE WHEN k % 211 = 0 THEN 1 ELSE 0 END AS cents
      FROM a
    ),
    da AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n_a,
             CAST(sum(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '|' ||
                      CAST(cents AS VARCHAR)), 1, 10) AS BIGINT)) AS BIGINT) AS dig_a
      FROM a GROUP BY d
    ),
    db AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '|' ||
                      CAST(cents AS VARCHAR)), 1, 10) AS BIGINT)) AS BIGINT) AS dig_b
      FROM b GROUP BY d
    )
    SELECT da.d, da.n_a, db.n_b,
           da.n_a = db.n_b AND da.dig_a = db.dig_b AS partition_matches
    FROM da JOIN db ON db.d = da.d
    """,
    doc="Replication reconciliation via ORDER-INDEPENDENT partition "
    "digests: every row hashes to a 40-bit integer (md5 of its "
    "normalized representation) and a partition's fingerprint is the "
    "SUM of its row digests — commutative, so primary and replica can "
    "be scanned in any partition order, any parallelism, and compared "
    "per day-partition with one tiny join of per-day summaries.  This "
    "is how you verify the reference's Cloud SQL -> BigQuery copy "
    "without re-shipping data: ship per-partition (count, digest) "
    "pairs only.  A deterministic corruption (cents+1 on keys %211) is "
    "injected into the replica so the check provably DETECTS mismatches "
    "(days containing a corrupted key flip to false).  40-bit digests "
    "keep per-day sums < 2^53 even at 10M rows/day; collision-masking "
    "of a corruption requires digest deltas summing to exactly zero — "
    "~2^-40 per affected partition.  Fact rows touched once per side.",
)
def dq_reconciliation_rowhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    b = a.select(
        "k", "d", (F.col("cents") + F.when(F.col("k") % 211 == 0, 1).otherwise(0)).alias("cents")
    )

    def digest(df: DataFrame, n_name: str, dig_name: str) -> DataFrame:
        row_digest = F.conv(
            F.substring(
                F.md5(F.concat(F.col("k").cast("string"), F.lit("|"), F.col("cents").cast("string"))),
                1,
                10,
            ),
            16,
            10,
        ).cast("bigint")
        return df.groupBy("d").agg(
            F.count(F.lit(1)).cast("bigint").alias(n_name),
            F.sum(row_digest).cast("bigint").alias(dig_name),
        )

    da = digest(a, "n_a", "dig_a")
    db = digest(b, "n_b", "dig_b")
    return da.join(db, "d").select(
        "d",
        "n_a",
        "n_b",
        ((F.col("n_a") == F.col("n_b")) & (F.col("dig_a") == F.col("dig_b"))).alias(
            "partition_matches"
        ),
    )


@register(
    "dq_freshness_partition_audit",
    oracle="""
    WITH base AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
             CAST(ts AS TIMESTAMP) AS ts, user_id
      FROM events
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
                   CAST(count(DISTINCT d) AS BIGINT) AS n_days
            FROM base)
    SELECT d,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST((epoch_us(CAST(d + INTERVAL 1 DAY AS TIMESTAMP))
                 - epoch_us(max(ts))) // 1000000 AS BIGINT)
             AS freshness_lag_sec,
           CAST((2 * 100 * count(*) * n_days + n_total)
                // (2 * n_total) AS BIGINT) AS completeness_pct,
           (epoch_us(CAST(d + INTERVAL 1 DAY AS TIMESTAMP))
            - epoch_us(max(ts))) // 1000000 < 3600 AS fresh_within_1h
    FROM base CROSS JOIN tot
    GROUP BY d, n_total, n_days
    """,
    doc="Partition-level freshness/completeness audit — the data-SLA "
    "check every warehouse load needs beyond row-level constraints "
    "(dq_constraint_audit): per day partition, volume (rows, distinct "
    "users), FRESHNESS (lag from the last event to the partition "
    "boundary, flagged against a 1-hour SLA), and COMPLETENESS (this "
    "partition's share vs the uniform per-day expectation, exact "
    "rounded percent via integer (2*100*n*days + total) div "
    "(2*total)).  One partial-agged groupBy on the partition key + a "
    "broadcast scalar join for the totals; this is the audit that runs "
    "after every incremental load and gates downstream consumption at "
    "100 TB.  Integer/boolean outputs only.",
)
def dq_freshness_partition_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"), "ts", "user_id"
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("d").alias("n_days"),
    )
    day_end = (F.col("d") + F.expr("INTERVAL 1 DAY")).cast("timestamp")
    lag_sec = (F.unix_micros(day_end) - F.unix_micros(F.max("ts"))) / 1000000
    return (
        base.crossJoin(F.broadcast(tot))
        .groupBy("d", "n_total", "n_days")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            lag_sec.cast("bigint").alias("freshness_lag_sec"),
            F.expr(
                "(2 * 100 * count(*) * n_days + n_total) div (2 * n_total)"
            ).cast("bigint").alias("completeness_pct"),
            (lag_sec < 3600).alias("fresh_within_1h"),
        )
        .drop("n_total", "n_days")
    )


@register(
    "elt_cell_level_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o_orderpriority AS pri
      FROM orders WHERE o_orderkey <= 6000
    ),
    b AS (  -- replica with deterministic cell corruptions
      SELECT k,
             CASE WHEN k % 97 = 0 THEN 'X' ELSE st END AS st,
             cents + CASE WHEN k % 131 = 0 THEN 7 ELSE 0 END AS cents,
             pri
      FROM a
    ),
    ma AS (
      SELECT k, 'st' AS col, st AS val FROM a
      UNION ALL SELECT k, 'cents', CAST(cents AS VARCHAR) FROM a
      UNION ALL SELECT k, 'pri', pri FROM a
    ),
    mb AS (
      SELECT k, 'st' AS col, st AS val FROM b
      UNION ALL SELECT k, 'cents', CAST(cents AS VARCHAR) FROM b
      UNION ALL SELECT k, 'pri', pri FROM b
    )
    SELECT ma.k, ma.col, ma.val AS old_val, mb.val AS new_val
    FROM ma JOIN mb ON mb.k = ma.k AND mb.col = ma.col
    WHERE ma.val IS DISTINCT FROM mb.val
    """,
    doc="CELL-level table diff — the forensic step after "
    "elt_snapshot_diff says a row 'changed': both table versions are "
    "melted to (key, column, value-as-text) EAV rows (unpivot — the "
    "Expand operator), equi-joined on (key, column), and only "
    "null-safely-differing cells survive, yielding the exact (column, "
    "old, new) audit trail per key.  The melt is the trick that makes "
    "cell diffing schema-generic: adding a column changes only the "
    "melt list, not the join.  Shuffle: one (key, column)-keyed join; "
    "at 100 TB pre-filter with the row-level digest diff so only "
    "changed rows melt (digests from dq_reconciliation_rowhash).  "
    "Fixture corruptions are deterministic (k%97 status flip, k%131 "
    "cents drift).",
)
def elt_cell_level_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 6000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("st"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
            F.col("o_orderpriority").alias("pri"),
        )
    )
    b = a.select(
        "k",
        F.when(F.col("k") % 97 == 0, F.lit("X")).otherwise(F.col("st")).alias("st"),
        (F.col("cents") + F.when(F.col("k") % 131 == 0, 7).otherwise(0)).alias("cents"),
        "pri",
    )

    def melt(df: DataFrame) -> DataFrame:
        text = df.select(
            "k",
            F.col("st").alias("st"),
            F.col("cents").cast("string").alias("cents"),
            F.col("pri").alias("pri"),
        )
        return text.unpivot(
            ids=["k"], values=["st", "cents", "pri"],
            variableColumnName="col", valueColumnName="val",
        )

    ma, mb = melt(a), melt(b)
    return (
        ma.join(
            mb.withColumnsRenamed({"val": "new_val"}),
            ["k", "col"],
        )
        .filter(~F.col("val").eqNullSafe(F.col("new_val")))
        .select("k", "col", F.col("val").alias("old_val"), "new_val")
    )


@register(
    "dq_data_contract",
    oracle="""
    SELECT 'o_orderstatus' AS col, 'enum_domain' AS rule,
           CAST((SELECT count(*) FROM orders
                 WHERE o_orderstatus NOT IN ('O','F','P')) AS BIGINT) AS violations
    UNION ALL
    SELECT 'o_totalprice', 'range_0_1e6',
           (SELECT count(*) FROM orders
            WHERE o_totalprice IS NULL OR o_totalprice < 0 OR o_totalprice > 1000000)
    UNION ALL
    SELECT 'o_orderkey', 'not_null',
           (SELECT count(*) FROM orders WHERE o_orderkey IS NULL)
    UNION ALL
    SELECT 'o_orderkey', 'unique',
           (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                                  GROUP BY o_orderkey HAVING count(*) > 1))
    UNION ALL
    SELECT 'o_orderpriority', 'pattern_prefix_digit',
           (SELECT count(*) FROM orders
            WHERE o_orderpriority NOT SIMILAR TO '[1-5]-.*')
    """,
    doc="Declarative DATA CONTRACT enforcement — the schema-plus-"
    "semantics agreement between producer and consumer, expressed as a "
    "rule table (column, rule, params) and compiled at plan-build time "
    "into one aggregate per rule: enum domains, numeric ranges, "
    "non-null, key uniqueness, and regex shape checks.  Differs from "
    "dq_constraint_audit (fixed referential checks) in that the "
    "contract is DATA — adding a rule adds a row, not code; the "
    "compiler below maps each rule kind to a Column expression.  Every "
    "check is one partial-agged count or one keyed group-by; "
    "violations==0 across the board is the load gate.  Regex semantics "
    "pinned: Spark rlike anchors via ^...$ to match SIMILAR TO.",
)
def dq_data_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    contract = [
        ("o_orderstatus", "enum_domain", ~F.col("o_orderstatus").isin("O", "F", "P")),
        (
            "o_totalprice",
            "range_0_1e6",
            F.col("o_totalprice").isNull()
            | (F.col("o_totalprice") < 0)
            | (F.col("o_totalprice") > 1000000),
        ),
        ("o_orderkey", "not_null", F.col("o_orderkey").isNull()),
        (
            "o_orderpriority",
            "pattern_prefix_digit",
            ~F.col("o_orderpriority").rlike("^[1-5]-.*$"),
        ),
    ]
    # ALL row-local rules fold into ONE aggregate pass (one fact scan,
    # one exchange — the plan-audit fix over one-agg-per-rule), then the
    # wide row melts to (col, rule, violations); only the uniqueness
    # rule needs its own keyed group-by
    wide = o.agg(
        *[
            F.count(F.when(pred, 1)).alias(f"{col}|{rule}")
            for col, rule, pred in contract
        ]
    )
    melted = wide.unpivot(
        ids=[],
        values=[f"{col}|{rule}" for col, rule, _ in contract],
        variableColumnName="key",
        valueColumnName="violations",
    ).select(
        F.split("key", r"\|")[0].alias("col"),
        F.split("key", r"\|")[1].alias("rule"),
        "violations",
    )
    uniq = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.lit("o_orderkey").alias("col"),
            F.lit("unique").alias("rule"),
            F.count(F.lit(1)).alias("violations"),
        )
    )
    return melted.unionByName(uniq)


@register(
    "profile_columns_generic",
    oracle="""
    WITH melted AS (
      SELECT 'c_mktsegment' AS col, c_mktsegment AS val FROM customer
      UNION ALL SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
      UNION ALL SELECT 'c_name', c_name FROM customer
    ),
    stats AS (
      SELECT col,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(val) AS BIGINT) AS n_non_null,
             CAST(count(DISTINCT val) AS BIGINT) AS ndv
      FROM melted GROUP BY col
    ),
    topval AS (
      SELECT col, val AS top_value, CAST(cnt AS BIGINT) AS top_count FROM (
        SELECT col, val, count(*) AS cnt,
               row_number() OVER (PARTITION BY col
                                  ORDER BY count(*) DESC, val) AS rn
        FROM melted WHERE val IS NOT NULL GROUP BY col, val
      ) WHERE rn = 1
    )
    SELECT s.col, s.n_rows, s.n_non_null, s.ndv, t.top_value, t.top_count
    FROM stats s JOIN topval t ON t.col = s.col
    """,
    doc="Generic column profiler (ANALYZE TABLE ... FOR COLUMNS, "
    "engine-side): columns are melted to (col, value-as-text) EAV rows "
    "once (the unpivot trick of elt_cell_level_diff), then per-column "
    "row/non-null/NDV counts plus the deterministic top value "
    "(count-then-rank, ties to smallest value — mode() tie order is "
    "engine-defined, agg_mode_deterministic's lesson) all come from "
    "the SAME two aggregates regardless of how many columns are "
    "profiled.  This is the stats feed for the optimizer decisions the "
    "plan tests assert (broadcast thresholds, skew detection).  "
    "Shuffles: one groupBy on (col) and one on (col, val) — both "
    "partial-agged; the melt fan-out is width x rows but narrow.",
)
def profile_columns_generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    melted = c.select(
        "c_mktsegment",
        F.col("c_nationkey").cast("string").alias("c_nationkey"),
        "c_name",
    ).unpivot(
        ids=[], values=["c_mktsegment", "c_nationkey", "c_name"],
        variableColumnName="col", valueColumnName="val",
    )
    stats = melted.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_non_null"),
        F.countDistinct("val").alias("ndv"),
    )
    wtop = W.partitionBy("col").orderBy(F.col("cnt").desc(), "val")
    topval = (
        melted.filter(F.col("val").isNotNull())
        .groupBy("col", "val")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select("col", F.col("val").alias("top_value"), F.col("cnt").alias("top_count"))
    )
    return stats.join(topval, "col")


@register(
    "dq_sequence_gaps",
    oracle="""
    WITH present AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderkey <= 8000 AND o_orderkey % 7 <> 3 AND o_orderkey % 11 <> 5
    ),
    marked AS (
      SELECT k, lead(k) OVER (ORDER BY k) AS nxt FROM present
    )
    SELECT k + 1 AS gap_start, nxt - 1 AS gap_end,
           CAST(nxt - k - 1 AS BIGINT) AS n_missing
    FROM marked
    WHERE nxt IS NOT NULL AND nxt - k > 1
    """,
    doc="Sequence-gap detection (gaps-and-islands, the gaps half): "
    "missing runs in a key sequence surface as (gap_start, gap_end, "
    "count) ranges via ONE lead() pass over the distinct keys — the "
    "completeness check for anything serially numbered (invoice ids, "
    "kafka offsets, CDC LSNs; TPC-H order keys are deliberately "
    "sparse, giving a rich fixture).  Emitting RANGES, not missing "
    "keys, is the scale decision: a billion-row hole is one output "
    "row, where the generate-and-anti-join formulation materializes "
    "the hole.  Single-reducer on the distinct-key table here; at "
    "100 TB partition the window by a key prefix and stitch boundary "
    "pairs (two-level, as in curation_pack_sequences).",
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    present = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderkey") <= 8000)
            & (F.col("o_orderkey") % 7 != 3)
            & (F.col("o_orderkey") % 11 != 5)
        )
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    w = W.orderBy("k")
    marked = present.withColumn("nxt", F.lead("k").over(w))
    return marked.filter(
        F.col("nxt").isNotNull() & (F.col("nxt") - F.col("k") > 1)
    ).select(
        (F.col("k") + 1).alias("gap_start"),
        (F.col("nxt") - 1).alias("gap_end"),
        (F.col("nxt") - F.col("k") - 1).cast("bigint").alias("n_missing"),
    )


@register(
    "sec_row_column_policies",
    oracle="""
    WITH policy AS (
      SELECT 'tenant_a' AS tenant, 0 AS nation UNION ALL
      SELECT 'tenant_a', 1 UNION ALL SELECT 'tenant_a', 2 UNION ALL
      SELECT 'tenant_b', 3 UNION ALL SELECT 'tenant_b', 4
    ),
    visible AS (
      SELECT p.tenant, c.c_custkey, c.c_nationkey, c.c_name, c.c_acctbal,
             c.c_mktsegment
      FROM customer c JOIN policy p ON p.nation = c.c_nationkey
    )
    SELECT tenant, c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
           CASE WHEN tenant = 'tenant_b'
                THEN 'Customer#' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)
                ELSE c_name END AS name,
           CASE WHEN tenant = 'tenant_b' THEN NULL
                ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS bal_cents,
           substr(c_mktsegment, 1, 2) || repeat('*', length(c_mktsegment) - 2)
             AS segment_masked
    FROM visible
    WHERE c_custkey % 5 = 0
    """,
    doc="Row- AND column-level security policies as data — the "
    "governance layer (Ranger/Unity-style) the reference delegates to "
    "BigQuery IAM: a policy table grants each tenant a set of nations "
    "(ROW filter = policy join — at scale a broadcast semi-join the "
    "optimizer pushes below everything), and per-tenant COLUMN rules "
    "apply pseudonymization (fn_pseudonymize_consistent's salted "
    "digest) and nulling to the restricted tenant while the trusted "
    "tenant sees cleartext; prefix-preserving segment masking applies to everyone.  "
    "The same query text serves every tenant — policy changes are "
    "row edits, not view rewrites.  All transforms deterministic.",
)
def sec_row_column_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    policy = spark.createDataFrame(
        [("tenant_a", 0), ("tenant_a", 1), ("tenant_a", 2), ("tenant_b", 3), ("tenant_b", 4)],
        "tenant string, nation int",
    )
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    visible = c.join(F.broadcast(policy), policy.nation == c.c_nationkey)
    name = F.when(
        F.col("tenant") == "tenant_b",
        F.concat(
            F.lit("Customer#"),
            F.substring(F.md5(F.col("c_custkey").cast("string").cast("binary")), 1, 8),
        ),
    ).otherwise(F.col("c_name"))
    bal = F.when(
        F.col("tenant") == "tenant_b", F.lit(None).cast("bigint")
    ).otherwise(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
    seg = F.concat(
        F.substring("c_mktsegment", 1, 2),
        F.repeat(F.lit("*"), F.length("c_mktsegment") - 2),
    )
    return visible.select(
        "tenant",
        "c_custkey",
        F.col("c_nationkey").cast("bigint").alias("nation"),
        name.alias("name"),
        bal.alias("bal_cents"),
        seg.alias("segment_masked"),
    )


_K_ANON = 5


@register(
    "sec_k_anonymity_audit",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT)     AS bal_band,
           CAST(count(*) AS BIGINT)                    AS class_size,
           count(*) >= {_K_ANON}                       AS meets_k
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, bal_band
    """,
    doc="K-ANONYMITY AUDIT over the quasi-identifier tuple (nation, "
    "market segment, account-balance band): every equivalence class with "
    f"fewer than k={_K_ANON} members is a re-identification risk — the "
    "release gate a privacy-preserving export runs before publishing "
    "per-customer data (complements sec_row_column_policies' masking and "
    "fn_pseudonymize_consistent's key mapping: policies control WHO sees "
    "a column, this measures WHETHER the visible columns identify).  "
    "Banding acctbal to $1000 buckets is the generalization step of "
    "classic k-anonymity (coarser quasi-identifiers -> larger classes).  "
    "Scale: one partial-aggregated groupBy on the quasi-identifier key — "
    "class sizes reduce map-side, only (tuple, count) states shuffle; "
    "the audit output is bounded by the quasi-identifier domain, not the "
    "row count.",
)
def sec_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            (F.count(F.lit(1)) >= _K_ANON).alias("meets_k"),
        )
    )

_L_DIV = 3


@register(
    "sec_l_diversity_audit",
    oracle=f"""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS sens,
             count(*) AS n
      FROM customer
      GROUP BY c_nationkey, c_mktsegment, sens
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(sum(n) AS BIGINT)                                  AS class_size,
           CAST(count(*) AS BIGINT)                                AS l_distinct,
           count(*) >= {_L_DIV}                                    AS meets_l,
           CAST(floor(max(n) * 1000000.0 / sum(n) + 0.5) AS BIGINT) AS top_share_ppm
    FROM cls
    GROUP BY c_nationkey, c_mktsegment
    """,
    doc="L-DIVERSITY AUDIT — the attack k-anonymity misses: a class can "
    f"have {_K_ANON}+ members (k-anonymous) yet leak the sensitive value "
    "anyway when every member SHARES it (homogeneity attack).  Quasi-"
    "identifiers here are (nation, segment); the sensitive attribute is "
    "the $1000 balance band.  Per class we report the number of DISTINCT "
    f"sensitive values (distinct-l, gate l>={_L_DIV}) and the modal "
    "share in ppm (the skew the entropy/recursive variants bound) — "
    "together the release gate run AFTER sec_k_anonymity_audit passes.  "
    "Scale: two stacked partial aggregates on prefixes of the same key "
    "(QI+sens, then QI) — the second groupBy re-uses the first shuffle's "
    "partitioning, and output is bounded by the QI domain.  The modal "
    "share is max()/sum() inside one aggregate, no window or self-join.",
)
def sec_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    cls = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("sens"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "sens")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cls.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").alias("class_size"),
        F.count(F.lit(1)).alias("l_distinct"),
        (F.count(F.lit(1)) >= _L_DIV).alias("meets_l"),
        F.floor(F.max("n") * 1000000.0 / F.sum("n") + 0.5)
        .cast("bigint")
        .alias("top_share_ppm"),
    )


# Truncated geometric mechanism (Ghosh–Roughgarden–Sundararajan): discrete
# Laplace with alpha = 1/2 (epsilon = ln 2), support [-6, 6].  Scaled
# weights 64/2^|k| over a total of 190 make every CDF breakpoint an exact
# integer — noise inversion is pure bigint compares, no ln()/float parity
# risk between JVM and DuckDB libm.
_DP_M = 16**12  # md5 12-hex-digit draw space
_DP_CUM = [1, 3, 7, 15, 31, 63, 127, 159, 175, 183, 187, 189, 190]  # k=-6..6


def _dp_case_sql(u190: str) -> str:
    arms = " ".join(
        f"WHEN {u190} < {c} * {_DP_M} THEN {k - 6}" for k, c in enumerate(_DP_CUM[:-1])
    )
    return f"CASE {arms} ELSE 6 END"


@register(
    "sec_dp_noisy_counts",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS true_count,
             CAST(CAST('0x' || substr(md5('dp:' || CAST(c_nationkey AS VARCHAR)
                                          || ':' || c_mktsegment), 1, 12)
                       AS UBIGINT) AS BIGINT) * 190 AS u190
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, true_count,
           CAST({_dp_case_sql('u190')} AS BIGINT)              AS noise,
           true_count + CAST({_dp_case_sql('u190')} AS BIGINT) AS noisy_count
    FROM g
    """,
    doc="DIFFERENTIALLY-PRIVATE NOISY COUNTS via the truncated geometric "
    "mechanism (discrete Laplace, alpha=1/2 i.e. epsilon=ln2, the "
    "Ghosh-Roughgarden-Sundararajan universally-optimal mechanism for "
    "counts): per-(nation, segment) customer counts are released with "
    "integer noise drawn by inverting an exact-integer CDF against a "
    "per-group md5 draw — the seeded-noise discipline that makes a DP "
    "release REPLAYABLE for audit (same release every run), and makes "
    "the oracle exact where float Laplace (ln of a uniform) would be at "
    "the mercy of cross-engine libm parity.  CDF breakpoints are scaled "
    "integers (weights 64/2^|k| over 190), so noise inversion is a "
    "bigint CASE ladder — zero float ops end-to-end.  Scale: one "
    "partial-agg groupBy; the hash draw and CASE ladder are per-GROUP "
    "whole-stage-codegen expressions on the bounded aggregate output.",
)
def sec_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    u190 = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dp:"),
                        F.col("c_nationkey").cast("string"),
                        F.lit(":"),
                        F.col("c_mktsegment"),
                    ).cast("binary")
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        * 190
    )
    noise = F.lit(6)
    for k in range(len(_DP_CUM) - 2, -1, -1):
        noise = F.when(u190 < _DP_CUM[k] * _DP_M, F.lit(k - 6)).otherwise(noise)
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "true_count",
        noise.cast("bigint").alias("noise"),
        (F.col("true_count") + noise.cast("bigint")).alias("noisy_count"),
    )


@register(
    "dq_benford_law",
    oracle="""
    WITH d AS (
      SELECT substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                         AS VARCHAR), 1, 1) AS digit
      FROM orders
    ),
    obs AS (
      SELECT CAST(digit AS BIGINT) AS digit, count(*) AS n_obs
      FROM d GROUP BY digit
    )
    SELECT digit,
           CAST(n_obs AS BIGINT) AS n_obs,
           CAST(floor(n_obs * 1000000.0 / sum(n_obs) OVER () + 0.5) AS BIGINT)
               AS obs_ppm,
           CAST(floor(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1000000.0 + 0.5)
                AS BIGINT) AS exp_ppm,
           CAST(floor(n_obs * 1000000.0 / sum(n_obs) OVER () + 0.5) AS BIGINT)
             - CAST(floor(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1000000.0 + 0.5)
                    AS BIGINT) AS dev_ppm
    FROM obs
    """,
    doc="BENFORD'S-LAW FIRST-DIGIT AUDIT over order totals — the classic "
    "forensic-accounting / data-fabrication tripwire: naturally occurring "
    "multiplicative amounts put digit d first with probability "
    "log10(1+1/d), and a generator or tamper that draws uniformly (as "
    "this synthetic fixture does) lights up as large per-digit deviation "
    "in ppm.  The first digit is taken from the INTEGER cents rendering "
    "(never from float formatting, which differs across engines); the "
    "only transcendental is log10 of nine exact small constants, "
    "ppm-quantized with verified >=1e-8 margin to every rounding "
    "boundary.  Scale: a 9-group partial-aggregated count; the share "
    "window runs over the 9-row aggregate, not the data.",
)
def dq_benford_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    obs = (
        o.select(
            F.substring(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").cast("string"),
                1,
                1,
            )
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = F.sum("n_obs").over(W.partitionBy())
    exp_ppm = F.floor(
        F.log10(1.0 + 1.0 / F.col("digit").cast("double")) * 1000000.0 + 0.5
    ).cast("bigint")
    obs_ppm = F.floor(F.col("n_obs") * 1000000.0 / total + 0.5).cast("bigint")
    return obs.select(
        "digit",
        "n_obs",
        obs_ppm.alias("obs_ppm"),
        exp_ppm.alias("exp_ppm"),
        (obs_ppm - exp_ppm).alias("dev_ppm"),
    )


@register(
    "sec_subject_access_export",
    oracle="""
    WITH subj AS (
      SELECT c_custkey AS k FROM customer WHERE c_custkey % 211 = 0
    )
    SELECT k AS subject_key, 'customer' AS source_table,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(NULL AS DATE) AS first_date, CAST(NULL AS DATE) AS last_date
    FROM subj JOIN customer ON c_custkey = k GROUP BY k
    UNION ALL
    SELECT k, 'orders', CAST(count(*) AS BIGINT),
           min(CAST(o_orderdate AS DATE)), max(CAST(o_orderdate AS DATE))
    FROM subj JOIN orders ON o_custkey = k GROUP BY k
    UNION ALL
    SELECT k, 'lineitem', CAST(count(*) AS BIGINT),
           min(CAST(l_shipdate AS DATE)), max(CAST(l_shipdate AS DATE))
    FROM subj
    JOIN orders   ON o_custkey = k
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY k
    UNION ALL
    SELECT k, 'events', CAST(count(*) AS BIGINT),
           min(CAST(ts AS DATE)), max(CAST(ts AS DATE))
    FROM subj JOIN events ON user_id = k % 150 GROUP BY k
    """,
    doc="GDPR SUBJECT-ACCESS EXPORT (Art. 15 SAR) — the cross-table "
    "manifest a privacy office runs per data subject: for each subject "
    "(every 211th customer), count and date-bound their rows in EVERY "
    "store that carries their identity — directly (customer, orders), "
    "transitively through a join path (lineitem via orders), and "
    "through IDENTITY RESOLUTION (events keyed by the shared device "
    "identity custkey%150 — deliberately many-to-one, the over-"
    "collection ambiguity real identity graphs have).  The manifest "
    "(rows + date ranges, not payloads) is what the DPO reviews before "
    "the full export; elt_right_to_erasure is this query's Art. 17 "
    "counterpart (this one FINDS the data, that one removes it).  "
    "Scale: subjects are a tiny broadcast side against each fact table "
    "— four independent broadcast-semi aggregates, no fact-to-fact "
    "shuffle; adding a store = adding a UNION branch.",
)
def sec_subject_access_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")
    subj = F.broadcast(
        c.filter(F.col("c_custkey") % 211 == 0).select(F.col("c_custkey").alias("k"))
    )
    null_date = F.lit(None).cast("date")

    cust = (
        subj.join(c, c.c_custkey == F.col("k"))
        .groupBy(F.col("k").alias("subject_key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "subject_key",
            F.lit("customer").alias("source_table"),
            "n_rows",
            null_date.alias("first_date"),
            null_date.alias("last_date"),
        )
    )
    orders = (
        subj.join(o, o.o_custkey == F.col("k"))
        .groupBy(F.col("k").alias("subject_key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_date"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
        )
        .select("subject_key", F.lit("orders").alias("source_table"), "n_rows", "first_date", "last_date")
    )
    items = (
        subj.join(o, o.o_custkey == F.col("k"))
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("k").alias("subject_key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.col("l_shipdate").cast("date")).alias("first_date"),
            F.max(F.col("l_shipdate").cast("date")).alias("last_date"),
        )
        .select("subject_key", F.lit("lineitem").alias("source_table"), "n_rows", "first_date", "last_date")
    )
    events = (
        subj.join(ev, ev.user_id == F.col("k") % 150)
        .groupBy(F.col("k").alias("subject_key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.col("ts").cast("date")).alias("first_date"),
            F.max(F.col("ts").cast("date")).alias("last_date"),
        )
        .select("subject_key", F.lit("events").alias("source_table"), "n_rows", "first_date", "last_date")
    )
    return cust.unionByName(orders).unionByName(items).unionByName(events)


@register(
    "dq_null_pattern_profile",
    oracle="""
    WITH masked AS (
      SELECT CASE WHEN c_custkey % 7 = 0  THEN NULL ELSE c_name END       AS name,
             CASE WHEN c_custkey % 7 = 0  THEN NULL ELSE c_mktsegment END AS seg,
             CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_acctbal END    AS bal,
             CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_nationkey END  AS nat
      FROM customer
    )
    SELECT (name IS NULL) AS name_null, (seg IS NULL) AS seg_null,
           (bal IS NULL) AS bal_null,  (nat IS NULL) AS nat_null,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(4 - (name IS NULL)::INT - (seg IS NULL)::INT
                  - (bal IS NULL)::INT - (nat IS NULL)::INT AS INT) AS n_present
    FROM masked
    GROUP BY name_null, seg_null, bal_null, nat_null
    """,
    doc="NULL-PATTERN (missingness co-occurrence) PROFILE — which columns "
    "go null TOGETHER: rows group by their full null/present bitmask "
    "rather than per-column null rates (profile_columns_generic), "
    "because correlated missingness (name+segment null in lockstep "
    "here, simulating a failed enrichment join) means MAR/MNAR data "
    "that per-column rates cannot distinguish from random dropout — "
    "the first question any imputation or quality-gate design asks.  "
    "Nulls are injected deterministically (key mod 7/11/13) so both "
    "engines profile the identical corpus.  Scale: one partial-agg "
    "groupBy whose domain is bounded by 2^k patterns, never rows; at "
    "wide schemas the bitmask packs into a bigint and the same "
    "aggregate holds.",
)
def dq_null_pattern_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    masked = c.select(
        F.when(k % 7 == 0, None).otherwise(F.col("c_name")).alias("name"),
        F.when(k % 7 == 0, None).otherwise(F.col("c_mktsegment")).alias("seg"),
        F.when(k % 11 == 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
        F.when(k % 13 == 0, None).otherwise(F.col("c_nationkey")).alias("nat"),
    )
    flags = [
        F.col("name").isNull().alias("name_null"),
        F.col("seg").isNull().alias("seg_null"),
        F.col("bal").isNull().alias("bal_null"),
        F.col("nat").isNull().alias("nat_null"),
    ]
    return (
        masked.select(*flags)
        .groupBy("name_null", "seg_null", "bal_null", "nat_null")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.lit(4)
                - F.col("name_null").cast("int")
                - F.col("seg_null").cast("int")
                - F.col("bal_null").cast("int")
                - F.col("nat_null").cast("int")
            )
            .cast("int")
            .alias("n_present"),
        )
    )


_TRAVEL_V2 = 25  # squared speed threshold: grid-units² per second²


@register(
    "sec_impossible_travel",
    oracle=f"""
    WITH located AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(CAST('0x' || substr(md5('gx:' || CAST(event_id AS VARCHAR)), 1, 5)
                       AS BIGINT) AS BIGINT) % 100000 AS x,
             CAST(CAST('0x' || substr(md5('gy:' || CAST(event_id AS VARCHAR)), 1, 5)
                       AS BIGINT) AS BIGINT) % 100000 AS y
      FROM events
      WHERE ts IS NOT NULL  -- a null-time hop has no travel interval
    ),
    hops AS (
      SELECT user_id, event_id, ts, x, y,
             lag(ts) OVER w AS pts, lag(x) OVER w AS px, lag(y) OVER w AS py
      FROM located
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
      SELECT user_id, event_id,
             (x - px) * (x - px) + (y - py) * (y - py) AS d2,
             epoch_us(ts) - epoch_us(pts) AS dt_us,
             CAST((x - px) * (x - px) + (y - py) * (y - py) AS HUGEINT)
               * 1000000 * 1000000
               > CAST({_TRAVEL_V2} AS HUGEINT)
                 * CAST(epoch_us(ts) - epoch_us(pts) AS HUGEINT)
                 * CAST(epoch_us(ts) - epoch_us(pts) AS HUGEINT) AS impossible
      FROM hops WHERE pts IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)                          AS n_hops,
           CAST(count(CASE WHEN impossible THEN 1 END) AS BIGINT) AS n_impossible,
           CAST(max(CASE WHEN impossible THEN d2 END) AS BIGINT)  AS worst_d2
    FROM flagged GROUP BY user_id
    """,
    doc="IMPOSSIBLE-TRAVEL DETECTION — the account-takeover heuristic "
    "every auth-log pipeline runs: consecutive events of one user whose "
    "implied speed exceeds a physical bound are flagged.  The speed "
    "test is fully SQUARED — dist² · 1e12 > v² · dt_us² — so there is "
    "no sqrt, no division, no float anywhere: exact integer compare "
    "even at microsecond timestamps (the d²·10¹² term peaks ~2·10²² … "
    "kept in range because DuckDB widens to HUGEINT and Spark's long "
    "stays below overflow for this grid — the bound is asserted by the "
    "oracle equality itself).  Locations are md5-synthesized per event "
    "(the fixture has no geo column).  Complements sec_k_anonymity "
    "(static privacy) with a behavioral-security analytic.  Scale: one "
    "user-keyed window pass + bounded per-user aggregate.",
)
def sec_impossible_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # NULL ts has no travel interval (null-KEYS contract; oracle WHERE)
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_id", "ts")
    )

    def axis(tag: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(tag), F.col("event_id").cast("string")).cast("binary")),
                    1,
                    5,
                ),
                16,
                10,
            ).cast("bigint")
            % 100000
        )

    located = ev.select(
        "user_id", "event_id", "ts", axis("gx:").alias("x"), axis("gy:").alias("y")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    hops = located.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tus"),
        "x",
        "y",
        F.unix_micros(F.lag("ts").over(w)).alias("ptus"),
        F.lag("x").over(w).alias("px"),
        F.lag("y").over(w).alias("py"),
    ).filter(F.col("ptus").isNotNull())
    d2 = (F.col("x") - F.col("px")) * (F.col("x") - F.col("px")) + (
        F.col("y") - F.col("py")
    ) * (F.col("y") - F.col("py"))
    dt = F.col("tus") - F.col("ptus")
    flagged = hops.select(
        "user_id",
        d2.alias("d2"),
        (
            d2.cast("decimal(38,0)") * 1000000 * 1000000
            > F.lit(_TRAVEL_V2).cast("decimal(38,0)") * dt.cast("decimal(38,0)") * dt.cast("decimal(38,0)")
        ).alias("impossible"),
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hops"),
        F.count(F.when(F.col("impossible"), 1)).alias("n_impossible"),
        F.max(F.when(F.col("impossible"), F.col("d2"))).alias("worst_d2"),
    )


@register(
    "dq_population_stability",
    oracle="""
    WITH v AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o_orderdate < TIMESTAMP '1995-01-01' AS is_ref
      FROM orders
    ),
    rng AS (SELECT min(cents) AS lo, max(cents) AS hi FROM v),
    binned AS (
      SELECT least(9, (cents - lo) * 10 // (hi - lo + 1)) AS bin, is_ref
      FROM v CROSS JOIN rng
    ),
    counts AS (
      SELECT bin,
             count(CASE WHEN is_ref THEN 1 END)     AS n_ref,
             count(CASE WHEN NOT is_ref THEN 1 END) AS n_cur
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM counts),
    terms AS (
      SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
             CAST(floor((CAST(n_ref + 1 AS DOUBLE) / (tr + 10)
                         - CAST(n_cur + 1 AS DOUBLE) / (tc + 10))
                        * ln((CAST(n_ref + 1 AS DOUBLE) / (tr + 10))
                             / (CAST(n_cur + 1 AS DOUBLE) / (tc + 10)))
                        * 1e9 + 0.5) AS BIGINT) AS term_x1e9
      FROM counts CROSS JOIN tot
    )
    SELECT CAST(bin AS BIGINT) AS bin, n_ref, n_cur, term_x1e9,
           CAST(sum(term_x1e9) OVER () AS BIGINT) AS psi_total_x1e9
    FROM terms
    """,
    doc="POPULATION STABILITY INDEX — the model-monitoring drift metric "
    "(credit-risk regulation made it canon; >0.2 = significant shift): "
    "order values split into a reference era (pre-1995) and a current "
    "era, bucketed into 10 fixed equi-width bins over the global range, "
    "PSI = sum over bins of (p_i - q_i)·ln(p_i/q_i) with add-one "
    "smoothing so empty bins stay finite.  Each bin's ln-term is "
    "nano-quantized to an INTEGER before the total (the log-space "
    "summation discipline of analytics_survival_km — integer sums are "
    "order-independent, so one libm call per bin is the entire float "
    "surface).  Complements agg_ks_two_sample: KS tests ANY difference "
    "(supremum), PSI quantifies HOW MUCH mass moved per region, which "
    "is what alert thresholds are written against.  Scale: one "
    "partial-agg pass to bin counts; the PSI arithmetic runs on 10 "
    "rows.",
)
def dq_population_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    v = o.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
        (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp")).alias("is_ref"),
    )
    rng = v.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    binned = v.crossJoin(F.broadcast(rng)).select(
        F.least(F.lit(9), F.expr("(cents - lo) * 10 div (hi - lo + 1)")).alias("bin"),
        "is_ref",
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("n_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("n_cur"),
    )
    tot = counts.agg(F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"))
    p = (F.col("n_ref") + 1).cast("double") / (F.col("tr") + 10)
    q = (F.col("n_cur") + 1).cast("double") / (F.col("tc") + 10)
    terms = counts.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("bigint").alias("bin"),
        "n_ref",
        "n_cur",
        F.floor((p - q) * F.log(p / q) * 1e9 + 0.5).cast("bigint").alias("term_x1e9"),
    )
    return terms.select(
        "bin",
        "n_ref",
        "n_cur",
        "term_x1e9",
        F.sum("term_x1e9").over(W.partitionBy()).alias("psi_total_x1e9"),
    )


@register(
    "sec_tamper_evident_log",
    oracle="""
    WITH entries AS (
      SELECT CAST(o_orderdate AS DATE) AS day, o_orderkey AS ok,
             md5('tx:' || CAST(o_orderkey AS VARCHAR) || ':'
                 || CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR))
               AS dig
      FROM orders
    ),
    chained AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_entries,
             list(dig ORDER BY ok)[1] AS chain_head,
             list_reduce(list(dig ORDER BY ok), (a, b) -> md5(a || b)) AS chain_hash
      FROM entries GROUP BY day
    )
    SELECT day, n_entries, chain_head, chain_hash FROM chained
    """,
    doc="TAMPER-EVIDENT AUDIT LOG — per-day HASH CHAINS over the order "
    "ledger (the append-only-log integrity pattern behind QLDB/"
    "certificate-transparency designs): each entry's digest folds into "
    "a left-chain md5(chain || next), so modifying, dropping or "
    "reordering ANY historical entry changes that day's chain head-to-"
    "tail — dq_reconciliation_rowhash detects that two copies differ, "
    "this detects that ONE copy was edited.  The fold is a higher-order "
    "array reduce on BOTH engines (aggregate() / list_reduce()) over "
    "an order-key-sorted digest array — sequential-looking, but "
    "per-day chains parallelize across days (the anchoring trick "
    "production ledgers use: chain within block, merkle across "
    "blocks).  Scale: one day-keyed aggregate; chains are bounded by "
    "the busiest day, and verification recomputes only the suspect "
    "day's chain.",
)
def sec_tamper_evident_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    entries = o.select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.col("o_orderkey").alias("ok"),
        F.md5(
            F.concat(
                F.lit("tx:"),
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").cast("string"),
            ).cast("binary")
        ).alias("dig"),
    )
    per_day = entries.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("ok", "dig"))), lambda s: s["dig"]
        ).alias("digs"),
    )
    return per_day.select(
        "day",
        "n_entries",
        F.element_at("digs", 1).alias("chain_head"),
        F.expr(
            "aggregate(slice(digs, 2, size(digs) - 1), element_at(digs, 1),"
            " (acc, x) -> md5(CAST(concat(acc, x) AS BINARY)))"
        ).alias("chain_hash"),
    )


@register(
    "dq_duplicate_payments",
    oracle="""
    WITH tx AS (
      SELECT o_orderkey AS ok, o_custkey AS ck,
             CAST(floor(o_totalprice / 100) AS BIGINT) AS band,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    )
    SELECT a.ck AS custkey, a.ok AS order_a, b.ok AS order_b,
           a.band, a.cents AS cents_a, b.cents AS cents_b,
           CAST(date_diff('day', a.d, b.d) AS BIGINT) AS days_apart
    FROM tx a JOIN tx b
      ON a.ck = b.ck AND a.band = b.band AND a.ok < b.ok
     AND abs(date_diff('day', a.d, b.d)) <= 365
    """,
    doc="DUPLICATE-PAYMENT CONTROL — the accounts-payable audit every "
    "finance close runs: two orders by the SAME customer in the SAME "
    "$100 amount band within a year are double-payment suspects "
    "(auditors band amounts because re-keyed invoices rarely match to "
    "the cent — tax or fees shift them).  The candidate join is EQUI "
    "on (customer, band) — the high-selectivity composite key that "
    "makes this tractable — with the date-proximity window applied as "
    "a residual filter inside the bounded per-key group (never a "
    "date-range join over the whole ledger).  Exact integer cents "
    "emitted for both sides of every suspect pair; pairs "
    "canonicalized a.ok < b.ok.  "
    "Complements dq_reconciliation_rowhash (copies diverge) and "
    "sec_tamper_evident_log (history edited) with the business-level "
    "duplicate control.  Scale: one shuffle on the composite key; "
    "quadratic work bounded by the largest (customer, amount) "
    "equivalence class, which real ledgers keep tiny.",
)
def dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    tx = o.select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.floor(F.col("o_totalprice") / 100).cast("bigint").alias("band"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    b = tx.select(
        F.col("ok").alias("ok2"), F.col("ck").alias("ck2"),
        F.col("band").alias("band2"), F.col("cents").alias("cents2"),
        F.col("d").alias("d2"),
    )
    return (
        tx.join(
            b,
            (F.col("ck2") == F.col("ck"))
            & (F.col("band2") == F.col("band"))
            & (F.col("ok") < F.col("ok2")),
        )
        .filter(F.abs(F.datediff("d2", "d")) <= 365)
        .select(
            F.col("ck").alias("custkey"),
            F.col("ok").alias("order_a"),
            F.col("ok2").alias("order_b"),
            "band",
            F.col("cents").alias("cents_a"),
            F.col("cents2").alias("cents_b"),
            F.datediff("d2", "d").cast("bigint").alias("days_apart"),
        )
    )
