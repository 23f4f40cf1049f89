"""Data-curation operators: batch sessionization, reproducible sampling,
table profiling — the selection/QA layer of a training-data pipeline.

Scale notes: hash-based sampling is THE reproducible sampling pattern at
100 TB (a pure narrow filter, no shuffle, stable across reruns/engines —
unlike TABLESAMPLE, which is engine- and split-dependent); sessionization
is one shuffle on the entity key; profiling is a single pass of agg
partials per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "sessionize_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) ts, value,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                       OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                          > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id, sess_id, min(ts) AS sess_start, max(ts) AS sess_end,
           count(*) AS n_events, round(sum(value), 2) AS sess_value,
           round(CAST(date_diff('microsecond', min(ts), max(ts)) AS DOUBLE) / 1000000, 3)
             AS duration_sec
    FROM sess GROUP BY user_id, sess_id
    """,
    doc="Batch sessionization (gaps-and-islands): lag + cumulative-sum session "
    "ids, then per-session stats — one shuffle on user_id, both window specs "
    "share it.",
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    w = W.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    marked = e.withColumn(
        "new_sess", (F.isnull(gap) | (gap > 1800)).cast("bigint")
    )
    sess = marked.withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sess_value"),
        F.round(
            (F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double"))), 3
        ).alias("duration_sec"),
    )


@register(
    "sample_hash_based",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')
    """,
    doc="Reproducible ~3/16 hash sample: filter on a digest prefix of the "
    "key — deterministic, engine-independent, no shuffle, stable under "
    "reruns and data growth (the training-data holdout/sample pattern; "
    "TABLESAMPLE is none of those things).",
)
def sample_hash_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    return d.filter(bucket.isin("0", "1", "2")).select("doc_id", "lang", "n_chars")


@register(
    "sample_stratified",
    oracle=None,  # seeded Bernoulli sampling is engine-specific → rows-only;
    # per-stratum proportions asserted in tests/test_curation.py
    doc="Stratified sampling via sampleBy(seeded): per-language fractions "
    "(0.5 / 0.2) — the class-rebalancing primitive. Narrow op, no shuffle; "
    "deterministic for a fixed seed within Spark.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    langs = [r["lang"] for r in d.select("lang").distinct().collect()]
    fractions = {lang: (0.5 if i % 2 == 0 else 0.2) for i, lang in enumerate(sorted(langs))}
    return d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")


@register(
    "profile_table",
    oracle="""
    SELECT
      count(*)                                   AS n_rows,
      count(DISTINCT l_orderkey)                 AS n_orders,
      count(CASE WHEN l_quantity IS NULL THEN 1 END) AS null_qty,
      round(min(l_quantity), 2)                  AS min_qty,
      round(max(l_quantity), 2)                  AS max_qty,
      round(avg(l_extendedprice), 4)             AS avg_price,
      round(stddev_samp(l_extendedprice), 4)     AS sd_price,
      round(quantile_cont(l_discount, 0.5), 6)   AS median_disc,
      count(DISTINCT l_returnflag)               AS n_flags
    FROM lineitem
    """,
    doc="Single-pass table profile: row/null/distinct counts, min/max, "
    "moments, median — the data-QA summary every ingest should emit "
    "(one aggregate of partials; exact distincts become approx_* at 100 TB).",
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # mixing DISTINCT and plain aggregates in ONE agg forces an Expand of
    # every input column (3× the rows through the hash-agg — measured 3.3 s
    # vs 1.7 s at sf0.1).  Split into two single-row aggregates and
    # cross-join the scalars instead; each keeps its optimal plan.
    stats = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("null_qty"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.percentile("l_discount", F.lit(0.5)), 6).alias("median_disc"),
    )
    distincts = li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_returnflag").alias("n_flags"),
    )
    return stats.crossJoin(distincts).select(
        "n_rows", "n_orders", "null_qty", "min_qty", "max_qty",
        "avg_price", "sd_price", "median_disc", "n_flags",
    )


@register(
    "curation_mix_weighted",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
               THEN substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 1)
                      NOT IN ('c', 'd', 'e', 'f')
               ELSE substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('0', '1', '2', '3')
          END
    """,
    doc="Weighted source mixing: per-source keep rates (even-numbered "
    "sources 12/16, odd 4/16) via a digest-bucket on (source, doc_id) — "
    "the data-mixture reweighting step of a training pipeline, done "
    "deterministically so the mixture is reproducible run-over-run and "
    "engine-independent (unlike seeded Bernoulli sampling).  Narrow filter, "
    "no shuffle; rates are exact in expectation and stable under data "
    "growth because the bucket is keyed, not positional.",
)
def curation_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(
            F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string")).cast(
                "binary"
            )
        ),
        1,
        1,
    )
    even_src = F.substring("source", 4, 10).cast("int") % 2 == 0
    keep = F.when(even_src, ~bucket.isin("c", "d", "e", "f")).otherwise(
        bucket.isin("0", "1", "2", "3")
    )
    return d.filter(keep).select("doc_id", "source")
