"""Similarity search over ``embeddings``: brute-force cosine top-k (baseline)
and anchor-bucketed LSH (the scale path).

North-star extension surface (BASELINE.json).  Scale design:

- **brute force** is exact and embarrassingly parallel when the query set is
  small: broadcast the queries, one pass over the corpus, per-query top-k via
  window — corpus is never shuffled except by the final (tiny) top-k.
- **anchor LSH** (random-hyperplane LSH with data-derived planes): each
  vector gets a compact sign-bit signature from dot products against a small
  broadcast anchor set; candidates share a signature bucket, exact cosine
  is computed only inside buckets.  At 100 TB the bucket join shuffles
  (bucket, id) pairs instead of the full vector set, and anchors (or IVF
  centroids trained offline) stay broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches DuckDB's list accumulation order
    bit-for-bit, so rounded oracle comparisons are exact)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


@register(
    "ann_bruteforce_topk",
    oracle="""
    WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.v, c.v), 6) AS cosine,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY round(list_cosine_similarity(q.v, c.v), 6) DESC,
                                         c.vec_id) AS rnk
      FROM q JOIN c ON q.vec_id <> c.vec_id
    ) WHERE rnk <= 5
    """,
    doc="Brute-force cosine top-5 for 10 query vectors: broadcast queries × "
    "corpus scan, JVM fold for the dot product, window top-k. Exact baseline "
    "for the ANN variants.",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)


N_ANCHORS = 8  # 8 sign bits → 256 buckets


@register(
    "ann_anchor_lsh",
    oracle="""
    WITH anchors AS (
      SELECT vec_id AS aid, CAST(embedding AS DOUBLE[]) av
      FROM embeddings WHERE vec_id < 8
    ),
    sigs AS (
      SELECT e.vec_id,
             CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), a.av) >= 0
                           THEN CAST(pow(2, a.aid) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
      FROM embeddings e CROSS JOIN anchors a
      GROUP BY e.vec_id
    ),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)
    SELECT sa.vec_id AS vec_a, sb.vec_id AS vec_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM sigs sa JOIN sigs sb ON sa.sig = sb.sig AND sa.vec_id < sb.vec_id
    JOIN v a ON a.vec_id = sa.vec_id
    JOIN v b ON b.vec_id = sb.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.2
    """,
    doc="Random-hyperplane LSH with data-derived planes: 8 sign bits from "
    "dots against broadcast anchor vectors (vec_id<8) → 256 buckets; exact "
    "cosine only within buckets. The bucket join shuffles ids+signatures, "
    "not the corpus.",
)
def ann_anchor_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    anchors = [
        (r["vec_id"], r["v"])
        for r in e.filter(F.col("vec_id") < N_ANCHORS).collect()
    ]
    sig = None
    for aid, av in sorted(anchors):
        bit = F.when(dot(F.col("v"), F.array(*[F.lit(x) for x in av])) >= 0, F.lit(2**aid)).otherwise(
            F.lit(0)
        )
        sig = bit if sig is None else sig + bit
    sigs = e.withColumn("sig", sig.cast("bigint"))
    a = sigs.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("sig").alias("sa"))
    b = sigs.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("sig").alias("sb"))
    cos = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, (F.col("sa") == F.col("sb")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.2)
    )
