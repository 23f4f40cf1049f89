"""Graph analytics over the warehouse: weighted PageRank on the
nation-level trade graph.

Complements dedup.connected_components (the other iterative graph op).
The graph: directed edges customer-nation → supplier-nation, weighted by
lineitem count (the q7 "volume shipping" join shape reduced to a 25-node
adjacency).  PageRank runs 3 damped iterations with every rank
MICRO-QUANTIZED (floor(x*1e9+0.5)/1e9) before it feeds the next round —
the same bit-replicability discipline as kmeans_train — so the DuckDB
oracle replays the identical iterations as unrolled CTEs.

Scale design: the rank vector and edge list stay DataFrames end-to-end —
each iteration is one (src-keyed) join + one (dst-keyed) hash aggregate,
exactly GraphX/Pregel's message-passing round expressed relationally.  At
100 TB the edge list is the big side (shuffled once per round on its join
key); ranks are one row per node.  Dangling nodes (no out-edges) simply
stop propagating mass — both sides implement the same convention, and the
damping term keeps every node's rank positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_D = 0.85  # damping
_ITERS = 3

_EDGE_SQL = """
    edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY src, dst
    ),
    outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY src),
    e AS (SELECT edges.src, edges.dst, edges.w, outw.ow
          FROM edges JOIN outw ON edges.src = outw.src),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes)"""


def _pagerank_oracle(iters: int = _ITERS) -> str:
    """Unrolled PageRank oracle: p0 = quant(1/N); each round joins ranks to
    edges on src, sums pr*w/ow per dst, and re-quantizes
    quant(0.15/N + 0.85*mass) — decision-for-decision the Spark loop."""
    parts = [
        "WITH " + _EDGE_SQL + ",",
        "p0 AS (SELECT node, floor(1.0 / nn.cnt * 1e9 + 0.5) / 1e9 AS pr"
        " FROM nodes CROSS JOIN nn),",
    ]
    for i in range(1, iters + 1):
        prev = f"p{i-1}"
        parts.append(
            f"m{i} AS (SELECT e.dst AS node, sum(p.pr * e.w / e.ow) AS mass"
            f" FROM e JOIN {prev} p ON p.node = e.src GROUP BY e.dst),"
        )
        parts.append(
            f"p{i} AS (SELECT nodes.node,"
            f" floor(((1 - {_D}) / nn.cnt + {_D} * coalesce(m.mass, 0.0)) * 1e9 + 0.5) / 1e9 AS pr"
            f" FROM nodes CROSS JOIN nn LEFT JOIN m{i} m ON m.node = nodes.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT n.n_nationkey, n.n_name,"
        f" CAST(floor(p.pr * 1e9 + 0.5) AS BIGINT) AS pr_x1e9,"
        f" CAST(coalesce(o.ow, 0) AS BIGINT) AS out_weight"
        f" FROM p{iters} p JOIN nation n ON n.n_nationkey = p.node"
        f" LEFT JOIN outw o ON o.src = p.node"
    )
    return "\n".join(parts)


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc="Weighted PageRank (damping 0.85, 3 iterations) over the 25-node "
    "nation trade graph built from the lineitem→orders→customer/supplier "
    "join.  Each iteration: one src-keyed join of the rank vector to the "
    "edge list + one dst-keyed hash aggregate of pr*w/outw — the Pregel "
    "message round as a relational plan.  Ranks are micro-quantized "
    "(1e-9) before every next round, so iteration decisions are "
    "bit-replicable and the oracle unrolls the exact same 3 rounds as "
    "CTEs (_pagerank_oracle, same discipline as the kmeans IVF oracle). "
    "Result reported as integer nano-ranks — no float tolerance.  At "
    "100 TB the edge list shuffles once per round on its join key, ranks "
    "are one row per node, and the driver never sees data (rank state "
    "stays distributed; only the loop count is driver-side).",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")

    # materialize the reduced edge list ONCE: it is re-read every iteration
    # (and again by the final out-weight join), and without truncation each
    # round would re-run the 4-way fact join that produced it (same
    # discipline as connected_components)
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = edges.join(outw, "src")

    nodes = n.select(F.col("n_nationkey").alias("node"))
    n_nodes = float(nodes.count())  # fixed 25-row dimension — metadata-sized

    def quant(col):
        return F.floor(col * 1e9 + 0.5) / 1e9

    pr = nodes.withColumn("pr", quant(F.lit(1.0) / F.lit(n_nodes)))
    for _ in range(_ITERS):
        mass = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("w") / F.col("ow")).alias("mass"))
        )
        pr = nodes.join(mass, "node", "left").select(
            "node",
            quant(
                F.lit(1 - _D) / F.lit(n_nodes)
                + F.lit(_D) * F.coalesce("mass", F.lit(0.0))
            ).alias("pr"),
        )
    return (
        pr.join(n, pr.node == n.n_nationkey)
        .join(outw.withColumnRenamed("src", "node"), "node", "left")
        .select(
            "n_nationkey",
            "n_name",
            F.floor(F.col("pr") * 1e9 + 0.5).cast("bigint").alias("pr_x1e9"),
            F.coalesce("ow", F.lit(0)).cast("bigint").alias("out_weight"),
        )
    )
