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
from pyspark.sql import Window as W
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


@register(
    "graph_triangle_count",
    oracle="""
    -- raw is MATERIALIZED as an optimizer fence (same rows either way):
    -- without it DuckDB hops the src <> dst predicate into an EARLY
    -- customer x supplier inequality join, and on hot-customer data the
    -- (order, supplier)-pair intermediate explodes to ~1e8 rows (observed:
    -- 80 GB spill-to-disk death at skewed sf0.1 volume, r14 sweep).  The
    -- fence pins the many-to-one fact-join order; the filter then runs on
    -- the 600k-row joined result.
    WITH raw AS MATERIALIZED (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    ),
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM raw
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
      ) GROUP BY node
    ),
    ori AS (
      SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS u,
             CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS v
      FROM und u
      JOIN deg da ON da.node = u.a
      JOIN deg db ON db.node = u.b
    ),
    tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM ori e1
      JOIN ori e2 ON e2.u = e1.v
      JOIN ori e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    per_node AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        SELECT x AS node FROM tri UNION ALL
        SELECT y AS node FROM tri UNION ALL
        SELECT z AS node FROM tri
      ) GROUP BY node
    )
    SELECT n.n_nationkey, n.n_name,
           CAST(coalesce(deg.d, 0) AS BIGINT) AS degree,
           CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN coalesce(deg.d, 0) < 2 THEN 0
                ELSE (2 * (2 * coalesce(p.n_tri, 0) * 1000000)
                      + deg.d * (deg.d - 1))
                     // (2 * deg.d * (deg.d - 1)) END AS BIGINT)
             AS clustering_x1e6
    FROM nation n
    LEFT JOIN deg ON deg.node = n.n_nationkey
    LEFT JOIN per_node p ON p.node = n.n_nationkey
    """,
    doc="Triangle counting + local clustering coefficient over the "
    "undirected nation trade graph, via DEGREE-ORDERED EDGE ORIENTATION "
    "(the standard distributed-triangle trick, cf. Cohen's MapReduce "
    "triangle algorithm / GraphX triangleCount): every undirected edge is "
    "directed from its lower-(degree, id) endpoint to the higher, so each "
    "triangle is enumerated EXACTLY ONCE as u->v, v->w, u->w, and wedge "
    "blow-up concentrates on low-degree tails instead of hub nodes — the "
    "property that keeps the two equi-joins tractable on power-law graphs "
    "at 100 TB (each join shuffles the oriented edge list on a node key; "
    "no node ever enumerates deg^2 wedges of a hub).  Clustering "
    "coefficient 2T/(d(d-1)) is emitted as an EXACT integer micro-ratio "
    "via (2*(2T*1e6) + d(d-1)) div (2*d(d-1)) — no doubles.  Degree here "
    "counts distinct trade partners; isolated/degree-1 nations report 0.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")

    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
    )
    # distinct undirected edges — the only reduction that touches fact rows
    und = raw.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    # 25-node graph: the edge list is metadata-sized from here on; cache it
    # so degree/orientation/joins don't re-run the 4-way fact join
    und = und.localCheckpoint()

    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    ori = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    e1 = ori.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = ori.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = ori.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])

    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    d = F.coalesce("d", F.lit(0))
    t = F.coalesce("n_tri", F.lit(0))
    dd = F.col("d") * (F.col("d") - 1)
    return (
        n.join(deg.withColumnRenamed("node", "n_nationkey"), "n_nationkey", "left")
        .join(per_node.withColumnRenamed("node", "n_nationkey"), "n_nationkey", "left")
        .select(
            "n_nationkey",
            "n_name",
            d.cast("bigint").alias("degree"),
            t.cast("bigint").alias("n_triangles"),
            F.when(d < 2, F.lit(0))
            .otherwise(
                F.expr(
                    "(2 * (2 * coalesce(n_tri, 0) * 1000000) + d * (d - 1))"
                    " div (2 * d * (d - 1))"
                )
            )
            .cast("bigint")
            .alias("clustering_x1e6"),
        )
    )


@register(
    "graph_link_prediction",
    oracle="""
    -- MATERIALIZED: the same optimizer fence as graph_triangle_count's raw
    -- (see the note there) — prevents the src <> dst predicate from being
    -- hopped into an early customer x supplier inequality join that
    -- explodes on hot-customer data (228 s observed unfenced at skewed
    -- sf0.1 volume).
    WITH raw AS MATERIALIZED (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY src, dst
    ),
    knn AS (  -- sparsify: keep each node's 4 strongest partners
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
        FROM raw
      ) WHERE rn <= 4
    ),
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM knn
    ),
    adj AS (
      SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u),
    wedges AS (  -- common neighbors of candidate pair (x, y) via shared w
      SELECT e1.v AS x, e2.v AS y, CAST(count(*) AS BIGINT) AS n_common
      FROM adj e1 JOIN adj e2 ON e2.u = e1.u AND e1.v < e2.v
      GROUP BY x, y
    ),
    cand AS (  -- only NON-adjacent pairs are link-prediction candidates
      SELECT w.x, w.y, w.n_common
      FROM wedges w
      LEFT JOIN und ON und.a = w.x AND und.b = w.y
      WHERE und.a IS NULL
    )
    SELECT c.x AS node_a, c.y AS node_b, c.n_common,
           CAST((2 * 1000000 * c.n_common + (da.d + db.d - c.n_common))
                // (2 * (da.d + db.d - c.n_common)) AS BIGINT) AS jaccard_x1e6
    FROM cand c
    JOIN deg da ON da.u = c.x
    JOIN deg db ON db.u = c.y
    """,
    doc="Link prediction by common-neighbor counting (the classic "
    "similarity-based predictor, Liben-Nowell & Kleinberg 2003): for "
    "every NON-adjacent node pair sharing at least one neighbor, the "
    "common-neighbor count and neighborhood Jaccard "
    "|N(a) n N(b)| / |N(a) u N(b)| as an exact integer micro-ratio.  "
    "Plan: wedge enumeration is ONE self-join of the adjacency list on "
    "the shared endpoint (the same node-keyed shuffle as triangle "
    "counting, wedge-bounded per node), existing edges are removed by "
    "an anti join against the edge list, degrees join back from a "
    "node-sized table.  At 100 TB wedge blow-up on hubs is the risk — "
    "production systems cap or sample hub neighborhoods; here the "
    "25-node trade graph needs no cap and the oracle is exact.",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")

    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # sparsify to a k-NN graph (4 strongest partners per node) — the dense
    # trade graph is near-complete, which leaves no non-adjacent candidate
    # pairs; k-NN graphs are also what link prediction runs on in practice
    w_knn = W.partitionBy("src").orderBy(F.col("w").desc(), "dst")
    knn = (
        raw.withColumn("rn", F.row_number().over(w_knn))
        .filter(F.col("rn") <= 4)
        .select("src", "dst")
    )
    und = knn.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct().localCheckpoint()
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    e1 = adj.select(F.col("u"), F.col("v").alias("x"))
    e2 = adj.select(F.col("u"), F.col("v").alias("y"))
    wedges = (
        e1.join(e2, "u")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cand = wedges.join(
        und, (und.a == wedges.x) & (und.b == wedges.y), "left_anti"
    )
    da = deg.select(F.col("u").alias("x"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("y"), F.col("d").alias("db"))
    return (
        cand.join(F.broadcast(da), "x")
        .join(F.broadcast(db), "y")
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.expr(
                "CAST((2 * 1000000 * n_common + (da + db - n_common))"
                " div (2 * (da + db - n_common)) AS BIGINT)"
            ).alias("jaccard_x1e6"),
        )
    )


def _kcore_oracle(k: int = 2, rounds: int = 8) -> str:
    """Unrolled peeling oracle for ``graph_kcore``: each round drops nodes
    with degree < k and the edges touching them; ``rounds`` is a fixed
    unroll both sides share (a no-op once the peel reaches fixpoint —
    asserted at two SFs by tests)."""
    from .dedup import _DUCK_JACPAIRS

    parts = [
        f"WITH {_DUCK_JACPAIRS},",
        "e0 AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM jacpairs WHERE jaccard >= 0.65"
        " UNION SELECT doc_b, doc_a FROM jacpairs WHERE jaccard >= 0.65),",
    ]
    for i in range(1, rounds + 1):
        prev = f"e{i-1}"
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT src FROM {prev} GROUP BY src HAVING count(*) >= {k}),"
        )
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM {prev} e"
            f" JOIN k{i} a ON e.src = a.src JOIN k{i} b ON e.dst = b.src),"
        )
    parts.append(
        f"core AS (SELECT src, dst FROM e{rounds})"
    )
    parts.append(
        "SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS core_degree"
        " FROM core GROUP BY src"
    )
    return "\n".join(parts)


@register(
    "graph_kcore",
    oracle=_kcore_oracle(),
    doc="k-core decomposition (k=2) of the document near-dup graph "
    "(Jaccard >= 0.65 edges): iteratively peel nodes of degree < k until "
    "fixpoint — the standard dense-substructure primitive that separates "
    "chain-like duplicate clusters (no core) from genuinely dense "
    "near-dup families (2-core survivors), and the same peel used for "
    "spam-farm detection on web graphs.  Spark side: 8 bounded peel "
    "rounds, each = one degree aggregate + two semi-joins on the edge "
    "list, with lineage truncated per round (localCheckpoint) so the "
    "plan never grows with iterations — the PageRank discipline; the "
    "edge list after candidate-limiting is orders smaller than the "
    "corpus, and every round shuffles only (node, degree) pairs.  The "
    "EXACT oracle unrolls the same 8 rounds as CTEs; both sides reach "
    "fixpoint early and the extra rounds are no-ops.  Integer-only.",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dedup_ngram_jaccard

    K = 2
    edges = (
        dedup_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.65)
        .select("doc_a", "doc_b")
    )
    und = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(8):
        keep = (
            und.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= K)
            .select("src")
        )
        # lazy truncation: the plan is cut every round, but materialization
        # happens only when the next round's aggregate first computes it —
        # one job per round instead of two
        und = (
            und.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    return und.groupBy(F.col("src").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


@register(
    "graph_copurchase_similarity",
    oracle="""
    WITH cp AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_partkey % 10 = 0
    ),
    deg AS (SELECT p, count(*) AS n FROM cp GROUP BY p),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, count(*) AS cooc
      FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
      GROUP BY 1, 2
    ),
    sym AS (
      SELECT part_a AS p, part_b AS q, cooc FROM pairs
      UNION ALL SELECT part_b, part_a, cooc FROM pairs
    ),
    scored AS (
      SELECT s.p, s.q, s.cooc,
             CAST(floor(s.cooc / sqrt(CAST(da.n AS DOUBLE) * db.n) * 1e6 + 0.5)
                  AS BIGINT) AS cos_fp
      FROM sym s JOIN deg da ON da.p = s.p JOIN deg db ON db.p = s.q
      WHERE s.cooc >= 2
    )
    SELECT p AS part, q AS similar_part, cooc, cos_fp,
           CAST(rn AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (
            PARTITION BY p ORDER BY cos_fp DESC, q) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
    doc="Bipartite co-purchase projection — the item-item collaborative-"
    "filtering primitive ('customers who bought X also bought Y'): "
    "project the (customer, part) bipartite graph onto parts, weight "
    "each part pair by cosine over co-purchase counts "
    "(cooc/sqrt(na*nb)), keep top-5 neighbors per part.  Shuffle "
    "profile: one distinct on (customer, part); the pair enumeration is "
    "a customer-keyed self-join bounded by basket size squared (the "
    "analytics_frequent_pairs shape); degree table is item-sized "
    "(broadcast); per-part ranking runs on the pair table, never on "
    "facts.  At 100 TB add a basket-size cap (heavy hitters excluded — "
    "a 10M-item basket is a bot) and min-support pruning, both plain "
    "filters in this plan.  cooc >= 2 min-support; cosine in 1e-6 "
    "fixed point from one identical expression tree.",
)
def graph_copurchase_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 10 == 0).select(
        "l_orderkey", "l_partkey"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # cp feeds deg + both sides of the pair self-join, and pairs feeds
    # both halves of the symmetrization — truncate each once (both are
    # orders smaller than the fact join that builds them) so the 4-way
    # fact join is not re-expanded per consumer (plan audit: 12 scans
    # -> 2 without this)
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    deg = cp.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    a, b = cp.alias("a"), cp.alias("b")
    pairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("cooc"))
        .localCheckpoint()
    )
    sym = pairs.select(
        F.col("part_a").alias("p"), F.col("part_b").alias("q"), "cooc"
    ).unionByName(
        pairs.select(F.col("part_b").alias("p"), F.col("part_a").alias("q"), "cooc")
    )
    da = deg.select(F.col("p"), F.col("n").alias("na"))
    db = deg.select(F.col("p").alias("q"), F.col("n").alias("nb"))
    scored = (
        sym.filter(F.col("cooc") >= 2)
        .join(F.broadcast(da), "p")
        .join(F.broadcast(db), "q")
        .select(
            "p",
            "q",
            "cooc",
            F.floor(
                F.col("cooc") / F.sqrt(F.col("na").cast("double") * F.col("nb")) * 1e6
                + 0.5
            )
            .cast("bigint")
            .alias("cos_fp"),
        )
    )
    w = W.partitionBy("p").orderBy(F.col("cos_fp").desc(), "q")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select(
            F.col("p").alias("part"),
            F.col("q").alias("similar_part"),
            "cooc",
            "cos_fp",
            "rnk",
        )
    )


def _bfs_oracle(max_depth: int = 6) -> str:
    from .dedup import _DUCK_JACPAIRS

    return f"""
    WITH RECURSIVE {_DUCK_JACPAIRS},
    und AS (
      SELECT doc_a AS src, doc_b AS dst FROM jacpairs WHERE jaccard >= 0.65
      UNION SELECT doc_b, doc_a FROM jacpairs WHERE jaccard >= 0.65
    ),
    seeds AS (
      SELECT DISTINCT src AS node FROM und WHERE src % 100 = 0
    ),
    walk(node, d) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT u.dst, w.d + 1 FROM walk w JOIN und u ON u.src = w.node
      WHERE w.d < {max_depth}
    )
    SELECT node AS doc_id, CAST(min(d) AS BIGINT) AS depth
    FROM walk GROUP BY node
    """


@register(
    "graph_bfs_layers",
    oracle=_bfs_oracle(),
    doc="Multi-source BFS over the document near-dup graph: shortest hop "
    "distance (capped at 6) from the seed set (doc_id % 100 = 0 nodes "
    "that have at least one dup edge) to every reachable document — the "
    "'contamination radius' question (how far does similarity to a "
    "flagged document propagate?) and the layer structure behind "
    "friend-of-friend audits.  Spark side is frontier-expansion BFS: "
    "each round joins the FRONTIER (not the visited set) to the edge "
    "list, anti-joins already-visited nodes, unions the new layer — "
    "per-round shuffle is frontier-sized, lineage truncated per round "
    "(the CC/PageRank/k-core discipline).  The oracle is the textbook "
    "recursive-CTE shortest path with UNION dedup.  Integer-only.",
)
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dedup_ngram_jaccard

    MAX_DEPTH = 6
    edges = (
        dedup_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.65)
        .select("doc_a", "doc_b")
    )
    und = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    frontier = (
        und.select(F.col("src").alias("node"))
        .filter(F.col("node") % 100 == 0)
        .distinct()
        .withColumn("depth", F.lit(0).cast("bigint"))
        .localCheckpoint()
    )
    visited = frontier
    for d in range(1, MAX_DEPTH + 1):
        nxt = (
            frontier.join(und, frontier.node == und.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d).cast("bigint"))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited.select(F.col("node").alias("doc_id"), "depth")


def _walk_oracle(steps: int = 4) -> str:
    parts = [
        """WITH cp AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_partkey % 10 = 0
    ),
    pairs AS MATERIALIZED (
      SELECT a.p AS pa, b.p AS pb, count(*) AS cooc
      FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    und AS MATERIALIZED (
      SELECT pa AS src, pb AS dst FROM pairs
      UNION SELECT pb, pa FROM pairs
    ),
    w0 AS MATERIALIZED (
      SELECT DISTINCT src AS walk_id, 0 AS step, src AS node
      FROM und WHERE src % 50 = 0
    ),"""
    ]
    for i in range(1, steps + 1):
        prev = f"w{i-1}"
        parts.append(
            f"""s{i} AS MATERIALIZED (
      SELECT w.walk_id, {i} AS step, u.dst AS node,
             row_number() OVER (
               PARTITION BY w.walk_id
               ORDER BY md5('walk:' || CAST(w.walk_id AS VARCHAR) || ':'
                            || CAST({i} AS VARCHAR) || ':'
                            || CAST(u.src AS VARCHAR) || ':'
                            || CAST(u.dst AS VARCHAR))) AS rn
      FROM {prev} w JOIN und u ON u.src = w.node
    ),
    w{i} AS MATERIALIZED (
      SELECT walk_id, step, node FROM s{i} WHERE rn = 1
    ),"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT walk_id, step, node FROM w{i}" for i in range(steps + 1)
    )
    parts.append(
        f"""all_steps AS ({union})
    SELECT walk_id, CAST(step AS BIGINT) AS step, CAST(node AS BIGINT) AS node
    FROM all_steps"""
    )
    return "\n".join(parts)


@register(
    "graph_random_walk",
    oracle=_walk_oracle(),
    doc="Deterministic random walks (DeepWalk/node2vec data prep): one "
    "4-step walk per seed part over the co-purchase graph, where each "
    "step's neighbor choice is the md5-argmin over (walk, step, "
    "current, neighbor) — a pseudo-random but REPLAYABLE policy, which "
    "is exactly what production walk engines use (seeded per-walk "
    "hashing) so that embeddings are reproducible and the EXACT oracle "
    "can replay every choice.  Walk corpora feed skip-gram training — "
    "the graph-embedding analog of the text pipeline.  Scale shape: "
    "each step is ONE equi-join of the frontier (one row per live "
    "walk) against the edge list keyed on the current node + a "
    "per-walk argmin — no state beyond the frontier, lineage truncated "
    "per step (the PageRank/BFS discipline); billions of walks are "
    "just more frontier rows.  Dead-end walks simply stop (inner "
    "join).  Integer node ids throughout.",
)
def graph_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    STEPS = 4
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 10 == 0).select(
        "l_orderkey", "l_partkey"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    a, b = cp.alias("a"), cp.alias("b")
    pairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= 2)
    )
    und = (
        pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionByName(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    frontier = (
        und.select(F.col("src").alias("walk_id"))
        .filter(F.col("walk_id") % 50 == 0)
        .distinct()
        .select("walk_id", F.lit(0).alias("step"), F.col("walk_id").alias("node"))
        .localCheckpoint()
    )
    out = frontier
    for i in range(1, STEPS + 1):
        h = F.md5(
            F.concat(
                F.lit("walk:"),
                F.col("walk_id").cast("string"),
                F.lit(":"),
                F.lit(str(i)),
                F.lit(":"),
                F.col("src").cast("string"),
                F.lit(":"),
                F.col("dst").cast("string"),
            ).cast("binary")
        )
        w = W.partitionBy("walk_id").orderBy("h")
        frontier = (
            frontier.join(und, frontier.node == und.src)
            .select("walk_id", "src", "dst", h.alias("h"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("walk_id", F.lit(i).alias("step"), F.col("dst").alias("node"))
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(frontier)
    return out.select(
        "walk_id", F.col("step").cast("bigint").alias("step"), F.col("node").cast("bigint").alias("node")
    )


_HITS_ITERS = 3


def _hits_oracle(iters: int = _HITS_ITERS) -> str:
    """Unrolled HITS oracle: h0 = 1; each round computes authority raw
    scores as sum(h*w) per dst, MAX-normalizes (max is order-independent,
    unlike an L1 sum), micro-quantizes, then the hub step mirrors it on
    src — decision-for-decision the Spark loop.  The e CTE is pinned
    MATERIALIZED: six half-rounds reference it, and letting DuckDB inline
    it re-runs the 4-way fact join per round (~9 s -> ~1 s at sf0.01)."""
    parts = [
        "WITH "
        + _EDGE_SQL.replace("e AS (", "e AS MATERIALIZED (")
        + ",",
        "h0 AS (SELECT node, 1.0 AS h FROM nodes),",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"a{i}raw AS (SELECT e.dst AS node, sum(h.h * e.w) AS raw"
            f" FROM e JOIN h{i-1} h ON h.node = e.src GROUP BY e.dst),"
            f" a{i}m AS (SELECT max(raw) AS m FROM a{i}raw),"
            f" a{i} AS (SELECT nodes.node,"
            f" floor(coalesce(r.raw, 0) / m.m * 1e9 + 0.5) / 1e9 AS a"
            f" FROM nodes CROSS JOIN a{i}m m"
            f" LEFT JOIN a{i}raw r ON r.node = nodes.node),"
        )
        parts.append(
            f"h{i}raw AS (SELECT e.src AS node, sum(a.a * e.w) AS raw"
            f" FROM e JOIN a{i} a ON a.node = e.dst GROUP BY e.src),"
            f" h{i}m AS (SELECT max(raw) AS m FROM h{i}raw),"
            f" h{i} AS (SELECT nodes.node,"
            f" floor(coalesce(r.raw, 0) / m.m * 1e9 + 0.5) / 1e9 AS h"
            f" FROM nodes CROSS JOIN h{i}m m"
            f" LEFT JOIN h{i}raw r ON r.node = nodes.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT n.n_nationkey, n.n_name,"
        f" CAST(floor(a.a * 1e9 + 0.5) AS BIGINT) AS auth_x1e9,"
        f" CAST(floor(h.h * 1e9 + 0.5) AS BIGINT) AS hub_x1e9"
        f" FROM a{iters} a JOIN h{iters} h ON h.node = a.node"
        f" JOIN nation n ON n.n_nationkey = a.node"
    )
    return "\n".join(parts)


@register(
    "graph_hits",
    oracle=_hits_oracle(),
    doc="HITS HUBS & AUTHORITIES (Kleinberg, 3 iterations) over the "
    "weighted nation trade graph — the asymmetric complement to "
    "graph_pagerank: customer nations that ROUTE volume score as hubs, "
    "supplier nations that RECEIVE it score as authorities, and unlike "
    "PageRank the two roles don't collapse into one rank.  Each "
    "half-round is one edge join + one hash aggregate (authority: "
    "dst-keyed sum of hub*w; hub: src-keyed sum of auth*w) with "
    "MAX-normalization — max is ORDER-INDEPENDENT where the textbook L1/"
    "L2 norm would hang bit-replicability on float summation order — "
    "and micro-quantization (1e-9) before the next half-round, so the "
    "DuckDB oracle replays the identical rounds as unrolled CTEs.  "
    "Scale: identical to PageRank's — the edge list shuffles once per "
    "half-round on its join key, score vectors are one row per node, "
    "the loop count is the only driver-side state.",
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")

    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()
    )
    nodes = n.select(F.col("n_nationkey").alias("node"))

    def quant(col):
        return F.floor(col * 1e9 + 0.5) / 1e9

    def half_round(score: DataFrame, in_col: str, from_key: str, to_key: str,
                   out_col: str) -> DataFrame:
        raw = (
            edges.join(score.withColumnRenamed("node", from_key), from_key)
            .groupBy(F.col(to_key).alias("node"))
            .agg(F.sum(F.col(in_col) * F.col("w")).alias("raw"))
        )
        m = raw.agg(F.max("raw").alias("m"))
        # 25-row score vector: truncate lineage each half-round, else the
        # final a⋈h join re-executes every earlier round's joins (the same
        # re-expansion random_walk's frontier checkpoint prevents)
        return (
            nodes.crossJoin(F.broadcast(m))
            .join(raw, "node", "left")
            .select(
                "node",
                quant(F.coalesce("raw", F.lit(0.0)) / F.col("m")).alias(out_col),
            )
            .localCheckpoint(eager=False)
        )

    h = nodes.withColumn("h", F.lit(1.0))
    for _ in range(_HITS_ITERS):
        a = half_round(h, "h", "src", "dst", "a")
        h = half_round(a, "a", "dst", "src", "h")
    return (
        a.join(h, "node")
        .join(n, a.node == n.n_nationkey)
        .select(
            "n_nationkey",
            "n_name",
            F.floor(F.col("a") * 1e9 + 0.5).cast("bigint").alias("auth_x1e9"),
            F.floor(F.col("h") * 1e9 + 0.5).cast("bigint").alias("hub_x1e9"),
        )
    )


_HC_ROUNDS = 4


def _harmonic_oracle(rounds: int = _HC_ROUNDS) -> str:
    """Unrolled multi-source BFS oracle: und = symmetric distinct edges;
    each round relaxes every (src, node) pair through one more hop and
    re-mins — decision-for-decision the Spark loop, bounded rounds."""
    parts = [
        "WITH raw AS MATERIALIZED ("
        " SELECT c.c_nationkey AS a, s.s_nationkey AS b"
        " FROM lineitem l"
        " JOIN orders o   ON l.l_orderkey = o.o_orderkey"
        " JOIN customer c ON o.o_custkey = c.c_custkey"
        " JOIN supplier s ON l.l_suppkey = s.s_suppkey"
        " WHERE c.c_nationkey <> s.s_nationkey),",
        "und AS MATERIALIZED ("
        " SELECT DISTINCT a, b FROM (SELECT a, b FROM raw"
        " UNION ALL SELECT b, a FROM raw)),",
        "nodes AS (SELECT n_nationkey AS node FROM nation),",
        "u0 AS (SELECT node AS src, node AS node, 0 AS d FROM nodes),",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"u{i} AS (SELECT src, node, min(d) AS d FROM ("
            f" SELECT src, node, d FROM u{i-1}"
            f" UNION ALL"
            f" SELECT u.src, e.b AS node, u.d + 1 AS d"
            f" FROM u{i-1} u JOIN und e ON e.a = u.node"
            f") GROUP BY src, node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT n.n_nationkey, n.n_name,"
        f" CAST(count(CASE WHEN u.d > 0 THEN 1 END) AS BIGINT) AS n_reached,"
        f" CAST(coalesce(sum(CASE WHEN u.d > 0 THEN 1000000 // u.d END), 0)"
        f"      AS BIGINT) AS harmonic_x1e6"
        f" FROM nation n LEFT JOIN u{rounds} u ON u.src = n.n_nationkey"
        f" GROUP BY n.n_nationkey, n.n_name"
    )
    return "\n".join(parts)


@register(
    "graph_harmonic_centrality",
    oracle=_harmonic_oracle(),
    doc="HARMONIC CENTRALITY — sum of 1/distance to every reachable node "
    "(the disconnected-graph-safe closeness variant: unreachable nodes "
    "contribute 0 instead of poisoning the mean) over the undirected "
    "nation trade graph, computed by MULTI-SOURCE BFS: the distance "
    "table starts as (u, u, 0) for all 25 sources at once and each "
    "round relaxes every pair through one more hop and re-mins — 4 "
    "rounds bound the diameter, and running all sources in one "
    "DataFrame turns 25 BFS traversals into 4 joins (the batch-BFS "
    "trick that matters at graph scale, where per-source traversals "
    "would serialize).  Distances are integers, contributions are "
    "exact 1000000 div d — no float.  Completes the centrality family: "
    "degree (triangle counting's ori), eigenvector-flavored "
    "(graph_pagerank, graph_hits), and now geodesic.  Scale: state is "
    "(sources x nodes) pairs sharded on src; each round is one join + "
    "one re-min aggregate; rounds = graph diameter, driver holds only "
    "the loop counter.",
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")

    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("a"), F.col("s_nationkey").alias("b"))
    )
    und = (
        raw.unionAll(raw.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    nodes = n.select(F.col("n_nationkey").alias("node"))
    dist = nodes.select(
        F.col("node").alias("src"), "node", F.lit(0).alias("d")
    )
    for _ in range(_HC_ROUNDS):
        hop = (
            dist.join(und, dist.node == und.a)
            .select("src", F.col("b").alias("node"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionByName(hop)
            .groupBy("src", "node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=False)
        )
    contrib = dist.filter(F.col("d") > 0)
    agg = contrib.groupBy("src").agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.sum(F.expr("1000000 div d")).alias("harmonic_x1e6"),
    )
    return (
        n.join(agg, n.n_nationkey == agg.src, "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce("n_reached", F.lit(0)).cast("bigint").alias("n_reached"),
            F.coalesce("harmonic_x1e6", F.lit(0)).cast("bigint").alias("harmonic_x1e6"),
        )
    )


_SSSP_ROUNDS = 6


def _sssp_oracle(rounds: int = _SSSP_ROUNDS) -> str:
    parts = [
        """WITH cp AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_partkey % 10 = 0
    ),
    pairs AS MATERIALIZED (
      SELECT a.p AS pa, b.p AS pb, count(*) AS cooc
      FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    wedges AS MATERIALIZED (
      SELECT pa, pb,
             (CAST('0x' || substr(md5('w:' || CAST(pa AS VARCHAR) || ':'
                                   || CAST(pb AS VARCHAR)), 1, 5)
                   AS BIGINT) % 90) + 10 AS w
      FROM pairs
    ),
    und AS MATERIALIZED (
      SELECT pa AS src, pb AS dst, w FROM wedges
      UNION ALL SELECT pb, pa, w FROM wedges
    ),
    d0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
      FROM und WHERE src % 50 = 0
    ),"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""d{i} AS MATERIALIZED (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{i-1}
        UNION ALL
        SELECT u.dst AS node, d.dist + u.w AS dist
        FROM d{i-1} d JOIN und u ON u.src = d.node
      ) GROUP BY node
    ),"""
        )
    body = "\n".join(parts).rstrip(",") + ","
    # strip the trailing comma of the final CTE
    body = body[: body.rfind(",")]
    return (
        body
        + f"""
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
    FROM d{rounds}
    """
    )


@register(
    "graph_weighted_sssp",
    oracle=_sssp_oracle(),
    doc=f"Weighted single/multi-source shortest path via {_SSSP_ROUNDS} "
    "Bellman-Ford relaxation rounds over the co-purchase graph (edge "
    "weight = md5-derived integer in [10,100) on the canonical pa<pb "
    "pair, symmetrized) — the 'cheapest route to any seed' question "
    "behind nearest-facility, blast-radius-with-cost, and network-"
    "latency analyses.  Each round relaxes EVERY edge against the "
    "current tentative-distance table (dist' = min(dist, min over "
    "in-edges of dist(u)+w)) and the table is re-min-aggregated — "
    "distances are exact for all shortest paths of <= 6 hops "
    "(documented cap, the BFS-layer discipline).  Spark side is the "
    "iterative DataFrame loop with per-round lineage truncation; at "
    "100 TB each round is one |frontier|-bounded shuffle keyed on node "
    "id, the same partitioning reused every round.  Oracle = the same "
    "rounds unrolled as CTEs (no path enumeration — table stays "
    "|V|-bounded).  Integer weights end-to-end.",
)
def graph_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 10 == 0).select(
        "l_orderkey", "l_partkey"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    a, b = cp.alias("a"), cp.alias("b")
    pairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= 2)
    )
    w = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("w:"),
                        F.col("pa").cast("string"),
                        F.lit(":"),
                        F.col("pb").cast("string"),
                    ).cast("binary")
                ),
                1,
                5,
            ),
            16,
            10,
        ).cast("bigint")
        % 90
        + 10
    )
    wedges = pairs.select("pa", "pb", w.alias("w"))
    und = (
        wedges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"), "w")
        .unionByName(wedges.select(F.col("pb").alias("src"), F.col("pa").alias("dst"), "w"))
        .localCheckpoint()
    )
    dist = (
        und.select(F.col("src").alias("node"))
        .filter(F.col("node") % 50 == 0)
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .localCheckpoint()
    )
    for _ in range(_SSSP_ROUNDS):
        relaxed = dist.join(und, dist.node == und.src).select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist.select(F.col("node").cast("bigint").alias("node"), "dist")
