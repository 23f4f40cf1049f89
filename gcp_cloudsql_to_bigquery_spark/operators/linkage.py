"""Record-linkage and spatial joins: blocked fuzzy matching and a
grid-blocked radius self-join.

Both operators are BLOCKING joins — the classic scale pattern for
similarity predicates that cannot be hash-joined directly: pick a cheap
equi-joinable block key that is GUARANTEED to co-locate every true match
(same-noun block for edit distance on two-word names; 3x3 neighboring
grid cells for a radius predicate with cell size >= radius), equi-join on
the block key, then evaluate the expensive predicate only inside blocks.
The shuffle is the block-key hash join; the quadratic work is bounded by
the largest block, never by the table.  This is the same
candidates-then-verify discipline as dedup.py's LSH band join
(`operators/dedup.py`), applied to strings and geometry.

Spatial coordinates are SYNTHESIZED deterministically from customer keys
(md5-derived, onto a 100k x 100k integer grid) so both engines state
identical integer geometry — the fixture has no native lat/lon column.
md5, not an affine-mod LCG: an affine map makes (dx, dy) a function of
the KEY DIFFERENCE alone, collapsing the point set onto a sparse lattice
with no close pairs at all (observed: zero matches at sf0.01).
All arithmetic integer-exact end-to-end; no doubles cross the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_FUZZ_MAX_DIST = 3

_GEO_MOD = 100_000  # grid extent per axis
_GEO_R = 700        # radius; also the blocking cell size
_GEO_R2 = _GEO_R * _GEO_R


@register(
    "join_fuzzy_blocked",
    # The ORACLE is deliberately ALL-PAIRS (no blocking): the differential
    # check therefore PROVES the Spark side's multi-key blocking achieves
    # full recall at this threshold on this corpus, not just that both
    # engines agree on the same candidate set.  (At threshold 4 the fixture
    # contains pairs sharing neither token — 'cold rod' / 'old ring' — so 4
    # would break recall; 3 is the proven-lossless setting at all SFs.)
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part)
    SELECT a.name AS name_a, b.name AS name_b,
           levenshtein(a.name, b.name) AS edit_dist
    FROM names a
    JOIN names b ON a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {_FUZZ_MAX_DIST}
    """,
    doc="Multi-pass blocked fuzzy (edit-distance) self-join over part "
    "names: distinct names are blocked TWICE — once on the adjective "
    "token, once on the noun token — candidates from both passes are "
    "unioned and deduped, and only candidates pay the O(len^2) "
    "levenshtein verify.  Multi-key blocking is the standard record-"
    "linkage recall repair: one key alone misses matches whose key "
    "token mutated; agreeing on ANY key keeps the pair.  The oracle is "
    "all-pairs, so the hash compare is a RECALL PROOF for the blocking, "
    "not merely candidate-set agreement.  The candidate-dedup step "
    "(DISTINCT name before joining) is the other half of the discipline: "
    "at 100 TB you link the distinct-value dictionary (thousands of "
    "names), not the fact table (billions of rows), then broadcast the "
    "match table back.  Shuffles: one distinct + two block-key hash "
    "joins + one candidate distinct; no all-pairs anywhere on the Spark "
    "side.  Spark and DuckDB both implement standard Wagner-Fischer "
    "levenshtein, so the predicate is engine-identical.",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    names = p.select(
        F.col("p_name").alias("name"),
        F.split(F.col("p_name"), " ").getItem(0).alias("adj"),
        F.split(F.col("p_name"), " ").getItem(1).alias("noun"),
    ).distinct()

    def block(key: str) -> DataFrame:
        a = names.select(F.col(key).alias("k"), F.col("name").alias("name_a"))
        b = names.select(F.col(key).alias("k"), F.col("name").alias("name_b"))
        return (
            a.join(b, "k")
            .filter(F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b")
        )

    candidates = block("adj").unionAll(block("noun")).distinct()
    return (
        candidates.withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= _FUZZ_MAX_DIST)
        .select("name_a", "name_b", "edit_dist")
    )


_GEO_PTS_SQL = f"""
    pts AS (
      SELECT c_custkey AS k,
             CAST('0x' || substr(md5('x' || CAST(c_custkey AS VARCHAR)), 1, 5)
                  AS BIGINT) % {_GEO_MOD} AS x,
             CAST('0x' || substr(md5('y' || CAST(c_custkey AS VARCHAR)), 1, 5)
                  AS BIGINT) % {_GEO_MOD} AS y
      FROM customer
    ),
    cells AS (
      SELECT k, x, y, x // {_GEO_R} AS cx, y // {_GEO_R} AS cy FROM pts
    )"""


@register(
    "join_geo_radius",
    oracle=f"""
    WITH {_GEO_PTS_SQL},
    probe AS (
      SELECT c.k, c.x, c.y, c.cx + dx.o AS ncx, c.cy + dy.o AS ncy
      FROM cells c
      CROSS JOIN (VALUES (-1), (0), (1)) dx(o)
      CROSS JOIN (VALUES (-1), (0), (1)) dy(o)
    )
    SELECT a.k AS key_a, b.k AS key_b,
           CAST((a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
    FROM probe a
    JOIN cells b ON b.cx = a.ncx AND b.cy = a.ncy AND a.k < b.k
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_GEO_R2}
    """,
    doc=f"Grid-blocked radius self-join (find all point pairs within "
    f"distance {_GEO_R} on a {_GEO_MOD}x{_GEO_MOD} integer grid): each "
    f"point probes its 3x3 neighborhood of {_GEO_R}-sized cells — cell "
    f"size >= radius guarantees every qualifying pair shares adjacent "
    f"cells, and the (a.k < b.k) orientation plus the single matching "
    f"offset means each pair is emitted exactly once.  This is the "
    f"standard distributed spatial-join shape (grid partitioning a la "
    f"SpatialSpark/Sedona): the shuffle is an equi-join on cell ids, the "
    f"9x probe-side inflation is a narrow generate, and the quadratic "
    f"distance work is confined to ~(n * density * 9R^2/area) candidate "
    f"pairs instead of n^2/2.  Squared integer distance only — no sqrt, "
    f"no doubles, exact on both engines.  Coordinates are affine-mod "
    f"synthesized from c_custkey (fixture has no spatial column).",
)
def join_geo_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    def coord(salt: str) -> F.Column:
        h = F.md5(F.concat(F.lit(salt), F.col("c_custkey").cast("string")))
        return F.conv(F.substring(h, 1, 5), 16, 10).cast("bigint") % _GEO_MOD

    pts = c.select(
        F.col("c_custkey").alias("k"),
        coord("x").alias("x"),
        coord("y").alias("y"),
    )
    cells = pts.select(
        "k", "x", "y",
        F.expr(f"x div {_GEO_R}").alias("cx"),
        F.expr(f"y div {_GEO_R}").alias("cy"),
    )
    offsets = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    )
    probe = cells.select(
        F.col("k"), F.col("x"), F.col("y"),
        F.col("cx"), F.col("cy"), offsets.alias("o"),
    ).select(
        "k", "x", "y",
        (F.col("cx") + F.col("o.dx")).alias("ncx"),
        (F.col("cy") + F.col("o.dy")).alias("ncy"),
    )
    b = cells.select(
        F.col("k").alias("kb"), F.col("x").alias("xb"), F.col("y").alias("yb"),
        F.col("cx").alias("cxb"), F.col("cy").alias("cyb"),
    )
    dist2 = (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb")) + (
        F.col("y") - F.col("yb")
    ) * (F.col("y") - F.col("yb"))
    return (
        probe.join(
            b,
            (F.col("ncx") == F.col("cxb"))
            & (F.col("ncy") == F.col("cyb"))
            & (F.col("k") < F.col("kb")),
        )
        .filter(dist2 <= _GEO_R2)
        .select(
            F.col("k").alias("key_a"),
            F.col("kb").alias("key_b"),
            dist2.cast("bigint").alias("dist2"),
        )
    )


@register(
    "geo_morton_rollup",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS k,
             (CAST('0x' || substr(md5('x' || CAST(c_custkey AS VARCHAR)), 1, 5)
                   AS BIGINT) % 1024) // 4 AS x,
             (CAST('0x' || substr(md5('y' || CAST(c_custkey AS VARCHAR)), 1, 5)
                   AS BIGINT) % 1024) // 4 AS y
      FROM customer
    ),
    coded AS (
      SELECT k, x, y,
             (((x >> 0) & 1) << 0) | (((y >> 0) & 1) << 1)
           | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3)
           | (((x >> 2) & 1) << 4) | (((y >> 2) & 1) << 5)
           | (((x >> 3) & 1) << 6) | (((y >> 3) & 1) << 7)
           | (((x >> 4) & 1) << 8) | (((y >> 4) & 1) << 9)
           | (((x >> 5) & 1) << 10) | (((y >> 5) & 1) << 11)
           | (((x >> 6) & 1) << 12) | (((y >> 6) & 1) << 13)
           | (((x >> 7) & 1) << 14) | (((y >> 7) & 1) << 15) AS morton
      FROM pts
    )
    SELECT CAST(morton >> 8 AS BIGINT) AS cell_coarse,
           CAST(morton >> 4 AS BIGINT) AS cell_fine,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(min(k) AS BIGINT) AS sample_key
    FROM coded
    GROUP BY cell_coarse, cell_fine
    HAVING count(*) >= 3
    """,
    doc="Multi-resolution spatial rollup via MORTON (Z-order) codes — "
    "the geohash-style hierarchy: (x, y) bits interleaved into one "
    "integer whose PREFIXES are the containing cells at every coarser "
    "resolution, so a single groupBy on two right-shifts of the same "
    "code yields aligned coarse(4x4-cell)/fine per-cell counts with "
    "parent-child containment free (cell_fine >> 4 == cell_coarse by "
    "construction — asserted in tests).  This prefix property is "
    "exactly why Z-order is also the multi-column file LAYOUT "
    "(sources/files.py's Z-order writer): spatial locality becomes "
    "lexicographic locality.  Bit interleave is pure integer "
    "shift/mask expressions — identical in both engines; coordinates "
    "are the md5-derived grid of join_geo_radius, coarsened to 8 bits "
    "per axis.  One partial-agged shuffle.",
)
def geo_morton_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")

    pts = c.select(
        F.col("c_custkey").alias("k"),
        F.expr("(CAST(conv(substring(md5(concat('x', CAST(c_custkey AS STRING))), 1, 5), 16, 10) AS BIGINT) % 1024) div 4").alias("x"),
        F.expr("(CAST(conv(substring(md5(concat('y', CAST(c_custkey AS STRING))), 1, 5), 16, 10) AS BIGINT) % 1024) div 4").alias("y"),
    )
    morton = None
    for i in range(8):
        xbit = F.shiftleft(F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)), 2 * i)
        ybit = F.shiftleft(F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = xbit.bitwiseOR(ybit)
        morton = term if morton is None else morton.bitwiseOR(term)
    coded = pts.select("k", morton.alias("morton"))
    return (
        coded.groupBy(
            F.shiftright("morton", 8).cast("bigint").alias("cell_coarse"),
            F.shiftright("morton", 4).cast("bigint").alias("cell_fine"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"), F.min("k").alias("sample_key"))
        .filter(F.col("n_points") >= 3)
    )
