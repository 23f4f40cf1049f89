"""Extended SQL surface: UNPIVOT, correlated subqueries, lateral column
aliases.

Reference lineage: the reference pushes every analytical query verbatim to
MySQL / BigQuery (``/root/reference/app/cloud-sql-query-runner/main.py:52-57``),
so its delegated surface includes the full ANSI-SQL feature set of those
engines — correlated EXISTS / scalar subqueries and wide<->long reshaping
are everyday BigQuery idioms a migrating user will bring along.  Spark-first
re-expression: ``df.unpivot`` (Expand operator), Catalyst subquery
decorrelation (correlated predicates become joins, never per-row nested
execution), and analysis-time lateral alias resolution.

Scale notes: UNPIVOT's Expand multiplies rows AFTER the aggregation, so the
fan-out happens on the group-sized table, not the fact table.  Correlated
EXISTS / NOT EXISTS decorrelate into left-semi / left-anti hash joins on the
correlation key — one key-partitioned shuffle each, identical to writing the
joins by hand; the scalar subquery becomes an aggregate + join on the same
key.  Lateral aliases are pure analysis sugar: the physical plan evaluates
the shared subexpression once per row inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register_views
from ..registry import register

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@register(
    "sql_unpivot",
    oracle="""
    WITH wide AS (
      SELECT c_nationkey AS nation,
             round(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END), 2) AS automobile,
             round(sum(CASE WHEN c_mktsegment = 'BUILDING'   THEN c_acctbal END), 2) AS building,
             round(sum(CASE WHEN c_mktsegment = 'FURNITURE'  THEN c_acctbal END), 2) AS furniture,
             round(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN c_acctbal END), 2) AS household,
             round(sum(CASE WHEN c_mktsegment = 'MACHINERY'  THEN c_acctbal END), 2) AS machinery
      FROM customer GROUP BY c_nationkey
    )
    SELECT nation, seg, bal FROM (
      SELECT nation, 'AUTOMOBILE' AS seg, automobile AS bal FROM wide
      UNION ALL SELECT nation, 'BUILDING',  building  FROM wide
      UNION ALL SELECT nation, 'FURNITURE', furniture FROM wide
      UNION ALL SELECT nation, 'HOUSEHOLD', household FROM wide
      UNION ALL SELECT nation, 'MACHINERY', machinery FROM wide
    ) WHERE bal IS NOT NULL
    """,
    doc="Wide->long reshaping: pivot customer balances to one column per "
    "market segment, then UNPIVOT back to (nation, seg, bal) rows via "
    "df.unpivot (the Expand operator — melt in dataframe terms).  The "
    "round-trip pins both directions' semantics, including UNPIVOT's "
    "default NULL-dropping.  Scale: Expand runs on the 25-row aggregated "
    "table; the only fact-table work is the pivot's partial-agg shuffle.",
)
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nation"))
        .pivot("c_mktsegment", list(_SEGMENTS))
        .agg(F.round(F.sum("c_acctbal"), 2))
    )
    long = wide.unpivot(
        ids=["nation"],
        values=[s for s in _SEGMENTS],
        variableColumnName="seg",
        valueColumnName="bal",
    )
    # unpivot drops NULL-valued cells by default only in SQL UNPIVOT; the
    # DataFrame melt keeps them -> make the NULL-dropping explicit so both
    # sides state the same contract.
    return long.filter(F.col("bal").isNotNull())


@register(
    "sql_exists_correlated",
    oracle="""
    SELECT c.c_custkey,
           (SELECT round(max(o_totalprice), 2) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS max_price,
           (SELECT count(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT') AS n_urgent
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
    doc="Correlated subqueries end-to-end: EXISTS (left-semi), NOT EXISTS "
    "(left-anti), and two correlated SCALAR subqueries (max, count) over "
    "the same correlation key.  Catalyst decorrelates all four into joins "
    "on o_custkey — no per-outer-row re-execution, which is the property "
    "that makes correlated SQL survive 100 TB (tests assert the physical "
    "plan contains join operators and zero iterative subquery nodes).",
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey,
               (SELECT round(max(o_totalprice), 2) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_price,
               (SELECT count(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT') AS n_urgent
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
        """
    )


@register(
    "sql_lateral_column_alias",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS net_cents,
           CAST(floor((CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) / 100.0)
                      * (1 + l_tax) * 100 + 0.5) AS BIGINT) AS gross_cents,
           CASE WHEN CAST(floor((CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) / 100.0)
                                * (1 + l_tax) * 100 + 0.5) AS BIGINT)
                     > 6000000 THEN 'high' ELSE 'low' END AS bracket
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-11-01' AND l_orderkey % 7 = 0
    """,
    doc="Lateral column aliases (Spark 3.4+/DuckDB shared semantics): a "
    "SELECT item references a sibling alias (net_cents -> gross_cents -> "
    "bracket) instead of repeating the expression.  Pure analysis-time "
    "sugar — the oracle spells out the textual expansion the analyzer "
    "performs, and the physical plan evaluates the chain once per row in "
    "codegen.  Money is integer cents via floor(x*100+0.5): round() ties "
    "split half-up vs half-even between engines, while IEEE754 multiply + "
    "floor is bit-identical everywhere.",
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS net_cents,
               CAST(floor((net_cents / 100.0) * (1 + l_tax) * 100 + 0.5) AS BIGINT) AS gross_cents,
               CASE WHEN gross_cents > 6000000 THEN 'high' ELSE 'low' END AS bracket
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-11-01' AND l_orderkey % 7 = 0
        """
    )


@register(
    "sql_parameterized_query",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    doc="Parameterized SQL (spark.sql named parameters, Spark 3.4+): the "
    "query text carries :from_date / :status placeholders and values are "
    "BOUND, not interpolated — the injection-safe templating every "
    "application layer needs (the reference interpolates query strings "
    "in Python; binding is the correct re-expression).  Parameter "
    "markers are resolved at analysis time, so the bound literal "
    "participates in constant folding and filter pushdown exactly like "
    "an inline one — same plan, safer text.",
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders
        WHERE o_orderdate >= :from_date AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"from_date": "1997-01-01 00:00:00", "status": "O"},
    )


@register(
    "sql_identifier_clause",
    oracle="""
    SELECT 'lineitem' AS tbl, l_returnflag AS grp,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY grp
    UNION ALL
    SELECT 'orders', o_orderstatus, CAST(count(*) AS BIGINT)
    FROM orders GROUP BY o_orderstatus
    """,
    doc="IDENTIFIER() CLAUSE — SQL-injection-safe DYNAMIC table/column "
    "binding (Spark 3.4+): the per-table profiling loop every catalog "
    "sweep runs ('for each table, count by its status column') "
    "expressed as ONE parameterized statement re-bound per target, "
    "with table AND column names passed as parameter markers — where "
    "string-spliced SQL would be injectable and un-cacheable.  "
    "Complements sql_parameterized_query (VALUE parameters) with "
    "IDENTIFIER parameters, the other half of parameterized SQL; the "
    "reference's export loop builds its per-table SQL by f-string "
    "(`cloud-sql-exporter/main.py:53-55`), exactly the pattern this "
    "replaces.  Scale: each binding is an independent one-exchange "
    "aggregate; the loop is over the CATALOG (bounded), not data.",
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    targets = [("lineitem", "l_returnflag"), ("orders", "o_orderstatus")]
    parts = [
        spark.sql(
            """
            SELECT :tname AS tbl, IDENTIFIER(:col) AS grp,
                   CAST(count(*) AS BIGINT) AS n
            FROM IDENTIFIER(:tbl) GROUP BY IDENTIFIER(:col)
            """,
            args={"tname": t, "tbl": t, "col": c},
        )
        for t, c in targets
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
