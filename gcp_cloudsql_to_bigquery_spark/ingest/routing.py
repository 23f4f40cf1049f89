"""File routing + message-codec parity ops (SURVEY.md §2A #3, #13, #19, #24).

The reference routes GCS objects by suffix (``csv-cleaner/main.py:17``),
recovers table names from filenames (``bq-importer/main.py:12-13``), and
folds the table list into a comma-joined Pub/Sub payload
(``cloud-sql-query-runner/main.py:59-64``).  Spark-side: ``input_file_name``
+ ``regexp_extract`` make routing a column expression over a directory scan,
and the fold is ``concat_ws(collect_list)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def route_files(listing: DataFrame, path_col: str = "path") -> DataFrame:
    """Op #13 + #19: suffix router + table-name extractor as expressions."""
    p = F.col(path_col)
    return listing.select(
        p.alias("path"),
        F.when(p.endswith(".csv"), "data")
        .when(p.endswith(".schema") | p.endswith(".schema.json"), "schema")
        .otherwise("ignore")
        .alias("kind"),
        F.regexp_extract(p, r"([^/]+?)(?:\.schema)?(?:\.json|\.csv|\.schema)$", 1).alias(
            "table"
        ),
    )


@register(
    "elt_table_list_fold",
    oracle="""
    SELECT string_agg(table_name, ',' ORDER BY table_name) AS tables_payload,
           count(*) AS n_tables
    FROM (VALUES ('region'),('nation'),('supplier'),('customer'),('part')) v(table_name)
    """,
    doc="Op #3: the table-list → comma-joined payload fold "
    "(concat_ws ∘ sort ∘ collect_list), the IR the reference ships between "
    "stages in a Pub/Sub message.",
)
def elt_table_list_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = spark.createDataFrame(
        [(t,) for t in ("region", "nation", "supplier", "customer", "part")],
        "table_name string",
    )
    return names.agg(
        F.concat_ws(",", F.sort_array(F.collect_list("table_name"))).alias("tables_payload"),
        F.count(F.lit(1)).alias("n_tables"),
    )


@register(
    "elt_file_router",
    oracle="""
    WITH listing(path) AS (
      VALUES ('exports/2026-08-13/nation.csv'),
             ('exports/2026-08-13/region.csv'),
             ('schemas/2026-08-13/nation.schema.json'),
             ('schemas/2026-08-13/region.schema.json')
    )
    SELECT path,
           CASE WHEN path LIKE '%.csv' THEN 'data'
                WHEN path LIKE '%.schema' OR path LIKE '%.schema.json'
                  THEN 'schema'
                ELSE 'ignore' END AS kind,
           regexp_extract(path,
             '([^/]+?)(?:\\.schema)?(?:\\.json|\\.csv|\\.schema)$', 1)
             AS "table"
    FROM listing ORDER BY path
    """,
    doc="Ops #13/#19 live: export two tables through the pipeline layout, "
    "then route the resulting directory by suffix and recover table names "
    "from paths — the csv-cleaner/bq-importer dispatch as one DataFrame. "
    "The Spark side walks the REAL exported tempdir and relativizes paths "
    "to the export base, so the listing is deterministic; the oracle pins "
    "the expected date-partitioned layout (pipeline.py export contract) "
    "and re-implements the suffix/extract routing in SQL.",
)
def elt_file_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..tmputil import tmp_dir
    from .pipeline import export_table

    base = tmp_dir("router_")
    for t in ("region", "nation"):
        export_table(load(spark, sf_dir, t), base, t, export_date="2026-08-13")
    paths = []
    for root, _dirs, files in os.walk(base):
        for f in files:
            if not f.startswith(("_", ".")):
                paths.append(os.path.join(root, f))
    # data exports are directories of part files; route at the logical level,
    # relative to the export base so the result is layout- not tempdir-keyed
    logical = sorted(
        {
            os.path.relpath(p if "/schemas/" in p else os.path.dirname(p), base)
            for p in paths
        }
    )
    listing = spark.createDataFrame([(p,) for p in logical], "path string")
    return route_files(listing).orderBy("path")
