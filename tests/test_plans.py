"""Plan-shape regression tests: pushdown, pruning, broadcast strategy.

These encode the 100 TB contract — if a code change degrades a plan to
shuffle-the-fact-table or scan-every-column, these fail at sf0.001.
"""

from gcp_cloudsql_to_bigquery_spark.plans import inspect
from gcp_cloudsql_to_bigquery_spark.workload import queries

SF = "/root/testdata/sf0.001"


def test_q1_filter_pushed_to_parquet(spark):
    df = queries()["q1_pricing_summary"](spark, SF)
    assert inspect.has_pushed_filters(df), "l_shipdate filter must reach the scan"


def test_q1_column_pruning(spark):
    df = queries()["q1_pricing_summary"](spark, SF)
    scans = inspect.read_schema_columns(df)
    assert scans, "expected a file scan"
    read = set(scans[0])
    assert "l_comment" not in read  # no such col, but guard the principle:
    assert read <= {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }, f"scan reads more than the query needs: {read}"


def test_q5_all_dimension_joins_broadcast(spark):
    df = queries()["join_q5_region_revenue"](spark, SF)
    assert inspect.broadcast_join_count(df) == 5
    assert inspect.sort_merge_join_count(df) == 0


def test_q3_customer_broadcast(spark):
    df = queries()["join_star_q3"](spark, SF)
    assert inspect.broadcast_join_count(df) >= 1


def test_catalog_scan_pushdown(spark):
    df = queries()["catalog_scan_like_in"](spark, SF)
    assert inspect.has_pushed_filters(df), "LIKE/IN predicates must push to parquet"


def test_window_single_exchange_per_spec(spark):
    # the four stacked functions in window_ranking share one window spec →
    # exactly one shuffle
    df = queries()["window_ranking"](spark, SF)
    assert inspect.exchange_count(df) == 1, inspect.physical_plan(df)


def test_metadata_stats_prunes_text_payload(spark):
    # payload-byte rollup needs text only for octet_length; scan must not
    # read lang (inside meta but unused) — pruning through the struct
    df = queries()["multimodal_metadata_stats"](spark, SF)
    scans = inspect.read_schema_columns(df)
    read = {c for cols in scans for c in cols}
    assert "lang" not in read, read
