"""Round-16 registry scans C and D: row-at-a-time Python UDFs and
unbounded GLOBAL aggregate buffers.

Scan C — ``BatchEvalPython`` nodes: a row-at-a-time Python UDF in a plan
serializes every row through pickle one at a time (~10-100x slower than
an Arrow-batched path).  The repo's claim since r6 is "no row-at-a-time
Python UDF in any hot path"; this scan makes the claim registry-wide and
mechanical.  ``ArrowEvalPython`` / ``MapInArrow`` / ``FlatMapGroupsIn
Pandas`` etc. are the fast paths and are NOT flagged.

Scan D — global (ungrouped) aggregates whose buffer COLLECTS values
(percentile/percentile_disc/median/mode/collect_list/collect_set/
listagg/array_agg) over fact-grain input: the single-partition exchange
below a global agg carries one ROW per map task, which is why the
single-partition invariant walks past it — but for these functions that
one row holds the task's entire column slice, and the lone reducer
merges ~the full column in memory.  At 100 TB that is an OOM, not a
slow query.  Grouped variants distribute by key and are fine; bounded
inputs (dim tables, post-limit, post-aggregate) are fine; sketch
aggregates (approx_percentile, hll, count-min, kmv) are the designed
scale path and are NOT flagged.

Both detectors live in ``plans/inspect.py`` and run as STANDING
invariants 4+5 in ``scripts/plan_audit.py`` since round 16; this script
remains as the forensic form (per-query hit listing) of the same scan.

Usage: python scripts/scan_udf_buffers.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from gcp_cloudsql_to_bigquery_spark.operators.dedup import audit_subplans
    from gcp_cloudsql_to_bigquery_spark.plans import inspect
    from gcp_cloudsql_to_bigquery_spark.session import get_spark
    from gcp_cloudsql_to_bigquery_spark.workload import queries

    spark = get_spark(
        app_name="scan_udf_buffers", master="local[8]", shuffle_partitions=8
    )
    udf_hits: dict[str, int] = {}
    buf_hits: dict[str, list[str]] = {}
    n = 0

    def check(name: str, df) -> None:
        nonlocal n
        n += 1
        c = inspect.batch_eval_python_count(df)
        if c:
            udf_hits[name] = c
        found = inspect.unbounded_global_buffer_aggregates(df)
        if found:
            buf_hits[name] = found

    try:
        for name, df in audit_subplans(spark, args.sf).items():
            check(name, df)
    except Exception as e:
        print(f"audit_subplans failed: {e}")
    for name, fn in queries().items():
        spark.catalog.clearCache()
        try:
            df = fn(spark, args.sf)
        except Exception as e:
            print(f"{name}: plan build error: {e}")
            continue
        check(name, df)

    print(f"scanned {n} plans")
    for name, c in sorted(udf_hits.items()):
        print(f"HIT-UDF {name}: {c} BatchEvalPython node(s)")
    for name, found in sorted(buf_hits.items()):
        print(f"HIT-BUF {name}: global value-collecting agg over fact grain: {found}")
    print(
        f"{len(udf_hits)} queries with row-at-a-time Python UDFs; "
        f"{len(buf_hits)} with unbounded global aggregate buffers"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
