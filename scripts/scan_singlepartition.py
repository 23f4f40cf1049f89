"""Round-16 registry scan: unbounded ``Exchange SinglePartition`` barriers.

The r15 WindowGroupLimit scan (same methodology: build every registry
plan, walk the physical tree, classify each hit bounded/unbounded) found
two real one-task sorts in 16 candidates.  This scan targets the sibling
class: a ShuffleExchange to a SINGLE partition whose input is fact-grain
(reaches a datasource scan with no aggregation/limit in between) — every
row of the table funnels through one reducer regardless of cluster size.

Bounded feeds (global-agg final stages fed by partials, GlobalLimit fed
by LocalLimit, post-WindowGroupLimit ranks) are ignored by construction —
``inspect.unbounded_single_partition_exchanges`` encodes the boundedness
walk shared with the window/cartesian invariants.

The detector lives in ``plans/inspect.py`` and runs as STANDING
invariant 3 in ``scripts/plan_audit.py`` since round 16; this script
remains as the forensic form (per-query hit listing) of the same scan.

Usage: python scripts/scan_singlepartition.py [--sf /root/testdata/sf0.001]
Prints one line per offending (query, child-node) and a summary.
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
        app_name="scan_singlepartition", master="local[8]", shuffle_partitions=8
    )
    hits: dict[str, list[str]] = {}
    n = 0

    def check(name: str, df) -> None:
        nonlocal n
        n += 1
        found = inspect.unbounded_single_partition_exchanges(df)
        if found:
            hits[name] = found

    # pre-barrier dedup subplans first (same audit-order hazard as
    # plan_audit.py: cache substitution would collapse them after any
    # registry dedup plan is built)
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
    for name, found in sorted(hits.items()):
        for child in found:
            print(f"HIT {name}: SinglePartition <- {child}")
    print(f"{len(hits)} queries with unbounded single-partition barriers")
    return 0


if __name__ == "__main__":
    sys.exit(main())
