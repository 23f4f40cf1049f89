"""Dump per-query `.explain("formatted")` output for the optimization-round
evidence files: plans/r17/<query>_<tag>.txt (tag = before/after).

Captures the bench-shaped plan (same conf bench.py runs: shuffle width 8,
AQE off, 2 MB scan splits) for every non-streaming HEADLINE + EXTENDED
query, plus the un-fenced dedup candidate/verify subtrees (the persist
fences would otherwise hide them, see operators.dedup.audit_subplans).

Usage:  python scripts/dump_r17_plans.py <tag> [--sf /root/testdata/sf0.1] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTENDED, HEADLINE, STREAMING  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=("before", "after"))
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from gcp_cloudsql_to_bigquery_spark.operators import dedup as _dedup
    from gcp_cloudsql_to_bigquery_spark.plans import inspect
    from gcp_cloudsql_to_bigquery_spark.session import get_spark
    from gcp_cloudsql_to_bigquery_spark.workload import queries

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(
        app_name="dump_r17_plans",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    qs = queries()
    targets = args.names or [
        n for n in tuple(HEADLINE) + tuple(EXTENDED) if n not in STREAMING
    ]
    for name in targets:
        df = qs[name](spark, args.sf)
        plan = inspect.formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan if plan.endswith("\n") else plan + "\n")
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    # un-fenced dedup subtrees (candidate generation + verify joins)
    if not args.names:
        for name, df in _dedup.audit_subplans(spark, args.sf).items():
            plan = inspect.formatted_plan(df)
            path = os.path.join(out_dir, f"{name.replace('.', '_')}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan if plan.endswith("\n") else plan + "\n")
            print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
