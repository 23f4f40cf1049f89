"""Registry-wide physical-plan audit: build every query's plan and check
the two scale invariants introduced in round 6.

Plan *building* is lazy for almost every query since round 8: the r7
verify barriers in ``dedup_ngram_jaccard`` / ``dedup_minhash_lsh`` /
``curation_dedup_pipeline`` are now ``localCheckpoint(eager=False)``
(same LogicalRDD fence in the audited plan, job deferred to the first
action), so building those plans is cheap again.  The remaining
construction-time execution: the iterative connected-components family
(driver-side convergence counts, inherent to the algorithm) plus two
small single-job eager checkpoints left deliberately in place
(``dedup_containment``'s df-capped posting list, the 20-row
``curation_temperature_sampling`` plan table — both r7-witnessed, and
re-witnessing them for a construction-latency nicety isn't worth the
gate slots).  A full audit runs in ~3 minutes, dominated by the CC
loops.

Invariants:

1. no unpartitioned WindowExec fed by an unaggregated datasource scan
   (the one-task global sort that caps at a single core no matter the
   cluster — VERDICT r5 item 3);
2. no CartesianProduct / BroadcastNestedLoopJoin with BOTH sides
   unaggregated scans (a genuinely quadratic fact-by-fact product).

Known-justified exceptions are allowlisted with reasons (kept in sync
with tests/test_plans.py, which pins the same invariants in CI).

Usage:  python scripts/plan_audit.py [--sf /root/testdata/sf0.001]
Exit status 1 if any non-allowlisted violation is found.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

# (query, invariant) -> expected count, with the justification
ALLOWLIST: dict[tuple[str, str], tuple[int, str]] = {
    ("window_ntile_first_last", "window"): (
        1,
        "ntile WINDOW-FUNCTION coverage entry over the customer dimension; "
        "documented single-reducer caveat, scale path is scale.distributed_ntile",
    ),
    ("fn_ip_cidr_lookup", "cartesian"): (
        1,
        "non-equi probe of a CIDR table derived from the 25-row nation dim",
    ),
    ("join_theta_range", "cartesian"): (
        1,
        "theta-join coverage entry over two bounded dims (supplier x nation)",
    ),
    ("ann_ivfpq_topk", "cartesian"): (
        2,
        "IVF coarse assignment: corpus x 16-row literal-filtered anchor set",
    ),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from gcp_cloudsql_to_bigquery_spark.plans import inspect
    from gcp_cloudsql_to_bigquery_spark.session import get_spark
    from gcp_cloudsql_to_bigquery_spark.workload import queries

    from gcp_cloudsql_to_bigquery_spark.operators.dedup import audit_subplans

    spark = get_spark(app_name="plan_audit", master="local[8]", shuffle_partitions=8)
    violations: list[str] = []
    n_checked = 0
    # pre-barrier builders: the r7 verify checkpoints truncate lineage, so
    # the registered dedup queries' plans no longer show their candidate/
    # verify subtrees — audit the un-truncated forms alongside the registry
    targets = dict(queries())
    # a failure building either pre-barrier DataFrame is recorded as a
    # per-plan violation like any registry query, not a whole-audit abort
    try:
        targets.update(
            {n: (lambda s, sf, d=df: d) for n, df in audit_subplans(spark, args.sf).items()}
        )
    except Exception as e:
        violations.append(f"audit_subplans: plan build error: {e}")
    for name, fn in targets.items():
        try:
            df = fn(spark, args.sf)
        except Exception as e:  # plan construction itself failed
            violations.append(f"{name}: plan build error: {e}")
            continue
        n_checked += 1
        for kind, count in (
            ("window", inspect.unpartitioned_fact_window_count(df)),
            ("cartesian", inspect.fact_cartesian_count(df)),
        ):
            expected, _why = ALLOWLIST.get((name, kind), (0, ""))
            if count != expected:
                violations.append(f"{name}: {kind}={count} (expected {expected})")
    print(f"checked {n_checked} plans")
    if violations:
        for v in violations:
            print("VIOLATION:", v)
        return 1
    print("all plan invariants hold (allowlist:",
          ", ".join(f"{q}/{k}={n}" for (q, k), (n, _) in ALLOWLIST.items()) + ")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
