"""Physical-plan inspection helpers: assert the plan you meant to get.

SURVEY.md §4: Catalyst provides pushdown/pruning/broadcast for free *if* the
query is declared well — these helpers make plan shape a testable property
(scan pushdown reached parquet, small sides went broadcast, codegen spans
cover the hot path), so a regression to a shuffle-heavy plan fails CI
instead of surfacing as a 100 TB incident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def count_occurrences(df: DataFrame, token: str) -> int:
    return physical_plan(df).count(token)


def has_pushed_filters(df: DataFrame) -> bool:
    """True if any datasource scan carries pushed filters."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:") and not s.endswith("[]"):
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each file scan (pruning check)."""
    import re

    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def broadcast_join_count(df: DataFrame) -> int:
    return count_occurrences(df, "BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return count_occurrences(df, "SortMergeJoin")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (each is a full materialization barrier)."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(df).count(
        "Exchange rangepartitioning"
    )


def broadcast_hint_count(df: DataFrame) -> int:
    """Count of hint-FORCED broadcasts in the logical plan.

    Distinct from ``broadcast_join_count``: the optimizer is free to pick a
    broadcast join when a side measures small (that is size-gated and safe);
    a ResolvedHint forces it regardless of size — the thing that OOMs at
    100 TB when the hinted side grows with the data.
    """
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def exchange_inputs(df: DataFrame) -> list[tuple[str, list[str]]]:
    """(arguments, input_columns) for every Exchange node in the formatted
    plan — lets tests assert WHAT an exchange carries, not just that it
    exists (e.g. 'the bucket-key shuffle must not carry the vector column')."""
    import re

    plan = formatted_plan(df)
    sections = re.split(r"\n\(\d+\) ", plan)
    out: list[tuple[str, list[str]]] = []
    for sec in sections:
        header = sec.splitlines()[0] if sec else ""
        if "Exchange" not in header:
            continue
        inp = re.search(r"Input \[\d+\]: \[([^\]]*)\]", sec)
        args = re.search(r"Arguments: (.*)", sec)
        cols = [c.strip() for c in inp.group(1).split(",")] if inp else []
        out.append((args.group(1) if args else "", cols))
    return out


def _unwrap_adaptive(node):
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        return node.initialPlan()
    return node


def _reaches_scan_without_agg(node) -> bool:
    """True if this subtree reaches a datasource scan with no intervening
    aggregation / limit / group-limit — i.e. its row count is fact-grain,
    not bounded by a reduction.  Shared by the three scale invariants
    (unpartitioned window, fact cartesian, single-partition barrier):
    LocalTableScan/RDDScan literals are driver-local and bounded;
    FileSourceScan/BatchScan/RowDataSourceScan are the unbounded bases."""
    cls = node.getClass().getSimpleName()
    if (
        "Aggregate" in cls
        or "Limit" in cls
        or "TakeOrdered" in cls
        or cls == "WindowGroupLimitExec"
    ):
        return False
    if cls in ("LocalTableScanExec", "RDDScanExec"):
        # createDataFrame literals (LocalTableScan, or ExistingRDD when
        # the conversion takes the RDD path) — driver-local, bounded
        return False
    if "Scan" in cls:  # FileSourceScanExec / BatchScanExec / RowDataSourceScanExec
        return True
    ch = node.children()
    return any(
        _reaches_scan_without_agg(_unwrap_adaptive(ch.apply(i)))
        for i in range(ch.size())
    )


def unpartitioned_fact_window_count(df: DataFrame) -> int:
    """WindowExec nodes with an EMPTY partition spec fed by a datasource
    scan with no intervening aggregation/limit — i.e. a global sort over
    FACT-GRAIN data, which executes as a single task no matter the cluster
    size (Spark logs 'No Partition Defined for Window').  Unpartitioned
    windows over already-aggregated or limited (bounded) inputs are the
    legitimate bounded-rollup case and are NOT counted.  Keeping this at
    zero is the no-one-task-sort invariant from VERDICT r5 item 3."""

    reaches_scan_without_agg = _reaches_scan_without_agg
    bad = 0

    def walk(node) -> None:
        nonlocal bad
        cls = node.getClass().getSimpleName()
        if cls in ("WindowExec", "WindowInPandasExec") and node.partitionSpec().size() == 0:
            ch = node.children()
            if any(
                reaches_scan_without_agg(_unwrap_adaptive(ch.apply(i)))
                for i in range(ch.size())
            ):
                bad += 1
        ch = node.children()
        for i in range(ch.size()):
            walk(_unwrap_adaptive(ch.apply(i)))

    walk(_unwrap_adaptive(df._jdf.queryExecution().executedPlan()))
    return bad


def fact_cartesian_count(df: DataFrame) -> int:
    """CartesianProductExec / BroadcastNestedLoopJoinExec nodes where BOTH
    sides reach a datasource scan with no intervening aggregation/limit —
    i.e. a genuinely quadratic fact-by-fact product.  Scalar binds (a
    broadcast 1-row aggregate or a bounded plan table crossed onto a fact)
    have an aggregate/LocalRelation on one side and are NOT counted.
    Keeping this at zero registry-wide pins the claim that every crossJoin
    in the engine is a bounded broadcast bind."""

    reaches_scan_without_agg = _reaches_scan_without_agg
    bad = 0

    def walk(node) -> None:
        nonlocal bad
        cls = node.getClass().getSimpleName()
        if cls in ("CartesianProductExec", "BroadcastNestedLoopJoinExec"):
            ch = node.children()
            if ch.size() == 2 and all(
                reaches_scan_without_agg(_unwrap_adaptive(ch.apply(i))) for i in range(2)
            ):
                bad += 1
        ch = node.children()
        for i in range(ch.size()):
            walk(_unwrap_adaptive(ch.apply(i)))

    walk(_unwrap_adaptive(df._jdf.queryExecution().executedPlan()))
    return bad


def unbounded_single_partition_exchanges(df: DataFrame) -> list[str]:
    """``Exchange SinglePartition`` nodes whose input reaches a datasource
    scan with no intervening aggregation / limit / group-limit — i.e. an
    ALL-DATA one-task barrier (the sibling class of the unpartitioned
    window: every row funnels through a single reducer no matter the
    cluster size).  Bounded feeds are NOT counted: a global-aggregate
    final stage receives one partial row per map task, a GlobalLimit
    receives <= k rows per task from its LocalLimit, a WindowGroupLimit
    bounds each group map-side.  Returns one describing string per
    offending exchange (its immediate child node class) so audits can
    report WHERE the barrier sits; len() == the invariant count.

    Registry-wide scan methodology from round 15 (WindowGroupLimit scan,
    VERDICT r15 item 3)."""
    out: list[str] = []

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "ShuffleExchangeExec" and "SinglePartition" in str(
            node.outputPartitioning()
        ):
            ch = node.children()
            for i in range(ch.size()):
                child = _unwrap_adaptive(ch.apply(i))
                if _reaches_scan_without_agg(child):
                    out.append(child.getClass().getSimpleName())
        ch = node.children()
        for i in range(ch.size()):
            walk(_unwrap_adaptive(ch.apply(i)))

    walk(_unwrap_adaptive(df._jdf.queryExecution().executedPlan()))
    return out


#: aggregate functions whose buffer COLLECTS values (size ~ input, or
#: ~ distinct values) rather than a fixed-size state — the unbounded-
#: global-buffer invariant's target set.  Sketches (approx_percentile,
#: hll, count-min, kmv) keep fixed-size state and are the designed scale
#: path; they are deliberately absent.
_BUFFER_AGG_FNS = (
    "percentile(",
    "percentile_disc(",
    "median(",
    "mode(",
    "collect_list(",
    "collect_set(",
    "listagg(",
    "array_agg(",
)


def unbounded_global_buffer_aggregates(df: DataFrame) -> list[str]:
    """GLOBAL (ungrouped) aggregate nodes whose functions buffer values
    (exact percentiles, collect_*, listagg, mode) over fact-grain input.

    The single-partition invariant walks past these — a global agg's
    exchange carries one ROW per map task — but for value-collecting
    functions that one row holds the task's entire column slice, and the
    lone final reducer merges ~the whole column in memory: an OOM at
    100 TB, not a slow query.  Grouped variants distribute by key and
    are fine; bounded inputs (dims, post-limit, post-aggregate) are
    fine.  Only the PARTIAL (scan-adjacent) half of a two-phase global
    agg can trip this — the final half sees its partial child as a
    bound — so each offending aggregate is flagged exactly once.
    Returns the matched function names, one entry per offending node.

    Round-16 registry scan (scripts/scan_udf_buffers.py) findings: 4
    hits — two rewritten onto scale.global_order_stats (the bookmark
    high-water mark, the range-layout boundaries), two allowlisted at
    the time.  Round 17 rewrote the remaining two as well
    (agg_quantile_sketch's exact certification percentiles onto
    scale.global_order_stats; profile_table's median onto a
    bounded-domain value histogram), so the registry-wide count is now
    ZERO and the plan_audit allowlist carries no buffer_agg entries."""
    out: list[str] = []

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls in (
            "HashAggregateExec",
            "ObjectHashAggregateExec",
            "SortAggregateExec",
        ):
            try:
                n_keys = node.groupingExpressions().size()
                fns = node.aggregateExpressions().toString()
            except Exception:
                n_keys, fns = -1, ""
            if n_keys == 0 and any(f in fns for f in _BUFFER_AGG_FNS):
                ch = node.children()
                if any(
                    _reaches_scan_without_agg(_unwrap_adaptive(ch.apply(i)))
                    for i in range(ch.size())
                ):
                    out.append(
                        "+".join(
                            f.rstrip("(") for f in _BUFFER_AGG_FNS if f in fns
                        )
                    )
        ch = node.children()
        for i in range(ch.size()):
            walk(_unwrap_adaptive(ch.apply(i)))

    walk(_unwrap_adaptive(df._jdf.queryExecution().executedPlan()))
    return out


def batch_eval_python_count(df: DataFrame) -> int:
    """Row-at-a-time Python eval nodes (``BatchEvalPython`` /
    ``BatchEvalPythonUDTF``): every row crosses the JVM/Python boundary
    through pickle individually, ~10-100x slower than the Arrow-batched
    paths (``ArrowEvalPython``, ``MapInArrow``, pandas_udf family — none
    of which match this substring).  Zero registry-wide since r16
    (Python UDTFs ride ``spark.sql.execution.pythonUDTF.arrow.enabled``,
    session.py)."""
    return count_occurrences(df, "BatchEvalPython")


def is_cache_substituted(df: DataFrame) -> bool:
    """True if the CacheManager substituted a cached plan into this
    DataFrame (an ``InMemoryTableScan`` in the executed plan).

    The audit contract for ``dedup.audit_subplans`` is that its plans are
    UN-fenced: if a canonically-equal registry query was persist()ed
    first, ``withCachedData`` collapses the candidate/verify subtrees to
    a single InMemoryTableScan at executedPlan time and any invariant
    check passes vacuously.  Every consumer of pre-barrier plans must
    call this at INSPECTION time (substitution happens when the executed
    plan is computed, not when the DataFrame is built — so the guard
    cannot live inside audit_subplans itself)."""
    return "InMemoryTableScan" in physical_plan(df)


def final_plan_tree(df: DataFrame) -> str:
    """The node-tree text of the plan that actually runs.

    Before execution this is simply the formatted tree.  AFTER execution
    under AQE (``isFinalPlan=true``) both ``executedPlan().toString()``
    and the formatted output repeat every node in an ``== Initial Plan
    ==`` section — substring-counting helpers like ``exchange_count`` /
    ``broadcast_join_count`` would roughly double-count there (today's
    tests only inspect unexecuted plans, where no such section exists).
    Use this to scope node counting on executed plans."""
    import re

    plan = formatted_plan(df)
    m = re.search(r"== Final Plan ==(.*?)== Initial Plan ==", plan, re.S)
    return m.group(1) if m else plan.split("\n\n", 1)[0]
