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
