"""Merge/upsert: the incremental-load upgrade to the reference's
WRITE_TRUNCATE (``/root/reference/app/bq-importer/main.py:29``).

The reference reloads every table wholesale each run.  At 100 TB you merge
the day's delta instead: ``upsert`` emulates MERGE INTO without a
table-format dependency (Delta/Iceberg jars aren't in this image) as
``updates ∪ (target ⟂ updates)`` — one anti join + union, both shuffling
only on the key.  ``scd2_apply`` layers validity intervals on top (slowly
changing dimension type 2): close out the current version of changed keys,
append the new version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE-equivalent: rows from ``updates`` win on key collision, all
    other target rows pass through.  Schemas must match."""
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} vs updates {sorted(updates.columns)}"
        )
    # target and updates often share lineage (delta carved from the same
    # table) — join through explicit plan aliases, not attribute
    # disambiguation (warns "trivially true equals predicate")
    untouched = target.alias("t").join(
        updates.alias("u"), F.col(f"t.{key}") == F.col(f"u.{key}"), "left_anti"
    )
    return untouched.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    effective_col: str,
    current_flag: str = "is_current",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD type-2: for each changed key, close the open version (set
    ``valid_to`` to the change's effective time, drop its current flag) and
    append the change as the new open version."""
    changed_keys = changes.select(F.col(key)).distinct()
    eff = changes.select(
        F.col(key), F.col(effective_col).alias("_new_eff")
    )
    closed = (
        dim.join(F.broadcast(eff), key, "inner")
        .filter(F.col(current_flag))
        .withColumn(valid_to, F.col("_new_eff"))
        .withColumn(current_flag, F.lit(False))
        .drop("_new_eff")
    )
    untouched = dim.join(F.broadcast(changed_keys), key, "left_anti")
    stale_closed = dim.join(F.broadcast(changed_keys), key, "left_semi").filter(
        ~F.col(current_flag)
    )
    new_open = changes.withColumn(current_flag, F.lit(True)).withColumn(
        valid_to, F.lit(None).cast(dim.schema[valid_to].dataType)
    )
    return untouched.unionByName(stale_closed).unionByName(closed).unionByName(new_open)
