"""Join-based MERGE kernel for keyed Parquet state.

The reference applies per-record add/modify/delete verbs against its target
store one network round-trip at a time (/root/reference/etl.py:1028-1105,
466-523). Here a whole batch becomes ONE full-outer join:

    state ⟗ changes  →  per-column coalesce  →  rewritten state

Branches (SURVEY.md §2.3 J1, §2.9 ST5/ST8/ST10):
  - matched + op=upsert   → column-wise replace; no-op suppression (a row
    with zero real diffs keeps its old timestamps — etl.py:1017-1018)
  - matched + op=delete   → tombstone (idnDeleted-style flag + forced
    columns) or hard delete, per policy
  - change-only           → insert
  - state-only            → keep (snapshot mode optionally deletes these —
    reconciliation semantics, etl.py:900-914)
  - resurrection          → matched upsert clears the tombstone flag

Scale posture: the state table is partitioned by ``instance`` and the join
keys are the bucket keys, so at 100 TB the merge is a partition-pruned
sort-merge join whose shuffle both AQE and bucketing can elide; Parquet has
no in-place update, so each merge rewrites only the partitions that
received changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OP_COL = "__op"
OP_UPSERT = "upsert"
OP_DELETE = "delete"


@dataclass
class MergePolicy:
    """How deletes and timestamps behave during a merge."""

    # Soft-delete: set ``tombstone_col`` to ``tombstone_value`` instead of
    # removing the row (reference ST5). None → hard delete.
    tombstone_col: str | None = None
    tombstone_value: str = "TRUE"
    # Columns forced to fixed values on tombstone (acc_status → GESPERRT,
    # acc_active → 'N  ' in the reference, etl.py:492-517).
    tombstone_overrides: dict[str, str] = field(default_factory=dict)
    # Timestamp column stamped (with ``stamp_value``) only when a row
    # actually changed — no-op suppression keeps old stamps.
    stamp_col: str | None = None
    stamp_value: str | None = None
    # Snapshot mode: state rows absent from ``changes`` are deleted
    # (full reconciliation, J1) instead of kept (CDC mode).
    snapshot: bool = False


def _is_distinct(a: Column, b: Column) -> Column:
    """NULL-safe inequality (IS DISTINCT FROM)."""
    return ~a.eqNullSafe(b)


def scd1_merge(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    policy: MergePolicy | None = None,
    op_col: str = OP_COL,
) -> DataFrame:
    """Apply a change batch to keyed state; returns the new state.

    ``changes`` carries the state's value columns plus ``op_col`` ∈
    {'upsert', 'delete'}. Rows are matched on ``keys``; duplicate keys are
    legal on both sides (reference ST12) — every matched combination is
    updated, mirroring the reference's "all entries for a uid are synced".
    """
    policy = policy or MergePolicy()
    value_cols = [c for c in state.columns if c not in keys]
    # Presence flags that survive the outer join even when all value
    # columns are null: tag each side before joining.
    s = state.withColumn("__in_s", F.lit(True)).alias("s")
    c = changes.withColumn("__in_c", F.lit(True)).alias("c")
    joined = s.join(c, keys, "full_outer")
    in_s = F.col("s.__in_s").isNotNull() & F.col("s.__in_s")
    in_c = F.col("c.__in_c").isNotNull() & F.col("c.__in_c")
    is_delete = in_c & (F.col(f"c.{op_col}") == OP_DELETE)
    is_upsert = in_c & (F.col(f"c.{op_col}") == OP_UPSERT)

    # Row-level diff: any value column IS DISTINCT FROM the incoming value.
    common_vals = [v for v in value_cols if v in changes.columns]
    any_diff = F.lit(False)
    for v in common_vals:
        any_diff = any_diff | _is_distinct(F.col(f"s.{v}"), F.col(f"c.{v}"))

    out_cols: list[Column] = [F.col(k).alias(k) for k in keys]
    for v in value_cols:
        sv = F.col(f"s.{v}")
        cv = F.col(f"c.{v}") if v in changes.columns else sv
        expr = F.when(is_upsert, cv).otherwise(sv)
        if policy.tombstone_col and v == policy.tombstone_col:
            expr = (
                F.when(is_delete, F.lit(policy.tombstone_value))
                .when(is_upsert & in_s, F.lit(None))  # resurrection (ST10)
                .otherwise(expr)
            )
        elif policy.tombstone_col and v in policy.tombstone_overrides:
            expr = F.when(is_delete, F.lit(policy.tombstone_overrides[v])).otherwise(expr)
        if policy.stamp_col and v == policy.stamp_col:
            expr = F.when(
                (is_upsert & (any_diff | ~in_s)) | is_delete,
                F.lit(policy.stamp_value),
            ).otherwise(sv)
        out_cols.append(expr.alias(v))

    merged = joined.select(*out_cols, in_s.alias("__in_s2"), in_c.alias("__in_c2"),
                           is_delete.alias("__del"))

    keep = F.lit(True)
    if policy.tombstone_col is None:
        keep = keep & ~F.col("__del")  # hard delete
    if policy.snapshot:
        # Reconciliation: rows only in state disappear (unless tombstoning).
        if policy.tombstone_col is None:
            keep = keep & F.col("__in_c2")
    return merged.filter(keep).drop("__in_s2", "__in_c2", "__del")


def garbage_collect(
    state: DataFrame,
    tombstone_col: str,
    synced_col: str,
    synced_value: str = "0",
) -> DataFrame:
    """Physically drop tombstoned rows already acked downstream
    (reference ST6: idnSyncDiff=0 AND idnDeleted present → delete)."""
    return state.filter(
        ~(F.col(tombstone_col).isNotNull() & (F.col(synced_col) == synced_value))
    )
