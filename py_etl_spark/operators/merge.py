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


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    tracked: list[str],
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Build a full SCD Type-2 history from a change log.

    SCD1 (:func:`scd1_merge`) keeps only the latest value per key; SCD2
    keeps every distinct value with its validity interval — the standard
    warehouse shape for "what did this attribute say at time T?".

    Per key (ordered by ``ts_col`` then ``tie_breakers`` for determinism
    under duplicate timestamps):

    - consecutive rows whose ``tracked`` columns all match (null-safely)
      are no-op updates and collapse into the open interval (the same
      suppression the reference applies per-record, etl.py:1017-1018);
    - each surviving row opens an interval at its own timestamp and
      closes at the NEXT survivor's (``valid_to`` null = still current).

    Output: keys + tracked + ``(version, valid_from, valid_to,
    is_current)``.

    Plan: both windows partition by ``keys`` with the same ordering, and
    the no-op filter between them preserves distribution and sort order —
    Spark plans ONE exchange + sort for the whole history build. At
    100 TB this is the minimum: interval assignment is inherently a
    per-key ordered pass.
    """
    from pyspark.sql import Window as W

    ties = list(tie_breakers or [])
    w = W.partitionBy(*keys).orderBy(ts_col, *ties)
    prev_marker = F.lag(F.lit(1)).over(w)
    changed = prev_marker.isNull()
    for t in tracked:
        changed = changed | _is_distinct(F.col(t), F.lag(t).over(w))
    survivors = changes.select(
        *keys, ts_col, *ties, *tracked
    ).withColumn("__chg", changed).filter("__chg").drop("__chg")
    w2 = W.partitionBy(*keys).orderBy(ts_col, *ties)
    return survivors.select(
        *keys,
        *tracked,
        F.row_number().over(w2).cast("long").alias("version"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    keys: list[str],
    ts_col: str,
    tracked: list[str],
) -> DataFrame:
    """Apply one change batch (≤1 row per key — pre-reduce with
    last-writer-wins upstream) to an existing SCD2 history.

    Matched keys whose tracked values changed close their open interval at
    the batch timestamp and gain a new current row (version + 1); unseen
    keys insert version 1; no-op rows and closed history pass through
    untouched. Incremental equivalence with :func:`scd2_history` over the
    concatenated log is asserted in tests.

    Plan: one key-partitioned join against ONLY the ``is_current`` slice;
    closed intervals are never reshuffled — at 100 TB the write rewrites
    the thin current partition, not the whole history.
    """
    cur = history.filter(F.col("is_current")).alias("s")
    closed = history.filter(~F.col("is_current"))
    b = batch.select(
        *keys, F.col(ts_col).alias("__bts"), *[F.col(t).alias(f"__b_{t}") for t in tracked]
    ).alias("c")
    j = cur.join(b, keys, "full_outer")
    in_b = F.col("__bts").isNotNull()
    in_s = F.col("valid_from").isNotNull()
    diff = F.lit(False)
    for t in tracked:
        diff = diff | _is_distinct(F.col(f"s.{t}"), F.col(f"__b_{t}"))
    change = in_b & (~in_s | diff)

    # surviving old rows: untouched when no change; closed out when changed
    old = j.filter(in_s).select(
        *keys,
        *[F.col(f"s.{t}").alias(t) for t in tracked],
        F.col("version"),
        F.col("valid_from"),
        F.when(change, F.col("__bts")).otherwise(F.col("valid_to")).alias("valid_to"),
        F.when(change, F.lit(False)).otherwise(F.col("is_current")).alias("is_current"),
    )
    new = j.filter(change).select(
        *keys,
        *[F.col(f"__b_{t}").alias(t) for t in tracked],
        (F.coalesce(F.col("version"), F.lit(0)) + 1).cast("long").alias("version"),
        F.col("__bts").alias("valid_from"),
        F.lit(None).cast(history.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    out_cols = closed.columns
    return (
        closed.select(*out_cols)
        .unionByName(old.select(*out_cols))
        .unionByName(new.select(*out_cols))
    )


def scd2_point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    fact_ts: str,
    prefix: str = "pit_",
) -> DataFrame:
    """Point-in-time-correct dimension join — THE leakage-safe feature
    join for training data: each fact row picks up the SCD2 attribute
    values that were valid AT its own timestamp (``valid_from ≤ t <
    valid_to``, open interval = still current), never the later state a
    naive latest-value join would leak. Facts before a key's first
    interval keep NULL features (left join) — "the feature did not
    exist yet" is itself the correct training signal.

    No window needed: a key's intervals partition its timeline, so at
    most ONE history row matches each fact — the join IS the argmax.
    Plan: key equi-join (hash-partitioned both sides; the interval
    bounds ride along as residual predicates), output ∝ facts. History
    columns come back ``prefix``-renamed to keep fact columns collision-
    free.
    """
    h = history
    for c in h.columns:
        if c not in keys:
            h = h.withColumnRenamed(c, prefix + c)
    # explicit aliases: facts and history often derive from the SAME
    # source table (state-from-events), where bare column references
    # resolve ambiguously and a drop() can strip the wrong side's key
    f, h = facts.alias("__pit_f"), h.alias("__pit_h")
    t = F.col("__pit_f." + fact_ts)
    cond = None
    for k in keys:
        e = F.col("__pit_f." + k) == F.col("__pit_h." + k)
        cond = e if cond is None else cond & e
    cond = (
        cond
        & (F.col("__pit_h." + prefix + "valid_from") <= t)
        & (
            F.col("__pit_h." + prefix + "valid_to").isNull()
            | (t < F.col("__pit_h." + prefix + "valid_to"))
        )
    )
    out_cols = [F.col("__pit_f." + c) for c in facts.columns] + [
        F.col("__pit_h." + c)
        for c in h.columns
        if c.startswith(prefix)
    ]
    return f.join(h, cond, "left").select(*out_cols)
