"""Merge-kernel semantics (SURVEY.md §2.3 J1, §2.9 ST5/ST6/ST8/ST10/ST12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_etl_spark.operators.merge import (
    OP_COL,
    OP_DELETE,
    OP_UPSERT,
    MergePolicy,
    garbage_collect,
    scd1_merge,
)

STATE_SCHEMA = "k long, name string, flag string, deleted string, stamp string"
CHANGE_SCHEMA = f"k long, name string, flag string, deleted string, stamp string, {OP_COL} string"


def _state(spark, rows):
    return spark.createDataFrame(rows, STATE_SCHEMA)


def _changes(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _by_key(df):
    return {tuple(r[0:1]): r.asDict() for r in df.collect()}


def test_upsert_insert_delete_keep(spark):
    state = _state(
        spark,
        [(1, "a", "x", None, None), (2, "b", "x", None, None), (3, "c", "x", None, None)],
    )
    changes = _changes(
        spark,
        [
            (1, "a2", "x", None, None, OP_UPSERT),   # update
            (3, None, None, None, None, OP_DELETE),  # delete
            (4, "d", "y", None, None, OP_UPSERT),    # insert
        ],
    )
    out = _by_key(scd1_merge(state, changes, ["k"]))
    assert set(out) == {(1,), (2,), (4,)}  # 3 hard-deleted, 2 kept
    assert out[(1,)]["name"] == "a2"
    assert out[(2,)]["name"] == "b"
    assert out[(4,)]["name"] == "d"


def test_tombstone_and_resurrection(spark):
    policy = MergePolicy(
        tombstone_col="deleted",
        tombstone_overrides={"flag": "GESPERRT"},
        stamp_col="stamp",
        stamp_value="T1",
    )
    state = _state(spark, [(1, "a", "OK", None, None), (2, "b", "OK", "TRUE", "T0")])
    changes = _changes(
        spark,
        [
            (1, None, None, None, None, OP_DELETE),   # tombstone, not removed
            (2, "b2", "OK", None, None, OP_UPSERT),   # resurrection clears flag
        ],
    )
    out = _by_key(scd1_merge(state, changes, ["k"], policy))
    assert set(out) == {(1,), (2,)}
    assert out[(1,)]["deleted"] == "TRUE"
    assert out[(1,)]["flag"] == "GESPERRT"       # forced on tombstone
    assert out[(1,)]["stamp"] == "T1"            # delete stamps
    assert out[(2,)]["deleted"] is None          # resurrected
    assert out[(2,)]["name"] == "b2"


def test_noop_suppression_keeps_stamp(spark):
    policy = MergePolicy(stamp_col="stamp", stamp_value="T9")
    state = _state(spark, [(1, "a", "x", None, "T0"), (2, "b", "x", None, "T0")])
    changes = _changes(
        spark,
        [
            (1, "a", "x", None, "T0", OP_UPSERT),   # identical → no-op
            (2, "B", "x", None, "T0", OP_UPSERT),   # real diff → stamp
        ],
    )
    out = _by_key(scd1_merge(state, changes, ["k"], policy))
    assert out[(1,)]["stamp"] == "T0"  # unchanged row keeps old stamp
    assert out[(2,)]["stamp"] == "T9"


def test_duplicate_keys_both_updated(spark):
    """uid is not unique by design (ST12): all rows for a key are synced."""
    state = _state(spark, [(1, "a", "x", None, None), (1, "a'", "y", None, None)])
    changes = _changes(spark, [(1, "z", "z", None, None, OP_UPSERT)])
    rows = scd1_merge(state, changes, ["k"]).collect()
    assert len(rows) == 2
    assert all(r.name == "z" for r in rows)


def test_snapshot_mode_deletes_unmatched_state(spark):
    state = _state(spark, [(1, "a", "x", None, None), (2, "b", "x", None, None)])
    changes = _changes(spark, [(1, "a", "x", None, None, OP_UPSERT)])
    out = _by_key(
        scd1_merge(state, changes, ["k"], MergePolicy(snapshot=True))
    )
    assert set(out) == {(1,)}


def test_garbage_collect(spark):
    state = spark.createDataFrame(
        [(1, "TRUE", "0"), (2, "TRUE", "1"), (3, None, "0")],
        "k long, deleted string, synced string",
    )
    out = garbage_collect(state, "deleted", "synced", "0")
    assert {r.k for r in out.collect()} == {2, 3}


def test_scd2_history_intervals_and_noop_suppression(spark):
    from datetime import datetime

    from py_etl_spark.operators.merge import scd2_history

    t = lambda s: datetime.fromisoformat(s)
    log = spark.createDataFrame(
        [
            (1, t("2024-01-01T00:00:00"), "bronze", 10),
            (1, t("2024-01-02T00:00:00"), "bronze", 11),  # no-op → collapses
            (1, t("2024-01-03T00:00:00"), "silver", 12),
            (1, t("2024-01-04T00:00:00"), "gold", 13),
            (2, t("2024-01-05T00:00:00"), "bronze", 14),
        ],
        "user_id long, ts timestamp, tier string, event_id long",
    )
    hist = scd2_history(
        log, keys=["user_id"], ts_col="ts", tracked=["tier"],
        tie_breakers=["event_id"],
    ).collect()
    u1 = sorted([r for r in hist if r.user_id == 1], key=lambda r: r.version)
    assert [r.tier for r in u1] == ["bronze", "silver", "gold"]
    assert u1[0].valid_from == t("2024-01-01T00:00:00")  # no-op kept old open
    assert u1[0].valid_to == t("2024-01-03T00:00:00")
    assert u1[1].valid_to == t("2024-01-04T00:00:00")
    assert u1[2].valid_to is None and u1[2].is_current
    assert [r.is_current for r in u1] == [False, False, True]
    (u2,) = [r for r in hist if r.user_id == 2]
    assert u2.version == 1 and u2.is_current


def test_scd2_apply_equals_full_rebuild(spark):
    from datetime import datetime

    from py_etl_spark.operators.merge import scd2_apply, scd2_history

    t = lambda s: datetime.fromisoformat(s)
    schema = "user_id long, ts timestamp, tier string, event_id long"
    log1 = [
        (1, t("2024-01-01T00:00:00"), "bronze", 1),
        (1, t("2024-01-03T00:00:00"), "silver", 2),
        (2, t("2024-01-02T00:00:00"), "bronze", 3),
    ]
    # batch: one row per key — key 1 changes, key 2 no-ops, key 3 is new
    log2 = [
        (1, t("2024-02-01T00:00:00"), "gold", 4),
        (2, t("2024-02-01T00:00:00"), "bronze", 5),
        (3, t("2024-02-01T00:00:00"), "bronze", 6),
    ]
    kw = dict(keys=["user_id"], ts_col="ts", tracked=["tier"])
    base = scd2_history(spark.createDataFrame(log1, schema),
                        tie_breakers=["event_id"], **kw)
    applied = scd2_apply(base, spark.createDataFrame(log2, schema), **kw)
    rebuilt = scd2_history(spark.createDataFrame(log1 + log2, schema),
                           tie_breakers=["event_id"], **kw)
    cols = ["user_id", "tier", "version", "valid_from", "valid_to", "is_current"]
    assert sorted(map(tuple, applied.select(*cols).collect())) == sorted(
        map(tuple, rebuilt.select(*cols).collect())
    )
