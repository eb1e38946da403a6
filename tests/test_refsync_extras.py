"""ph15 email propagation, read-only watermark mode, status writeback."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_etl_spark.functions.crypto import FIXED_TEST_IV_HEX
from py_etl_spark.operators.compare import bootstrap_tree
from py_etl_spark.operators.refsync import (
    SyncConfig,
    apply_status_writeback,
    cdc_apply,
    events_after,
    sync_student_emails,
    sync_users_into_state,
    users_to_entries,
    watermark_advance,
)
from py_etl_spark.sources import read_eventlog_csv, read_users_csv

TD = "/root/reference/testdata"


def _m(spark):
    return lambda df: spark.createDataFrame(df.collect(), df.schema)


def _dual_state(spark, users, cfg):
    m = _m(spark)
    state = bootstrap_tree(spark, ["ph08", "ph15"], ["ph08", "ph15"])
    for inst in ("ph08", "ph15"):
        state = m(
            sync_users_into_state(
                state, users_to_entries(users, inst), inst, cfg, snapshot=True
            )[0]
        )
    return state


def test_sync_student_emails_propagates_diffs(spark):
    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX)
    m = _m(spark)
    users = m(read_users_csv(spark, f"{TD}/initial_data.csv"))
    state = _dual_state(spark, users, cfg)
    # skew one ph15 email so there's a diff to propagate
    state = m(
        state.withColumn(
            "phonlineEmailStudent",
            F.when(
                (F.col("instance") == "ph15") & (F.col("cn") == "caesar1"),
                "stale@old.example",
            ).otherwise(F.col("phonlineEmailStudent")),
        )
    )
    out = m(sync_student_emails(state, "ph08"))
    row = out.filter(
        (F.col("instance") == "ph15") & (F.col("cn") == "caesar1")
    ).first()
    assert row.phonlineEmailStudent == "caesar1@gmail.com"  # propagated
    # inactive students / entries without email are untouched
    diff = out.subtract(state)
    assert diff.count() == 1


def test_readonly_watermark_mode(spark):
    ev = read_eventlog_csv(spark, f"{TD}/eventlog01.csv")
    wm0 = None
    batch = events_after(ev, wm0)
    assert batch.count() == ev.count()
    wm1 = watermark_advance(batch, wm0)
    assert wm1 is not None
    # nothing new after the watermark
    assert events_after(ev, wm1).count() == 0
    # empty batch leaves the watermark unchanged
    assert watermark_advance(events_after(ev, wm1), wm1) == wm1


def test_status_writeback_and_poison_pill(spark):
    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240105000000Z")
    m = _m(spark)
    users = m(read_users_csv(spark, f"{TD}/initial_data.csv"))
    state = _dual_state(spark, users, cfg)
    ev = m(read_eventlog_csv(spark, f"{TD}/eventlog01.csv"))
    _, statuses = cdc_apply(state, users, ev, "ph08", cfg, materialize=m)
    back = m(apply_status_writeback(ev, statuses))
    done = back.collect()
    assert all(r.status == "S  " for r in done)          # CHAR(3) padded ack
    assert all(r.read_time is not None for r in done)

    # retry accounting: an E status increments attempt; attempt>10 → F
    e_status = statuses.withColumn("status", F.lit("E"))
    ev_hot = ev.withColumn("attempt", F.lit(11.0))
    esc = m(apply_status_writeback(ev_hot, e_status)).first()
    assert esc.status == "F  " and esc.attempt == 12.0
    norm = m(apply_status_writeback(ev, e_status)).first()
    assert norm.status == "E  " and norm.attempt == ev.first().attempt + 1
