"""Structured-Streaming CDC driver smoke (ST1/ST2/ST13)."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from py_etl_spark.functions.crypto import FIXED_TEST_IV_HEX
from py_etl_spark.operators.compare import bootstrap_tree
from py_etl_spark.operators.refsync import (
    SyncConfig,
    sync_users_into_state,
    users_to_entries,
)
from py_etl_spark.sources import read_users_csv
from py_etl_spark.streaming.stream import CdcStreamDriver, watermark_windowed_counts

TD = "/root/reference/testdata"


def test_cdc_file_stream_applies_batch(spark):
    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240101000000Z")
    m = lambda df: spark.createDataFrame(df.collect(), df.schema)  # noqa: E731
    state = bootstrap_tree(spark, ["ph08", "ph15"], ["ph08", "ph15"])
    users = m(read_users_csv(spark, f"{TD}/initial_data.csv"))
    for inst in ("ph08", "ph15"):
        state = m(
            sync_users_into_state(
                state, users_to_entries(users, inst), inst, cfg, snapshot=True
            )[0]
        )

    tmp = tempfile.mkdtemp()
    state_path = os.path.join(tmp, "state")
    events_dir = os.path.join(tmp, "events")
    os.makedirs(events_dir)
    state.write.mode("overwrite").partitionBy("instance").parquet(state_path)
    shutil.copy(f"{TD}/eventlog01.csv", events_dir + "/batch1.csv")

    hb = os.path.join(tmp, "liveness")
    drv = CdcStreamDriver(spark, users, state_path, "ph08", cfg, heartbeat_path=hb)
    q = drv.run_file_stream(events_dir, checkpoint=os.path.join(tmp, "ckpt"))
    q.awaitTermination(300)
    assert q.exception() is None
    assert drv.batches == 1
    assert json.load(open(hb))["batches"] == 1
    # eventlog01 targets uid 4714 — its etlTimestamp moved in ph08
    post = spark.read.parquet(state_path)
    row = post.filter(
        (F.col("phonlineUniqueId") == "4714") & (F.col("instance") == "ph08")
    ).first()
    assert row is not None and row.etlTimestamp.endswith("0000Z")
    # statuses recorded S for the processed events
    assert all(s.status == "S" for batch in drv.statuses for s in batch)


def test_check_liveness_staleness_bound():
    import time

    from py_etl_spark.streaming.stream import check_liveness

    p = tempfile.mktemp()
    assert check_liveness(p) is False  # missing heartbeat = dead
    with open(p, "w") as f:
        f.write("x")
    assert check_liveness(p) is True
    os.utime(p, (time.time() - 700, time.time() - 700))
    assert check_liveness(p) is False        # 700s > 2·20 + 600
    assert check_liveness(p, grace_s=1000) is True


def test_watermark_windowed_counts_batch_equivalence(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00"), (2, "2024-01-01 00:40:00"), (3, "2024-01-01 01:10:00")],
        "id long, t string",
    ).select("id", F.to_timestamp("t").alias("event_time"))
    out = {r.window_start.isoformat(): r.n for r in watermark_windowed_counts(ev).collect()}
    assert out == {"2024-01-01T00:00:00": 2, "2024-01-01T01:00:00": 1}
