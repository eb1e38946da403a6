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
    post = drv.read_state()
    row = post.filter(
        (F.col("phonlineUniqueId") == "4714") & (F.col("instance") == "ph08")
    ).first()
    assert row is not None and row.etlTimestamp.endswith("0000Z")
    # statuses recorded S for the processed events
    assert all(s.status == "S" for batch in drv.statuses for s in batch)


def test_cdc_stream_replay_idempotence_after_crash(spark, tmp_path):
    """Exactly-once STATE effect under foreachBatch's at-least-once
    delivery, both crash windows:

    1. driver killed AFTER the VersionedState data write, BEFORE the
       manifest publish → restart from the same checkpoint replays the
       batch, which must commit exactly ONE version whose content is
       identical to an uninterrupted run (the failed attempt's orphan
       data dir is later swept by GC);
    2. driver killed AFTER the manifest publish, BEFORE the checkpoint
       offset commit → redelivery of the same (lineage, batch_id) must
       be SKIPPED (no new version, no double-apply) — but the same
       batch_id under a DIFFERENT lineage (fresh checkpoint) must not
       be skipped.
    """
    from py_etl_spark.schemas import EVENTLOG_SCHEMA

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

    def make(name):
        root = os.path.join(str(tmp_path), name)
        state_path = os.path.join(root, "state")
        events_dir = os.path.join(root, "events")
        os.makedirs(events_dir)
        state.write.mode("overwrite").partitionBy("instance").parquet(
            state_path
        )
        shutil.copy(f"{TD}/eventlog01.csv", events_dir + "/batch1.csv")
        return state_path, events_dir, os.path.join(root, "ckpt")

    # -- control: uninterrupted run ---------------------------------------
    c_state, c_events, c_ckpt = make("control")
    ctl = CdcStreamDriver(spark, users, c_state, "ph08", cfg)
    q = ctl.run_file_stream(c_events, checkpoint=c_ckpt)
    q.awaitTermination(300)
    control_rows = sorted(map(tuple, ctl.read_state().collect()))

    # -- crash window 1: data written, manifest never published -----------
    s_path, e_dir, ckpt = make("crash")
    drv = CdcStreamDriver(spark, users, s_path, "ph08", cfg)
    v0 = drv.store.current_version()
    orig = drv.store._write_manifest
    armed = {"on": True}

    def dying(version, path, meta):
        if armed["on"]:
            armed["on"] = False
            raise RuntimeError("simulated kill before manifest publish")
        return orig(version, path, meta)

    drv.store._write_manifest = dying
    q = drv.run_file_stream(e_dir, checkpoint=ckpt)
    try:
        q.awaitTermination(300)
    except Exception:
        pass
    assert q.exception() is not None  # the batch died mid-commit
    store_check = CdcStreamDriver(spark, users, s_path, "ph08", cfg).store
    assert store_check.current_version() == v0  # nothing published
    ls = set(os.listdir(s_path))
    orphans = {
        d for d in ls if d.startswith(f"v={v0 + 1}-")
    }
    assert orphans  # the failed attempt's data landed

    # -- restart from the SAME checkpoint: batch replays, commits once ----
    drv2 = CdcStreamDriver(spark, users, s_path, "ph08", cfg)
    q2 = drv2.run_file_stream(e_dir, checkpoint=ckpt)
    q2.awaitTermination(300)
    assert q2.exception() is None
    assert drv2.store.current_version() == v0 + 1
    manifests = os.listdir(os.path.join(s_path, "_manifest"))
    assert len([x for x in manifests if x.endswith(".json")]) == 2
    replay_rows = sorted(map(tuple, drv2.read_state().collect()))
    assert replay_rows == control_rows  # bit-identical to uninterrupted

    # -- crash window 2: manifest published, offsets lost → redelivery ----
    events_df = spark.read.schema(EVENTLOG_SCHEMA).csv(
        e_dir, sep=";", header=True
    )
    from py_etl_spark.streaming.stream import _checkpoint_run_token

    drv3 = CdcStreamDriver(spark, users, s_path, "ph08", cfg)
    # what run_file_stream(checkpoint=ckpt) sets: path + persisted token
    drv3._lineage = f"{ckpt}#{_checkpoint_run_token(ckpt)}"
    drv3.process_batch(events_df, 0)  # same (lineage, batch_id): replayed
    assert drv3.store.current_version() == v0 + 1  # skipped, no new version
    assert drv3.statuses == []  # acks not re-emitted (at-least-once, ST2)
    assert drv3.batches == 1  # liveness still advances
    assert (
        sorted(map(tuple, drv3.read_state().collect())) == control_rows
    )
    # same batch_id under a DIFFERENT lineage = a fresh checkpoint: the
    # guard must NOT skip (batch_id is only meaningful per checkpoint)
    drv3._lineage = ckpt + "-fresh"
    drv3.process_batch(events_df, 0)
    assert drv3.store.current_version() == v0 + 2

    # -- wipe-and-recreate fencing: rm -rf the checkpoint dir against the
    # retained state store. batch_ids restart at 0, which the stored max
    # (batch_id=0 under the OLD run token) would shadow if lineage were
    # keyed on the path alone — the fresh run token forces the new run's
    # batch 0 to APPLY, not silently skip (ADVICE r06).
    old_token = _checkpoint_run_token(ckpt)
    shutil.rmtree(ckpt)
    assert _checkpoint_run_token(ckpt) != old_token
    drv4 = CdcStreamDriver(spark, users, s_path, "ph08", cfg)
    q4 = drv4.run_file_stream(e_dir, checkpoint=ckpt)
    q4.awaitTermination(300)
    assert q4.exception() is None
    assert drv4.store.current_version() == v0 + 3  # applied, not skipped
    # ...while a plain restart (token file intact) still skips replays:
    drv5 = CdcStreamDriver(spark, users, s_path, "ph08", cfg)
    q5 = drv5.run_file_stream(e_dir, checkpoint=ckpt)
    q5.awaitTermination(300)
    assert drv5.store.current_version() == v0 + 3  # no new version

    # -- the crash orphan is GC-swept once its prefix leaves retention ----
    drv3.store.commit(drv3.store.read(), {"gc": True})
    ls_after = set(os.listdir(s_path))
    assert not (orphans & ls_after)


def test_versioned_state_store_commit_gc_and_no_driver_materialization(spark):
    import inspect

    from py_etl_spark.streaming.state_store import VersionedState
    from py_etl_spark.streaming.stream import CdcStreamDriver

    tmp = tempfile.mkdtemp()
    store = VersionedState(spark, os.path.join(tmp, "st"), partition_by=(), keep_versions=2)
    assert not store.exists()
    df = spark.range(5).withColumnRenamed("id", "k")
    v0 = store.commit(df, {"batch_id": 0})
    assert v0 == 0 and store.current_version() == 0
    assert store.read().count() == 5

    # three more commits: GC must keep only the newest 2 versions on disk
    for i in range(1, 4):
        store.commit(spark.range(5 + i).withColumnRenamed("id", "k"), {"batch_id": i})
    assert store.current_version() == 3
    assert store.read().count() == 8
    # data dirs are v=<n>-<token> (writer-unique); GC keeps the newest 2
    vdirs = sorted(d for d in os.listdir(os.path.join(tmp, "st")) if d.startswith("v="))
    assert sorted(int(d[2:].split("-", 1)[0]) for d in vdirs) == [2, 3]

    # the batch kernel must never round-trip state rows through the driver
    src = inspect.getsource(CdcStreamDriver.process_batch)
    assert "new_state.collect" not in src and "createDataFrame" not in src


def test_versioned_state_migrates_legacy_parquet(spark):
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "state")
    df = spark.createDataFrame(
        [("a", "ph08"), ("b", "ph15")], "dn string, instance string"
    )
    df.write.partitionBy("instance").parquet(path)

    users = spark.createDataFrame([("x",)], "cn string")
    drv = CdcStreamDriver(spark, users, path, "ph08")
    assert drv.store.current_version() == 0
    assert {r.dn for r in drv.read_state().collect()} == {"a", "b"}
    # legacy partition dirs were retired; only v=* and _manifest remain
    names = set(os.listdir(path))
    # (dot-files are Hadoop LocalFS checksum shadows — invisible to
    # listStatus, harmless to Spark's partition discovery)
    assert all(
        n.startswith("v=") or n.startswith("_") or n.startswith(".") for n in names
    )


def test_versioned_state_time_travel(spark):
    from py_etl_spark.streaming.state_store import VersionedState

    tmp = tempfile.mkdtemp()
    store = VersionedState(spark, os.path.join(tmp, "st"), partition_by=(), keep_versions=3)
    for i in range(3):
        store.commit(spark.range(10 + i).withColumnRenamed("id", "k"))
    assert store.versions() == [0, 1, 2]
    assert store.read(version=0).count() == 10
    assert store.read(version=2).count() == 12
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        store.read(version=9)


def test_versioned_state_multi_writer_race(spark):
    """Two committers racing for the same version: the manifest
    create-exclusive is the arbiter; the loser retries manifest-only with a
    bumped version pointing at its already-written data dir. Both commits
    land (v=n, v=n+1) and no data is lost."""
    from py_etl_spark.streaming.state_store import VersionedState

    tmp = tempfile.mkdtemp()
    root = os.path.join(tmp, "st")
    a = VersionedState(spark, root, partition_by=(), keep_versions=4)
    b = VersionedState(spark, root, partition_by=(), keep_versions=4)
    a.commit(spark.range(3).withColumnRenamed("id", "k"))  # base v=0

    df_a = spark.range(5).withColumn("w", F.lit("a"))
    df_b = spark.range(7).withColumn("w", F.lit("b"))
    orig = a._write_manifest
    injected = []

    def racing(version, path, meta):
        if not injected:  # B sneaks in and wins this version
            injected.append(b.commit(df_b))
        orig(version, path, meta)

    a._write_manifest = racing
    va = a.commit(df_a)
    assert injected == [1]          # B won v=1 mid-race
    assert va == 2                  # A retried and landed next
    assert a.versions() == [0, 1, 2]
    assert a.read(version=1).count() == 7
    assert {r.w for r in a.read(version=1).collect()} == {"b"}
    assert a.read(version=2).count() == 5
    assert {r.w for r in a.read(version=2).collect()} == {"a"}


def test_versioned_state_multi_race_loser_survives_gc(spark):
    """A writer losing ``keep_versions + 1`` consecutive manifest races must
    still commit with readable data. Each retry re-stamps the loser's data
    dir with the new attempt's version prefix, so a competitor's orphan GC
    (which sweeps ``v=<n>-*`` dirs whose prefix fell behind the oldest
    retained manifest) can never reclaim it mid-race. Before the re-stamp
    fix the dir kept its first attempt's prefix and was swept on the
    competitor's third commit, leaving a manifest pointing at deleted
    data."""
    from py_etl_spark.streaming.state_store import VersionedState

    tmp = tempfile.mkdtemp()
    root = os.path.join(tmp, "st")
    a = VersionedState(spark, root, partition_by=(), keep_versions=2)
    b = VersionedState(spark, root, partition_by=(), keep_versions=2)
    a.commit(spark.range(3).withColumnRenamed("id", "k"))  # base v=0

    df_a = spark.range(5).withColumn("w", F.lit("a"))
    orig = a._write_manifest
    losses = []

    def racing(version, path, meta):
        if len(losses) < 3:  # B wins keep_versions + 1 races in a row
            losses.append(
                b.commit(spark.range(2).withColumn("w", F.lit("b")))
            )
        orig(version, path, meta)

    a._write_manifest = racing
    va = a.commit(df_a)
    assert losses == [1, 2, 3]
    assert va == 4
    got = a.read(version=va)
    assert got.count() == 5
    assert {r.w for r in got.collect()} == {"a"}


def test_spark_sql_surface_matches_dataframe_api(spark):
    from py_etl_spark.schemas import register_star_views
    from tests.conftest import SF_MED

    register_star_views(spark, SF_MED)
    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    ).collect()
    import py_etl_spark.queries as Q

    df_rows = Q.REGISTRY["q1_pricing_summary"].fn(spark, SF_MED).collect()
    sql_map = {(r.l_returnflag, r.l_linestatus): r.sum_qty for r in sql_rows}
    df_map = {(r.l_returnflag, r.l_linestatus): r.sum_qty for r in df_rows}
    assert set(df_map) <= set(sql_map)
    for k, v in df_map.items():
        assert abs(sql_map[k] - v) < 1e-6


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


def test_run_token_race_never_yields_empty(tmp_path):
    """ADVICE r08 (stream.py): the old O_EXCL-open-then-write published
    the token file BEFORE its content existed, so a losing driver could
    read "" and use an empty lineage key. The link-publish fix only ever
    exposes a complete file. Hammer the mint from many threads on a
    shared empty dir: every caller must get the SAME non-empty token,
    exactly one token file must remain, and no tmp files may linger."""
    from concurrent.futures import ThreadPoolExecutor

    from py_etl_spark.streaming.stream import _checkpoint_run_token

    ckpt = str(tmp_path / "ckpt")
    with ThreadPoolExecutor(max_workers=16) as ex:
        toks = list(ex.map(lambda _: _checkpoint_run_token(ckpt), range(64)))
    assert all(toks)  # never empty
    assert len(set(toks)) == 1  # one winner, everyone adopts it
    leftovers = [f for f in os.listdir(ckpt) if f.startswith("_run_token")]
    assert leftovers == ["_run_token"]  # tmp files all unlinked
    # idempotent re-read returns the persisted winner
    assert _checkpoint_run_token(ckpt) == toks[0]


def test_watermark_windowed_counts_batch_equivalence(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00"), (2, "2024-01-01 00:40:00"), (3, "2024-01-01 01:10:00")],
        "id long, t string",
    ).select("id", F.to_timestamp("t").alias("event_time"))
    out = {r.window_start.isoformat(): r.n for r in watermark_windowed_counts(ev).collect()}
    assert out == {"2024-01-01T00:00:00": 2, "2024-01-01T01:00:00": 1}


def test_watermark_drops_late_data_in_true_streaming(spark, tmp_path):
    """The ACTUAL Structured Streaming watermark semantics (ST3), not
    the batch replay: three availableNow micro-batch runs against one
    checkpoint. After batch 1 the watermark is max_event - 10 min =
    00:50; batch 2 carries an event at 00:02 (behind the watermark —
    its already-closed window MUST NOT change), one at 00:55 (within
    tolerance — accepted), and one at 02:00 (advances the watermark so
    earlier windows emit). Append mode only emits a window once the
    watermark passes its end, so the 03:00 flush event's own window
    never appears — also asserted."""
    import json as _json

    ind, outd, ck = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    ind.mkdir()

    def feed(name, rows):
        (ind / f"{name}.json").write_text(
            "\n".join(_json.dumps(r) for r in rows) + "\n"
        )

    def run_once():
        q = (
            watermark_windowed_counts(
                spark.readStream.schema("id long, t string")
                .json(str(ind))
                .select("id", F.to_timestamp("t").alias("event_time")),
                delay="10 minutes",
                window="10 minutes",
            )
            .writeStream.format("parquet")
            .option("path", str(outd))
            .option("checkpointLocation", str(ck))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    feed("b1", [{"id": 1, "t": "2024-01-01 00:05:00"},
                {"id": 2, "t": "2024-01-01 01:00:00"}])
    run_once()
    feed("b2", [{"id": 3, "t": "2024-01-01 00:02:00"},   # LATE: dropped
                {"id": 4, "t": "2024-01-01 00:55:00"},   # in tolerance
                {"id": 5, "t": "2024-01-01 02:00:00"}])
    run_once()
    feed("b3", [{"id": 6, "t": "2024-01-01 03:00:00"}])  # flush
    run_once()

    got = {
        r.window_start.isoformat(): r.n
        for r in spark.read.parquet(str(outd)).collect()
    }
    assert got == {
        "2024-01-01T00:00:00": 1,  # late id=3 NOT counted (would be 2)
        "2024-01-01T00:50:00": 1,  # in-tolerance id=4 accepted
        "2024-01-01T01:00:00": 1,
        "2024-01-01T02:00:00": 1,
        # 03:00 window absent: watermark has not passed its end
    }

def test_streaming_sessionize_matches_batch_query(spark):
    """Stream-vs-batch parity for gap sessionization: the stateful
    applyInPandasWithState operator must emit exactly the sessions the
    DuckDB-oracle-checked batch window query derives, with state carried
    across micro-batches (events and the closing sentinels arrive in
    separate triggers)."""
    import time as _time

    from py_etl_spark.schemas import load_table
    from py_etl_spark.streaming.sessionize import sessionize_stream
    from tests.conftest import SF_SMALL

    events = load_table(spark, SF_SMALL, "events").select("user_id", "ts", "event_id")
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "src")
    events.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    # One far-future sentinel per user: its gap closes each user's final
    # session through the normal data path (no wall-clock dependence).
    # All sentinels share ONE timestamp (global max + 2 days): the final
    # watermark then equals that instant, so no sentinel session's own
    # timeout (sentinel + gap) is ever crossed and none is emitted.
    global_max = events.agg(F.max("ts")).first()[0]
    sentinels = (
        events.select("user_id")
        .distinct()
        .withColumn("ts", F.lit(global_max) + F.expr("INTERVAL 2 DAYS"))
        .withColumn("event_id", F.lit(-1).cast("long"))
        .select("user_id", "ts", "event_id")
    )
    _time.sleep(1.1)  # file source orders triggers by mtime: sentinels last
    sentinels.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None

    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start_ms)
        for r in spark.table("sess_out").collect()
    }
    import py_etl_spark.queries as Q

    want = {
        (r.user_id, r.session_id): (r.n_events, r.session_start_ms)
        for r in Q.REGISTRY["sessionize_events"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_streaming_sessionize_checkpoint_restart(spark):
    """ST1/ST13 end-to-end: kill the sessionizing query after batch 1,
    start a NEW query from the same checkpointLocation, and assert the
    restored state store (open sessions + watermark) carries across the
    restart — the final output must equal the batch oracle query exactly,
    which is only possible if no open-session state was lost between the
    two query incarnations."""
    from py_etl_spark.schemas import load_table
    from py_etl_spark.streaming.sessionize import sessionize_stream
    from tests.conftest import SF_SMALL

    events = load_table(spark, SF_SMALL, "events").select("user_id", "ts", "event_id")
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "src")
    out = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    events.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))

    def run_once():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        q = (
            sessionize_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None

    # incarnation 1: events only — open sessions stay in the state store,
    # which the availableNow termination persists to the checkpoint
    run_once()

    # between incarnations: the closing sentinels arrive (same construction
    # as the parity test: one shared far-future ts per user, so every real
    # session closes and no sentinel session is ever emitted)
    global_max = events.agg(F.max("ts")).first()[0]
    sentinels = (
        events.select("user_id")
        .distinct()
        .withColumn("ts", F.lit(global_max) + F.expr("INTERVAL 2 DAYS"))
        .withColumn("event_id", F.lit(-1).cast("long"))
        .select("user_id", "ts", "event_id")
    )
    sentinels.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))

    # incarnation 2: a brand-new query object resumes from the checkpoint
    run_once()

    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start_ms)
        for r in spark.read.parquet(out).collect()
    }
    import py_etl_spark.queries as Q

    want = {
        (r.user_id, r.session_id): (r.n_events, r.session_start_ms)
        for r in Q.REGISTRY["sessionize_events"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_streaming_exact_dedup_first_occurrence_wins(spark):
    """Streaming exact dedup: cross-micro-batch duplicates are dropped
    within the watermark horizon, first arrival wins — the streaming
    counterpart of dedup.exact_duplicates (state bounded by watermark)."""
    import time as _time

    from py_etl_spark.streaming.dedup_stream import exact_dedup_stream

    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "src")
    schema = "doc_id long, text string, ts timestamp"
    b1 = spark.createDataFrame(
        [(1, "alpha text", "2024-01-01 00:00:00"),
         (2, "beta text", "2024-01-01 00:00:01")],
        "doc_id long, text string, ts string",
    ).select("doc_id", "text", F.to_timestamp("ts").alias("ts"))
    b1.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    _time.sleep(1.1)  # file source orders triggers by mtime
    b2 = spark.createDataFrame(
        [(3, "alpha text", "2024-01-01 00:00:02"),   # cross-batch dup of 1
         (4, "gamma text", "2024-01-01 00:00:03"),
         (5, "beta text", "2024-01-01 00:00:04")],   # cross-batch dup of 2
        "doc_id long, text string, ts string",
    ).select("doc_id", "text", F.to_timestamp("ts").alias("ts"))
    b2.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        exact_dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None
    rows = spark.table("dedup_out").collect()
    assert {r.doc_id for r in rows} == {1, 2, 4}
    # fingerprints unique and carried through for the batch-sweep join
    assert len({r.fingerprint for r in rows}) == 3


def test_versioned_state_unresolvable_version_fails_loudly(spark):
    """An unreadable/corrupt manifest with no recoverable data directory
    must raise a diagnostic error, never silently resolve to a dead path
    (the silent fallback is what escalated the r03 manifest-read bug into
    phantom PATH_NOT_FOUNDs in unrelated modules)."""
    import pytest

    from py_etl_spark.streaming.state_store import VersionedState

    tmp = tempfile.mkdtemp()
    root = os.path.join(tmp, "st")
    st = VersionedState(spark, root, partition_by=())
    v = st.commit(spark.range(3).withColumnRenamed("id", "k"))

    # corrupt the manifest AND remove the data dir's version prefix so no
    # fallback (legacy dir, v=<n>-* glob) can resolve it
    manifest = os.path.join(root, "_manifest", f"{v:020d}.json")
    with open(manifest, "w") as fh:
        fh.write("not json")
    for name in os.listdir(root):
        if name.startswith(f"v={v}-"):
            os.rename(
                os.path.join(root, name), os.path.join(root, "zz_orphan")
            )
    with pytest.raises(RuntimeError, match="cannot resolve data path"):
        st.read()

    # corrupt manifest but an unambiguous v=<n>-* dir: glob fallback works
    os.rename(os.path.join(root, "zz_orphan"),
              os.path.join(root, f"v={v}-recovered"))
    assert st.read().count() == 3


def test_streaming_ingest_front_door_routes_channels(spark):
    """Composed streaming ingest (streaming/ingest.py): JSONL stream ->
    parse quarantine -> quality gate -> cross-batch exact dedup. Good
    docs land in the accepted channel exactly once; low-quality and
    unparseable lines land in the rejected channel with a reason."""
    import time as _time

    from py_etl_spark.streaming.ingest import (
        ingest_documents_stream,
        read_documents_stream,
    )

    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    good = (
        "spark engines process distributed data with columnar execution "
        "and vectorized readers across many machines " * 2
    )
    with open(os.path.join(src, "a.jsonl"), "w") as fh:
        fh.write("\n".join([
            json.dumps({"doc_id": 1, "text": good,
                        "ts": "2024-01-01 00:00:00"}),
            json.dumps({"doc_id": 2, "text": "x y",
                        "ts": "2024-01-01 00:00:01"}),
            json.dumps({"doc_id": 9, "ts": "2024-01-01 00:00:01"}),
            "this is {not valid json",
        ]))
    _time.sleep(1.1)  # file source orders triggers by mtime
    with open(os.path.join(src, "b.jsonl"), "w") as fh:
        fh.write("\n".join([
            json.dumps({"doc_id": 3, "text": good,          # dup of 1
                        "ts": "2024-01-01 00:00:02"}),
            json.dumps({"doc_id": 4, "text": good + " unique tail",
                        "ts": "2024-01-01 00:00:03"}),
        ]))

    stream = read_documents_stream(
        spark, src, "doc_id long, text string, ts timestamp",
        max_files_per_trigger=1,
    )
    accepted, rejected = ingest_documents_stream(stream)
    qa = (accepted.writeStream.format("memory").queryName("ing_acc")
          .outputMode("append").trigger(availableNow=True).start())
    qr = (rejected.writeStream.format("memory").queryName("ing_rej")
          .outputMode("append").trigger(availableNow=True).start())
    qa.awaitTermination(300)
    qr.awaitTermination(300)
    assert qa.exception() is None and qr.exception() is None

    acc_rows = spark.table("ing_acc").collect()
    # doc 3 deduped cross-batch, doc 2 low quality, corrupt line routed
    assert {r.doc_id for r in acc_rows} == {1, 4}
    assert all(r.fingerprint for r in acc_rows)
    reasons = {(r.doc_id, r.reject_reason)
               for r in spark.table("ing_rej").collect()}
    assert (2, "low_quality") in reasons
    # parsed row with NULL text routes as low_quality, never vanishes
    assert (9, "low_quality") in reasons
    assert any(d is None and why == "parse_error" for d, why in reasons)
    assert len(reasons) == 3


def test_streaming_funnel_matches_batch_query(spark):
    """Stream-vs-batch parity for the strict ordered funnel: the stateful
    operator must emit exactly the users the oracle-checked batch fold
    reports as fully converted, with identical step times, carrying state
    across micro-batches (the funnel may START in batch 1 and COMPLETE in
    batch 2)."""
    import time as _time

    from py_etl_spark.schemas import load_table
    from py_etl_spark.streaming.funnel_stream import funnel_stream
    from tests.conftest import SF_SMALL

    cols = ["user_id", "ts", "event_type", "event_id"]
    events = load_table(spark, SF_SMALL, "events").select(*cols)
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "src")
    # two time-ordered micro-batches (per-user event-time order preserved)
    events.filter(F.col("ts") < cutoff).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "b1"))
    _time.sleep(1.1)  # file source orders triggers by mtime
    events.filter(F.col("ts") >= cutoff).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "b2"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        funnel_stream(stream, ["signup", "click", "purchase"])
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None

    got = {
        (r.user_id): (r.t_step1_ms, r.t_step2_ms, r.t_step3_ms)
        for r in spark.table("funnel_out").collect()
    }
    import py_etl_spark.queries as Q

    want = {
        r.user_id: (r.t_step1_ms, r.t_step2_ms, r.t_step3_ms)
        for r in Q.REGISTRY["funnel_signup_click_purchase"]
        .fn(spark, SF_SMALL)
        .collect()
        if r.reached == 3
    }
    assert got == want
    assert len(got) > 0  # the parity must be over a non-trivial set


def test_day_in_the_life_ingest_to_versioned_state(spark, tmp_path):
    """End-to-end operational composition: JSONL micro-batches → ingest
    front door (parse gate + quality gate + streaming dedup) →
    foreachBatch appends into a VersionedState → compaction → time travel.
    Every piece is tested alone elsewhere; this proves they COMPOSE."""
    import json as _json

    from py_etl_spark.operators.maintenance import compact_state
    from py_etl_spark.streaming.ingest import (
        ingest_documents_stream,
        read_documents_stream,
    )
    from py_etl_spark.streaming.state_store import VersionedState

    src = tmp_path / "in"
    src.mkdir()
    schema = "doc_id long, text string, ts timestamp"
    good = '{"doc_id": %d, "text": "%s", "ts": "2024-01-01T00:0%d:00"}'
    (src / "b1.jsonl").write_text(
        "\n".join(
            [
                good % (1, "a perfectly reasonable document with words", 1),
                good % (2, "zz", 2),  # low quality → rejected
                "{not json at all",   # parse error → rejected
            ]
        )
    )
    stream = read_documents_stream(spark, str(src) + "/*.jsonl", schema)
    accepted, _rejected = ingest_documents_stream(
        stream, min_quality=0.7, dedup_delay="0 seconds"
    )

    store = VersionedState(spark, str(tmp_path / "state"), partition_by=())

    def commit_batch(batch_df, _bid):
        rows = batch_df.select("doc_id", "text")
        if rows.count():
            if store.exists():
                store.commit(store.read().unionByName(rows))
            else:
                store.commit(rows)

    q = (
        accepted.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None
    v1 = store.current_version()
    assert {r.doc_id for r in store.read().collect()} == {1}

    # batch 2: a duplicate of doc 1's text (admitted — dedup horizon was
    # 0 s and the stream restarted) plus a fresh doc; fresh doc lands
    (src / "b2.jsonl").write_text(
        good % (3, "another perfectly reasonable document entirely", 5)
    )
    q2 = (
        accepted.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert q2.exception() is None
    v2 = store.current_version()
    assert v2 > v1
    assert {r.doc_id for r in store.read().collect()} == {1, 3}

    # compaction publishes a new version with identical content…
    v3 = compact_state(store)
    assert {r.doc_id for r in store.read().collect()} == {1, 3}
    # …and time travel still reaches the pre-compaction version
    assert {r.doc_id for r in store.read(version=v2).collect()} == {1, 3}
    assert store._read_manifest(v3)["meta"]["compacted_from"] == v2


def test_stream_stream_interval_join_matches_batch_range_join(spark):
    """Stream-vs-batch parity for the interval join: the watermarked
    stream-stream join must emit exactly the (anchor, follower) pairs the
    DuckDB-oracle-checked banded batch range join counts, with anchor
    state carried across micro-batches (the two time-halves of the data
    arrive in separate triggers, so cross-trigger pairs only exist if
    buffered state survives between them)."""
    import time as _time

    from py_etl_spark.schemas import load_table
    from py_etl_spark.streaming.interval_join import interval_join_stream
    from tests.conftest import SF_SMALL

    events = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "src")
    # split by event TIME so triggers arrive in event-time order (the
    # kafka-partition-by-key arrangement the module documents); the file
    # source orders triggers by mtime. Split exactly AT some anchor that
    # has a follower, so its followers land in the second trigger and a
    # cross-trigger pair is guaranteed to exist.
    sig = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts")
    )
    tmid = (
        sig.join(
            events,
            (F.col("user_id") == F.col("a_user"))
            & (F.col("ts") > F.col("a_ts"))
            & (F.col("ts") <= F.col("a_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .agg(F.min("a_ts"))
        .first()[0]
    )
    assert tmid is not None
    events.filter(F.col("ts") <= F.lit(tmid)).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )
    _time.sleep(1.1)
    events.filter(F.col("ts") > F.lit(tmid)).coalesce(1).write.parquet(
        os.path.join(src, "b2")
    )

    def stream():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )

    anchors = stream().filter(F.col("event_type") == "signup")
    q = (
        interval_join_stream(anchors, stream(), window_seconds=3600)
        .writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None

    out = spark.table("ij_out")
    got = {
        r.anchor_id: r.n
        for r in out.groupBy("anchor_id").agg(F.count("*").alias("n")).collect()
    }
    # pairs are unique (each follower pairs with an anchor at most once
    # per anchor) and the aggregate equals the oracle-checked batch query
    assert out.count() == out.distinct().count()
    import py_etl_spark.queries as Q

    want = {
        r.event_id: r.n_follow
        for r in Q.REGISTRY["range_join_followup_events"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert got == want and len(want) > 0
    # cross-trigger pairs exist: at least one anchor from b1 matched a
    # probe from b2 (otherwise the state-carry claim is untested)
    b1_max = events.filter(F.col("ts") <= F.lit(tmid)).agg(F.max("ts")).first()[0]
    crossers = out.filter(
        (F.col("anchor_ts") <= F.lit(b1_max)) & (F.col("probe_ts") > F.lit(b1_max))
    )
    assert crossers.count() > 0


def test_change_feed_classifies_insert_update_delete(spark):
    """CDF between two committed versions: output proportional to change
    volume, unchanged rows absent, null-safe column compare, and a NULL
    key value does not masquerade as an absent row."""
    import tempfile as _tf

    from py_etl_spark.streaming.state_store import VersionedState, change_feed

    store = VersionedState(
        spark, _tf.mkdtemp() + "/state", partition_by=(), keep_versions=4
    )
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (None, "n", 40)],
        "k long, v string, x long",
    )
    store.commit(v1)
    v2 = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40), (None, "n", 41)],
        "k long, v string, x long",
    )
    store.commit(v2)

    rows = {
        r.k: r
        for r in change_feed(
            store, ("k",), from_version=store.versions()[0]
        ).collect()
    }
    # defaults = previous-vs-current ("what changed in the latest
    # commit"), which here is the same diff
    dflt = {r.k: r.change_type for r in change_feed(store, ("k",)).collect()}
    assert dflt == {k: v.change_type for k, v in rows.items()}
    assert rows[2].change_type == "update" and rows[2].changed_cols == ["v"]
    assert rows[3].change_type == "delete" and rows[3].changed_cols == []
    assert rows[4].change_type == "insert"
    # NULL key matched null-safely: it is an UPDATE (x 40->41), not a
    # delete+insert pair
    assert rows[None].change_type == "update" and rows[None].changed_cols == ["x"]
    assert 1 not in rows  # unchanged row suppressed
    assert len(rows) == 4


def test_stream_stream_interval_join_checkpoint_restart(spark):
    """Kill the joining query after the first (anchor-heavy) half, then
    resume a NEW query from the same checkpoint: buffered join state for
    not-yet-matched anchors must survive the restart — the final pair
    set equals the oracle-checked batch range join, which is impossible
    if the first incarnation's buffered anchors were lost."""
    from py_etl_spark.schemas import load_table
    from py_etl_spark.streaming.interval_join import interval_join_stream
    from tests.conftest import SF_SMALL

    events = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    # split at an anchor that has a follower (same construction as the
    # parity test) so cross-incarnation pairs are guaranteed
    sig = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts")
    )
    tmid = (
        sig.join(
            events,
            (F.col("user_id") == F.col("a_user"))
            & (F.col("ts") > F.col("a_ts"))
            & (F.col("ts") <= F.col("a_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .agg(F.min("a_ts"))
        .first()[0]
    )
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "src")
    out = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    events.filter(F.col("ts") <= F.lit(tmid)).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )

    def run_once():
        def stream():
            return (
                spark.readStream.schema(events.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src + "/*")
            )

        anchors = stream().filter(F.col("event_type") == "signup")
        q = (
            interval_join_stream(anchors, stream(), window_seconds=3600)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None

    run_once()  # incarnation 1: first time-half only
    events.filter(F.col("ts") > F.lit(tmid)).coalesce(1).write.parquet(
        os.path.join(src, "b2")
    )
    run_once()  # incarnation 2: resumes from checkpoint, sees second half

    outdf = spark.read.parquet(out)
    got = {
        r.anchor_id: r.n
        for r in outdf.groupBy("anchor_id").agg(F.count("*").alias("n")).collect()
    }
    import py_etl_spark.queries as Q

    want = {
        r.event_id: r.n_follow
        for r in Q.REGISTRY["range_join_followup_events"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert got == want and len(want) > 0
    # at least one pair spans the incarnations
    crossers = outdf.filter(
        (F.col("anchor_ts") <= F.lit(tmid)) & (F.col("probe_ts") > F.lit(tmid))
    )
    assert crossers.count() > 0


def test_streaming_session_window_matches_batch_query(spark):
    """Stream-vs-batch parity for the NATIVE session-window operator
    (F.session_window under readStream + watermark — the engine-managed
    sibling of the custom applyInPandasWithState sessionizer): append
    mode must emit exactly the sessions the DuckDB-oracle-checked batch
    query derives once the watermark passes their ends."""
    import time as _time

    from py_etl_spark.schemas import load_table
    from tests.conftest import SF_SMALL

    events = load_table(spark, SF_SMALL, "events").select("user_id", "ts")
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "src")
    events.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    # one shared far-future sentinel timestamp: advances the watermark
    # past every real session's end; the sentinel sessions themselves
    # stay open (watermark never passes sentinel + gap) and are dropped
    global_max = events.agg(F.max("ts")).first()[0]
    sentinels = (
        events.select("user_id")
        .distinct()
        .withColumn("ts", F.lit(global_max) + F.expr("INTERVAL 2 DAYS"))
    )
    _time.sleep(1.1)  # file source orders triggers by mtime
    sentinels.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis("w.start").alias("session_start_ms"),
            F.unix_millis("w.end").alias("session_end_ms"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("native_sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None

    got = {
        (r.user_id, r.session_start_ms): (r.session_end_ms, r.n_events)
        for r in spark.table("native_sess_out").collect()
    }
    import py_etl_spark.queries as Q

    want = {
        (r.user_id, r.session_start_ms): (r.session_end_ms, r.n_events)
        for r in Q.REGISTRY["st_session_window_agg"].fn(
            spark, SF_SMALL
        ).collect()
    }
    assert got == want


def test_streaming_hll_state_maintenance(spark, tmp_path):
    """Sketch maintenance through the operational stack: a file stream
    of events folds per-batch HLL register cells into a VersionedState
    table via foreachBatch (register-wise max merge — the associativity
    the HLL family guarantees), and the final maintained sketch is
    BIT-IDENTICAL to a one-shot batch hll_sketch over all events. This
    is the 100 TB NDV-dashboard pattern: the raw stream is seen once;
    every refresh touches only the m-register state row."""
    from py_etl_spark.operators.sketch import hll_sketch
    from py_etl_spark.schemas import load_table
    from py_etl_spark.streaming.state_store import VersionedState
    from tests.conftest import SF_SMALL

    events = load_table(spark, SF_SMALL, "events").select("user_id", "ts")
    half1 = events.filter(F.col("user_id") % 2 == 0)
    half2 = events.filter(F.col("user_id") % 2 == 1)
    src = str(tmp_path / "src")
    half1.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    import time as _time

    _time.sleep(1.1)
    half2.coalesce(1).write.mode("overwrite").parquet(src + "/b2")

    store = VersionedState(
        spark, str(tmp_path / "hll_state"), partition_by=()
    )

    def fold(batch_df, batch_id):
        cells = hll_sketch(batch_df, col="user_id").select(
            F.posexplode("registers").alias("b", "reg")
        )
        try:
            prev = store.read().select("b", "reg")
            cells = cells.unionByName(prev)
        except Exception:
            pass  # first batch: no state yet
        merged = cells.groupBy("b").agg(F.max("reg").alias("reg"))
        store.commit(merged, meta={"batch_id": batch_id})

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None

    maintained = {
        r["b"]: r["reg"] for r in store.read().collect()
    }
    direct = hll_sketch(events, col="user_id").collect()[0]
    direct_regs = {
        i: r for i, r in enumerate(direct["registers"]) if r > 0
    }
    assert {b: r for b, r in maintained.items() if r > 0} == direct_regs
