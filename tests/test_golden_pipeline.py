"""End-to-end golden-file parity with the reference's test-compare flow.

Replays the reference's e2e regression (test-compare:1-24) as batch
pipelines and byte-diffs our canonical dumps against the reference's golden
files (/root/reference/testdata/ldap*.txt). Timestamps are excluded from
dumps by the reference itself (iter_ignore), so batch stamps are logical.
"""

from __future__ import annotations

import difflib
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from py_etl_spark.fixtures import apply_changeset, apply_eventlog_deletes
from py_etl_spark.functions.crypto import FIXED_TEST_IV_HEX
from py_etl_spark.operators.compare import bootstrap_tree, dump_tree, extra_entries
from py_etl_spark.operators.refsync import (
    SyncConfig,
    cdc_apply,
    garbage_collect_state,
    set_etd_done,
    sync_users_into_state,
    users_to_entries,
)
from py_etl_spark.sources import read_eventlog_csv, read_users_csv

TD = Path("/root/reference/testdata")
INSTANCES = [f"ph{i:02d}" for i in range(1, 16)]
SYNC_INSTANCES = ["ph08", "ph15"]

# Server-bootstrap fixture accounts present in the goldens (ldapII.txt) —
# environment seed data, not engine output.
READER_ROWS = [
    dict(dn="ou=readers,o=BMUKK", ou="readers", objectClass=["organizationalUnit"]),
    dict(
        dn="cn=bmb_reader,ou=readers,o=BMUKK",
        cn="bmb_reader",
        objectClass=["simpleSecurityObject", "organizationalRole"],
        userPassword="{SSHA}x",
    ),
    dict(
        dn="cn=monitoring,ou=readers,o=BMUKK",
        cn="monitoring",
        objectClass=["simpleSecurityObject", "organizationalRole"],
        userPassword="ChAnGeMe",
    ),
]


def golden(name: str) -> list[str]:
    return (TD / name).read_text().splitlines()


def driver_materialize(spark):
    """Cut lineage through the driver — right-sized for the ~90-row golden
    state; production uses localCheckpoint/parquet instead."""

    def m(df):
        if df is None:
            return None
        return spark.createDataFrame(df.collect(), df.schema)

    return m


def assert_dump_matches(state, base_dn, golden_name, max_diff_lines=12):
    got = dump_tree(state, base_dn)
    want = golden(golden_name)
    if got != want:
        diff = list(
            difflib.unified_diff(want, got, golden_name, "engine", lineterm="", n=0)
        )
        pytest.fail(
            f"dump mismatch vs {golden_name} ({len(diff)} diff lines):\n"
            + "\n".join(diff[:max_diff_lines])
        )


@pytest.fixture(scope="module")
def pipeline_state(spark):
    """Replay the container bootstrap: tree + dual initial_load → ldapII."""
    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240101000000Z")
    m = driver_materialize(spark)
    state = bootstrap_tree(spark, INSTANCES, SYNC_INSTANCES).unionByName(
        extra_entries(spark, READER_ROWS)
    )
    users = m(read_users_csv(spark, str(TD / "initial_data.csv")))
    for inst in ("ph08", "ph15"):
        state, _, _, _ = sync_users_into_state(
            state, users_to_entries(users, inst), inst, cfg, snapshot=True
        )
        state = m(state)
    return state, users, cfg


def test_ldapII_dual_preload(spark, pipeline_state):
    state, _, _ = pipeline_state
    assert_dump_matches(state, "o=BMUKK", "ldapII.txt")


def test_full_scenario_suite(spark, pipeline_state):
    state, users, _ = pipeline_state
    m = driver_materialize(spark)

    # --- deluids 4731 4732 + initial_load ph08 → ldap00
    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240102000000Z")
    users = m(users.filter(~F.col("pk_uniqueid").isin(4731.0, 4732.0)))
    state, _, _, _ = sync_users_into_state(
        state, users_to_entries(users, "ph08"), "ph08", cfg, snapshot=True
    )
    state = m(state)
    assert_dump_matches(state, "o=BMUKK", "ldap00.txt")

    # --- scenarios 01..08 (CDC micro-batches)
    for n in range(1, 9):
        nn = f"{n:02d}"
        cfg = SyncConfig(
            iv_hex=FIXED_TEST_IV_HEX, batch_ts=f"202401{n + 2:02d}000000Z"
        )
        state = set_etd_done(state, uniqueid="4715")
        changeset = read_users_csv(spark, str(TD / f"changeset{nn}.csv"))
        eventlog = m(read_eventlog_csv(spark, str(TD / f"eventlog{nn}.csv")))
        users = m(apply_changeset(users, changeset))
        users = m(apply_eventlog_deletes(users, eventlog))
        state = m(garbage_collect_state(state, "ph08"))
        state, statuses = cdc_apply(
            state, users, eventlog, "ph08", cfg, materialize=m
        )
        assert_dump_matches(state, "ou=ph08,o=BMUKK", f"ldap{nn}.txt")
        bad = statuses.filter(F.col("status").isin("F", "E")).collect()
        assert not bad, f"scenario {nn} produced error statuses: {bad}"
        state = set_etd_done(state)

    # --- final paired-instance state → ldapI15
    assert_dump_matches(state, "ou=user,ou=ph15,o=BMUKK", "ldapI15.txt")


def test_full_scenario_suite_through_streaming_driver(
    spark, pipeline_state, tmp_path
):
    """Golden scenarios 01-08 through the TRUE streaming path.

    The reference's main entry point IS the micro-batch polling loop
    (etl.py:393-423), so golden parity must hold when eventlog01-08
    arrive as foreachBatch micro-batches via CdcStreamDriver — not just
    through the batch cdc_apply path above. Every scenario's committed
    VersionedState version is byte-diffed against its ldapNN.txt dump,
    and the final paired-instance write-through against ldapI15.txt.

    The maintenance the reference performs inside its loop between
    polls (etd-done acks, state GC, re-reading the source-db users
    snapshot) runs through the driver's ``prepare_batch`` seam.
    """
    import os
    import shutil

    from py_etl_spark.streaming.stream import CdcStreamDriver

    state, users0, _ = pipeline_state
    m = driver_materialize(spark)

    # ldap00 bootstrap (deluids 4731/4732 + initial_load ph08), exactly
    # as the batch suite does
    cfg0 = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240102000000Z")
    users = m(users0.filter(~F.col("pk_uniqueid").isin(4731.0, 4732.0)))
    state0, _, _, _ = sync_users_into_state(
        state, users_to_entries(users, "ph08"), "ph08", cfg0, snapshot=True
    )
    state0 = m(state0)

    root = str(tmp_path / "stream_golden")
    state_path = os.path.join(root, "state")
    events_dir = os.path.join(root, "events")
    os.makedirs(events_dir)
    state0.write.mode("overwrite").partitionBy("instance").parquet(
        state_path
    )
    # one file per scenario; explicit increasing mtimes pin the file
    # source's pickup order (maxFilesPerTrigger=1 → one scenario per
    # micro-batch)
    t0 = 1_700_000_000
    for n in range(1, 9):
        dst = os.path.join(events_dir, f"batch{n:02d}.csv")
        shutil.copy(str(TD / f"eventlog{n:02d}.csv"), dst)
        os.utime(dst, (t0 + n, t0 + n))

    def prep(drv, st, bid):
        n = bid + 1
        if bid > 0:
            # end-of-previous-scenario full etd ack (the batch suite
            # runs set_etd_done(state) after each cdc_apply)
            st = set_etd_done(st)
        st = set_etd_done(st, uniqueid="4715")
        changeset = read_users_csv(spark, str(TD / f"changeset{n:02d}.csv"))
        drv.users = m(apply_changeset(drv.users, changeset))
        eventlog = m(
            read_eventlog_csv(spark, str(TD / f"eventlog{n:02d}.csv"))
        )
        drv.users = m(apply_eventlog_deletes(drv.users, eventlog))
        return m(garbage_collect_state(st, "ph08"))

    from py_etl_spark.streaming.stream import CdcStreamDriver  # noqa: F811

    drv = CdcStreamDriver(
        spark,
        users,
        state_path,
        "ph08",
        SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240101000000Z"),
        keep_versions=10,  # retain all 8 scenario versions + v0
        ts_for_batch=lambda bid: f"202401{bid + 3:02d}000000Z",
        prepare_batch=prep,
    )
    q = drv.run_file_stream(
        events_dir, checkpoint=os.path.join(root, "ckpt")
    )
    assert q.awaitTermination(1200)
    assert q.exception() is None
    assert drv.batches == 8
    for batch in drv.statuses:
        bad = [s for s in batch if s.status in ("F", "E")]
        assert not bad, f"streaming run produced error statuses: {bad}"

    # per-scenario parity: committed version v0+n is the state right
    # after scenario n's cdc_apply — byte-diff each against its golden
    v0 = drv.store.versions()[0]
    for n in range(1, 9):
        assert_dump_matches(
            drv.store.read(version=v0 + n),
            "ou=ph08,o=BMUKK",
            f"ldap{n:02d}.txt",
        )
    # final paired-instance write-through (J6/ST11)
    final = set_etd_done(drv.read_state())
    assert_dump_matches(final, "ou=user,ou=ph15,o=BMUKK", "ldapI15.txt")
