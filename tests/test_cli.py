"""CLI driver (python -m py_etl_spark): the operational surface.

The acceptance bar: a user can reproduce the reference's initial_load
golden (ldap00.txt) from a shell — bootstrap + dual load + re-sync with
excluded uids + iter dump, all through main().
"""

from __future__ import annotations

import io
import json
import os
import tempfile
from pathlib import Path

from py_etl_spark.__main__ import main
from py_etl_spark.functions.crypto import FIXED_TEST_IV_HEX
from tests.test_golden_pipeline import INSTANCES, READER_ROWS

TD = Path("/root/reference/testdata")


def test_cli_initial_load_reproduces_ldap00(spark, tmp_path, capsys):
    state = str(tmp_path / "state")
    seed = tmp_path / "seed.json"
    seed.write_text(json.dumps(READER_ROWS))

    # 1) container bootstrap + dual initial load (the ldapII state)
    rc = main(
        ["initial_load", "--state", state, "--users", str(TD / "initial_data.csv"),
         *[x for i in INSTANCES for x in ("--instance", i)],
         "--sync-instance", "ph08", "--sync-instance", "ph15",
         "--seed-json", str(seed), "--crypto-iv", FIXED_TEST_IV_HEX,
         "--batch-ts", "20240101000000Z"]
    )
    assert rc == 0

    # 2) re-load ph08 with two users gone (testdriver deluids scenario)
    rc = main(
        ["initial_load", "--state", state, "--users", str(TD / "initial_data.csv"),
         "--exclude-uid", "4731", "--exclude-uid", "4732",
         "--sync-instance", "ph08", "--crypto-iv", FIXED_TEST_IV_HEX,
         "--batch-ts", "20240102000000Z"]
    )
    assert rc == 0
    capsys.readouterr()

    # 3) iter dump == the reference's own golden, byte for byte
    out = tmp_path / "dump.txt"
    rc = main(["iter", "--state", state, "--base-dn", "o=BMUKK", "-o", str(out)])
    assert rc == 0
    got = out.read_text().splitlines()
    want = (TD / "ldap00.txt").read_text().splitlines()
    assert got == want

    # 4) getdn + schema + self-compare smoke
    rc = main(["getdn", "--state", state, "-d", "cn=bmb_reader,ou=readers,o=BMUKK"])
    assert rc == 0
    assert "bmb_reader" in capsys.readouterr().out
    rc = main(["compare", "--state", state, "--state2", state])
    assert rc == 0
    assert "Differences: 0" in capsys.readouterr().out
    rc = main(["schema"])
    assert rc == 0
    assert "dn: string" in capsys.readouterr().out


def test_cli_compare_two_state_roots(spark, tmp_path, capsys):
    """The reference's fourth shell entry point (ldaptest compare,
    ldaptest.py:305-351) e2e from the CLI: two DIFFERENT state roots —
    one full load, one loaded with two uids excluded — must diff with
    exit code 2, report exactly the excluded users' subtrees as
    one-sided, and the self-compare must stay clean (exit 0)."""
    full, partial = str(tmp_path / "full"), str(tmp_path / "partial")
    common = ["--users", str(TD / "initial_data.csv"),
              "--instance", "ph08",
              "--crypto-iv", FIXED_TEST_IV_HEX,
              "--batch-ts", "20240101000000Z"]
    assert main(["initial_load", "--state", full, *common]) == 0
    assert main(["initial_load", "--state", partial, *common,
                 "--exclude-uid", "4731", "--exclude-uid", "4732"]) == 0
    capsys.readouterr()

    rc = main(["compare", "--state", full, "--state2", partial])
    out = capsys.readouterr().out
    assert rc == 2
    # exactly the two excluded users' entries are one-sided (their dns
    # are cn-based, so count rather than grep the numeric uid)
    lines = [ln for ln in out.splitlines() if ln.startswith("Only in lhs:")]
    assert len(lines) == 2
    assert all(",ou=user,ou=ph08,o=BMUKK" in ln for ln in lines)
    assert "Only in rhs:" not in out and "Differs:" not in out
    assert "Differences: 2" in out

    rc = main(["compare", "--state", full, "--state2", full])
    assert rc == 0
    assert "Differences: 0" in capsys.readouterr().out


def test_cli_etl_once_applies_events(spark, tmp_path):
    state = str(tmp_path / "state")
    rc = main(
        ["initial_load", "--state", state, "--users", str(TD / "initial_data.csv"),
         "--instance", "ph08", "--instance", "ph15",
         "--crypto-iv", FIXED_TEST_IV_HEX, "--batch-ts", "20240101000000Z"]
    )
    assert rc == 0
    evdir = tmp_path / "events"
    evdir.mkdir()
    (evdir / "batch1.csv").write_text((TD / "eventlog01.csv").read_text())
    acks = tmp_path / "acks.json"
    rc = main(
        ["etl", "--state", state, "--users", str(TD / "initial_data.csv"),
         "--events", str(evdir), "--instance", "ph08", "--once",
         "--crypto-iv", FIXED_TEST_IV_HEX, "--batch-ts", "20240101000000Z",
         "--checkpoint", str(tmp_path / "ckpt"),
         "--status-out", str(acks)]
    )
    assert rc == 0
    recorded = json.load(open(acks))
    assert recorded and all(r["status"] == "S" for r in recorded)


def test_dump_tree_stream_matches_collect_dump(spark):
    from py_etl_spark.operators.compare import (
        bootstrap_tree,
        dump_to_string,
        dump_tree_stream,
    )
    from py_etl_spark.operators.refsync import (
        SyncConfig,
        sync_users_into_state,
        users_to_entries,
    )
    from py_etl_spark.sources import read_users_csv

    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240101000000Z")
    users = read_users_csv(spark, str(TD / "initial_data.csv"))
    state = bootstrap_tree(spark, ["ph08"], ["ph08"])
    state, _, _, _ = sync_users_into_state(
        state, users_to_entries(users, "ph08"), "ph08", cfg, snapshot=True
    )
    # force a multi-partition tree so the streamed dump must merge ranges
    state = state.repartition(8)
    buf = io.StringIO()
    n = dump_tree_stream(state, "o=BMUKK", buf)
    assert n > 0
    assert buf.getvalue() == dump_to_string(state, "o=BMUKK")
