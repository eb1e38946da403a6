"""Runnable CLI over the Parquet state store — the operational surface a
user of the reference drives from a shell.

Mirrors the reference entry points, re-targeted at the engine's versioned
Parquet state:

- ``initial_load``  etl.py:1231-1374 (action dispatch) + the snapshot
  reconciliation kernel; repeated runs re-sync against the existing state
  (leftover sweep deletes vanished users, tombstones survive).
- ``etl``           the micro-batch event loop (etl.py:393-423, 576-733):
  consumes eventlog CSVs from a directory via the Structured-Streaming
  driver, acks statuses, commits a state version per batch.
- ``iter``          ldaptest.py:287-300 — canonical golden-format dump of
  a subtree (distributed sort, partition-streamed to the sink).
- ``getdn``         ldaptest.py:285-286 — fetch one entry by dn.
- ``compare``       ldaptest.py:305-351 — sorted full-outer diff of two
  states (or two subtrees), ignore-list applied.
- ``schema``        ldaptest.py:12-47 — state schema introspection.

Examples::

    python -m py_etl_spark initial_load --users initial_data.csv \\
        --state /tmp/state --instance ph08 --instance ph15 \\
        --sync-instance ph08 --sync-instance ph15 --crypto-iv <32hex>
    python -m py_etl_spark iter --state /tmp/state --base-dn o=BMUKK
    python -m py_etl_spark etl --state /tmp/state --events /tmp/evdir \\
        --instance ph08 --status-out /tmp/acks
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _spark(args):
    from py_etl_spark.session import get_spark

    return get_spark("py_etl_spark-cli", cpus=args.cpus)


def _store(spark, path, create=False):
    from py_etl_spark.streaming.state_store import VersionedState

    return VersionedState(spark, path, partition_by=("instance",))


def _cfg(args):
    from py_etl_spark.operators.refsync import SyncConfig

    kw = {}
    if getattr(args, "crypto_iv", None):
        kw["iv_hex"] = args.crypto_iv
    if getattr(args, "encryption_password", None):
        kw["key"] = args.encryption_password
    if getattr(args, "batch_ts", None):
        kw["batch_ts"] = args.batch_ts
    return SyncConfig(**kw)


def cmd_initial_load(args) -> int:
    from py_etl_spark.operators.compare import bootstrap_tree, extra_entries
    from py_etl_spark.operators.refsync import (
        sync_users_into_state,
        users_to_entries,
    )
    from py_etl_spark.sources import read_users_csv

    spark = _spark(args)
    store = _store(spark, args.state, create=True)
    cfg = _cfg(args)
    instances = args.instance or ["ph08"]
    sync_instances = args.sync_instance or instances

    if store.exists():
        state = store.read()
    else:
        state = bootstrap_tree(spark, instances, sync_instances, args.suffix)
        if args.seed_json:
            with open(args.seed_json) as fh:
                state = state.unionByName(extra_entries(spark, json.load(fh)))

    users = read_users_csv(spark, args.users)
    for uid in args.exclude_uid or []:
        users = users.filter(F.col("pk_uniqueid") != float(uid))

    for inst in sync_instances:
        state, _, _, errors = sync_users_into_state(
            state, users_to_entries(users, inst, args.suffix), inst, cfg,
            snapshot=True,
        )
        state = state.localCheckpoint()  # cut lineage between instances
        for e in errors.collect():
            print(f"ERROR {inst}: {e.error}", file=sys.stderr)
    v = store.commit(state, {"action": "initial_load"})
    print(f"initial_load: committed state v={v} ({state.count()} entries)")
    return 0


def cmd_etl(args) -> int:
    from py_etl_spark.sources import read_users_csv
    from py_etl_spark.streaming.stream import CdcStreamDriver

    spark = _spark(args)
    users = read_users_csv(spark, args.users)
    drv = CdcStreamDriver(
        spark, users, args.state, args.instance[0] if args.instance else "ph08",
        _cfg(args), heartbeat_path=args.heartbeat,
    )
    q = drv.run_file_stream(
        args.events,
        max_files_per_trigger=1,
        processing_time=f"{args.sleeptime} seconds" if not args.once else None,
        checkpoint=args.checkpoint,
    )
    if args.once:
        q.awaitTermination(args.timeout)
    else:
        try:
            q.awaitTermination()
        except KeyboardInterrupt:
            q.stop()
    if q.exception() is not None:
        print(f"etl: stream failed: {q.exception()}", file=sys.stderr)
        return 1
    if args.status_out:
        flat = [r.asDict() for batch in drv.statuses for r in batch]
        with open(args.status_out, "w") as fh:
            json.dump(flat, fh, indent=2, default=str)
    print(f"etl: processed {drv.batches} batch(es)")
    return 0


def cmd_iter(args) -> int:
    from py_etl_spark.operators.compare import dump_tree_stream

    spark = _spark(args)
    state = _store(spark, args.state).read()
    out = open(args.output, "w") if args.output else sys.stdout
    try:
        dump_tree_stream(state, args.base_dn, out)
    finally:
        if args.output:
            out.close()
    return 0


def cmd_getdn(args) -> int:
    from py_etl_spark.operators.compare import entry_line

    spark = _spark(args)
    row = _store(spark, args.state).read().filter(F.col("dn") == args.base_dn).first()
    if row is None:
        print(f"getdn: no entry {args.base_dn}", file=sys.stderr)
        return 1
    print(entry_line(row))
    return 0


def cmd_compare(args) -> int:
    from py_etl_spark.operators.compare import compare_trees, dfs_key_col

    spark = _spark(args)
    lhs = _store(spark, args.state).read()
    rhs = _store(spark, args.state2).read()
    if args.base_dn:
        lhs = lhs.filter(
            (F.col("dn") == args.base_dn) | F.col("dn").endswith("," + args.base_dn)
        )
    if args.base_dn2:
        rhs = rhs.filter(
            (F.col("dn") == args.base_dn2) | F.col("dn").endswith("," + args.base_dn2)
        )
    diff = compare_trees(lhs, rhs).withColumn("__k", dfs_key_col(F.col("dn")))
    n = 0
    for r in diff.orderBy("__k", "attr").drop("__k").toLocalIterator():
        if r.kind == "only_lhs":
            print(f"Only in lhs: {r.dn}")
        elif r.kind == "only_rhs":
            print(f"Only in rhs: {r.dn}")
        else:
            print(f"Differs: {r.dn} {r.attr}: ({r.lhs_value!r} vs {r.rhs_value!r})")
        n += 1
    print(f"\nDifferences: {n}")
    return 0 if n == 0 else 2


def cmd_schema(args) -> int:
    from py_etl_spark.schemas import STATE_SCHEMA

    for f in STATE_SCHEMA.fields:
        print(f"{f.name}: {f.dataType.simpleString()}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m py_etl_spark")
    sub = p.add_subparsers(dest="action", required=True)

    def common(sp, state=True):
        sp.add_argument("--cpus", default=None, help="local[N] cores")
        if state:
            sp.add_argument("--state", required=True, help="state store root")

    sp = sub.add_parser("initial_load", help="snapshot-reconcile users into state")
    common(sp)
    sp.add_argument("--users", required=True, help="users CSV (';'-separated)")
    sp.add_argument("--instance", action="append", help="all tree instances")
    sp.add_argument("--sync-instance", action="append",
                    help="instances to load users into (default: --instance)")
    sp.add_argument("--suffix", default="o=BMUKK")
    sp.add_argument("--exclude-uid", action="append",
                    help="pk_uniqueid values to drop from the source")
    sp.add_argument("--seed-json", help="JSON list of extra seed entries")
    sp.add_argument("-i", "--crypto-iv", help="fixed AES IV hex (tests only)")
    sp.add_argument("-p", "--encryption-password", help="AES key (16 bytes)")
    sp.add_argument("--batch-ts", help="logical batch timestamp")

    sp = sub.add_parser("etl", help="consume eventlog CSVs, apply micro-batches")
    common(sp)
    sp.add_argument("--users", required=True)
    sp.add_argument("--events", required=True, help="directory of eventlog CSVs")
    sp.add_argument("--instance", action="append")
    sp.add_argument("-i", "--crypto-iv")
    sp.add_argument("-p", "--encryption-password")
    sp.add_argument("--batch-ts")
    sp.add_argument("-m", "--max-records", type=int, default=100)
    sp.add_argument("-s", "--sleeptime", type=int, default=20)
    sp.add_argument("--once", action="store_true",
                    help="drain available events and exit (availableNow)")
    sp.add_argument("--timeout", type=int, default=300)
    sp.add_argument("--checkpoint")
    sp.add_argument("--heartbeat")
    sp.add_argument("--status-out", help="write per-event acks as JSON")

    sp = sub.add_parser("iter", help="golden-format dump of a subtree")
    common(sp)
    sp.add_argument("-d", "--base-dn", default="o=BMUKK")
    sp.add_argument("-o", "--output")

    sp = sub.add_parser("getdn", help="fetch one entry")
    common(sp)
    sp.add_argument("-d", "--base-dn", required=True)

    sp = sub.add_parser("compare", help="diff two states")
    common(sp)
    sp.add_argument("--state2", required=True)
    sp.add_argument("-d", "--base-dn")
    sp.add_argument("--base-dn2")

    sp = sub.add_parser("schema", help="print the state schema")
    common(sp, state=False)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return {
        "initial_load": cmd_initial_load,
        "etl": cmd_etl,
        "iter": cmd_iter,
        "getdn": cmd_getdn,
        "compare": cmd_compare,
        "schema": cmd_schema,
    }[args.action](args)


if __name__ == "__main__":
    raise SystemExit(main())
