#!/usr/bin/env python
"""Local replica of the driver's DuckDB-oracle correctness gate.

For every ``queries()`` entry: run the Spark query and (if present) the
oracle SQL at the same scale factor; compare row count, sorted column-name
schema, and an order-insensitive value hash. Prints one line per query and
a summary; exit 1 on any mismatch.

Usage: python tools/check_correctness.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from py_etl_spark import queries as Q
from py_etl_spark.schemas import STAR_TABLES
from py_etl_spark.session import get_spark


def canon(v) -> str:
    """Canonical string form of a value for hashing (engine-agnostic).

    STRICT: floats are never folded to ints. The r02 driver run proved the
    external gate distinguishes 1577834100000.0 (DuckDB DOUBLE from
    ``epoch()``) from 1577834100000 (Spark BIGINT) — an earlier folding
    branch here masked exactly that mismatch (st_hopping_window_agg, the
    only red row of r02). Oracles must CAST to the type Spark emits.
    """
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_digest(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    digests = sorted(
        hashlib.sha256(
            "|".join(canon(r[i]) for i in order).encode()
        ).hexdigest()
        for r in rows
    )
    return hashlib.sha256("\n".join(digests).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--json", default=None,
        help="write driver-style per-query records to this path",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    records: dict[str, dict] = {}

    spark = get_spark("correctness", cpus=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in STAR_TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = Q.queries()
    oracles = Q.oracle_sql()
    names = args.names or list(qs)
    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "err": f"spark: {e}"[:200]}
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            # deliberate rows-only entry (non-SQL-expressible op), NOT a
            # failure: err stays None so red rows mean real breakage
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(srows),
                             "rows_only": True, "err": None}
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            failures.append(name)
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None,
                             "err": f"duckdb: {str(e).splitlines()[0]}"[:200]}
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sh = table_digest([tuple(r) for r in srows], scols)
            dh = table_digest(drows, dcols)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show a sample diff
                sset = {
                    tuple(canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in ([tuple(x) for x in srows])
                }
                dset = {
                    tuple(canon(r[i]) for i in sorted(range(len(dcols)), key=lambda i: dcols[i]))
                    for r in drows
                }
                only_s = list(sset - dset)[:3]
                only_d = list(dset - sset)[:3]
                problems.append(f"spark-only sample: {only_s}")
                problems.append(f"duck-only sample: {only_d}")
        records[name] = {
            "rows_match": len(srows) == len(drows),
            "schema_match": sorted(c.lower() for c in scols)
            == sorted(c.lower() for c in dcols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": "; ".join(problems)[:200] if problems else None,
        }
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
            failures.append(name)
        else:
            print(f"ok    {name}: {len(srows)} rows hash-match [{time.time()-t0:.1f}s]")
            n_pass += 1
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(records, fh, indent=2)
    print(
        f"\n{n_pass} hash-match, {n_rows_only} rows-only, {n_fail} FAIL"
        + (f": {failures}" if failures else "")
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
