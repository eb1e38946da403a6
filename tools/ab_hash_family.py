#!/usr/bin/env python
"""Interleaved same-session A/B: md5 (portable oracle default) vs
xxhash64 (production lever) base hashes for the fingerprint family —
MinHash-LSH candidates and winnowing fingerprints (VERDICT r10 item 6).

SCALING's floor decompositions attribute 34-46% of the minhash/winnow
sf10 cost to the oracle-pinned md5 (145M md5 calls for winnow at sf10);
this measures what the xxhash64 lever actually buys at that scale. One
JVM, alternating arms, min-of-N per arm (the only protocol that
survives this box's variance — SCALING.md §8). Full materialization via
the no-op sink. Structure parity (same seeded near-dup pairs under both
families) is pinned by
tests/test_operators.py::test_hash_family_lever_finds_same_near_dup_pairs.

Usage: python tools/ab_hash_family.py [SF_DIR] [REPS]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from py_etl_spark.operators import dedup
from py_etl_spark.operators.fingerprint import winnow_fingerprints
from py_etl_spark.session import get_spark


def run(df):
    t = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    ops = {
        "minhash_lsh": lambda fam: dedup.minhash_lsh_candidates(
            docs, hash_family=fam
        ),
        "winnow": lambda fam: winnow_fingerprints(docs, hash_family=fam),
    }
    for name, build in ops.items():
        md5s, xxhs = [], []
        for i in range(reps):
            md5s.append(run(build("md5")))
            print(f"  {name} md5[{i}] {md5s[-1]:.2f}s", flush=True)
            xxhs.append(run(build("xxhash64")))
            print(f"  {name} xxh[{i}] {xxhs[-1]:.2f}s", flush=True)
        print(
            f"RESULT op={name} sf_dir={sf_dir} md5_min={min(md5s):.2f} "
            f"xxhash64_min={min(xxhs):.2f} "
            f"speedup={min(md5s) / min(xxhs):.2f}x "
            f"md5={md5s} xxh={xxhs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
