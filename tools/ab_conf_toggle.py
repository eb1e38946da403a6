#!/usr/bin/env python
"""Interleaved same-session A/B of ONE registry query under two runtime
SQL-conf settings (e.g. AQE initialPartitionNum). One JVM, alternating
arms, min-of-N, build/exec split per sample.

Usage:
  python tools/ab_conf_toggle.py QUERY SF_DIR KEY A_VAL B_VAL [reps]
A_VAL/B_VAL of "unset" clear the conf for that arm.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from py_etl_spark import queries as Q
from py_etl_spark.session import get_spark


def sample(spark, name, sf_dir):
    t0 = time.monotonic()
    df = Q.REGISTRY[name].fn(spark, sf_dir)
    t1 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.monotonic()
    return {"build": round(t1 - t0, 3), "exec": round(t2 - t1, 3),
            "wall": round(t2 - t0, 3)}


def main():
    name, sf_dir, key, a_val, b_val = sys.argv[1:6]
    reps = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    spark = get_spark()

    def set_conf(v):
        if v == "unset":
            spark.conf.unset(key)
        else:
            spark.conf.set(key, v)

    arms = {"A": [], "B": []}
    for i in range(reps):
        for arm, v in (("A", a_val), ("B", b_val)):
            set_conf(v)
            s = sample(spark, name, sf_dir)
            arms[arm].append(s)
            print(f"  {arm}={v}[{i}] {s}", flush=True)
    out = {
        "query": name, "sf_dir": sf_dir, "key": key,
        "A": {"val": a_val, "min": min(s["wall"] for s in arms["A"]),
              "samples": arms["A"]},
        "B": {"val": b_val, "min": min(s["wall"] for s in arms["B"]),
              "samples": arms["B"]},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
