#!/usr/bin/env python
"""Adjudicate a decade-scaling flag for ONE registry query.

Protocol (SCALING.md §8 — the only one that survives this box's
variance): a single fresh JVM runs ONLY this query, ALTERNATING the
sf1 and sf10 replica arms (so both arms see the same session state,
GC pressure, and background load), `reps` samples per arm. Per sample
the build (fn-call → DataFrame) and exec (no-op sink write) phases are
timed separately, so driver-side plan-build cost can't masquerade as
data-scale curvature. A min counts as CORROBORATED when the
second-best sample is within 1.3× of it (bench.py's rep_meta rule);
uncorroborated arms get extra reps up to `max_reps`.

Usage: python tools/adjudicate_scaling.py QUERY [reps] [max_reps]
Prints one JSON line with per-arm samples, corroborated mins, and the
decade ratio.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from py_etl_spark import queries as Q
from py_etl_spark.session import get_spark

SF1 = "/tmp/spark_graft_sf1"
SF10 = "/tmp/spark_graft_sf10"


def sample(spark, name, sf_dir):
    t0 = time.monotonic()
    df = Q.REGISTRY[name].fn(spark, sf_dir)
    t1 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.monotonic()
    return {"build": round(t1 - t0, 3), "exec": round(t2 - t1, 3),
            "wall": round(t2 - t0, 3)}


def corroborated(walls):
    s = sorted(walls)
    return len(s) >= 2 and s[1] <= 1.3 * s[0]


def main():
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    max_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark()
    arms = {SF1: [], SF10: []}
    for i in range(reps):
        for d in (SF1, SF10):
            s = sample(spark, name, d)
            arms[d].append(s)
            print(f"  {d.rsplit('_', 1)[-1]}[{i}] {s}", flush=True)
    # adaptive extra reps until both mins corroborate
    n = reps
    while n < max_reps and not all(
        corroborated([s["wall"] for s in v]) for v in arms.values()
    ):
        for d in (SF1, SF10):
            if not corroborated([s["wall"] for s in arms[d]]):
                s = sample(spark, name, d)
                arms[d].append(s)
                print(f"  {d.rsplit('_', 1)[-1]}[+{n}] {s}", flush=True)
        n += 1
    out = {"query": name}
    for d, label in ((SF1, "sf1"), (SF10, "sf10")):
        walls = [s["wall"] for s in arms[d]]
        execs = [s["exec"] for s in arms[d]]
        builds = [s["build"] for s in arms[d]]
        out[label] = {
            "min_wall": min(walls),
            "min_exec": min(execs),
            "min_build": min(builds),
            "corroborated": corroborated(walls),
            "samples": arms[d],
        }
    out["ratio_wall"] = round(out["sf10"]["min_wall"] / out["sf1"]["min_wall"], 2)
    out["ratio_exec"] = round(
        out["sf10"]["min_exec"] / max(out["sf1"]["min_exec"], 1e-9), 2
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
