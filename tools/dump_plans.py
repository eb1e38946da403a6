#!/usr/bin/env python
"""Dump `.explain("formatted")` for registry queries to per-query files.

Used to produce the plans/r11/<query>_{before,after}.txt evidence pairs:
run once at the round's base commit (--tag before) and once at HEAD
(--tag after); queries whose plan text changed are the round's touched
set. Plan text is normalized (expression IDs like #123 fluctuate run to
run) so diffs show structural change only.

Usage: python tools/dump_plans.py --out plans/r11 --tag after \
           [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_etl_spark import queries as Q
from py_etl_spark.plans.explain import executed_plan
from py_etl_spark.session import get_spark


def normalize(plan: str) -> str:
    """Strip run-varying tokens: expression ids (#123, #123L), codegen ids
    kept (stable for a fixed plan), temp view suffixes, paths."""
    plan = re.sub(r"#\d+L?", "#x", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
    plan = re.sub(r"/root/testdata/sf[\d.]+", "<sf>", plan)
    plan = re.sub(r"file:[^\s,\]]+", "<path>", plan)
    plan = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[x]", plan)
    # lambda-variable counters (x_4, y_341) are session-global and grow
    # with every HOF planned before the dump — fold them so a query's
    # plan text is independent of how many queries the session planned
    plan = re.sub(r"lambda ([a-z]+)_\d+", r"lambda \1_n", plan)
    # with_global_position bucket boundaries are driver-sampled literals
    # whose values are not stable run-to-run (AQE-dependent sampling
    # input partitioning); fold them so diffs stay structural.
    plan = re.sub(r"> \[[-\d.,\sE]+\]\)", "> [lit])", plan)
    return plan


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("plan-dump", cpus=8, shuffle_partitions=8)
    names = args.names or list(Q.REGISTRY)
    n_err = 0
    for name in names:
        spec = Q.REGISTRY[name]
        try:
            df = spec.fn(spark, args.sf)
            plan = normalize(executed_plan(df))
        except Exception as e:  # noqa: BLE001 — record, continue
            plan = f"BUILD ERROR: {e}\n"
            n_err += 1
        with open(os.path.join(args.out, f"{name}_{args.tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars")
    print(f"done: {len(names)} plans, {n_err} errors")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
