#!/usr/bin/env python
"""Fresh-session anchors: run registry queries, one JVM PER QUERY ARM.

The r09 closing bench proved in-session state inflates heavy queries
irrecoverably (pagerank 58.5 s fresh vs 96.7 s after 230 in-session
queries; part_pair samples within one JVM: 13.0 s best rep, 27–42 s
for every later rep). Corroboration-by-extra-reps cannot catch it
because later reps inflate TOGETHER. But one-sample-per-JVM
over-corrects: a cold JVM pays JIT interpretation for most of the run
(measured 7.1 s vs 1.3 s warm on the same sf1 query). So the anchor
protocol is: a FRESH subprocess JVM per (query, sf) arm, a few reps
INSIDE that JVM (JIT warms on this query alone — no 230-query session
state), min-of-reps as the anchor. Arm JVMs are launched round-robin
across reps of the whole arm list, so slow box-load drift hits all
arms equally. Each sample carries a build/exec split (plan compile
stays out of the exec number).

Usage:
  python tools/fresh_anchor.py --queries q1,q2 --sf-dirs D1,D2 \
      [--reps 3] [--jvm-reps 1] [--json OUT]
reps = total in-JVM samples per arm across all its JVMs; jvm-reps =
how many fresh JVMs each arm gets (each runs ceil(reps/jvm_reps)
samples).

Child mode (internal): --child QUERY SF_DIR REPS → prints JSON samples.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(query: str, sf_dir: str, reps: int) -> None:
    sys.path.insert(0, REPO)
    from py_etl_spark import queries as Q
    from py_etl_spark.session import get_spark

    spark = get_spark()
    for _ in range(reps):
        t0 = time.monotonic()
        df = Q.REGISTRY[query].fn(spark, sf_dir)
        t1 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.monotonic()
        print(
            "SAMPLE "
            + json.dumps(
                {
                    "build": round(t1 - t0, 3),
                    "exec": round(t2 - t1, 3),
                    "wall": round(t2 - t0, 3),
                }
            ),
            flush=True,
        )
    # Reap the JVM before exiting (r11): without an explicit wait() the
    # gateway JVM outlives this python briefly, is reparented to init,
    # and its CPU time (~35 cpu-s per anchor) never lands in ANY
    # ancestor's cutime — bench's external-load meter then misreads our
    # own anchors as ~3 "external" cores each (measured). Closing the
    # JVM's stdin triggers its die-on-EOF monitor; wait() folds its
    # jiffies into this process's cutime, which subprocess.run's wait
    # then folds into the caller's.
    try:
        gw = spark.sparkContext._gateway
        spark.stop()
        proc = getattr(gw, "proc", None)
        if proc is not None:
            try:
                proc.stdin.close()
            except Exception:
                proc.terminate()
            try:
                proc.wait(timeout=30)
            except Exception:
                proc.kill()
                proc.wait(timeout=10)
    except Exception:
        pass  # accounting aid only — never fail the anchor over it


def run_child(
    query: str, sf_dir: str, reps: int, timeout: int = 1800
) -> list[dict]:
    p = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            query,
            sf_dir,
            str(reps),
        ],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    samples = [
        json.loads(line[len("SAMPLE "):])
        for line in p.stdout.splitlines()
        if line.startswith("SAMPLE ")
    ]
    if not samples:
        sys.stderr.write(
            f"child failed for {query} @ {sf_dir}: rc={p.returncode}\n"
            + p.stderr[-2000:]
            + "\n"
        )
    return samples


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", nargs=3, metavar=("QUERY", "SF_DIR", "REPS"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--sf-dirs", default="/tmp/spark_graft_sf10")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--jvm-reps", type=int, default=1)
    ap.add_argument("--json", dest="json_out", default="")
    args = ap.parse_args()
    if args.child:
        child(args.child[0], args.child[1], int(args.child[2]))
        return

    queries = [q for q in args.queries.split(",") if q]
    sf_dirs = [d for d in args.sf_dirs.split(",") if d]
    arms: dict[tuple[str, str], list[dict]] = {
        (q, d): [] for q in queries for d in sf_dirs
    }
    per_jvm = -(-args.reps // args.jvm_reps)  # ceil
    for rep in range(args.jvm_reps):
        for q in queries:
            for d in sf_dirs:
                ss = run_child(q, d, per_jvm)
                arms[(q, d)].extend(ss)
                print(f"  jvm{rep} {q} @ {d}: {ss}", flush=True)
    out: dict[str, dict] = {}
    for (q, d), samples in arms.items():
        key = f"{q}@{os.path.basename(d)}"
        if samples:
            out[key] = {
                "min_wall": min(s["wall"] for s in samples),
                "min_exec": min(s["exec"] for s in samples),
                "min_build": min(s["build"] for s in samples),
                "n": len(samples),
                "samples": samples,
            }
        else:
            out[key] = {"error": "all samples failed"}
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
