#!/usr/bin/env python
"""Interleaved checkout A/B for one registry query.

The host shows minute-scale degraded phases (SCALING §12 machine-probe
adjudication), so sequential single-checkout anchors cannot compare two
code versions. This harness alternates FRESH-JVM arms A,B,A,B,... so a
phase hits both arms equally, and reports per-arm min wall/exec/build
(the min is the least-polluted draw in either phase).

Usage:
  python tools/ab_checkout.py --query NAME --sf-dir DIR \
      --a /tmp/r10base --b /root/repo [--rounds 3] [--jvm-reps 2]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys


def run_arm(repo: str, query: str, sf_dir: str, reps: int) -> list[dict]:
    p = subprocess.run(
        [sys.executable, "tools/fresh_anchor.py", "--child", query, sf_dir, str(reps)],
        cwd=repo, capture_output=True, text=True, timeout=900,
    )
    samples = []
    for line in p.stdout.splitlines():
        if line.startswith("SAMPLE "):
            samples.append(json.loads(line[7:]))
    if not samples:
        print(f"  ARM ERROR rc={p.returncode}: {p.stderr[-500:]}", flush=True)
    return samples


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--a", required=True, help="checkout dir for arm A (baseline)")
    ap.add_argument("--b", required=True, help="checkout dir for arm B (candidate)")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--jvm-reps", type=int, default=2)
    args = ap.parse_args()

    acc: dict[str, list[dict]] = {"A": [], "B": []}
    for r in range(args.rounds):
        for arm, repo in (("A", args.a), ("B", args.b)):
            s = run_arm(repo, args.query, args.sf_dir, args.jvm_reps)
            acc[arm].extend(s)
            print(f"round {r} arm {arm}: {[x['wall'] for x in s]}", flush=True)
    out = {}
    for arm in ("A", "B"):
        s = acc[arm]
        if s:
            out[arm] = {
                "min_wall": min(x["wall"] for x in s),
                "min_exec": min(x["exec"] for x in s),
                "min_build": min(x["build"] for x in s),
                "n": len(s),
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
