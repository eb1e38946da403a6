#!/usr/bin/env python
"""Anchor-to-anchor round tracking (VERDICT r10 item 7).

Fresh-JVM anchors (tools/fresh_anchor.py protocol: fresh subprocess JVM
per (query, sf) arm, in-JVM min-of-reps) are the only round-over-round
comparable numbers for heavy queries — single-session sweep totals mix
in session state (JIT pressure, UI-store GC, page cache) that SCALING.md
§10/§11 measured at up to 2.4×. This tool diffs the `sf10.fresh_anchors`
blocks of two BENCH_DETAIL.json files and prints the markdown table the
round record leads with.

Usage:
  python tools/anchor_compare.py OLD_DETAIL.json NEW_DETAIL.json \
      [--label-old r10] [--label-new r11]

Pull the previous round's detail from git without touching the working
tree:  git show <gate-commit>:BENCH_DETAIL.json > /tmp/old_detail.json
"""

from __future__ import annotations

import argparse
import json


def anchors(path: str) -> dict[str, dict]:
    with open(path) as fh:
        d = json.load(fh)
    return d.get("sf10", {}).get("fresh_anchors", {})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--label-old", default="old")
    ap.add_argument("--label-new", default="new")
    args = ap.parse_args()
    a_old, a_new = anchors(args.old), anchors(args.new)
    names = sorted(
        set(a_old) | set(a_new),
        key=lambda n: -(a_new.get(n, a_old.get(n, {})).get("min_wall", 0)),
    )
    lo, ln = args.label_old, args.label_new
    print(
        f"| query (sf10 fresh anchor) | {lo} wall | {ln} wall | Δ wall "
        f"| {lo} exec | {ln} exec |"
    )
    print("|---|---|---|---|---|---|")
    for n in names:
        o, w = a_old.get(n, {}), a_new.get(n, {})
        ow, nw = o.get("min_wall"), w.get("min_wall")
        oe, ne = o.get("min_exec"), w.get("min_exec")
        if ow and nw:
            delta = f"{(nw - ow) / ow * 100:+.0f}%"
        else:
            delta = "n/a (not anchored both rounds)"
        fmt = lambda v: f"{v:.2f} s" if v is not None else "—"
        print(
            f"| {n} | {fmt(ow)} | {fmt(nw)} | {delta} "
            f"| {fmt(oe)} | {fmt(ne)} |"
        )


if __name__ == "__main__":
    main()
