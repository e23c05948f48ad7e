#!/usr/bin/env python3
"""Fold N Bench JSON files into per-query minima and print a
markdown scaling table plus totals — the round's bench-pair helper.

Usage: benchmin.py out.json a.json b.json c.json
       benchmin.py --table sf01min.json sf1min.json [sf3min.json]
"""
import json
import sys


def fold(paths):
    runs = [json.load(open(p)) for p in paths]
    qs = {}
    for r in runs:
        for q, s in r["queries"].items():
            qs[q] = min(qs.get(q, float("inf")), s)
    return {
        "metric": "total",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": {q: qs[q] for q in sorted(qs)},
        "failed": sorted({f for r in runs for f in r.get("failed", [])}),
        "sf": runs[0].get("sf"),
        "runs": len(runs),
    }


def table(paths):
    mins = [json.load(open(p)) for p in paths]
    # Union across ALL files: a query present only in a later rung
    # must still get a row (with em-dashes for the rungs it skipped).
    names = sorted({q for m in mins for q in m["queries"]})
    for q in names:
        cells = [m["queries"].get(q) for m in mins]
        # One ratio per adjacent rung pair, so a 3-file table shows
        # both the sf1/sf0.1 and the sf3/sf1 growth.
        ratios = " | ".join(
            f"{b / a:.1f}×" if a and b else "—"
            for a, b in zip(cells, cells[1:])
        )
        row = " | ".join(f"{c:.3f}" if c is not None else "—" for c in cells)
        print(f"| {q.split('_')[0]} | {row} | {ratios} |")
    for m in mins:
        print(f"total {m['sf']}: {m['value']:.1f} s over {len(m['queries'])}")


if __name__ == "__main__":
    if sys.argv[1] == "--table":
        table(sys.argv[2:])
    else:
        json.dump(fold(sys.argv[2:]), open(sys.argv[1], "w"), indent=None)
        print(json.load(open(sys.argv[1]))["value"])
