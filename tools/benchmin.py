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
    names = sorted(mins[0]["queries"])
    for q in names:
        cells = [m["queries"].get(q) for m in mins]
        ratio = (
            f"{cells[1] / cells[0]:.1f}×"
            if len(cells) > 1 and cells[0] and cells[1]
            else ""
        )
        row = " | ".join(f"{c:.3f}" if c is not None else "—" for c in cells)
        print(f"| {q.split('_')[0]} | {row} | {ratio} |")
    for m in mins:
        print(f"total {m['sf']}: {m['value']:.1f} s over {len(m['queries'])}")


if __name__ == "__main__":
    if sys.argv[1] == "--table":
        table(sys.argv[2:])
    else:
        json.dump(fold(sys.argv[2:]), open(sys.argv[1], "w"), indent=None)
        print(json.load(open(sys.argv[1]))["value"])
