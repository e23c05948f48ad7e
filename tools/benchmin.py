#!/usr/bin/env python3
"""Fold N Bench JSON files into per-query minima and print a
markdown scaling table plus totals — the round's bench-pair helper.

Usage: benchmin.py out.json a.json b.json c.json
       benchmin.py --table sf01min.json sf1min.json [sf3min.json]
       benchmin.py --norm ref.json cur.json

--norm answers "window or regression?" mechanically: each Bench run
carries a fixed "calibration" probe (cpu = single-thread xorshift
loop, spark = fixed tiny range→groupBy through the noop sink) whose
cost is independent of the battery and the data, so the ratio of
calibration values between two runs measures the HOST window, not
the code. --norm prints the raw total ratio, the calibration ratios,
and the window-normalized total ratio (raw ÷ spark-probe ratio).
"""
import json
import sys


def fold(paths):
    runs = [json.load(open(p)) for p in paths]
    qs = {}
    for r in runs:
        for q, s in r["queries"].items():
            qs[q] = min(qs.get(q, float("inf")), s)
    out = {
        "metric": "total",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": {q: qs[q] for q in sorted(qs)},
        "failed": sorted({f for r in runs for f in r.get("failed", [])}),
        "sf": runs[0].get("sf"),
        "runs": len(runs),
    }
    # Carry the calibration probe through a fold as the per-probe min
    # across runs — same reduction as the queries it normalizes.
    cals = [r["calibration"] for r in runs if "calibration" in r]
    if cals:
        out["calibration"] = {
            k: min(c[k] for c in cals) for k in cals[0]
        }
    return out


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
        if "calibration" in m:
            print(f"  calibration {m['sf']}: {m['calibration']}")


def norm(ref_path, cur_path):
    ref, cur = json.load(open(ref_path)), json.load(open(cur_path))
    raw = cur["value"] / ref["value"]
    print(f"raw total ratio (cur/ref): {raw:.3f}")
    rc, cc = ref.get("calibration"), cur.get("calibration")
    if not (rc and cc):
        print("calibration missing in one file — cannot normalize "
              "(pre-r15 bench artifacts lack the probe)")
        return
    for k in ("cpu", "spark"):
        print(f"calibration {k} ratio (cur/ref): {cc[k] / rc[k]:.3f}")
    window = cc["spark"] / rc["spark"]
    print(f"window-normalized total ratio: {raw / window:.3f} "
          f"(raw {raw:.3f} ÷ spark-probe window {window:.3f})")


if __name__ == "__main__":
    if sys.argv[1] == "--table":
        table(sys.argv[2:])
    elif sys.argv[1] == "--norm":
        norm(sys.argv[2], sys.argv[3])
    else:
        json.dump(fold(sys.argv[2:]), open(sys.argv[1], "w"), indent=None)
        print(json.load(open(sys.argv[1]))["value"])
