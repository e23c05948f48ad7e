#!/usr/bin/env python3
"""Fold N Bench JSON files into per-query minima and print a
markdown scaling table plus totals — the round's bench-pair helper.

Usage: benchmin.py out.json a.json b.json c.json
       benchmin.py --table sf01min.json sf1min.json [sf3min.json]
       benchmin.py --norm ref.json cur.json

Every command accepts BOTH artifact shapes: a plain Bench JSON line
({"metric":"total",...}) and the round driver's wrapper
({"n":..,"rc":..,"cpus":..,"sf":..,"tail":"..."}), whose metric line
is embedded as the LAST {"metric":"total"...} line of the captured
stdout tail — load() unwraps it (round-16 verdict task 2: the
documented --norm invocation used to crash on BENCH_rN.json with
KeyError: 'value').

--norm answers "window or regression?" mechanically: each Bench run
carries a fixed "calibration" probe whose cost is independent of the
battery and the data. THE normalizer is the cpu probe — a
deterministic single-thread xorshift loop, scheduler-free, so its
ratio between two runs measures raw host speed and nothing else. The
spark probe (a sub-second tiny range->groupBy through the noop sink)
mixes scheduler + codegen warm-up and legitimately disagrees with the
cpu probe in some windows (r15->r16: cpu 1.143 vs spark 0.713, which
would flip the verdict depending on the choice) — it is reported as a
WARN-ONLY scheduler canary, never used to normalize.
"""
import json
import re
import sys


def load(path):
    """Read one bench artifact, unwrapping the driver's {tail} shape."""
    d = json.load(open(path))
    if "value" in d and "queries" in d:
        return d
    tail = d.get("tail", "")
    lines = [ln for ln in tail.splitlines() if '"metric"' in ln and '"total"' in ln]
    if not lines:
        raise SystemExit(
            f"{path}: neither a Bench metric line nor a driver wrapper "
            "with one in its tail")
    # The parseable short-key line prints LAST (Bench.scala) — take it.
    m = re.search(r"\{.*\}", lines[-1])
    if m is None:
        raise SystemExit(
            f"{path}: tail line mentions metric/total but carries no "
            f"JSON object: {lines[-1]!r}")
    out = json.loads(m.group(0))
    out["value"] = float(out["value"])
    return out


def fold(paths):
    runs = [load(p) for p in paths]
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
            k: min(c[k] for c in cals) for k in cals[0] if k != "host_ok"
        }
    return out


def table(paths):
    mins = [load(p) for p in paths]
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
    ref, cur = load(ref_path), load(cur_path)
    raw = cur["value"] / ref["value"]
    print(f"raw total ratio (cur/ref): {raw:.3f}")
    rc, cc = ref.get("calibration"), cur.get("calibration")
    if not (rc and cc):
        print("calibration missing in one file — cannot normalize "
              "(pre-r15 bench artifacts lack the probe)")
        return
    window = float(cc["cpu"]) / float(rc["cpu"])
    print(f"calibration cpu ratio (cur/ref): {window:.3f}  <- THE normalizer "
          "(single-thread, scheduler-free)")
    if "spark" in rc and "spark" in cc:
        sprk = float(cc["spark"]) / float(rc["spark"])
        print(f"calibration spark ratio (cur/ref): {sprk:.3f}  (warn-only "
              "scheduler canary — sub-second, mixes codegen warm-up)")
        if max(sprk, 1 / sprk) > 1.5:
            print("  WARNING: spark probe moved >1.5x between windows — "
                  "scheduler conditions differ; trust the 3-run-min "
                  "artifacts over any single run")
    print(f"window-normalized total ratio: {raw / window:.3f} "
          f"(raw {raw:.3f} ÷ cpu-probe window {window:.3f})")


if __name__ == "__main__":
    if sys.argv[1] == "--table":
        table(sys.argv[2:])
    elif sys.argv[1] == "--norm":
        norm(sys.argv[2], sys.argv[3])
    else:
        json.dump(fold(sys.argv[2:]), open(sys.argv[1], "w"), indent=None)
        print(load(sys.argv[1])["value"])
