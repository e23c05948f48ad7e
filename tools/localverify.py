#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate:
reads each <name> parquet dir produced by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same
testdata, and compares (rows, schema-ish, values).

Usage: localverify.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # Type-sensitive like the driver's hasher: a float renders with an
    # "f:" tag so HUGEINT-widened oracle results (float64 after
    # fetchdf) FAIL against Spark's BIGINT instead of silently
    # normalizing — round 7's t8 escaped the local gate exactly here.
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.10g}"
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            o = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            s = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"{name}: SPARK OUTPUT MISSING {str(e)[:120]}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(o) != len(s):
            ok = False
            msgs.append(f"rows spark={len(s)} oracle={len(o)}")
        ocols, scols = sorted(o.columns), sorted(s.columns)
        if ocols != scols:
            ok = False
            msgs.append(f"cols spark={scols} oracle={ocols}")
        if ok:
            orows = sorted(tuple(norm(v) for v in row) for row in o[ocols].itertuples(index=False))
            srows = sorted(tuple(norm(v) for v in row) for row in s[scols].itertuples(index=False))
            if orows != srows:
                ok = False
                diff = [(a, b) for a, b in zip(orows, srows) if a != b]
                msgs.append(f"values differ in {len(diff)} rows; first: oracle={diff[0][0]} spark={diff[0][1]}")
        if ok:
            n_pass += 1
            print(f"{name}: OK ({len(s)} rows)")
        else:
            n_fail += 1
            print(f"{name}: FAIL {'; '.join(msgs)}")
    # Tolerance verdicts for the four no-oracle entries (m3/m4/q31/q36):
    # graft.Verify emits them machine-readable; surface them in the
    # same pass/fail accounting so "oracle-green" and "tolerance-green"
    # read from one gate.
    try:
        tol = json.load(open(f"{out_dir}/tolerance.json"))
    except FileNotFoundError:
        tol = {}
    if only and tol:
        # graft.Verify skips the tolerance recompute under a query
        # filter, so whatever tolerance.json sits in out_dir is from
        # an EARLIER full run — reporting it as current would turn a
        # broken q31 green from a stale artifact.
        requested = sorted(set(tol) & only)
        if requested:
            print(f"(tolerance verdicts for {', '.join(requested)} skipped: "
                  "filtered verify runs do not recompute tolerance.json — "
                  "run without a filter)")
        tol = {}
    for name, v in sorted(tol.items()):
        if v["pass"]:
            n_pass += 1
            print(f"{name}: OK tolerance ({v['detail']})")
        else:
            n_fail += 1
            print(f"{name}: FAIL tolerance ({v['check']}: {v['detail']})")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
