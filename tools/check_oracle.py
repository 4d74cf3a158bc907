#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Runs each SparkEntry query result (parquet dumped by graft.Verify) against
the DuckDB oracle SQL over the same testdata tables, normalizes (sort
columns by name, sort rows), and reports exact row/schema/value matches.
Not part of the shipped library.
"""
import json, sys, glob, os
import duckdb

def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results = {}
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        res_glob = f"{path}/*.parquet"
        if not glob.glob(res_glob):
            results[name] = "NO_RESULT"
            continue
        got = con.sql(f"SELECT * FROM '{res_glob}'").fetchdf()
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" EMPTY!" if len(got)==0 else "")
            continue
        try:
            exp = con.sql(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            results[name] = f"SCHEMA_MISMATCH cols got={list(got.columns)} exp={list(exp.columns)}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT got={len(got)} exp={len(exp)}"
            continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        # dtype normalization: compare values via string repr per cell
        mismatch = None
        for c in got.columns:
            gv, ev = gs[c], es[c]
            try:
                eq = (gv.astype(str) == ev.astype(str))
            except Exception as e:
                mismatch = f"col {c}: compare error {e}"; break
            if not eq.all():
                i = eq.idxmin()
                mismatch = (f"col {c} row {i}: got={gv[i]!r} ({gv.dtype}) "
                            f"exp={ev[i]!r} ({ev.dtype}) ndiff={int((~eq).sum())}")
                break
        results[name] = "OK" if mismatch is None else f"VALUE_MISMATCH {mismatch}"
    ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY rows=") and "EMPTY" not in v)
    for k, v in results.items():
        print(f"{'PASS' if v=='OK' or (v.startswith('ROWS_ONLY') and 'EMPTY' not in v) else 'FAIL':4} {k}: {v}")
    print(f"\n{ok}/{len(results)} green")

if __name__ == "__main__":
    main()
