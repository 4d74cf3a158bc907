#!/usr/bin/env python3
"""Dev-only: time every DuckDB oracle query at a given SF.

Complements check_oracle.py (correctness) with the BASELINE.md timing
side: runs each oracle SQL from <outDir>/oracle_sql.json over the
<sfDir> parquet views, warm-cache min-of-2 for fast queries (single run
past --rerun-cap seconds), per-query interrupt at --timeout seconds.
Writes a JSON artifact {query: seconds | "TIMEOUT"} and prints totals.

Usage: time_oracle.py <outDir> <sfDir> <outJson>
         [--skip q91_x,q96_y,...] [--timeout 300] [--rerun-cap 5]
"""
import json, sys, time, threading
import duckdb

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--"))
    out_dir, sf_dir, out_json = args
    skip = set(opts.get("skip", "").split(",")) - {""}
    timeout = float(opts.get("timeout", "300"))
    rerun_cap = float(opts.get("rerun-cap", "5"))
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times = {}
    def timed_run(sql):
        done = threading.Event()
        def watchdog():
            if not done.wait(timeout):
                con.interrupt()
        w = threading.Thread(target=watchdog, daemon=True); w.start()
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            dt = time.time() - t0
        except Exception as e:
            dt = "TIMEOUT" if time.time() - t0 >= timeout - 1 else f"ERROR: {e}"
        done.set()
        return dt
    for name in sorted(oracles):
        if name in skip:
            times[name] = "SKIPPED"
            print(f"{name}: SKIPPED", flush=True)
            continue
        dt = timed_run(oracles[name])
        if isinstance(dt, float) and dt < rerun_cap:
            dt2 = timed_run(oracles[name])
            if isinstance(dt2, float):
                dt = min(dt, dt2)
        times[name] = round(dt, 3) if isinstance(dt, float) else dt
        print(f"{name}: {times[name]}", flush=True)
    with open(out_json, "w") as f:
        json.dump(times, f, indent=0, sort_keys=True)
    ok = [v for v in times.values() if isinstance(v, float)]
    bad = {k: v for k, v in times.items() if not isinstance(v, (int, float))
           and v != "SKIPPED"}
    print(f"\ntimed {len(ok)} queries, total {sum(ok):.1f} s; "
          f"skipped {sum(1 for v in times.values() if v=='SKIPPED')}; "
          f"problems: {bad if bad else 'none'}")

if __name__ == "__main__":
    main()
