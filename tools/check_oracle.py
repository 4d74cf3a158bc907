#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Runs each SparkEntry query result (parquet dumped by graft.Verify) against
the DuckDB oracle SQL over the same testdata tables, normalizes (sort
columns by name, sort rows), and reports exact row/schema/value matches.

Fidelity with the real driver (hard-won, r10): the driver hashes typed
values, so a DECIMAL output column hash-fails even when the string repr
matches a DOUBLE oracle. This replica therefore ALSO:
  - reads each Spark result's parquet FOOTER schema and fails on any
    decimal-typed output column (the r7/r10 escape class), and
  - compares type CLASSES (int/float/decimal/...) between the Spark
    parquet schema and the DuckDB oracle result, per column.
Not part of the shipped library.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pyarrow.types as pat


def pa_type_class(t):
    if pat.is_decimal(t): return "decimal"
    if pat.is_integer(t): return "int"
    if pat.is_floating(t): return "float"
    if pat.is_boolean(t): return "bool"
    if pat.is_string(t) or pat.is_large_string(t): return "str"
    if pat.is_date(t): return "date"
    if pat.is_timestamp(t): return "timestamp"
    if pat.is_binary(t) or pat.is_large_binary(t): return "binary"
    if pat.is_list(t) or pat.is_large_list(t): return "list"
    return str(t)


def duck_type_class(t):
    s = str(t).upper()
    if s.startswith("DECIMAL") or s == "HUGEINT": return "decimal"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"): return "int"
    if s in ("FLOAT", "DOUBLE", "REAL"): return "float"
    if s == "BOOLEAN": return "bool"
    if s == "VARCHAR": return "str"
    if s == "DATE": return "date"
    if s.startswith("TIMESTAMP"): return "timestamp"
    if s == "BLOB": return "binary"
    if s.endswith("[]"): return "list"
    return s


def spark_schema(res_glob):
    """Column -> pyarrow type class, from the first parquet footer."""
    f = sorted(glob.glob(res_glob))[0]
    sch = pq.read_schema(f)
    return {name: pa_type_class(sch.field(name).type) for name in sch.names}


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
        # driver-parity: DECIMAL in the OUTPUT schema is an automatic fail
        # (its hasher normalizes Decimal vs float differently per engine)
        sch = spark_schema(res_glob)
        dec_cols = [c for c, k in sch.items() if k == "decimal"]
        if dec_cols:
            results[name] = f"DECIMAL_OUTPUT cols={dec_cols} (driver hash-fails these)"
            continue
        got = con.sql(f"SELECT * FROM '{res_glob}'").fetchdf()
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" EMPTY!" if len(got)==0 else "")
            continue
        try:
            rel = con.sql(oracles[name])
            exp_types = dict(zip(rel.columns, [duck_type_class(t) for t in rel.types]))
            exp = rel.fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            results[name] = f"SCHEMA_MISMATCH cols got={list(got.columns)} exp={list(exp.columns)}"
            continue
        # type-CLASS parity between the Spark parquet footer and the oracle
        # (decimal-vs-double, int-vs-float etc. — the r10 q24 escape class).
        # DuckDB SUM(int)->HUGEINT maps to "decimal" here; that's a real
        # oracle bug too (CLAUDE.md: always CAST(... AS BIGINT)).
        tmm = [(c, sch.get(c), exp_types.get(c)) for c in got.columns
               if sch.get(c) != exp_types.get(c)]
        if tmm:
            results[name] = f"TYPE_CLASS_MISMATCH {tmm}"
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
