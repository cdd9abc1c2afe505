#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query result
dumped by graft.Verify, run the matching oracle SQL in DuckDB over the same
sf dir and compare (columns sorted by name, rows sorted, values stringified).

Usage: check_parity.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [c.lower() for c in got_rel.columns]
            got = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            continue
        gc, gr = norm(got, got_cols)
        ec, er = norm(exp, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
        elif gr != er:
            diff = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            extra = f" rows {len(gr)} vs {len(er)}"
            print(f"FAIL {name}: values differ;{extra}; first diffs: {diff}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(gr)} rows)")
    print(f"{n_ok}/{len(oracle)} queries match")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
