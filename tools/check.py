#!/usr/bin/env python3
"""Dev-only self-check replicating the driver's DuckDB-oracle compare.

NOT part of the graft library (the shipped code is pure Scala/Spark).
Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir parquet
tables, and compares: column names (sorted), row count, and exact
values after sorting columns by name and rows by value.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: cols spark={gc} oracle={ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}"); n_fail += 1; continue
        if gr != er:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}"); n_fail += 1; continue
        print(f"PASS {name} ({len(gr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
