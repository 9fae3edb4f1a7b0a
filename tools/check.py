#!/usr/bin/env python3
"""Dev-only self-check replicating the driver's DuckDB-oracle compare.

NOT part of the graft library (the shipped code is pure Scala/Spark).
Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Byte-compatible with the driver's gate (round-1 lesson: a repr()-based
compare was blind to two real failure modes and shipped 9 red rows as
green). This version follows the driver's path exactly:
  - load both sides into pandas (duckdb .df()),
  - sort columns by name, sort rows with DataFrame.sort_values over all
    columns (this CRASHES on array-typed cells, as the driver does),
  - compare dtypes-sensitive value hashes via pd.util.hash_pandas_object
    (int64 vs float64/HUGEINT-backed object mismatch FAILS, as the
    driver does).
Reports rows_match / schema_match / hash_match per query like
CORRECTNESS_r{N}.json.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(cols).reset_index(drop=True)  # raises on array cells
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            continue
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
        except Exception as e:
            print(f"FAIL {name}: spark side: {type(e).__name__}: {e}")
            n_fail += 1; continue
        if name not in oracle:
            # rows-only check — but the driver still sorts, so canon() above
            # must have succeeded (array columns are banned here too).
            print(f"PASS {name} (rows-only, {len(got)} rows)"); n_pass += 1
            continue
        try:
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle side: {type(e).__name__}: {e}")
            n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} "
                  f"oracle={list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1; continue
        try:
            hg = pd.util.hash_pandas_object(got, index=False)
            he = pd.util.hash_pandas_object(exp, index=False)
        except Exception as e:
            print(f"FAIL {name}: hash: {type(e).__name__}: {e}")
            n_fail += 1; continue
        if not hg.equals(he):
            bad = (hg != he)
            idx = list(got.index[bad])[:3]
            diffs = [(tuple(map(repr, got.loc[i])), tuple(map(repr, exp.loc[i])))
                     for i in idx]
            dts = [(c, str(got[c].dtype), str(exp[c].dtype))
                   for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
            print(f"FAIL {name}: hash mismatch; dtype diffs={dts}; "
                  f"first row diffs: {diffs}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
