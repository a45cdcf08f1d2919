#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each dump under
OUT_DIR (written by `graft.Verify`), run the matching oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables, canonicalize
(sort columns by name, sort rows, normalize floats), and compare.

Usage: python3 tools/oracle_compare.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    # floats: round to 6 significant-ish decimals to absorb ulp noise
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].astype("float64").round(6)
        elif df[c].dtype == "object":
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        d = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark dump"); n_fail += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            ora_df = con.execute(oracle[name]).fetchdf()
            a, b = canon(spark_df), canon(ora_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
                n_fail += 1
            elif len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1
            elif not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())} differing rows; first:")
                print(a[bad].head(3)); print(b[bad].head(3)); n_fail += 1
            else:
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
