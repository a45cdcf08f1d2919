#!/usr/bin/env python3
"""Local emulation of the driver's t2 compare: run each oracle_sql in
DuckDB over the sf tables, canonicalize both result sets (columns sorted
by name, rows sorted, doubles rounded to 1e-9, timestamps as UTC
ISO-8601), and hash-compare against the Verify parquet dumps."""
import duckdb, glob, hashlib, json, math, sys, datetime

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon_cell(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon_cell(r[i]) for i in idx) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return [cols[i] for i in idx], h, lines

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        d = con.sql(sql)
        dcols, dhash, dlines = canon(d.columns, d.fetchall())
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fails += 1; continue
    try:
        s = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols, shash, slines = canon(s.columns, s.fetchall())
    except Exception as e:
        print(f"FAIL {name}: spark dump error: {e}"); fails += 1; continue
    if dcols != scols:
        print(f"FAIL {name}: schema mismatch duckdb={dcols} spark={scols}"); fails += 1
    elif dhash != shash:
        print(f"FAIL {name}: hash mismatch ({len(dlines)} vs {len(slines)} rows)")
        for a, b in list(zip(dlines, slines))[:400]:
            if a != b:
                print(f"  duckdb: {a[:200]}\n  spark : {b[:200]}"); break
        fails += 1
    else:
        print(f"OK   {name} ({len(slines)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} match")
sys.exit(1 if fails else 0)
