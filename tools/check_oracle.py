#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles: replays the driver's comparison.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each <name> dir in verify_out: load Spark parquet result, run the
matching oracle_sql.json entry in DuckDB over views of the sf_dir parquet
tables, sort columns by name, compare row sets. Dev tool only — the real
gate is the driver's CORRECTNESS_r{N}.json.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file tables; Spark-written corpora
        # (e.g. the ScaleData sf1.0 rehearsal) are directories of parts
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        # sorted: glob order is not part-number order; multi-part ordered
        # outputs must concatenate part-00000, part-00001, ...
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        spark = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(spark)} rows")
            continue
        try:
            duck = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"✗ {name}: DUCKDB ERROR: {e}")
            fail += 1
            continue
        s, k = norm(spark), norm(duck)
        if list(s.columns) != list(k.columns):
            print(f"✗ {name}: COLUMNS spark={list(s.columns)} duck={list(k.columns)}")
            fail += 1
            continue
        if len(s) != len(k):
            print(f"✗ {name}: ROWS spark={len(s)} duck={len(k)}")
            fail += 1
            continue
        # exact compare in given order (queries are totally ordered)
        mism = []
        for c in s.columns:
            a, b = s[c].values, k[c].values
            if pd.api.types.is_float_dtype(s[c]) or pd.api.types.is_float_dtype(k[c]):
                aa = pd.to_numeric(s[c], errors="coerce").values.astype(float)
                bb = pd.to_numeric(k[c], errors="coerce").values.astype(float)
                eq = (np.isnan(aa) & np.isnan(bb)) | (aa == bb)
            else:
                eq = pd.Series(a).astype(str).values == pd.Series(b).astype(str).values
            if not eq.all():
                i = int(np.argmin(eq))
                mism.append(f"{c}[row{i}]: spark={a[i]!r} duck={b[i]!r}")
        if mism:
            print(f"✗ {name}: VALUES {'; '.join(mism[:3])}")
            fail += 1
        else:
            # dtype advisory (driver may or may not care)
            dt = [f"{c}:{s[c].dtype}/{k[c].dtype}" for c in s.columns
                  if str(s[c].dtype) != str(k[c].dtype)]
            note = f"  (dtype diff: {', '.join(dt)})" if dt else ""
            print(f"✓ {name}: {len(s)} rows{note}")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
