#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle gate.

Usage: python3 scripts/oracle_check.py <verify_out_dir> <sf_dir> [names...]

Reads each <out>/<name> parquet (written by graft.Verify), runs the
matching SQL from <out>/oracle_sql.json in DuckDB over the sf parquet
tables, sorts columns by name and rows by all columns, and compares.
Dev-tool only (driver-side python env); the shipped library is pure Scala.
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    try:
        import pandas as pd
        if pd.isna(v):  # NaT / pd.NA scalars (nullable timestamps etc.)
            return None
    except (TypeError, ValueError):
        pass
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; Spark-written scale images
        # (graft.ScaleUp) are directories of part-files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_bad += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        # Dtype drift is a hard failure: the driver hashes at a stricter
        # layer than this value compare, and round-1's nine hash_match:false
        # rows were exactly the ones where this check only warned.
        dt_mismatch = [f"{c}:{got[c].dtype}!={want[c].dtype}" for c in got.columns
                       if str(got[c].dtype) != str(want[c].dtype)]
        warn = f" [dtype drift: {dt_mismatch}]" if dt_mismatch else ""
        g = sorted([tuple(norm(v) for v in r) for r in got.itertuples(index=False)],
                   key=lambda t: tuple((x is None, str(x)) for x in t))
        w = sorted([tuple(norm(v) for v in r) for r in want.itertuples(index=False)],
                   key=lambda t: tuple((x is None, str(x)) for x in t))
        bad = None
        maxdiff = 0.0
        for rg, rw in zip(g, w):
            for a, b in zip(rg, rw):
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    d = abs(a - b)
                    maxdiff = max(maxdiff, d)
                    if a != b:
                        bad = bad or (rg, rw)
                elif a != b:
                    bad = bad or (rg, rw)
        if bad:
            print(f"FAIL {name}: first diff (maxfloatdiff={maxdiff:.3e}):\n  spark={bad[0]}\n  duck ={bad[1]}")
            n_bad += 1
        elif dt_mismatch:
            print(f"FAIL {name}: values equal but dtype drift: {dt_mismatch}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows, maxfloatdiff={maxdiff:.3e})")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
