#!/usr/bin/env python3
"""Local correctness sweep (builder dev tool — mirrors the driver compare).

For each query dir under <verifyOutDir>: run its oracle SQL in DuckDB over
the <sfDir> parquet tables, load the Spark parquet result, then compare
  - row count
  - column-name set
  - values: columns sorted by name, rows sorted by all columns, floats
    normalized by ABSOLUTE 9-decimal rounding (round(v, 9) — deliberately
    the driver's hash normalization, NOT a relative tolerance: large-
    magnitude doubles must already agree to 1e-9 absolute, so oracles for
    big sums/counts should ROUND() in both engines), everything else
    exactly.

Usage:
  python3 tools/local_compare.py <sfDir> <verifyOutDir> [query ...]
Exit 0 = all match. Run tools/oracle_lint.py as well — value equality here
does NOT imply the driver's type-sensitive hash matches.
"""
import json, math, os, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "partsupp",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if not isinstance(v, (list, tuple)):
        try:
            if pd.isna(v):   # NaN/NaT/None all compare unequal to themselves
                return "<null>"
        except (TypeError, ValueError):
            pass
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return norm_cell(v.item())
    except ImportError:
        pass
    return v

def canon(df):
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = [n for n in sorted(oracles) if (not only or n in only)
             and os.path.isdir(os.path.join(out_dir, n))]
    bad = 0
    for name in names:
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); bad += 1; continue
        sdf = pd.read_parquet(os.path.join(out_dir, name))
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            bad += 1; continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: cols spark={sorted(sdf.columns)} "
                  f"oracle={sorted(odf.columns)}")
            bad += 1; continue
        a, b = canon(sdf), canon(odf)
        if a != b:
            diff = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y) \
                if a and b else 0
            print(f"FAIL {name}: value mismatch, first differing row {diff}:\n"
                  f"  spark : {a[diff] if diff < len(a) else None}\n"
                  f"  oracle: {b[diff] if diff < len(b) else None}")
            bad += 1; continue
        print(f"ok   {name} ({len(sdf)} rows)")
    print(f"\nlocal_compare: {len(names) - bad}/{len(names)} match")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
