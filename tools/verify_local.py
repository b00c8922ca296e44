#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same testdata tables, and
compare (columns sorted by name, rows sorted, float-tolerant + a strict
bitwise report so divergence is visible before the real gate runs).

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> ns, ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3:])  # optional: restrict to named queries
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d):
            print(f"FAIL {name}: no spark output dir"); failures += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f)
                             for f in glob.glob(f"{d}/*.parquet")],
                            ignore_index=True)
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); failures += 1; continue
        ok, strict = True, True
        for c in g.columns:
            a, b = g[c], w[c]
            if pd.api.types.is_float_dtype(a):
                eq = np.isclose(a.fillna(np.nan), b.fillna(np.nan),
                                rtol=1e-9, atol=1e-9, equal_nan=True)
                bit = (a.fillna(-1.23e300).values == b.fillna(-1.23e300).values)
                if not eq.all():
                    ok = False
                    bad = np.where(~eq)[0][:3]
                    print(f"  {name}.{c} mismatch rows {bad}: "
                          f"{a.iloc[bad].tolist()} vs {b.iloc[bad].tolist()}")
                if not bit.all():
                    strict = False
            else:
                eq = (a.fillna("\0NULL").values == b.fillna("\0NULL").values) \
                    if a.dtype == object else (a.isna() == b.isna()).values & \
                    (a.fillna(0).values == b.fillna(0).values)
                if not np.asarray(eq).all():
                    ok = False
                    bad = np.where(~np.asarray(eq))[0][:3]
                    print(f"  {name}.{c} mismatch rows {bad}: "
                          f"{a.iloc[bad].tolist()} vs {b.iloc[bad].tolist()}")
        if ok:
            tag = "PASS" if strict else "PASS(~fp)"
            print(f"{tag} {name}: {len(g)} rows")
            if not strict:
                failures += 0  # tolerate, but visible
        else:
            print(f"FAIL {name}"); failures += 1
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
