#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare Verify.scala's
parquet dumps against the DuckDB oracle SQL (oracle_sql.json).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Per query: row-count match, schema (sorted column names) match, and an
exact value compare with columns sorted by name and rows sorted by all
columns (NaN == NaN). Mirrors the driver's hash compare semantics.
"""
import sys, json, os, glob, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not values_equal(x, y):
                return False, f"col {c} row {i}: {x!r} != {y!r}"
    return True, None


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    names = sorted(only) if only else sorted(oracle)
    for name in names:
        if name not in oracle:
            print(f"{name}: NOT IN oracle_sql.json")
            failures += 1
            continue
        pdir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"{name}: NO SPARK OUTPUT at {pdir}")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                             ignore_index=True)
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        ok, why = frames_equal(norm(spark_df), norm(ora_df))
        if ok:
            print(f"{name}: OK ({len(spark_df)} rows)")
        else:
            print(f"{name}: MISMATCH — {why}")
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
