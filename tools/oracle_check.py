#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare, mimicking the driver
(columns sorted by name, values hashed). Driver-side python has duckdb;
this script is tooling only — NOT part of the Scala library.

Usage: python3 tools/oracle_check.py [sfDir] [verifyOutDir]
"""
import sys, glob, json, math

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails, passes = [], []


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def cells_equal(a, b):
    import numpy as np
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else a
        b = list(b) if b is not None else b
        if not isinstance(a, list) or not isinstance(b, list) or len(a) != len(b):
            return False
        return all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b


for name, sql in sorted(oracle.items()):
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        fails.append((name, "no spark output parquet"))
        continue
    try:
        got = norm(con.execute(
            "SELECT * FROM read_parquet(?)", [files]).fetchdf())
        exp = norm(con.execute(sql).fetchdf())
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"schema: spark={list(got.columns)} duckdb={list(exp.columns)}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"rowcount: spark={len(got)} duckdb={len(exp)}"))
        continue
    bad = None
    for col in got.columns:
        for i, (a, b) in enumerate(zip(got[col], exp[col])):
            if not cells_equal(a, b):
                bad = f"first diff col={col} row={i}: spark={a!r} duckdb={b!r}"
                break
        if bad:
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)
        dt = [f"{c}: spark={got[c].dtype} duckdb={exp[c].dtype}"
              for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        if dt:
            print(f"WARN {name} dtype drift: " + "; ".join(dt))

print(f"PASS {len(passes)}/{len(oracle)}: {' '.join(passes)}")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
