#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness check.

Dev tool only (driver-side python libs) — NOT part of the Scala library.
Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Mimics the driver: for each query in oracle_sql.json, run the SQL in
DuckDB over views named after the parquet tables, read the Spark result
parquet, sort columns by name, sort rows, compare values exactly.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b) or (math.isnan(float(a)) and math.isnan(float(b)))
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck = canon(con.execute(sql).fetchdf())
            spark = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(duck.columns) != list(spark.columns):
            print(f"FAIL {name}: columns duck={list(duck.columns)} spark={list(spark.columns)}")
            n_fail += 1
            continue
        if len(duck) != len(spark):
            print(f"FAIL {name}: rows duck={len(duck)} spark={len(spark)}")
            n_fail += 1
            continue
        bad = []
        for col in duck.columns:
            dv, sv = duck[col].tolist(), spark[col].tolist()
            for i, (x, y) in enumerate(zip(dv, sv)):
                if not cell_eq(x, y):
                    bad.append((col, i, x, y))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ mismatches, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(duck)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
