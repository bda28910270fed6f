#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet at <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB with views over <sfDir>/*.parquet
  - sort columns by name, compare row-by-row values.
Non-oracle queries (present as parquet dirs without SQL) get a rows-only
report.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = 0
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"  {name:24s} rows-only: {len(spark_df)} rows "
                  f"{'OK' if len(spark_df) > 0 else 'EMPTY!'}")
            if len(spark_df) == 0:
                failures += 1
            continue
        duck_df = con.execute(oracle[name]).fetchdf()
        scols, dcols = sorted(spark_df.columns), sorted(duck_df.columns)
        if scols != dcols:
            print(f"  {name:24s} FAIL schema: spark={scols} duck={dcols}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"  {name:24s} FAIL rows: spark={len(spark_df)} duck={len(duck_df)}")
            failures += 1
            continue
        sv = spark_df[scols].values.tolist()
        dv = duck_df[dcols].values.tolist()
        bad = 0
        for i, (a, b) in enumerate(zip(sv, dv)):
            if [norm(x) for x in a] != [norm(x) for x in b]:
                if bad < 3:
                    print(f"    row {i}: spark={a} duck={b}")
                bad += 1
        if bad:
            print(f"  {name:24s} FAIL {bad}/{len(sv)} rows differ")
            failures += 1
        else:
            print(f"  {name:24s} OK ({len(sv)} rows)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
