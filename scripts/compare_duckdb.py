#!/usr/bin/env python3
"""Per-query DuckDB-vs-Spark timing comparison at a given scale factor.

Usage:
  python3 scripts/compare_duckdb.py <sfDir> <bench_json> <oracle_sql_json>

bench_json is Bench's output line; oracle_sql_json comes from a Verify run.
Prints one line per oracle query sorted by spark/duck ratio, plus totals —
the working view of where the engine stands against the baseline.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, bench_path, oracle_path = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    spark_times = json.load(open(bench_path))["queries"]
    oracle = json.load(open(oracle_path))
    rows, tot_d, tot_s = [], 0.0, 0.0
    for name, sql in oracle.items():
        con.sql(sql).fetchall()  # warmup
        t0 = time.time()
        con.sql(sql).fetchall()
        d = time.time() - t0
        s = spark_times.get(name, float("nan"))
        if s != s or s < 0:  # NaN (missing from bench) or -1.0 (bench failure)
            print(f"{name:26s} duck={d:7.3f}s  spark=   n/a  (no spark timing)")
            continue
        # totals cover only the queries timed on BOTH engines
        tot_d += d
        tot_s += s
        rows.append((name, d, s, s / d if d > 0 else float("inf")))
    for name, d, s, r in sorted(rows, key=lambda x: -x[3]):
        print(f"{name:26s} duck={d:7.3f}s  spark={s:7.3f}s  ratio={r:6.1f}")
    print(f"\nTOTAL duck={tot_d:.2f}s spark={tot_s:.2f}s ratio={tot_s / tot_d:.2f}")


if __name__ == "__main__":
    main()
