#!/usr/bin/env python3
"""Per-query DuckDB timings over the oracle SQL set — the committed duck
side of the bench evidence (BENCH_DUCK.json), measured with the same
warm-median-of-3 posture as graft.Bench's headline numbers.

Usage:
  python3 scripts/bench_duck.py <sfDir> <oracle_sql_json> [out_json]

out_json defaults to BENCH_DUCK.json in the cwd.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_DUCK.json"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    queries, total = {}, 0.0
    for name, sql in sorted(oracle.items()):
        try:
            con.sql(sql).fetchall()  # warmup
            ts = []
            for _ in range(3):
                t0 = time.time()
                con.sql(sql).fetchall()
                ts.append(time.time() - t0)
            med = sorted(ts)[1]
        except Exception as e:
            print(f"[bench_duck] {name} failed: {e}", file=sys.stderr)
            med = -1.0
        queries[name] = med
        if med >= 0:
            total += med
    # honest-aggregate twin of graft.Bench's total_excl_naive_oracle:
    # these oracles are declared-naive kernel replays (per-pixel dHash
    # CTEs, per-gram LM expansion, the recursive curate CTE) — their
    # duck time measures the replay, not a real query, and flatters any
    # spark/duck aggregate. Keep in lockstep with
    # SparkEntry.naiveOracleReplay.
    naive = {"pipeline_curate_portable", "text_lm_ngram", "mm_image_dhash",
             "mm_image_neardup", "mm_video_dedup", "pipeline_media_curate",
             "mm_image_dhash_cross"}
    total_honest = sum(t for q, t in queries.items()
                       if q not in naive and t >= 0)
    out = {"metric": "duckdb_oracle_total", "value": round(total, 6),
           "unit": "sec", "sf": sf_dir, "queries": queries,
           "total_excl_naive_oracle": round(total_honest, 6),
           "naive_oracle_excluded": sorted(naive & set(queries))}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"total": round(total, 3),
                      "total_excl_naive_oracle": round(total_honest, 3),
                      "n": len(queries)}))


if __name__ == "__main__":
    main()
