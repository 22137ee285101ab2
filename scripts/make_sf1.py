#!/usr/bin/env python3
"""Deterministic sf1.0 expansion of the driver's sf0.1 testdata: ten
key-shifted copies of every fact/content table (FK-consistent — copy k
of lineitem references copy k of orders/part/supplier), dimensions kept
single. Texts/embeddings repeat verbatim across copies, which is the
REALISTIC shape (crawl corpora are full of exact and near duplicates)
and stresses the dedup family's pair volume. Both engines read the
same parquet, so the oracle compare stays exact at this SF.

Usage: python3 scripts/make_sf1.py [outDir]   (default testdata_sf1)
Build-tooling only (like bench_duck.py) — never imported by the library.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
COPIES = 10


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    # shift constants: one past each table's max key so copies never clash
    shifts = {}
    for table, key in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                       ("part", "p_partkey"), ("orders", "o_orderkey"),
                       ("events", "event_id"), ("events_user", "user_id"),
                       ("documents", "doc_id"), ("embeddings", "vec_id")]:
        src = "events" if table == "events_user" else table
        shifts[table] = con.execute(
            f"SELECT max({key}) + 1 FROM '{SRC}/{src}.parquet'").fetchone()[0]

    def emit(table, select_k):
        parts = " UNION ALL ".join(select_k(k) for k in range(COPIES))
        con.execute(f"COPY ({parts}) TO '{OUT}/{table}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # dimensions: single copy
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                    f"'{OUT}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    emit("customer", lambda k:
         f"SELECT c_custkey + {k * shifts['customer']} AS c_custkey, "
         f"c_name, c_nationkey, c_acctbal, c_mktsegment "
         f"FROM '{SRC}/customer.parquet'")
    emit("supplier", lambda k:
         f"SELECT s_suppkey + {k * shifts['supplier']} AS s_suppkey, "
         f"s_name, s_nationkey, s_acctbal FROM '{SRC}/supplier.parquet'")
    emit("part", lambda k:
         f"SELECT p_partkey + {k * shifts['part']} AS p_partkey, p_name, "
         f"p_brand, p_type, p_size, p_retailprice FROM '{SRC}/part.parquet'")
    emit("orders", lambda k:
         f"SELECT o_orderkey + {k * shifts['orders']} AS o_orderkey, "
         f"o_custkey + {k * shifts['customer']} AS o_custkey, "
         f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
         f"FROM '{SRC}/orders.parquet'")
    emit("lineitem", lambda k:
         f"SELECT l_orderkey + {k * shifts['orders']} AS l_orderkey, "
         f"l_partkey + {k * shifts['part']} AS l_partkey, "
         f"l_suppkey + {k * shifts['supplier']} AS l_suppkey, "
         f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
         f"l_returnflag, l_linestatus, l_shipdate "
         f"FROM '{SRC}/lineitem.parquet'")
    emit("events", lambda k:
         f"SELECT event_id + {k * shifts['events']} AS event_id, ts, "
         f"user_id + {k * shifts['events_user']} AS user_id, event_type, "
         f"value, props FROM '{SRC}/events.parquet'")
    emit("documents", lambda k:
         f"SELECT doc_id + {k * shifts['documents']} AS doc_id, text, "
         f"lang, source, n_chars FROM '{SRC}/documents.parquet'")
    emit("embeddings", lambda k:
         f"SELECT vec_id + {k * shifts['embeddings']} AS vec_id, "
         f"embedding, label FROM '{SRC}/embeddings.parquet'")


if __name__ == "__main__":
    main()
