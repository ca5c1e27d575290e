"""Synthesize an sf1-equivalent dataset for the scaling-anchor bench
(VERDICT r5 item 6): the driver only ships sf0.001/0.01/0.1, so a 10x
point is derived from the driver's own sf0.1 tables by key-shifted
replication — copy k (k = 0..9) offsets every entity key by k * 10^9,
keeping all foreign-key relationships intact within each copy.
Deterministic (no RNG), append-only transforms, written OUTSIDE the
read-only /root/testdata tree.

Workload-shape notes:
- events: user_id shifts per copy -> 10x SYMBOLS with the same bars
  per symbol. That is exactly the MTM engine's scaling model (more
  groups, bounded group size), so sweep/timeline ratios read cleanly.
- documents: text gets a per-copy prefix c{k} for k > 0, so each
  copy keeps its internal duplicate structure but no NEW cross-copy
  near-dups appear — dedup output and cost both scale ~10x instead
  of quadratically on artificial replicas.
- embeddings: one dimension is perturbed by a small per-copy delta
  for the same reason (no artificial cross-copy exact duplicates).
- region/nation: fixed-size dims at any SF — copied verbatim.

Usage: python scripts/make_sf1.py [dest_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
SHIFT = 10**9


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ks AS SELECT unnest(range({COPIES})) AS k")

    def write(table: str, select: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{dest}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    def src(table: str) -> str:
        return f"read_parquet('{SRC}/{table}.parquet')"

    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    s = f"k * {SHIFT}"
    write(
        "customer",
        f"SELECT c_custkey + {s} AS c_custkey, c_name, c_nationkey,"
        f" c_acctbal, c_mktsegment FROM {src('customer')}, ks",
    )
    write(
        "supplier",
        f"SELECT s_suppkey + {s} AS s_suppkey, s_name, s_nationkey,"
        f" s_acctbal FROM {src('supplier')}, ks",
    )
    write(
        "part",
        f"SELECT p_partkey + {s} AS p_partkey, p_name, p_brand, p_type,"
        f" p_size, p_retailprice FROM {src('part')}, ks",
    )
    write(
        "orders",
        f"SELECT o_orderkey + {s} AS o_orderkey, o_custkey + {s} AS o_custkey,"
        f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        f" FROM {src('orders')}, ks",
    )
    write(
        "lineitem",
        f"SELECT l_orderkey + {s} AS l_orderkey, l_partkey + {s} AS l_partkey,"
        f" l_suppkey + {s} AS l_suppkey, l_linenumber, l_quantity,"
        f" l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        f" l_shipdate FROM {src('lineitem')}, ks",
    )
    write(
        "events",
        f"SELECT event_id + {s} AS event_id, ts, user_id + {s} AS user_id,"
        f" event_type, value, props FROM {src('events')}, ks",
    )
    write(
        "documents",
        f"SELECT doc_id + {s} AS doc_id,"
        f" CASE WHEN k = 0 THEN text ELSE 'c' || k || ' ' || text END AS text,"
        f" lang, source, n_chars FROM {src('documents')}, ks",
    )
    write(
        "embeddings",
        f"SELECT vec_id + {s} AS vec_id,"
        f" list_transform(list_zip(embedding, range(1, len(embedding) + 1)),"
        f"   z -> CAST(CASE WHEN z[2] = 1 THEN z[1] + 0.013 * k"
        f"        ELSE z[1] END AS FLOAT)) AS embedding,"
        f" label FROM {src('embeddings')}, ks",
    )


if __name__ == "__main__":
    main()
