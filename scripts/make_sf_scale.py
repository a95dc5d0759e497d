#!/usr/bin/env python
"""Deterministically scale the driver's sf0.1 fixtures to sf1 for the
cross-engine parity sweep at 100x the driver's gate (VERDICT r04 next
#3). Ten key-disjoint copies of every table: copy i shifts every key
column by i * BASE_<keyspace>, so joins never cross copies and each
copy is a self-consistent universe; non-key attributes (names, text,
timestamps) are left byte-identical — the sweep checks SPARK==DUCKDB on
the same files, not data realism, and the 10x duplicated document texts
deliberately stress the dedup/LSH candidate caps with pathological
collision volume. No RNG anywhere: output is a pure function of the
input fixtures.

Usage: python scripts/make_sf_scale.py [OUT_DIR] [COPIES] [SRC_DIR]
Defaults: /tmp/sf1 10 /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

import duckdb

# key-column -> per-copy offset base (comfortably above the sf0.1 max)
BASES = {
    "c_custkey": 1_000_000,
    "o_custkey": 1_000_000,
    "o_orderkey": 10_000_000,
    "l_orderkey": 10_000_000,
    "p_partkey": 1_000_000,
    "l_partkey": 1_000_000,
    "s_suppkey": 100_000,
    "l_suppkey": 100_000,
    "n_nationkey": 100,
    "c_nationkey": 100,
    "s_nationkey": 100,
    "r_regionkey": 100,
    "n_regionkey": 100,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
    "event_id": 100_000_000,
    "user_id": 1_000_000,
}

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def scale(out_dir: str, copies: int, src_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        cols = con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        exprs = []
        for name, dtype, *_ in cols:
            if name in BASES:
                # cast back so INTEGER keys stay INTEGER after the add
                exprs.append(
                    f"CAST({name} + i * {BASES[name]} AS {dtype}) AS {name}"
                )
            else:
                exprs.append(name)
        sel = ", ".join(exprs)
        dst = os.path.join(out_dir, f"{t}.parquet")
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}', range({copies}) r(i)"
            f" ORDER BY i) TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n:,} rows -> {dst}", flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    scale(out, copies, src)
