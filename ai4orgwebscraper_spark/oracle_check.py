"""Self-check harness replicating the driver's correctness gate:
run each queries() entry on Spark and its oracle_sql() on DuckDB over
the same parquet tables; compare row count, column names, and
order-insensitive values.

Used by tests/test_operators_oracle.py and runnable standalone:
    python -m ai4orgwebscraper_spark.oracle_check [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

from ai4orgwebscraper_spark.sources.readers import TABLES


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return conn


def compare_one(spark, conn, name: str, fn, sql: str, sf_dir: str) -> dict:
    import time

    t0 = time.time()
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    t1 = time.time()
    rel = conn.sql(sql)
    duck_cols = rel.columns
    duck_rows = rel.fetchall()
    t2 = time.time()
    res = {
        "name": name,
        "spark_s": round(t1 - t0, 2),
        "duck_s": round(t2 - t1, 2),
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_match": sorted(spark_cols) == sorted(duck_cols),
        "rows_match": len(spark_rows) == len(duck_rows),
    }
    if res["cols_match"] and res["rows_match"]:
        cs = _canon_rows(spark_cols, spark_rows)
        cd = _canon_rows(duck_cols, duck_rows)
        res["values_match"] = cs == cd
        if not res["values_match"]:
            diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            res["first_diffs"] = diffs
    else:
        res["values_match"] = False
        res["detail"] = {"spark_cols": spark_cols, "duck_cols": duck_cols}
    res["ok"] = res["cols_match"] and res["rows_match"] and res["values_match"]
    return res


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[dict]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    conn = duckdb_conn(sf_dir)
    results = []
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        results.append(compare_one(spark, conn, name, qs[name], sql, sf_dir))
    return results


if __name__ == "__main__":
    sys.path.insert(0, ".")
    from ai4orgwebscraper_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or None
    spark = get_spark(cpus=8)
    bad = 0
    for r in run_all(spark, sf_dir, only):
        flag = "OK " if r["ok"] else "FAIL"
        print(
            f"{flag} {r['name']:28s} spark={r['rows_spark']} duck={r['rows_duck']}"
            f" spark_s={r['spark_s']} duck_s={r['duck_s']}",
            flush=True,
        )
        if not r["ok"]:
            bad += 1
            print("     detail:", {k: v for k, v in r.items() if k not in ("name", "ok")})
    spark.stop()
    sys.exit(1 if bad else 0)
