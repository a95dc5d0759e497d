"""Storage-bucketed tables: co-located fact-fact joins with no
shuffle on either side.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem on
orderkey; cumulative seen-set ⋈ frontier on url_hash) is shuffling
both sides on the join key — every byte crosses the network once per
join, every time the join runs. Spark's storage bucketing
(`bucketBy(n, key).sortBy(key).saveAsTable`) pins the layout to
hash(key) % n at WRITE time: a join of two tables bucketed on the
join key with equal bucket counts compiles to a sort-merge join whose
children are bare bucketed scans — zero Exchange, zero Sort when
sortBy matched — and a groupBy on the same key rides the same
distribution for free. You pay the shuffle once at ingest and never
again; at 1000 executors that converts the recurring O(data) network
cost of the pipeline's hottest join into a one-time write cost.

The demo pipeline (`co_located_order_revenue`) is exercised by
tests/test_bucketing.py, which pins the plan property itself: zero
`Exchange` operators in the executed join+agg plan over bucketed
tables, and byte-identical results vs the plain parquet plan (which
the same test shows DOES shuffle both sides).

Sandbox note: local[N] has no network, so the win is not measurable
here — the TEST asserts the plan shape (the thing that scales), not
wall clock. Bucket counts at 100 TB: size so one bucket of the big
side fits an executor's scan budget (e.g. lineitem 6B rows/SF1k →
4096 buckets ≈ 25 GB/bucket raw); bucket count must match across
co-joined tables, so fix it per join-key domain, not per table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai4orgwebscraper_spark.sources.readers import load_table


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Materialize `df` as an external bucketed table at `path`.

    bucketBy requires the catalog write path (saveAsTable) — plain
    `.save(path)` cannot record bucket metadata; the explicit
    `path` option keeps data out of the default warehouse so tests
    and pipelines control their storage root.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry (external data at `path` is untouched)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def bucketize_order_tables(
    spark: SparkSession, sf_dir: str, root: str, n_buckets: int = 8
) -> tuple[str, str]:
    """Write orders + lineitem bucketed/sorted on the orderkey domain
    (equal bucket counts — the co-location precondition)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders, "orders_bkt", "o_orderkey", n_buckets, f"{root}/orders_bkt"
    )
    write_bucketed(
        lineitem, "lineitem_bkt", "l_orderkey", n_buckets, f"{root}/lineitem_bkt"
    )
    return "orders_bkt", "lineitem_bkt"


def order_revenue(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The join+agg whose plan the bucketing test pins: revenue per
    order — join on the bucket key, then group on the SAME key so the
    bucketed distribution also satisfies the aggregation (no Exchange
    anywhere when both inputs are bucketed on orderkey)."""
    li = lineitem.select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .alias("rev"),
    )
    return (
        orders.select("o_orderkey", "o_orderdate")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


def write_partitioned(df: DataFrame, path: str, keys: list[str]) -> None:
    """Hive-style directory partitioning — the OTHER physical-layout
    lever next to bucketing: an equality/IN predicate on a partition
    key prunes whole directories at PLANNING time (PartitionFilters in
    the scan, PartitionCount < total), so a per-lang or per-date read
    of a 100 TB corpus touches only its shard's files. Partition keys
    must be low-cardinality (lang, date, source tier) — high-
    cardinality keys (doc_id, url_hash) create millions of tiny
    directories and kill the driver's file listing; those belong in
    bucketing instead."""
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)


def co_located_order_revenue(
    spark: SparkSession, sf_dir: str, root: str, n_buckets: int = 8
) -> DataFrame:
    """End-to-end demo: bucketize once, then run the shuffle-free
    join+agg off the bucketed tables."""
    o_tbl, l_tbl = bucketize_order_tables(spark, sf_dir, root, n_buckets)
    return order_revenue(spark.table(o_tbl), spark.table(l_tbl))
