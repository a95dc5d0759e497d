"""Readers for the driver's parquet tables (TESTDATA.md).

Declarative ``spark.read.parquet`` so Catalyst gets pushdown + column
pruning for free; no schema inference surprises (parquet carries its
own schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _scan_parallelism(sf_dir: str, name: str) -> int:
    """Upper bound on the useful task parallelism of scanning
    ``<sf_dir>/<name>.parquet``, from the parquet footers (a few ms —
    no Spark job, no RDD conversion): Spark carves a file into
    ceil(bytes / maxPartitionBytes) splits, but a split only does work
    if a row-group midpoint lands in it, so the bound is
    min(splits, row_groups) summed over files."""
    import math
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            files = [
                os.path.join(path, e)
                for e in os.listdir(path)
                if e.endswith(".parquet")
            ]
        else:
            files = [path]
        total = 0
        for f in files:
            size = os.path.getsize(f)
            splits = max(1, math.ceil(size / (128 * 1024 * 1024)))
            rgs = pq.ParquetFile(f).metadata.num_row_groups
            total += min(splits, rgs)
        return max(1, total)
    except OSError:
        return 1


def load_wide(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    target: int | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """``load_table`` + ``widen`` for per-row-compute-heavy consumers,
    with the under-parallelism test done from parquet footers instead
    of an RDD conversion. See ``widen`` for why this is scale-adaptive
    (no-op on any multi-split table).

    ``by``: hash-partition on these columns instead of round-robin —
    round-robin pays a deterministic sort-before-repartition of the
    input (SPARK-23207), which a deterministic hash key avoids; use it
    when a uniform high-cardinality key exists (e.g. the fact-side
    join key)."""
    df = load_table(spark, sf_dir, name)
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if _scan_parallelism(sf_dir, name) >= target:
        return df
    if by:
        return df.repartition(target, *by)
    return df.repartition(target)


def widen(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition an under-parallel input up to the session
    parallelism, for use immediately before per-row-compute-heavy
    operators (HOF distance ranking, tokenize/shingle explodes, Lloyd
    iterations).

    Scale-adaptive, not a local constant: a real-scale table arrives as
    many splits and this is a NO-OP (guide §2 — partitioning derived
    from the input, never tuned to one machine). The fixture tables are
    single-row-group parquet files, so their scans are one task however
    many cores exist, and every narrow operator above them runs
    single-threaded; one round-robin Exchange of the (already
    projected, slim) input unlocks the full width. Deterministic:
    repartition round-robin sorts before redistributing
    (spark.sql.execution.sortBeforeRepartition), row values are
    untouched, and every consumer orders its output explicitly."""
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql paths."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
