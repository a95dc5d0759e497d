"""Scale-safe global sequence numbering.

The naive ``row_number().over(Window.orderBy(...))`` collapses the
whole DataFrame into ONE partition — a driver-killing bottleneck at
10^10 rows. This helper assigns a dense global sequence in three
distributed steps:

1. range-repartition by the explicit order keys (Spark samples key
   ranges, so partitions are balanced and partition id order == key
   order);
2. count rows per physical partition (tiny aggregate, collected to
   the driver: P values);
3. per-partition row_number + the partition's cumulative offset.

Determinism requires the order keys to be a total order (include a
unique tie-breaker column). This is the engine's replacement for
"crawl order = single-thread iteration order" (reference
app_wrapper.py:165-168): order comes from explicit keys, never from
partition iteration (SURVEY.md §3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "seq",
    offset: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 0-based global sequence column ordered by ``order_cols``."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # Pin the physical layout so the partition ids seen by the count job
    # and by the final projection agree. Columnar persist (not
    # localCheckpoint — Java-serialized RDD materialization is ~10x
    # slower) is safe here: inputs are deterministic, and range
    # boundaries resample identically on any recompute.
    ranged = ranged.persist()
    counts = {r["__pid"]: r["cnt"] for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, offset
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (
        ranged.join(F.broadcast(offset_df), "__pid")
        .withColumn(seq_col, F.row_number().over(w) - 1 + F.col("__offset"))
        .drop("__pid", "__offset")
    )
    return out
