"""Scale-safe global sequence numbering.

The naive ``row_number().over(Window.orderBy(...))`` collapses the
whole DataFrame into ONE partition — a driver-killing bottleneck at
10^10 rows. This helper assigns a dense global sequence with the
classic two-phase pattern, no global shuffle and no global sort:

1. range-repartition + sort within partitions by the explicit order
   keys (skippable via ``assume_sorted`` when the input is already
   globally ordered, e.g. a ``spark.range``-derived frontier);
2. stamp ``monotonically_increasing_id`` — documented layout
   ``(partition_id << 33) + row_index_in_partition`` — and pin the
   layout with a columnar persist;
3. count rows per partition (tiny aggregate collected to the driver),
   prefix-sum the offsets, and compute
   ``seq = offset[partition_id] + row_index`` as a narrow projection
   via a broadcast join on the 1-row-per-partition offset table.

Determinism requires the order keys to be a total order (include a
unique tie-breaker column). This is the engine's replacement for
"crawl order = single-thread iteration order" (reference
app_wrapper.py:165-168): order comes from explicit keys, never from
partition iteration (SURVEY.md §3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MID_BITS = 33  # monotonically_increasing_id: pid << 33 | row_index


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "seq",
    offset: int = 0,
    num_partitions: int | None = None,
    assume_sorted: bool = False,
    pin_registry: list | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Add a dense 0-based (plus ``offset``) global sequence column
    ordered by ``order_cols``.

    ``assume_sorted=True`` skips the range shuffle: the caller asserts
    the input is already globally ordered by ``order_cols`` (partition
    i's keys all precede partition i+1's, rows sorted within each) —
    true for frontiers derived from ``spark.range`` by narrow ops.

    The internal persist that pins the mid layout must outlive every
    consumer of the result (recompute through an unpersisted base
    could re-derive mids under a different runtime plan). Callers that
    loop — the crawl engine calls this every round — pass
    ``pin_registry`` (a list the pinned DataFrame is appended to) and
    unpersist the batch when their run closes, instead of leaking one
    cached DataFrame per round (ADVICE r01).

    ``stats`` (optional dict) receives ``{"rows": total}`` — the exact
    row count is a free by-product of the per-partition offset
    collection, and callers use it to size downstream stages (e.g. the
    engine's fetch fan-out) without paying another count job.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    if not assume_sorted:
        df = df.repartitionByRange(num_partitions, *order_cols).sortWithinPartitions(
            *order_cols
        )
    base = df.withColumn("__mid", F.monotonically_increasing_id()).persist()
    if pin_registry is not None:
        pin_registry.append(base)
    pid = F.shiftrightunsigned(F.col("__mid"), _MID_BITS).alias("__pid")
    counts = {
        r["__pid"]: r["cnt"]
        for r in base.select(pid).groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], offset
    for p in sorted(counts):
        offsets.append((p, acc))
        acc += counts[p]
    if stats is not None:
        stats["rows"] = acc - offset
    offset_df = df.sparkSession.createDataFrame(offsets, "__pid long, __offset long")
    row_idx = F.col("__mid") - F.shiftleft(F.col("__pid"), _MID_BITS)
    return (
        base.withColumn("__pid", F.shiftrightunsigned(F.col("__mid"), _MID_BITS))
        .join(F.broadcast(offset_df), "__pid")
        .withColumn(seq_col, F.col("__offset") + row_idx)
        .drop("__pid", "__offset", "__mid")
    )
