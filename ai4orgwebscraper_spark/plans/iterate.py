"""Shared harness for iterative DataFrame algorithms (connected
components, PageRank, any fixpoint loop): per-step parquet spill for
lineage truncation, eager deletion of superseded steps, and shuffle
width sized to the STATE table rather than the session's corpus-tuned
default.

Why each piece exists:
- **Spill, not persist**: persist caches partitions but leaves the
  logical plan growing — Catalyst analysis time doubles per iteration
  (1.2s → 42s/iter observed before truncation). A parquet round-trip
  resets lineage; superseded steps are plain files deleted two
  iterations back, so retained state is O(2 × |state|).
- **Loop width**: iterative state is |nodes| rows — tiny next to the
  corpus — and AQE's parallelismFirst never coalesces the session
  width down, so every iteration pays stages × near-empty tasks of
  scheduling overhead. ~500k state rows per partition, capped at the
  session default (a real cluster keeps its own width at 10^10 rows).
- **Materialize statics BEFORE narrowing**: the loop's static inputs
  (adjacency, degree tables) carry the HEAVY upstream lineage
  (LSH pipeline, crawl fetch). If their first materialization happens
  lazily inside the loop it runs under the narrowed width — the exact
  shuffles the session conf was tuned for, under-parallelized. The
  harness persists and counts every static at session width first.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ai4orgwebscraper_spark.plans.spill import BudgetedSpillDir

ROWS_PER_PARTITION = 500_000

# Lineage-truncation strategy switch (r6, guide §2/§5): below this
# many state rows a parquet round-trip per step is pure overhead —
# two jobs + file commit against kilobytes of state — and
# localCheckpoint (one job, blocks in the executor storage tier,
# lineage truncated identically) is strictly cheaper. Above it, the
# parquet spill remains the right shape: durable files survive
# executor loss and bound memory explicitly, which is what a
# 10^9-node loop needs. The bound is on STATE ROWS (known to every
# caller for free — it already sizes the loop width), not on cores,
# so the choice scales with the data, not the machine.
def _local_ckpt_max_rows() -> int:
    # read per call so tests can pin either branch
    return int(os.environ.get("SPARK_GRAFT_LOCAL_CKPT_MAX_ROWS", "5000000"))


def loop_width(spark: SparkSession, n_state_rows: int) -> int:
    """Shuffle width for a state table of ``n_state_rows`` rows —
    callers use this to pre-partition static inputs on the loop's join
    key so the per-iteration join reuses the partitioning (the edge
    table shuffles once, not once per iteration)."""
    sess_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(
        1, min(sess_parts, (n_state_rows + ROWS_PER_PARTITION - 1) // ROWS_PER_PARTITION)
    )


@dataclass
class SpillLoop:
    spill: Callable[[DataFrame, int], DataFrame]
    loop_parts: int
    dirs: BudgetedSpillDir


@contextmanager
def spill_loop(
    spark: SparkSession,
    n_state_rows: int,
    statics: list[DataFrame] | None = None,
    prefix: str = "iter_state_",
):
    """Context manager for an iterative loop.

    ``statics`` are persisted and force-materialized at the SESSION
    shuffle width before the width is narrowed for the loop, then
    unpersisted on exit. Inside the block, ``ctx.spill(df, i)`` writes
    step ``i`` to the budgeted spill dir (tmpfs until the live-bytes
    budget is hit, disk after — VERDICT r03: unguarded tmpfs ENOSPCs
    at 10^9-node state), deletes step ``i-2``, and returns the
    lineage-free reader."""
    dirs = BudgetedSpillDir(prefix)
    step_paths: dict[int, str] = {}
    # keep a reference to each localCheckpoint step until superseded
    # (two-back, mirroring the file deletion): popping the reference
    # lets the ContextCleaner reclaim the checkpoint blocks
    step_ckpts: dict[int, DataFrame] = {}
    use_local_ckpt = n_state_rows <= _local_ckpt_max_rows()

    sess_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    loop_parts = loop_width(spark, n_state_rows)

    statics = statics or []
    for s in statics:
        s.persist()
        s.count()  # materialize heavy upstream lineage at session width

    def spill(df: DataFrame, i: int) -> DataFrame:
        if use_local_ckpt:
            out = df.localCheckpoint(eager=True)
            step_ckpts[i] = out
            step_ckpts.pop(i - 2, None)
            return out
        path = os.path.join(dirs.next_dir(), f"step_{i}")
        df.write.mode("overwrite").parquet(path)
        dirs.note_written(path)
        step_paths[i] = path
        old = step_paths.pop(i - 2, None)
        if old:
            dirs.delete(old)
        return spark.read.parquet(path)

    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        yield SpillLoop(spill=spill, loop_parts=loop_parts, dirs=dirs)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(sess_parts))
        for s in statics:
            s.unpersist(blocking=False)
