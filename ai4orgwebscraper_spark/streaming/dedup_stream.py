"""Streaming incremental dedup: document batches land in a directory
(at scale: S3 prefix / Kafka topic of crawl output), and each
micro-batch is classified against the DURABLE fingerprint store built
by all prior batches — the streaming face of
`operators/dedup.incremental_dedup` and the production shape of a
continuously-ingesting training-data pipeline (classify-on-arrival,
store grows by each batch's first-seen fingerprints only).

Durability contract (the seed_stream lessons, ADVICE r04):
- per-trigger outputs are OVERWRITTEN ``batch-<id>`` dirs, so a
  foreachBatch at-least-once retry replaces its own partial attempt
  instead of double-appending;
- the store read for batch N excludes batch N's own dir, so a retry
  recomputes against exactly the state it saw the first time;
- nothing lives in driver memory: a checkpointed restart skips
  already-processed files and the store IS the accumulated output.

Scale shape: the store side is the 100 TB concern — here it is read
as bare parquet scans of fingerprint-only delta dirs (Iceberg
append-snapshot shape; at warehouse scale, persist it bucketed on
fingerprint via sources/warehouse.write_bucketed and the per-batch
join compiles with zero Exchange above the store scan —
tests/test_incremental_and_quality.py pins that plan property for
the operator). The delta side is one micro-batch: the join shuffles
only the delta into the store's layout.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai4orgwebscraper_spark.operators.dedup import fingerprint_col, incremental_dedup
from ai4orgwebscraper_spark.streaming.seed_stream import _batch_dirs

DOC_BATCH_SCHEMA = "doc_id long, source string, text string"


def stream_incremental_dedup(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str | None = None,
    out_dir: str | None = None,
) -> DataFrame:
    """Drain ``docs_dir`` (parquet files of (doc_id, source, text),
    one file per trigger) and classify every document as
    new / dup_in_delta / dup_of_history against the store accumulated
    from all prior triggers. Returns the cumulative classification
    (doc_id, source, fingerprint, status, batch_id) as a batch
    DataFrame.

    Equality contract (tests/test_dedup_stream.py): the streamed
    classification equals a driver loop calling incremental_dedup
    once per file in file order with the store threaded through —
    which in turn equals q_dedup_incremental's semantics on each
    delta. A checkpointed restart continues the store instead of
    resetting it — which is only possible when the store is durable
    too, so ``checkpoint_dir`` REQUIRES an explicit ``out_dir``: a
    checkpoint pointing at a fresh temp store would skip the
    already-processed files while silently classifying their repeats
    as 'new'."""
    import tempfile

    if checkpoint_dir and out_dir is None:
        raise ValueError(
            "checkpoint_dir requires an explicit out_dir: the checkpoint"
            " skips already-processed files, so the fingerprint store"
            " (out_dir) must be the same durable one across restarts"
        )
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix=f"dedup_stream_{uuid.uuid4().hex[:8]}_")
    classified_root = os.path.join(out_dir, "classified")
    store_root = os.path.join(out_dir, "store")

    raw = (
        spark.readStream.schema(DOC_BATCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )

    def _classify(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"batch-{batch_id:08d}"
        delta = batch_df.select(
            "doc_id", "source", fingerprint_col(F.col("text")).alias("fingerprint")
        )
        prior = _batch_dirs(store_root, exclude=tag)
        if prior:
            history_fp = spark.read.parquet(*prior).select("fingerprint")
        else:
            history_fp = spark.createDataFrame([], "fingerprint string")
        marked = incremental_dedup(history_fp, delta).withColumn(
            "batch_id", F.lit(batch_id)
        )
        marked.write.mode("overwrite").parquet(os.path.join(classified_root, tag))
        # the store grows by this batch's first-seen fingerprints ONLY
        # (status='new' rows are unique per fingerprint by definition,
        # and none of them is already in the store) — read back from
        # the just-committed dir so the store rows derive from durable
        # output, not a second computation of the plan
        spark.read.parquet(os.path.join(classified_root, tag)).filter(
            F.col("status") == "new"
        ).select("fingerprint").write.mode("overwrite").parquet(
            os.path.join(store_root, tag)
        )

    writer = raw.writeStream.foreachBatch(_classify).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        # a failing _classify must not leak a live query into
        # spark.streams (the exception still propagates)
        q.stop()
    dirs = _batch_dirs(classified_root)
    if not dirs:
        return spark.createDataFrame(
            [], "doc_id long, source string, fingerprint string, status string, batch_id long"
        )
    return spark.read.parquet(*dirs)
