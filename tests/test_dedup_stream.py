"""Streaming incremental dedup (streaming/dedup_stream.py): the
streamed per-batch classification must equal a driver loop threading
the fingerprint store through operators/dedup.incremental_dedup one
file at a time, and a checkpointed restart must CONTINUE the store."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from ai4orgwebscraper_spark.operators.dedup import incremental_dedup
from ai4orgwebscraper_spark.streaming.dedup_stream import (
    DOC_BATCH_SCHEMA,
    fingerprint_col,
    stream_incremental_dedup,
)

# ten tokens repeated make every doc's 20-token lead prefix a pure
# function of its first two sentences — planted so batch 2 repeats
# batch 1 content (dup_of_history), batch 2 repeats itself
# (dup_in_delta), and batch 3 re-sees both stores
_S = {
    "A": "alpha " * 25,
    "B": "bravo " * 25,
    "C": "charlie " * 25,
    "D": "delta " * 25,
}

_BATCHES = [
    [(0, "s1", _S["A"]), (1, "s1", _S["B"])],
    [(2, "s1", _S["A"]), (3, "s2", _S["C"]), (4, "s2", _S["C"])],
    [(5, "s2", _S["B"]), (6, "s1", _S["D"]), (7, "s1", _S["C"])],
]


def _write_batches(spark, docs_dir, batches, start_idx=0):
    """Land each batch as ONE flat parquet file (what a file-stream
    source ingests — a Spark .write.parquet() DIRECTORY would be
    invisible to it)."""
    import glob
    import shutil
    import tempfile

    os.makedirs(docs_dir, exist_ok=True)
    for i, rows in enumerate(batches, start=start_idx):
        df = spark.createDataFrame(rows, DOC_BATCH_SCHEMA)
        tmp = tempfile.mkdtemp(prefix="dedup_stream_batch_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(docs_dir, f"b{i:03d}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
        time.sleep(0.05)  # distinct mtimes -> deterministic file order


def _driver_loop(spark, batches):
    """The normative twin: incremental_dedup per batch with the store
    threaded through."""
    store = spark.createDataFrame([], "fingerprint string")
    out = {}
    for rows in batches:
        delta = spark.createDataFrame(rows, DOC_BATCH_SCHEMA).select(
            "doc_id", "source", fingerprint_col(F.col("text")).alias("fingerprint")
        )
        marked = incremental_dedup(store, delta)
        for r in marked.collect():
            out[r["doc_id"]] = r["status"]
        store = store.union(
            marked.filter(F.col("status") == "new").select("fingerprint")
        )
    return out


def test_stream_matches_driver_loop(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    _write_batches(spark, docs_dir, _BATCHES)
    got = stream_incremental_dedup(
        spark, docs_dir, checkpoint_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out"),
    )
    status = {r["doc_id"]: r["status"] for r in got.collect()}
    assert status == _driver_loop(spark, _BATCHES)
    # spot-pin the planted expectations directly
    assert status[2] == "dup_of_history"  # batch-2 repeat of batch-1 A
    assert status[3] == "new" and status[4] == "dup_in_delta"
    assert status[5] == "dup_of_history" and status[7] == "dup_of_history"
    assert status[6] == "new"


def test_stream_restart_continues_store(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _write_batches(spark, docs_dir, _BATCHES[:1])
    first = stream_incremental_dedup(spark, docs_dir, checkpoint_dir=ckpt, out_dir=out)
    assert {r["doc_id"] for r in first.collect()} == {0, 1}
    # drop two more files; the restart must skip file 1 and classify
    # against the CARRIED store (doc 2 repeats batch-1 content: its
    # fingerprint is already stored, so a reset store would say 'new')
    _write_batches(spark, docs_dir, _BATCHES[1:], start_idx=1)
    cum = stream_incremental_dedup(spark, docs_dir, checkpoint_dir=ckpt, out_dir=out)
    status = {r["doc_id"]: r["status"] for r in cum.collect()}
    assert status == _driver_loop(spark, _BATCHES)
    assert status[2] == "dup_of_history"


def test_stream_empty_dir(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    os.makedirs(docs_dir)
    got = stream_incremental_dedup(spark, docs_dir, out_dir=str(tmp_path / "out"))
    assert got.collect() == []


def test_stream_checkpoint_requires_out_dir(spark, tmp_path):
    """A checkpoint without a durable store would skip files while
    classifying their repeats as 'new' — rejected loudly."""
    import pytest

    with pytest.raises(ValueError, match="out_dir"):
        stream_incremental_dedup(
            spark, str(tmp_path / "docs"), checkpoint_dir=str(tmp_path / "ckpt")
        )
