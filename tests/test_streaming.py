"""Streaming vs batch equivalence: the tumbling-window stream result
must equal the batch GROUP BY over the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai4orgwebscraper_spark.streaming.events_stream import events_tumbling_counts

SF = "/root/testdata/sf0.001"
DEC = "decimal(18,2)"


def test_stream_matches_batch(spark):
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in events_tumbling_counts(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        (r["hour"], r["event_type"]): (r["n"], r["v"])
        for r in (
            ev.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
                "event_type",
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast(DEC)).cast("double").alias("v"),
            )
            .collect()
        )
    }
    assert streamed == batch
