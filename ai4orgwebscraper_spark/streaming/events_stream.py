"""Streaming twin of the batch event analytics.

The reference's nearest streaming-shaped state is its per-minute
request counter (reference linkedin_api.py:46-67) — a tumbling-window
count. Here that becomes a real Structured Streaming plan: parquet
source → watermark → windowed aggregation → memory sink, driven to
completion synchronously with processAllAvailable() so tests and the
driver's oracle can compare it against the equivalent batch GROUP BY.

At scale the source is Kafka and the sink Iceberg via foreachBatch;
the plan (watermark + tumbling window + agg) is identical.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def events_tumbling_counts(
    spark: SparkSession, sf_dir: str, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Run a tumbling-window count over the events table AS A STREAM
    and return the completed result as a batch DataFrame."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source needs a directory; glob-filter to the
    # single events file inside the sf dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # the parquet ts is TIMESTAMP_NTZ; watermarks need TIMESTAMP —
    # with the session pinned to UTC the cast preserves the instant
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )
    name = "evt_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(f"SELECT * FROM {name}")  # noqa: S608 — generated name
    return out.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("window_start", "event_type")


def q_events_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_tumbling_counts(spark, sf_dir)


def q_events_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming counts (2 h window, 1 h slide): every
    event lands in TWO overlapping windows — the hopping-aggregation
    shape tumbling windows can't express (rate trends, SLA windows).
    Same plan skeleton as the tumbling variant: watermark → window
    agg → complete-mode sink; the batch oracle explodes each event
    into its two window starts."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "4 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )
    name = "slide_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(f"SELECT * FROM {name}")  # noqa: S608 — generated name
    return out.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("window_start", "event_type")


def q_events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicates over a streaming source —
    the streaming twin of q_dedup_exact (stateful distinct; at scale
    the state store is RocksDB-backed and keyed on the dedup columns,
    the same partitioned-seen-set shape as the frontier's URL dedup).
    Result is arrival-order independent (a distinct set), so the batch
    SQL oracle can check it exactly."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.dropDuplicates(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_distinct_users"))
    )
    name = "dedup_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(f"SELECT * FROM {name}")  # noqa: S608 — generated name
    return out.select("event_type", "n_distinct_users").orderBy("event_type")


def q_events_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (r5): the streaming fact joined to
    a STATIC broadcast dimension inside every micro-batch — the
    canonical production event-pipeline shape (Kafka fact → broadcast
    dim → agg → sink). The static side is a plain batch DataFrame;
    Spark re-broadcasts it per micro-batch plan, so the stream never
    shuffles for the join and the state store holds only the running
    aggregate. Key: the synthetic user_id mapped onto the 25-row
    nation dim (deterministic modulus — a stand-in for the usual
    user→geo attribute lookup)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    joined = stream.withColumn(
        "nkey", (F.col("user_id") % 25).cast("int")
    ).join(F.broadcast(nation), F.col("nkey") == F.col("n_nationkey"))
    agg = joined.groupBy("n_name").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )
    name = "enrich_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(f"SELECT * FROM {name}")  # noqa: S608 — generated name
    return out.select("n_name", "n_events", "total_value").orderBy("n_name")


QUERIES = {
    "q_events_window_stream": q_events_window_stream,
    "q_events_sliding_stream": q_events_sliding_stream,
    "q_events_stream_dedup": q_events_stream_dedup,
    "q_events_stream_enrich": q_events_stream_enrich,
}

ORACLES = {
    "q_events_sliding_stream": """
        WITH exploded AS (
            SELECT date_trunc('hour', ts) - offs.k * INTERVAL '1 hour' AS win_start,
                   event_type, value
            FROM events, (VALUES (0), (1)) AS offs(k)
        )
        SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM exploded GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    "q_events_window_stream": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    "q_events_stream_dedup": """
        SELECT event_type, count(*) AS n_distinct_users
        FROM (SELECT DISTINCT user_id, event_type FROM events)
        GROUP BY event_type ORDER BY event_type
    """,
    "q_events_stream_enrich": """
        SELECT n_name, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events e
        JOIN nation n ON CAST(e.user_id % 25 AS INTEGER) = n.n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
}
