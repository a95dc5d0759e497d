"""Temporal join operators Spark lacks as built-ins: AS-OF join and
bounded-interval (range) join over `events`.

Both are implemented in the shape that survives 100 TB — never as a
raw inequality join (which Catalyst can only execute as a broadcast
nested loop / cartesian):

- AS-OF: the union-and-window trick — tag both streams, sort once per
  key by (ts, tag, id), and carry the left stream's running aggregate
  forward. One shuffle on the key, no pair blowup, O(n log n) within
  partitions. (The same plan DuckDB/Flink produce internally for ASOF;
  DuckDB's native inequality join is the oracle twin.)
- Interval: bucketed band join — bin timestamps to the interval width,
  explode the probe side to its two candidate bins, equi-join on
  (key, bin), then filter the exact bound. Candidate fan-out is
  bounded by bucket occupancy, never O(n^2) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai4orgwebscraper_spark.sources.readers import load_table

INTERVAL_S = 3600  # range-join band: view within an hour after a click


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF (backward) join: for every purchase, the latest click by
    the same user at or before the purchase timestamp, plus how many
    clicks preceded it.

    Plan: union click+purchase rows, one window per user ordered by
    (ts, tag, event_id) — clicks sort before a same-instant purchase,
    so the running max/count over rows-unbounded-preceding..current is
    exactly the `click.ts <= purchase.ts` set. max()/count() are
    frame-order-insensitive, so the result is deterministic without a
    value tie-break."""
    # parquet ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — with
    # the session pinned to UTC the cast preserves the instant
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    sub = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("is_p") == 0, F.col("ts"))
    joined = sub.select(
        "event_id",
        "user_id",
        "ts",
        "is_p",
        F.max(click_ts).over(w).alias("last_click_ts"),
        F.count(click_ts).over(w).alias("n_prior_clicks"),
    ).filter(F.col("is_p") == 1)
    gap = F.round(
        (F.unix_micros("ts") - F.unix_micros("last_click_ts")) / 1_000_000.0, 3
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("purchase_ts"),
        F.date_format("last_click_ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("last_click_ts"),
        gap.alias("gap_s"),
        F.col("n_prior_clicks").cast("long").alias("n_prior_clicks"),
    ).orderBy("event_id")


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-interval (range) join: (click, view) pairs by the same
    user with the view 0..INTERVAL_S seconds after the click,
    aggregated per user bucket.

    Plan: bin both sides to INTERVAL_S-second buckets; the click side
    explodes to its two candidate bins (a view within the band lives
    in the click's bin or the next one), equi-join on
    (user_id, bin), exact band filter after. The inequality never
    reaches the join operator — no nested-loop plan at any scale."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    us = F.unix_micros(F.col("ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), us.alias("c_us"), F.col("event_id").alias("c_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"),
        us.alias("v_us"),
        (us / F.lit(INTERVAL_S * 1_000_000)).cast("long").alias("v_bin"),
    )
    probe = clicks.select(
        "user_id",
        "c_us",
        "c_id",
        F.explode(
            F.array(
                (F.col("c_us") / F.lit(INTERVAL_S * 1_000_000)).cast("long"),
                (F.col("c_us") / F.lit(INTERVAL_S * 1_000_000)).cast("long") + 1,
            )
        ).alias("v_bin"),
    )
    pairs = probe.join(views, ["user_id", "v_bin"]).filter(
        (F.col("v_us") >= F.col("c_us"))
        & (F.col("v_us") <= F.col("c_us") + INTERVAL_S * 1_000_000)
    )
    gap_s = (F.col("v_us") - F.col("c_us")) / 1_000_000.0
    return (
        pairs.select((F.col("user_id") % 7).alias("user_bucket"), gap_s.alias("gap_s"))
        .groupBy("user_bucket")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("gap_s"), 3).alias("avg_gap_s"),
            F.round(F.min("gap_s"), 3).alias("min_gap_s"),
            F.round(F.max("gap_s"), 3).alias("max_gap_s"),
        )
        .orderBy("user_bucket")
    )


QUERIES = {
    "q_events_asof_join": q_events_asof_join,
    "q_events_interval_join": q_events_interval_join,
}

ORACLES = {
    # DuckDB executes the inequality join directly (its optimizer has a
    # real range-join operator); the Spark side must produce the
    # identical rows from the window / bucket-join plans.
    "q_events_asof_join": """
        WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%g') AS purchase_ts,
               strftime(max(c.ts), '%Y-%m-%d %H:%M:%S.%g') AS last_click_ts,
               round((epoch_us(p.ts) - epoch_us(max(c.ts))) / 1000000.0, 3) AS gap_s,
               CAST(count(c.ts) AS BIGINT) AS n_prior_clicks
        FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
        GROUP BY p.event_id, p.user_id, p.ts
        ORDER BY p.event_id
    """,
    "q_events_interval_join": f"""
        WITH c AS (SELECT user_id, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'),
        v AS (SELECT user_id, epoch_us(ts) AS v_us FROM events WHERE event_type = 'view')
        SELECT c.user_id % 7 AS user_bucket,
               count(*) AS n_pairs,
               round(avg((v_us - c_us) / 1000000.0), 3) AS avg_gap_s,
               round(min((v_us - c_us) / 1000000.0), 3) AS min_gap_s,
               round(max((v_us - c_us) / 1000000.0), 3) AS max_gap_s
        FROM c JOIN v ON v.user_id = c.user_id
                     AND v.v_us >= c.c_us AND v.v_us <= c.c_us + {INTERVAL_S * 1_000_000}
        GROUP BY 1 ORDER BY user_bucket
    """,
}
