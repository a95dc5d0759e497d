"""Streaming twin of the retrieval suite: incremental inverted-index
maintenance over a document stream.

A production corpus is never static — new crawl output lands
continuously, and the index that serves BM25 must follow without a
full rebuild. This runs the inverted-index statistics as Structured
Streaming state over a file source: term frequency is a running
streaming aggregate; document frequency needs per-(term, doc)
uniqueness, which streaming aggregation can't express as COUNT
(DISTINCT) — instead it composes the engine's streaming exact-dedup
(stateful dropDuplicates, the C4 URL-seen shape) with a downstream
count, exactly how the batch q_dedup_exact -> agg pipeline composes.
Two independent stateful maintainers run over the same source (Spark
forbids multi-aggregate streaming plans); their complete-mode sinks
join batch-side at read time.

At scale the source is the crawl's Iceberg append stream and the
sinks are upserts into the index table via foreachBatch; the stateful
plan (explode -> dedup state -> running agg) is identical.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai4orgwebscraper_spark.operators.retrieval import _STOP_SQL, _TOKS_SQL
from ai4orgwebscraper_spark.operators.text import STOPWORDS, _tokens


def q_docs_stream_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index stats (term, df, tf_total) maintained as
    streaming state; equals the batch q_inverted_index minus the
    posting-list sample (order-dependent postings need the batch
    sort; df/tf are pure running state)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema

    def _tok_stream() -> DataFrame:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
        return (
            stream.select(
                "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
            )
            .filter((F.length("term") > 2) & ~F.col("term").isin(*STOPWORDS))
        )

    # maintainer 1: running term frequency (streaming hash agg state)
    tf_name = "idx_tf_" + uuid.uuid4().hex[:8]
    tf_q = (
        _tok_stream()
        .groupBy("term")
        .agg(F.count("*").alias("tf_total"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(tf_name)
        .start()
    )
    # maintainer 2: document frequency = stateful exact-dedup on
    # (term, doc_id) -> running count per term
    df_name = "idx_df_" + uuid.uuid4().hex[:8]
    df_q = (
        _tok_stream()
        .dropDuplicates(["term", "doc_id"])
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(df_name)
        .start()
    )
    try:
        tf_q.processAllAvailable()
        df_q.processAllAvailable()
    finally:
        tf_q.stop()
        df_q.stop()
    tf_tbl = spark.sql(f"SELECT * FROM {tf_name}")  # noqa: S608 — generated name
    df_tbl = spark.sql(f"SELECT * FROM {df_name}")  # noqa: S608 — generated name
    return (
        df_tbl.join(tf_tbl, "term")
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("tf_total").cast("long").alias("tf_total"),
        )
        .orderBy(F.desc("df"), "term")
    )


QUERIES = {"q_docs_stream_index": q_docs_stream_index}

ORACLES = {
    "q_docs_stream_index": f"""
        WITH tok AS (
            SELECT doc_id, t.term AS term
            FROM documents, unnest({_TOKS_SQL}) AS t(term)
            WHERE len(t.term) > 2 AND t.term NOT IN {_STOP_SQL}
        ),
        per AS (
            SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id
        )
        SELECT term,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf) AS BIGINT) AS tf_total
        FROM per GROUP BY term
        ORDER BY df DESC, term
    """,
}
