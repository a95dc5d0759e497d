"""Text-analysis operators over `documents` (SURVEY.md A1/P6 + the
training-data-pipeline text suite).

The reference tokenizes one page at a time with Counter
(app.py:125-155: regex tokenize → stopword filter → most_common(30));
these run the same semantics as distributed explode/groupBy plans —
all JVM-side built-ins, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai4orgwebscraper_spark.sources.readers import load_table

# reference's fallback stopword list shape (app.py:140-145): small,
# fixed, deterministic
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def _tokens(col):
    """Tokenize: lower + split on non-word runs, drop empties
    (reference app.py:22 `\\b\\w+\\b` + app.py:136-138 filters)."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda w: w != "")


def q_word_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-frequency top-30 (reference A1, app.py:148-149).

    Scale: explode → partial-agg shrinks per-partition to vocab size
    before the shuffle; top-30 is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .filter((F.length("word") > 2) & ~F.col("word").isin(*STOPWORDS))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(30)
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, mean token length, stopword
    ratio — integer arithmetic + explicit rounding so engines agree
    bit-for-bit. Emits per-lang aggregates (per-doc rows would be the
    write path in a real pipeline)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    per_doc = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w))).alias("n_stop"),
        F.col("n_chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.sum("n_stop") / F.sum("n_tokens"), 6).alias("stopword_ratio"),
            F.round(F.sum("n_chars") / F.sum("n_tokens"), 6).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per source (whitespace tokenizer; the BPE-ish
    regex variant adds subword splits on case/digit boundaries —
    same plan shape)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
        .orderBy("source")
    )


def q_doc_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document extractive summary (K2 `Sum_` sink contract,
    reference app_wrapper.py:83-109; the gpt-4o rewrite is out of
    scope — this deterministic head-extract is the summary column the
    sink writes, sources/seeds.py:summary_col). Pure column exprs,
    one scan, no shuffle beyond the output sort."""
    from ai4orgwebscraper_spark.sources.seeds import summary_col

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            summary_col(F.col("text")).alias("summary"),
            F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_source_tokens"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic confusion summary: a deterministic
    marker-token rule (n-gram heuristic shape) scored against the
    labeled `lang` column. The rule is intentionally simple — the
    operator under test is the distributed classify+score plan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    predicted = (
        F.when(F.array_contains(toks, "the"), "en")
        .when(F.array_contains(toks, "data"), "de")
        .otherwise("xx")
    )
    return (
        docs.select("lang", predicted.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted_lang")
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the normalized token stream
    (reference '.works' md5 keying, app_wrapper.py.works:29). The
    exact-dedup primitive: groupBy fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.array_join(_tokens(F.col("text")), " ")
    return (
        docs.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_docs") >= 1)
        .orderBy("fingerprint")
    )


def q_doc_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split — the assignment every
    training-data pipeline needs before anything ships to a trainer.

    Split = lexicographic band of the first two hex chars of
    md5(doc_id): < 'cc' train (204/256 ≈ 79.7%), < 'e6' valid
    (26/256 ≈ 10.2%), else test (≈10.2%). Pure column exprs, identical
    bytes in Spark/DuckDB/hashlib (the repo's cross-engine md5 rule),
    stable under any repartitioning — a doc's split never depends on
    what else is in the batch (the property RNG-based splits lack).
    Scale: one scan, one tiny groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "cc", "train").when(h2 < "e6", "valid").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("split", "source")
    )


QUERIES = {
    "q_word_topk": q_word_topk,
    "q_doc_split": q_doc_split,
    "q_doc_quality": q_doc_quality,
    "q_token_counts": q_token_counts,
    "q_lang_id": q_lang_id,
    "q_doc_summaries": q_doc_summaries,
    "q_doc_fingerprint": q_doc_fingerprint,
}

_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"

ORACLES = {
    "q_doc_split": """
        SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'valid'
                    ELSE 'test' END AS split,
               source, count(*) AS n_docs,
               round(avg(n_chars), 4) AS avg_chars
        FROM documents GROUP BY 1, 2 ORDER BY split, source
    """,
    "q_word_topk": f"""
        SELECT word, count(*) AS n
        FROM (
            SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                      w -> w <> '')) AS word
            FROM documents
        )
        WHERE length(word) > 2 AND word NOT IN {_STOP_SQL}
        GROUP BY word ORDER BY n DESC, word LIMIT 30
    """,
    "q_doc_quality": f"""
        WITH per_doc AS (
            SELECT lang, n_chars,
                   len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   w -> w <> '')) AS n_tokens,
                   len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   w -> w IN {_STOP_SQL})) AS n_stop
            FROM documents
        )
        SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(sum(n_stop) / sum(n_tokens), 6) AS stopword_ratio,
               round(sum(n_chars) / sum(n_tokens), 6) AS chars_per_token
        FROM per_doc GROUP BY lang ORDER BY lang
    """,
    "q_token_counts": """
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
        FROM documents GROUP BY source ORDER BY source
    """,
    "q_doc_summaries": r"""
        SELECT doc_id,
               CASE WHEN len(string_split_regex(trim(text), '\s+')) > 24
                    THEN array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1, 24), ' ') || ' ...'
                    ELSE array_to_string(string_split_regex(trim(text), '\s+'), ' ') END AS summary,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_source_tokens
        FROM documents ORDER BY doc_id LIMIT 100
    """,
    "q_lang_id": """
        SELECT lang,
               CASE WHEN list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'the') THEN 'en'
                    WHEN list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'data') THEN 'de'
                    ELSE 'xx' END AS predicted_lang,
               count(*) AS n
        FROM documents GROUP BY 1, 2 ORDER BY lang, predicted_lang
    """,
    "q_doc_fingerprint": """
        SELECT md5(array_to_string(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                               w -> w <> ''), ' ')) AS fingerprint,
               count(*) AS n_docs, min(doc_id) AS keeper_doc_id
        FROM documents
        GROUP BY 1 HAVING count(*) >= 1
        ORDER BY fingerprint
    """,
}
