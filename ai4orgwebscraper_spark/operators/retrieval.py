"""Search/retrieval operators over `documents`: inverted index, BM25
ranked retrieval, TF-IDF characteristic terms.

The reference surfaces keyword analytics one page at a time
(app.py:125-155: regex tokenize -> Counter; app.py:148-149 top-k);
a crawler whose output feeds search needs the corpus-wide versions:
a term -> postings index, a ranked keyword query over it, and
per-group characteristic terms. All three are pure DataFrame algebra
(explode / groupBy / broadcast join / window) — no Python in the hot
path — and each carries a DuckDB oracle.

Cross-engine determinism: no libm calls (log/exp differ in final ULP
between JVM and C runtimes). BM25 uses the log-free rational idf
(N - df + 0.5)/(df + 0.5) — the same monotone core the Robertson
idf wraps in ln() — so every per-row value is built from integer
counts with +,-,*,/ IEEE double ops only, which are bit-identical
across engines when the expression tree matches. Per-term scores are
rounded then summed through decimal(18,6) (exact, order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai4orgwebscraper_spark.operators.text import STOPWORDS, _tokens
from ai4orgwebscraper_spark.sources.readers import load_table, load_wide

DEC6 = "decimal(18,6)"

# fixed keyword query for the ranked-retrieval entry (terms exist in
# the synthetic vocab at every SF; the operator takes any list)
BM25_QUERY_TERMS = ("spark", "join", "window")
BM25_K1 = 1.2
BM25_B = 0.75


def _index_terms(docs: DataFrame) -> DataFrame:
    """(doc_id, term) occurrences under the engine's standard text
    filters (len > 2, stopwords out — text.py:_tokens + q_word_topk's
    predicate, reference app.py:136-138)."""
    return (
        docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .filter((F.length("term") > 2) & ~F.col("term").isin(*STOPWORDS))
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term -> (df, total tf, head of the sorted posting list).

    Scale: explode -> partial count shrinks each partition to ~vocab
    x docs-per-partition before the (term, doc_id) shuffle; the final
    per-term stats agg is vocab-sized. The posting-list head is NOT a
    per-term collect_* (a hot term's full posting list must never
    materialize as one in-memory array): it is a rank-filtered window
    over (term, doc_id) — a sort-based, spillable shuffle, and the
    SAME sorted distribution the production materialization (the
    sorted/bucketed write of the (term, doc_id, tf) table, see README
    100 TB table) needs anyway — so only <=5 rows per term survive
    into the bounded collect_list."""
    per = (
        _index_terms(load_wide(spark, sf_dir, "documents"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    stats = per.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("tf_total"),
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    head = (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("term")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
            ).alias("postings_head")
        )
    )
    return stats.join(head, "term").select(
        "term", "df", "tf_total", "postings_head"
    ).orderBy(F.desc("df"), "term")


def bm25_scores(
    docs: DataFrame, terms: tuple[str, ...] = BM25_QUERY_TERMS
) -> DataFrame:
    """BM25 (rational-idf variant) of `terms` over `docs`, one row per
    matching document: (doc_id, n_terms, score).

    Scale shape: doc lengths and per-(doc, term) tfs come out of one
    explode+agg pass each; the corpus stats (N, sum dl) are exact
    integers collected to the driver and folded in as literals —
    model-state-to-driver like clustering.kmeans, never a data-scale
    collect, and no 1-row crossJoin (BroadcastNestedLoopJoin) in the
    main DAG; the term-df table is vocab-sized and broadcast. The
    only data-scale shuffle is the groupBy(doc_id) — partial-agg'd,
    key-uniform. No libm: see module docstring."""
    toks = _index_terms(docs)
    # dl = index-term count per doc (docs with 0 index terms can never
    # match, so the inner-join universe is correct)
    doclen = toks.groupBy("doc_id").agg(F.count("*").alias("dl")).persist()
    n_docs = docs.count()  # exact integer, both engines agree
    sum_dl = doclen.agg(F.sum("dl")).collect()[0][0]  # exact long
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))

    avgdl = F.lit(sum_dl).cast("double") / F.lit(n_docs).cast("double")
    idf = (
        (F.lit(n_docs).cast("double") - F.col("df").cast("double")) + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    norm = F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (
        F.col("dl").cast("double") / F.col("avgdl")
    )
    tf_d = F.col("tf").cast("double")
    term_score = F.col("idf") * (
        (tf_d * F.lit(BM25_K1 + 1.0)) / (tf_d + F.lit(BM25_K1) * F.col("norm"))
    )
    return (
        tf.join(F.broadcast(df_tbl), "term")
        .join(doclen, "doc_id")
        .withColumn("avgdl", avgdl)
        .withColumn("idf", idf)
        .withColumn("norm", norm)
        .withColumn("term_score", F.round(term_score, 6).cast(DEC6))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("term_score").cast("double").alias("score"),
        )
    )


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the fixed keyword query under BM25
    (rational idf). Deterministic ties: (score desc, doc_id asc) —
    TakeOrderedAndProject, nothing wide after the per-doc agg."""
    docs = load_wide(spark, sf_dir, "documents")
    return (
        bm25_scores(docs)
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
        .select("doc_id", "n_terms", "score")
    )


def q_tfidf_lang_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per language by TF-IDF (rational
    idf N/df): what a corpus-curation pass reads to spot vocabulary
    drift per shard.

    Scale: term df table is vocab-sized -> broadcast; the window
    partitions by lang over vocab-sized per-lang aggregates (tiny
    post-agg, no skew exposure)."""
    docs = load_wide(spark, sf_dir, "documents")
    toks = _index_terms(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    n_docs = docs.count()
    tf_lang = toks.groupBy("lang", "term").agg(F.count("*").alias("tf_lang"))
    df_tbl = (
        _index_terms(docs)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    scored = tf_lang.join(F.broadcast(df_tbl), "term").withColumn(
        "score",
        F.round(
            (F.col("tf_lang") * F.lit(n_docs)).cast("double")
            / F.col("df").cast("double"),
            6,
        ),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("lang", "rk", "term", F.col("tf_lang").cast("long").alias("tf_lang"), F.col("df").cast("long").alias("df"), "score")
        .orderBy("lang", "rk")
    )


QUERIES = {
    "q_inverted_index": q_inverted_index,
    "q_bm25_search": q_bm25_search,
    "q_tfidf_lang_terms": q_tfidf_lang_terms,
}

_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"
_TOKS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')"
)
_TERMS_CTE = f"""
    tok AS (
        SELECT doc_id, t.term AS term
        FROM documents, unnest({_TOKS_SQL}) AS t(term)
        WHERE len(t.term) > 2 AND t.term NOT IN {_STOP_SQL}
    )
"""
_BM25_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS) + ")"

ORACLES = {
    "q_inverted_index": f"""
        WITH {_TERMS_CTE},
        per AS (
            SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id
        )
        SELECT term,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf) AS BIGINT) AS tf_total,
               array_to_string(list_slice(list_sort(list(doc_id)), 1, 5), ',')
                   AS postings_head
        FROM per GROUP BY term
        ORDER BY df DESC, term
    """,
    "q_bm25_search": f"""
        WITH {_TERMS_CTE},
        doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        corpus AS (
            SELECT (SELECT count(*) FROM documents) AS n_docs,
                   (SELECT sum(dl) FROM doclen) AS sum_dl
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok
            WHERE term IN {_BM25_TERMS_SQL} GROUP BY doc_id, term
        ),
        df_tbl AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        scored AS (
            SELECT tf.doc_id,
                   CAST(ROUND(
                       (((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5))
                       * ((CAST(tf AS DOUBLE) * {BM25_K1 + 1.0})
                          / (CAST(tf AS DOUBLE)
                             + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                                 * (CAST(dl AS DOUBLE)
                                    / (CAST(sum_dl AS DOUBLE)
                                       / CAST(n_docs AS DOUBLE)))))),
                   6) AS DECIMAL(18,6)) AS term_score
            FROM tf
            JOIN df_tbl USING (term)
            JOIN doclen ON tf.doc_id = doclen.doc_id
            CROSS JOIN corpus
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(term_score) AS DOUBLE) AS score
        FROM scored GROUP BY doc_id
        ORDER BY score DESC, doc_id
        LIMIT 20
    """,
    "q_tfidf_lang_terms": f"""
        WITH {_TERMS_CTE},
        toklang AS (
            SELECT tok.doc_id, tok.term, d.lang
            FROM tok JOIN documents d ON tok.doc_id = d.doc_id
        ),
        tf_lang AS (
            SELECT lang, term, count(*) AS tf_lang
            FROM toklang GROUP BY lang, term
        ),
        df_tbl AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
        ),
        scored AS (
            SELECT lang, term, tf_lang, df,
                   ROUND(CAST(tf_lang * (SELECT count(*) FROM documents)
                              AS DOUBLE) / CAST(df AS DOUBLE), 6) AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY
                       ROUND(CAST(tf_lang * (SELECT count(*) FROM documents)
                                  AS DOUBLE) / CAST(df AS DOUBLE), 6) DESC,
                       term
                   ) AS rk
            FROM tf_lang JOIN df_tbl USING (term)
        )
        SELECT lang, CAST(rk AS BIGINT) AS rk, term,
               CAST(tf_lang AS BIGINT) AS tf_lang,
               CAST(df AS BIGINT) AS df, score
        FROM scored WHERE rk <= 5
        ORDER BY lang, rk
    """,
}
