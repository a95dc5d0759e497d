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

from ai4orgwebscraper_spark.sources.readers import load_table, load_wide

# reference's fallback stopword list shape (app.py:140-145): small,
# fixed, deterministic
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def _tokens(col):
    """Tokenize: lower + split on non-word runs, drop empties
    (reference app.py:22 `\\b\\w+\\b` + app.py:136-138 filters).

    r6: array_remove instead of a filter() lambda — identical output
    (split never yields nulls, so removing '' IS the w != '' filter),
    but without per-row lambda dispatch: the lambda HOF is
    CodegenFallback and measured 1.7x slower on the sf1 token pass
    (1.46s vs 0.85s warm)."""
    return F.array_remove(F.split(F.lower(col), "[^a-z0-9]+"), "")


def q_word_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-frequency top-30 (reference A1, app.py:148-149).

    Scale: explode → partial-agg shrinks per-partition to vocab size
    before the shuffle; top-30 is TakeOrderedAndProject."""
    docs = load_wide(spark, sf_dir, "documents")
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
    docs = load_wide(spark, sf_dir, "documents")
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
    docs = load_wide(spark, sf_dir, "documents")
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

    docs = load_wide(spark, sf_dir, "documents")
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
    docs = load_wide(spark, sf_dir, "documents")
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


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-quality signals (the Gopher/C4-style gates a
    training pipeline runs before mixing): per doc, the most-frequent
    bigram's share of all bigrams and the duplicate-token fraction;
    per source, averages plus how many docs a repetition gate
    (top-bigram share > 0.18 OR duplicate-token fraction > 0.6) would
    drop. Docs with fewer than two tokens have no bigram and are
    excluded on both engines.

    Scale shape: bigrams come from an in-row transform(sequence) —
    no self-join — then explode + partial-agg shrinks each partition
    to its per-doc bigram vocabulary before the (doc_id-keyed)
    shuffle; every later group key is doc_id or source, never a
    corpus-wide single partition. Ratios are exact int-division
    doubles, so the gate comparisons are bit-identical across
    engines; only the averaged outputs need rounding."""
    docs = load_wide(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    base = (
        docs.select("doc_id", "source", toks.alias("t"))
        .withColumn("n", F.size("t"))
        .filter(F.col("n") >= 2)
    )
    bigrams = base.select(
        "doc_id",
        "source",
        F.explode(
            F.expr("transform(sequence(0, n - 2), i -> concat(t[i], ' ', t[i + 1]))")
        ).alias("bg"),
    )
    counts = bigrams.groupBy("doc_id", "source", "bg").agg(F.count("*").alias("c"))
    bgfrac = counts.groupBy("doc_id", "source").agg(
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias("top2")
    )
    tokfrac = base.select(
        "doc_id",
        "source",
        (
            F.lit(1.0) - (F.size(F.array_distinct("t")).cast("double") / F.col("n"))
        ).alias("dupfrac"),
    )
    per_doc = bgfrac.join(tokfrac, ["doc_id", "source"])
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("top2"), 6).alias("avg_top_bigram_frac"),
            F.round(F.avg("dupfrac"), 6).alias("avg_dup_token_frac"),
            F.sum(
                F.when((F.col("top2") > 0.18) | (F.col("dupfrac") > 0.6), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_flagged"),
        )
        .orderBy("source")
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the normalized token stream
    (reference '.works' md5 keying, app_wrapper.py.works:29). The
    exact-dedup primitive: groupBy fingerprint."""
    docs = load_wide(spark, sf_dir, "documents")
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


# corpus mixing (q_corpus_mix): per-source epoch weights for training
# mixtures ("2 epochs of wiki, half of web" — the knob every LLM data
# recipe turns). Weight class = source index % 4 → (integer epochs,
# fractional-part hex threshold on 3 md5 hex chars, i.e. x/4096):
# 2.0, 1.25, 0.5, 0.75 epochs. The fractional epoch keeps a doc iff
# md5(source#doc_id)[:3] < threshold — deterministic, repartition-
# stable, identical bytes cross-engine (the q_doc_split rule).
_MIX_EPOCHS = [2, 1, 0, 0]
_MIX_FRAC_HEX = ["000", "400", "800", "c00"]  # 0, .25, .5, .75 of 4096


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixture: emit each doc `copies` times (integer
    epochs + md5-thresholded fractional epoch), then profile the
    mixture per source. The explode IS the materialization a trainer
    consumes; scale shape: one scan, narrow exprs, explode fan-out
    bounded by max weight, one partial+final agg."""
    docs = load_table(spark, sf_dir, "documents")
    idx = F.substring("source", 4, 10).cast("int") % 4
    epochs = F.element_at(F.array(*[F.lit(e) for e in _MIX_EPOCHS]), idx + 1)
    thr = F.element_at(F.array(*[F.lit(t) for t in _MIX_FRAC_HEX]), idx + 1)
    u3 = F.substring(
        F.md5(F.concat_ws("#", "source", F.col("doc_id").cast("string"))), 1, 3
    )
    copies = epochs + F.when(u3 < thr, 1).otherwise(0)
    mixture = (
        docs.withColumn("copies", copies)
        .filter(F.col("copies") > 0)
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.explode(F.sequence(F.lit(1), F.col("copies"))).alias("epoch"),
        )
    )
    return (
        mixture.groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_copies"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


PACK_CTX = 2048  # chars per packed training sequence (token proxy)


def q_doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing profile: concatenate each source's docs in
    doc_id order into fixed-size context windows (contiguous packing —
    what a dataloader does before training) and report bins, fill
    ratio, and boundary-straddling docs per source.

    Scale shape: the running sum is a window PARTITIONED BY source
    (shard-local — never a single-partition window); packing is
    per-shard at 100 TB by construction."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_chars").over(w)
    before = cum - F.col("n_chars")
    staged = docs.select(
        "source",
        "n_chars",
        cum.alias("cum"),
        F.floor(before / F.lit(PACK_CTX)).alias("bin_start"),
        F.floor((cum - 1) / F.lit(PACK_CTX)).alias("bin_end"),
    )
    n_bins = F.floor((F.max("cum") + F.lit(PACK_CTX - 1)) / F.lit(PACK_CTX))
    return (
        staged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            n_bins.cast("long").alias("n_bins"),
            F.round(
                F.max("cum") / (n_bins * F.lit(PACK_CTX)), 4
            ).alias("avg_fill"),
            F.sum(
                F.when(F.col("bin_start") != F.col("bin_end"), 1).otherwise(0)
            ).alias("n_straddlers"),
        )
        .orderBy("source")
    )


# q_doc_filter_pipeline thresholds (integer arithmetic — exact
# cross-engine): min chars, and the stopword permille cap (~p90 of the
# corpus distribution, so the bucket is non-trivial)
MIN_CHARS = 150
STOP_MAX_PERMILLE = 106


def q_doc_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-filter CASCADE a training pipeline runs before
    anything ships: per doc, the FIRST failing gate is its drop reason
    (too_short → high_stopword → exact_dup → lang_mismatch → keep),
    profiled per reason. Composes the suite's own primitives — length
    gate, stopword ratio (quality), md5 fingerprint keeper rank
    (exact dedup), marker-rule language id — in one pass.

    Scale shape: one scan; the only shuffle is the fingerprint window
    (PARTITIONED by fingerprint — shard-local) plus the final tiny
    agg. The per-doc reason column is the write path a real pipeline
    materializes; the profile is the driver-checkable projection."""
    from pyspark.sql import Window

    docs = load_wide(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    staged = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w))).alias("n_stop"),
        F.when(F.array_contains(toks, "the"), "en")
        .when(F.array_contains(toks, "data"), "de")
        .otherwise("xx")
        .alias("pred"),
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
    )
    fp_rank = F.row_number().over(
        Window.partitionBy("fingerprint").orderBy("doc_id")
    )
    reason = (
        F.when(F.col("n_chars") < MIN_CHARS, "too_short")
        .when(
            F.col("n_stop") * 1000 > F.col("n_tokens") * STOP_MAX_PERMILLE,
            "high_stopword",
        )
        .when(F.col("fp_rank") > 1, "exact_dup")
        .when(F.col("pred") != F.col("lang"), "lang_mismatch")
        .otherwise("keep")
    )
    return (
        staged.withColumn("fp_rank", fp_rank)
        .select(reason.alias("reason"), "n_chars", "source")
        .groupBy("reason")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("source").alias("n_sources"),
        )
        .orderBy("reason")
    )


SAMPLE_PER_SOURCE = 5


def q_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: the N docs per source with the
    smallest md5(source#doc_id) — a uniform per-stratum sample with no
    RNG (the eval-set construction every pipeline needs, stable under
    repartitioning and re-runs; same md5 discipline as q_doc_split).

    Scale shape: the ranking window is PARTITIONED by source
    (stratum-local); at 10^10 docs each stratum ranks independently —
    no global sort, no single-partition window."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    u = F.md5(F.concat_ws("#", "source", F.col("doc_id").cast("string")))
    rk = F.row_number().over(Window.partitionBy("source").orderBy(u, "doc_id"))
    return (
        docs.select("source", "doc_id", "lang", "n_chars", u.alias("u"))
        .withColumn("rk", rk)
        .filter(F.col("rk") <= SAMPLE_PER_SOURCE)
        .select("source", F.col("rk").cast("long").alias("rk"), "doc_id", "lang", "n_chars")
        .orderBy("source", "rk")
    )


SELECT_VOCAB = 40
SELECT_TOPK = 3


def q_doc_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-domain importance selection (DSIR-lite — Xie et al.
    2023 "Data Selection for Language Models via Importance
    Resampling", reduced to its RNG-free core): score every document
    by how much of its token mass falls in the TARGET domain's
    characteristic vocabulary, then take the top-k per source. Target
    here = the `lang='en'` sub-corpus; vocabulary = its top-40 tokens
    by frequency (ties: token asc — deterministic).

    Scale shape: the vocabulary is MODEL STATE (top-V agg → V rows to
    the driver, exactly the kmeans-centroid pattern,
    clustering.py:90), folded back as an in-row literal-array filter —
    scoring is a single narrow pass with NO explode and NO shuffle; at
    a realistic 10^5-term vocabulary the same score is the
    broadcast-hash-join of an exploded token column (the in-row form
    is the V<=O(100) fast path). The only shuffles are the tiny vocab
    agg and the per-source top-k window (source-partitioned,
    row_number-pruned)."""
    from pyspark.sql import Window

    docs = load_wide(spark, sf_dir, "documents")
    vocab_rows = (
        docs.filter(F.col("lang") == "en")
        .select(F.explode(_tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(SELECT_VOCAB)
        .collect()
    )
    vocab_arr = F.array(*[F.lit(r["w"]) for r in vocab_rows])
    toks = _tokens(F.col("text"))
    in_vocab = F.size(F.filter(toks, lambda t: F.array_contains(vocab_arr, t)))
    scored = docs.select(
        "source",
        "doc_id",
        F.when(
            F.size(toks) > 0, F.round(in_vocab / F.size(toks), 6)
        )
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("score"), "doc_id")
    )
    return (
        scored.withColumn("sel_rank", rk)
        .filter(F.col("sel_rank") <= SELECT_TOPK)
        .select(
            "source", F.col("sel_rank").cast("long").alias("sel_rank"),
            "doc_id", "score",
        )
        .orderBy("source", "sel_rank")
    )


QUALITY_BUCKETS = 3  # CCNet's head / middle / tail


def q_doc_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020: score every
    document with an LM trained on a clean corpus, split each shard
    into head/middle/tail by score percentile; head feeds training).
    Re-expressed RNG- and log-free so both engines agree bit-for-bit:
    the "LM" is the unigram frequency table of the `lang='en'`
    sub-corpus (the clean-corpus proxy) and the score is the doc's
    MEAN REFERENCE-TOKEN LIKELIHOOD in parts-per-million —
    score_ppm = (sum of each token's reference count) * 1e6
    `div` n_tokens, exact bigint floor division (the constant 1/|ref|
    scale factor is dropped; ordering is unchanged). Unseen tokens
    count 0. Buckets: ntile(3) per source over (score desc, doc_id) —
    1=head, 2=middle, 3=tail.

    Scale shape: the LM is a vocab-sized table (NOT data-sized) —
    broadcast-hash-joined onto the exploded token stream, the
    complementary path to q_doc_selection's in-row literal vocab (use
    this one when V is too big to fold into the plan). Per-doc scores
    are one partial-agg'd groupBy(doc_id); the ntile window is
    source-partitioned (shard key — no SinglePartition). Bigint
    headroom: sum_ref <= n_tokens * max_ref_count; at 10^10-doc scale
    move score_ppm to decimal(38,0)."""
    from pyspark.sql import Window

    docs = load_wide(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(_tokens(F.col("text"))).alias("token")
    )
    ref_lm = (
        docs.filter(F.col("lang") == "en")
        .select(F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("ref_c"))
    )
    per_doc = (
        toks.join(F.broadcast(ref_lm), "token", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.coalesce(F.col("ref_c"), F.lit(0))).alias("sum_ref"),
            F.count("*").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "source",
            F.expr("(sum_ref * 1000000) div n_tokens").alias("score_ppm"),
        )
    )
    bucket = F.ntile(QUALITY_BUCKETS).over(
        Window.partitionBy("source").orderBy(F.desc("score_ppm"), "doc_id")
    )
    label = (
        F.when(F.col("b") == 1, "head")
        .when(F.col("b") == 2, "middle")
        .otherwise("tail")
    )
    return (
        per_doc.withColumn("b", bucket)
        .select("source", label.alias("bucket"), "score_ppm")
        .groupBy("source", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("score_ppm").cast("long").alias("sum_score_ppm"),
        )
        .orderBy("source", "bucket")
    )


N_SHUFFLE_SHARDS = 256  # first-2-hex-char shard key; production sets
# this >= cluster width (it is the window parallelism below)


CHUNK_TOKENS = 100  # RAG-standard window
CHUNK_STRIDE = 80  # 20-token overlap between consecutive chunks


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERLAPPING document chunking — the context-window split every
    retrieval/RAG pipeline runs before embedding (LangChain/LlamaIndex
    default shape: fixed window, fixed overlap so no sentence is cut
    from both sides). Completes the repo's slicing triptych: fixed
    grid (q_dedup_segments), stride-1 (q_dedup_dupspans), and this
    strided-overlap shape.

    Rule: chunk i of a doc covers tokens [i*80+1, i*80+100];
    n_chunks = ceil(max(n_tokens - 20, 1) / 80) — exactly enough
    starts that every token is covered and the final chunk keeps at
    least the overlap's worth of fresh tokens (n=100 -> 1 chunk,
    n=101 -> 2, n=10 -> 1). Empty docs chunk to one empty chunk (the
    q_dedup_segments convention, so doc counts reconcile).

    Output per source: doc/chunk/token totals, the exact overlap
    blow-up in ppm ((chunk_tokens - doc_tokens) * 1e6 div
    doc_tokens — the storage price of the overlap, the number a
    capacity plan needs), and the distinct-chunk count (md5; chunking
    feeds dedup — identical chunks across docs embed identically and
    an index stores them once).

    Scale shape: one explode bounded by ~n/80 rows per doc (the
    in-row transform lambda runs once per CHUNK, not per token — two
    orders cheaper than where the interpreted-HOF tax bit
    q_dedup_dupspans); chunk stats partial-aggregate per source;
    distinct-chunk count is one map-side-combined distinct on the
    32-char md5."""
    docs = load_wide(spark, sf_dir, "documents")
    base = docs.select("doc_id", "source", _tokens(F.col("text")).alias("toks"))
    n_chunks = F.ceil(
        F.greatest(F.size("toks") - F.lit(CHUNK_TOKENS - CHUNK_STRIDE), F.lit(1))
        / F.lit(CHUNK_STRIDE)
    ).cast("int")
    chunks = base.select(
        "doc_id",
        "source",
        F.size("toks").alias("n_doc_tokens"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(
                    F.col("toks"), i * CHUNK_STRIDE + 1, CHUNK_TOKENS
                ),
            )
        ).alias("chunk"),
    ).select(
        "source",
        "doc_id",
        "n_doc_tokens",
        F.size("chunk").alias("chunk_len"),
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_md5"),
    )
    per_doc = chunks.groupBy("source", "doc_id", "n_doc_tokens").agg(
        F.count("*").alias("n_chunks"), F.sum("chunk_len").alias("chunk_tokens")
    )
    stats = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chunks").alias("n_chunks"),
        F.sum("n_doc_tokens").alias("n_doc_tokens"),
        F.sum("chunk_tokens").alias("n_chunk_tokens"),
    )
    distincts = chunks.groupBy("source").agg(
        F.count_distinct("chunk_md5").alias("n_distinct_chunks")
    )
    return (
        stats.join(distincts, "source")
        .select(
            "source",
            "n_docs",
            "n_chunks",
            "n_chunk_tokens",
            F.expr(
                "(n_chunk_tokens - n_doc_tokens) * 1000000 div n_doc_tokens"
            ).alias("overlap_ppm"),
            "n_distinct_chunks",
        )
        .orderBy("source")
    )


def q_doc_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE into training shards — the step
    between a curated corpus and a trainer: every epoch's read order
    must be (a) uniformly shuffled, (b) reproducible bit-for-bit, and
    (c) computable without a global sort. Shuffle key =
    md5(doc_id || ':shuffle:epoch0'); shard = first 2 hex chars
    (256 shards); within-shard order = (key, doc_id). A trainer reads
    shards in number order, rows in key order — a deterministic
    permutation of the corpus that no repartitioning can change
    (contrast df.orderBy(rand()): RNG-seeded per-partition, neither
    stable nor resumable).

    Output: per-shard audit — doc count, char sum, the first doc in
    read order, and an order-sensitive checksum
    sum(position * doc_id) that any within-shard reordering breaks
    (the property the oracle actually pins; a count-only audit would
    pass under a broken sort).

    Scale shape: the key is one md5 column expr; the only shuffle is
    hash-partitioning by shard; the position window partitions by
    shard — parallelism = N_SHUFFLE_SHARDS, which production sizes to
    the cluster (shards also cap trainer-side file handles). No
    global sort: each shard sorts independently (externally if
    needed), the cross-shard order is the shard number itself.
    Checksum headroom: pos <= corpus/256, doc_id <= 10^10 →
    pos * doc_id < 2^63 up to ~10^12 docs; move to decimal(38,0)
    beyond."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle:epoch0"))).alias("k"),
    ).withColumn("shard", F.substring("k", 1, 2))
    pos = F.row_number().over(Window.partitionBy("shard").orderBy("k", "doc_id"))
    return (
        keyed.withColumn("pos", pos)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
            F.max(F.when(F.col("pos") == 1, F.col("doc_id"))).alias("first_doc"),
            F.sum(F.col("pos") * F.col("doc_id")).alias("order_checksum"),
        )
        .orderBy("shard")
    )


QUERIES = {
    "q_word_topk": q_word_topk,
    "q_doc_split": q_doc_split,
    "q_corpus_mix": q_corpus_mix,
    "q_doc_pack": q_doc_pack,
    "q_doc_filter_pipeline": q_doc_filter_pipeline,
    "q_doc_sample": q_doc_sample,
    "q_doc_selection": q_doc_selection,
    "q_doc_quality": q_doc_quality,
    "q_doc_repetition": q_doc_repetition,
    "q_token_counts": q_token_counts,
    "q_lang_id": q_lang_id,
    "q_doc_summaries": q_doc_summaries,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_doc_quality_buckets": q_doc_quality_buckets,
    "q_doc_shuffle_shards": q_doc_shuffle_shards,
    "q_doc_chunks": q_doc_chunks,
}

_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"

_MIX_EPOCH_CASE = (
    "(CASE cls WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END)"
)
_MIX_THR_CASE = (
    "(CASE cls WHEN 0 THEN '000' WHEN 1 THEN '400' "
    "WHEN 2 THEN '800' ELSE 'c00' END)"
)

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')"

ORACLES = {
    # q_doc_selection: en-corpus top-40 vocab -> in-vocab token-mass
    # score -> top-3 per source (the literal SQL of the Spark plan)
    "q_doc_selection": f"""
        WITH vocab AS (
            SELECT w FROM (
                SELECT unnest({_TOKS_SQL}) AS w FROM documents WHERE lang = 'en'
            ) GROUP BY w ORDER BY count(*) DESC, w LIMIT 40
        ),
        v AS (SELECT list(w) AS vs FROM vocab),
        scored AS (
            SELECT source, doc_id,
                   CASE WHEN len(toks) > 0
                        THEN round(CAST(len(list_filter(toks, t -> list_contains(v.vs, t))) AS DOUBLE) / len(toks), 6)
                        ELSE 0.0 END AS score
            FROM (SELECT source, doc_id, {_TOKS_SQL} AS toks FROM documents), v
        )
        SELECT source, CAST(rk AS BIGINT) AS sel_rank, doc_id, score FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY source ORDER BY score DESC, doc_id) AS rk
            FROM scored
        ) WHERE rk <= 3 ORDER BY source, sel_rank
    """,
    "q_doc_repetition": f"""
        WITH toks AS (
            SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents
            WHERE len({_TOKS_SQL}) >= 2
        ),
        bi AS (
            SELECT doc_id, source,
                   unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i + 1])) AS bg
            FROM toks
        ),
        counts AS (
            SELECT doc_id, source, bg, count(*) AS c
            FROM bi GROUP BY doc_id, source, bg
        ),
        bgfrac AS (
            SELECT doc_id, source,
                   CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top2
            FROM counts GROUP BY doc_id, source
        ),
        tokfrac AS (
            SELECT doc_id, source,
                   1.0 - (CAST(len(list_distinct(t)) AS DOUBLE) / len(t)) AS dupfrac
            FROM toks
        ),
        per_doc AS (
            SELECT b.doc_id, b.source, b.top2, tf.dupfrac
            FROM bgfrac b JOIN tokfrac tf USING (doc_id, source)
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(top2), 6) AS avg_top_bigram_frac,
               round(avg(dupfrac), 6) AS avg_dup_token_frac,
               CAST(sum(CASE WHEN top2 > 0.18 OR dupfrac > 0.6
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        FROM per_doc GROUP BY source ORDER BY source
    """,
    "q_doc_sample": f"""
        SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, lang, n_chars
        FROM (
            SELECT source, doc_id, lang, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(source || '#' || CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM documents
        )
        WHERE rk <= {SAMPLE_PER_SOURCE}
        ORDER BY source, rk
    """,
    "q_doc_filter_pipeline": f"""
        WITH staged AS (
            SELECT doc_id, source, lang, n_chars,
                   len({_TOKS_SQL}) AS n_tokens,
                   len(list_filter({_TOKS_SQL}, w -> w IN {_STOP_SQL})) AS n_stop,
                   CASE WHEN list_contains({_TOKS_SQL}, 'the') THEN 'en'
                        WHEN list_contains({_TOKS_SQL}, 'data') THEN 'de'
                        ELSE 'xx' END AS pred,
                   md5(array_to_string({_TOKS_SQL}, ' ')) AS fingerprint
            FROM documents
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY fingerprint
                                         ORDER BY doc_id) AS fp_rank
            FROM staged
        )
        SELECT CASE WHEN n_chars < {MIN_CHARS} THEN 'too_short'
                    WHEN n_stop * 1000 > n_tokens * {STOP_MAX_PERMILLE} THEN 'high_stopword'
                    WHEN fp_rank > 1 THEN 'exact_dup'
                    WHEN pred <> lang THEN 'lang_mismatch'
                    ELSE 'keep' END AS reason,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               count(DISTINCT source) AS n_sources
        FROM ranked GROUP BY 1 ORDER BY reason
    """,
    "q_corpus_mix": f"""
        WITH w AS (
            SELECT source, doc_id, n_chars,
                   CAST(substr(source, 4) AS INT) % 4 AS cls,
                   substr(md5(source || '#' || CAST(doc_id AS VARCHAR)), 1, 3) AS u3
            FROM documents
        ),
        c AS (
            SELECT source, doc_id, n_chars,
                   {_MIX_EPOCH_CASE}
                   + (CASE WHEN u3 < {_MIX_THR_CASE} THEN 1 ELSE 0 END) AS copies
            FROM w
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(copies) AS BIGINT) AS n_copies,
               CAST(sum(n_chars * copies) AS BIGINT) AS total_chars
        FROM c WHERE copies > 0
        GROUP BY source ORDER BY source
    """,
    "q_doc_pack": f"""
        WITH staged AS (
            SELECT source, n_chars,
                   sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
            FROM documents
        ),
        b AS (
            SELECT source, n_chars, cum,
                   floor((cum - n_chars) / {PACK_CTX}.0) AS bin_start,
                   floor((cum - 1) / {PACK_CTX}.0) AS bin_end
            FROM staged
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(floor((max(cum) + {PACK_CTX - 1}) / {PACK_CTX}.0) AS BIGINT) AS n_bins,
               round(max(cum) / (floor((max(cum) + {PACK_CTX - 1}) / {PACK_CTX}.0) * {PACK_CTX}), 4) AS avg_fill,
               CAST(sum(CASE WHEN bin_start <> bin_end THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
        FROM b GROUP BY source ORDER BY source
    """,
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

# q_doc_quality_buckets: the literal SQL of the CCNet-lite plan — en
# unigram table, left join onto the exploded token stream, exact
# bigint floor division, ntile(3) per source.
ORACLES["q_doc_quality_buckets"] = f"""
    WITH toks AS (
        SELECT doc_id, source, unnest({_TOKS_SQL}) AS token FROM documents
    ),
    ref_toks AS (
        SELECT unnest({_TOKS_SQL}) AS token FROM documents WHERE lang = 'en'
    ),
    ref_lm AS (
        SELECT token, count(*) AS ref_c FROM ref_toks GROUP BY token
    ),
    per_doc AS (
        SELECT t.doc_id, t.source,
               (sum(coalesce(r.ref_c, 0)) * 1000000) // count(*) AS score_ppm
        FROM toks t LEFT JOIN ref_lm r USING (token)
        GROUP BY t.doc_id, t.source
    ),
    bucketed AS (
        SELECT source, score_ppm,
               ntile(3) OVER (
                   PARTITION BY source ORDER BY score_ppm DESC, doc_id
               ) AS b
        FROM per_doc
    )
    SELECT source,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           CAST(sum(score_ppm) AS BIGINT) AS sum_score_ppm
    FROM bucketed GROUP BY source, bucket ORDER BY source, bucket
"""

# q_doc_shuffle_shards: the literal SQL of the deterministic global
# shuffle — md5 shuffle key, 2-hex-char shard, (key, doc_id) order,
# order-sensitive positional checksum.
ORACLES["q_doc_shuffle_shards"] = """
    WITH keyed AS (
        SELECT doc_id, n_chars,
               md5(CAST(doc_id AS VARCHAR) || ':shuffle:epoch0') AS k
        FROM documents
    ),
    positioned AS (
        SELECT doc_id, n_chars, substr(k, 1, 2) AS shard,
               row_number() OVER (
                   PARTITION BY substr(k, 1, 2) ORDER BY k, doc_id
               ) AS pos
        FROM keyed
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           max(CASE WHEN pos = 1 THEN doc_id END) AS first_doc,
           CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum
    FROM positioned GROUP BY shard ORDER BY shard
"""

# q_doc_chunks: the literal SQL of the strided-overlap chunker —
# n_chunks = ceil(max(n-20,1)/80), chunk i = toks[i*80+1 : i*80+100],
# per-source totals + exact overlap ppm + distinct-chunk count.
ORACLES["q_doc_chunks"] = f"""
    WITH d AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
    meta AS (
        SELECT doc_id, source, len(toks) AS n_doc_tokens,
               CAST(ceil(greatest(len(toks) - {CHUNK_TOKENS - CHUNK_STRIDE}, 1) / {CHUNK_STRIDE}.0) AS INT) AS n_chunks,
               toks
        FROM d
    ),
    chunks AS (
        SELECT source, doc_id, n_doc_tokens,
               len(toks[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS chunk_len,
               md5(array_to_string(toks[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')) AS chunk_md5
        FROM meta, UNNEST(range(0, n_chunks)) g(i)
    ),
    per_doc AS (
        SELECT source, doc_id, n_doc_tokens,
               count(*) AS n_chunks, sum(chunk_len) AS chunk_tokens
        FROM chunks GROUP BY source, doc_id, n_doc_tokens
    ),
    stats AS (
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
               CAST(sum(n_doc_tokens) AS BIGINT) AS n_doc_tokens,
               CAST(sum(chunk_tokens) AS BIGINT) AS n_chunk_tokens
        FROM per_doc GROUP BY source
    ),
    distincts AS (
        SELECT source, CAST(count(DISTINCT chunk_md5) AS BIGINT) AS n_distinct_chunks
        FROM chunks GROUP BY source
    )
    SELECT s.source, s.n_docs, s.n_chunks, s.n_chunk_tokens,
           (s.n_chunk_tokens - s.n_doc_tokens) * 1000000 // s.n_doc_tokens AS overlap_ppm,
           d.n_distinct_chunks
    FROM stats s JOIN distincts d USING (source)
    ORDER BY s.source
"""
