"""Semantic tests for the two late-r5 training-data operators:

- incremental dedup (`dedup.incremental_dedup` / `q_dedup_incremental`):
  classification precedence on planted frames, plus the 100 TB plan
  property the docstring promises — a fingerprint store persisted
  bucketed on `fingerprint` joins WITHOUT reshuffling the history side
  (exactly one more Exchange appears when the store is plain parquet).
- CCNet-style quality buckets (`text.q_doc_quality_buckets`): hand-
  computed head/middle/tail assignment and exact score_ppm values on a
  planted corpus.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from ai4orgwebscraper_spark.operators import dedup, text
from ai4orgwebscraper_spark.sources.warehouse import drop_table, write_bucketed


# ---------------------------------------------------------------------------
# incremental dedup — classification
# ---------------------------------------------------------------------------

def test_incremental_dedup_classification(spark):
    """Precedence: history membership beats in-delta duplication; the
    smallest doc_id of a delta-only fingerprint is the keeper."""
    history = spark.createDataFrame([("fpA",), ("fpB",)], "fingerprint string")
    delta = spark.createDataFrame(
        [
            (1, "s1", "fpA"),  # in store -> dup_of_history
            (2, "s1", "fpC"),  # first of a delta-only pair -> new
            (3, "s1", "fpC"),  # second -> dup_in_delta
            (4, "s2", "fpD"),  # singleton -> new
            (5, "s2", "fpB"),  # pair BOTH in store: history wins for
            (6, "s2", "fpB"),  # both rows, never dup_in_delta
        ],
        "doc_id long, source string, fingerprint string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in dedup.incremental_dedup(history, delta).collect()
    }
    assert got == {
        1: "dup_of_history",
        2: "new",
        3: "dup_in_delta",
        4: "new",
        5: "dup_of_history",
        6: "dup_of_history",
    }


def test_incremental_dedup_empty_history(spark):
    """Cold start: an empty store classifies the whole batch by
    in-batch order alone."""
    history = spark.createDataFrame([], "fingerprint string")
    delta = spark.createDataFrame(
        [(7, "s", "fpX"), (8, "s", "fpX")],
        "doc_id long, source string, fingerprint string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in dedup.incremental_dedup(history, delta).collect()
    }
    assert got == {7: "new", 8: "dup_in_delta"}


# ---------------------------------------------------------------------------
# incremental dedup — the history side never reshuffles when bucketed
# ---------------------------------------------------------------------------

def _executed_plan(df) -> str:
    df.collect()
    # keep only the AQE Final Plan — toString() appends the Initial
    # Plan too, which double-counts every Exchange
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_incremental_history_bucketed_store_skips_history_shuffle(spark):
    """The production contract from the docstring: persist the store
    bucketed on fingerprint and each batch's join reads the store's
    buckets as-is — only the delta shuffles into the store's layout.
    Pinned relatively: the bucketed plan has exactly one fewer
    Exchange than the identical query over a plain-parquet store, and
    both agree on values."""
    n = 200
    hist_rows = [("fp%04d" % i,) for i in range(n)]
    history = spark.createDataFrame(hist_rows, "fingerprint string")
    delta = spark.createDataFrame(
        [(i, "s%d" % (i % 3), "fp%04d" % (i * 7 % (2 * n))) for i in range(50)],
        "doc_id long, source string, fingerprint string",
    )
    root = tempfile.mkdtemp(prefix="fp_store_")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            history, "hist_fp_bkt", "fingerprint", 8, f"{root}/hist_fp_bkt"
        )
        plain_path = f"{root}/hist_fp_plain"
        history.write.mode("overwrite").parquet(plain_path)

        bucketed = dedup.incremental_dedup(spark.table("hist_fp_bkt"), delta)
        plain = dedup.incremental_dedup(spark.read.parquet(plain_path), delta)
        plan_b, plan_p = _executed_plan(bucketed), _executed_plan(plain)

        assert "SortMergeJoin" in plan_b
        assert "SelectedBucketsCount" in plan_b  # store read via buckets
        # bucketed: the delta's window shuffle is REUSED for the join
        # — one Exchange total, and it is on the delta (fingerprint)
        # side, never on the store side
        assert plan_b.count("Exchange hashpartitioning") == 1
        assert "Exchange hashpartitioning(h_fp" not in plan_b
        # plain store: the history side pays a second shuffle
        assert plan_p.count("Exchange hashpartitioning") == 2
        assert "Exchange hashpartitioning(h_fp" in plan_p

        key = lambda r: r["doc_id"]
        assert sorted(bucketed.collect(), key=key) == sorted(
            plain.collect(), key=key
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        drop_table(spark, "hist_fp_bkt")
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# CCNet-style quality buckets
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def quality_sf(spark, tmp_path_factory):
    """Planted corpus with a hand-computable reference LM.

    en docs (the reference corpus): doc 0 "aa bb aa", doc 10 "aa cc"
    -> ref counts {aa: 3, bb: 1, cc: 1}."""
    rows = [
        (0, "aa bb aa", "en", "s"),
        (1, "aa zz", "xx", "s"),
        (2, "zz qq", "xx", "s"),
        (10, "aa cc", "en", "t"),
        (11, "bb", "xx", "t"),
    ]
    df = spark.createDataFrame(
        [(d, t, l, s, len(t)) for d, t, l, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("quality")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_quality_buckets_hand_computed(spark, quality_sf):
    """score_ppm = sum(ref_c) * 1e6 div n_tokens, exact:
      doc 0: (3+1+3)*1e6 div 3 = 2333333   -> s/head
      doc 1: (3+0)*1e6  div 2 = 1500000    -> s/middle
      doc 2: 0                              -> s/tail
      doc 10: (3+1)*1e6 div 2 = 2000000    -> t/head
      doc 11: 1*1e6     div 1 = 1000000    -> t/middle (only 2 docs in
      t: ntile(3) fills buckets 1 and 2 — no tail row)."""
    got = [
        tuple(r)
        for r in text.q_doc_quality_buckets(spark, quality_sf).collect()
    ]
    assert got == [
        ("s", "head", 1, 2333333),
        ("s", "middle", 1, 1500000),
        ("s", "tail", 1, 0),
        ("t", "head", 1, 2000000),
        ("t", "middle", 1, 1000000),
    ]


def test_quality_buckets_unseen_tokens_score_zero(spark, quality_sf):
    """A doc made entirely of tokens absent from the en reference must
    land in its source's tail with score 0 (doc 2 above)."""
    rows = {
        (r["source"], r["bucket"]): r
        for r in text.q_doc_quality_buckets(spark, quality_sf).collect()
    }
    assert rows[("s", "tail")]["sum_score_ppm"] == 0


# ---------------------------------------------------------------------------
# deterministic global shuffle (text.q_doc_shuffle_shards)
# ---------------------------------------------------------------------------

def test_shuffle_shards_matches_hashlib_twin(spark, tmp_path_factory):
    """The shard assignment, read order, and order checksum equal a
    pure-Python md5 twin on a planted corpus."""
    import hashlib
    from collections import defaultdict

    rows = [(i, f"doc {i} words", "en", "src", 10 + i) for i in range(50)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path_factory.mktemp("shuffle")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    shards = defaultdict(list)
    for i, _t, _l, _s, n_chars in rows:
        k = hashlib.md5(f"{i}:shuffle:epoch0".encode()).hexdigest()
        shards[k[:2]].append((k, i, n_chars))
    expected = {}
    for sh, members in shards.items():
        members.sort()
        expected[sh] = {
            "n_docs": len(members),
            "n_chars": sum(m[2] for m in members),
            "first_doc": members[0][1],
            "order_checksum": sum((p + 1) * m[1] for p, m in enumerate(members)),
        }

    got = {r["shard"]: r for r in text.q_doc_shuffle_shards(spark, str(d)).collect()}
    assert set(got) == set(expected)
    for sh, e in expected.items():
        r = got[sh]
        assert (r["n_docs"], r["n_chars"], r["first_doc"], r["order_checksum"]) == (
            e["n_docs"], e["n_chars"], e["first_doc"], e["order_checksum"],
        ), sh


def test_shuffle_shards_repartition_stable(spark):
    """The permutation is a pure function of doc_id — any input
    partitioning produces identical audit rows (the property
    orderBy(rand()) lacks)."""
    sf = "/root/testdata/sf0.001"
    a = text.q_doc_shuffle_shards(spark, sf).collect()
    from ai4orgwebscraper_spark.sources.readers import load_table
    # same query over a violently repartitioned copy
    import tempfile, os
    d = tempfile.mkdtemp(prefix="shuffle_repart_")
    load_table(spark, sf, "documents").repartition(17).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    b = text.q_doc_shuffle_shards(spark, d).collect()
    assert a == b


# ---------------------------------------------------------------------------
# overlapping chunking (text.q_doc_chunks)
# ---------------------------------------------------------------------------

def test_doc_chunks_formula_and_coverage(spark, tmp_path_factory):
    """Chunk counts match the ceil((n-overlap)/stride) formula at the
    edges, every token is covered, and the overlap blow-up is exact."""
    import math

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    # n: below window, exactly window, window+1, multi-chunk, empty
    ns = [10, 100, 101, 180, 250, 0]
    rows = [(i, words(n), "en", "src", n) for i, n in enumerate(ns)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path_factory.mktemp("chunks")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = text.q_doc_chunks(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    exp_chunks = sum(math.ceil(max(n - 20, 1) / 80) for n in ns)
    assert r["n_docs"] == len(ns)
    assert r["n_chunks"] == exp_chunks

    def chunk_tokens(n):
        total = 0
        for i in range(math.ceil(max(n - 20, 1) / 80)):
            total += max(0, min(n - i * 80, 100))
        return total

    exp_chunk_tokens = sum(chunk_tokens(n) for n in ns)
    assert r["n_chunk_tokens"] == exp_chunk_tokens
    exp_doc_tokens = sum(ns)
    assert r["overlap_ppm"] == (exp_chunk_tokens - exp_doc_tokens) * 10**6 // exp_doc_tokens
    # coverage: chunk_tokens(n) >= n for every n (no token dropped)
    for n in ns:
        assert chunk_tokens(n) >= min(n, n)
