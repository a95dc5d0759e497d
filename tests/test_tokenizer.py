"""Semantic tests for distributed BPE training: the Spark merge
learner must equal a from-scratch canonical greedy BPE (tuple-list
implementation, no string encoding) — including the overlap case
('a a a' fuses leftmost-first) and multi-character follow-up merges.

Cross-engine value parity at sf0.001 is covered by
tests/test_operators_oracle.py (q_bpe_merges registers a DuckDB
oracle); these tests pin the ALGORITHM independently of both engines.
"""

from __future__ import annotations

import pytest

from ai4orgwebscraper_spark.operators.tokenizer import bpe_merges


def bpe_py(words: dict[str, int], n_merges: int) -> list[tuple[str, str, int]]:
    """Canonical corpus-weighted greedy BPE on symbol tuples."""
    seqs = {w: tuple(w) for w in words}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, n in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + n
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        for w, s in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def _learn(spark, words: dict[str, int], n_merges: int):
    df = spark.createDataFrame(list(words.items()), "word string, n long")
    return bpe_merges(df, n_merges=n_merges)


def test_bpe_matches_twin_on_overlaps(spark):
    # 'aaaa'/'aaa' force the overlap rule: greedy leftmost fusing, so
    # 'aaa' -> (aa, a), never (a, aa); a single-space string encoding
    # would get this wrong (module docstring)
    words = {"aaaa": 7, "aaa": 5, "aab": 4, "baa": 3, "ab": 6}
    assert _learn(spark, words, 4) == bpe_py(words, 4)
    # first merge must be (a, a): weighted count 7*3 + 5*2 + 4 + 3 = 38
    assert bpe_py(words, 1)[0][:2] == ("a", "a")


def test_bpe_multichar_symbols(spark):
    # enough 'st'/'sta'/'star' mass that merges chain: (s,t) then
    # (st,a)-family — pins that fused symbols participate in later
    # pair counts with multi-char names
    words = {"star": 10, "start": 8, "stars": 6, "sting": 4, "mar": 2}
    got = _learn(spark, words, 5)
    exp = bpe_py(words, 5)
    assert got == exp
    syms = {(a, b) for a, b, _ in exp}
    assert any(len(a) > 1 or len(b) > 1 for a, b in syms)


def test_bpe_tie_break_lexicographic(spark):
    # 'ab' and 'cd' tie at count 5: the smaller pair (a,b) must win
    words = {"ab": 5, "cd": 5}
    got = _learn(spark, words, 1)
    assert got == [("a", "b", 5)] == bpe_py(words, 1)


def test_bpe_exhausts_when_fully_fused(spark):
    # one 2-char word: merge 1 fuses it to a single symbol, merge 2
    # has no pairs left -> learner stops early instead of erroring
    words = {"xy": 3}
    assert _learn(spark, words, 5) == [("x", "y", 3)] == bpe_py(words, 5)


def test_bpe_empty_vocab(spark):
    assert _learn(spark, {}, 3) == []


@pytest.mark.parametrize("n", [1, 3])
def test_bpe_weighting_matters(spark, n):
    # same words, different counts -> different merge order; pins that
    # counts weight the pair statistics (not distinct-word counting)
    w1 = {"abc": 100, "xyz": 1}
    w2 = {"abc": 1, "xyz": 100}
    assert _learn(spark, w1, n) == bpe_py(w1, n)
    assert _learn(spark, w2, n) == bpe_py(w2, n)
    assert bpe_py(w1, 1) != bpe_py(w2, 1)


# ---------------------------------------------------------------------------
# BPE ENCODE (apply) — the trained merges applied back to words
# ---------------------------------------------------------------------------

def encode_py(word: str, merges) -> tuple[str, ...]:
    """Apply merges in training order, greedy leftmost per rule."""
    s: tuple[str, ...] = tuple(word)
    for a, b, _cnt in merges:
        out: list[str] = []
        i = 0
        while i < len(s):
            if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = tuple(out)
    return s


def test_encode_seq_col_matches_twin(spark):
    from pyspark.sql import functions as F

    from ai4orgwebscraper_spark.operators.tokenizer import encode_seq_col

    words = {"aaaa": 7, "aaa": 5, "aab": 4, "baa": 3, "ab": 6, "cab": 2}
    merges = _learn(spark, words, 4)
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: tuple(r["syms"])
        for r in df.select(
            "word",
            F.split(F.trim(encode_seq_col(F.col("word"), merges)), "  ").alias("syms"),
        ).collect()
    }
    for w in words:
        assert got[w] == encode_py(w, merges), w


def test_q_bpe_encode_consistency(spark):
    """Totals are internally consistent on the real fixture: every
    word encodes to >= 1 symbol and <= len(word) symbols, so
    n_words <= n_subwords <= total chars; ppm matches the totals."""
    from ai4orgwebscraper_spark.operators.tokenizer import q_bpe_encode

    rows = q_bpe_encode(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_words"] <= r["n_subwords"]
        assert r["subwords_per_word_ppm"] == (r["n_subwords"] * 1000000) // r["n_words"]
        assert r["n_distinct_subwords"] >= 1
