"""Semantic tests for the retrieval suite (inverted index / BM25 /
TF-IDF) against hand-computed pure-Python twins on a tiny corpus.

Cross-engine value parity at sf0.001 is covered by
tests/test_operators_oracle.py (the suite registers DuckDB oracles);
these tests pin the SEMANTICS — posting lists, the rational-idf BM25
formula, per-lang tf-idf ranking — independently of the SQL twin.
"""

from __future__ import annotations

import pytest

from ai4orgwebscraper_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_scores,
    q_bm25_search,
    q_inverted_index,
    q_tfidf_lang_terms,
)

DOCS = [
    # doc_id, text, lang
    (0, "spark spark join window table", "en"),
    (1, "join window window filter the a", "en"),
    (2, "spark merge merge merge scan", "de"),
    (3, "the a of to in is it", "de"),  # all stopwords/len<=2 -> empty
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(d, t, lang, "srcT", len(t)) for d, t, lang in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _twin_tokens(text: str) -> list[str]:
    import re

    stop = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}
    return [
        w
        for w in re.split(r"[^a-z0-9]+", text.lower())
        if w and len(w) > 2 and w not in stop
    ]


def test_inverted_index_postings(spark, docs_df, monkeypatch):
    import ai4orgwebscraper_spark.operators.retrieval as R

    monkeypatch.setattr(
        R, "load_table", lambda s, sf, t: docs_df
    )
    monkeypatch.setattr(
        R, "load_wide", lambda s, sf, t: docs_df
    )
    rows = {r["term"]: r for r in q_inverted_index(spark, "unused").collect()}
    # twin
    from collections import defaultdict

    tf = defaultdict(dict)
    for d, t, _ in DOCS:
        for w in _twin_tokens(t):
            tf[w][d] = tf[w].get(d, 0) + 1
    assert set(rows) == set(tf)
    for term, per in tf.items():
        r = rows[term]
        assert r["df"] == len(per)
        assert r["tf_total"] == sum(per.values())
        assert r["postings_head"] == ",".join(
            str(d) for d in sorted(per)[:5]
        )
    # doc 3 contributed nothing
    assert all("3" not in rows[t]["postings_head"] for t in rows)


def test_bm25_matches_python_twin(spark, docs_df):
    terms = ("spark", "join", "window")
    got = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in bm25_scores(docs_df, terms).collect()
    }
    # twin: same rational-idf formula, rounded per term then summed
    toks = {d: _twin_tokens(t) for d, t, _ in DOCS}
    n_docs = len(DOCS)
    doclen = {d: len(ws) for d, ws in toks.items() if ws}
    avgdl = sum(doclen.values()) / n_docs
    tf = {
        (d, q): toks[d].count(q)
        for d in toks
        for q in terms
        if toks[d].count(q) > 0
    }
    df = {q: sum(1 for (d, t) in tf if t == q) for q in terms}
    expect: dict[int, list[float]] = {}
    for (d, q), f in tf.items():
        idf = ((n_docs - df[q]) + 0.5) / (df[q] + 0.5)
        norm = (1.0 - BM25_B) + BM25_B * (doclen[d] / avgdl)
        s = idf * ((f * (BM25_K1 + 1.0)) / (f + BM25_K1 * norm))
        expect.setdefault(d, []).append(round(s, 6))
    assert set(got) == set(expect)
    for d, scores in expect.items():
        assert got[d][0] == len(scores)
        assert got[d][1] == pytest.approx(sum(scores), abs=1e-9)


def test_bm25_search_ordering(spark, monkeypatch):
    import ai4orgwebscraper_spark.operators.retrieval as R

    # doc with more matching terms and shorter length must rank first
    docs = spark.createDataFrame(
        [
            (10, "spark join window spark", "en", "s", 1),
            (11, "spark filler filler filler filler filler filler", "en", "s", 1),
            (12, "merge scan table", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(R, "load_table", lambda s, sf, t: docs)
    monkeypatch.setattr(R, "load_wide", lambda s, sf, t: docs)
    rows = q_bm25_search(spark, "unused").collect()
    assert [r["doc_id"] for r in rows] == [10, 11]  # 12 matches nothing
    assert rows[0]["score"] > rows[1]["score"]
    assert rows[0]["n_terms"] == 3 and rows[1]["n_terms"] == 1


def test_tfidf_lang_terms_rank_and_scores(spark, docs_df, monkeypatch):
    import ai4orgwebscraper_spark.operators.retrieval as R

    monkeypatch.setattr(R, "load_table", lambda s, sf, t: docs_df)
    monkeypatch.setattr(R, "load_wide", lambda s, sf, t: docs_df)
    rows = q_tfidf_lang_terms(spark, "unused").collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    # ranks are 1..k contiguous, scores non-increasing per lang
    for lang, rs in by_lang.items():
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
    # de corpus: merge tf=3 df=1 -> score 3*4/1=12, top term
    de = by_lang["de"]
    assert de[0]["term"] == "merge" and de[0]["score"] == 12.0
    # en: spark tf=2 appears in docs {0,2} -> df=2 -> 2*4/2=4
    en = {r["term"]: r for r in by_lang["en"]}
    assert en["spark"]["score"] == 4.0
