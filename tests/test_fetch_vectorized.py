"""Exact page-for-page parity of the r6 vectorized Arrow fetch
(`fetch_arrow_fn`) against both the scalar pandas twin (`_fetch_batch`)
and the normative `page_from_parts` generator — every field, every
span, every outlink, all status/js/auth branches."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from ai4orgwebscraper_spark.frontier.fetch import _fetch_arrow_batch, _fetch_batch
from ai4orgwebscraper_spark.functions.urls import canonicalize_py, host_py, url_hash_py
from ai4orgwebscraper_spark.sources.corpus import page_from_parts, seed_urls


def _frontier_frame(n: int, with_auth: bool, attempts_mod: int):
    rows = []
    for i, raw in enumerate(seed_urls(n)):
        canon = canonicalize_py(raw)
        uh, host = url_hash_py(canon), host_py(canon)
        rows.append(
            {
                "seq": i,
                "url_hash": uh,
                "url": canon,
                "host": host,
                "depth": 0,
                "seed_rank": i,
                "fetched_at_ms": i * 333,
                "attempts": 1 if (attempts_mod and i % attempts_mod == 0) else 0,
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["depth"] = pdf["depth"].astype("int32")
    pdf["attempts"] = pdf["attempts"].astype("int32")
    if with_auth:
        pdf["auth_required"] = [i % 5 == 0 for i in range(len(pdf))]
        # token shapes: valid, None and empty-string (all three 401 rules)
        pdf["session_token"] = [
            ("tok" if i % 10 == 0 else ("" if i % 2 == 0 else None))
            for i in range(len(pdf))
        ]
    return pdf


def _norm(df: pd.DataFrame) -> list[tuple]:
    out = []
    for r in df.to_dict("records"):
        spans = r["spans"]
        if spans is not None and not isinstance(spans, list):
            spans = list(spans)
        if spans is not None:
            spans = [
                (d["kind"], d["text"], d["media_ref"], int(d["offset"]))
                for d in spans
            ]
        links = r["outlinks"]
        if links is not None and not isinstance(links, list):
            links = list(links)
        out.append(
            (
                int(r["seq"]), r["url_hash"], r["url"], r["host"], int(r["depth"]),
                int(r["seed_rank"]), int(r["status"]), r["error"], r["title"],
                int(r["latency_ms"]), int(r["fetched_at_ms"]), int(r["attempts"]),
                r["fetcher"], spans, links,
            )
        )
    return out


@pytest.mark.parametrize("with_auth,attempts_mod", [(False, 0), (True, 7)])
def test_arrow_fetch_matches_scalar_twin(with_auth, attempts_mod):
    pdf = _frontier_frame(600, with_auth, attempts_mod)
    want = _norm(_fetch_batch(pdf.copy()))
    got_batch = _fetch_arrow_batch(pa.RecordBatch.from_pandas(pdf, preserve_index=False))
    got = _norm(got_batch.to_pandas())
    assert got == want


def test_arrow_fetch_matches_normative_generator():
    pdf = _frontier_frame(300, False, 0)
    got = _norm(
        _fetch_arrow_batch(
            pa.RecordBatch.from_pandas(pdf, preserve_index=False)
        ).to_pandas()
    )
    for row in got:
        (seq, uh, url, host, depth, seed_rank, status, error, title,
         latency, fetched_at, attempts, fetcher, spans, links) = row
        page = page_from_parts(url, uh, host, js=attempts > 0)
        assert status == page.status
        assert error == page.error
        assert title == page.title
        assert latency == page.latency_ms
        if page.status == 200:
            assert spans == [(k, t, m, o) for (k, t, m, o) in page.spans]
            assert links == page.outlinks
        else:
            assert spans is None and links is None


def test_arrow_fetch_empty_and_single_row():
    pdf = _frontier_frame(1, False, 0)
    got = _norm(
        _fetch_arrow_batch(
            pa.RecordBatch.from_pandas(pdf, preserve_index=False)
        ).to_pandas()
    )
    assert len(got) == 1
