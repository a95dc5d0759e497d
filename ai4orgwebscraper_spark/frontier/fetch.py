"""Vectorized fetch+parse stage — the engine's replacement for the
reference's one-network-call-per-row loop (reference
app_wrapper.py:165-168 calling web_scraper.py:8-54 per URL).

``fetch_map_fn`` is a ``mapInPandas`` stage: an iterator of Arrow
batches of admitted frontier rows in, an iterator of batches of
(status, error, title, spans, outlinks) out. No per-row Python at the
DataFrame layer (BASELINE.json:input_hint); inside the batch the
synthetic ``page_for`` generator stands in for the network — in
production this body would issue pipelined async HTTP per batch, with
a per-executor connection pool (the per-partition analog of the
reference's ``requests.Session`` reuse, web_scraper_js.py:26).

The batch body builds COLUMNS, not row dicts — on this data path the
worker's allocation rate is the scaling bottleneck (kernel time from
malloc/socket churn), so per-row object creation is kept to the span
structs Arrow itself requires.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ai4orgwebscraper_spark import schemas
from ai4orgwebscraper_spark.sources.corpus import page_from_parts

_COLS = [f.name for f in schemas.FETCH_RESULT.fields]


def _fetch_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    # attempts > 0 -> the row is a 403 retry routed through the JS
    # fetcher (C6; reference web_scraper.py:46-48). Rows predate the
    # retry feature in old checkpoints, so default to 0.
    attempts = pdf["attempts"] if "attempts" in pdf.columns else pd.Series(0, index=pdf.index)
    # C7 session/auth: an auth-required host without a session token
    # yields 401 error rows (reference holds a requests.Session; the
    # network login itself is out of scope, the state is modeled)
    if "auth_required" in pdf.columns:
        # any falsy token (null OR empty string) is unauthenticated —
        # the oracle checks cfg.get('session_token') truthiness, so an
        # empty-string token must 401 in both engines (ADVICE r02)
        tok = pdf["session_token"]
        unauthed = pdf["auth_required"].fillna(False).astype(bool) & (
            tok.isna() | (tok == "")
        )
    else:
        unauthed = pd.Series(False, index=pdf.index)
    statuses, errors, titles, lats, spans_col, links_col = [], [], [], [], [], []
    for url, uh, host, att, noauth in zip(
        pdf["url"], pdf["url_hash"], pdf["host"], attempts, unauthed
    ):
        page = page_from_parts(url, uh, host, js=att > 0)
        if noauth:
            page.status, page.error = 401, "HTTP 401"
            page.title, page.spans, page.outlinks = None, [], []
        statuses.append(page.status)
        errors.append(page.error)
        titles.append(page.title)
        lats.append(page.latency_ms)
        if page.status == 200:
            spans_col.append(
                [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for (k, t, m, o) in page.spans
                ]
            )
            links_col.append(page.outlinks)
        else:
            spans_col.append(None)
            links_col.append(None)
    return pd.DataFrame(
        {
            "seq": pdf["seq"].values,
            "url_hash": pdf["url_hash"].values,
            "url": pdf["url"].values,
            "host": pdf["host"].values,
            "depth": pdf["depth"].values,
            "seed_rank": pdf["seed_rank"].values,
            "status": statuses,
            "error": errors,
            "title": titles,
            "latency_ms": lats,
            "fetched_at_ms": pdf["fetched_at_ms"].values,
            "attempts": attempts.values,
            "fetcher": np.where(attempts.to_numpy() > 0, "js", "plain"),
            "spans": spans_col,
            "outlinks": links_col,
        },
        columns=_COLS,
    )


def fetch_map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # Drain the input stream BEFORE yielding any output: a worker that
    # writes output while the JVM is still streaming input can deadlock
    # on mutual socket backpressure (worker wedged in tcp_sendmsg, JVM
    # writer blocked, observed on multi-million-row stages). Partition
    # sizing bounds the buffer (2x-parallelism partitions -> ~100k rows
    # per task).
    pending = [pdf for pdf in batches if len(pdf) > 0]
    for pdf in pending:
        yield _fetch_batch(pdf)
