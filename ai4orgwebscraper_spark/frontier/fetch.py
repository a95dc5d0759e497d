"""Vectorized fetch+parse stage — the engine's replacement for the
reference's one-network-call-per-row loop (reference
app_wrapper.py:165-168 calling web_scraper.py:8-54 per URL).

``fetch_and_parse`` is a ``mapInPandas`` stage: an iterator of Arrow
batches of admitted frontier rows in, an iterator of batches of
(status, error, title, spans, outlinks) out. No per-row Python at the
DataFrame layer (BASELINE.json:input_hint); inside the batch the
synthetic ``page_for`` generator stands in for the network — in
production this body would issue pipelined async HTTP per batch, with
a per-executor connection pool (the per-partition analog of the
reference's ``requests.Session`` reuse, web_scraper_js.py:26).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from ai4orgwebscraper_spark import schemas
from ai4orgwebscraper_spark.sources.corpus import page_for


def _fetch_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for seq, url, url_hash, host, depth, rank, fetched_at in zip(
        pdf["seq"], pdf["url"], pdf["url_hash"], pdf["host"], pdf["depth"],
        pdf["seed_rank"], pdf["fetched_at_ms"],
    ):
        page = page_for(url)
        rows.append(
            {
                "seq": int(seq),
                "url_hash": url_hash,
                "url": url,
                "host": host,
                "depth": int(depth),
                "seed_rank": int(rank),
                "status": page.status,
                "error": page.error,
                "title": page.title,
                "latency_ms": page.latency_ms,
                "fetched_at_ms": int(fetched_at),
                "spans": [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for (k, t, m, o) in page.spans
                ]
                if page.status == 200
                else None,
                "outlinks": page.outlinks if page.status == 200 else None,
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in schemas.FETCH_RESULT.fields])


def fetch_map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        yield _fetch_batch(pdf)
