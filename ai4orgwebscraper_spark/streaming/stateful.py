"""Custom stateful streaming operator: per-host token-bucket admission.

The streaming analog of the engine's batch politeness scheduler
(SURVEY.md C2/C3 — the reference's process-global 3 req/s gate,
web_scraper.py:14-20, and per-minute window counter,
linkedin_api.py:46-67). A stream of fetch REQUESTS grouped by host
flows through ``applyInPandasWithState``; each host keeps
(tokens, last_refill_ms) state, refills at rate_rps up to capacity,
and emits each request with an admitted/deferred decision.

Deterministic: time comes from the request's own event-time column
(simulated clock), never the wall clock, so replays are bit-identical
— the same property the batch engine has.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "host string, url_hash string, event_ms long, admitted boolean, tokens_after double"
STATE_SCHEMA = "tokens double, last_refill_ms long"

RATE_RPS = 3.0
CAPACITY = 10.0


def _admit_host_batch(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    host = key[0]
    if state.exists:
        tokens, last_ms = state.get
    else:
        tokens, last_ms = CAPACITY, 0
    out_rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["event_ms", "url_hash"], kind="mergesort")
        for url_hash, event_ms in zip(pdf["url_hash"], pdf["event_ms"]):
            event_ms = int(event_ms)
            # refill: min(cap, tokens + elapsed*rate) — linkedin_api.py:46-67
            # semantics, simulated clock
            elapsed_s = max(0, event_ms - last_ms) / 1000.0
            tokens = min(CAPACITY, tokens + elapsed_s * RATE_RPS)
            last_ms = max(last_ms, event_ms)
            admitted = tokens >= 1.0
            if admitted:
                tokens -= 1.0
            out_rows.append(
                {
                    "host": host,
                    "url_hash": url_hash,
                    "event_ms": event_ms,
                    "admitted": admitted,
                    "tokens_after": round(tokens, 6),
                }
            )
    state.update((float(tokens), int(last_ms)))
    yield pd.DataFrame(out_rows, columns=["host", "url_hash", "event_ms", "admitted", "tokens_after"])


def admit_stream(requests: DataFrame) -> DataFrame:
    """requests: streaming DataFrame (host, url_hash, event_ms)."""
    return requests.groupBy("host").applyInPandasWithState(
        _admit_host_batch,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def admit_batch_reference(rows: list[tuple[str, str, int]]) -> list[dict]:
    """Pure-Python twin for tests: same semantics over a static list of
    (host, url_hash, event_ms), processed per host in event order."""
    out = []
    state: dict[str, tuple[float, int]] = {}
    by_host: dict[str, list[tuple[str, str, int]]] = {}
    for r in rows:
        by_host.setdefault(r[0], []).append(r)
    for host in by_host:
        tokens, last_ms = CAPACITY, 0
        for _h, url_hash, event_ms in sorted(by_host[host], key=lambda r: (r[2], r[1])):
            elapsed_s = max(0, event_ms - last_ms) / 1000.0
            tokens = min(CAPACITY, tokens + elapsed_s * RATE_RPS)
            last_ms = max(last_ms, event_ms)
            admitted = tokens >= 1.0
            if admitted:
                tokens -= 1.0
            out.append(
                {
                    "host": host,
                    "url_hash": url_hash,
                    "event_ms": event_ms,
                    "admitted": admitted,
                    "tokens_after": round(tokens, 6),
                }
            )
        state[host] = (tokens, last_ms)
    return out
