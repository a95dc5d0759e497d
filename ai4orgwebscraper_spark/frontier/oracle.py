"""Pure-Python normative oracle — the golden behavior the engine must match.

Reimplements ONLY the reference's normative crawl semantics
(SURVEY.md §5.2), single-threaded, over the shared synthetic corpus:

- normalize seeds in input order (reference app_wrapper.py:150-155,
  normalize_url app_wrapper.py:13-22), dropping empties;
- strict FIFO over normalized order (reference app_wrapper.py:165-168);
- a global rate gate of ``rps`` requests/second as a simulated clock
  (reference web_scraper.py:14-20 — 3 req/s min-gap, single thread);
- fetch+extract via the shared ``page_for`` generator: content row
  (title + interleaved spans, semantics of web_scraper.py:30-44) or
  error row (web_scraper.py:51,54) — duplicates fetched twice, since
  the reference has no visited set (SURVEY.md C4).

Also provides ``bfs_crawl`` — the EXTENDED multi-round semantics (link
following + per-host politeness + dedup) used to test the engine's
frontier growth. This part is our design, specified here in plain
Python so the Spark engine has an executable spec; order is defined by
explicit keys (depth, rank) only — never iteration order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ai4orgwebscraper_spark.functions.urls import (
    canonicalize_py,
    host_py,
    is_trap_py,
    path_py,
    resolve_outlink_py,
    url_hash_py,
)
from ai4orgwebscraper_spark.sources.corpus import page_for


@dataclass
class OracleResult:
    # fetch order: list of dicts with seq, url_hash, url, host, status,
    # error, title, fetched_at_ms (+ round, depth in bfs mode)
    fetch_log: list[dict] = field(default_factory=list)
    # canonical url -> multiplicity
    seen: dict[str, int] = field(default_factory=dict)
    # url_hash -> span tuples (kind, text, media_ref, offset); 200s only
    spans: dict[str, list[tuple]] = field(default_factory=dict)


def reference_crawl(raw_seeds: list[str], rps: float = 3.0) -> OracleResult:
    """Reference-parity crawl: depth 0, global rate gate, dups refetched."""
    res = OracleResult()
    gap_ms = 1000.0 / rps
    # drop empties AND host-less URLs (P2 validity — the engine's
    # _canonical_seeds filters identically; host_py is '' exactly when
    # the JVM parser yields NULL)
    normalized = [c for c in (canonicalize_py(u) for u in raw_seeds) if c and host_py(c)]
    for seq, canon in enumerate(normalized):
        page = page_for(canon)
        res.fetch_log.append(
            {
                "seq": seq,
                "round": 0,
                "url_hash": page.url_hash,
                "url": canon,
                "host": page.host,
                "status": page.status,
                "error": page.error,
                "title": page.title,
                "fetched_at_ms": int(seq * gap_ms),
                "attempts": 0,
                "fetcher": "plain",
            }
        )
        res.seen[canon] = res.seen.get(canon, 0) + 1
        if page.status == 200:
            res.spans[page.url_hash] = list(page.spans)
    return res


def _rank_for_link(parent_seq: int, link_index: int) -> int:
    """Deterministic order key for a discovered URL: first-discovery
    position. Bounded outlink fan-out (<1000) keeps this collision-free."""
    return parent_seq * 1000 + link_index


def bfs_crawl(
    raw_seeds: list[str],
    hosts: list[dict],
    max_depth: int = 1,
    round_seconds: float = 10.0,
    max_rounds: int = 50,
    rank_scores: dict[str, float] | None = None,
    trap_guard: bool = False,
) -> OracleResult:
    """Extended multi-round crawl spec (dedup + per-host politeness +
    C6 retry/fallback).

    Each round, every host admits up to floor(rate * round_seconds)
    pending URLs in (depth, rank) order; robots_disallow path prefixes
    are excluded at enqueue. fetched_at_ms is the politeness-spaced
    per-host slot time, and the slot clock CARRIES ACROSS ROUNDS: a
    host's first slot of round r starts at
    max(round_base, last_fetch + ceil(gap)) so inter-round gaps respect
    crawl_delay regardless of budget arithmetic (VERDICT r01 item 8).
    Deduplicated by canonical URL (first discovery wins; multiplicity
    counts every offer). A 403 from the plain fetcher is re-enqueued
    ONCE with attempts=1 and fetched through the JS fetcher in a later
    round — round-delayed backoff, the reference's alternate-fetcher
    contract (reference web_scraper.py:46-48; SURVEY.md C6).

    ``rank_scores`` (url_hash -> score) is the rank-weighted priority
    twin of CrawlEngine(rank_scores=...): priority =
    depth * 10^10 - floor(score * 1e9), lower first — identical
    constants and float arithmetic, so engine order is spec'd exactly.
    """
    import math

    def prio(depth: int, canon: str) -> int:
        if rank_scores is None:
            return depth
        score = rank_scores.get(url_hash_py(canon), 0.0)
        return depth * 10**10 - math.floor(score * 1e9)

    res = OracleResult()
    host_cfg = {h["host"]: h for h in hosts}
    default_cfg = {"rate_limit_rps": 3.0, "crawl_delay_s": None, "robots_disallow": []}

    def gap_for(host: str) -> float:
        cfg = host_cfg.get(host, default_cfg)
        gap_ms = 1000.0 / cfg["rate_limit_rps"]
        if cfg.get("crawl_delay_s"):
            gap_ms = max(gap_ms, cfg["crawl_delay_s"] * 1000.0)
        return gap_ms

    # frontier entries: (priority, rank, depth, canon, attempts) —
    # priority == depth unless rank_scores is given
    frontier: list[tuple[int, int, int, str, int]] = []
    enqueued: set[str] = set()
    for rank, raw in enumerate(raw_seeds):
        canon = canonicalize_py(raw)
        if not canon or not host_py(canon):  # P2 validity twin
            continue
        if trap_guard and is_trap_py(path_py(canon)):
            continue  # CrawlEngine(trap_guard=True) seed-intake twin
        res.seen[canon] = res.seen.get(canon, 0) + 1
        if canon not in enqueued:
            enqueued.add(canon)
            frontier.append((prio(0, canon), rank, 0, canon, 0))

    seq = 0
    last_fetch: dict[str, int] = {}  # host -> last fetched_at_ms, all rounds
    for rnd in range(max_rounds):
        if not frontier:
            break
        # per-host admission in (priority, rank) order
        frontier.sort()
        admitted: list[tuple[int, int, int, str, int]] = []
        rest: list[tuple[int, int, int, str, int]] = []
        used: dict[str, int] = {}
        for entry in frontier:
            host = host_py(entry[3])
            cfg = host_cfg.get(host, default_cfg)
            budget = int(cfg["rate_limit_rps"] * round_seconds)
            delay = cfg.get("crawl_delay_s")
            if delay:
                budget = min(budget, int(round_seconds / delay))
            if used.get(host, 0) < budget:
                used[host] = used.get(host, 0) + 1
                admitted.append(entry)
            else:
                rest.append(entry)
        frontier = rest

        # fetch admitted in (depth, rank) order; per-host slot clock
        # seeded from the cross-round politeness clock
        slot: dict[str, int] = {}
        start_ms: dict[str, int] = {}
        round_base_ms = int(rnd * round_seconds * 1000)
        for _priority, rank, depth, canon, attempts in admitted:
            host = host_py(canon)
            gap_ms = gap_for(host)
            if host not in start_ms:
                prev = last_fetch.get(host)
                start_ms[host] = (
                    round_base_ms
                    if prev is None
                    else max(round_base_ms, prev + math.ceil(gap_ms))
                )
            k = slot.get(host, 0)
            slot[host] = k + 1
            fetched_at = start_ms[host] + int(k * gap_ms)
            last_fetch[host] = fetched_at
            page = page_for(canon, js=attempts > 0)
            cfg = host_cfg.get(host, default_cfg)
            if cfg.get("auth_required") and not cfg.get("session_token"):
                # C7: auth-required host without a session token → 401
                # error row (fetch.py twin)
                page.status, page.error = 401, "HTTP 401"
                page.title, page.spans, page.outlinks = None, [], []
            res.fetch_log.append(
                {
                    "seq": seq,
                    "round": rnd,
                    "depth": depth,
                    "rank": rank,
                    "url_hash": page.url_hash,
                    "url": canon,
                    "host": host,
                    "status": page.status,
                    "error": page.error,
                    "title": page.title,
                    "fetched_at_ms": fetched_at,
                    "attempts": attempts,
                    "fetcher": "js" if attempts > 0 else "plain",
                }
            )
            if page.status == 403 and attempts == 0:
                # re-enqueue once through the JS fetcher; lands in a
                # later round (round-delayed backoff), keeps its
                # original order keys
                frontier.append((prio(depth, canon), rank, depth, canon, 1))
            if page.status == 200:
                res.spans[page.url_hash] = list(page.spans)
                if depth < max_depth:
                    for li, href in enumerate(page.outlinks):
                        child = canonicalize_py(resolve_outlink_py(host, href))
                        if not child:
                            continue
                        child_host = host_py(child)
                        if not child_host:  # P2 validity twin
                            continue
                        ccfg = host_cfg.get(child_host, default_cfg)
                        disallow = ccfg.get("robots_disallow") or []
                        from urllib.parse import urlparse

                        cpath = urlparse(child).path or ""
                        if any(cpath.startswith(p) for p in disallow):
                            continue
                        if trap_guard and is_trap_py(cpath):
                            continue  # offer-stage twin (before seen)
                        res.seen[child] = res.seen.get(child, 0) + 1
                        if child not in enqueued:
                            enqueued.add(child)
                            frontier.append(
                                (
                                    prio(depth + 1, child),
                                    _rank_for_link(seq, li),
                                    depth + 1,
                                    child,
                                    0,
                                )
                            )
            seq += 1
    return res


def golden_artifacts(result: OracleResult) -> dict:
    """FIXTURES.md §4 golden shapes: ordered URLs, sorted seen hashes,
    per-doc span sequences."""
    return {
        "fetch_order": [r["url"] for r in result.fetch_log],
        "seen_set": sorted(url_hash_py(u) for u in result.seen),
        "spans": {k: [list(s) for s in v] for k, v in result.spans.items()},
    }
