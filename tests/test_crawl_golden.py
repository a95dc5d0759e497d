"""Golden crawl tests: the Spark engine must match the pure-Python
normative oracle EXACTLY — crawl order, simulated timestamps, URL-seen
set (with multiplicities), and per-row span sequences
(kind, text, media_ref, order). BASELINE.md correctness targets.
"""

from __future__ import annotations

import pytest

from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
from ai4orgwebscraper_spark.frontier.oracle import bfs_crawl, reference_crawl
from ai4orgwebscraper_spark.sources.corpus import default_hosts, seed_urls


def _span_tuples(row):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]]


@pytest.fixture(scope="module")
def parity(spark):
    seeds = seed_urls(100)
    oracle = reference_crawl(seeds)
    engine = CrawlEngine(spark, reference_mode=True)
    out = engine.run(engine.seeds_from_list(seeds))
    return seeds, oracle, out


def test_reference_crawl_order_exact(parity):
    _, oracle, out = parity
    log = out.fetch_log.orderBy("seq").collect()
    assert [r["url"] for r in log] == [r["url"] for r in oracle.fetch_log]
    assert [r["status"] for r in log] == [r["status"] for r in oracle.fetch_log]
    assert [r["error"] for r in log] == [r["error"] for r in oracle.fetch_log]


def test_reference_rate_gate_timestamps(parity):
    _, oracle, out = parity
    log = out.fetch_log.orderBy("seq").collect()
    assert [r["fetched_at_ms"] for r in log] == [
        r["fetched_at_ms"] for r in oracle.fetch_log
    ]
    gaps = [b["fetched_at_ms"] - a["fetched_at_ms"] for a, b in zip(log, log[1:])]
    assert all(g >= 333 for g in gaps)  # 3 rps -> >= 1/3 s between fetches


def test_reference_percent_encoded_titles_crawled(parity):
    """Unicode title slugs (reference MakeURLs.py percent-encoding
    contract) must appear as %XX-encoded canonical URLs in the fetch
    log — proves the engine's JVM-side encoder and the oracle's
    quote() twin emit identical bytes end-to-end."""
    _, oracle, out = parity
    urls = [r["url"] for r in out.fetch_log.collect()]
    encoded = [u for u in urls if "%" in u]
    assert encoded  # fixture exercises the path
    assert all(u.isascii() for u in urls)
    assert sorted(encoded) == sorted(u for u in (r["url"] for r in oracle.fetch_log) if "%" in u)


def test_reference_seen_set_with_multiplicity(parity):
    _, oracle, out = parity
    got = {r["url"]: r["multiplicity"] for r in out.seen.collect()}
    assert got == oracle.seen
    # the synthetic seed list contains duplicates; they must be COUNTED
    # (reference refetches dups — SURVEY.md C4)
    assert any(m > 1 for m in got.values())


def test_reference_span_sequences_exact(parity):
    _, oracle, out = parity
    got = {r["doc_id"]: _span_tuples(r) for r in out.documents.collect()}
    want = {k: [tuple(s) for s in v] for k, v in oracle.spans.items()}
    assert got == want
    # interleaving is real: some doc must mix text and media_ref kinds
    assert any(len({k for (k, *_rest) in v}) == 2 for v in want.values())


@pytest.fixture(scope="module")
def bfs(spark):
    seeds = seed_urls(60)
    hosts = default_hosts()
    oracle = bfs_crawl(seeds, hosts, max_depth=1, round_seconds=10.0, max_rounds=50)
    engine = CrawlEngine(spark, hosts=hosts, max_depth=1, round_seconds=10.0, max_rounds=50)
    out = engine.run(engine.seeds_from_list(seeds))
    return oracle, out


def test_bfs_order_rounds_timestamps(bfs):
    oracle, out = bfs
    log = out.fetch_log.orderBy("seq").collect()
    assert [(r["url"], r["round"], r["fetched_at_ms"]) for r in log] == [
        (r["url"], r["round"], r["fetched_at_ms"]) for r in oracle.fetch_log
    ]


def test_bfs_dedup_and_seen(bfs):
    oracle, out = bfs
    got = {r["url"]: r["multiplicity"] for r in out.seen.collect()}
    assert got == oracle.seen
    # dedup: every URL fetched at most once PER ATTEMPT in BFS mode —
    # a 403 may legitimately appear twice (plain then js retry, C6)
    rows = out.fetch_log.collect()
    pairs = [(r["url"], r["attempts"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    from collections import Counter

    by_url = Counter(r["url"] for r in rows)
    for r in rows:
        if by_url[r["url"]] > 1:
            assert by_url[r["url"]] == 2  # exactly one retry, never more


def test_bfs_403_retry_via_js_fetcher(bfs):
    """C6 contract (reference web_scraper.py:46-48): every 403 from the
    plain fetcher is refetched EXACTLY once through the js fetcher in a
    strictly later round, recovers content, and matches the oracle's
    retry rows in order and timestamps."""
    oracle, out = bfs
    log = out.fetch_log.orderBy("seq").collect()
    plain_403 = [r for r in log if r["status"] == 403 and r["attempts"] == 0]
    retries = [r for r in log if r["attempts"] == 1]
    assert len(plain_403) > 0  # fixture must exercise the path
    assert sorted(r["url"] for r in plain_403) == sorted(r["url"] for r in retries)
    first_403 = {r["url"]: r for r in plain_403}
    for r in retries:
        assert r["fetcher"] == "js"
        assert r["status"] == 200  # bot-block bypassed, content served
        assert r["round"] > first_403[r["url"]]["round"]  # round-delayed backoff
    # oracle lockstep
    want = [(x["url"], x["round"], x["fetched_at_ms"]) for x in oracle.fetch_log if x["attempts"] == 1]
    assert [(r["url"], r["round"], r["fetched_at_ms"]) for r in retries] == want


def test_invalid_host_urls_dropped_in_lockstep(spark):
    """P2 validity applied for real: a unicode-host seed percent-encodes
    into an authority the JVM parser rejects (NULL host) and host_py
    maps to '' — BOTH engines must DROP it (never a NULL-host frontier
    row vs ''-host oracle row divergence)."""
    from ai4orgwebscraper_spark.frontier.oracle import bfs_crawl

    seeds = seed_urls(20) + ["https://münchen.example.com/x", "https://ok.example.com/y"]
    hosts = default_hosts()
    oracle = bfs_crawl(seeds, hosts, max_depth=0, round_seconds=10.0, max_rounds=5)
    eng = CrawlEngine(spark, hosts=hosts, max_depth=0, round_seconds=10.0, max_rounds=5)
    out = eng.run(eng.seeds_from_list(seeds))
    log = out.fetch_log.orderBy("seq").collect()
    assert [(r["url"], r["fetched_at_ms"]) for r in log] == [
        (x["url"], x["fetched_at_ms"]) for x in oracle.fetch_log
    ]
    urls = {r["url"] for r in log}
    assert not any("m%C3%BCnchen" in u for u in urls)  # invalid host dropped
    assert any("ok.example.com" in u for u in urls)  # valid neighbor kept
    assert all(r["host"] for r in log)  # no NULL/empty hosts anywhere


def test_bfs_session_auth_state(bfs):
    """C7 session/auth state (reference web_scraper_js.py:26,155 —
    requests.Session reuse; auth flows out of network scope, state
    modeled): host13 requires a session and has no token → every fetch
    is a 401 error row, no content, no outlinks followed; host7
    requires a session and HAS a token → behaves like any logged-in
    host (normal status mix)."""
    oracle, out = bfs
    rows = out.fetch_log.collect()
    h13 = [r for r in rows if r["host"] == "host13.example.com"]
    h7 = [r for r in rows if r["host"] == "host7.example.com"]
    assert h13, "fixture must include the token-less auth host"
    assert all(r["status"] == 401 and r["error"] == "HTTP 401" for r in h13)
    assert h7 and any(r["status"] == 200 for r in h7)  # token grants access
    # no 401 page may contribute documents
    doc_ids = {r["doc_id"] for r in out.documents.collect()}
    assert not ({r["url_hash"] for r in h13} & doc_ids)
    # oracle lockstep on the auth rows specifically
    want_401 = sorted(x["url"] for x in oracle.fetch_log if x["status"] == 401)
    assert sorted(r["url"] for r in rows if r["status"] == 401) == want_401


def test_bfs_empty_session_token_is_unauthenticated(spark):
    """An empty-string session token must be treated as UNAUTHENTICATED
    (ADVICE r02): the oracle checks cfg.get('session_token') truthiness,
    so `''` is falsy there — the engine's fetch stage must 401 the same
    rows instead of only checking isna()."""
    seeds = seed_urls(60)  # host7 has no seeds below ~60
    hosts = default_hosts()
    for h in hosts:
        if h["host"] == "host7.example.com":
            h["session_token"] = ""  # auth host, blank (falsy) token
    oracle = bfs_crawl(seeds, hosts, max_depth=0, round_seconds=10.0, max_rounds=5)
    eng = CrawlEngine(spark, hosts=hosts, max_depth=0, round_seconds=10.0, max_rounds=5)
    out = eng.run(eng.seeds_from_list(seeds))
    log = out.fetch_log.orderBy("seq").collect()
    h7 = [r for r in log if r["host"] == "host7.example.com"]
    assert h7, "fixture must include host7 seeds"
    assert all(r["status"] == 401 and r["error"] == "HTTP 401" for r in h7)
    assert [(r["url"], r["status"], r["fetched_at_ms"]) for r in log] == [
        (x["url"], x["status"], x["fetched_at_ms"]) for x in oracle.fetch_log
    ]


def test_bfs_politeness_gap_across_round_boundaries(bfs):
    """The cross-round clock: per-host inter-fetch gaps hold ACROSS
    round boundaries, not just within a round (VERDICT r01 item 8)."""
    _, out = bfs
    hosts_cfg = {h["host"]: h for h in default_hosts()}
    rows = out.fetch_log.select("host", "round", "fetched_at_ms").collect()
    from itertools import groupby

    rows = sorted(rows, key=lambda r: (r["host"], r["fetched_at_ms"]))
    boundary_pairs = 0
    for host, grp in groupby(rows, key=lambda r: r["host"]):
        grp = list(grp)
        cfg = hosts_cfg.get(host)
        gap_ms = 1000.0 / cfg["rate_limit_rps"]
        if cfg.get("crawl_delay_s"):
            gap_ms = max(gap_ms, cfg["crawl_delay_s"] * 1000.0)
        for a, b in zip(grp, grp[1:]):
            assert b["fetched_at_ms"] - a["fetched_at_ms"] >= int(gap_ms) - 1, (host, a, b)
            if b["round"] != a["round"]:
                boundary_pairs += 1
    assert boundary_pairs > 0  # fixture must actually cross boundaries


def test_bfs_politeness_gap_per_host(bfs):
    _, out = bfs
    hosts_cfg = {h["host"]: h for h in default_hosts()}
    rows = sorted(
        out.fetch_log.select("host", "fetched_at_ms").collect(),
        key=lambda r: (r["host"], r["fetched_at_ms"]),
    )
    from itertools import groupby

    for host, grp in groupby(rows, key=lambda r: r["host"]):
        ts = [r["fetched_at_ms"] for r in grp]
        cfg = hosts_cfg.get(host)
        gap_ms = 1000.0 / cfg["rate_limit_rps"]
        if cfg.get("crawl_delay_s"):
            gap_ms = max(gap_ms, cfg["crawl_delay_s"] * 1000.0)
        for a, b in zip(ts, ts[1:]):
            assert b - a >= int(gap_ms) - 1, (host, a, b)


def test_bfs_spans_exact(bfs):
    oracle, out = bfs
    got = {r["doc_id"]: _span_tuples(r) for r in out.documents.collect()}
    want = {k: [tuple(s) for s in v] for k, v in oracle.spans.items()}
    assert got == want


def test_bfs_robots_respected(bfs):
    """No fetched URL may match a robots_disallow prefix of its host."""
    _, out = bfs
    from urllib.parse import urlparse

    rules = {h["host"]: h["robots_disallow"] or [] for h in default_hosts()}
    for r in out.fetch_log.select("host", "url").collect():
        path = urlparse(r["url"]).path or ""
        assert not any(path.startswith(p) for p in rules.get(r["host"], []))


def test_bfs_rank_weighted_priority_matches_oracle(spark):
    """Rank-weighted frontier priority (north rule 'priority queue'):
    crawl once, PageRank the discovered link graph, re-crawl with
    rank_scores — the engine's fetch order must match the oracle twin
    exactly, and must actually differ from the unranked BFS order
    (the scores have an effect)."""
    from pyspark.sql import functions as F

    from ai4orgwebscraper_spark.functions import urls as U
    from ai4orgwebscraper_spark.operators.graph import pagerank

    seeds = seed_urls(30)
    base = CrawlEngine(spark, hosts=default_hosts(), max_depth=1, max_rounds=30)
    out0 = base.run(base.seeds_from_list(seeds))
    base_order = [
        r["url_hash"]
        for r in out0.fetch_log.orderBy("seq").select("url_hash").collect()
    ]
    pages = out0.fetch_log.select("url_hash").distinct()
    resolved = out0.outlinks.select(
        F.col("url_hash").alias("src"),
        U.url_hash_col(
            U.canonicalize_col(U.resolve_outlink_col(F.col("host"), F.col("href")))
        ).alias("dst"),
    )
    edges = (
        resolved.join(pages.select(F.col("url_hash").alias("dst")), "dst")
        .select("src", "dst")
        .distinct()
    )
    ranks = pagerank(spark, pages.select(F.col("url_hash").alias("id")), edges)
    scores = {r["id"]: float(r["rank"]) for r in ranks.collect()}

    scored_df = spark.createDataFrame(
        list(scores.items()), "url_hash string, score double"
    )
    eng = CrawlEngine(
        spark, hosts=default_hosts(), max_depth=1, max_rounds=30,
        rank_scores=scored_df, rank_scores_tag="pr_v1",
    )
    got = eng.run(eng.seeds_from_list(seeds)).fetch_log
    got_rows = [
        (r["seq"], r["url_hash"], r["round"], r["depth"], r["fetched_at_ms"])
        for r in got.orderBy("seq").collect()
    ]
    want = bfs_crawl(
        seeds, default_hosts(), max_depth=1, max_rounds=30, rank_scores=scores
    )
    want_rows = [
        (r["seq"], r["url_hash"], r["round"], r["depth"], r["fetched_at_ms"])
        for r in want.fetch_log
    ]
    assert got_rows == want_rows  # engine == oracle, order and clock
    # the ranking changed the crawl order vs plain BFS
    got_order = [t[1] for t in got_rows]
    assert sorted(got_order) == sorted(base_order)  # same URL set
    assert got_order != base_order


# ---------------------------------------------------------------------------
# spider-trap guard (engine extension: urls.is_trap_col / is_trap_py)
# ---------------------------------------------------------------------------

TRAP_DEEP = "https://trap.example/" + "/".join(f"d{i}" for i in range(20))
TRAP_LOOP = "https://trap.example/a/b/a/b/a/b/a"
OK_DEEP = "https://trap.example/" + "/".join(f"k{i}" for i in range(16))
OK_REP = "https://trap.example/a/x/a/y/a"


def test_bfs_trap_guard_matches_oracle_and_excludes_traps(spark):
    """Guard ON: engine == oracle exactly (order, rounds, timestamps)
    with trap seeds planted among real ones; trap URLs never fetched,
    boundary-legal URLs still fetched."""
    from ai4orgwebscraper_spark.functions.urls import canonicalize_py

    seeds = seed_urls(20) + [TRAP_DEEP, TRAP_LOOP, OK_DEEP, OK_REP]
    hosts = default_hosts()
    oracle = bfs_crawl(
        seeds, hosts, max_depth=1, round_seconds=10.0, max_rounds=50,
        trap_guard=True,
    )
    engine = CrawlEngine(
        spark, hosts=hosts, max_depth=1, round_seconds=10.0, max_rounds=50,
        trap_guard=True,
    )
    out = engine.run(engine.seeds_from_list(seeds))
    log = out.fetch_log.orderBy("seq").collect()
    assert [(r["url"], r["round"], r["fetched_at_ms"]) for r in log] == [
        (r["url"], r["round"], r["fetched_at_ms"]) for r in oracle.fetch_log
    ]
    fetched = {r["url"] for r in log}
    assert canonicalize_py(TRAP_DEEP) not in fetched
    assert canonicalize_py(TRAP_LOOP) not in fetched
    assert canonicalize_py(OK_DEEP) in fetched
    assert canonicalize_py(OK_REP) in fetched
    # seen-set parity includes the exclusions (traps rejected BEFORE
    # seen counting in both engines)
    got = {r["url"]: r["multiplicity"] for r in out.seen.collect()}
    assert got == oracle.seen
    assert canonicalize_py(TRAP_DEEP) not in got
    engine.close()


def test_bfs_trap_guard_off_fetches_traps(spark):
    """Inclusion control: with the guard OFF the same trap seeds ARE
    crawled, in engine-oracle lockstep — the guard is the only thing
    standing between them and the frontier."""
    from ai4orgwebscraper_spark.functions.urls import canonicalize_py

    seeds = [TRAP_DEEP, TRAP_LOOP, OK_DEEP, OK_REP]
    hosts = default_hosts()
    oracle = bfs_crawl(seeds, hosts, max_depth=0, round_seconds=10.0, max_rounds=10)
    engine = CrawlEngine(
        spark, hosts=hosts, max_depth=0, round_seconds=10.0, max_rounds=10,
    )
    out = engine.run(engine.seeds_from_list(seeds))
    log = out.fetch_log.orderBy("seq").collect()
    assert [(r["url"], r["fetched_at_ms"]) for r in log] == [
        (r["url"], r["fetched_at_ms"]) for r in oracle.fetch_log
    ]
    fetched = {r["url"] for r in log}
    assert canonicalize_py(TRAP_DEEP) in fetched
    assert canonicalize_py(TRAP_LOOP) in fetched
    engine.close()


def test_bfs_trap_guard_composes_with_rank_scores(spark):
    """Engine-extension composition: trap_guard AND rank-weighted
    priority active in the SAME run stay in engine==oracle lockstep —
    traps rejected at intake, surviving frontier ordered by the
    quantized rank score. Features built separately must not interact
    through the frontier plan."""
    from ai4orgwebscraper_spark.functions.urls import canonicalize_py, url_hash_py

    seeds = seed_urls(20) + [TRAP_DEEP, TRAP_LOOP, OK_REP]
    hosts = default_hosts()
    # deterministic synthetic scores keyed off the url_hash hex — no
    # second crawl needed; any score table exercises the ordering
    scores = {
        url_hash_py(canonicalize_py(u)): (int(url_hash_py(canonicalize_py(u))[:4], 16) % 97) / 97.0
        for u in seeds
        if canonicalize_py(u)
    }
    oracle = bfs_crawl(
        seeds, hosts, max_depth=1, round_seconds=10.0, max_rounds=50,
        rank_scores=scores, trap_guard=True,
    )
    scored_df = spark.createDataFrame(
        list(scores.items()), "url_hash string, score double"
    )
    engine = CrawlEngine(
        spark, hosts=hosts, max_depth=1, round_seconds=10.0, max_rounds=50,
        rank_scores=scored_df, rank_scores_tag="synth_v1", trap_guard=True,
    )
    out = engine.run(engine.seeds_from_list(seeds))
    log = out.fetch_log.orderBy("seq").collect()
    assert [(r["url"], r["round"], r["fetched_at_ms"]) for r in log] == [
        (r["url"], r["round"], r["fetched_at_ms"]) for r in oracle.fetch_log
    ]
    fetched = {r["url"] for r in log}
    assert canonicalize_py(TRAP_DEEP) not in fetched
    assert canonicalize_py(OK_REP) in fetched
    engine.close()
