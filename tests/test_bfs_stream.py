"""Carry-continuation (engine) and stream-fed BFS (streaming twin):
two seed waves crawled incrementally must cover exactly the URL set of
one batch BFS over the concatenated waves (VERDICT r04 next #4)."""

from __future__ import annotations

import os
import time

import pytest

from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
from ai4orgwebscraper_spark.sources.corpus import default_hosts, seed_urls
from ai4orgwebscraper_spark.streaming.bfs_stream import stream_seed_bfs


def _waves():
    """Two seed waves engineered to exercise every carry case: overlap
    (already-fetched seeds), fresh seeds, and a PROMOTED seed — a wave-2
    seed that wave 1 only reached as a depth-1 outlink."""
    all_seeds = seed_urls(60)
    return all_seeds[:20], all_seeds[40:55] + all_seeds[5:7]


def _promo_url(spark, seeds1):
    """A URL wave 1 fetches at depth 1 with status 200 (so its outlinks
    are cached) — the promotion candidate for wave 2."""
    eng = CrawlEngine(spark, hosts=default_hosts(), max_depth=1, max_rounds=30)
    log = eng.run(eng.seeds_from_list(seeds1)).fetch_log.collect()
    return sorted(
        r["url"] for r in log if r["depth"] == 1 and r["status"] == 200
    )[0]


def _assert_equals_batch(spark, got_rows, seeds1, seeds2, got_seen=None):
    """got_rows (cumulative incremental fetch_log) must cover exactly
    the batch BFS fetch set on seeds1 + seeds2: same url_hash set, same
    per-URL fetch count and (status, title), and depth equal everywhere
    except promoted seeds (which keep their original, deeper depth)."""
    batch = CrawlEngine(spark, hosts=default_hosts(), max_depth=1, max_rounds=30)
    want_out = batch.run(batch.seeds_from_list(seeds1 + seeds2))
    want = want_out.fetch_log.collect()

    def key(rows):
        out = {}
        for r in rows:
            out.setdefault(r["url_hash"], []).append((r["status"], r["title"]))
        return {k: sorted(v) for k, v in out.items()}

    assert key(got_rows) == key(want)
    got_depth = {r["url_hash"]: r["depth"] for r in got_rows}
    want_depth = {r["url_hash"]: r["depth"] for r in want}
    # depth may differ ONLY where the incremental run fetched the URL
    # before it became a seed (promotion keeps the original depth)
    for h, d in want_depth.items():
        if got_depth[h] != d:
            assert d == 0 and got_depth[h] >= 1, (h, d, got_depth[h])
    if got_seen is not None:
        want_seen = {
            (r["url_hash"], r["multiplicity"]) for r in want_out.seen.collect()
        }
        assert got_seen == want_seen


def test_carry_continuation_equals_batch_bfs(spark):
    """Engine-level: run(seeds2, carry=run1) == batch BFS(seeds1+seeds2)
    on fetched set, per-URL results, and seen multiplicities."""
    seeds1, extra = _waves()
    seeds2 = [_promo_url(spark, seeds1)] + extra
    hosts = default_hosts()
    e1 = CrawlEngine(spark, hosts=hosts, max_depth=1, max_rounds=30)
    out1 = e1.run(e1.seeds_from_list(seeds1))
    e2 = CrawlEngine(spark, hosts=hosts, max_depth=1, max_rounds=30)
    out2 = e2.run(e2.seeds_from_list(seeds2), carry=out1)
    got_seen = {(r["url_hash"], r["multiplicity"]) for r in out2.seen.collect()}
    _assert_equals_batch(
        spark, out2.fetch_log.collect(), seeds1, seeds2, got_seen=got_seen
    )
    # the promoted seed is the ONLY depth divergence, and its children
    # were really fetched (they exist only via promotion)
    assert out2.metrics["fetched"] == out2.fetch_log.count()


def test_carry_knob_validation(spark):
    eng = CrawlEngine(spark, reference_mode=True)
    out = CrawlEngine(spark, max_depth=1).run(
        CrawlEngine(spark, max_depth=1).seeds_from_list([])
    )
    with pytest.raises(ValueError, match="carry"):
        eng.run(eng.seeds_from_list(["http://host0.example.com/"]), carry=out)
    ck = CrawlEngine(spark, max_depth=1, checkpoint_dir="/tmp/nonexistent_ck")
    with pytest.raises(ValueError, match="checkpoint"):
        ck.run(ck.seeds_from_list(["http://host0.example.com/"]), carry=out)


def test_carry_depth2_relaxation_equals_batch_bfs(spark):
    """Depth-2 cascade (r5 generalized carry): a wave-2 seed that wave
    1 fetched at depth 2 re-opens its cut subtree TWO levels deep —
    children at relaxed depth 1 and grandchildren at depth 2 — without
    refetching the interior. Fetched set equals the batch BFS over the
    concatenated waves; depth divergences are exactly the
    relaxed-but-already-fetched nodes (stream keeps the deeper
    original depth)."""
    hosts = default_hosts()
    all_seeds = seed_urls(60)
    seeds1 = all_seeds[:12]
    e1 = CrawlEngine(spark, hosts=hosts, max_depth=2, max_rounds=40)
    out1 = e1.run(e1.seeds_from_list(seeds1))
    log1 = out1.fetch_log.collect()
    deep_seed = sorted(
        r["url"] for r in log1 if r["depth"] == 2 and r["status"] == 200
    )[0]
    seeds2 = [deep_seed] + all_seeds[40:48]

    e2 = CrawlEngine(spark, hosts=hosts, max_depth=2, max_rounds=40)
    out2 = e2.run(e2.seeds_from_list(seeds2), carry=out1)
    got = out2.fetch_log.collect()

    batch = CrawlEngine(spark, hosts=hosts, max_depth=2, max_rounds=40)
    want = batch.run(batch.seeds_from_list(seeds1 + seeds2)).fetch_log.collect()

    def key(rows):
        out = {}
        for r in rows:
            out.setdefault(r["url_hash"], []).append((r["status"], r["title"]))
        return {k: sorted(v) for k, v in out.items()}

    assert key(got) == key(want)
    got_depth = {r["url_hash"]: r["depth"] for r in got}
    want_depth = {r["url_hash"]: r["depth"] for r in want}
    diffs = {h for h, d in want_depth.items() if got_depth[h] != d}
    for h in diffs:  # only relaxations: stream kept a DEEPER depth
        assert got_depth[h] > want_depth[h], (h, want_depth[h], got_depth[h])
    # the cascade really fired: the batch run fetched strictly more
    # URLs than wave 1 alone did, through the promoted deep seed
    assert len(key(got)) > len({r["url_hash"] for r in log1})


def test_stream_fed_bfs_equals_batch_bfs(spark, tmp_path):
    """Streaming twin: two seed files drained through stream_seed_bfs
    (second lands after a restart through the same checkpoint — the
    durable-carry path, no process memory in common) must equal the
    batch BFS over the concatenated files at depth 1."""
    seeds1, extra = _waves()
    seeds2 = [_promo_url(spark, seeds1)] + extra
    seed_dir = tmp_path / "seeds_bfs"
    os.makedirs(seed_dir)
    ckpt, out_dir = str(tmp_path / "ck_bfs"), str(tmp_path / "out_bfs")
    now = time.time()
    p0 = seed_dir / "wave0.txt"
    p0.write_text("\n".join(seeds1))
    os.utime(p0, (now - 60,) * 2)

    first = stream_seed_bfs(
        spark, str(seed_dir), checkpoint_dir=ckpt, out_dir=out_dir,
        hosts=default_hosts(), max_depth=1, max_rounds=30,
    )
    assert first.count() > 0

    p1 = seed_dir / "wave1.txt"
    p1.write_text("\n".join(seeds2))
    os.utime(p1, (now - 30,) * 2)
    got = stream_seed_bfs(
        spark, str(seed_dir), checkpoint_dir=ckpt, out_dir=out_dir,
        hosts=default_hosts(), max_depth=1, max_rounds=30,
    ).collect()
    _assert_equals_batch(spark, got, seeds1, seeds2)
    # dense cumulative seq across triggers — the carried seq counter
    assert sorted(r["seq"] for r in got) == list(range(len(got)))


def test_stream_bfs_replay_is_idempotent(spark, tmp_path):
    """An at-least-once replay of a trigger (same batch id, no shared
    checkpoint) reloads the same durable carry, recomputes the same
    continuation, and REPLACES its batch dir — byte-identical log."""
    seeds1, _ = _waves()
    seed_dir = tmp_path / "seeds_replay"
    os.makedirs(seed_dir)
    out_dir = str(tmp_path / "out_replay")
    now = time.time()
    p0 = seed_dir / "wave0.txt"
    p0.write_text("\n".join(seeds1))
    os.utime(p0, (now - 60,) * 2)

    once = stream_seed_bfs(
        spark, str(seed_dir), out_dir=out_dir,
        hosts=default_hosts(), max_depth=1, max_rounds=30,
    ).collect()
    again = stream_seed_bfs(
        spark, str(seed_dir), out_dir=out_dir,
        hosts=default_hosts(), max_depth=1, max_rounds=30,
    ).collect()
    assert sorted(map(str, again)) == sorted(map(str, once))


def test_stream_bfs_with_rank_scores(spark, tmp_path):
    """The production shape from the module docstring: rank-weighted
    frontier priority flows through engine_factory into every
    stream-fed continuation. Scores permute intra-depth scheduling
    only, so the cumulative fetched set still equals the unranked
    batch BFS on the same seed files."""
    seeds1, extra = _waves()
    seeds2 = [_promo_url(spark, seeds1)] + extra
    seed_dir = tmp_path / "seeds_ranked"
    os.makedirs(seed_dir)
    ckpt, out_dir = str(tmp_path / "ck_ranked"), str(tmp_path / "out_ranked")
    now = time.time()
    for i, wave in enumerate([seeds1, seeds2]):
        p = seed_dir / f"wave{i}.txt"
        p.write_text("\n".join(wave))
        os.utime(p, (now - 60 + 30 * i,) * 2)

    # deterministic stand-in score table over REAL crawl url_hashes
    # (production: PageRank of the previous continuation's link graph)
    probe = CrawlEngine(spark, hosts=default_hosts(), max_depth=1, max_rounds=30)
    hashes = [
        r["url_hash"]
        for r in probe.run(probe.seeds_from_list(seeds1)).fetch_log.collect()
    ]
    scores = spark.createDataFrame(
        [(h, float(int(h[:4], 16) % 7)) for h in sorted(set(hashes))],
        "url_hash string, score double",
    )

    def engine_factory():
        return CrawlEngine(
            spark, hosts=default_hosts(), max_depth=1, max_rounds=30,
            rank_scores=scores, rank_scores_tag="stream_v1",
        )

    got = stream_seed_bfs(
        spark, str(seed_dir), checkpoint_dir=ckpt, out_dir=out_dir,
        engine_factory=engine_factory,
    ).collect()
    _assert_equals_batch(spark, got, seeds1, seeds2)


def test_carry_refresh_refetches_stale_seeds(spark):
    """Recrawl policy (r5): with refresh_seeds=True, a carried-over
    seed is fetched AGAIN at depth 0 — new fetch_log row, continued
    seq, politeness clock respected — while everything else keeps
    fetch-once semantics (no child is duplicated: the live re-offer of
    its outlinks anti-joins against the carried seen set)."""
    from ai4orgwebscraper_spark.functions.urls import canonicalize_py, url_hash_py

    hosts = default_hosts()
    seeds1, _ = _waves()
    e1 = CrawlEngine(spark, hosts=hosts, max_depth=1, max_rounds=30)
    out1 = e1.run(e1.seeds_from_list(seeds1))
    n1 = out1.fetch_log.count()

    stale = seeds1[0]
    fresh = seed_urls(80)[70:75]
    e2 = CrawlEngine(
        spark, hosts=hosts, max_depth=1, max_rounds=30, refresh_seeds=True
    )
    out2 = e2.run(e2.seeds_from_list([stale] + fresh), carry=out1)
    log2 = out2.fetch_log.collect()

    h = url_hash_py(canonicalize_py(stale))
    mine = sorted((r for r in log2 if r["url_hash"] == h), key=lambda r: r["seq"])
    old = [r for r in out1.fetch_log.collect() if r["url_hash"] == h]
    # refetched exactly once more than the carried run fetched it
    assert len(mine) == len(old) + 1
    refetch = mine[-1]
    assert refetch["depth"] == 0 and refetch["seq"] >= n1
    # identical content on the deterministic corpus
    assert refetch["status"] == old[0]["status"]
    assert refetch["title"] == old[0]["title"]
    # politeness: the refetch respects the carried host clock
    host_last = max(
        r["fetched_at_ms"] for r in out1.fetch_log.collect()
        if r["host"] == refetch["host"]
    )
    assert refetch["fetched_at_ms"] > host_last
    # no duplicated children: counting first-attempt rows only (the
    # 403→JS retry legitimately adds an attempts=1 row), every
    # non-refreshed url is fetched exactly once across both runs and
    # the refreshed seed exactly twice
    from collections import Counter

    base_fetches = Counter(r["url_hash"] for r in log2 if r["attempts"] == 0)
    for k, c in base_fetches.items():
        assert c == (2 if k == h else 1), (k, c)
    # seq stays dense across the whole cumulative log
    assert sorted(r["seq"] for r in log2) == list(range(len(log2)))


def test_fetch_depths_incremental_state_matches_log(spark):
    """r5: CrawlOutputs.fetch_depths is the incrementally maintained
    best-depth table. Invariants: on any run it equals the min-agg of
    the cumulative fetch_log, and a continuation fed the incremental
    table produces the SAME rows as one forced to re-aggregate the
    carried log (fetch_depths=None fallback)."""
    from ai4orgwebscraper_spark.frontier.engine import CrawlOutputs

    hosts = default_hosts()
    seeds1, extra = _waves()
    seeds2 = [_promo_url(spark, seeds1)] + extra
    e1 = CrawlEngine(spark, hosts=hosts, max_depth=1, max_rounds=30)
    out1 = e1.run(e1.seeds_from_list(seeds1))

    def depth_agg(log):
        from pyspark.sql import functions as F
        return {
            (r["url_hash"], r["best_depth"], r["node_seq"])
            for r in log.groupBy("url_hash")
            .agg(F.min("depth").alias("best_depth"), F.min("seq").alias("node_seq"))
            .collect()
        }

    assert {tuple(r) for r in out1.fetch_depths.collect()} == depth_agg(out1.fetch_log)

    e2a = CrawlEngine(spark, hosts=hosts, max_depth=1, max_rounds=30)
    got_fast = e2a.run(e2a.seeds_from_list(seeds2), carry=out1)
    stripped = CrawlOutputs(
        out1.fetch_log, out1.documents, out1.seen, out1.metrics,
        outlinks=out1.outlinks,  # fetch_depths=None -> re-agg fallback
    )
    e2b = CrawlEngine(spark, hosts=hosts, max_depth=1, max_rounds=30)
    got_slow = e2b.run(e2b.seeds_from_list(seeds2), carry=stripped)
    rows_fast = sorted(map(str, got_fast.fetch_log.collect()))
    rows_slow = sorted(map(str, got_slow.fetch_log.collect()))
    assert rows_fast == rows_slow
    # the continuation's fetch_depths records the EFFECTIVE best depth:
    # equal to the log's min fetch depth everywhere except relaxed
    # nodes (e.g. the promoted seed), where it is strictly better —
    # exactly what stops a later offer from re-relaxing them
    state = {r["url_hash"]: (r["best_depth"], r["node_seq"])
             for r in got_fast.fetch_depths.collect()}
    log_agg = {h: (d, s) for h, d, s in depth_agg(got_fast.fetch_log)}
    assert set(state) == set(log_agg)
    relaxed = 0
    for h, (d, s) in log_agg.items():
        assert state[h][1] == s, h          # node_seq always log-true
        assert state[h][0] <= d, h
        relaxed += state[h][0] < d
    assert relaxed >= 1  # the promoted seed really was relaxed


def test_carry_composes_with_trap_guard(spark):
    """Engine-extension composition: a trap-guarded wave-1 run carried
    into a trap-guarded wave 2 (whose seeds INCLUDE trap URLs) must
    equal one trap-guarded batch BFS over the concatenated waves —
    traps never enter the frontier in either path, boundary-legal URLs
    do, and seen multiplicities agree."""
    from ai4orgwebscraper_spark.functions.urls import canonicalize_py

    trap_deep = "https://trap.example/" + "/".join(f"d{i}" for i in range(20))
    ok_rep = "https://trap.example/a/x/a/y/a"
    all_seeds = seed_urls(40)
    seeds1, seeds2 = all_seeds[:15], all_seeds[25:35] + [trap_deep, ok_rep]
    hosts = default_hosts()
    e1 = CrawlEngine(spark, hosts=hosts, max_depth=1, max_rounds=30, trap_guard=True)
    out1 = e1.run(e1.seeds_from_list(seeds1))
    e2 = CrawlEngine(spark, hosts=hosts, max_depth=1, max_rounds=30, trap_guard=True)
    out2 = e2.run(e2.seeds_from_list(seeds2), carry=out1)

    batch = CrawlEngine(
        spark, hosts=hosts, max_depth=1, max_rounds=30, trap_guard=True
    )
    want_out = batch.run(batch.seeds_from_list(seeds1 + seeds2))

    def key(rows):
        out = {}
        for r in rows:
            out.setdefault(r["url_hash"], []).append((r["status"], r["title"]))
        return {k: sorted(v) for k, v in out.items()}

    assert key(out2.fetch_log.collect()) == key(want_out.fetch_log.collect())
    got_seen = {(r["url"], r["multiplicity"]) for r in out2.seen.collect()}
    want_seen = {(r["url"], r["multiplicity"]) for r in want_out.seen.collect()}
    assert got_seen == want_seen
    fetched = {r["url"] for r in out2.fetch_log.collect()}
    assert canonicalize_py(trap_deep) not in fetched
    assert canonicalize_py(ok_rep) in fetched
