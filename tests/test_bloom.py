"""Partitioned bloom seen-set: no false negatives, bounded false
positives, no driver materialization, result-transparent inside the
engine."""

from __future__ import annotations

import hashlib

from ai4orgwebscraper_spark.frontier import bloom as B
from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
from ai4orgwebscraper_spark.sources.corpus import default_hosts, seed_urls


def _keys(prefix: str, n: int) -> list[str]:
    return [hashlib.md5(f"{prefix}|{i}".encode()).hexdigest() for i in range(n)]


def _flags(spark, shards, keys, n_shards):
    cands = spark.createDataFrame([(k,) for k in keys], "url_hash string")
    return {
        r["url_hash"]: r["__maybe_seen"]
        for r in B.prefilter_new(cands, shards, n_shards=n_shards).collect()
    }


def test_no_false_negatives_and_bounded_fpp(spark):
    present = _keys("in", 3000)
    absent = _keys("out", 3000)
    seen = spark.createDataFrame([(k,) for k in present], "url_hash string")
    shards = B.build_bloom_shards(seen, n_shards=16, fpp=0.01)
    flagged = _flags(spark, shards, present + absent, n_shards=16)
    assert all(flagged[k] for k in present)  # NEVER a false negative
    fp = sum(1 for k in absent if flagged[k])
    assert fp / len(absent) < 0.05  # sized for 1%; generous CI bound


def test_incremental_parts_or_semantics(spark):
    """Membership across a list of round-delta shard DataFrames is the
    OR of the parts (the append-only delta structure the engine keeps)."""
    a, b = _keys("a", 400), _keys("b", 400)
    absent = _keys("c", 400)
    part_a = B.build_bloom_shards(
        spark.createDataFrame([(k,) for k in a], "url_hash string"), n_shards=8
    )
    part_b = B.build_bloom_shards(
        spark.createDataFrame([(k,) for k in b], "url_hash string"), n_shards=8
    )
    flagged = _flags(spark, [part_a, part_b], a + b + absent, n_shards=8)
    assert all(flagged[k] for k in a + b)
    assert sum(1 for k in absent if flagged[k]) < 20


def test_shard_count_mismatch_fails_loudly(spark):
    """Shard rows carry the n_shards they were built under; routing
    with a different modulus must raise (ADVICE r02 — a silent mismatch
    is a bloom false NEGATIVE, i.e. wrong results, not just slow)."""
    import pytest

    present = _keys("in", 200)
    seen = spark.createDataFrame([(k,) for k in present], "url_hash string")
    shards = B.build_bloom_shards(seen, n_shards=8)
    with pytest.raises(Exception) as exc:
        _flags(spark, shards, present, n_shards=16)
    assert "BloomShardMismatch" in str(exc.value) or "n_shards" in str(exc.value)


def test_prefilter_column(spark):
    present = _keys("in", 500)
    absent = _keys("out", 500)
    seen = spark.createDataFrame([(k,) for k in present], "url_hash string")
    shards = B.build_bloom_shards(seen, n_shards=8)
    flagged = _flags(spark, shards, present + absent, n_shards=8)
    assert all(flagged[k] for k in present)
    assert sum(1 for k in absent if flagged[k]) < 25


def test_engine_result_transparent(spark, monkeypatch):
    """BFS outputs identical with the bloom prefilter always-on,
    always-off, AND 'auto' forced to activate mid-crawl (threshold 100
    — exercises the catch-up backfill of shard parts for
    pre-activation deltas)."""
    monkeypatch.setenv("SPARK_GRAFT_BLOOM_AUTO_THRESHOLD", "100")
    seeds = seed_urls(40)
    outs = {}
    for flag in (True, False, "auto"):
        eng = CrawlEngine(
            spark, hosts=default_hosts(), max_depth=1, max_rounds=10,
            use_bloom_prefilter=flag,
        )
        out = eng.run(eng.seeds_from_list(seeds))
        outs[flag] = (
            [(r["seq"], r["url"], r["fetched_at_ms"]) for r in out.fetch_log.orderBy("seq").collect()],
            sorted((r["url_hash"], r["multiplicity"]) for r in out.seen.collect()),
        )
    assert outs[True] == outs[False]
    assert outs["auto"] == outs[True]
