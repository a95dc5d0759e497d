"""Partitioned bloom seen-set: no false negatives, bounded false
positives, result-transparent inside the engine."""

from __future__ import annotations

import hashlib

from ai4orgwebscraper_spark.frontier import bloom as B
from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
from ai4orgwebscraper_spark.sources.corpus import default_hosts, seed_urls


def _keys(prefix: str, n: int) -> list[str]:
    return [hashlib.md5(f"{prefix}|{i}".encode()).hexdigest() for i in range(n)]


def test_no_false_negatives_and_bounded_fpp(spark):
    present = _keys("in", 3000)
    absent = _keys("out", 3000)
    seen = spark.createDataFrame([(k,) for k in present], "url_hash string")
    bloom = B.build_bloom(seen, n_shards=16, fpp=0.01)
    assert all(bloom.might_contain(k) for k in present)  # NEVER a false negative
    fp = sum(1 for k in absent if bloom.might_contain(k))
    assert fp / len(absent) < 0.05  # sized for 1%; generous CI bound


def test_prefilter_column(spark):
    present = _keys("in", 500)
    absent = _keys("out", 500)
    seen = spark.createDataFrame([(k,) for k in present], "url_hash string")
    bloom = B.build_bloom(seen, n_shards=8)
    cands = spark.createDataFrame([(k,) for k in present + absent], "url_hash string")
    flagged = {r["url_hash"]: r["__maybe_seen"] for r in B.prefilter_new(cands, bloom).collect()}
    assert all(flagged[k] for k in present)
    assert sum(1 for k in absent if flagged[k]) < 25


def test_engine_result_transparent(spark):
    """BFS outputs identical with the bloom prefilter on vs off."""
    seeds = seed_urls(40)
    outs = {}
    for flag in (True, False):
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
