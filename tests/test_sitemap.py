"""Sitemap ingestion (sources/sitemap.py): XML parsing (urlset,
sitemapindex, namespaces, malformed input), the lastmod incremental
filter, cap enforcement, and crawl equality with the S2 file source
on the same URLs."""

from __future__ import annotations

import pytest

from ai4orgwebscraper_spark.sources.sitemap import (
    parse_sitemap,
    seeds_from_sitemap,
    synthetic_sitemap,
)
from ai4orgwebscraper_spark.sources.seeds import SeedCapExceeded


def test_parse_urlset_order_and_lastmod():
    xml = synthetic_sitemap(
        ["https://a/x", "https://a/y", "https://b/z"],
        lastmod={"https://a/y": "2024-05-01"},
    )
    kind, entries = parse_sitemap(xml)
    assert kind == "urlset"
    assert [e.url for e in entries] == ["https://a/x", "https://a/y", "https://b/z"]
    assert [e.lastmod for e in entries] == [None, "2024-05-01", None]


def test_parse_tolerates_missing_namespace_and_skips_locless():
    xml = (
        "<urlset><url><loc> https://a/x </loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"
        "<other/><url><loc>https://a/y</loc></url></urlset>"
    )
    kind, entries = parse_sitemap(xml)
    assert kind == "urlset"
    assert [e.url for e in entries] == ["https://a/x", "https://a/y"]  # trimmed


def test_parse_sitemapindex_and_rejection(spark):
    xml = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>https://a/s1.xml</loc><lastmod>2024-02-02</lastmod></sitemap>"
        "<sitemap><loc>https://a/s2.xml</loc></sitemap></sitemapindex>"
    )
    kind, entries = parse_sitemap(xml)
    assert kind == "sitemapindex"
    assert [e.url for e in entries] == ["https://a/s1.xml", "https://a/s2.xml"]
    with pytest.raises(ValueError, match="sitemapindex"):
        seeds_from_sitemap(spark, xml)


def test_malformed_and_wrong_root_raise():
    with pytest.raises(Exception):
        parse_sitemap("<urlset><url>")  # malformed XML
    with pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap("<html></html>")


def test_newer_than_filter_and_cap(spark):
    urls = [f"https://h/p{i}" for i in range(5)]
    xml = synthetic_sitemap(
        urls,
        lastmod={urls[0]: "2024-01-01", urls[1]: "2024-06-15", urls[2]: "2024-06-16"},
    )
    got = seeds_from_sitemap(spark, xml, newer_than="2024-06-15")
    # kept: p2 (newer), p3/p4 (no lastmod); dropped: p0 (older), p1 (equal)
    rows = got.orderBy("seed_rank").collect()
    assert [r["url"] for r in rows] == [urls[2], urls[3], urls[4]]
    assert [r["seed_rank"] for r in rows] == [0, 1, 2]  # dense post-filter
    with pytest.raises(SeedCapExceeded):
        seeds_from_sitemap(spark, synthetic_sitemap([f"u{i}" for i in range(7)]), cap=6)


def test_sitemap_seeded_crawl_equals_file_seeded(spark, tmp_path):
    """The full S-series contract: the same URLs through the sitemap
    source and the S2 text-file source produce identical crawls."""
    from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
    from ai4orgwebscraper_spark.sources.corpus import seed_urls
    from ai4orgwebscraper_spark.sources.seeds import seeds_from_text_file

    urls = seed_urls(25)
    seed_file = tmp_path / "seeds.txt"
    seed_file.write_text("\n".join(urls))
    eng_a = CrawlEngine(spark, reference_mode=True)
    eng_b = CrawlEngine(spark, reference_mode=True)
    try:
        a = eng_a.run(seeds_from_text_file(spark, str(seed_file))).fetch_log.collect()
        b = eng_b.run(
            seeds_from_sitemap(spark, synthetic_sitemap(urls))
        ).fetch_log.collect()
        assert a == b
    finally:
        eng_a.close()
        eng_b.close()
