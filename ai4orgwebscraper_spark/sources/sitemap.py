"""Sitemap ingestion (sitemaps.org XML protocol) — the third seed
source beside seed files (S2) and manual entry (S3): a production
crawler seeds a host from `https://host/sitemap.xml` before (or
instead of) hand-curated lists. The reference has no sitemap support;
this is an engine extension in the S-series shape, and it feeds the
same `schemas.SEEDS` contract the other sources do, so everything
downstream (canonicalize -> dedup -> frontier) is shared.

Parsing is stdlib ElementTree over the per-FILE XML (a sitemap file
is capped at 50k URLs / 50 MB by the protocol — file-scale, not
corpus-scale), run inside `mapPartitions`-free driver code for the
seed path (seed lists are reference-scale, cap-enforced like S2) and
exposed as `parse_sitemap(text)` for a distributed pandas-UDF wrap
when sitemap bodies arrive as a DataFrame column. Sitemap INDEX files
(`<sitemapindex>`) return their child sitemap URLs so the caller
drives the fetch loop — this module never does network I/O (the
deterministic corpus stands in for fetches everywhere in this repo).

Ordering contract: document order of <url> entries, ranked
explicitly — the same order-by-explicit-key rule the whole engine
follows (never partition iteration order). <lastmod> is surfaced so
an incremental recrawl can filter to entries newer than its last
run (the K4/incremental-accumulation hook)."""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ai4orgwebscraper_spark import schemas
from ai4orgwebscraper_spark.sources.seeds import FILE_SEED_CAP, SeedCapExceeded

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


@dataclass
class SitemapEntry:
    url: str
    lastmod: str | None = None


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(text: str) -> tuple[str, list[SitemapEntry]]:
    """Parse one sitemap XML document.

    Returns ``(kind, entries)`` where kind is ``"urlset"`` (entries
    are page URLs) or ``"sitemapindex"`` (entries are child sitemap
    URLs for the caller to fetch). Namespace-tolerant: matches on
    local names, so the official namespace, no namespace, and vendor
    prefixes all parse. Entries without a <loc> are skipped; document
    order is preserved. Malformed XML raises (loudly — a corrupt
    sitemap must not silently seed nothing)."""
    root = ET.fromstring(text)
    kind = _localname(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap document: root element {root.tag!r}")
    entries: list[SitemapEntry] = []
    child_tag = "url" if kind == "urlset" else "sitemap"
    for node in root:
        if _localname(node.tag) != child_tag:
            continue
        loc, lastmod = None, None
        for f in node:
            name = _localname(f.tag)
            if name == "loc" and f.text:
                loc = f.text.strip()
            elif name == "lastmod" and f.text:
                lastmod = f.text.strip()
        if loc:
            entries.append(SitemapEntry(loc, lastmod))
    return kind, entries


def seeds_from_sitemap(
    spark: SparkSession,
    text: str,
    cap: int = FILE_SEED_CAP,
    newer_than: str | None = None,
) -> DataFrame:
    """Sitemap XML -> the `schemas.SEEDS` frame (seed_rank = document
    order), cap-enforced as a hard error like the S2 file source.

    ``newer_than``: ISO-8601 date/datetime string; entries whose
    <lastmod> is older-or-equal are skipped (entries WITHOUT lastmod
    are kept — absence of evidence is not staleness). ISO-8601 string
    comparison is chronological for the sitemap-legal formats, so the
    filter is a plain string compare on both engines; ranks are
    assigned AFTER filtering (dense, order-preserving).

    A sitemapindex is rejected here — the caller must fetch each
    child sitemap and call this per file (this module does no I/O)."""
    kind, entries = parse_sitemap(text)
    if kind != "urlset":
        raise ValueError(
            "seeds_from_sitemap needs a urlset; got a sitemapindex —"
            " fetch its child sitemaps and call per file"
        )
    if newer_than is not None:
        entries = [e for e in entries if e.lastmod is None or e.lastmod > newer_than]
    if len(entries) > cap:
        raise SeedCapExceeded(f"sitemap has {len(entries)} URLs; cap is {cap}")
    return spark.createDataFrame(
        [(i, e.url) for i, e in enumerate(entries)], schema=schemas.SEEDS
    )


def synthetic_sitemap(urls: list[str], lastmod: dict[str, str] | None = None) -> str:
    """Deterministic sitemap XML for the given URLs (test/fixture
    twin of the synthetic corpus: what `https://host/sitemap.xml`
    would serve)."""
    lastmod = lastmod or {}
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for u in urls:
        parts.append("  <url>")
        parts.append(f"    <loc>{u}</loc>")
        if u in lastmod:
            parts.append(f"    <lastmod>{lastmod[u]}</lastmod>")
        parts.append("  </url>")
    parts.append("</urlset>")
    return "\n".join(parts)
