"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline: the reference-parity
crawl (seed list → canonicalize → politeness-gated fetch → interleaved
span documents) on the deterministic synthetic web, returning the
`documents(doc_id, spans)` table of BASELINE.json:input_hint.

``queries()``/``oracle_sql()`` expose every SQL-expressible operator
from SURVEY.md §2 + the training-data-pipeline suite; the driver
compares each against DuckDB at sf0.01. Crawl-path entries have no
SQL oracle (iterative stateful loop) — the driver records rows-only;
their exact-match correctness is covered by tests/test_crawl_golden.py
against the pure-Python normative oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference-parity crawl → interleaved span documents."""
    from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
    from ai4orgwebscraper_spark.sources.corpus import seed_urls

    engine = CrawlEngine(spark, reference_mode=True)
    out = engine.run(engine.seeds_from_list(seed_urls(100)))
    return out.documents


def _crawl_reference_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
    from ai4orgwebscraper_spark.sources.corpus import seed_urls

    engine = CrawlEngine(spark, reference_mode=True)
    return engine.run(engine.seeds_from_list(seed_urls(100))).fetch_log


def _crawl_bfs_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
    from ai4orgwebscraper_spark.sources.corpus import seed_urls

    engine = CrawlEngine(spark, max_depth=1, max_rounds=50)
    return engine.run(engine.seeds_from_list(seed_urls(60))).fetch_log


def _crawl_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
    from ai4orgwebscraper_spark.sources.corpus import seed_urls

    engine = CrawlEngine(spark, reference_mode=True)
    return engine.run(engine.seeds_from_list(seed_urls(100))).documents


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ai4orgwebscraper_spark import operators
    from ai4orgwebscraper_spark.streaming import events_stream

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(operators.QUERIES)
    out.update(events_stream.QUERIES)
    # crawl-engine paths (no SQL oracle — stateful iterative loop;
    # exact-match vs the normative oracle is asserted in tests/)
    out["crawl_reference_parity"] = _crawl_reference_log
    out["crawl_bfs_frontier"] = _crawl_bfs_log
    out["crawl_documents_spans"] = _crawl_documents
    return out


def oracle_sql() -> dict[str, str]:
    from ai4orgwebscraper_spark import operators
    from ai4orgwebscraper_spark.streaming import events_stream

    out: dict[str, str] = {}
    out.update(operators.ORACLES)
    out.update(events_stream.ORACLES)
    return out
