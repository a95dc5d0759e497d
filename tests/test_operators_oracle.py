"""Driver-gate replica: every queries() entry with an oracle_sql()
must match DuckDB on row count, columns, and order-insensitive values
at sf0.001 (the driver runs the same comparison at sf0.01).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

from ai4orgwebscraper_spark.oracle_check import compare_one, duckdb_conn  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

_ORACLES = entrymod.oracle_sql()
_QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def conn():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


def test_every_query_is_registered():
    # every oracle has a query; crawl entries are rows-only by design
    assert set(_ORACLES) <= set(_QUERIES)
    rows_only = set(_QUERIES) - set(_ORACLES)
    assert rows_only == {
        "crawl_reference_parity",
        "crawl_bfs_frontier",
        "crawl_documents_spans",
        "crawl_word_topk",
        "crawl_media_alt_coverage",
        "crawl_link_domains",
        "crawl_internal_external",
        "crawl_status_breakdown",
        "crawl_pagerank",
        "crawl_spans_dedup",
        "streaming_seed_ingestion",
        "streaming_incremental_dedup",
        "multimodal_decode",
        "multimodal_knn",
        "html_parse_fields",
    }


@pytest.mark.parametrize(
    "name",
    ["multimodal_decode", "multimodal_knn", "html_parse_fields", "crawl_documents_spans"],
)
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert len(df.collect()) > 0


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, conn, name):
    res = compare_one(spark, conn, name, _QUERIES[name], _ORACLES[name], SF_DIR)
    assert res["ok"], res


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "spans"]
