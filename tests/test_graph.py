"""PageRank over the crawl link graph vs the pure-Python normative
twin (identical iteration, identical dangling handling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
from ai4orgwebscraper_spark.operators.graph import pagerank, pagerank_py
from ai4orgwebscraper_spark.sources.corpus import default_hosts, seed_urls


def test_pagerank_toy_graph_matches_twin(spark):
    """Hand graph with a dangling node and a hub: Spark vs twin to 1e-12."""
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]  # node 4 dangling
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(spark, nodes, edges).collect()}
    want = pagerank_py(list(range(5)), pairs)
    assert got.keys() == want.keys()
    assert all(abs(got[v] - want[v]) < 1e-12 for v in want)
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
    # the hub (2) must outrank the dangling node (4)
    assert got[2] > got[4]


def test_pagerank_crawl_link_graph_matches_twin(spark):
    """The real pipeline: BFS crawl → CrawlOutputs.outlinks resolved to
    crawled targets → PageRank; exact twin parity on the same graph."""
    from ai4orgwebscraper_spark.functions.urls import canonicalize_py, url_hash_py
    from ai4orgwebscraper_spark.functions import urls as U

    eng = CrawlEngine(
        spark, hosts=default_hosts(), max_depth=1, round_seconds=10.0, max_rounds=50
    )
    out = eng.run(eng.seeds_from_list(seed_urls(40)))
    pages = out.fetch_log.select("url_hash").distinct()
    # resolve hrefs to target url_hash, keep edges between crawled pages
    resolved = out.outlinks.select(
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
    nodes = pages.select(F.col("url_hash").alias("id"))
    got = {r["id"]: r["rank"] for r in pagerank(spark, nodes, edges).collect()}

    node_ids = [r["id"] for r in nodes.collect()]
    pair_list = [(r["src"], r["dst"]) for r in edges.collect()]
    want = pagerank_py(node_ids, pair_list)
    assert got.keys() == want.keys() and len(got) > 10
    assert max(abs(got[v] - want[v]) for v in want) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9
    eng.close()
