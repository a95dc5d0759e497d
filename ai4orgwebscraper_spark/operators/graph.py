"""Link-graph analytics over the crawl's outlink table (SURVEY.md §2
extension; north-rule tie-in: the frontier's priority queue scores by
depth + host budget — PageRank is the classic next signal a production
crawler folds into that score).

Input is the engine's ``CrawlOutputs.outlinks`` link graph
(src url_hash → resolved dst url_hash), restricted to crawled pages.
The iteration is the standard damped power method, run with the same
scale discipline as ``dedup.connected_components``: per-step parquet
spill (lineage truncation), shuffle width sized to the node count,
degree table computed once and pre-partitioned on the join key so the
static side never re-shuffles per iteration. A fixed iteration count
(default 10) keeps the result deterministic and cross-engine
reproducible — the pure-Python twin in tests/test_graph.py computes
the identical fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 10


def pagerank(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
) -> DataFrame:
    """nodes(id), edges(src, dst) → (id, rank) after ``iterations``
    damped power-method steps. Dangling nodes (no outlinks) leak their
    mass uniformly, the standard correction, so ranks sum to 1 every
    iteration.

    Scale shape: degree table and edge table are computed once and
    pre-partitioned on ``src`` at loop width (the static-graph layout —
    no per-iteration shuffle of the edges); each step is one join +
    one aggregation + a parquet spill of |nodes| rows."""
    from ai4orgwebscraper_spark.plans.iterate import loop_width, spill_loop

    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(F.col("id"), F.lit(0.0).alias("rank"))

    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # adjacency pre-partitioned on the join key at loop width (the
    # static-graph layout — no per-iteration edge shuffle); spill_loop
    # persists + materializes it at SESSION width before narrowing, so
    # the heavy lineage upstream of `edges` (the crawl, at the driver
    # entry) never runs under-parallelized inside the loop
    adj = (
        edges.join(deg, "src")
        .select("src", "dst", "outdeg")
        .repartition(loop_width(spark, n_nodes), "src")
    )
    with spill_loop(spark, n_nodes, statics=[adj], prefix="pr_state_") as ctx:
        ranks = ctx.spill(
            nodes.select(F.col("id"), F.lit(1.0 / n_nodes).alias("rank")), 0
        )
        # the persisted adjacency also serves as the linking-node set
        # for the dangling test — deg itself is never read in the loop,
        # so its edge lineage runs exactly once (inside adj)
        linkers = adj.select("src").distinct()
        base_mass = (1.0 - damping) / n_nodes
        for it in range(1, iterations + 1):
            contrib = (
                adj.join(ranks, adj.src == ranks.id)
                .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("inflow"))
            )
            # dangling mass: rank held by nodes with no outlinks,
            # redistributed uniformly (keeps sum(rank) == 1). A 1-row
            # broadcast aggregate folded into the plan — never a
            # driver-side collect inside the loop.
            dangling = ranks.join(
                linkers, ranks.id == linkers.src, "left_anti"
            ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
            ranks = ctx.spill(
                ranks.select("id")
                .join(contrib, F.col("id") == F.col("dst"), "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "id",
                    (
                        F.lit(base_mass)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("inflow"), F.lit(0.0))
                            + F.col("__dm") / F.lit(float(n_nodes))
                        )
                    ).alias("rank"),
                ),
                it,
            )
    return ranks


def pagerank_py(
    node_ids: list, edge_pairs: list[tuple], iterations: int = ITERATIONS,
    damping: float = DAMPING,
) -> dict:
    """Pure-Python twin (the normative oracle for tests): identical
    iteration, identical dangling handling."""
    n = len(node_ids)
    if n == 0:
        return {}
    outdeg: dict = {}
    inlinks: dict = {}
    for s, d in edge_pairs:
        outdeg[s] = outdeg.get(s, 0) + 1
        inlinks.setdefault(d, []).append(s)
    ranks = {v: 1.0 / n for v in node_ids}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        dangling = sum(r for v, r in ranks.items() if v not in outdeg)
        new = {}
        for v in node_ids:
            inflow = sum(ranks[s] / outdeg[s] for s in inlinks.get(v, ()))
            new[v] = base + damping * (inflow + dangling / n)
        ranks = new
    return ranks
