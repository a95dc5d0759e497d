"""Operator library (SURVEY.md §2) + training-data pipeline operators.

Every SQL-expressible operator registers a (queries, oracles) pair:
``QUERIES[name]`` is a ``(spark, sf_dir) -> DataFrame`` callable and
``ORACLES[name]`` the equivalent DuckDB SQL — the driver's
correctness gate. Aggregates over doubles are computed through
``decimal(18,2)`` casts (exact, order-independent — safe to compare
across engines) and cast back to double at the end; ratios are
rounded explicitly on both sides.
"""

from ai4orgwebscraper_spark.operators import (  # noqa: F401
    analytics,
    clustering,
    dedup,
    graph,
    multimodal,
    relational,
    retrieval,
    similarity,
    temporal,
    text,
    tokenizer,
)

QUERIES = {}
ORACLES = {}
for _m in (relational, analytics, text, dedup, similarity, clustering, graph, temporal, retrieval, tokenizer):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
