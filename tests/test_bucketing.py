"""Bucketed co-located join: the plan property that matters at
100 TB — zero Exchange on a fact-fact join+agg — pinned at test
scale, plus value parity vs the plain shuffled plan.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from ai4orgwebscraper_spark.sources.readers import load_table
from ai4orgwebscraper_spark.sources.warehouse import (
    bucketize_order_tables,
    drop_table,
    order_revenue,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    """Force the sort-merge path: sf0.001 orders would otherwise
    broadcast and hide the property under test."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture()
def bucketed_tables(spark):
    root = tempfile.mkdtemp(prefix="bucket_wh_")
    names = bucketize_order_tables(spark, SF_DIR, root, n_buckets=8)
    yield names
    for t in names:
        drop_table(spark, t)
    shutil.rmtree(root, ignore_errors=True)


def _executed_plan(df) -> str:
    df.collect()  # materialize so AQE reports the final plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_zero_exchanges(spark, no_broadcast, bucketed_tables):
    o_tbl, l_tbl = bucketed_tables
    df = order_revenue(spark.table(o_tbl), spark.table(l_tbl))
    plan = _executed_plan(df)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # neither join side nor the agg
    # the sortBy at write time is honored: no re-sort of the big side
    # beyond the join's required ordering is introduced by a shuffle
    assert "ShuffleExchange" not in plan

    # the same query over plain parquet DOES shuffle both sides —
    # the contrast that makes the bucketed plan meaningful
    plain = order_revenue(
        load_table(spark, SF_DIR, "orders"), load_table(spark, SF_DIR, "lineitem")
    )
    plain_plan = _executed_plan(plain)
    assert plain_plan.count("Exchange") >= 2


def test_bucketed_join_values_match_plain(spark, no_broadcast, bucketed_tables):
    o_tbl, l_tbl = bucketed_tables
    bucketed = {
        r["o_orderkey"]: (r["revenue"], r["n_items"])
        for r in order_revenue(spark.table(o_tbl), spark.table(l_tbl)).collect()
    }
    plain = {
        r["o_orderkey"]: (r["revenue"], r["n_items"])
        for r in order_revenue(
            load_table(spark, SF_DIR, "orders"),
            load_table(spark, SF_DIR, "lineitem"),
        ).collect()
    }
    assert bucketed == plain  # decimal sums: exact, order-independent


def test_groupby_on_bucket_key_skips_exchange(spark, no_broadcast, bucketed_tables):
    _, l_tbl = bucketed_tables
    from pyspark.sql import functions as F

    agg = (
        spark.table(l_tbl)
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"))
    )
    plan = _executed_plan(agg)
    assert "Exchange" not in plan
