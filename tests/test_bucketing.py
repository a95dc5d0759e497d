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


def test_partitioned_write_prunes_directories(spark):
    import tempfile

    from pyspark.sql import functions as F

    from ai4orgwebscraper_spark.sources.warehouse import write_partitioned

    docs = load_table(spark, SF_DIR, "documents")
    root = tempfile.mkdtemp(prefix="part_wh_")
    write_partitioned(docs, root, ["lang"])

    df = spark.read.parquet(root).filter(F.col("lang") == "en").select(
        "doc_id", "n_chars"
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # directory-level pruning is a PLANNING-time PartitionFilter, not a
    # row-group PushedFilter; and the projection prunes columns at scan
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:80]
    assert "ReadSchema: struct<doc_id:bigint,n_chars:bigint>" in plan

    # only files under the lang=en directory are ever opened
    files = [
        r[0]
        for r in spark.read.parquet(root)
        .filter(F.col("lang") == "en")
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    assert files and all("lang=en" in f for f in files)

    # parity with the unpartitioned read
    n_plain = docs.filter(F.col("lang") == "en").count()
    assert df.count() == n_plain

    import shutil

    shutil.rmtree(root, ignore_errors=True)
