"""AQE skew-join splitting: runtime evidence for the third leg of the
engine's skew strategy (broadcast dims / explicit salting / AQE).

The frontier salts its hot-host fetch repartition explicitly
(engine._salted_fetch) because admission must stay per-host-exact;
for plain analytical joins the engine leans on AQE's runtime skew
split instead. This test pins that the split actually fires in this
session's configuration (skewJoin.enabled is on in session.py) when a
shuffle partition is pathologically larger than its peers — and
documents the gotcha that makes salting still necessary: a downstream
same-key requirement (e.g. groupBy on the join key) suppresses the
split unless forceOptimizeSkewedJoin accepts the extra shuffle.

Thresholds are lowered to test scale (the defaults trigger at 256 MB
partitions); the MECHANISM under test is identical at 100 TB.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_sides(spark):
    # 80% of rows on one key, wide payload so the hot shuffle
    # partition dwarfs the lowered threshold
    left = spark.range(0, 500_000).select(
        F.when(F.col("id") < 400_000, 0)
        .otherwise((F.col("id") % 99) + 1)
        .alias("k"),
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 1).cast("string")),
        ).alias("pay"),
    )
    right = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    return left, right


def test_aqe_splits_the_skewed_join(spark, skew_confs):
    left, right = _skewed_sides(spark)
    j = left.join(right, "k").select(F.sum(F.length("pay")).alias("total_len"))
    rows = j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin(skew=true)" in plan
    # values unaffected by the split: every row matched, md5 hex = 32
    # chars x 2
    assert rows[0]["total_len"] == 500_000 * 64


def test_downstream_same_key_agg_suppresses_split_without_force(spark, skew_confs):
    """The case the frontier's explicit salting exists for: AQE will
    not split a skewed join whose output must stay hash-distributed
    on the join key (a following groupBy(k)) unless the extra
    shuffle is explicitly accepted."""
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    left, right = _skewed_sides(spark)
    j = left.join(right, "k").groupBy("k").agg(F.count("*").alias("n"))
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan  # suppressed — salting's territory
