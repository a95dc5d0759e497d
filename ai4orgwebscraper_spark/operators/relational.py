"""Relational operators over the TPC-H-ish tables (SURVEY.md §2.3-2.5).

The reference's relational surface is tiny (point lookups, caps,
top-k via Counter — e.g. linkedin_app.py:198-201, app.py:148-149);
these operators expose the full scan/filter/agg/join/window/top-k
algebra the engine provides, expressed so Catalyst gets pushdown +
pruning and small dimensions broadcast.

Scale notes per operator are in the docstrings; `.explain` checks are
in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai4orgwebscraper_spark.sources.readers import load_table, load_wide

DEC = "decimal(18,2)"
DEC4 = "decimal(18,4)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical partial+final hash aggregation.

    Scale: groupBy on 2 low-cardinality keys → map-side partial agg
    shrinks the shuffle to (#partitions x 6 groups) rows; decimal sums
    are exact so results are plan-shape-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # 2dp x 2dp products carry 4 decimals — quantize at (18,4) so the
    # double->decimal cast never rounds (engines round .005 differently)
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC4)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+agg — every predicate must
    reach the parquet reader (PushedFilters), no shuffle at all beyond
    the single-row final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(DEC4))
            .cast("double")
            .alias("revenue")
        )
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k (ties broken by key).

    Scale: orders is the fact side; customer joins via shuffle-hash/
    broadcast as AQE decides; top-10 is TakeOrderedAndProject (no full
    sort). The fact scan is hash-widened on the group key when the
    fixture file is under-parallel (load_wide: no-op on a multi-split
    table) so the probe+partial-agg map side uses the full width."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_wide(spark, sf_dir, "orders", by=["o_custkey"])
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
             F.count("*").alias("n_orders"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level dimension join: customer ⋈ nation ⋈ region.

    Scale: nation (25 rows) and region (5 rows) are broadcast — the
    fact table never shuffles for the join, only for the final agg."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (SURVEY.md W1 — the frontier
    per-host selection primitive, exercised relationally here)."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.col("p_partkey"))
    return (
        part.withColumn("rank_in_brand", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_brand") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rank_in_brand")
        .orderBy("p_brand", "rank_in_brand")
    )


def q_orders_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation: orders-per-customer → distribution.
    Includes zero-order customers via left join (the reference's
    internal/external split A4 generalized)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_orders")
    )


def q_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("sum_acctbal"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q_supplier_part_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way fact join lineitem ⋈ supplier ⋈ part with agg — the
    heaviest relational shape here. Scale: supplier/part broadcast at
    these SFs; at 100TB the join keys are co-partitioned by bucketing
    the fact table on l_suppkey (see SURVEY.md §4.2). The fact scan is
    hash-widened on l_suppkey when the fixture file is under-parallel
    (load_wide: no-op on a multi-split table)."""
    li = load_wide(spark, sf_dir, "lineitem", by=["l_suppkey"])
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("s_name", "p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("s_name", "p_brand")
    )


def q_customer_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by key (SURVEY.md S7/P9: get_job_details /
    pandas boolean-mask lookup, linkedin_api.py:453-463,
    linkedin_app.py:198-201). Scale: a key-predicate scan —
    pushdown makes it a near-noop over parquet row groups."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_custkey").isin(1, 42, 100)).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    ).orderBy("c_custkey")


def q_orders_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset pagination (SURVEY.md S6/O2: start/count offset paging,
    linkedin_api.py:419-421, count capped at 100), page 3 of size 25.

    Scale shape: orderBy().limit(start+count) compiles to
    TakeOrderedAndProject — each partition keeps its local top-75 and
    only 75-row heaps reach the driver-side merge. Only the ≤75
    survivors go through the (now trivially small) global row_number
    window; the whole-orders-table SinglePartition window exchange the
    naive version implies never exists (VERDICT r01 item 3)."""
    orders = load_table(spark, sf_dir, "orders")
    start, count = 50, min(25, 100)
    page_order = [F.desc("o_orderdate"), F.col("o_orderkey")]
    top = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    ).orderBy(*page_order).limit(start + count)
    w = Window.orderBy(*page_order)
    return (
        top.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") > start)
        .select("rn", "o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("rn")
    )


def q_rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (engine extension — absent in the reference,
    SURVEY.md §2.4 note; Spark/DuckDB both provide it natively)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q_part_nested_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested API-document extraction (SURVEY.md S6/S7/P8 shape: the
    reference's job rows carry nested structs with an industries list,
    linkedin_api.py:81-113, and the industries predicate filters on it,
    P8). Flat TPC-H columns are packed into the nested document shape
    the API would return — detail.{brand, size_class, industries[]} —
    then queried through struct-field access + array_contains, the
    exact operator pair the reference's nested rows need.

    Scale: struct pack/extract and array_contains are pure codegen'd
    column exprs over one scan; the agg is an ordinary partial+final
    hash agg on the extracted field."""
    part = load_table(spark, sf_dir, "part")
    docs = part.select(
        "p_partkey",
        F.struct(
            F.col("p_brand").alias("brand"),
            F.col("p_size").alias("size_class"),
            F.array(
                F.col("p_type"),
                F.concat(F.lit("SZ"), (F.col("p_size") % 5).cast("string")),
            ).alias("industries"),
        ).alias("detail"),
        F.col("p_retailprice"),
    )
    return (
        docs.filter(F.array_contains(F.col("detail.industries"), "PROMO"))
        .groupBy(F.col("detail.brand").alias("brand"))
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct(F.col("detail.size_class")).alias("n_sizes"),
            F.round(F.sum(F.col("p_retailprice").cast(DEC)).cast("double"), 2).alias(
                "total_price"
            ),
            F.max(F.size(F.col("detail.industries"))).cast("long").alias("max_industries"),
        )
        .orderBy("brand")
    )


QUERIES = {
    "q_part_nested_detail": q_part_nested_detail,
    "q_customer_lookup": q_customer_lookup,
    "q_orders_paged": q_orders_paged,
    "q_rollup_order_status": q_rollup_order_status,
    "q1_pricing_summary": q1_pricing_summary,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q_top_customers": q_top_customers,
    "q_order_priority": q_order_priority,
    "q_region_rollup": q_region_rollup,
    "q_top_parts_per_brand": q_top_parts_per_brand,
    "q_orders_histogram": q_orders_histogram,
    "q_segment_stats": q_segment_stats,
    "q_supplier_part_join": q_supplier_part_join,
}

ORACLES = {
    "q_part_nested_detail": """
        WITH docs AS (
            SELECT p_partkey,
                   struct_pack(brand := p_brand, size_class := p_size,
                               industries := [p_type, 'SZ' || CAST(p_size % 5 AS VARCHAR)]) AS detail,
                   p_retailprice
            FROM part
        )
        SELECT struct_extract(detail, 'brand') AS brand,
               count(*) AS n_parts,
               count(DISTINCT struct_extract(detail, 'size_class')) AS n_sizes,
               round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price,
               CAST(max(len(struct_extract(detail, 'industries'))) AS BIGINT) AS max_industries
        FROM docs
        WHERE list_contains(struct_extract(detail, 'industries'), 'PROMO')
        GROUP BY 1 ORDER BY brand
    """,
    "q_customer_lookup": """
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        FROM customer WHERE c_custkey IN (1, 42, 100)
        ORDER BY c_custkey
    """,
    "q_orders_paged": """
        SELECT rn, o_orderkey, o_custkey, o_totalprice
        FROM (
            SELECT row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey) AS rn,
                   o_orderkey, o_custkey, o_totalprice
            FROM orders
        )
        WHERE rn > 50 AND rn <= 75
        ORDER BY rn
    """,
    "q_rollup_order_status": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q_top_customers": """
        SELECT c_custkey, c_name,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 10
    """,
    "q_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q_region_rollup": """
        SELECT r_name, count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
    """,
    "q_top_parts_per_brand": """
        SELECT p_brand, p_partkey, p_name, p_retailprice, rank_in_brand
        FROM (
            SELECT p_brand, p_partkey, p_name, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rank_in_brand
            FROM part
        )
        WHERE rank_in_brand <= 3
        ORDER BY p_brand, rank_in_brand
    """,
    "q_orders_histogram": """
        SELECT n_orders, count(*) AS n_customers
        FROM (
            SELECT c_custkey, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY n_orders
        ORDER BY n_orders
    """,
    "q_segment_stats": """
        SELECT c_mktsegment, count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
               min(c_acctbal) AS min_acctbal,
               max(c_acctbal) AS max_acctbal
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q_supplier_part_join": """
        SELECT s_name, p_brand,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
               count(*) AS n_lines
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY s_name, p_brand
        ORDER BY s_name, p_brand
    """,
}
