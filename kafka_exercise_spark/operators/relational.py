"""Relational operators beyond the reference surface (SURVEY.md §2.5 / §7 stage E).

The reference has no joins, sorts, set ops, HAVING, DISTINCT, subqueries, or
analytic window functions (SURVEY.md §2.5 — explicit absences). A Spark engine
gets them from Catalyst; this module exposes them as oracle-checkable queries
over the TPC-H-ish fixtures, each written the way it should run at 100 TB:

- Dimension joins are explicit ``broadcast()`` (region/nation/customer at
  TPC-H shape are orders of magnitude smaller than the fact tables — a
  broadcast-hash join avoids shuffling the fact side entirely).
- Fact-fact joins (orders ⨝ lineitem) shuffle on the join key once; AQE picks
  sort-merge vs shuffled-hash from runtime stats and splits skewed keys.
- Aggregations are single-shuffle with map-side partial aggregation.
- Top-k is ``ORDER BY ... LIMIT k`` — Spark plans TakeOrderedAndProject
  (per-partition heap + driver merge of k rows), never a full sort.
- Double-typed aggregates are rounded at the result edge (2/6 decimals) so
  the value-hash is stable across summation orders — FP addition is not
  associative and a distributed sum's order is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-aggregate scan-heavy groupBy over lineitem.

    One wide scan, map-side partial agg, one shuffle over a 6-group key —
    the canonical "agg pushdown + column pruning" benchmark. ReadSchema
    should show only the 7 referenced columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.

    customer (filtered, small) is broadcast into orders; orders ⨝ lineitem
    shuffles once on l_orderkey. Top-10 via TakeOrderedAndProject. Revenue is
    rounded and the sort is tie-broken on the key so the LIMIT edge is
    deterministic for the oracle.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            # orders is a fact table — never broadcast it; this side shuffles
            # on o_orderkey and AQE picks SMJ vs shuffled-hash at runtime.
            orders.join(
                F.broadcast(cust), orders.o_custkey == cust.c_custkey
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join with a region restriction.

    All dimensions broadcast (region 5 rows → nation 25 → customer,
    supplier); the only shuffles are the two fact-side joins and the final
    1-key agg. Order lineitem⨝orders first so the selective date filter
    prunes the fact rows before the wide join fan-out.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")

    asian_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    asian_cust = cust.join(
        F.broadcast(asian_nations), cust.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_nationkey").alias("cust_nationkey"), "n_name")

    return (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(asian_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("cust_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain dim⨝fact inner join + per-customer rollup (broadcast dim)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )


def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price — TakeOrderedAndProject, not a full sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


def distinct_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — absent from the reference (SURVEY.md §2.5)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL + aggregation: per-nation customer surplus.

    ``exceptAll`` keeps multiplicity (a nation with 40 customers and 3
    suppliers survives 37 times) — the bag-semantics variant the DISTINCT
    form can't express. Counted per key so the result is small and stable.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return (
        cust.exceptAll(supp)
        .groupBy("nationkey")
        .agg(F.count("*").alias("surplus"))
    )


def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI: customers with ≥1 order vs with none, counted.

    Semi/anti joins ship only the key column of the probe side — at scale
    they beat ``IN (subquery)`` rewrites by never materializing the match.
    """
    cust = load_table(spark, sf_dir, "customer")
    # Restrict to 'P'-status orders so the anti side is non-trivial.
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
    )
    with_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select(F.lit("with_orders").alias("bucket"), "c_custkey")
    without = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select(F.lit("without_orders").alias("bucket"), "c_custkey")
    return with_orders.unionAll(without).groupBy("bucket").agg(
        F.count("*").alias("n_customers")
    )


def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING — absent from the reference (SURVEY.md §2.5)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (row_number / rank / running sum).

    Partition by customer: the shuffle is one hash partition by o_custkey and
    an in-partition sort — no global sort. Full ordering (price desc, key asc)
    makes row_number deterministic for the oracle.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .withColumn("running_spend", F.round(F.sum("o_totalprice").over(w), 2))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "running_spend")
    )


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation over a LEFT OUTER join.

    Customers×orders left-outer so zero-order customers keep c_count = 0;
    the second agg is over ~|distinct counts| rows — essentially free. The
    outer join shuffles both sides on the key; the first agg rides the same
    partitioning (no extra exchange for groupBy on the join key).
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) per attribute pair after a dim join."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q18_QTY_THRESHOLD = 250


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a HAVING aggregate → semi join.

    The subquery (orders whose lineitems sum past the threshold) reduces to
    a pre-aggregated key set; the outer query semi-joins it — only keys
    move, no correlated per-row execution. Catalyst decorrelates the SQL
    form to exactly this plan; here it is written directly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery + NOT EXISTS anti join.

    The scalar (global average balance) is a 1-row aggregate broadcast into
    the filter — never a per-row subquery execution. NOT EXISTS is a
    left-anti join that ships only the key column of the probe side.
    """
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    f_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(
        f_orders, rich.c_custkey == f_orders.o_custkey, "left_anti"
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


def outer_join_customers_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with both-sided null surface.

    AUTOMOBILE customers ⟗ per-customer 'P'-order rollups: unmatched rows
    survive from BOTH sides. Plan-wise a full outer can't broadcast — it
    shuffles both sides on the key (the only correct distribution for
    full-outer semantics); the agg side is pre-reduced so the shuffle moves
    one row per customer, not one per order.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey", "c_name")
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
    )
    return cust.join(
        ords, cust.c_custkey == ords.o_custkey, "full_outer"
    ).select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        "n_orders",
        "spend",
    )


def pivot_orders_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority × status as columns.

    The pivot value list is explicit — at scale an implicit pivot runs an
    extra distinct pass over the data just to discover column names.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.col("F").alias("n_f"),
            F.col("O").alias("n_o"),
            F.col("P").alias("n_p"),
        )
    )


def unpivot_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-type stats → long (type, stat, value)."""
    events = load_table(spark, sf_dir, "events")
    wide = events.groupBy("event_type").agg(
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )
    return wide.unpivot(
        ["event_type"],
        ["min_value", "max_value", "avg_value"],
        "stat",
        "stat_value",
    )


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form rollup/cube specialize.

    Exposed through spark.sql (the DataFrame API has only rollup/cube);
    the plan is the same single Expand + one shuffle.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "gs_orders_view"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)
                   AS gid,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS spend
        FROM gs_orders_view
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


def cross_join_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN of two constant-sized dims (5 × 5 = 25 routes).

    Cartesian products are legitimate exactly here: both sides tiny and the
    product is the semantics. Anything larger must be a keyed join — the
    plan audit (tests/test_plans.py) forbids CartesianProduct elsewhere.
    """
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_name").alias("src_region")
    )
    dst = load_table(spark, sf_dir, "region").select(
        F.col("r_name").alias("dst_region")
    )
    return region.crossJoin(dst).filter(
        F.col("src_region") != F.col("dst_region")
    )


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (FIXTURES.md §2 stage-E surface).

    ``get_json_object`` is JVM-side (Jackson) — no Python in the path. The
    extracted key is aggregated to prove the value, not just the parse.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn(
            "k", F.get_json_object(F.col("props"), "$.k").cast("bigint")
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


def agg_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wider aggregate surface: min/max/avg/stddev over the event stream."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.stddev_samp("value"), 6).alias("std_value"),
        F.count_distinct("user_id").alias("n_users"),
    )
