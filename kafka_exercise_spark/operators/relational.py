"""Relational operators beyond the reference surface (SURVEY.md §2.5 / §7 stage E).

The reference has no joins, sorts, set ops, HAVING, DISTINCT, subqueries, or
analytic window functions (SURVEY.md §2.5 — explicit absences). A Spark engine
gets them from Catalyst; this module exposes them as oracle-checkable queries
over the TPC-H-ish fixtures, each written the way it should run at 100 TB:

- Only FIXED-cardinality frames carry explicit ``broadcast()`` hints:
  region (5 rows), nation (25 rows), their ≤25-row joins, and 1-row scalar
  aggregates. Everything that grows with the data — customer, supplier,
  part, orders and all their filtered slices — joins UNHINTED: AQE (on, with
  a 64 MB auto-broadcast threshold, session.py) broadcasts those sides while
  their runtime size fits and degrades to a shuffle join when they outgrow
  it. An explicit hint would override that size check and OOM at 100 TB.
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

    customer (filtered) joins orders unhinted — AQE broadcasts the slice
    while it fits its 64 MB runtime check and falls back to a shuffle join
    at scale (customer grows ∝ data; a forced hint would OOM at 100 TB).
    orders ⨝ lineitem shuffles once on l_orderkey. Top-10 via
    TakeOrderedAndProject. Revenue is rounded and the sort is tie-broken on
    the key so the LIMIT edge is deterministic for the oracle.
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
                cust, orders.o_custkey == cust.c_custkey
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

    Fixed dims broadcast by hint (region 5 rows → nation 25); the
    ∝-data sides (customer, supplier) join unhinted — AQE broadcasts them
    while small, degrades to SMJ at scale. The only guaranteed shuffles are
    the lineitem⨝orders fact join and the final 1-key agg. Order
    lineitem⨝orders first so the selective date filter prunes the fact rows
    before the wide join fan-out.
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
            # orders is a FACT side — never broadcast it (module policy,
            # see q3): the join shuffles once on the order key and AQE
            # picks SMJ vs shuffled-hash (and may still broadcast at
            # runtime if the filtered slice proves tiny — a stats
            # decision, not a hardcoded one)
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(asian_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
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
    """Plain customer⨝orders inner join + per-customer rollup.

    Unhinted: customer grows ∝ data, so AQE decides broadcast-vs-shuffle
    from runtime size instead of a hardcoded hint.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
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
        li.join(part, li.l_partkey == part.p_partkey)
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
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
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


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated subquery → left-semi join.

    (Adapted: the fixture lineitem has no commit/receipt dates — the EXISTS
    predicate is "some lineitem shipped ≥ 30 days after the order date",
    the same late-shipment semantics.) The semi join ships only l_orderkey;
    Catalyst rewrites the SQL EXISTS form to exactly this plan.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= F.date_add(orders.o_orderdate, 30)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global agg — the pushdown litmus test.

    All three predicates and both referenced columns should reach the
    parquet scan (PushedFilters / 4-column ReadSchema); the agg is one
    partial-per-partition + single-row final. No shuffle of data rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation trade flow, grouped by year.

    nation broadcasts by hint into supplier and customer; the enriched
    supp/cust frames themselves join unhinted (they scale ∝ data — AQE
    broadcasts while small). The cross filter keeps only the two
    (supp_nation, cust_nation) orderings; the fact side shuffles once for
    lineitem⨝orders.
    """
    n1, n2 = "NATION_1", "NATION_2"
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .filter(F.col("n_name").isin(n1, n2))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .filter(F.col("n_name").isin(n1, n2))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share via conditional aggregation.

    share = sum(CASE nation)/sum(all) per year — one pass, no self-join.
    Region→nation→customer restricts demand side; supplier nation feeds the
    CASE numerator. ECONOMY parts only. All ∝-data sides (part slice,
    supplier, the two-year ORDERS slice, customer) join unhinted — the
    orders slice especially is a fact table that a forced broadcast would
    OOM on at scale; AQE keeps today's broadcast plan only while the
    runtime sizes fit.
    """
    target_nation = "NATION_3"
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    am_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(am_nations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == target_nation, vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year.

    (Adapted: no partsupp table in the fixtures, so profit omits the
    ps_supplycost term — profit = extendedprice·(1−discount) over PROMO
    parts.) nation broadcasts by hint; part and supplier join unhinted
    (AQE broadcasts while they fit, so lineitem still avoids a pre-agg
    shuffle at bench scale without hardcoding that at 100 TB).
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("l_shipdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_profit")
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers.

    Returned ('R') lineitems ⨝ quarter of orders ⨝ customer ⨝ nation;
    per-customer agg then TakeOrderedAndProject(20). Tie-broken on custkey.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey
    )
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE-sum) aggregation.

    (Adapted: the fixture has no l_shipmode/commit/receipt dates — the
    group key is l_linestatus over a shipdate year, counting critical- vs
    normal-priority orders.) One join, one agg, CASE entirely JVM-side.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional agg over one dim join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_revenue")
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate "view" + top-1 selection.

    Per-supplier quarter revenue, then the max taken by sorted-limit with a
    key tie-break (deterministic under FP sum reordering, unlike
    WHERE rev = (SELECT max…) which can strand on a last-bit difference).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .orderBy(F.desc("total_revenue"), F.asc("s_suppkey"))
        .limit(1)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery → per-key agg + re-join.

    The per-part average quantity is one per-key aggregate joined back into
    the fact filter — Catalyst's decorrelation target, written directly.
    Unhinted (avg_qty has one row per part, ∝ data); AQE broadcasts it
    while it fits and shuffles both sides on l_partkey beyond that.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#11"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate.

    The equi-key (partkey) is conjunct in every branch, so this stays a
    hash join with the disjunction as a post-join filter — NOT a nested
    loop. (Adapted predicates to fixture columns: brand × size × quantity.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(branch).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS double correlation.

    (Adapted to fixture columns: for 'F' orders, the "blamed" supplier is
    one whose lineitem shipped strictly last — some other supplier shipped
    earlier [EXISTS], and no supplier shipped later [NOT EXISTS].) Both
    correlations become one window max over the order's lineitems — the
    scale-correct rewrite: a single shuffle on l_orderkey instead of two
    correlated self-joins of the fact table.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        li.withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("min_ship", F.min("l_shipdate").over(w))
        .withColumn(
            "n_last",
            F.sum(
                F.when(F.col("l_shipdate") == F.col("max_ship"), 1).otherwise(0)
            ).over(w),
        )
        .filter(
            (F.col("l_shipdate") == F.col("max_ship"))  # nobody shipped later
            & (F.col("n_last") == 1)  # …uniquely
            & (F.col("min_ship") < F.col("max_ship"))  # someone shipped earlier
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
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


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min subquery → per-group window min.

    (Adapted: the fixtures have no partsupp — the supply relation is the
    DISTINCT (l_partkey, l_suppkey) pairs of lineitem, and s_acctbal stands
    in for ps_supplycost.) The correlated ``= (SELECT min ...)`` is one
    window pass over the already-joined supply rows: no second scan, no
    self-join. Region/nation broadcast by hint; the enriched supplier frame
    and the filtered part list join unhinted (both ∝ data — AQE broadcasts
    while small). The only wide shuffles are the part-filtered supply
    DISTINCT and the window repartition on p_partkey. At 100 TB the supply
    pairs would be a bucketed derived table so both drop to zero.
    """
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp_eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    # join the part filter BEFORE the supply DISTINCT: the selective part
    # predicate cuts the distinct's shuffle to the matching rows only —
    # the order that survives a 100 TB lineitem (AQE broadcasts the
    # filtered part list while it fits; no hardcoded hint)
    supply = (
        li.select("l_partkey", "l_suppkey")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .distinct()
    )
    joined = supply.join(
        supp_eu, F.col("l_suppkey") == F.col("s_suppkey")
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a global scalar-subquery threshold.

    (Adapted: value(part) = Σ l_extendedprice·l_quantity over one nation's
    suppliers, standing in for ps_supplycost·ps_availqty.) The global total
    is the re-aggregated per-part result — computed once, broadcast as a
    1-row cross join, never a driver collect. nation broadcasts by hint;
    the one-nation supplier slice joins unhinted (∝ data); lineitem
    shuffles once on l_partkey.
    """
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("raw_value")
        )
    )
    total = per_part.agg(F.sum("raw_value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("raw_value") > 0.001 * F.col("total_value"))
        .select(
            "l_partkey", F.round(F.col("raw_value"), 2).alias("part_value")
        )
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN/EXISTS chain → agg-filter → semi join.

    Suppliers in one nation that shipped > 40 units of some 'small%' part
    in 1997. The inner aggregate groups by (suppkey, partkey); the HAVING
    filter collapses to a distinct supplier set that semi-joins supplier.
    Part list joins into the fact scan unhinted (AQE broadcasts while it
    fits); the only wide shuffle is the
    inner groupBy.
    """
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qualified = (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_1"
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def window_distribution_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-family window functions: NTILE / PERCENT_RANK /
    CUME_DIST / LAG-delta — the remainder of the analytic-window surface
    (`window_rank_orders` covers the ranking family).

    Same scale shape as every window here: one hash exchange on the
    partition key, one in-partition sort serving all four functions at
    once (Spark evaluates same-window functions in a single Window
    operator pass). Full ordering makes every output deterministic.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
        ).alias("delta_prev"),
    )
