"""Stage-E relational operators (SURVEY.md §2.5 beyond-reference surface)."""

from __future__ import annotations

from kafka_exercise_spark.operators import relational


def test_q1_groups_and_totals(spark, sf_dir):
    rows = relational.q1_pricing_summary(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 6  # |returnflag| x |linestatus|
    for r in rows:
        assert r["count_order"] > 0
        assert r["sum_disc_price"] <= r["sum_base_price"]
        assert r["sum_charge"] >= r["sum_disc_price"]


def test_q3_topk_ordering(spark, sf_dir):
    rows = relational.q3_shipping_priority(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q5_revenue_positive(spark, sf_dir):
    rows = relational.q5_local_supplier(spark, sf_dir).collect()
    for r in rows:
        assert r["revenue"] > 0


def test_join_customer_orders_conservation(spark, sf_dir):
    df = relational.join_customer_orders(spark, sf_dir)
    total = df.groupBy().sum("n_orders").collect()[0][0]
    assert total == spark.read.parquet(f"{sf_dir}/orders.parquet").count()


def test_sort_topk_is_global_max(spark, sf_dir):
    rows = relational.sort_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    top = spark.read.parquet(f"{sf_dir}/orders.parquet").agg(
        {"o_totalprice": "max"}
    ).collect()[0][0]
    assert rows[0]["o_totalprice"] == top


def test_set_ops_surplus_counts(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rows = relational.set_ops_nations(spark, sf_dir).collect()
    # surplus for one spot-checked nation = customers - suppliers there
    nk = rows[0]["nationkey"]
    c = cust.filter(cust.c_nationkey == nk).count()
    s = supp.filter(supp.s_nationkey == nk).count()
    assert rows[0]["surplus"] == c - s


def test_semi_anti_partition_customers(spark, sf_dir):
    rows = {r["bucket"]: r["n_customers"] for r in
            relational.semi_anti_join(spark, sf_dir).collect()}
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(rows.values()) == n_cust
    assert rows.get("with_orders", 0) > 0


def test_window_rank_bounded(spark, sf_dir):
    df = relational.window_rank_orders(spark, sf_dir)
    assert df.filter(df.rn > 3).count() == 0
    first = df.filter(df.rn == 1)
    assert first.count() == df.select("o_custkey").distinct().count()


def test_json_extract_values(spark, sf_dir):
    rows = relational.json_extract_events(spark, sf_dir).collect()
    assert rows and all(r["max_k"] is not None for r in rows)


def test_agg_stats_sanity(spark, sf_dir):
    for r in relational.agg_stats_events(spark, sf_dir).collect():
        assert r["min_value"] <= r["avg_value"] <= r["max_value"]
        assert r["n_users"] > 0


def test_outer_join_keeps_both_sides(spark, sf_dir):
    rows = relational.outer_join_customers_orders(spark, sf_dir).collect()
    # unmatched customers (no P orders) and unmatched order-groups
    # (non-AUTOMOBILE customers) must both survive
    assert any(r["n_orders"] is None for r in rows)
    assert any(r["c_name"] is None for r in rows)
    assert all(r["custkey"] is not None for r in rows)


def test_pivot_counts_sum_to_total(spark, sf_dir):
    from pyspark.sql import functions as F

    df = relational.pivot_orders_status(spark, sf_dir)
    total = df.agg(
        F.sum(F.coalesce("n_f", F.lit(0))
              + F.coalesce("n_o", F.lit(0))
              + F.coalesce("n_p", F.lit(0)))
    ).collect()[0][0]
    assert total == spark.read.parquet(f"{sf_dir}/orders.parquet").count()


def test_unpivot_is_3x_types(spark, sf_dir):
    df = relational.unpivot_event_stats(spark, sf_dir)
    n_types = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type").distinct().count()
    )
    assert df.count() == 3 * n_types


def test_grouping_sets_has_exactly_two_levels(spark, sf_dir):
    gids = {
        r["gid"]
        for r in relational.grouping_sets_orders(spark, sf_dir)
        .select("gid").distinct().collect()
    }
    assert gids == {1, 2}


def test_window_distribution_functions(spark, sf_dir):
    """ntile partitions are balanced; percent_rank/cume_dist bounded; one
    shuffle serves all four same-window functions."""
    from kafka_exercise_spark.plans import python_eval_count, shuffle_exchange_count

    df = relational.window_distribution_orders(spark, sf_dir)
    assert shuffle_exchange_count(df) == 1
    assert python_eval_count(df) == 0
    rows = df.collect()
    assert rows
    per_cust: dict = {}
    for r in rows:
        assert 1 <= r.quartile <= 4
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0.0 < r.cume <= 1.0
        per_cust.setdefault(r.o_custkey, []).append(r)
    for cust, rs in per_cust.items():
        sizes = [sum(1 for r in rs if r.quartile == q) for q in (1, 2, 3, 4)]
        present = [s for s in sizes if s > 0]
        # ntile balance: bucket sizes differ by at most one
        assert max(present) - min(present) <= 1, cust
        # first row in order has no predecessor
        first = min(rs, key=lambda r: (r.o_totalprice, r.o_orderkey))
        assert first.delta_prev is None, cust
