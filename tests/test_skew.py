"""Salted operators: result equivalence with the unsalted forms, and the
distribution property salting exists to provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import load_table
from kafka_exercise_spark.operators import skew


def _skewed_frame(spark, n=20_000):
    """90% of rows share one key — the shape AQE alone can't rebalance for
    a single aggregation key."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("cold_"), F.col("id") % 100)
        ).alias("k"),
        # high-cardinality value column — also the salt source (salting
        # needs a column whose hash spreads the hot key's rows)
        (F.col("id") * 1.0 + 0.25).alias("v"),
        F.col("id").alias("row_id"),
    )


def test_salted_count_equals_plain(spark):
    df = _skewed_frame(spark)
    salted = {
        (r["k"], r["n_rows"], r["sum_value"])
        for r in skew.salted_count(df, "k", "v").collect()
    }
    plain = {
        (r["k"], r["n_rows"], r["sum_value"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n_rows"), F.sum("v").alias("sum_value"))
        .collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    df = _skewed_frame(spark)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("v")), F.lit(skew.N_SALTS))
    )
    per_salt = (
        salted.filter(F.col("k") == "hot")
        .groupBy("_salt")
        .count()
        .collect()
    )
    # the hot key must occupy every salt bucket, none dominating
    assert len(per_salt) == skew.N_SALTS
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 2 * min(counts)


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .count()
    )
    salted = (
        skew.salted_join(
            orders, cust, "o_custkey", "c_custkey", fact_salt_col="o_orderkey"
        )
        .groupBy("c_custkey")
        .count()
    )
    a = {(r["c_custkey"], r["count"]) for r in plain.collect()}
    b = {(r["c_custkey"], r["count"]) for r in salted.collect()}
    assert a == b


def test_skew_census_flags_the_hot_key(spark):
    """A 10x-over-represented key must rank first with skew ratio ~n/keys
    over uniform; a uniform column reports ~1e6 ratios."""
    from pyspark.sql import functions as F

    from kafka_exercise_spark.operators import skew as sk

    rows = [(i, 999 if i < 90 else i, "t" + str(i % 2)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    orig = sk.load_table
    try:
        sk.load_table = lambda s, d, n: df
        out = sk.skew_key_census(spark, "x").collect()
    finally:
        sk.load_table = orig
    top_user = [r for r in out if r.key_column == "user_id" and r.rnk == 1][0]
    assert top_user.key == "999" and top_user.cnt == 90
    assert top_user.share_ppm == 900_000
    # 90/100 rows over 11 distinct keys -> 9.9e6 ppm (≈10x uniform)
    assert top_user.skew_ratio_ppm == 9_900_000
    et = [r for r in out if r.key_column == "event_type"]
    assert all(900_000 <= r.skew_ratio_ppm <= 1_100_000 for r in et)
