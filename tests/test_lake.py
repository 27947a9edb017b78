"""Lake layout contracts: partition pruning and bucketed co-location.

These are plan-shape guarantees — the properties that turn a 100 TB scan
into a pruned scan and delete the shuffle from fact-fact joins.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import load_table
from kafka_exercise_spark.plans import (
    partition_filters,
    shuffle_exchange_count,
)
from kafka_exercise_spark.sources import lake


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="lake_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_prunes_directories(spark, sf_dir, workdir):
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = os.path.join(workdir, "events_by_day")
    lake.write_partitioned(events, path, ["day"])

    back = spark.read.parquet(path)
    one_day = back.filter(F.col("day") == "2024-01-05")

    # the day predicate must prune at the directory level, not post-scan
    pf = partition_filters(one_day)
    assert pf and any("day" in f and "2024-01-05" in f for f in pf)
    # and the data round-trips exactly
    want = events.filter(F.col("day") == "2024-01-05").count()
    assert one_day.count() == want
    assert want > 0


def test_partitioned_layout_lists_partition_dirs(spark, sf_dir, workdir):
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = os.path.join(workdir, "events_by_day")
    lake.write_partitioned(events, path, ["day"])
    days = sorted(d for d in os.listdir(path) if d.startswith("day="))
    want = events.select("day").distinct().count()
    assert len(days) == want


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Same key, same bucket count ⇒ the join plans ZERO exchanges."""
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_li = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    try:
        lake.write_bucketed(
            load_table(spark, sf_dir, "orders"),
            t_orders,
            "o_orderkey",
            n_buckets=8,
            sort_col="o_orderkey",
        )
        lake.write_bucketed(
            load_table(spark, sf_dir, "lineitem"),
            t_li,
            "l_orderkey",
            n_buckets=8,
            sort_col="l_orderkey",
        )
        o = lake.read_table(spark, t_orders)
        li = lake.read_table(spark, t_li)
        # merge hint pins SMJ so the proof isn't muddied by a broadcast
        joined = li.hint("merge").join(
            o, li.l_orderkey == o.o_orderkey
        ).select("l_orderkey", "l_quantity", "o_totalprice")
        assert shuffle_exchange_count(joined) == 0
        # co-located result ≡ plain join
        plain = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == plain
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")


def test_bucketed_aggregation_is_shuffle_free(spark, sf_dir):
    """groupBy on the bucket key needs no exchange either."""
    suffix = uuid.uuid4().hex[:8]
    t = f"orders_agg_b_{suffix}"
    try:
        lake.write_bucketed(
            load_table(spark, sf_dir, "orders"), t, "o_custkey", n_buckets=8
        )
        agg = (
            lake.read_table(spark, t)
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"))
        )
        assert shuffle_exchange_count(agg) == 0
        assert agg.count() == (
            load_table(spark, sf_dir, "orders")
            .select("o_custkey")
            .distinct()
            .count()
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_compact_landing_collapses_small_files(spark, sf_dir, tmp_path):
    """flush.size=10 landings compact to ceil(rows/target) files with
    identical content — the mandatory second stage behind the reference's
    10-record sink files."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    path = str(tmp_path / "landing")
    # simulate the reference sink: many 10-record files
    events.repartition(4).write.option("maxRecordsPerFile", 10).parquet(path)
    n_rows = events.count()
    before, after = lake.compact_landing(spark, path, target_records_per_file=500)
    assert before > after
    assert after == -(-n_rows // 500)
    compacted = spark.read.parquet(path)
    assert compacted.count() == n_rows
    assert compacted.exceptAll(events).count() == 0


def test_compact_landing_recovers_from_mid_swap_crash(spark, sf_dir, tmp_path):
    """A crash between the swap renames leaves <path>.old holding the data
    and path missing; the next run restores and completes."""
    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    path = str(tmp_path / "landing")
    events.repartition(2).write.option("maxRecordsPerFile", 10).parquet(path)
    n_rows = events.count()
    os.rename(path, path + ".old")  # simulated mid-swap crash state
    before, after = lake.compact_landing(spark, path, target_records_per_file=500)
    assert spark.read.parquet(path).count() == n_rows
    assert after == -(-n_rows // 500)
    assert not os.path.exists(path + ".old")
    assert not os.path.exists(path + ".staging")
