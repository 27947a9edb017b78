"""Reference-parity operators (SURVEY.md §2.2/§2.3) on the sf0.001 fixtures."""

from __future__ import annotations

import re

from kafka_exercise_spark.operators import pipeline_ops


def test_custstream_pretty_formats(spark, sf_dir):
    df = pipeline_ops.custstream_pretty(spark, sf_dir)
    rows = df.limit(5).collect()
    assert rows
    for r in rows:
        assert re.fullmatch(r"\d{4}-\d{2}-\d{2}", r["dt_event"])
        assert re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}", r["ts_conv"])


def test_select_star_schema(spark, sf_dir):
    df = pipeline_ops.select_star(spark, sf_dir)
    assert df.columns == ["n_nationkey", "n_name", "n_regionkey"]
    assert df.count() == 25


def test_jovens_is_proper_subset(spark, sf_dir):
    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    young = pipeline_ops.jovens(spark, sf_dir)
    n = young.count()
    assert 0 < n < total
    assert young.filter(young.dt_order < pipeline_ops.JOVENS_CUTOFF).count() == 0


def test_idadeclass_binary_partition(spark, sf_dir):
    df = pipeline_ops.idadeclass(spark, sf_dir)
    cats = {r["idadecat"] for r in df.select("idadecat").distinct().collect()}
    assert cats == {"JOVEM", "ADULTO"}
    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert df.count() == total


def test_groupby_count_totals(spark, sf_dir):
    df = pipeline_ops.groupby_count(spark, sf_dir)
    counts = {r["event_type"]: r["contagem"] for r in df.collect()}
    assert sum(counts.values()) == spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_idadecont_window_arithmetic(spark, sf_dir):
    df = pipeline_ops.idadecont(spark, sf_dir)
    rows = df.collect()
    assert sum(r["contagem"] for r in rows) == spark.read.parquet(
        f"{sf_dir}/events.parquet"
    ).count()
    for r in rows[:50]:
        # 30-second alignment: seconds field of start is 0 or 30
        assert r["window_start"].endswith((":00", ":30"))


def test_epoch_wire_roundtrip_matches_typed(spark, sf_dir):
    from pyspark.sql import functions as F

    # jovens_epoch_wire applies the reference's jovens string predicate on
    # the formatted value; apply the same cut to the typed path so equality
    # checks the decode+format round trip itself.
    typed = (
        pipeline_ops.custstream_pretty(spark, sf_dir)
        .select("event_id", "dt_event", "ts_conv")
        .filter(F.col("dt_event") >= "2024-01-10")
    )
    wire = pipeline_ops.jovens_epoch_wire(spark, sf_dir)
    assert wire.count() > 0
    assert typed.exceptAll(wire).count() == 0
    assert wire.exceptAll(typed).count() == 0
