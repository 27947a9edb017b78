"""Attribute the resample_ffill_events scaling step (VERDICT r7 #4).

SCALING_r07 showed ``resample_ffill_events`` stepping 1.45 → 2.92 →
5.10 s at 1×/4×/8× — 3.5× wall at 8×, the steepest non-winnow rung.
Candidate causes, in the order the counters separate them:

- GRID FAN-OUT growth: the operator's output is the per-user hourly
  grid (Σ span+1 over users). build_scaled offsets user ids per copy,
  so spans should replicate and the grid should scale EXACTLY linearly
  — if it doesn't, the fixture densified and the step is data.
- OBSERVED-CELL growth: the pre-grid (user, hour) aggregate's
  cardinality — same argument.
- ENGINE residual: if both counters are linear while wall steps ~2×
  per 2× data, the step is the single-JVM window sort / shuffle under
  heap pressure — the winnow probe's verdict, checked the same way
  (the 24g-heap control is the committed SCALING run itself; a
  128-shuffle-partition control rung rules out partition sizing via
  SPARK_GRAFT_SHUFFLE_PARTITIONS).

Usage: python tools/resample_scale_probe.py   # rungs from
SPARK_GRAFT_SCALE_RUNGS (default 1,8,16); one JSON line out.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_exercise_spark.operators import analytic
from kafka_exercise_spark.session import get_spark
from tools.scale_experiment import build_scaled


def main() -> None:
    from tools.host_canary import gate_or_warn  # noqa: PLC0415

    canary = gate_or_warn("resample_scale_probe")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    spark = get_spark(
        "resample_scale_probe",
        shuffle_partitions=int(shuffle) if shuffle else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    # warm the query SHAPE on the tiny fixture (codegen paths)
    analytic.resample_ffill_events(
        spark, "/root/testdata/sf0.01"
    ).write.format("noop").mode("overwrite").save()
    rungs = tuple(
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_RUNGS", "1,8,16").split(",")
    )
    out: dict[str, dict] = {}
    for k in rungs:
        d = build_scaled(spark, k)
        t0 = time.perf_counter()
        df = analytic.resample_ffill_events(spark, d)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        # post-timing introspection (cheap aggregates over the same
        # inputs): output cardinality = the grid mass, plus the
        # pre-grid observed-cell count and user count
        n_grid = df.count()
        stats = (
            df.agg(
                F.count_distinct("user_id").alias("n_users"),
                F.sum(F.col("observed").cast("long")).alias("n_observed"),
            )
            .collect()[0]
        )
        out[f"x{k}"] = {
            "wall_sec": wall,
            "grid_rows": int(n_grid),
            "observed_cells": int(stats["n_observed"]),
            "n_users": int(stats["n_users"]),
        }
    out["host_canary"] = canary
    print(json.dumps(out))


if __name__ == "__main__":
    main()
