"""Attribute the winnowing pair-join's scaling step (VERDICT r6 #4).

SCALING_r06 showed ``winnowing_overlap_pairs`` stepping 6.1 s (4x) →
13.5 s (8x) — 2.2× wall for 2× data. Two candidate causes:

- PAIR OUTPUT growth: the scored-pair frame's cardinality scales with
  planted-dup density; if |pairs| itself steps ~2.2×, wall tracking it
  is linear-in-output (benign — the operator's output IS pairs).
- COMPUTE blowup: if |pairs| stays ~2× but wall steps harder, the
  posting self-join's fan-out (bounded by WINNOW_DF_MAX) is
  superlinear and the DF cap needs a lower rung.

This probe extends the rung ladder to 16x and prints, per rung, the
wall time AND the output cardinality plus the df-bounded posting mass
(Σ df² over kept fingerprints — the self-join's actual candidate
count), so the step attributes to data, not guesswork. Reuses
``scale_experiment.build_scaled`` fixtures (vocabulary-renamed copies:
pair structure replicates linearly by construction, so any superlinear
step is the ENGINE's, not the fixture's).

Usage: python tools/winnow_scale_probe.py   # rungs from
SPARK_GRAFT_SCALE_RUNGS (default 1,8,16); one JSON line out.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_exercise_spark.operators import dedup
from kafka_exercise_spark.session import get_spark
from tools.scale_experiment import build_scaled


def main() -> None:
    from tools.host_canary import gate_or_warn  # noqa: PLC0415

    canary = gate_or_warn("winnow_scale_probe")
    spark = get_spark("winnow_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    # warm the query SHAPE on the tiny fixture (codegen; per-dir memos
    # stay cold for the timed dirs)
    dedup.winnowing_overlap_pairs(
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
        df = dedup.winnowing_overlap_pairs(spark, d)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        # post-timing introspection rides the memoized frames (cheap):
        # output cardinality + the posting join's candidate mass
        n_pairs = df.count()
        rare = dedup._winnow_rare_frame(spark, d)
        cand = (
            rare.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .agg(F.sum(F.col("df") * F.col("df")).alias("m"))
            .collect()[0]["m"]
        )
        out[f"x{k}"] = {
            "wall_sec": wall,
            "n_pairs": int(n_pairs),
            "posting_candidates": int(cand),
        }
    out["host_canary"] = canary
    print(json.dumps(out))


if __name__ == "__main__":
    main()
