"""Attribute the SemDeDup pair-build's scaling rung (late r8).

SCALING_r08 rings ``dedup_semantic`` at 5.6 / 32.9 / 64.4 s (1×/4×/8×)
— super-linear. The README attributes it to the scale FIXTURE: embeddings
replicate under the FIXED served centroid set, so the same cells fatten
×k and the within-cell self-join does Σ|cell|² ≈ k² candidate work,
whereas a production deployment refits the coarse quantizer as the
corpus grows (k ∝ n keeps E[|cell|] constant → Σ|cell|² ≈ n²/k linear).

This probe makes that attribution measured, not argued: per rung it
prints wall time NEXT TO the quantities the claim is about —

- n_cells / max|cell| / sum|cell|² over the ×k assignment (the join's
  candidate mass: if cells fatten ×k, sum|cell|² steps ×k² — the
  fixture mechanism);
- n_pairs (the operator's OUTPUT: replicated near-identical vectors
  really are k× duplicated, so true pair structure densifies too —
  the work is real, not engine waste).

Wall tracking sum|cell|² (and not worse) is the pass signal: the engine
does the candidate work the geometry defines, nothing superlinear of
its own. Reuses ``scale_experiment.build_scaled`` fixtures.

Usage: python tools/semantic_scale_probe.py   # rungs from
SPARK_GRAFT_SCALE_RUNGS (default 1,4,8,16); one JSON line out.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_exercise_spark.operators import similarity
from kafka_exercise_spark.session import get_spark
from tools.scale_experiment import build_scaled


def main() -> None:
    from tools.host_canary import gate_or_warn  # noqa: PLC0415

    canary = gate_or_warn("semantic_scale_probe")
    spark = get_spark("semantic_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    # warm the query SHAPE on the tiny fixture (codegen; per-dir memos
    # stay cold for the timed dirs)
    similarity.dedup_semantic(
        spark, "/root/testdata/sf0.01"
    ).write.format("noop").mode("overwrite").save()
    rungs = tuple(
        int(x)
        for x in os.environ.get(
            "SPARK_GRAFT_SCALE_RUNGS", "1,4,8,16"
        ).split(",")
    )
    out: dict[str, dict] = {}
    for k in rungs:
        d = build_scaled(spark, k)
        t0 = time.perf_counter()
        pairs = similarity.dedup_semantic(spark, d)
        pairs.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        n_pairs = pairs.count()  # memo-served localCheckpoint: cheap
        assigned, _ = similarity._ivf_assign(spark, d)  # memo-warm
        cells = assigned.groupBy("cell").count()
        stats = cells.agg(
            F.count("*").alias("n_cells"),
            F.max("count").alias("max_cell"),
            F.sum(F.col("count") * F.col("count")).alias("sum_cell_sq"),
        ).first()
        out[f"x{k}"] = {
            "wall_s": wall,
            "n_pairs": int(n_pairs),
            "n_cells": int(stats["n_cells"]),
            "max_cell": int(stats["max_cell"]),
            "sum_cell_sq": int(stats["sum_cell_sq"]),
        }
    out["host_canary"] = canary
    print(json.dumps(out))


if __name__ == "__main__":
    main()
