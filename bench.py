"""Benchmark harness: run the engine's headline queries and print ONE JSON line.

Reads ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Each query is forced end-to-end with the noop
sink (full execution, no driver collect — the same shape a cluster run has).

Per-query wall time swings ±30% between identical runs on a busy host
(GC, page cache, Python-worker reuse), which makes single-shot numbers
useless for round-over-round regression detection — so every query is run
``$SPARK_GRAFT_BENCH_REPEATS`` times (default 3) and the MEDIAN is
reported. Output: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: median_sec}, "repeats": n, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from kafka_exercise_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run() -> dict:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    # Warm-up: JVM/codegen, the parquet scan path, and one Python worker per
    # core (pandas import + Arrow init) — measures queries the way a
    # long-lived cluster runs them, not session cold-start.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    except Exception:  # noqa: BLE001 — warm-up only
        pass
    (
        spark.range(spark.sparkContext.defaultParallelism * 4)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    # No separate per-query JIT-warm pass: with REPEATS >= 3 the first timed
    # pass carries the codegen/JIT cold cost for each shape and the MEDIAN
    # discards it ([cold, warm, warm] -> warm) — one fewer full sweep of
    # wall-clock than warming at sf0.001 separately.
    # Whole-set passes (not per-query back-to-back repeats): consecutive
    # repeats of one query would hit a hot page cache/JIT state unlike what
    # any fresh run sees; interleaving passes keeps each sample honest while
    # the median still cancels host noise.
    samples: dict[str, list[float]] = {name: [] for name in queries}
    for _ in range(REPEATS):
        for name, fn in queries.items():
            t0 = time.perf_counter()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                samples[name].append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001
                print(f"bench: {name} failed: {e}", file=sys.stderr)
                samples[name].append(-1.0)
    timings = {
        name: round(statistics.median(ts), 4) if all(t >= 0 for t in ts) else -1.0
        for name, ts in samples.items()
    }
    m = re.search(r"sf([\d.]+)", SF_DIR)
    out = {
        "metric": "total_query_wall_sec",
        "value": round(sum(t for t in timings.values() if t >= 0), 4),
        "unit": "sec",
        "queries": timings,
        "repeats": REPEATS,
        "sf": float(m.group(1)) if m else None,
    }
    # Reference-comparable throughput: the reference's entire offered load
    # is 2 rows/s (BASELINE.md — Faker generator sleep(0.5)); this engine's
    # windowed-count pipeline replays the full events fixture through REAL
    # StreamExecution in streaming_idadecont_replay, so rows-per-second is
    # directly comparable to that floor.
    t_stream = timings.get("streaming_idadecont_replay", -1.0)
    if t_stream > 0:
        try:
            n_events = (
                spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).count()
            )
            out["stream_rows_per_sec"] = round(n_events / t_stream, 1)
        except Exception:  # noqa: BLE001 — supplementary metric only
            pass
    return out


if __name__ == "__main__":
    print(json.dumps(run()))
