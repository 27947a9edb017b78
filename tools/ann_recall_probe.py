"""Order-isolated re-measure of ``ann_recall_report`` (VERDICT r9
finding #1 / ask #2): BENCH_r09 read 3.69 s vs 2.50 s in r8 — 1.48x,
above the documented 1.43x host-tenancy band — with the only
similarity.py diff being memo-build instrumentation (timing wrappers,
zero plan changes). Same protocol as ``tools/winnow_replay_probe.py``
(the r9 resolution of streaming_winnow_replay) and r8's
model_gate_threshold_sweep note: fresh session, the entry's served
index parents warmed by the FIRST call (cold builds attributed
separately via catalog.MEMO_BUILD_LOG), then 7 timed samples, median.

The entry's cost decomposes as (a) the one-time ANN index builds the
recall panels read — IVF centroids + assignment, LSH index, PQ
codebooks + codes — cold only on the first call per (session, sf_dir),
and (b) the per-call recall panel: brute-force truth top-k joined
against each variant's served candidates over the fixed query panel.
Bench's 3-pass median mostly measures (b); an isolated median of (b)
inside ~1.3x of r8's 2.50 s pins the BENCH_r09 reading on set-order /
tenancy (the cold parent build lands on whichever ANN entry runs
first), not a regression.

Usage: python tools/ann_recall_probe.py [sf_dir]
Prints one JSON line {"first_call_s": s, "build": {...},
"samples": [...], "median": s, "host_canary": {...}} — the canary
(tools/host_canary.py, r11) stamps the session's host quiescence into
the artifact itself.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_exercise_spark.catalog import drain_memo_build_log
from kafka_exercise_spark.operators import similarity
from kafka_exercise_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SAMPLES = int(os.environ.get("ANN_PROBE_SAMPLES", "7"))


def main() -> None:
    # host context FIRST (r11: the settling-window convention in code —
    # the r10 probe session this file exists because of read 2x with
    # rising samples right after a multi-JVM sweep); the canary rides
    # in the JSON line so the number carries its own adjudication
    # context
    from tools.host_canary import gate_or_warn

    canary = gate_or_warn("ann_recall_probe")
    spark = get_spark("ann_recall_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    drain_memo_build_log()
    # first call: pays the served index builds (attributed separately)
    t0 = time.perf_counter()
    similarity.ann_recall_report(spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    first = round(time.perf_counter() - t0, 3)
    builds = drain_memo_build_log()
    samples = []
    for _ in range(SAMPLES):
        t0 = time.perf_counter()
        similarity.ann_recall_report(spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        samples.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "sf": SF,
                "first_call_s": first,
                "build": builds,
                "samples": samples,
                "median": round(statistics.median(samples), 3),
                "host_canary": canary,
            }
        )
    )


if __name__ == "__main__":
    main()
