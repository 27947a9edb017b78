"""Per-query optimization probe (r11): isolated timings + formatted plans.

For each named query (default: every query in ``__spark_entry__.queries()``)
this runs the bench's own methodology in ONE fresh session — warm-up, then
N noop-sink samples per query — and writes:

- ``plans/r11/<query>_<tag>.txt``: the ``explain("formatted")`` output
  (the before/after evidence files the round's deliverables require), and
- one JSON line per query on stdout with the samples, median, and plan
  shape facts (exchange count, broadcast joins, python-eval nodes).

Usage::

    python tools/opt_probe.py --tag before [--sf /root/testdata/sf0.1] \
        [--repeats 3] [--no-plans] [query ...]

Timing matches bench.py: the noop sink forces every column of every row
(guide §1.4) and the memo-build log is drained around each sample so cold
shared-frame builds self-attribute instead of polluting the medians.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from kafka_exercise_spark.catalog import drain_memo_build_log  # noqa: E402
from kafka_exercise_spark.plans import (  # noqa: E402
    broadcast_join_count,
    explain_str,
    python_eval_count,
    shuffle_exchange_count,
)
from kafka_exercise_spark.session import get_spark  # noqa: E402

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"),
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("opt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = args.queries or list(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # bench.py's warm-up: JVM/codegen, parquet path, one Python worker per core
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()
    except Exception:  # noqa: BLE001
        pass
    (
        spark.range(spark.sparkContext.defaultParallelism * 4)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    drain_memo_build_log()

    os.makedirs(PLANS_DIR, exist_ok=True)
    for name in names:
        fn = queries[name]
        samples: list[float] = []
        cold: dict[str, float] = {}
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"opt_probe:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 4))
            for c in drain_memo_build_log():
                cold[c["memo"]] = round(cold.get(c["memo"], 0.0) + c["seconds"], 3)
        spark.sparkContext.setJobDescription(None)
        rec = {
            "query": name,
            "median": round(statistics.median(samples), 4),
            "samples": samples,
            "cold_builds": cold,
        }
        if not args.no_plans:
            df = fn(spark, args.sf)
            plan = explain_str(df)
            with open(os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
            rec.update(
                exchanges=shuffle_exchange_count(df),
                bcast=broadcast_join_count(df),
                py=python_eval_count(df),
            )
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
