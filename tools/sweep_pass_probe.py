"""Whole-set pass-total probe (r12): the codegen-cache A/B harness.

VERDICT r11 ask #8: re-confirm the 10k codegen-cache win in a
driver-shaped run at the FULL 233-query registry. The effect under test
is cross-query cache eviction, so per-query isolated repeats (opt_probe)
cannot see it — only whole-set interleaved passes can, which is exactly
the bench's own loop. This tool reuses the bench methodology (same
warm-up, same noop sink, same memo-drain) but records the TOTAL of each
pass instead of per-query medians, because the claim is pass-level
("every pass pays recompilation" vs "first pass compiles, later passes
reuse").

Run it twice in FRESH processes (the JVM conf is pinned at session
start):

    python tools/sweep_pass_probe.py --passes 4 \
        --conf spark.sql.codegen.cache.maxEntries=100
    python tools/sweep_pass_probe.py --passes 4 \
        --conf spark.sql.codegen.cache.maxEntries=10000

Prints one JSON line: conf overrides, per-pass totals, per-pass
per-query breakdown path (written next to this file for adjudication).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from kafka_exercise_spark.catalog import drain_memo_build_log  # noqa: E402
from kafka_exercise_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--out", default=None, help="per-pass per-query JSON path")
    args = ap.parse_args()

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_spark("sweep_pass_probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    # fail loudly if getOrCreate silently ignored an override (pre-existing
    # session in this process) — the A/B is void then
    for k, v in extra.items():
        got = spark.conf.get(k)
        if got != v:
            print(f"conf {k}={got!r}, wanted {v!r} — stale session?", file=sys.stderr)
            return 2

    queries = entrymod.queries()
    # bench.py's warm-up, verbatim
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

    pass_totals: list[float] = []
    per_pass: list[dict[str, float]] = []
    for i in range(args.passes):
        t_pass = 0.0
        row: dict[str, float] = {}
        for name, fn in queries.items():
            spark.sparkContext.setJobDescription(f"pass{i}:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            t_pass += dt
            row[name] = round(dt, 4)
            drain_memo_build_log()
        spark.sparkContext.setJobDescription(None)
        pass_totals.append(round(t_pass, 2))
        per_pass.append(row)
        print(
            json.dumps({"pass": i, "total_s": pass_totals[-1]}),
            file=sys.stderr,
            flush=True,
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"conf": extra, "per_pass": per_pass}, f, indent=1)
    print(
        json.dumps(
            {
                "conf": extra,
                "n_queries": len(queries),
                "pass_totals_s": pass_totals,
                "detail": args.out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
