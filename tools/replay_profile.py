"""Per-batch StreamExecution profile for the bounded replay entries (r12).

Wraps ``stateful.await_bounded`` so each replay's ``recentProgress`` is
captured after termination, then runs the named replay entries once (plus
an optional repeat) and prints, per micro-batch: input rows and the
durationMs breakdown (addBatch / queryPlanning / commitOffsets /
walCommit / latestOffset) — the evidence VERDICT r11 ask #3 wants before
touching the replay harness.

Usage: python tools/replay_profile.py [--repeats 2] [entry ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from kafka_exercise_spark.session import get_spark  # noqa: E402
from kafka_exercise_spark.streaming import stateful  # noqa: E402

#: The replay entries that re-execute their StreamExecution run on every
#: bench pass (the non-MEMO_SERVED set, bench.py's list).
DEFAULT_ENTRIES = [
    "streaming_idadecont_replay",
    "streaming_user_state_replay",
    "streaming_dedup_replay",
    "streaming_neardup_replay",
    "streaming_enrich_replay",
    "streaming_winnow_replay",
    "streaming_session_replay",
    "streaming_join_replay",
]

CAPTURED: list[tuple[str, list[dict]]] = []

_orig_await = stateful.await_bounded


def _patched_await(query, *, name=None, timeout_s=stateful.REPLAY_TIMEOUT_S):
    _orig_await(query, name=name, timeout_s=timeout_s)
    prog = [json.loads(p.json) for p in query.recentProgress]
    CAPTURED.append((name or query.name or "<unnamed>", prog))


stateful.await_bounded = _patched_await


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("entries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("replay_profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = args.entries or [n for n in DEFAULT_ENTRIES if n in queries]

    # bench warm-up (short form): JVM + python workers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.range(spark.sparkContext.defaultParallelism * 4)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    for name in names:
        fn = queries[name]
        for rep in range(args.repeats):
            CAPTURED.clear()
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 3)
            batches = []
            for qname, prog in CAPTURED:
                for p in prog:
                    batches.append(
                        {
                            "q": qname,
                            "batch": p.get("batchId"),
                            "rows": p.get("numInputRows"),
                            "durationMs": p.get("durationMs"),
                        }
                    )
            print(
                json.dumps(
                    {"entry": name, "rep": rep, "wall_s": wall, "batches": batches}
                ),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
