"""State-store tuning for bounded replay runs vs 24/7 deployments.

Structured Streaming reads ``spark.sql.shuffle.partitions`` and the state
store provider at QUERY START and pins them for the query's life. The right
values differ by deployment shape:

- **24/7 production** (PipelineManager path): session defaults — wide state
  partitioning (state must parallelize across executors and survive key-set
  growth) and the RocksDB provider (changelog checkpointing, state > heap).
- **Bounded replays** (driver-contract entries, tests): per-key state is
  tiny and the run lasts seconds, so the fixed costs dominate: every state
  partition × every stateful operator instantiates a native RocksDB store
  (a stream-stream join alone keeps FOUR stores per partition). 32
  partitions × RocksDB measures 2-4× slower than 8 × HDFS-backed on the
  same replay. The HDFS-backed provider is an in-heap map + checkpoint file
  — exactly right for megabyte-scale state.

``bounded_replay_conf`` applies the replay profile for the duration of one
query and restores the session afterwards.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

BOUNDED_REPLAY_CONF = {
    "spark.sql.shuffle.partitions": "8",
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
}


@contextmanager
def bounded_replay_conf(spark: SparkSession):
    """Temporarily apply the bounded-replay state profile (see module doc).

    Safe to restore right after ``awaitTermination``: streaming queries
    capture these confs at start.
    """
    saved: dict[str, str | None] = {}
    for k, v in BOUNDED_REPLAY_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
