"""SparkSession factory.

Pins the settings the engine's semantics depend on:

- ``spark.sql.session.timeZone=UTC``: the reference formats timestamps with an
  explicit 'UTC' argument (reference README.md:212, TIMESTAMPTOSTRING(...,
  'UTC')); pinning the session zone makes ``date_format`` reproduce that and
  makes results independent of the host zone.
- AQE on (runtime coalescing, skew-join splitting) — the 100 TB posture: plans
  are declared logically and re-optimized at runtime from real shuffle stats.
- ``spark.sql.shuffle.partitions``: sized for the local harness; on a real
  cluster AQE coalesces or you size ≈ 2-3× total cores. Never hot-loop
  hand-tuned — AQE owns the runtime number.
- Arrow enabled for the few Pandas-UDF code paths (vector ops, multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _default_driver_mem() -> str:
    """Quarter of physical RAM, clamped to [4g, 24g] (whole GiB).

    Falls back to 4g when the host's memory is unreadable (non-Linux /
    restricted sysconf) — the conservative end, never the 24g bench
    setting, so the library default cannot OOM-kill a small host.
    """
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError, AttributeError):
        return "4g"
    quarter_gib = total // (4 * 1024**3)
    return f"{min(24, max(4, quarter_gib))}g"


def get_spark(
    app_name: str = "kafka_exercise_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's pinned semantics."""
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else DEFAULT_CPUS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The driver fixtures store events.ts as parquet TIMESTAMP(NANOS),
        # which Spark has no native type for; read as long and convert in
        # catalog.load_table (nanos -> micros, JVM-side).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate rewrites explode(expr) into
        # Filter(size(expr) > 0 AND isnotnull(expr)) + Generate, evaluating
        # the generator child 2 extra times per input row. For this engine's
        # hot shape — explode over a computed shingle/hash array whose
        # expression tree is the expensive part (tokenize + n-gram + md5) —
        # that filter triples the scan cost (measured 5.45s -> 0.74s on the
        # sf0.1 hashed-shingle explode). The rule only pays when the array
        # is a cheap column read and mostly-empty, which never describes
        # these plans; explode already skips empty arrays by itself.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Whole-stage-codegen compilation cache (r11, guide §1 measure-
        # first): the default cache holds 100 generated classes, keyed by
        # source text. A session running this engine's full registry
        # compiles ~10³ distinct codegen units per sweep, so at the
        # default size every unit is evicted before its next use and
        # EVERY query pays full Janino recompilation on EVERY run —
        # measured on a 60-query sweep ×4 passes: 63.6/97.8/46.2/43.0 s
        # per pass at the default vs 30.4/29.6/32.1/33.3 s at 10k (≈2×
        # faster and the run-to-run jitter collapses). Scale-independent:
        # this is a per-JVM compiled-class cache (a few KB per entry,
        # bounded), not a data-size or core-count tune — a production
        # driver/executor serving a many-query workload wants it equally.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .config("spark.ui.enabled", "false")
        # bucketed/saved tables land outside the repo; override for a real
        # deployment's lake root
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"
            ),
        )
        # Single-JVM local mode: the driver heap IS the cluster. 8g was
        # undersized once the registry passed ~200 queries per bench pass —
        # localCheckpoint memo blocks spilled/evicted under churn and
        # memo-served entries re-read from disk, inflating medians ~13%
        # across the board (measured r7). The default scales with the
        # HOST, not a fixed 24g: a quarter of physical RAM clamped to
        # [4g, 24g], so a 16 GiB laptop gets 4g instead of an OOM-killed
        # JVM while the 128 GiB bench host still gets the full 24g.
        # SPARK_GRAFT_DRIVER_MEM overrides. On a real cluster this knob
        # is per-executor memory and does not exist here.
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
