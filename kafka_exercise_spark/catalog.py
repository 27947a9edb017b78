"""Dataset catalog: register parquet tables as named views.

The reference's "catalog" is the Kafka broker's topic namespace plus ksqlDB's
stream/table registry (reference README.md:155-199 `show topics/streams`);
schemas come from Schema Registry. Here the catalog is Spark's own: each
parquet table under a scale-factor directory is registered as a temp view so
both the DataFrame API and ``spark.sql`` resolve it. Schema is read from
parquet footers (columnar, self-describing — strictly stronger than the
reference's registry-inferred Avro).

Scale note: views are lazy — registration reads footers only. Filters and
projections expressed on these views push down to the parquet scan (Catalyst
``PushedFilters`` / ``ReadSchema``), which is what makes a 100 TB scan of a
3-column projection read 3 columns, not 40.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: Columns stored as parquet TIMESTAMP(NANOS); Spark reads them as long
#: (session conf spark.sql.legacy.parquet.nanosAsLong) and we restore
#: TimestampType here with integer division (no double round-trip — epoch
#: nanos exceed 2^53 and would lose precision through a float).
NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy DataFrame over one parquet table, nano-timestamps restored.

    Robust to the caller's session conf: if ``name`` has TIMESTAMP(NANOS)
    columns, ``spark.sql.legacy.parquet.nanosAsLong`` is required for the scan
    itself, so we set it on the fly (it is a static-read conf consulted per
    query, not a session-construction-time conf). The long column is then
    converted JVM-side with integer division — no double round-trip, since
    epoch nanos exceed 2^53.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    # Deterministic semantics regardless of the caller's session: UTC
    # formatting (the reference passes 'UTC' explicitly, README.md:212) and
    # the nanos-as-long read path. Both are runtime-settable SQL confs.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name in NANO_TS_COLUMNS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for col in NANO_TS_COLUMNS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    # Parquet TIMESTAMP(isAdjustedToUTC=false) reads as TIMESTAMP_NTZ, which
    # epoch extractors (unix_millis/unix_micros) and withWatermark reject.
    # With the session tz pinned UTC the instant is unchanged by this cast,
    # and it is a zero-cost metadata projection (no shuffle, no UDF).
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


#: Registry of every served-index/frame memo in the package, with an
#: optional per-value cleanup. All registered memos share one key
#: contract — key[0] is the owning applicationId — so entries belonging
#: to dead applications can be evicted centrally: a long-lived Python
#: process running several Spark sessions otherwise accumulates dead
#: DataFrames, checkpoint RDD references, and tempdirs forever.
_MEMO_REGISTRY: list[tuple[dict, object]] = []


def register_memo(memo: dict, cleanup=None) -> dict:
    """Enroll a memo dict (key[0] MUST be the applicationId) for stale-
    application eviction; ``cleanup(value)`` runs on evicted values (e.g.
    tempdir removal). Returns the dict for inline use."""
    _MEMO_REGISTRY.append((memo, cleanup))
    return memo


def evict_stale_memos(spark: SparkSession) -> None:
    """Drop every registered memo entry owned by an applicationId other
    than the active session's. Called from each memo accessor, so the
    process holds at most one application's worth of served state. Cheap
    when nothing is stale (one dict scan per memo)."""
    app = spark.sparkContext.applicationId
    for memo, cleanup in _MEMO_REGISTRY:
        for k in [k for k in memo if k[0] != app]:
            v = memo.pop(k)
            if cleanup is not None:
                try:
                    cleanup(v)
                except Exception:  # cleanup is best-effort by design
                    pass


#: Append-only log of cold memo builds: {"memo", "seconds"} per build.
#: The scaling harness drains this around each timed run so every rung
#: self-attributes — "slow because the shared pair frame was cold HERE"
#: is recorded instead of adjudicated after the fact (the SCALING_r08
#: lesson: un-attributed super-linear rungs on composition entries).
MEMO_BUILD_LOG: list[dict] = []


def log_memo_build(name: str, seconds: float) -> None:
    """Record one cold memo build. Called by ``memo_frame`` and by the
    ad-hoc served-index memos (LSH pairs, IVF assignment, BPE/perceptron
    fits, …) at their build sites."""
    MEMO_BUILD_LOG.append({"memo": name, "seconds": round(seconds, 3)})


def drain_memo_build_log() -> list[dict]:
    """Return and clear the accumulated build records (harness hook)."""
    out = list(MEMO_BUILD_LOG)
    MEMO_BUILD_LOG.clear()
    return out


def timed_build(name: str, build):
    """Run ``build()``, logging its wall time as a cold memo build —
    the one-liner the ad-hoc memo sites wrap their build call in."""
    t0 = time.perf_counter()
    out = build()
    log_memo_build(name, time.perf_counter() - t0)
    return out


#: Served-frame memo: (applicationId, *key) → materialized DataFrame.
#: The SAME contract as the similarity/dedup index memos — a frame an
#: operator family reads repeatedly is materialized ONCE per session per
#: sf_dir instead of re-persisted (and leaked) on every invocation.
_FRAME_MEMO: dict[tuple, DataFrame] = register_memo({})


def memo_frame(spark: SparkSession, key: tuple, build) -> DataFrame:
    """Materialize ``build()`` once per (application, key) and serve the
    lineage-free checkpoint to every caller.

    ``localCheckpoint`` (eager) both executes the plan and frees callers
    from the source lineage — repeated operator invocations (bench
    passes, verify sweeps, determinism tests) reuse one stored copy
    instead of stacking identical persisted RDDs for the session's
    lifetime. At 100 TB the analog is the materialized index/staging
    table on the lake.

    CONTRACT: the key must uniquely identify the data the builder reads
    within this application — the memo cannot see through a changed
    ``load_table`` or rewritten parquet behind an old key. In tests that
    monkeypatch ``load_table`` with hand frames, use a UNIQUE placeholder
    sf_dir per hand frame (not a shared "x"), or the first test's frame
    is served to the second.
    """
    evict_stale_memos(spark)
    k = (spark.sparkContext.applicationId, *key)
    df = _FRAME_MEMO.get(k)
    if df is None:
        df = timed_build(str(key[0]), lambda: build().localCheckpoint())
        _FRAME_MEMO[k] = df
    return df


def scale_partitions(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Spread a small-file table across the cluster for CPU-heavy per-row ops.

    The fixture tables are single parquet files → a single scan task, which
    serializes regex/hash-heavy operators on one core regardless of cluster
    size. One cheap round-robin shuffle of the raw rows buys full-width
    parallelism. At 100 TB inputs arrive as thousands of files and this is a
    no-op decision — the helper exists for the small-file edge, which also
    shows up in practice as the "last small partition" of a filtered branch.
    """
    return df.repartition(spark.sparkContext.defaultParallelism)


def register_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every table in ``sf_dir`` as a temp view; returns the frames.

    Missing files are skipped so smaller fixture dirs still register.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
