"""Batch MERGE INTO semantics: apply a change batch to a keyed target.

The reference's pipeline continuously upserts operational state (its
JDBC-source → topic → sink loop, /root/reference/README.md:120-180); the
warehouse-side twin is ``MERGE INTO target USING changes`` — the Delta/
Iceberg maintenance statement Spark expresses as one full-outer join with
per-column CASE logic. The streaming analog already exists here
(``upsert_store_sink``, latest-write-wins per key); this is the batch
form with an explicit action audit column, the shape a nightly CDC apply
job takes.

Fixture framing: per-user profiles built from events BEFORE the split
instant are the target; events from AFTER it are the change batch. The
merge emits every resulting row tagged ``insert`` (new key), ``update``
(key in both — counts accumulate, last-observation fields take the
source side), or ``keep`` (untouched target row).

Scale shape: both sides aggregate with map-side combine onto the SAME
user_id key, and the merge itself is ONE full-outer shuffle join on that
key — no second pass, no driver state. Deterministic last-observation
choice via ``max_by`` on the exact (micros, event_id) tuple (the
resample op's trick), so the merge is bit-reproducible and the oracle
replays it with a row_number window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import load_table

#: Change-batch split instant (epoch micros, 2024-01-16 00:00:00 UTC):
#: events before it form the target table, events at/after it the batch.
MERGE_SPLIT_US = 1_705_363_200_000_000


def _profiles(ev: DataFrame) -> DataFrame:
    """Per-user profile: event count + deterministic last observation.

    The single source of truth for the profile definition — the streaming
    CDC apply (streaming/pipeline.py streaming_merge_replay) folds batches
    with EXACTLY this aggregate, and the streamed-equals-batch contract
    depends on the two sides never drifting. ``last_eid`` is the
    tie-break's second component, carried so an incremental consumer can
    continue the same (us, event_id) comparison across batches.
    """
    us = F.unix_micros(F.col("ts"))
    last = F.max_by(
        F.struct("value", "us", "event_id"), F.struct("us", "event_id")
    )
    return (
        ev.select("user_id", "value", us.alias("us"), "event_id")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            last.alias("last"),
            F.min("us").alias("first_us"),
        )
        .select(
            "user_id",
            "n_events",
            F.col("last.value").alias("last_value"),
            F.col("last.us").alias("last_seen_us"),
            F.col("last.event_id").alias("last_eid"),
            "first_us",
        )
    )


def merge_upsert_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE the post-split change batch into the pre-split profile table.

    WHEN MATCHED: n_events accumulates, last_value/last_seen take the
    source side (the batch is strictly later). WHEN NOT MATCHED BY
    TARGET: insert. WHEN NOT MATCHED BY SOURCE: keep. One full-outer
    join on the merge key.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    target = _profiles(ev.where(us < MERGE_SPLIT_US)).select(
        "user_id",
        F.col("n_events").alias("t_n"),
        F.col("last_value").alias("t_v"),
        F.col("last_seen_us").alias("t_us"),
    )
    source = _profiles(ev.where(us >= MERGE_SPLIT_US)).select(
        "user_id",
        F.col("n_events").alias("s_n"),
        F.col("last_value").alias("s_v"),
        F.col("last_seen_us").alias("s_us"),
    )
    m = target.join(source, "user_id", "full_outer")
    in_t = F.col("t_n").isNotNull()
    in_s = F.col("s_n").isNotNull()
    return m.select(
        "user_id",
        (F.coalesce("t_n", F.lit(0)) + F.coalesce("s_n", F.lit(0)))
        .cast("long")
        .alias("n_events"),
        F.when(in_s, F.col("s_v")).otherwise(F.col("t_v")).alias("last_value"),
        F.when(in_s, F.col("s_us")).otherwise(F.col("t_us")).alias("last_seen_us"),
        F.when(in_t & in_s, F.lit("update"))
        .when(in_s, F.lit("insert"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )


def merge_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history apply: the same change batch as
    ``merge_upsert_profiles``, but the target keeps HISTORY — a matched
    key closes its old version and opens a new one instead of updating
    in place. This is the warehouse-side consumer the reference's
    inserts-only CDC capture implies (/root/reference/
    connect_postgres.config:9-14 captures an append stream; the
    dimension its dashboards join against needs validity intervals to
    answer "what did this profile look like when the order shipped").

    Versioning scheme (all exact integers, fully deterministic):

    - matched key → TWO rows: the CLOSED old version
      (``valid_from_us`` = first pre-split event, ``valid_to_us`` =
      the key's first post-split event = the instant the change became
      visible) and the OPEN new version (counts accumulated,
      last-observation fields from the batch, ``valid_to_us`` NULL);
    - batch-only key → one OPEN ``insert`` row;
    - target-only key → one OPEN ``keep`` row (untouched history).

    Scale shape: identical to the flat merge — two map-side-combined
    aggregates onto user_id and ONE full-outer shuffle join; the 1→2 row
    fan-out is a per-row ``explode`` of a 2-element array, map-side, no
    extra shuffle. At 100 TB the SCD2 table is partitioned by
    (is_current, bucket(user_id)) so the close-old/open-new rewrite
    touches only current-partition files.

    Oracle: a UNION ALL of per-action projections over the same
    full-outer join — plain ANSI SQL, value-hash-exact (counts, epoch
    micros, and pass-through doubles only; no float arithmetic).
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    target = _profiles(ev.where(us < MERGE_SPLIT_US)).select(
        "user_id",
        F.col("n_events").alias("t_n"),
        F.col("last_value").alias("t_v"),
        F.col("last_seen_us").alias("t_us"),
        F.col("first_us").alias("t_first"),
    )
    source = _profiles(ev.where(us >= MERGE_SPLIT_US)).select(
        "user_id",
        F.col("n_events").alias("s_n"),
        F.col("last_value").alias("s_v"),
        F.col("last_seen_us").alias("s_us"),
        F.col("first_us").alias("s_first"),
    )
    return scd2_rows(target.join(source, "user_id", "full_outer"))


def scd2_rows(m: DataFrame) -> DataFrame:
    """The SCD2 close/open/insert/keep projection over a joined frame
    with columns (user_id, t_n, t_v, t_us, t_first, s_n, s_v, s_us,
    s_first) — ONE definition shared by the batch apply above and the
    streaming staging-fold replay (streaming/pipeline.py
    streaming_scd2_replay), so the two can never drift."""
    in_t = F.col("t_n").isNotNull()
    in_s = F.col("s_n").isNotNull()
    null_us = F.lit(None).cast("long")

    def version(action, n, v, seen, frm, to):
        return F.struct(
            F.lit(action).alias("action"),
            n.cast("long").alias("n_events"),
            v.alias("last_value"),
            seen.cast("long").alias("last_seen_us"),
            frm.cast("long").alias("valid_from_us"),
            to.cast("long").alias("valid_to_us"),
        )

    closed_old = version(
        "close", F.col("t_n"), F.col("t_v"), F.col("t_us"),
        F.col("t_first"), F.col("s_first"),
    )
    opened_new = version(
        "open", F.col("t_n") + F.col("s_n"), F.col("s_v"), F.col("s_us"),
        F.col("s_first"), null_us,
    )
    inserted = version(
        "insert", F.col("s_n"), F.col("s_v"), F.col("s_us"),
        F.col("s_first"), null_us,
    )
    kept = version(
        "keep", F.col("t_n"), F.col("t_v"), F.col("t_us"),
        F.col("t_first"), null_us,
    )
    rows = (
        F.when(in_t & in_s, F.array(closed_old, opened_new))
        .when(in_s, F.array(inserted))
        .otherwise(F.array(kept))
    )
    # explode in its own select (generators can't nest), fields next
    exploded = m.select("user_id", F.explode(rows).alias("r"))
    return exploded.select(
        "user_id",
        F.col("r.action").alias("action"),
        F.col("r.n_events").alias("n_events"),
        F.col("r.last_value").alias("last_value"),
        F.col("r.last_seen_us").alias("last_seen_us"),
        F.col("r.valid_from_us").alias("valid_from_us"),
        F.col("r.valid_to_us").alias("valid_to_us"),
        F.col("r.valid_to_us").isNull().alias("is_current"),
    )


#: Log-compaction tombstone rule for the fixture changelog: an event whose
#: ``value`` falls below this marks a DELETE of its key — the stand-in for
#: Kafka's null-value tombstone record (the fixture carries no nulls).
TOMBSTONE_BELOW = 2.0


def log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka log-compaction semantics over the events changelog — the
    log-side dual of MERGE INTO: for every key only the LATEST record
    matters, and a key whose latest record is a tombstone disappears
    from the compacted log entirely (kafka.apache.org compaction
    contract; the reference's Connect pipeline lands on compact-style
    keyed topics, /root/reference/connect_postgres.config:9-14).

    Fixture framing: key = (user_id, event_type); records order by the
    exact (unix_micros(ts), event_id) tuple — the same total order every
    CDC op here uses, so compaction is bit-reproducible; a record with
    ``value < TOMBSTONE_BELOW`` stands in for Kafka's null-value
    tombstone. Emitted per SURVIVING key: the latest value/props/ts and
    how many superseded records compaction dropped (the log-shrink
    audit a topic owner reads).

    Scale shape: ONE shuffle on the key, shared by both window
    functions (rank and per-key count — same partitioning, one
    exchange). NB: the count window's presence blocks Spark's
    InferWindowGroupLimit rewrite (it only fires on a Filter directly
    above a lone rank window), so there is no map-side top-1 pruning
    here — dropping the n_superseded audit column would enable it, a
    documented trade. At 100 TB keys partition freely (no global
    order), exactly how broker-side compaction scales by partition.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    # the per-key record count is a SECOND window over the SAME
    # partitioning — it rides the ranked window's exchange instead of
    # paying a groupBy + join-back (measured: 2 exchanges + a broadcast
    # join collapse to the single key shuffle)
    wk = Window.partitionBy("user_id", "event_type")
    ranked = (
        ev.select(
            "user_id", "event_type", "event_id", "value", "props", us.alias("us")
        )
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n_records", F.count("*").over(wk))
    )
    return (
        ranked.filter((F.col("rk") == 1) & (F.col("value") >= TOMBSTONE_BELOW))
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            "value",
            "props",
            F.col("us").alias("last_us"),
            (F.col("n_records") - 1).cast("long").alias("n_superseded"),
        )
    )
