"""Analytic operators beyond the reference surface — stage E continued.

The reference's aggregate surface is a single COUNT over one key with one
tumbling window (reference README.md:271-276); SURVEY.md §2.5 lists the
absences. This module adds the analytic layer a warehouse engine is expected
to have — multi-level aggregation (ROLLUP/CUBE), sketch-based approximate
aggregates, statistical aggregates, event-time as-of and range joins, and
session/sliding windows — each expressed as the plan that survives 100 TB:

- ROLLUP/CUBE expand in the partial aggregate (Spark plans an Expand node
  before the shuffle), so the cost is one shuffle regardless of level count.
- Approximate aggregates (HyperLogLog++, KLL-style quantile sketch) are the
  scale path for distinct-count/percentile: fixed-size sketch per partition,
  merged at the driver-free reduce. Their *estimates* are engine-specific, so
  the oracle checks a within-tolerance flag against the exact value instead
  of the raw estimate (the claim under test is the accuracy contract).
- The as-of join is the union + partitioned carry-forward formulation: one
  shuffle on the key, no range explosion, no per-row lookup — the standard
  scalable rewrite of "most recent matching row at or before t".
- The range join broadcasts the tier table (a handful of rows) — a
  BroadcastNestedLoopJoin over an interval predicate, never a cartesian
  against a shuffled side.
- Session windows use Spark's native ``session_window`` (merging state
  machine in the agg operator); sliding windows use ``window(size, slide)``
  (each row expands to size/slide buckets map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSS"
SESSION_GAP = "4 hours"


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority): per-pair, per-status, grand total.

    One Expand + one shuffle; grouping_id disambiguates aggregation level
    (and NULL-valued group keys) exactly like SQL GROUPING().
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
    )


def cube_events_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all four aggregation levels in one pass."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .cube("event_type", "day")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def approx_aggs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates with their accuracy contract as the checked value.

    approx_count_distinct (HyperLogLog++) and percentile_approx are THE
    100 TB forms of COUNT(DISTINCT)/percentile — constant memory, one pass,
    mergeable. Estimates are engine-specific, so the oracle-checkable output
    is (exact value, |estimate − exact| within tolerance): the flag proves
    the sketch ran and met its rsd/accuracy bound, value-hash-stably.
    """
    events = load_table(spark, sf_dir, "events")
    # Two aggs over one scan, joined on the tiny group key, instead of one
    # combined agg: COUNT(DISTINCT) plans an Expand that would push every
    # (doubled) row through percentile_approx's large sketch buffer — the
    # combined form measures ~4-5× slower. The split keeps each aggregate
    # in its natural operator; the join is a broadcast of a few rows.
    counts = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
    )
    pcts = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("p50_exact"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
    )
    agg = counts.join(F.broadcast(pcts), "event_type")
    return agg.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("n_users_approx") - F.col("n_users_exact"))
            <= F.greatest(
                F.ceil(F.col("n_users_exact") * 0.05), F.lit(2)
            )
        ).alias("hll_within_5pct"),
        F.round("p50_exact", 4).alias("p50_exact_r"),
        (F.abs(F.col("p50_approx") - F.col("p50_exact")) <= F.lit(0.5)).alias(
            "p50_within_tol"
        ),
    )


def stats_ext_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment surface: variance, correlation, covariance, median."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object(F.col("props"), "$.k").cast("bigint")
    )
    return events.groupBy("event_type").agg(
        F.round(F.var_samp("value"), 4).alias("var_value"),
        F.round(F.corr("value", "k"), 4).alias("corr_value_k"),
        F.round(F.covar_samp("value", "k"), 4).alias("covar_value_k"),
        F.round(F.expr("percentile(value, 0.5D)"), 4).alias("median_value"),
    )


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event ⟵ the latest same-user purchase at ts ≤ t.

    Spark has no ASOF JOIN operator; the scalable formulation is the sorted
    carry-forward: union both sides, one shuffle on user_id, one in-partition
    sort on (ts, side, event_id), then last(..., ignorenulls) carries the
    most recent purchase forward into each error row. Cost: one shuffle +
    one sort — no range-condition join explosion, no per-row probe. Ties:
    a purchase at exactly the error's ts matches (sorts first); concurrent
    purchases resolve to the highest event_id (the sort's last writer).
    """
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("bigint").alias("p_event_id"),
        F.lit(None).cast("double").alias("p_value"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "p_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = purchases.unionByName(errors).select(
        "user_id",
        "ts",
        "side",
        "event_id",
        F.last("p_event_id", ignorenulls=True).over(w).alias("asof_event_id"),
        F.last("p_value", ignorenulls=True).over(w).alias("asof_value"),
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("ts_str"),
        "asof_event_id",
        F.round("asof_value", 2).alias("asof_value"),
    )


#: (lo, hi, tier) — value ∈ [lo, hi) buckets for the range join.
VALUE_TIERS = (
    (0.0, 2.5, "low"),
    (2.5, 5.0, "mid"),
    (5.0, 7.5, "high"),
    (7.5, 1e18, "extreme"),
)


def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: events banded into broadcast value tiers.

    The tier table is rows-of-constants — broadcast it and the inequality
    join is a per-row scan of 4 intervals (BroadcastNestedLoopJoin), the
    right plan at any fact size. Never shuffle a fact table for an interval
    lookup against a constant-sized dimension.
    """
    events = load_table(spark, sf_dir, "events")
    # inline table built JVM-side (explode of a literal struct array):
    # createDataFrame(list) would plan a parallelized Python relation and
    # pay Python-worker spinup to materialize 4 constant rows
    tiers = (
        spark.range(0, 1, 1, 1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(lo).cast("double").alias("lo"),
                            F.lit(hi).cast("double").alias("hi"),
                            F.lit(t).alias("tier"),
                        )
                        for lo, hi, t in VALUE_TIERS
                    ]
                )
            ).alias("x")
        )
        .select("x.*")
    )
    return (
        events.join(
            F.broadcast(tiers),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
            "inner",
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization with a 4 h inactivity gap (native operator).

    ``session_window`` runs as a merging aggregate: sessions build map-side
    and merge across the one shuffle on (user_id), so state is bounded by
    open sessions, not events — the same operator Structured Streaming uses
    for streaming sessionization. End bound = last event + gap (exclusive).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", TS_FMT).alias("session_start"),
            F.date_format("session_window.end", TS_FMT).alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window count: 60 s windows sliding every 30 s, per type.

    Each row expands to size/slide = 2 window assignments map-side, then one
    grouped count — the overlap factor, not the window count, is the cost
    multiplier, so a 1 h window sliding by 30 min costs the same 2×.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "60 seconds", "30 seconds"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap profile via LAG (analytic window function).

    Beyond-reference op (SURVEY.md §2.5 lists window *functions* as absent):
    for every user, the gap between consecutive events — LAG over
    (PARTITION BY user_id ORDER BY ts, event_id) — reduced to a per-user
    profile (count / mean / max / longest-idle share).

    Scale shape: ONE shuffle on user_id serves both the window sort and the
    final aggregate (the groupBy reuses the window's hash partitioning, so
    Catalyst plans no second exchange). Per-partition state is one sort run
    — no whole-user materialization beyond the sort spill path, so a user
    with billions of events spills rather than OOMs. Gap arithmetic is
    integer micros (``unix_micros``), exact at any scale, formatted to
    seconds only at the edge.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        "user_id",
        (
            F.unix_micros(F.col("ts"))
            - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count("gap_us").alias("n_gaps"),
        F.round(F.avg(F.col("gap_us") / F.lit(1000000.0)), 3).alias("avg_gap_s"),
        F.round(F.max(F.col("gap_us")) / F.lit(1000000.0), 3).alias("max_gap_s"),
    )


#: Ordered funnel stages (event_type values in required order).
FUNNEL_STEPS = ("signup", "view", "purchase")
#: Conversion deadline: stage k must happen within this much of stage k-1.
FUNNEL_WITHIN = "24 hours"


def funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel: signup → view → purchase, each within 24 h.

    A user counts for stage k only if some stage-k event occurs STRICTLY
    AFTER the timestamp that qualified them for stage k-1 and within the
    24 h conversion deadline (the classic ordered-funnel semantics — not
    mere presence of all types; the earliest qualifying event becomes the
    stage-k qualification time).

    Scale shape: each stage is a selective scan (event_type predicate is
    pushed to parquet) aggregated to one row per qualified user — a frontier
    that only shrinks stage over stage. The frontier joins into the next
    stage UNHINTED: AQE broadcasts it while its runtime size fits (the big
    events table then never shuffles — N stages cost N pushed-down scans +
    N broadcast joins + N partial aggregates) and degrades to a shuffled
    join on user_id when it doesn't. The frontier is bounded by |users|,
    which grows with the data — a forced hint would OOM at 100 TB.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )

    def _stage_counts() -> list[DataFrame]:
        frontier = None
        out = []
        for i, step in enumerate(FUNNEL_STEPS):
            stage = events.filter(F.col("event_type") == step)
            if frontier is not None:
                stage = stage.join(frontier, "user_id").filter(
                    (F.col("ts") > F.col("qualified_at"))
                    & (
                        F.col("ts")
                        <= F.col("qualified_at")
                        + F.expr(f"INTERVAL {FUNNEL_WITHIN}")
                    )
                )
            frontier = stage.groupBy("user_id").agg(
                F.min("ts").alias("qualified_at")
            )
            out.append(
                frontier.agg(F.count("*").alias("n_users")).select(
                    F.lit(i + 1).alias("stage"),
                    F.lit(step).alias("step"),
                    "n_users",
                )
            )
        return out

    counts = _stage_counts()
    result = counts[0]
    for c in counts[1:]:
        result = result.unionAll(c)
    return result


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week,
    tracked by how many return in each subsequent week — the standard
    product-analytics rollup a warehouse engine is expected to produce.

    Three hash-partitioned aggregations, each strictly smaller than the
    last: (1) per-user first event (groupBy user_id — one shuffle over
    users, not events, after the map-side partial min), (2) distinct
    (user_id, active_week) pairs, (3) the cohort x offset count. The
    retention denominator (cohort size = offset-0 count, since every user
    is active in their own first week) comes from a window over the final
    ~tens-of-rows matrix, not another pass over events. No step touches
    more than one shuffle of the raw table, so the plan is scan-dominated
    at any corpus size.
    """
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = (
        events.select(
            "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("active_week")
        )
        .distinct()
    )
    matrix = (
        active.join(firsts, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff("active_week", "cohort_week") / 7).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
    cohort_size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_users"))
    ).over(Window.partitionBy("cohort_week"))
    return matrix.select(
        # string form: engine-portable (DATE hashes differently across
        # drivers' dataframe bridges), human-readable in the matrix
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_users",
        F.round(F.col("n_users") / cohort_size, 4).alias("retention"),
    )


def scd2_user_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 intervals from an event stream:
    each event opens a version of its user's state, valid until the user's
    next event — ``valid_from`` / ``valid_to`` / ``is_current`` — the
    standard warehouse shape for "what was true at time t" joins (the
    as-of join above is its query-side twin).

    One window over (user_id, event time): LEAD supplies the closing
    timestamp, the final version per user stays open (NULL + is_current).
    Scale shape is identical to user_event_gaps — one hash shuffle on
    user_id, per-partition sort, no state beyond the sort run. Timestamps
    are emitted as formatted strings so the interval set hashes
    identically across engines.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", TS_FMT).alias("valid_from"),
        F.date_format(nxt, TS_FMT).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


#: Resample bucket: 1 hour, in integer microseconds.
RESAMPLE_BUCKET_US = 3_600_000_000


def resample_ffill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: resample each user's event stream onto
    an hourly grid with forward fill — the gap-free input a downstream
    model or rollup expects (pandas ``resample().ffill()``, expressed as
    distributed relational algebra).

    Three steps, all keyed on ``user_id``:
    1. hourly last-observation: groupBy (user, hour) with ``max_by`` on
       the exact (micros, event_id) tuple — deterministic even under
       same-microsecond ties;
    2. grid: explode ``sequence(min_hour, max_hour)`` per user — the
       fan-out is bounded by the observation span, not the event count;
    3. fill: ``last(value, ignorenulls)`` over an UNBOUNDED-PRECEDING
       window ordered by hour.

    Every stage shuffles on the same user_id-derived key, so Catalyst
    reuses one partitioning across the aggregate, the grid join, and the
    window sort. Hour arithmetic is integer micros (exact everywhere);
    the filled value is a pass-through double — no float math at all.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    hourly = (
        ev.select(
            "user_id",
            # FLOOR division in exact integers: BOTH engines' integer
            # division (Spark `div`, DuckDB `//`) truncates toward zero,
            # which is the wrong bucketing for pre-epoch timestamps — so
            # subtract the non-negative pmod remainder first on BOTH
            # sides: (us − pmod(us, B)) div B is floor for any sign, with
            # zero float involvement (oracle mirrors the same fold)
            F.expr(
                f"(unix_micros(ts) - pmod(unix_micros(ts),"
                f" {RESAMPLE_BUCKET_US})) div {RESAMPLE_BUCKET_US}"
            ).alias("h"),
            "value",
            us.alias("us"),
            "event_id",
        )
        .groupBy("user_id", "h")
        .agg(
            F.max_by("value", F.struct("us", "event_id")).alias("v_obs"),
            F.count("*").alias("n_events"),
        )
    )
    span = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        (F.col("h") * 3600).cast("long").alias("hour_start_s"),
        F.last("v_obs", ignorenulls=True).over(w).alias("value_ffill"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.col("n_events").isNotNull().alias("observed"),
    )


def twa_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user — the right mean for
    irregularly sampled state (a sensor reading, a position, a balance):
    each observation is held until the next one, so it weighs by its
    holding time, not by its count. The arithmetic-mean twin over the
    same data is biased toward bursts; TWA is burst-invariant.

    Exactness: the fixture's values are exact centi-units (2 dp), so
    ``round(value·100)`` is an exact integer in both engines, holding
    times are integer micros via LEAD, and the weighted sum is pure
    64-bit integer arithmetic — Σ centi·Δus stays under 2⁶³ for
    per-user spans up to ~3 years at the fixture's value range; the
    single floor-division at the end is on non-negative operands
    (div ≡ // there). No float accumulates anywhere, so the per-user
    result is bit-identical at any parallelism and in any engine.

    Scale shape: ONE user_id shuffle serves both the LEAD window sort
    and the final aggregate (the groupBy reuses the window's hash
    partitioning) — the same plan contract as ``user_event_gaps``.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seg = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cv"),
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    ).select(
        "user_id",
        "cv",
        (F.lead("us").over(w) - F.col("us")).alias("dus"),
        "us",
        "event_id",
    )
    agg = seg.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("cv") * F.col("dus")).alias("wsum"),
        F.sum("dus").alias("span_us"),
        F.max_by("cv", F.struct("us", "event_id")).alias("last_cv"),
    )
    twa_centi = F.when(
        F.col("span_us") > 0,
        F.expr("(wsum div span_us)"),
    ).otherwise(F.col("last_cv"))
    return agg.select(
        "user_id",
        "n_events",
        (twa_centi / 100.0).alias("twa_value"),
        F.expr(f"span_us div {1_000_000}").alias("span_s"),
    )


#: RFM reference instant (epoch micros, 2001-09-01 UTC — just past the
#: fixture's last order) and the fixed scoring bands. Fixed bands, not
#: within-corpus quantiles: the band edges are part of the segment
#: DEFINITION (comparable across runs and corpora), and quantile
#: interpolation is engine-dependent where fixed edges are exact.
RFM_AS_OF_US = 999_302_400_000_000
RFM_R_EDGES_DAYS = (180, 365, 730, 1460)  # <d → 5,4,3,2 else 1
RFM_F_EDGES = (25, 15, 8, 4)
RFM_M_EDGES_C = (400_000_000, 250_000_000, 120_000_000, 40_000_000)


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic BI serving-layer rollup
    (recency / frequency / monetary with 1-5 scores and named segments)
    over the orders table, in exact integers end to end: recency in whole
    days via integer micros division, monetary in exact centi-currency
    (per-row 0-dp round of identical doubles, then integer sums), scores
    from fixed CASE bands.

    One scan → one groupBy(custkey) with map-side partials; the scoring
    is a map-side projection on the (customer-count-sized) aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    agg = (
        orders.select(
            "o_custkey",
            F.unix_micros(F.col("o_orderdate")).alias("us"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("frequency"),
            F.max("us").alias("last_us"),
            F.sum("cents").alias("monetary_c"),
        )
        .select(
            "o_custkey",
            "frequency",
            F.expr(
                f"({RFM_AS_OF_US} - last_us) div {86_400_000_000}"
            ).alias("recency_days"),
            "monetary_c",
        )
    )

    def band(col: str, edges: tuple, descending: bool) -> F.Column:
        # CASE chain in precedence order, best band first.
        # descending=True: smaller value -> higher score (recency).
        out = None
        for score, edge in zip(range(5, 1, -1), edges):
            cond = (
                F.col(col) < edge if descending else F.col(col) >= edge
            )
            out = (
                F.when(cond, F.lit(score))
                if out is None
                else out.when(cond, F.lit(score))
            )
        return out.otherwise(F.lit(1))

    r = band("recency_days", RFM_R_EDGES_DAYS, descending=True)
    f = band("frequency", RFM_F_EDGES, descending=False)
    m = band("monetary_c", RFM_M_EDGES_C, descending=False)
    scored = agg.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_c",
        r.cast("long").alias("r_score"),
        f.cast("long").alias("f_score"),
        m.cast("long").alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion"
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "new")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "lost")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg)


#: Attribution lookback: touches within this window before a conversion
#: get credit (micros).
ATTR_LOOKBACK_US = 7 * 86_400_000_000
#: Touch channels eligible for credit.
ATTR_TOUCH_TYPES = ("click", "view", "signup")


def attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: distribute each purchase's conversion
    credit over the user's touch events (click/view/signup) in the
    7-day lookback, under the three classic models at once — first-touch,
    last-touch, and linear — rolled up per channel.

    Linear credit is exact integers: each conversion splits 10⁶ ppm as
    ``10⁶ div k`` per touch with the remainder assigned to the LAST touch
    (deterministic, sums to exactly 10⁶ per conversion), so per-channel
    sums are engine-exact — no float shares.

    Scale shape: ONE user-keyed join bounded by the lookback (touch state
    a purchase can reach is ≤ one window of events — the same bound a
    streaming interval join would enforce with a watermark), then
    per-conversion ranking windows partitioned by purchase id, then a
    channel rollup bounded by the channel domain.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("u"),
        F.unix_micros(F.col("ts")).alias("conv_us"),
    )
    touches = ev.where(
        F.col("event_type").isin(list(ATTR_TOUCH_TYPES))
    ).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.unix_micros(F.col("ts")).alias("touch_us"),
    )
    joined = purchases.join(
        touches,
        (purchases.u == touches.user_id)
        & (touches.touch_us < purchases.conv_us)
        & (touches.touch_us >= purchases.conv_us - ATTR_LOOKBACK_US),
    )
    w_first = Window.partitionBy("conv_id").orderBy(
        F.col("touch_us").asc(), F.col("touch_id").asc()
    )
    w_last = Window.partitionBy("conv_id").orderBy(
        F.col("touch_us").desc(), F.col("touch_id").desc()
    )
    ranked = joined.select(
        "conv_id",
        "channel",
        F.row_number().over(w_first).alias("rk_first"),
        F.row_number().over(w_last).alias("rk_last"),
        F.count("*").over(Window.partitionBy("conv_id")).alias("k"),
    )
    linear = F.expr("1000000 div k") + F.when(
        F.col("rk_last") == 1, F.expr("1000000 - k * (1000000 div k)")
    ).otherwise(F.lit(0))
    return (
        ranked.select(
            "channel",
            (F.col("rk_first") == 1).cast("long").alias("first_c"),
            (F.col("rk_last") == 1).cast("long").alias("last_c"),
            linear.alias("lin_ppm"),
        )
        .groupBy("channel")
        .agg(
            F.sum("first_c").alias("conversions_first"),
            F.sum("last_c").alias("conversions_last"),
            F.sum("lin_ppm").alias("credit_linear_ppm"),
        )
    )


#: Anomaly trailing baseline: previous W complete hours.
ANOM_TRAIL_HOURS = 24
#: Flag thresholds on the count-vs-baseline ratio (ppm of the mean).
ANOM_HI_PPM = 2_000_000
ANOM_LO_PPM = 500_000


def hourly_anomaly_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitor: each (event_type, hour)'s count scored
    against the trailing-``ANOM_TRAIL_HOURS`` baseline — the pipeline
    health check that catches a dying producer (volume collapse) or a
    runaway loop (volume spike) before they poison downstream state.

    Exact integers end to end: hour buckets by the pmod-subtraction
    integer FLOOR fold (pre-epoch-safe, same grid as resample_ffill),
    counts are counts, and the score is ``cnt·W·10⁶ div Σ_prev`` — the
    ratio of the count to the trailing MEAN in ppm, computed as one
    integer division (never a float mean). Hours without a full trailing
    window are emitted unscored (NULL score, not flagged) rather than
    scored against a partial baseline.

    Scale shape: one groupBy(type, hour) with map-side combine, then a
    per-type window over the (types × hours)-sized count frame — the
    window input is the AGGREGATE, not the events.
    """
    ev = load_table(spark, sf_dir, "events")
    hours = ev.select(
        "event_type",
        # same pmod-subtraction FLOOR fold as resample_ffill_events: a
        # bare `div` truncates toward zero, which would collapse hours
        # −1 and 0 for pre-epoch events and desync this op's hour grid
        # from the other time-series entries (oracle mirrors the fold)
        F.expr(
            "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000))"
            " div 3600000000"
        ).alias("h"),
    ).groupBy("event_type", "h").agg(F.count("*").alias("cnt"))
    # RANGE, not ROWS: an hour with zero events is ABSENT from the count
    # frame, and a rows-window would silently stretch the baseline across
    # the gap; range over the hour number keeps the window a true 24
    # clock-hours, and trail_n == W requires every one observed
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rangeBetween(-ANOM_TRAIL_HOURS, -1)
    )
    scored = hours.select(
        "event_type",
        (F.col("h") * 3600).cast("long").alias("hour_start_s"),
        "cnt",
        F.sum("cnt").over(w).alias("trail_sum"),
        F.count("cnt").over(w).alias("trail_n"),
    ).select(
        "event_type",
        "hour_start_s",
        "cnt",
        F.when(
            F.col("trail_n") == ANOM_TRAIL_HOURS,
            F.expr(f"(cnt * {ANOM_TRAIL_HOURS} * 1000000) div trail_sum"),
        ).alias("ratio_ppm"),
    )
    return scored.withColumn(
        "flagged",
        F.coalesce(
            (F.col("ratio_ppm") > ANOM_HI_PPM)
            | (F.col("ratio_ppm") < ANOM_LO_PPM),
            F.lit(False),
        ),
    )
