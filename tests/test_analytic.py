"""Semantic + plan checks for the analytic operator layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import load_table
from kafka_exercise_spark.operators import analytic
from kafka_exercise_spark.plans import (
    broadcast_join_count,
    has_cartesian_product,
    python_eval_count,
    shuffle_exchange_count,
)


def test_rollup_levels_sum_consistently(spark, sf_dir):
    # plan facts first, on the uncached frame (a cached relation re-serializes
    # its stored plan into explain output and double-counts exchanges)
    df = analytic.rollup_orders(spark, sf_dir)
    assert shuffle_exchange_count(df) == 1
    assert python_eval_count(df) == 0
    df = df.cache()
    total = df.filter(F.col("gid") == 3).collect()
    per_status = df.filter(F.col("gid") == 1).agg(F.sum("n_orders")).collect()
    assert len(total) == 1
    assert total[0]["n_orders"] == per_status[0][0]
    df.unpersist()


def test_cube_has_all_four_levels(spark, sf_dir):
    gids = {
        r["gid"]
        for r in analytic.cube_events_day(spark, sf_dir).select("gid").distinct().collect()
    }
    assert gids == {0, 1, 2, 3}


def test_approx_aggs_meet_accuracy_contract(spark, sf_dir):
    rows = analytic.approx_aggs_events(spark, sf_dir).collect()
    assert rows
    assert all(r["hll_within_5pct"] for r in rows)
    assert all(r["p50_within_tol"] for r in rows)


def test_asof_join_matches_latest_prior_purchase(spark, sf_dir):
    """Brute-force re-derivation for a sample of error events."""
    events = load_table(spark, sf_dir, "events").cache()
    out = {
        r["event_id"]: (r["asof_event_id"], r["user_id"])
        for r in analytic.asof_join_events(spark, sf_dir).collect()
    }
    errors = events.filter(F.col("event_type") == "error").limit(20).collect()
    purchases = events.filter(F.col("event_type") == "purchase").collect()
    assert out
    for e in errors:
        prior = [
            p
            for p in purchases
            if p["user_id"] == e["user_id"] and p["ts"] <= e["ts"]
        ]
        want = (
            max(prior, key=lambda p: (p["ts"], p["event_id"]))["event_id"]
            if prior
            else None
        )
        assert out[e["event_id"]][0] == want
    events.unpersist()


def test_asof_join_is_single_shuffle(spark, sf_dir):
    df = analytic.asof_join_events(spark, sf_dir)
    # union + window = one hash shuffle on user_id; no join node at all
    assert shuffle_exchange_count(df) == 1
    assert python_eval_count(df) == 0


def test_range_join_broadcasts_tiers(spark, sf_dir):
    df = analytic.range_join_tiers(spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian_product(df)
    n = load_table(spark, sf_dir, "events").count()
    assert df.agg(F.sum("n_events")).collect()[0][0] == n


def test_session_windows_disjoint_per_user(spark, sf_dir):
    rows = analytic.session_window_events(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"])
        )
    assert rows
    for spans in by_user.values():
        spans.sort()
        for (_, prev_end), (nxt_start, _) in zip(spans, spans[1:]):
            # next session starts at/after the previous gap-extended end
            assert nxt_start >= prev_end


def test_sliding_window_double_counts(spark, sf_dir):
    """size/slide = 2 ⇒ every event lands in exactly two windows."""
    df = analytic.sliding_window_events(spark, sf_dir)
    n = load_table(spark, sf_dir, "events").count()
    assert df.agg(F.sum("n_events")).collect()[0][0] == 2 * n


def test_user_event_gaps_single_shuffle_and_exact(spark, sf_dir):
    df = analytic.user_event_gaps(spark, sf_dir)
    # window sort + per-user agg share ONE exchange on user_id; JVM-only
    assert shuffle_exchange_count(df) == 1
    assert python_eval_count(df) == 0
    rows = {r["user_id"]: r for r in df.collect()}
    events = load_table(spark, sf_dir, "events")
    uid = min(rows)
    ts = sorted(
        r["ts"]
        for r in events.filter(F.col("user_id") == uid).select("ts").collect()
    )
    gaps = [
        (b - a).total_seconds() for a, b in zip(ts, ts[1:])
    ]
    got = rows[uid]
    assert got["n_events"] == len(ts)
    assert got["n_gaps"] == len(gaps)
    assert abs(got["max_gap_s"] - max(gaps)) < 1e-3
    assert abs(got["avg_gap_s"] - sum(gaps) / len(gaps)) < 1e-3


def test_funnel_ordered_monotone_and_broadcast(spark, sf_dir):
    df = analytic.funnel_ordered(spark, sf_dir)
    # the shrinking frontier broadcasts into each stage join; events never
    # feeds a cartesian and nothing drops to Python
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)
    assert python_eval_count(df) == 0
    rows = sorted(df.collect(), key=lambda r: r["stage"])
    assert [r["step"] for r in rows] == list(analytic.FUNNEL_STEPS)
    counts = [r["n_users"] for r in rows]
    assert counts[0] >= counts[1] >= counts[2]
    # stage 1 = distinct signup users, by definition
    events = load_table(spark, sf_dir, "events")
    n_signup = (
        events.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert counts[0] == n_signup


def test_retention_cohorts_matrix_invariants(spark, sf_dir):
    """Offset-0 equals cohort size, retention in (0, 1], monotone base facts."""
    rows = analytic.retention_cohorts(spark, sf_dir).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        assert r.week_offset >= 0
        assert 0 < r.retention <= 1.0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r
    n_users_total = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(c[0].n_users for c in by_cohort.values()) == n_users_total
    for cohort, offsets in by_cohort.items():
        base = offsets[0]
        assert base.retention == 1.0, cohort  # everyone is active in week 0
        for off, r in offsets.items():
            assert r.n_users <= base.n_users, (cohort, off)


def test_scd2_versions_tile_time_per_user(spark, sf_dir):
    """Per user: intervals abut exactly (valid_to == next valid_from),
    exactly one open (current) version, counts match the event count."""
    rows = analytic.scd2_user_versions(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert len(rows) == total
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    for user, versions in per_user.items():
        versions.sort(key=lambda r: (r.valid_from, r.event_id))
        assert sum(v.is_current for v in versions) == 1, user
        assert versions[-1].is_current and versions[-1].valid_to is None
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from, (user, a.event_id)


def test_basket_pair_rules_exact_lift(spark):
    """Hand basket set: only the support-2 pair survives, with the exact
    integer lift."""
    from kafka_exercise_spark.operators import market

    rows = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 10), (3, 11)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    orig = market.load_table
    try:
        market.load_table = lambda s, d, n: df
        # unique placeholder dir: basket_pair_rules memoizes per sf_dir
        out = market.basket_pair_rules(spark, "hand-basket").collect()
    finally:
        market.load_table = orig
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.pair_cnt) == (10, 11, 3)
    # lift = n_orders * c_ab / (c_a * c_b) = 3*3/9 = 1.0 -> 1_000_000 ppm
    assert r.lift_ppm == 1_000_000


def test_resample_ffill_grid_and_fill(spark):
    """User with events in hours 0 and 2: the grid holds hour 1 with the
    hour-0 value forward-filled and observed=False."""
    import datetime as dt

    from kafka_exercise_spark.operators import analytic as an

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 7, 1.5),
        (1, base + dt.timedelta(minutes=30), 7, 2.5),
        (2, base + dt.timedelta(hours=2), 7, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    orig = an.load_table
    try:
        an.load_table = lambda s, d, n: df
        out = {r.hour_start_s: r for r in
               an.resample_ffill_events(spark, "x").collect()}
    finally:
        an.load_table = orig
    h0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    assert sorted(out) == [h0, h0 + 3600, h0 + 7200]
    # hour 0: last observation in the hour wins (event_id 1, value 2.5)
    assert out[h0].value_ffill == 2.5 and out[h0].n_events == 2
    assert out[h0].observed is True
    # hour 1: unobserved, forward-filled from hour 0
    assert out[h0 + 3600].value_ffill == 2.5
    assert out[h0 + 3600].observed is False and out[h0 + 3600].n_events == 0
    # hour 2: fresh observation replaces the fill
    assert out[h0 + 7200].value_ffill == 9.0


def test_merge_upsert_emits_all_three_actions(spark):
    """Hand-built split: one user only before (keep), one in both halves
    (update, counts accumulate, source wins last_value), one only after
    (insert)."""
    import datetime as dt

    from kafka_exercise_spark.operators import merge as mg

    split = dt.datetime(2024, 1, 16)
    before, after = split - dt.timedelta(days=1), split + dt.timedelta(days=1)
    rows = [
        (0, before, 1, 1.0),
        (1, before, 2, 2.0),
        (2, after, 2, 3.0),
        (3, after, 2, 4.0),
        (4, after, 3, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    orig = mg.load_table
    try:
        mg.load_table = lambda s, d, n: df
        out = {r.user_id: r for r in
               mg.merge_upsert_profiles(spark, "x").collect()}
    finally:
        mg.load_table = orig
    assert out[1].action == "keep" and out[1].n_events == 1
    assert out[1].last_value == 1.0
    assert out[2].action == "update" and out[2].n_events == 3
    assert out[2].last_value == 4.0  # the batch's latest observation wins
    assert out[3].action == "insert" and out[3].n_events == 1
    assert out[3].last_value == 5.0


def test_resample_floors_pre_epoch_hours(spark):
    """A pre-epoch timestamp must land in the FLOOR hour (-1), not the
    truncate-toward-zero hour (0) — the Spark div vs DuckDB // divergence
    class the repo's sign-split rule exists for."""
    import datetime as dt

    from kafka_exercise_spark.operators import analytic as an

    rows = [
        (0, dt.datetime(1969, 12, 31, 23, 30), 7, 1.0),
        (1, dt.datetime(1970, 1, 1, 0, 30), 7, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    orig = an.load_table
    try:
        an.load_table = lambda s, d, n: df
        hours = sorted(
            r.hour_start_s for r in an.resample_ffill_events(spark, "x").collect()
        )
    finally:
        an.load_table = orig
    assert hours == [-3600, 0]

    # and the ORACLE must floor identically — DuckDB's integer // (like
    # Spark's div) truncates, so the oracle carries the same pmod fold;
    # this is the side the first version of this fix missed
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        "(0::BIGINT, TIMESTAMP '1969-12-31 23:30:00', 7::BIGINT, 1.0), "
        "(1::BIGINT, TIMESTAMP '1970-01-01 00:30:00', 7::BIGINT, 2.0)"
        ") v(event_id, ts, user_id, value)"
    )
    oracle_hours = sorted(
        r[0]
        for r in con.execute(
            "SELECT hour_start_s FROM ("
            + entrymod.oracle_sql()["resample_ffill_events"]
            + ")"
        ).fetchall()
    )
    assert oracle_hours == [-3600, 0]


def test_twa_weighs_by_holding_time_not_count(spark):
    """Value 1.00 held 9 hours then three 10.00 bursts in the last hour:
    arithmetic mean is 7.75, TWA must stay near 1 — weighted by holding
    time. Exact: (100·9h + 1000·0.5h + 1000·0.5h) / 10h = 190 centi."""
    import datetime as dt

    from kafka_exercise_spark.operators import analytic as an

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 7, 1.00),
        (1, t0 + dt.timedelta(hours=9), 7, 10.00),
        (2, t0 + dt.timedelta(hours=9, minutes=30), 7, 10.00),
        (3, t0 + dt.timedelta(hours=10), 7, 10.00),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    orig = an.load_table
    try:
        an.load_table = lambda s, d, n: df
        (r,) = an.twa_value_per_user(spark, "x").collect()
    finally:
        an.load_table = orig
    assert r.n_events == 4 and r.span_s == 36000
    assert r.twa_value == 1.90  # (100*32400 + 1000*3600) / 36000 = 190


def test_rfm_bands_and_segment_rules(spark, sf_dir):
    """Scores are 1-5, band edges apply exactly, and the segment label
    follows the documented r/f rules on every customer."""
    from kafka_exercise_spark.operators import analytic as an

    rows = an.rfm_segments(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5
        assert r.recency_days >= 0 and r.monetary_c > 0
        # recompute the r band from the edges
        want = 1
        for score, edge in zip(range(5, 1, -1), an.RFM_R_EDGES_DAYS):
            if r.recency_days < edge:
                want = score
                break
        assert r.r_score == want, (r.recency_days, r.r_score, want)
        if r.r_score >= 4 and r.f_score >= 4:
            assert r.segment == "champion"
        elif r.r_score <= 2 and r.f_score <= 2:
            assert r.segment == "lost"
    assert {r.segment for r in rows} >= {"regular"}


def test_attribution_credit_conserved_and_models_agree(spark, sf_dir):
    """Credit conservation: linear ppm across channels sums to exactly
    1e6 x n_attributed_conversions; first/last totals equal the same
    count (each attributed conversion has exactly one first and one
    last touch)."""
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.operators import analytic as an

    rows = an.attribution_credit(spark, sf_dir).collect()
    assert rows
    total_first = sum(r.conversions_first for r in rows)
    total_last = sum(r.conversions_last for r in rows)
    total_lin = sum(r.credit_linear_ppm for r in rows)
    assert total_first == total_last
    assert total_lin == total_first * 1_000_000
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    # attributed conversions can't exceed purchases (some may lack touches)
    assert 0 < total_first <= n_purchases


def test_anomaly_scores_flag_a_planted_spike(spark):
    """25 steady hours then a 10x spike hour: only the spike is flagged
    high, with the exact integer ratio; the first 24 hours are unscored
    (no full baseline)."""
    import datetime as dt

    from kafka_exercise_spark.operators import analytic as an

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(26):
        n = 20 if h != 25 else 200
        for i in range(n):
            rows.append(
                (eid, t0 + dt.timedelta(hours=h, minutes=i % 60), 1, 1.0,
                 "click")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, value double,"
        " event_type string",
    )
    orig = an.load_table
    try:
        an.load_table = lambda s, d, n: df
        out = {r.hour_start_s: r for r in
               an.hourly_anomaly_scores(spark, "hand-anomaly").collect()}
    finally:
        an.load_table = orig
    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    # hours 0..23: no full baseline -> unscored, unflagged
    for h in range(24):
        assert out[base + h * 3600].ratio_ppm is None
        assert out[base + h * 3600].flagged is False
    # hour 24: steady vs steady baseline -> exactly 1e6, unflagged
    assert out[base + 24 * 3600].ratio_ppm == 1_000_000
    assert out[base + 24 * 3600].flagged is False
    # hour 25: 200 vs mean 20 -> exactly 10e6, flagged
    assert out[base + 25 * 3600].ratio_ppm == 10_000_000
    assert out[base + 25 * 3600].flagged is True


def test_merge_scd2_versions_and_intervals(spark):
    """SCD2 apply on a hand-built split: matched keys produce a closed
    row whose valid_to equals the new version's valid_from (the key's
    first post-split event); inserts/keeps stay single open rows; the
    open row of a matched key carries the accumulated count."""
    import datetime as dt

    from kafka_exercise_spark.operators import merge as mg

    split = dt.datetime(2024, 1, 16)
    b1 = split - dt.timedelta(days=2)
    b2 = split - dt.timedelta(days=1)
    a1 = split + dt.timedelta(days=1)
    a2 = split + dt.timedelta(days=2)
    rows = [
        (0, b1, 1, 1.0),          # keep-only user
        (1, b1, 2, 2.0),          # matched user, pre half
        (2, b2, 2, 2.5),
        (3, a1, 2, 3.0),          # matched user, post half
        (4, a2, 2, 3.5),
        (5, a1, 3, 5.0),          # insert-only user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    orig = mg.load_table
    try:
        mg.load_table = lambda s, d, n: df
        out = mg.merge_scd2_apply(spark, "scd2-hand").collect()
    finally:
        mg.load_table = orig
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)

    (k,) = by_user[1]
    assert k.action == "keep" and k.is_current and k.valid_to_us is None
    assert k.n_events == 1 and k.last_value == 1.0

    (i,) = by_user[3]
    assert i.action == "insert" and i.is_current and i.valid_to_us is None
    assert i.n_events == 1 and i.last_value == 5.0

    versions = sorted(by_user[2], key=lambda r: r.action)
    close, opened = versions
    assert close.action == "close" and not close.is_current
    assert opened.action == "open" and opened.is_current
    # the close instant IS the open instant: the key's first post-split us
    assert close.valid_to_us == opened.valid_from_us
    import calendar

    a1_us = calendar.timegm(a1.timetuple()) * 1_000_000
    assert opened.valid_from_us == a1_us
    assert close.n_events == 2 and close.last_value == 2.5
    assert opened.n_events == 4 and opened.last_value == 3.5
    assert opened.valid_to_us is None


def test_merge_scd2_consistent_with_flat_merge(spark, sf_dir):
    """The SCD2 current rows must agree with the flat merge row-for-row:
    same per-user count and last observation, action 'update' ≙ 'open'."""
    from kafka_exercise_spark.operators import merge as mg

    flat = {r.user_id: r for r in mg.merge_upsert_profiles(spark, sf_dir).collect()}
    current = {
        r.user_id: r
        for r in mg.merge_scd2_apply(spark, sf_dir).collect()
        if r.is_current
    }
    assert set(flat) == set(current)
    action_map = {"update": "open", "insert": "insert", "keep": "keep"}
    for uid, f in flat.items():
        c = current[uid]
        assert c.n_events == f.n_events
        assert c.last_value == f.last_value
        assert c.last_seen_us == f.last_seen_us
        assert c.action == action_map[f.action]


def test_log_compaction_kafka_contract(spark):
    """The published compaction contract on a hand changelog: (a) only the
    latest record per key survives; (b) a key whose LATEST record is a
    tombstone vanishes even with live earlier records; (c) a record after
    a tombstone resurrects the key; (d) n_superseded counts every dropped
    record, tombstones included."""
    import datetime as dt

    from kafka_exercise_spark.operators import merge as m

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # key (1,'click'): two updates -> latest survives, 1 superseded
        (10, ts(1), 1, "click", 5.0, "a"),
        (11, ts(2), 1, "click", 7.0, "b"),
        # key (2,'view'): update then tombstone LAST -> key vanishes
        (20, ts(1), 2, "view", 9.0, "c"),
        (21, ts(2), 2, "view", 1.0, "d"),
        # key (3,'buy'): tombstone then update -> resurrected, 1 superseded
        (30, ts(1), 3, "buy", 0.5, "e"),
        (31, ts(2), 3, "buy", 4.0, "f"),
        # key (4,'err'): same ts -> event_id breaks the tie
        (40, ts(1), 4, "err", 3.0, "g"),
        (41, ts(1), 4, "err", 6.0, "h"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = m.load_table
    m.load_table = lambda s, d, n: df
    try:
        out = {
            (r.user_id, r.event_type): r
            for r in m.log_compaction(spark, "compact-hand").collect()
        }
    finally:
        m.load_table = orig
    assert set(out) == {(1, "click"), (3, "buy"), (4, "err")}
    assert out[(1, "click")].value == 7.0 and out[(1, "click")].n_superseded == 1
    assert out[(3, "buy")].value == 4.0 and out[(3, "buy")].n_superseded == 1
    r4 = out[(4, "err")]
    assert r4.last_event_id == 41 and r4.value == 6.0 and r4.n_superseded == 1


def test_log_compaction_random_changelogs_match_python(spark):
    """Seeded random changelogs (duplicate keys, ties, tombstones anywhere
    in the sequence) must compact exactly like the trivially-correct
    Python fold: keep the max-(us, event_id) record per key, drop keys
    whose latest record is a tombstone, count supersedes."""
    import datetime as dt
    import random

    from kafka_exercise_spark.operators import merge as m

    rng = random.Random(20240815)
    # tz-AWARE base so the python fold's epoch micros and Spark's
    # UTC-session interpretation agree regardless of the host zone
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    for trial in range(3):
        rows = []
        for eid in range(200):
            rows.append(
                (
                    eid,
                    t0 + dt.timedelta(seconds=rng.randrange(50)),  # many ties
                    rng.randrange(8),
                    rng.choice(["a", "b", "c"]),
                    round(rng.uniform(0.0, 10.0), 2),  # ~20% tombstones
                    f"p{eid}",
                )
            )
        expected = {}
        counts = {}
        for eid, ts, uid, et, v, p in rows:
            us = int(ts.timestamp() * 1_000_000)
            k = (uid, et)
            counts[k] = counts.get(k, 0) + 1
            best = expected.get(k)
            if best is None or (us, eid) > (best[0], best[1]):
                expected[k] = (us, eid, v, p)
        want = {
            k: (eid, v, p, us, counts[k] - 1)
            for k, (us, eid, v, p) in expected.items()
            if v >= m.TOMBSTONE_BELOW
        }
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        orig = m.load_table
        m.load_table = lambda s, d, n: df
        try:
            got = {
                (r.user_id, r.event_type): (
                    r.last_event_id,
                    r.value,
                    r.props,
                    r.last_us,
                    r.n_superseded,
                )
                for r in m.log_compaction(spark, f"rand-{trial}").collect()
            }
        finally:
            m.load_table = orig
        assert got == want, f"trial {trial}"
