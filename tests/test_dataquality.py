"""Declarative DQ expectations: one-agg-pass compilation + gate semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_exercise_spark.operators import dataquality
from kafka_exercise_spark.plans import python_eval_count, shuffle_exchange_count


def _dirty(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 900.0),  # out of range
            (2, "c", 20.0),  # duplicate key
            (4, None, 30.0),  # null category
        ],
        "id long, cat string, v double",
    )


def test_suite_detects_violations_with_exact_metrics(spark):
    report = (
        dataquality.ExpectationSuite("t")
        .non_empty()
        .completeness("cat")
        .uniqueness("id")
        .between("v", 0.0, 100.0)
        .in_set("cat", ["a", "b", "c"])
        .run(_dirty(spark))
    )
    rows = {r.check_name: r for r in report.collect()}
    assert rows["non_empty"].passed
    assert rows["completeness(cat)"].metric == 0.75
    assert not rows["completeness(cat)"].passed
    assert rows["uniqueness(id)"].metric == 0.75
    assert rows["between(v,0.0,100.0)"].metric == 0.75
    # tolerant threshold turns the same metric into a pass
    relaxed = (
        dataquality.ExpectationSuite("t")
        .completeness("cat", at_least=0.7)
        .run(_dirty(spark))
        .first()
    )
    assert relaxed.passed


def test_suite_is_one_pass_and_jvm_side(spark):
    df = _dirty(spark)
    report = (
        dataquality.ExpectationSuite("t")
        .completeness("cat")
        .between("v", 0.0, 100.0)
        .in_set("cat", ["a"])
        .run(df)
    )
    assert python_eval_count(report) == 0
    # no distinct check → single two-phase scalar aggregate (1 exchange)
    assert shuffle_exchange_count(report) == 1
    # the whole N-check suite is one job over one scan
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 1


def test_empty_frame_fails_closed(spark):
    empty = spark.createDataFrame([], "id long, cat string")
    rows = {
        r.check_name: r
        for r in dataquality.ExpectationSuite("t")
        .non_empty()
        .completeness("cat")
        .run(empty)
        .collect()
    }
    assert not rows["non_empty"].passed
    assert rows["completeness(cat)"].metric == 0.0
    assert not rows["completeness(cat)"].passed


def test_dq_report_fixture_gate(spark, sf_dir):
    rows = dataquality.dq_report(spark, sf_dir).collect()
    assert len(rows) == 8
    assert {r.table_name for r in rows} == {"orders", "events"}
    for r in rows:
        assert 0.0 <= r.metric <= 1.0
        assert r.passed == (r.metric >= r.min_value)
    # fixture keys are clean: every uniqueness/completeness gate passes
    assert all(
        r.passed
        for r in rows
        if r.check_name.startswith(("uniqueness", "completeness"))
    )


def test_streaming_dq_gate_partitions_stream(spark, sf_dir):
    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.streaming.pipeline import streaming_dq_gate

    rows = streaming_dq_gate(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    # gate partitions the stream: clean + quarantined == everything
    assert sum(r.n_events for r in rows) == total
    by_tag = {r.violations: r.n_events for r in rows}
    assert "" in by_tag  # clean rows landed in publish
    assert by_tag.get("bad_type", 0) > 0  # 'error' events quarantined
    valid = {"null_user", "bad_type", "value_range"}
    for tag in by_tag:
        assert all(t in valid for t in tag.split(",") if t)


def test_k_anonymity_partition_and_flags(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafka_exercise_spark.catalog import load_table
    from kafka_exercise_spark.operators.dataquality import (
        K_ANON,
        k_anonymity_report,
    )

    rep = k_anonymity_report(spark, sf_dir)
    rows = rep.collect()
    # the census partitions the table exactly
    total = load_table(spark, sf_dir, "customer").count()
    assert sum(r.n_rows for r in rows) == total
    assert all((r.n_rows < K_ANON) == r.at_risk for r in rows)
    # QI tuples are unique rows
    keys = [(r.c_nationkey, r.c_mktsegment, r.bal_band) for r in rows]
    assert len(keys) == len(set(keys))


def test_drift_report_is_zero_for_identical_periods(spark):
    """Two periods with the identical value distribution must report
    l1_ppm = 0; moving one observation to a new bucket must not."""
    import datetime as dt

    from kafka_exercise_spark.operators import dataquality as dq

    pre = dt.datetime(2024, 1, 10)
    post = dt.datetime(2024, 1, 20)
    same = [
        (i * 2 + j, t, 1, v, "click")
        for i, v in enumerate([5.0, 15.0, 25.0])
        for j, t in enumerate([pre, post])
    ]
    df = spark.createDataFrame(
        same,
        "event_id long, ts timestamp, user_id long, value double,"
        " event_type string",
    )
    orig = dq.load_table
    try:
        dq.load_table = lambda s, d, n: df
        (r,) = dq.drift_report_events(spark, "x").collect()
    finally:
        dq.load_table = orig
    assert r.n_pre == 3 and r.n_post == 3 and r.l1_ppm == 0

    # one post observation moves to a different bucket → full L1 shows
    rows = [(0, pre, 1, 5.0, "click"), (1, post, 1, 5.0, "click"),
            (2, pre, 1, 15.0, "click"), (3, post, 1, 35.0, "click")]
    df2 = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, value double,"
        " event_type string",
    )
    try:
        dq.load_table = lambda s, d, n: df2
        (r2,) = dq.drift_report_events(spark, "x").collect()
    finally:
        dq.load_table = orig
    # p differs in buckets 1 (1/2 vs 0) and 3 (0 vs 1/2) -> L1 = 1
    assert r2.l1_ppm == 1_000_000


def test_drift_report_one_sided_period_is_max_sentinel(spark):
    """A type with every event on one side of the split has no comparable
    distribution: the report must emit the max-L1 sentinel (2e6 ppm)
    rather than divide by zero."""
    import datetime as dt

    from kafka_exercise_spark.operators import dataquality as dq

    rows = [(0, dt.datetime(2024, 1, 10), 1, 5.0, "click"),
            (1, dt.datetime(2024, 1, 11), 1, 15.0, "click")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, value double,"
        " event_type string",
    )
    orig = dq.load_table
    try:
        dq.load_table = lambda s, d, n: df
        (r,) = dq.drift_report_events(spark, "x").collect()
    finally:
        dq.load_table = orig
    assert r.n_pre == 2 and r.n_post == 0 and r.l1_ppm == 2_000_000


def test_pii_scrub_detects_and_redacts_all_planted_pii(spark, sf_dir):
    """Every planted PII string must be counted by its pattern and fully
    removed: per-doc counts equal the doc_id-derived injection plan, and
    no pattern matches the redacted text (checked by re-running the
    battery on a reconstructed redaction via counts — here: chars_removed
    > 0 exactly for docs with n_pii > 0)."""
    from kafka_exercise_spark.operators import dataquality as dq

    rows = dq.pii_scrub_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        did = r.doc_id
        assert r.n_email == (1 if did % 3 == 0 else 0)
        assert r.n_phone == (1 if did % 5 == 0 else 0)
        assert r.n_ipv4 == (1 if did % 7 == 0 else 0)
        assert r.n_idnum == (1 if did % 11 == 0 else 0)
        assert r.n_pii == r.n_email + r.n_phone + r.n_ipv4 + r.n_idnum
        # chars_removed is a NET delta; the invariant below holds for the
        # FIXTURE because every injected string is longer than its token
        # (a natural 6-char email vs the 7-char <EMAIL> would go negative
        # — pinned in test_pii_chars_removed_is_a_net_delta)
        assert (r.chars_removed > 0) == (r.n_pii > 0)


def test_pii_battery_leaves_no_residual_matches(spark):
    """Adversarial corpus: overlapping/adjacent PII forms; after the
    ordered battery no pattern may match the redacted text."""
    import re

    from pyspark.sql import functions as F

    from kafka_exercise_spark.operators import dataquality as dq

    probes = [
        "a user@x.io b 555-123-4567 c 10.1.2.3 d 123456789",
        "e mail: first.last+tag@sub.domain.org and 999-999-9999",
        "ids 1234567890123 and ip 255.255.255.255",
        "edge a@b.co",
        "no pii here at all",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(probes)], "doc_id long, text string")
    red = F.col("text")
    for _, pat, repl in dq.PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    out = {r.doc_id: r.r for r in df.select("doc_id", red.alias("r")).collect()}
    for _, pat, _ in dq.PII_PATTERNS:
        for t in out.values():
            assert not re.search(pat, t), (pat, t)
    assert out[4] == "no pii here at all"


def test_pii_chars_removed_is_a_net_delta(spark):
    """Pin the documented edge: a 6-char email redacted by the 7-char
    <EMAIL> token yields chars_removed = -1, and a MIXED-CASE email must
    be caught (the battery shares textops.pii_redact's case class)."""
    import re

    from pyspark.sql import functions as F

    from kafka_exercise_spark.operators import dataquality as dq

    probes = {1: "x a@b.co y", 2: "Contact John.Doe@Example.COM now"}
    df = spark.createDataFrame(
        list(probes.items()), "doc_id long, text string"
    )
    red = F.col("text")
    for _, pat, repl in dq.PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            red.alias("r"),
            (F.length("text") - F.length(red)).alias("delta"),
        ).collect()
    }
    assert out[1].r == "x <EMAIL> y" and out[1].delta == -1
    assert out[2].r == "Contact <EMAIL> now"
    email_pat = dq.PII_PATTERNS[0][1]
    assert re.search(email_pat, "John.Doe@Example.COM")
