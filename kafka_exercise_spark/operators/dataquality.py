"""Declarative data-quality expectations — the publish gate of a pipeline.

Before a 100 TB curation/ingest run promotes its output, it validates the
contract: key columns complete and unique, categorical columns within their
domain, measures within range. The standard tooling shape (Deequ, dbt tests,
Great Expectations) is a *suite of named checks compiled into one aggregate
pass per table* — never one job per check. That is exactly what
``ExpectationSuite`` does: every check lowers to a conditional aggregate
expression, the whole suite runs as a single ``agg(...)`` over one scan
(map-side partials, tiny result), and the report is one row per check with
the observed metric and pass/fail against its threshold.

Scale posture: N checks on a table cost ONE scan + one scalar aggregate —
adding a check is free at runtime. ``unique`` checks add a count-distinct
(two-phase partial-distinct exchange over the key column only). Thresholds
make checks tolerant (``completeness >= 0.99``) for real-world dirt while
keeping the gate deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import load_table


@dataclass
class _Check:
    name: str
    metric_expr: Column  # aggregate expression → DOUBLE metric in [0, 1]
    min_value: float  # check passes iff metric >= min_value


def _fraction(cond: Column) -> Column:
    """Aggregate: fraction of rows satisfying ``cond`` (0.0 on empty)."""
    return F.coalesce(
        F.avg(F.when(cond, 1.0).otherwise(0.0)), F.lit(0.0)
    )


@dataclass
class ExpectationSuite:
    """Named checks over one table, compiled to a single aggregate pass."""

    table: str
    checks: list[_Check] = field(default_factory=list)

    # -- check constructors (each returns self for chaining) -------------

    def completeness(self, col: str, at_least: float = 1.0) -> "ExpectationSuite":
        """Fraction of rows with ``col`` not null."""
        self.checks.append(
            _Check(f"completeness({col})", _fraction(F.col(col).isNotNull()), at_least)
        )
        return self

    def uniqueness(self, col: str, at_least: float = 1.0) -> "ExpectationSuite":
        """distinct(col) / count(*) — 1.0 means a true key.

        Coalesced like ``_fraction``: an empty table is 0/0 → 0.0, so the
        check FAILS CLOSED instead of emitting a NULL ``passed`` a
        ``filter(~passed)`` consumer would silently drop.
        """
        self.checks.append(
            _Check(
                f"uniqueness({col})",
                F.coalesce(
                    F.count_distinct(F.col(col)) / F.count(F.lit(1)), F.lit(0.0)
                ),
                at_least,
            )
        )
        return self

    def in_set(
        self, col: str, values: list[str], at_least: float = 1.0
    ) -> "ExpectationSuite":
        """Fraction of rows whose ``col`` is one of ``values``."""
        self.checks.append(
            _Check(
                f"in_set({col})", _fraction(F.col(col).isin(values)), at_least
            )
        )
        return self

    def between(
        self, col: str, lo: float, hi: float, at_least: float = 1.0
    ) -> "ExpectationSuite":
        """Fraction of rows with ``lo <= col <= hi``."""
        self.checks.append(
            _Check(
                f"between({col},{lo},{hi})",
                _fraction(F.col(col).between(lo, hi)),
                at_least,
            )
        )
        return self

    def non_empty(self) -> "ExpectationSuite":
        """Table has at least one row (metric: min(1, count))."""
        self.checks.append(
            _Check("non_empty", F.least(F.count(F.lit(1)).cast("double"), F.lit(1.0)), 1.0)
        )
        return self

    # -- compile + run ---------------------------------------------------

    def run(self, df: DataFrame) -> DataFrame:
        """ONE aggregate over one scan → (table, check, metric, min_value,
        passed) per check.

        The gate compares the RAW metric — rounding is display-only
        (6 dp, for hash-stable reports). A strict ``at_least=1.0`` gate
        that compared the rounded value would fail OPEN for violation
        rates under 5e-7: one null key in 3M rows rounds to 1.000000 —
        exactly the big-table regime where the gate matters most.
        """
        aggs = [c.metric_expr.alias(f"m{i}") for i, c in enumerate(self.checks)]
        row = df.agg(*aggs)
        reports = [
            F.struct(
                F.lit(self.table).alias("table_name"),
                F.lit(c.name).alias("check_name"),
                F.round(F.col(f"m{i}"), 6).alias("metric"),
                F.lit(float(c.min_value)).alias("min_value"),
                (F.col(f"m{i}") >= c.min_value).alias("passed"),
            )
            for i, c in enumerate(self.checks)
        ]
        return row.select(
            F.explode(F.array(*reports)).alias("r")
        ).select("r.*")


#: Row-level contract for the events stream — shared by the batch oracle and
#: the streaming quarantine gate so the two can never drift.
EVENT_ALLOWED_TYPES = ("click", "signup", "purchase", "view")
EVENT_VALUE_MAX = 480.0


def event_row_violations() -> Column:
    """Comma-joined violation tags for one event row ('' = clean).

    The row-level twin of ``ExpectationSuite``: where the suite aggregates
    a table-level gate, this expression tags each row so a streaming gate
    can route it (clean → publish, tagged → dead-letter) — plain codegen
    expressions, evaluated map-side in whatever pass already touches the
    row.
    """
    return F.concat_ws(
        ",",
        F.when(F.col("user_id").isNull(), F.lit("null_user")),
        F.when(
            ~F.col("event_type").isin(list(EVENT_ALLOWED_TYPES)), F.lit("bad_type")
        ),
        F.when(
            ~F.col("value").between(0.0, EVENT_VALUE_MAX), F.lit("value_range")
        ),
    )


def dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The publish-gate report for the fixture warehouse: key integrity on
    ``orders``, domain/range contracts on ``events`` — one aggregate pass
    per table, unioned into a single (table, check, metric, passed) report.
    """
    orders_suite = (
        ExpectationSuite("orders")
        .non_empty()
        .completeness("o_custkey")
        .uniqueness("o_orderkey")
        .in_set("o_orderstatus", ["F", "O", "P"])
    )
    events_suite = (
        ExpectationSuite("events")
        .completeness("user_id")
        .completeness("event_type")
        .between("value", 0.0, 250.0, at_least=0.5)
        .uniqueness("event_id")
    )
    return orders_suite.run(load_table(spark, sf_dir, "orders")).unionByName(
        events_suite.run(load_table(spark, sf_dir, "events"))
    )


#: k-anonymity threshold: quasi-identifier groups smaller than this are
#: re-identification risks.
K_ANON = 10

#: Account-balance banding width for the quasi-identifier (coarse bands
#: are the generalization step of a k-anonymization pass).
K_ANON_BAL_BAND = 1000


def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit for training-data release: k-anonymity census over a
    quasi-identifier tuple — (nation, market segment, balance band) on the
    customer table. Any group with fewer than ``K_ANON`` members is a
    re-identification risk (Sweeney 2002); the report is what a release
    gate consumes to decide suppression or further generalization before
    records (or text derived from them) enter a training corpus.

    ONE scan → ONE groupBy on the QI tuple: the same single-pass shape as
    ``dq_report``'s expectation suite. Map-side partial counts make the
    shuffle carry at most |QI-cardinality| rows per partition — at 100 TB
    the exchange is bounded by the QI domain, not the table.

    The balance band is ``floor(c_acctbal / band)`` — floor of an
    identical IEEE division in both engines, so bands are engine-exact
    even though the balance is a double.
    """
    from kafka_exercise_spark.catalog import scale_partitions  # noqa: PLC0415

    cust = scale_partitions(load_table(spark, sf_dir, "customer"), spark)
    band = F.floor(F.col("c_acctbal") / K_ANON_BAL_BAND).cast("long")
    return (
        cust.select("c_nationkey", "c_mktsegment", band.alias("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count("*").alias("n_rows"))
        .withColumn("at_risk", F.col("n_rows") < K_ANON)
    )


#: Drift-report value bucketing: exact centi-values, 10-unit buckets.
DRIFT_BUCKET_CENTI = 1000

#: Period split for the drift comparison (shares the MERGE op's instant).
DRIFT_SPLIT_US = 1_705_363_200_000_000


def drift_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per event type, the L1 (total
    variation ×2) distance between the pre-split and post-split value
    distributions — the train/serve-skew check a pipeline runs before
    trusting a model (or a filter threshold) fit on last period's data.

    Exact integers end-to-end: values are exact centi-units → bucket =
    ``cv div 1000`` (non-negative, so div ≡ floor); per-(type, bucket)
    counts; L1 as Σ|c₁·n₂ − c₂·n₁| scaled to ppm by ONE floor division —
    no float ratio ever materializes, so the report hashes identically
    in any engine. Overflow: the ppm numerator Σ|c₁·n₂ − c₂·n₁|·10⁶ ≤
    2·n₁·n₂·10⁶ stays in int64 while n₁·n₂ < ~4.6·10¹² (~2·10⁶ rows per
    side) — beyond that, compute the same statistic on per-shard counts
    (the bucket table is tiny; only the counts grow).

    Scale shape: one groupBy on (type, bucket) with map-side combine,
    a broadcast-back of per-type totals (|types| rows), and a final
    groupBy bounded by the type domain.
    """
    from kafka_exercise_spark.catalog import scale_partitions  # noqa: PLC0415

    ev = scale_partitions(load_table(spark, sf_dir, "events"), spark)
    us = F.unix_micros(F.col("ts"))
    binned = ev.select(
        "event_type",
        F.expr(
            f"(cast(round(value * 100) as bigint)) div {DRIFT_BUCKET_CENTI}"
        ).alias("bucket"),
        (us < DRIFT_SPLIT_US).cast("long").alias("pre"),
    )
    counts = binned.groupBy("event_type", "bucket").agg(
        F.sum("pre").alias("c1"),
        F.sum(1 - F.col("pre")).alias("c2"),
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    return (
        counts.join(F.broadcast(totals), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n1").alias("n_pre"),
            F.max("n2").alias("n_post"),
            F.count("*").alias("n_buckets"),
            F.sum(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            ).alias("_l1_num"),
        )
        # guard the division (repo rule): a type with every event on ONE
        # side has no comparable distribution — report the max-L1 sentinel
        # (2.0 → 2e6 ppm). The division itself is INTEGER `div` on longs,
        # matching the oracle's `//` exactly — a float floor(a/b) loses
        # exactness once the numerator passes 2^53
        .withColumn(
            "l1_ppm",
            F.when(
                (F.col("n_pre") > 0) & (F.col("n_post") > 0),
                F.expr("(_l1_num * 1000000) div (n_pre * n_post)"),
            )
            .otherwise(F.lit(2_000_000))
            .cast("long"),
        )
        .drop("_l1_num")
    )


#: PII regex battery. Written against the ASCII subset that Java
#: (Spark) and RE2 (DuckDB) regexes interpret IDENTICALLY: `\d` == [0-9]
#: and `\b` is the ASCII word boundary in both engines; no backrefs, no
#: lookaround, no Unicode classes. Order matters: redaction applies the
#: battery top-to-bottom, and every replacement token is digit-free so a
#: later pattern can never match inside an earlier redaction.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\b\d{9,}\b", "<ID>"),
)


def pii_scrub_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the document corpus — the privacy
    scrub every pretraining pipeline runs before release (the row-level
    complement of ``k_anonymity_report``'s group-level census).

    The fixture corpus carries no natural PII, so the entry first builds
    a deterministic adversarial corpus: a doc_id-keyed subset of
    documents gets synthetic emails / phone numbers / IPv4s / 9-digit
    ids appended (same expressions in the oracle — the
    span-corruption-mask precedent for synthesized-input entries). The
    operator under test then runs the ``PII_PATTERNS`` battery: per-doc
    match counts via ``regexp_extract_all`` and an ordered
    ``regexp_replace`` chain, with the redacted text proven
    byte-identical across engines by its md5 — a value-level proof the
    scrub transformation itself matches, not just the counts.
    ``chars_removed`` is a NET length delta: it can be ≤ 0 when a match
    is at most as long as its replacement token (a 6-char email vs the
    7-char ``<EMAIL>``) — the injected fixture PII is all longer than
    its token, so the fixture rows stay strictly positive.

    Plan: map-only — one pruned (doc_id, text) scan, all regex work
    JVM-side inside whole-stage codegen, zero shuffles, no UDFs. At
    100 TB this runs at scan throughput like the rest of the rule
    family; the md5 column doubles as the content-addressed key the
    scrubbed corpus would be written under.
    """
    from kafka_exercise_spark.catalog import scale_partitions  # noqa: PLC0415

    docs = scale_partitions(load_table(spark, sf_dir, "documents"), spark)
    did = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" contact user"), did.cast("string"), F.lit("@example.com")
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" host 10."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
                F.lit("."),
                ((did * 13) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" ref "),
                F.lpad(((did * 37) % 1_000_000_000).cast("string"), 9, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    out = docs.select("doc_id", dirty.alias("dirty"))
    redacted = F.col("dirty")
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(F.col("dirty"), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, repl)
    out = out.select("doc_id", *counts, redacted.alias("redacted"), "dirty")
    return out.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ipv4",
        "n_idnum",
        (
            F.col("n_email") + F.col("n_phone") + F.col("n_ipv4") + F.col("n_idnum")
        ).alias("n_pii"),
        (F.length("dirty") - F.length("redacted")).cast("long").alias(
            "chars_removed"
        ),
        F.md5(F.col("redacted")).alias("redacted_md5"),
    )
