"""Skew handling: salted aggregation and salted joins.

AQE's skew-join splitting (on in session.py) handles most runtime skew by
splitting oversized shuffle partitions, but two shapes still need explicit
salting at 100 TB:

- **Hot-key aggregation** where one key holds a double-digit percentage of
  all rows: every row of that key lands on one reducer regardless of how
  AQE splits *other* partitions. Salting fans the key out over n
  sub-aggregates and re-combines — two shuffles, both balanced. Worth it
  only when the skew is extreme; for mild skew the map-side partial
  aggregation already absorbs it (which is why the default operators don't
  salt).
- **Hot-key joins** where the dimension can't broadcast: replicate the dim
  row n ways, salt the fact side deterministically, join on (key, salt).
  The fact's hot key now spreads over n tasks.

Salts are DETERMINISTIC (hash of stable columns mod n, never rand()):
deterministic salting keeps retried/speculative tasks idempotent — a
rand() salt re-draws on retry and double-counts rows under task re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import load_table, scale_partitions

N_SALTS = 16


def salted_count(
    df: DataFrame, key: str, agg_col: str, n_salts: int = N_SALTS
) -> DataFrame:
    """Two-phase salted count+sum per key; result ≡ plain groupBy."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(agg_col)), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"), F.sum(agg_col).alias("_s")
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_rows"), F.sum("_s").alias("sum_value")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = N_SALTS,
    fact_salt_col: str | None = None,
) -> DataFrame:
    """Replicate-dim / salt-fact equi join; result ≡ plain inner join.

    ``fact_salt_col`` picks the column whose hash spreads the hot key
    (default: the fact key itself is NOT usable — all rows of the hot key
    share it — so pass a high-cardinality column, e.g. the fact's row id).
    """
    salt_src = fact_salt_col if fact_salt_col is not None else fact_key
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(
        replicated_dim,
        (F.col(fact_key) == F.col(dim_key)) & (salted_fact._salt == replicated_dim._salt),
    ).drop("_salt")


def salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver contract: salted two-phase aggregate over events — the
    extreme-hot-key form, oracle-checked against the plain GROUP BY."""
    events = load_table(spark, sf_dir, "events")
    return salted_count(events, "event_type", "value").select(
        "event_type",
        "n_rows",
        F.round("sum_value", 2).alias("sum_value"),
    )


#: Census: report this many heaviest keys per column.
CENSUS_TOP_K = 5


def skew_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key detection — the diagnosis step the salting remediations in
    this module exist for. For each candidate shuffle key of ``events``
    (user_id, event_type), report the heaviest ``CENSUS_TOP_K`` keys with
    their share of rows in ppm and the skew ratio vs a perfectly uniform
    key (count · n_distinct / n_rows, in ppm — 1 000 000 = perfectly
    uniform, 10⁷ = this key is 10× over-represented). A planner (human
    or automated) thresholds on the ratio to decide salting / AQE skew
    hints before the 100 TB join runs.

    One groupBy per key column (map-side combine; the per-key frame is
    then tiny) + a ranked-window top-k. All-integer shares via floor —
    hash-stable everywhere.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    ev = scale_partitions(load_table(spark, sf_dir, "events"), spark)
    # ONE pass over the fact table: each row emits one (key_column, key)
    # pair per audited column, then a single combine-aggregated groupBy —
    # the per-column loop would scan events once per column
    pairs = ev.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("user_id").alias("key_column"),
                    F.col("user_id").cast("string").alias("key"),
                ),
                F.struct(
                    F.lit("event_type").alias("key_column"),
                    F.col("event_type").alias("key"),
                ),
            )
        ).alias("kk")
    ).select("kk.key_column", "kk.key")
    per_key = pairs.groupBy("key_column", "key").agg(F.count("*").alias("cnt"))
    # totals via windows over the TINY per-key frame (one partitioning
    # shared by all three), not a second aggregate branch — a groupBy +
    # join-back would recompute per_key and re-scan events
    wt = Window.partitionBy("key_column")
    w = Window.partitionBy("key_column").orderBy(
        F.col("cnt").desc(), F.col("key").asc()
    )
    return (
        per_key.withColumn("n_rows", F.sum("cnt").over(wt))
        .withColumn("n_keys", F.count("*").over(wt))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= CENSUS_TOP_K)
        .select(
            "key_column",
            "key",
            "cnt",
            F.col("rnk").cast("long").alias("rnk"),
            # INTEGER `div` (≡ the oracle's `//` on these non-negative
            # longs): float floor(a/b) drifts once cnt·n_keys·10⁶ passes
            # 2^53 — exactly the hot-key-on-a-big-table regime this op
            # diagnoses. Exact while cnt·n_keys < 9·10¹² (beyond that,
            # drop the ppm scale a decade, same note as RANK_SCALE)
            F.expr("(cnt * 1000000) div n_rows")
            .cast("long")
            .alias("share_ppm"),
            F.expr("(cnt * n_keys * 1000000) div n_rows")
            .cast("long")
            .alias("skew_ratio_ppm"),
        )
    )
