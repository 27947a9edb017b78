"""Deterministic synthetic-row generator — SURVEY.md §2.1 S1.

The reference's generator (reference make_fake_data.py:53-81) produces n
Faker rows per tick — ``nome sexo endereco telefone email foto nascimento
profissao dt_update`` — and appends them to the source table, with
``dt_update`` stamped at insert time doubling as the CDC cursor
(reference make_fake_data.py:62, connect_postgres.config:10).

Engine form: the same 9-column shape derived from ``spark.range`` with
builtin expressions only — fully deterministic (same (n, tick) → same rows),
so generator output is assertable and CDC tests are reproducible, and fully
distributed (no driver-side Faker loop; a 10^12-row backfill is one range
scan). ``dt_update`` increases monotonically across ticks, preserving the
cursor property the incremental source relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixed origin for dt_update; ticks advance from here second-by-second
GEN_EPOCH = "2024-01-01 00:00:00"

PROFESSIONS = ("engineer", "teacher", "nurse", "analyst", "farmer")


def customers_batch(spark: SparkSession, n: int, tick: int = 0) -> DataFrame:
    """One generator tick: n deterministic customer rows (reference shape).

    Row identity i = tick*n + local id; every column is a pure function of
    i, evaluated JVM-side.
    """
    i = (F.col("id") + F.lit(tick) * F.lit(n)).alias("i")
    base = spark.range(n).select(i)
    h = F.md5(F.col("i").cast("string"))
    return base.select(
        F.concat(F.lit("Customer "), F.col("i")).alias("nome"),
        F.when(F.pmod(F.col("i"), 2) == 0, "M").otherwise("F").alias("sexo"),
        F.concat(
            F.pmod(F.col("i") * 37, 1000).cast("string"),
            F.lit(" Main St, City "),
            F.pmod(F.col("i"), 50).cast("string"),
        ).alias("endereco"),
        F.concat(
            F.lit("+1-555-"),
            F.lpad(F.pmod(F.col("i") * 7919, 10000).cast("string"), 4, "0"),
        ).alias("telefone"),
        F.concat(F.lit("customer"), F.col("i"), F.lit("@example.com")).alias(
            "email"
        ),
        F.concat(F.lit("https://img.example.com/"), h, F.lit(".png")).alias(
            "foto"
        ),
        # birth dates spread over ~55 years from 1950
        F.date_add(
            F.lit("1950-01-01").cast("date"),
            F.pmod(F.col("i") * 4391, 20000).cast("int"),
        ).alias("nascimento"),
        F.element_at(
            F.array(*[F.lit(p) for p in PROFESSIONS]),
            (F.pmod(F.col("i"), len(PROFESSIONS)) + 1).cast("int"),
        ).alias("profissao"),
        # monotone cursor: one second per tick, microsecond per row inside it
        (
            F.lit(GEN_EPOCH).cast("timestamp")
            + F.make_interval(secs=F.lit(tick) + F.col("i") / F.lit(1e6))
        ).alias("dt_update"),
    )


def append_ticks(
    spark: SparkSession, path: str, n: int, ticks: int, start_tick: int = 0
) -> int:
    """S1+S2 analog: generate ``ticks`` batches and append each to the
    source dir (standing in for ``to_sql(if_exists='append')``,
    reference make_fake_data.py:76). Returns rows written."""
    total = 0
    for t in range(start_tick, start_tick + ticks):
        batch = customers_batch(spark, n, tick=t)
        batch.write.mode("append").parquet(path)
        total += n
    return total
