"""Datetime scalar functions with the reference's ksqlDB semantics.

The reference's entire scalar-function surface is two datetime formatters
(SURVEY.md §2.2):

- ``DATETOSTRING(date, 'yyyy-MM-dd')`` — reference README.md:211, 235, 238, 261.
  ksqlDB receives Avro dates as int days-since-epoch (reference README.md:207)
  and formats them.
- ``TIMESTAMPTOSTRING(ts, 'yyyy-MM-dd HH:mm:ss.SSS', 'UTC')`` — reference
  README.md:212, 236, 263. Epoch-millis bigint → zone-aware formatted string.

Both are thin, JVM-side compositions of built-in functions — they stay inside
whole-stage codegen; no Python UDFs. The epoch-int entry points cover the
Avro-wire representation; the typed entry points cover columns that already
arrived as DATE/TIMESTAMP (our parquet fixtures).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_days_to_date(col: Column | str) -> Column:
    """int days-since-epoch → DateType (the Avro 'date' logical type)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_add(F.to_date(F.lit("1970-01-01")), c.cast("int"))


def epoch_millis_to_timestamp(col: Column | str) -> Column:
    """bigint epoch-millis → TimestampType (the Avro 'timestamp-millis' type)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("long"))


def datetostring(col: Column | str, fmt: str = "yyyy-MM-dd", *, epoch_days: bool = False) -> Column:
    """ksqlDB DATETOSTRING parity (reference README.md:211).

    ``epoch_days=True`` treats the input as the raw Avro int representation.
    """
    c = F.col(col) if isinstance(col, str) else col
    if epoch_days:
        c = epoch_days_to_date(c)
    return F.date_format(c, fmt)


def timestamptostring(
    col: Column | str,
    fmt: str = "yyyy-MM-dd HH:mm:ss.SSS",
    tz: str = "UTC",
    *,
    epoch_millis: bool = False,
) -> Column:
    """ksqlDB TIMESTAMPTOSTRING parity (reference README.md:212).

    The session timezone is pinned to UTC (session.py), so tz='UTC' is the
    identity; other zones shift via ``from_utc_timestamp``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if epoch_millis:
        c = epoch_millis_to_timestamp(c)
    if tz != "UTC":
        c = F.from_utc_timestamp(c, tz)
    return F.date_format(c, fmt)
