"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine code lives in ``kafka_exercise_spark/``; this module is only the
registry. Every entry cites the SURVEY.md §2 operator(s) it covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_exercise_spark.operators import pipeline_ops

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the jovens pipeline (scan → project → format → filter) at
    sf0.001 — SURVEY.md §2.2 P1-P6, the reference's CSAS at README.md:233-239."""
    return pipeline_ops.jovens(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        # §2.2 P1/P3/P4/P5 — projection, alias, DATETOSTRING, TIMESTAMPTOSTRING
        "custstream_pretty": pipeline_ops.custstream_pretty,
        # §2.2 P2 — SELECT *
        "select_star": pipeline_ops.select_star,
        # §2.2 P1/P4/P5/P6/P8 — formatted-date filter (CSAS jovens)
        "jovens": pipeline_ops.jovens,
        # §2.2 P7 — CASE WHEN classification (CSAS idadeclass)
        "idadeclass": pipeline_ops.idadeclass,
        # §2.3 A1/A2 — grouped count
        "groupby_count": pipeline_ops.groupby_count,
        # §2.3 A1-A5 — tumbling 30 s windowed count (CTAS idadecont), batch form
        "idadecont": pipeline_ops.idadecont,
        # §2.2 P4/P5 epoch-int wire variants (Avro days/millis decode)
        "jovens_epoch_wire": pipeline_ops.jovens_epoch_wire,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (FIXTURES.md §4 for the
    strftime/time_bucket ≙ date_format/window correspondences)."""
    return {
        "custstream_pretty": """
            SELECT event_id, user_id, event_type,
                   strftime(ts, '%Y-%m-%d') AS dt_event,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS ts_conv
            FROM events
        """,
        "select_star": "SELECT * FROM nation",
        "jovens": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   strftime(o_orderdate, '%Y-%m-%d') AS dt_order,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%g') AS dt_updt
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
        """,
        "idadeclass": """
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
                        THEN 'JOVEM' ELSE 'ADULTO' END AS idadecat,
                   strftime(o_orderdate, '%Y-%m-%d') AS dt_order
            FROM orders
        """,
        "groupby_count": """
            SELECT event_type, count(event_type) AS contagem
            FROM events GROUP BY event_type
        """,
        "idadecont": """
            SELECT strftime(time_bucket(INTERVAL 30 SECONDS, ts),
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   strftime(time_bucket(INTERVAL 30 SECONDS, ts)
                            + INTERVAL 30 SECONDS,
                            '%Y-%m-%d %H:%M:%S') AS window_end,
                   event_type AS idadecat,
                   count(*) AS contagem
            FROM events GROUP BY 1, 2, 3
        """,
        "jovens_epoch_wire": """
            SELECT event_id,
                   strftime(ts, '%Y-%m-%d') AS dt_event,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS ts_conv
            FROM events
        """,
    }
