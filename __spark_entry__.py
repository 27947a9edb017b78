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

from kafka_exercise_spark.operators import pipeline_ops, relational

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
        # ---- stage E: relational surface beyond the reference (§2.5) ----
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q5_local_supplier": relational.q5_local_supplier,
        "join_customer_orders": relational.join_customer_orders,
        "sort_topk": relational.sort_topk,
        "distinct_mktsegments": relational.distinct_mktsegments,
        "set_ops_nations": relational.set_ops_nations,
        "semi_anti_join": relational.semi_anti_join,
        "having_filter": relational.having_filter,
        "window_rank_orders": relational.window_rank_orders,
        "json_extract_events": relational.json_extract_events,
        "agg_stats_events": relational.agg_stats_events,
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
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                       AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l.l_orderkey AS o_orderkey,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
                   o.o_orderpriority,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
            GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
            ORDER BY revenue DESC, o_orderkey ASC
            LIMIT 10
        """,
        "q5_local_supplier": """
            SELECT n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
                           AND s.s_nationkey = c.c_nationkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY n.n_name
        """,
        "join_customer_orders": """
            SELECT c.c_custkey, c.c_name, c.c_mktsegment,
                   count(*) AS n_orders,
                   round(sum(o.o_totalprice), 2) AS total_spend
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
        """,
        "sort_topk": """
            SELECT o_orderkey, o_custkey, o_totalprice,
                   strftime(o_orderdate, '%Y-%m-%d') AS orderdate
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "distinct_mktsegments": "SELECT DISTINCT c_mktsegment FROM customer",
        "set_ops_nations": """
            SELECT nationkey, count(*) AS surplus FROM (
                SELECT c_nationkey AS nationkey FROM customer
                EXCEPT ALL
                SELECT s_nationkey AS nationkey FROM supplier
            ) GROUP BY nationkey
        """,
        "semi_anti_join": """
            SELECT bucket, count(*) AS n_customers FROM (
                SELECT 'with_orders' AS bucket, c_custkey FROM customer
                WHERE c_custkey IN
                    (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
                UNION ALL
                SELECT 'without_orders' AS bucket, c_custkey FROM customer
                WHERE c_custkey NOT IN
                    (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
            ) GROUP BY bucket
        """,
        "having_filter": """
            SELECT o_custkey, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS spend
            FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        """,
        "window_rank_orders": """
            SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, running_spend
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER w AS rn,
                       rank() OVER w AS rnk,
                       round(sum(o_totalprice) OVER w, 2) AS running_spend
                FROM orders
                WINDOW w AS (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey ASC)
            ) WHERE rn <= 3
        """,
        "json_extract_events": """
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
            FROM events GROUP BY event_type
        """,
        "agg_stats_events": """
            SELECT event_type,
                   round(min(value), 2) AS min_value,
                   round(max(value), 2) AS max_value,
                   round(avg(value), 6) AS avg_value,
                   round(stddev_samp(value), 6) AS std_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
    }
