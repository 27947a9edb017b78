from kafka_exercise_spark.plans.inspect import (
    broadcast_hint_count,
    broadcast_join_count,
    explain_str,
    has_cartesian_product,
    partition_filters,
    plan_report,
    pushed_filters,
    python_eval_count,
    read_schema_columns,
    shuffle_exchange_count,
    wholestage_codegen_spans,
)

__all__ = [
    "broadcast_hint_count",
    "broadcast_join_count",
    "explain_str",
    "has_cartesian_product",
    "partition_filters",
    "plan_report",
    "pushed_filters",
    "python_eval_count",
    "read_schema_columns",
    "shuffle_exchange_count",
    "wholestage_codegen_spans",
]
