from kafka_exercise_spark.functions.datetime_fns import (
    datetostring,
    epoch_days_to_date,
    epoch_millis_to_timestamp,
    timestamptostring,
)

__all__ = [
    "datetostring",
    "timestamptostring",
    "epoch_days_to_date",
    "epoch_millis_to_timestamp",
]
