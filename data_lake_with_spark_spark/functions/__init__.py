from data_lake_with_spark_spark.functions.keys import deterministic_id, surrogate_id
from data_lake_with_spark_spark.functions.temporal import (
    date_parts,
    epoch_millis_to_timestamp,
    epoch_millis_to_timestring,
    with_date_parts,
)

__all__ = [
    "date_parts",
    "deterministic_id",
    "epoch_millis_to_timestamp",
    "epoch_millis_to_timestring",
    "surrogate_id",
    "with_date_parts",
]
