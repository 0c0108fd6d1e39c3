from data_lake_with_spark_spark.sources.catalog import load_table, load_tables, register_views
from data_lake_with_spark_spark.sources.readers import (
    read_json_explicit,
    read_json_inferred,
    read_parquet,
)

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_json_explicit",
    "read_json_inferred",
    "read_parquet",
]
