from data_lake_with_spark_spark.sources import lakehouse, sinks
from data_lake_with_spark_spark.sources.catalog import load_table, load_tables, register_views
from data_lake_with_spark_spark.sources.readers import (
    read_avro,
    read_csv,
    read_json_audited,
    read_json_explicit,
    read_json_inferred,
    read_orc,
    read_parquet,
    read_parquet_evolved,
)

__all__ = [
    "lakehouse",
    "sinks",
    "load_table",
    "load_tables",
    "register_views",
    "read_avro",
    "read_csv",
    "read_json_audited",
    "read_json_explicit",
    "read_json_inferred",
    "read_orc",
    "read_parquet",
    "read_parquet_evolved",
]
