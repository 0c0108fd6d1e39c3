from data_lake_with_spark_spark.operators import (
    dedup,
    multimodal,
    relational,
    similarity,
    text,
    windows,
)

__all__ = ["dedup", "multimodal", "relational", "similarity", "text", "windows"]
