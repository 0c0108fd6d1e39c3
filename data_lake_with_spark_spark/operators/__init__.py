from data_lake_with_spark_spark.operators import (
    asof,
    dedup,
    multimodal,
    profile,
    relational,
    similarity,
    skew,
    text,
    windows,
)

__all__ = [
    "asof",
    "dedup",
    "multimodal",
    "profile",
    "relational",
    "similarity",
    "skew",
    "text",
    "windows",
]
