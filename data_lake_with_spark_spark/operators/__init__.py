from data_lake_with_spark_spark.operators import (
    asof,
    dedup,
    events_analytics,
    multimodal,
    profile,
    relational,
    sampling,
    similarity,
    skew,
    text,
    windows,
)

__all__ = [
    "asof",
    "dedup",
    "events_analytics",
    "multimodal",
    "profile",
    "relational",
    "sampling",
    "similarity",
    "skew",
    "text",
    "windows",
]
