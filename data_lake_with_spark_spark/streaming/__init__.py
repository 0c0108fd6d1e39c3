from data_lake_with_spark_spark.streaming import events

__all__ = ["events"]
