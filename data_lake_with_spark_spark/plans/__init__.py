from data_lake_with_spark_spark.plans import star_schema

__all__ = ["star_schema"]
