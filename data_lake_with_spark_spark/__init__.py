"""data_lake_with_spark_spark — a PySpark-native analytics engine.

A brand-new, engine-shaped library reproducing the query and
data-processing capabilities of the reference repo
``WinThitiwat/Data_Lake_with_Spark`` (a Sparkify star-schema batch ETL,
``/root/reference/etl.py``) re-expressed Spark-first, plus the
large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns, streaming) designed for
100 TB scale.

Layout
------
- ``session``    : SparkSession factory (AQE, UTC, committer tuning)
- ``schemas``    : explicit StructTypes (Sparkify song/log + testdata)
- ``sources``    : readers (JSON explicit/inferred, Parquet+partition
                   discovery) and the testdata catalog
- ``functions``  : scalar kernels — temporal derivations (UDF-free),
                   surrogate keys, portable hashing
- ``operators``  : relational ops, window ops, dedup family,
                   similarity search, text analysis, multimodal
- ``plans``      : the star-schema pipeline (flagship composition)
- ``streaming``  : Structured Streaming variants of the event pipeline

Everything is stock DataFrame/SQL; no custom Catalyst rules are needed
(SURVEY.md §4) — plans stay declarative so Catalyst/Tungsten can
push filters, prune columns/partitions and pick join strategies.
"""

from data_lake_with_spark_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
