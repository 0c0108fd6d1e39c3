"""Source readers (SURVEY.md §2 A1-A5).

The reference reads NDJSON from S3 with either an explicit StructType
(``/root/reference/etl.py:76,177`` — op A1) or full schema inference
(``etl.py:261`` — op A2, an anti-pattern: a second complete scan of
the data just to rediscover a known schema), and reads back its own
partitioned parquet with partition discovery
(``data_profiling.ipynb`` cells 46-47 — op A4).

Scale notes:
- Always prefer :func:`read_json_explicit`; inference is a full extra
  pass over 100 TB.
- Glob patterns (op A3, ``etl.py:53,147``) are honoured by passing
  them in ``path``; at scale prefer Hive-style partition dirs so
  Catalyst can prune partitions instead of listing the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json_explicit(
    spark: SparkSession, path: str, schema: StructType, multiline: bool = False
) -> DataFrame:
    """NDJSON scan with a declared schema (op A1, etl.py:76/177).

    Extra JSON keys are dropped, missing keys become null — the same
    semantics as the reference's ``spark.read.json(path, schema=...)``.
    """
    return spark.read.schema(schema).option("multiLine", multiline).json(path)


def read_json_inferred(spark: SparkSession, path: str) -> DataFrame:
    """NDJSON scan with schema inference (op A2, etl.py:261).

    Kept for surface parity; avoid in pipelines — it re-reads the data
    once just to infer. The star-schema plan reuses the A1 frame
    instead (plans/star_schema.py).
    """
    return spark.read.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan (beyond-reference source format). With ``schema`` the
    scan is single-pass; without it Spark infers (extra pass — same
    anti-pattern warning as JSON inference). Malformed rows are
    dropped rather than poisoning the load (mode=DROPMALFORMED is the
    bulk-ingest default; use PERMISSIVE + corrupt-record column when
    auditing a new feed)."""
    reader = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("mode", "DROPMALFORMED")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC scan (beyond-reference columnar source; same pushdown /
    pruning story as parquet via the vectorized ORC reader)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Parquet scan with partition discovery (op A4, nb cells 46-47).

    Partition columns encoded in directory names are recovered
    automatically; passing ``schema`` skips footer merging on very
    wide/many-file datasets.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_json_audited(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """NDJSON scan in PERMISSIVE mode with a corrupt-record column —
    the feed-auditing variant of A1 for untrusted 100 TB drops: rows
    that fail to parse land with every declared field null and the raw
    line captured in ``corrupt_col``, so bad records are quarantined
    with one filter instead of failing the job (FAILFAST) or vanishing
    silently (DROPMALFORMED). The declared schema is extended with the
    corrupt column (Spark requires it present in the schema to
    populate it).
    """
    from pyspark.sql.types import StringType

    audited = StructType(schema.fields[:]).add(corrupt_col, StringType())
    return (
        spark.read.schema(audited)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """Partition an audited read into (clean, quarantine): clean rows
    drop the audit column; quarantined rows keep the full row (their
    declared fields are all null by construction). Both sides are
    filters over one scan — no shuffle. The quarantine side must keep
    at least one real column: Spark disallows queries over raw
    JSON/CSV that reference ONLY the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    from pyspark.sql import functions as F

    clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull())
    return clean, bad


def read_parquet_evolved(
    spark: SparkSession, path: str, merge_schema: bool = True
) -> DataFrame:
    """Parquet scan across schema versions (``mergeSchema``): files
    written before a column existed surface it as null, so a 100 TB
    table can gain columns without rewriting history. Merging reads
    every footer — pay it only when versions actually differ (the
    catalog case pins one schema and skips the merge)."""
    return spark.read.option("mergeSchema", merge_schema).parquet(path)


def read_avro(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Avro scan — the remaining row-format staple of ingest
    pipelines. The ``spark-avro`` module is an external jar (not
    bundled with pyspark); when it is absent this raises a clear
    ValueError naming the package instead of Spark's opaque
    ClassNotFoundException. Coverage mirrors the Delta seam: a
    skip-marked test exercises the real read whenever the jar
    appears on the classpath."""
    reader = spark.read.format("avro")
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.load(path)
    except Exception as e:  # noqa: BLE001
        # Match Spark's specific missing-data-source error (error
        # class FAILED_TO_FIND_DATA_SOURCE / "Failed to find data
        # source: avro"), not loose keywords — an unrelated failure
        # whose message merely contains an avro path must propagate
        # unmasked (r4 ADVICE).
        msg = str(e)
        if (
            "FAILED_TO_FIND_DATA_SOURCE" in msg
            or "Failed to find data source: avro" in msg
            or "Failed to find the data source: avro" in msg
        ):
            raise ValueError(
                "Avro support needs the external spark-avro module "
                "(org.apache.spark:spark-avro_2.13) on the classpath; "
                "this build ships without it"
            ) from e
        raise
