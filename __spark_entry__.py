"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``data_lake_with_spark_spark`` package;
this module only adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_lake_with_spark_spark import queries as _q  # noqa: E402
from data_lake_with_spark_spark.session import ensure_runtime_confs  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The songplays-build shape from the reference (etl.py:186-308):
    filter fact events → broadcast-enrich with the customer dimension →
    deterministic surrogate id → date parts.
    """
    ensure_runtime_confs(spark)
    return _q.q12_flagship_enrichment(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in _q.queries().items():
        def wrapped(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            ensure_runtime_confs(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every oracle-checkable query."""
    return _q.oracle_sql()
