"""Temporal kernel (SURVEY.md §2 G1-G6, H1-H2) — UDF-free.

The reference derives all time columns through two row-at-a-time
Python UDFs (``/root/reference/etl.py:215-220``): epoch-millis →
timestamp and epoch-millis → ``'%Y-%m-%d %H:%M:%S'`` string. Each UDF
inserts a BatchEvalPython node, breaking whole-stage codegen and
shipping every row JVM→Python→JVM. Here the same outputs come from
built-in expressions (``timestamp_millis``, ``date_format``), which
stay inside codegen — at 100 TB this is the difference between a
CPU-bound scan and an IPC-bound one.

Date parts G1-G6 (``etl.py:230-235``) map 1:1 onto built-ins; Spark's
``dayofweek`` is 1=Sunday..7=Saturday and ``weekofyear`` is ISO-8601 —
oracle SQL must compensate for DuckDB's 0=Sunday ``dayofweek``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: G1-G6 as named column factories over a timestamp column.
DATE_PART_FNS: dict[str, object] = {
    "hour": F.hour,
    "day": F.dayofmonth,
    "week": F.weekofyear,
    "month": F.month,
    "year": F.year,
    "weekday": F.dayofweek,
}


def epoch_millis_to_timestamp(col: Column | str) -> Column:
    """Built-in replacement for UDF H1 (etl.py:215-216)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("long"))


def epoch_millis_to_timestring(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Built-in replacement for UDF H2 (etl.py:219-220).

    Produces the exact string the reference uses as the songplays
    ``start_time`` and as the E2 join key.
    """
    return F.date_format(epoch_millis_to_timestamp(col), fmt)


def date_parts(ts: Column | str, parts: tuple[str, ...] = tuple(DATE_PART_FNS)) -> list[Column]:
    c = F.col(ts) if isinstance(ts, str) else ts
    return [DATE_PART_FNS[p](c).alias(p) for p in parts]


def with_date_parts(
    df: DataFrame, ts: str, parts: tuple[str, ...] = tuple(DATE_PART_FNS)
) -> DataFrame:
    """Append G1-G6 derived columns (etl.py:230-235) in one select."""
    return df.select("*", *date_parts(ts, parts))
