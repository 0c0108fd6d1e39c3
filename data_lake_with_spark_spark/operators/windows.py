"""Window operators (SURVEY.md §2 I4 — absent from the reference, part
of the complete engine surface).

All standard window shapes: ranking within a partition, lag/lead
deltas, and gap-based sessionization (the batch twin of the streaming
session windows in ``streaming/events.py``).

Scale notes: a window partitioned by a key shuffles once on that key
and sorts within partitions — same cost envelope as a groupBy. Avoid
``Window.orderBy`` with no partition key (single-task global sort);
for global ranks use top_k or a two-phase rank instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_in_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    col_name: str = "rn",
    method: str = "row_number",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    return df.withColumn(col_name, fn().over(w))


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Keep the first row per key under ``order_by`` (deterministic
    keyed dedup — the principled fix for the reference's non-deduped
    users table, SURVEY.md §2 F4)."""
    ranked = rank_in_group(df, keys, order_by, "_rn")
    return ranked.filter(F.col("_rn") == 1).drop("_rn")


def lag_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: str,
    value_col: str,
    col_name: str = "delta",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(order_by)
    return df.withColumn(
        col_name, F.col(value_col) - F.lag(value_col).over(w)
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_seconds``.

    Classic two-window formulation (lag → boundary flag → running
    sum); one shuffle on ``user_col``. The streaming twin is
    ``session_window`` in streaming/events.py.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    # interval comparison (not unix_timestamp) so TIMESTAMP_NTZ columns
    # are handled timezone-independently
    gap_exceeded = F.col(ts_col) > prev + F.expr(f"INTERVAL {gap_seconds} SECOND")
    new_session = F.when(prev.isNull() | gap_exceeded, 1).otherwise(0)
    return (
        df.withColumn("_new", new_session)
        .withColumn(session_col, F.sum("_new").over(w))
        .drop("_new")
    )
