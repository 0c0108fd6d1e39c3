"""Time-series resampling — the hypertable/`time_bucket_gapfill`
operator family: regularize an event stream onto a fixed grid and
forward-fill gaps, so downstream joins/windows see one row per
(key, bucket) even where no events landed.

Spark-first shape: the bucket aggregate is one groupBy; the grid is a
``sequence(min, max, interval)`` explode CROSS-joined with the key
set (both sides derive from the same aggregate — the bounds ride
along as a broadcast scalar row, never a driver action); the gap fill
is ``last(value, ignorenulls=True)`` over an unbounded-preceding
window per key. Two shuffles total (bucket agg, fill window), both on
the key — at 100 TB the grid is |keys| × |buckets| rows, dense by
construction, and the fill window never re-reads the events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Per-key fixed-grid resample with forward fill.

    Buckets ``ts_col`` to ``trunc_unit``, sums ``value_col`` per
    (key, bucket) in DECIMAL (exact, order-independent), then lays
    every key over the GLOBAL [min_bucket, max_bucket] grid and
    forward-fills missing buckets from the key's last observed value.
    Buckets before a key's first observation stay NULL (nothing to
    carry — both a correctness property and what SQL gapfill
    semantics do). Returns (key, bucket, total_value, filled) where
    ``filled`` marks carried rows.
    """
    bucket = F.date_trunc(trunc_unit, F.col(ts_col))
    agg = (
        events.select(F.col(key_col).alias("key"), bucket.alias("bucket"),
                      F.col(value_col).alias("_v"))
        .groupBy("key", "bucket")
        .agg(
            F.round(F.sum(F.col("_v").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("_total")
        )
        # the aggregate feeds THREE consumers (bounds, key set, grid
        # join); without materialization each one re-scans the events
        # source (per-consumer column pruning defeats exchange reuse —
        # caught by the scan-count plan gate: 3 parquet scans). One
        # checkpoint of the |keys|×|buckets|-bounded aggregate keeps
        # the raw corpus read at exactly one pass.
        .localCheckpoint()
    )
    bounds = agg.select(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    keys = agg.select("key").distinct()
    grid = keys.crossJoin(F.broadcast(bounds)).select(
        "key",
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    joined = grid.join(agg, on=["key", "bucket"], how="left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "key",
        "bucket",
        F.last("_total", ignorenulls=True).over(w).alias("total_value"),
        F.col("_total").isNull().alias("filled"),
    )
