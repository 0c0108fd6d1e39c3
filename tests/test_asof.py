from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from data_lake_with_spark_spark.operators.asof import asof_join, points_in_intervals


def _ts(day: int, hour: int = 0) -> datetime:
    return datetime(2024, 1, day, hour)


def _frames(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts(2, 12)),
            (2, "A", _ts(5)),
            (3, "B", _ts(3)),
            (4, "C", _ts(4)),  # no quote for C
        ],
        ["trade_id", "sym", "t_ts"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(1), 10.0),
            ("A", _ts(2, 12), 11.0),  # exactly at trade 1's ts
            ("A", _ts(4), 12.0),
            ("B", _ts(3, 1), 20.0),  # after B's only trade
        ],
        ["sym", "q_ts", "px"],
    )
    return trades, quotes


def test_asof_backward_picks_latest_at_or_before(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, ["sym"], ["sym"], "t_ts", "q_ts", right_cols=["px"]
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    # trade 1: exact-ts quote matches (inclusive); trade 2 (Jan 5): latest
    # at-or-before is the Jan 4 quote; trade 3 and 4: no quote → dropped
    assert got == {1: 11.0, 2: 12.0}


def test_asof_strict_excludes_exact_ts(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades,
        quotes,
        ["sym"],
        ["sym"],
        "t_ts",
        "q_ts",
        right_cols=["px"],
        allow_exact_matches=False,
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == {1: 10.0, 2: 12.0}


def test_asof_left_keeps_unmatched(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, ["sym"], ["sym"], "t_ts", "q_ts", right_cols=["px"], how="left"
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got[3] is None and got[4] is None and len(got) == 4


def test_points_in_intervals_half_open(spark):
    points = spark.createDataFrame(
        [(1, _ts(1)), (2, _ts(3, 12)), (3, _ts(5)), (4, _ts(9))],
        ["pt_id", "p_ts"],
    )
    intervals = spark.createDataFrame(
        [(100, _ts(3), _ts(5)), (200, _ts(1), _ts(2))],
        ["iv_id", "start", "end"],
    )
    out = points_in_intervals(points, intervals, "p_ts", "start", "end")
    got = {(r["pt_id"], r["iv_id"]) for r in out.collect()}
    # pt 3 at day 5 is NOT in [3,5) (end exclusive); pt 1 at day 1 IS in [1,2)
    assert got == {(2, 100), (1, 200)}


def test_points_in_intervals_matches_naive_join_on_events(spark, sf_dir):
    from data_lake_with_spark_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_linenumber", "l_shipdate")
    iv = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e"),
    )
    fast = points_in_intervals(li, iv, "l_shipdate", "s", "e").count()
    naive = li.join(
        iv, (li["l_shipdate"] >= iv["s"]) & (li["l_shipdate"] < iv["e"])
    ).count()
    assert fast == naive


def test_count_points_in_intervals_misaligned_edges(spark):
    """Non-bucket-aligned interval bounds exercise the partial-edge
    path; result must equal counting over the generic pair join."""
    from datetime import datetime

    import pyspark.sql.functions as F

    from data_lake_with_spark_spark.operators.asof import (
        count_points_in_intervals,
        points_in_intervals,
    )

    pts = spark.createDataFrame(
        [(i, datetime(2024, 1, 1 + d, h)) for i, (d, h) in enumerate(
            (d, h) for d in range(6) for h in (0, 5, 13, 22))],
        ["pid", "ts"],
    )
    iv = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 6), datetime(2024, 1, 4, 12)),   # misaligned both ends
            (2, datetime(2024, 1, 2, 0), datetime(2024, 1, 3, 0)),    # aligned
            (3, datetime(2024, 1, 5, 23), datetime(2024, 1, 6, 1)),   # sub-day window
            (4, datetime(2023, 6, 1, 0), datetime(2023, 6, 2, 0)),    # no points
        ],
        ["iid", "ws", "we"],
    )
    got = {
        r["iid"]: r["n_points"]
        for r in count_points_in_intervals(pts, iv, "ts", "ws", "we").collect()
    }
    expect = {
        r["iid"]: r["n"]
        for r in points_in_intervals(pts, iv, "ts", "ws", "we")
        .groupBy("iid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expect
    assert 4 not in got  # empty interval absent (inner semantics)


def test_asof_forward_direction(spark):
    """Forward: earliest right with right_ts >= left_ts; strict mode
    excludes the exact match."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 12, m)
    left = spark.createDataFrame([(1, 1, t(10))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [(100, 1, t(5)), (101, 1, t(10)), (102, 1, t(20))],
        ["rid", "k", "rts"],
    )
    fwd = asof_join(
        left, right, ["k"], ["k"], "ts", "rts",
        right_cols=["rid"], direction="forward",
    ).collect()
    assert fwd[0]["rid"] == 101
    strict = asof_join(
        left, right, ["k"], ["k"], "ts", "rts",
        right_cols=["rid"], direction="forward", allow_exact_matches=False,
    ).collect()
    assert strict[0]["rid"] == 102


def test_asof_nearest_tie_and_tolerance(spark):
    """Nearest picks the closer side; backward wins exact ties; the
    tolerance nulls matches beyond the cut (how='left')."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 12, m)
    left = spark.createDataFrame(
        [(1, 1, t(10)), (2, 2, t(10)), (3, 3, t(10))], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [
            (100, 1, t(8)), (101, 1, t(11)),   # fwd closer (2 vs 1)
            (200, 2, t(5)), (201, 2, t(15)),   # exact tie (5/5) → backward
            (300, 3, t(0)),                    # 10 min away; tol 5 min → null
        ],
        ["rid", "k", "rts"],
    )
    out = {
        r["id"]: r
        for r in asof_join(
            left, right, ["k"], ["k"], "ts", "rts",
            right_cols=["rid"], how="left", direction="nearest",
            tolerance_s=300,
        ).collect()
    }
    assert out[1]["rid"] == 101
    assert out[2]["rid"] == 200  # both exactly at the 5-min tolerance → kept, backward wins
    assert out[3]["rid"] is None

    out2 = {
        r["id"]: r
        for r in asof_join(
            left, right, ["k"], ["k"], "ts", "rts",
            right_cols=["rid"], how="left", direction="nearest",
        ).collect()
    }
    assert out2[2]["rid"] == 200  # backward wins the exact tie


def test_asof_direction_validation(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1))], ["id", "k", "ts"]
    )
    import pytest

    with pytest.raises(ValueError):
        asof_join(df, df, ["k"], ["k"], "ts", "ts", direction="sideways")
