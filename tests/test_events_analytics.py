"""Event-analytics operators (operators/events_analytics.py): ordered
funnel semantics and SCD2 interval construction on hand-computed
fixtures, plus int8 quantization round-trip accuracy."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from data_lake_with_spark_spark.operators.events_analytics import (
    funnel_stages,
    funnel_users,
    scd2_history,
)


def _ts(s):
    return datetime.fromisoformat(s)


EVENTS = [
    # user 1 converts the whole funnel in order
    (1, _ts("2026-01-01 10:00:00"), 1, "view"),
    (2, _ts("2026-01-01 11:00:00"), 1, "click"),
    (3, _ts("2026-01-01 12:00:00"), 1, "purchase"),
    # user 2: purchase BEFORE view — must not count past stage 0
    (4, _ts("2026-01-02 09:00:00"), 2, "purchase"),
    (5, _ts("2026-01-02 10:00:00"), 2, "view"),
    # user 3: view then click only
    (6, _ts("2026-01-03 10:00:00"), 3, "view"),
    (7, _ts("2026-01-03 10:30:00"), 3, "click"),
    # user 4: click only — never enters the funnel
    (8, _ts("2026-01-04 10:00:00"), 4, "click"),
    # user 5: click at the SAME instant as view — strictly-after rejects
    (9, _ts("2026-01-05 10:00:00"), 5, "view"),
    (10, _ts("2026-01-05 10:00:00"), 5, "click"),
    (11, _ts("2026-01-05 11:00:00"), 5, "purchase"),
]


def _events(spark):
    return spark.createDataFrame(
        EVENTS, ["event_id", "ts", "user_id", "event_type"]
    )


def test_funnel_stages_strict_ordering(spark):
    got = {
        r["stage"]: (r["stage_idx"], r["n_users"])
        for r in funnel_stages(
            _events(spark), ["view", "click", "purchase"]
        ).collect()
    }
    # entered: 1,2,3,5; clicked strictly after view: 1,3; purchased: 1
    # (user 5's same-instant click fails strict ordering, so their
    # later purchase can't convert either)
    assert got == {"view": (0, 4), "click": (1, 2), "purchase": (2, 1)}


def test_funnel_users_null_from_first_unconverted_stage(spark):
    rows = {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"])
        for r in funnel_users(
            _events(spark), ["view", "click", "purchase"]
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 5}  # user 4 never viewed
    assert rows[1][2] is not None
    assert rows[2][1] is None and rows[2][2] is None
    assert rows[3][1] is not None and rows[3][2] is None
    assert rows[5][1] is None and rows[5][2] is None


SCD_ROWS = [
    (1, _ts("2026-01-01 00:00:00"), 10, "free"),
    (2, _ts("2026-01-02 00:00:00"), 10, "free"),  # no change — collapsed
    (3, _ts("2026-01-03 00:00:00"), 10, "paid"),
    (4, _ts("2026-01-04 00:00:00"), 10, "free"),
    (5, _ts("2026-01-01 00:00:00"), 20, "paid"),
]


def test_scd2_history_intervals(spark):
    df = spark.createDataFrame(SCD_ROWS, ["event_id", "ts", "user_id", "level"])
    out = scd2_history(df, ["user_id"], "level", "ts", tiebreak_cols=["event_id"])
    key = lambda t: (t[0], t[2])  # noqa: E731 — (user, valid_from) unique
    rows = sorted(
        (
            (r["user_id"], r["level"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in out.collect()
        ),
        key=key,
    )
    assert rows == sorted(
        [
            (10, "free", _ts("2026-01-01 00:00:00"), _ts("2026-01-03 00:00:00"), False),
            (10, "paid", _ts("2026-01-03 00:00:00"), _ts("2026-01-04 00:00:00"), False),
            (10, "free", _ts("2026-01-04 00:00:00"), None, True),
            (20, "paid", _ts("2026-01-01 00:00:00"), None, True),
        ],
        key=key,
    )
    # intervals are half-open and contiguous per key; exactly one
    # current row per key
    current = [r for r in rows if r[4]]
    assert {r[0] for r in current} == {10, 20}


def test_scd2_history_null_attribute_transitions(spark):
    """NULL is a real state: paid→NULL opens an interval, NULL→NULL
    collapses, NULL→free opens another, and a key that starts at NULL
    still gets its first interval."""
    rows_in = [
        (1, _ts("2026-01-01 00:00:00"), 10, "paid"),
        (2, _ts("2026-01-02 00:00:00"), 10, None),  # paid → NULL: change
        (3, _ts("2026-01-03 00:00:00"), 10, None),  # NULL → NULL: collapse
        (4, _ts("2026-01-04 00:00:00"), 10, "free"),  # NULL → free: change
        (5, _ts("2026-01-01 00:00:00"), 30, None),  # first row, NULL attr
        (6, _ts("2026-01-02 00:00:00"), 30, None),  # collapse
    ]
    schema = "event_id int, ts timestamp, user_id int, level string"
    df = spark.createDataFrame(rows_in, schema)
    out = scd2_history(df, ["user_id"], "level", "ts", tiebreak_cols=["event_id"])
    key = lambda t: (t[0], t[2])  # noqa: E731
    rows = sorted(
        (
            (r["user_id"], r["level"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in out.collect()
        ),
        key=key,
    )
    assert rows == sorted(
        [
            (10, "paid", _ts("2026-01-01 00:00:00"), _ts("2026-01-02 00:00:00"), False),
            (10, None, _ts("2026-01-02 00:00:00"), _ts("2026-01-04 00:00:00"), False),
            (10, "free", _ts("2026-01-04 00:00:00"), None, True),
            (30, None, _ts("2026-01-01 00:00:00"), None, True),
        ],
        key=key,
    )


def test_quantize_int8_roundtrip(spark):
    from data_lake_with_spark_spark.operators.similarity import quantize_int8

    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    rows = {r["vec_id"]: r for r in quantize_int8(emb).collect()}
    assert rows[1]["qvec"] == [127, -64, 32, 0]  # round(0.25*127)=round(31.75)=32
    assert abs(rows[1]["scale"] - 127.0) < 1e-6
    # max |q| is always exactly 127 for nonzero vectors
    assert max(abs(v) for v in rows[1]["qvec"]) == 127
    # zero vector: NULL scale, all-zero qvec
    assert rows[2]["scale"] is None
    assert rows[2]["qvec"] == [0, 0, 0, 0]
    # dequantization error bounded by 0.5/scale
    deq = [v / rows[1]["scale"] for v in rows[1]["qvec"]]
    for d, x in zip(deq, [1.0, -0.5, 0.25, 0.0]):
        assert abs(d - x) <= 0.5 / rows[1]["scale"] + 1e-9


def test_cohort_retention_hand_computed(spark):
    from data_lake_with_spark_spark.operators.events_analytics import (
        cohort_retention,
    )

    rows = [
        (1, "2024-01-01 10:00:00"),  # u1 cohort day 1
        (1, "2024-01-03 09:00:00"),  # u1 offset 2
        (2, "2024-01-01 23:59:59"),  # u2 cohort day 1
        (2, "2024-01-01 00:00:01"),  # same day, still offset 0 once
        (3, "2024-01-02 05:00:00"),  # u3 cohort day 2
        (3, "2024-01-03 05:00:00"),  # u3 offset 1
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"]).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts"
    )
    got = {
        (r["cohort"].strftime("%Y-%m-%d"), r["offset"]): r["n_users"]
        for r in cohort_retention(df, period="day").collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,   # u1, u2
        ("2024-01-01", 2): 1,   # u1
        ("2024-01-02", 0): 1,   # u3
        ("2024-01-02", 1): 1,   # u3
    }


def test_cohort_retention_rejects_unknown_period(spark):
    import pytest

    from data_lake_with_spark_spark.operators.events_analytics import (
        cohort_retention,
    )

    df = spark.createDataFrame([(1, "2024-01-01")], ["user_id", "ts"])
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, period="quarter")


def test_cohort_retention_shuffle_budget(spark, sf_dir):
    """Plan gate (round-6 verdict #5): cohort retention is
    partial-aggregable throughout — per-user min groupBy, activity
    distinct, broadcast join of the (small) cohort frame, and the
    two-phase countDistinct. Pinned at ≤5 Exchange nodes and two
    source scans (first-event pass + activity pass — inherent to the
    cohort definition), no Python stages."""
    from data_lake_with_spark_spark import queries as Q

    df = Q.queries()["q123_cohort_retention"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Scan parquet") == 2
    assert p.count("Exchange") <= 5
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_attribute_conversions_last_touch(spark):
    """The MOST RECENT in-window click wins; out-of-window and
    touchless conversions emit NULL attribution rather than drops."""
    import datetime as dt

    from data_lake_with_spark_spark.operators.events_analytics import (
        attribute_conversions,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, mins, user, typ):
        return (eid, t0 + dt.timedelta(minutes=mins), user, typ)

    rows = [
        ev(1, 0, 1, "click"),
        ev(2, 5, 1, "click"),      # latest click before the purchase
        ev(3, 10, 1, "purchase"),  # → touch 2, gap 5 min
        ev(4, 100, 1, "purchase"), # 95 min since click 2 → NULL
        ev(5, 0, 2, "purchase"),   # no click at all → NULL
        ev(6, 3, 3, "view"),
        ev(7, 4, 3, "purchase"),   # views don't attribute → NULL
    ]
    out = {
        r["conversion_id"]: r
        for r in attribute_conversions(
            spark.createDataFrame(
                rows, ["event_id", "ts", "user_id", "event_type"]
            ),
            max_gap_s=1800,
        ).collect()
    }
    assert len(out) == 4
    assert out[3]["touch_id"] == 2 and out[3]["gap_us"] == 5 * 60 * 1_000_000
    assert out[4]["touch_id"] is None and out[4]["gap_us"] is None
    assert out[5]["touch_id"] is None
    assert out[7]["touch_id"] is None


def test_multitouch_attribution_range_window(spark):
    """Credit splits over every click strictly inside (t−30min, t);
    window-edge and touchless conversions report NULL credit."""
    import datetime as dt

    from data_lake_with_spark_spark.operators.events_analytics import (
        multitouch_attribution,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, mins, user, typ):
        return (eid, t0 + dt.timedelta(minutes=mins), user, typ)

    rows = [
        ev(1, 0, 1, "click"),
        ev(2, 20, 1, "click"),
        ev(3, 29, 1, "purchase"),   # both clicks in window → credit 1/2
        ev(4, 31, 1, "purchase"),   # click 1 now 31 min old → only click 2
        ev(5, 0, 2, "purchase"),    # no clicks → NULL
    ]
    out = {
        r["conversion_id"]: r
        for r in multitouch_attribution(
            spark.createDataFrame(
                rows, ["event_id", "ts", "user_id", "event_type"]
            ),
            window_s=1800,
        ).collect()
    }
    assert out[3]["n_touches"] == 2 and out[3]["credit"] == 0.5
    assert out[4]["n_touches"] == 1 and out[4]["credit"] == 1.0
    assert out[5]["n_touches"] == 0 and out[5]["credit"] is None


def test_event_lift_hand_case(spark):
    """3 users: {A,B}, {A}, {B} → n_A=2, n_B=2, n_both=1, lift =
    (1·3)/(2·2) = 0.75."""
    from data_lake_with_spark_spark.operators.events_analytics import (
        event_lift,
    )

    rows = [(1, "A"), (1, "B"), (2, "A"), (3, "B"), (1, "A")]
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = event_lift(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("A", "B")
    assert r["n_a"] == 2 and r["n_b"] == 2 and r["n_both"] == 1
    assert r["lift"] == 0.75


def test_attribute_conversions_wide_ids_and_domain_guard(spark):
    """Regression (r7 advisor): lpad TRUNCATES past the pad width, so
    event ids >= 10^12 used to corrupt both the (ts, id) order and the
    decoded touch_id. The 20-wide pad covers the full bigint span —
    two same-timestamp clicks with 13-digit ids must attribute to the
    LARGER id — and negative ids raise instead of mis-sorting."""
    import datetime as dt

    import pytest
    from pyspark.sql import utils as spark_utils

    from data_lake_with_spark_spark.operators.events_analytics import (
        attribute_conversions,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    big_a, big_b = 9_999_999_999_999, 1_000_000_000_042  # 13 digits
    rows = [
        (big_b, t0, 1, "click"),
        (big_a, t0, 1, "click"),  # same ts: larger id is the max key
        (7, t0 + dt.timedelta(minutes=5), 1, "purchase"),
    ]
    out = attribute_conversions(
        spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"]),
        max_gap_s=1800,
    ).collect()
    assert len(out) == 1 and out[0]["touch_id"] == big_a

    bad = [(-5, t0, 1, "click"), (6, t0, 1, "purchase")]
    with pytest.raises(Exception, match="lexicographic touch key"):
        attribute_conversions(
            spark.createDataFrame(bad, ["event_id", "ts", "user_id", "event_type"]),
        ).collect()


def test_rate_spikes_integer_cross_multiplication(spark):
    """Hand-built hourly counts: a 40-event hour after a (2,3,4,3)
    baseline (sum 12, n 4) flags at factor 3 (40·4 > 3·12); the
    first bucket (no baseline) never flags; a bucket exactly AT the
    factor boundary does not flag (strict >)."""
    import datetime as dt

    import pytest

    from data_lake_with_spark_spark.operators.events_analytics import (
        rate_spikes,
    )

    def hour(h):
        return dt.datetime(2024, 1, 1, h, 0, 0)

    rows = []
    for h, n in [(0, 2), (1, 3), (2, 4), (3, 3), (4, 40), (5, 9)]:
        rows += [("click", hour(h))] * n
    # a second type: constant rate, never flags
    for h in range(6):
        rows += [("view", hour(h))] * 5
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        (r["event_type"], r["bucket_ts"].hour): r
        for r in rate_spikes(df, factor=3, trailing=4).collect()
    }
    spike = out[("click", 4)]
    assert spike["is_spike"] and spike["n_events"] == 40
    assert spike["baseline_sum"] == 12 and spike["baseline_n"] == 4
    assert not out[("click", 0)]["is_spike"]  # no baseline
    assert out[("click", 0)]["baseline_n"] == 0
    # hour 5: baseline (3,4,3,40)=50/4=12.5; 9 < 3*12.5 → quiet
    assert not out[("click", 5)]["is_spike"]
    assert all(not out[("view", h)]["is_spike"] for h in range(6))
    # boundary: 15 events after (5,5,5,5) at factor 3 → 15·4 == 3·20,
    # strict > keeps it quiet; 16 flags
    b = [("x", hour(h)) for h in range(4) for _ in range(5)]
    at = spark.createDataFrame(
        b + [("x", hour(4))] * 15, "event_type string, ts timestamp"
    )
    over = spark.createDataFrame(
        b + [("x", hour(4))] * 16, "event_type string, ts timestamp"
    )
    get = lambda d: [  # noqa: E731
        r["is_spike"] for r in rate_spikes(d, factor=3).collect()
        if r["bucket_ts"].hour == 4
    ][0]
    assert get(at) is False and get(over) is True
    with pytest.raises(ValueError):
        rate_spikes(df, factor=0)
    with pytest.raises(ValueError):
        rate_spikes(df, trailing=0)
