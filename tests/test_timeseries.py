"""resample_ffill: grid completeness, forward-fill semantics,
leading-gap NULLs, exact bucket sums."""

from __future__ import annotations

from data_lake_with_spark_spark.operators.timeseries import resample_ffill


def _df(spark):
    rows = [
        # key a: hours 00 and 03 observed; 01-02 must carry 1.5
        ("a", "2024-01-01 00:10:00", 1.0),
        ("a", "2024-01-01 00:50:00", 0.5),
        ("a", "2024-01-01 03:20:00", 7.0),
        # key b: first obs at hour 02 — hours 00-01 stay NULL
        ("b", "2024-01-01 02:05:00", 2.0),
    ]
    return spark.createDataFrame(rows, ["event_type", "ts", "value"]).selectExpr(
        "event_type", "CAST(ts AS TIMESTAMP) AS ts", "value"
    )


def test_resample_ffill_semantics(spark):
    out = {
        (r["key"], r["bucket"].strftime("%H")): (r["total_value"], r["filled"])
        for r in resample_ffill(_df(spark)).collect()
    }
    # dense grid: 2 keys x 4 hours
    assert len(out) == 8
    assert out[("a", "00")] == (1.5, False)   # exact decimal bucket sum
    assert out[("a", "01")] == (1.5, True)    # carried
    assert out[("a", "02")] == (1.5, True)
    assert out[("a", "03")] == (7.0, False)
    assert out[("b", "00")] == (None, True)   # before first obs: NULL
    assert out[("b", "01")] == (None, True)
    assert out[("b", "02")] == (2.0, False)
    assert out[("b", "03")] == (2.0, True)
