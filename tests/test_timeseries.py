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


def test_resample_ffill_shuffle_budget(spark, sf_dir):
    """Plan gate (round-6 verdict #5): the module claim is two
    CORPUS-SCALE shuffles (bucket agg + fill window) with the grid
    and bounds derived from the agg output (broadcast), and the
    events source scanned exactly once — the fill window never
    re-reads the events. This gate CAUGHT the violation on first run:
    per-consumer column pruning defeats exchange reuse, so bounds and
    the key set each re-scanned the parquet source (3 scans total);
    the aggregate is now localCheckpointed. Pinned so a regression
    that re-reads the source or adds a corpus shuffle turns red."""
    from data_lake_with_spark_spark import queries as Q

    df = Q.queries()["q122_resample_ffill"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Scan parquet") == 0  # agg checkpointed: no re-scan
    assert p.count("Exchange") <= 5
    assert p.count("BroadcastExchange") >= 2  # bounds + grid ride broadcast
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
