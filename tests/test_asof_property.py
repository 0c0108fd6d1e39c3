"""Property test: asof_join equals the obvious per-row model.

For arbitrary (key, ts) left rows and unique-(key, ts) right rows,
the union-sort as-of join must return, per left row, the right row
with the greatest right_ts <= left_ts for that key (inclusive mode).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lake_with_spark_spark.operators.asof import asof_join

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=50)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12),
    right=st.dictionaries(st.tuples(KEYS, TS), st.floats(0, 100), max_size=12),
)
def test_asof_matches_model(spark, left, right):
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left)]
    right_rows = [(k, t, v) for (k, t), v in right.items()]
    ldf = spark.createDataFrame(left_rows, ["lid", "k", "t"])
    if right_rows:
        rdf = spark.createDataFrame(right_rows, ["rk", "rt", "px"])
    else:
        rdf = spark.createDataFrame([], "rk int, rt int, px double")

    out = asof_join(
        ldf, rdf, ["k"], ["rk"], "t", "rt", right_cols=["px"], how="left"
    )
    got = {r["lid"]: r["px"] for r in out.collect()}

    expect = {}
    for lid, k, t in left_rows:
        best = None
        for rk, rt, v in right_rows:
            if rk == k and rt <= t and (best is None or rt > best[0]):
                best = (rt, v)
        expect[lid] = best[1] if best else None
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(KEYS, TS), min_size=1, max_size=10),
    right=st.dictionaries(st.tuples(KEYS, TS), st.floats(0, 100), max_size=10),
    tol=st.one_of(st.none(), st.integers(min_value=0, max_value=20)),
)
def test_asof_nearest_matches_model(spark, left, right, tol):
    """direction='nearest' equals the per-row model: closer of the
    backward/forward candidates inside the tolerance, backward
    winning exact-distance ties (integer ts cast to epoch seconds)."""
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left)]
    right_rows = [(k, t, v) for (k, t), v in right.items()]
    ldf = spark.createDataFrame(left_rows, ["lid", "k", "t"])
    if right_rows:
        rdf = spark.createDataFrame(right_rows, ["rk", "rt", "px"])
    else:
        rdf = spark.createDataFrame([], "rk int, rt int, px double")

    out = asof_join(
        ldf, rdf, ["k"], ["rk"], "t", "rt",
        right_cols=["px"], how="left", direction="nearest", tolerance_s=tol,
    )
    got = {r["lid"]: r["px"] for r in out.collect()}

    expect = {}
    for lid, k, t in left_rows:
        bwd = fwd = None
        for rk, rt, v in right_rows:
            if rk != k:
                continue
            if rt <= t and (bwd is None or rt > bwd[0]):
                bwd = (rt, v)
            if rt >= t and (fwd is None or rt < fwd[0]):
                fwd = (rt, v)
        if bwd is not None and tol is not None and t - bwd[0] > tol:
            bwd = None
        if fwd is not None and tol is not None and fwd[0] - t > tol:
            fwd = None
        if bwd is not None and (fwd is None or (t - bwd[0]) <= (fwd[0] - t)):
            expect[lid] = bwd[1]
        elif fwd is not None:
            expect[lid] = fwd[1]
        else:
            expect[lid] = None
    assert got == expect
