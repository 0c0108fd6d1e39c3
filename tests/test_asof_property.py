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
