from __future__ import annotations

import pytest

from data_lake_with_spark_spark.operators.graph import pagerank_fixed


def _sym_edges(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src string, dst string")


def test_pagerank_path_graph_hand_case(spark):
    """a-b-c path (symmetric): after one iteration b holds
    0.05 + 0.85*(1/3 + 1/3), the endpoints 0.05 + 0.85*(1/6); total
    rank mass stays 1 every iteration."""
    e = _sym_edges(spark, [("a", "b"), ("b", "c")])
    r1 = {r["node"]: r["rank"] for r in pagerank_fixed(e, iterations=1).collect()}
    base = (1.0 - 0.85) / 3
    assert abs(r1["b"] - (base + 0.85 * (1 / 3 + 1 / 3))) < 1e-12
    assert abs(r1["a"] - (base + 0.85 * (1 / 6))) < 1e-12
    assert r1["a"] == r1["c"]  # symmetry is exact, not approximate
    for it in (1, 2, 3):
        rs = [r["rank"] for r in pagerank_fixed(e, iterations=it).collect()]
        assert abs(sum(rs) - 1.0) < 1e-9  # mass conservation


def test_pagerank_authority_ordering_and_validation(spark):
    """A hub wired to every spoke outranks the spokes; dangling nodes
    and bad params raise."""
    e = _sym_edges(spark, [("hub", f"s{i}") for i in range(5)])
    r = {x["node"]: x["rank"] for x in pagerank_fixed(e, iterations=3).collect()}
    assert all(r["hub"] > r[f"s{i}"] for i in range(5))
    dangling = spark.createDataFrame(
        [("a", "b")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="dangling"):
        pagerank_fixed(dangling, validate=True)
    # validate defaults OFF (the check is an extra full-edge action
    # per call): a dangler then simply receives no contributions —
    # 'a' has no in-edges so its rank row drops, 'b' still ranks
    r_noval = {
        x["node"]: x["rank"]
        for x in pagerank_fixed(dangling, iterations=1).collect()
    }
    assert set(r_noval) == {"b"}
    with pytest.raises(ValueError):
        pagerank_fixed(e, iterations=0)
    with pytest.raises(ValueError):
        pagerank_fixed(e, damping=1.0)
