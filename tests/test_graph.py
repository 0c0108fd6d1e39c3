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


def test_pagerank_personalized_hand_case(spark):
    """Symmetric a-b, b-c path, seed {a}: after one iteration the
    teleport holds a at 0.15, b gets the full damped mass 0.85, c
    nothing yet; total rank mass stays 1 (Σs = 1)."""
    from data_lake_with_spark_spark.operators.graph import (
        pagerank_personalized,
    )

    e = _sym_edges(spark, [("a", "b"), ("b", "c")])
    seeds = spark.createDataFrame([("a",)], ["node"])
    r1 = {
        r["node"]: r["rank"]
        for r in pagerank_personalized(e, seeds, iterations=1).collect()
    }
    # (1-d) is the COMPUTED 1.0-0.85 (one ulp off the 0.15 literal —
    # the float-literal trap, mirrored in the oracles); c carries no
    # rank yet (zero-rank nodes are absent-as-zero until mass arrives)
    assert r1 == {"a": 1.0 - 0.85, "b": 0.85}
    for it in (1, 2, 3):
        rs = [
            r["rank"]
            for r in pagerank_personalized(e, seeds, iterations=it).collect()
        ]
        assert abs(sum(rs) - 1.0) < 1e-9  # mass conservation
    # seed-relative authority: with seed {a}, a-side nodes outrank
    # the far end; with seed {c} the ordering flips
    r3a = {
        r["node"]: r["rank"]
        for r in pagerank_personalized(e, seeds, iterations=3).collect()
    }
    r3c = {
        r["node"]: r["rank"]
        for r in pagerank_personalized(
            e, spark.createDataFrame([("c",)], ["node"]), iterations=3
        ).collect()
    }
    assert r3a["a"] > r3a["c"] and r3c["c"] > r3c["a"]
    with pytest.raises(ValueError):
        pagerank_personalized(e, seeds, iterations=0)
    with pytest.raises(ValueError):
        pagerank_personalized(e, seeds, damping=1.0)


def test_hits_hand_case_and_separation(spark):
    """Directed path a→b→c, one iteration: integer scores (h0=1, no
    normalization — the rational formulation): authorities b=c=1,
    hubs a=b=1, all EXACT. On a star hub→{spokes}, two iterations
    give the hub all hub mass (16) and zero authority."""
    from data_lake_with_spark_spark.operators.graph import hits_fixed

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {r["node"]: (int(r["authority"]), int(r["hub"]))
           for r in hits_fixed(e, iterations=1).collect()}
    assert got == {
        "a": (0, 1),
        "b": (1, 1),
        "c": (1, 0),
    }
    star = spark.createDataFrame(
        [("h", f"s{i}") for i in range(4)], "src string, dst string"
    )
    # integer accumulation: a1(s_i)=1, h1(h)=4, a2(s_i)=4, h2(h)=16
    out = {r["node"]: r for r in hits_fixed(star, iterations=2).collect()}
    assert int(out["h"]["hub"]) == 16 and int(out["h"]["authority"]) == 0
    for i in range(4):
        assert int(out[f"s{i}"]["authority"]) == 4
        assert int(out[f"s{i}"]["hub"]) == 0
    with pytest.raises(ValueError):
        hits_fixed(star, iterations=0)


def test_triangle_stats_hand_cases(spark):
    """K4 has 4 triangles, 12 wedges, transitivity 1.0; a 4-path has
    none; input canonicalization collapses duplicates, both
    directions, and self-loops."""
    from data_lake_with_spark_spark.operators.graph import triangle_stats

    def stats(pairs):
        e = spark.createDataFrame(pairs, "src string, dst string")
        return triangle_stats(e).collect()[0]

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    r = stats(k4)
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (
        4, 6, 12, 4,
    )
    assert r["global_clustering"] == 1.0
    path = stats([("a", "b"), ("b", "c"), ("c", "d")])
    assert path["n_triangles"] == 0 and path["n_wedges"] == 2
    assert path["global_clustering"] == 0.0
    # triangle + pendant: wedges C(2,2)*2 + C(3,2) = 5, one triangle
    tp = stats([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    assert tp["n_triangles"] == 1 and tp["n_wedges"] == 5
    # noisy input: dup edges, reversed copies, self-loop — same K4
    noisy = k4 + [(b, a) for a, b in k4] + [("a", "a"), ("a", "b")]
    rn = stats(noisy)
    assert (rn["n_edges"], rn["n_triangles"]) == (6, 4)


def test_label_propagation_hand_cases(spark):
    """Path s1-a-b with seed s1=X: one round labels a, two rounds
    reach b; majority voting with the (votes DESC, label ASC)
    tie-break; seeds are clamped over any neighbor majority."""
    from data_lake_with_spark_spark.operators.graph import label_propagation

    import pytest as _pt

    def run(pairs, seed_rows, iters):
        e = spark.createDataFrame(pairs, "src string, dst string")
        s = spark.createDataFrame(seed_rows, "node string, label string")
        return {
            r["node"]: r["label"]
            for r in label_propagation(e, s, iterations=iters).collect()
        }

    path = [("s1", "a"), ("a", "b")]
    assert run(path, [("s1", "X")], 1) == {"s1": "X", "a": "X"}
    assert run(path, [("s1", "X")], 2) == {"s1": "X", "a": "X", "b": "X"}
    # majority: v has two Y-seeds and one X-seed as neighbors
    maj = [("y1", "v"), ("y2", "v"), ("x1", "v")]
    seeds = [("y1", "Y"), ("y2", "Y"), ("x1", "X")]
    assert run(maj, seeds, 1)["v"] == "Y"
    # tie at one vote each -> label ASC wins (deterministic)
    tie = [("y1", "v"), ("x1", "v")]
    assert run(tie, [("y1", "Y"), ("x1", "X")], 1)["v"] == "X"
    # clamp: a seed surrounded by the other label keeps its own
    clamp = [("y1", "s"), ("y2", "s")]
    assert run(clamp, [("y1", "Y"), ("y2", "Y"), ("s", "X")], 2)["s"] == "X"
    with _pt.raises(ValueError):
        run(path, [("s1", "X")], 0)


def test_related_items_hand_case(spark):
    """Baskets {1:(a,b,c), 2:(a,b), 3:(a,d)}: n_a=3, n_b=2, n_c=1,
    n_d=1, n_ab=2, n_ac=1, n_bc=1, n_ad=1. score(b|a)=4/6, score
    symmetric; duplicate (basket,item) rows must not inflate counts;
    rank caps at k with (score DESC, other ASC) ties."""
    from data_lake_with_spark_spark.operators.graph import related_items

    import pytest as _pt

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "d"),
        (3, "a"),  # duplicate row: must collapse
    ]
    b = spark.createDataFrame(rows, "basket int, item string")
    out = related_items(b, k=2)
    got = {
        (r["item"], r["rank"]): (r["other"], r["n_ab"], r["score"])
        for r in out.collect()
    }
    # a's best is b: 2^2/(3*2) = 0.666..; then c and d tie at
    # 1/(3*1) -> other ASC picks c
    assert got[("a", 1)] == ("b", 2, 4 / 6)
    assert got[("a", 2)] == ("c", 1, 1 / 3)
    # b: a first (4/6), then c (1/2)
    assert got[("b", 1)] == ("a", 2, 4 / 6)
    assert got[("b", 2)] == ("c", 1, 1 / 2)
    # d only co-occurs with a
    assert got[("d", 1)] == ("a", 1, 1 / 3)
    assert ("d", 2) not in got
    with _pt.raises(ValueError):
        related_items(b, k=0)


def test_hub_clustering_hand_case(spark):
    """Triangle a-b-c plus pendant c-d: deg c=3 (top hub), local
    clustering of c = 2*1/(3*2) = 1/3; a and b = 1.0 (deg 2, one
    triangle); d has deg 1 -> 0.0 by convention. pos follows
    (deg DESC, node ASC)."""
    from data_lake_with_spark_spark.operators.graph import hub_clustering

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    out = {r["node"]: r for r in hub_clustering(e, k=10).collect()}
    assert out["c"]["deg"] == 3 and out["c"]["n_tri"] == 1
    assert out["c"]["local_clustering"] == 1 / 3
    assert out["a"]["local_clustering"] == 1.0
    assert out["d"]["n_tri"] == 0 and out["d"]["local_clustering"] == 0.0
    assert out["c"]["pos"] == 1  # highest degree
    # k caps the audit: only the top-2 hubs survive
    top2 = hub_clustering(e, k=2).collect()
    assert sorted(r["node"] for r in top2) == ["a", "c"]
