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
    # validate defaults ON: an unvetted edge frame with danglers
    # fails loudly instead of silently dropping rank rows
    with pytest.raises(ValueError, match="dangling"):
        pagerank_fixed(dangling, iterations=1)
    # pre-validated callers opt OUT (the check is an extra full-edge
    # action per call): a dangler then simply receives no
    # contributions — 'a' has no in-edges so its rank row drops,
    # 'b' still ranks
    r_noval = {
        x["node"]: x["rank"]
        for x in pagerank_fixed(
            dangling, iterations=1, validate=False
        ).collect()
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


def _sym_weighted(spark, triples):
    rows = [(a, b, w) for a, b, w in triples] + [
        (b, a, w) for a, b, w in triples
    ]
    return spark.createDataFrame(rows, "src string, dst string, w long")


def test_pagerank_weighted_unit_weights_identical(spark):
    """w=1 on every edge is BIT-identical to the unweighted path
    (rank·1/Σ1 is the same IEEE arithmetic as rank/outdeg) — the
    degenerate-case contract that keeps the weighted variant from
    forking the float story."""
    from data_lake_with_spark_spark.operators.graph import (
        pagerank_personalized,
    )

    e = _sym_weighted(
        spark, [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("a", "d", 1)]
    )
    plain = {
        r["node"]: r["rank"]
        for r in pagerank_fixed(e, iterations=3, validate=False).collect()
    }
    weighted = {
        r["node"]: r["rank"]
        for r in pagerank_fixed(
            e, iterations=3, validate=False, weight_col="w"
        ).collect()
    }
    assert plain == weighted  # exact, not approximate
    seeds = spark.createDataFrame([("a",)], ["node"])
    p_plain = {
        r["node"]: r["rank"]
        for r in pagerank_personalized(e, seeds, iterations=2).collect()
    }
    p_weighted = {
        r["node"]: r["rank"]
        for r in pagerank_personalized(
            e, seeds, iterations=2, weight_col="w"
        ).collect()
    }
    assert p_plain == p_weighted


def test_pagerank_weighted_mass_follows_weights(spark):
    """Star with one heavy spoke: the hub's mass splits ∝ weights, so
    the weight-9 spoke outranks the weight-1 spokes; with equal
    weights they tie. Zero/negative total out-weight raises under
    validate (the sampling all-zero-weights rule)."""
    e = _sym_weighted(
        spark,
        [("hub", "heavy", 9), ("hub", "s1", 1), ("hub", "s2", 1)],
    )
    r = {
        x["node"]: x["rank"]
        for x in pagerank_fixed(e, iterations=2, weight_col="w").collect()
    }
    assert r["heavy"] > r["s1"] and r["s1"] == r["s2"]
    zero = _sym_weighted(spark, [("a", "b", 0)])
    with pytest.raises(ValueError, match="out-weight"):
        pagerank_fixed(zero, iterations=1, weight_col="w")


def test_label_propagation_weighted_votes(spark):
    """One weight-5 edge to an X-seed beats two weight-1 edges to
    Y-seeds; with weight_col omitted the same graph votes by edge
    COUNT and Y wins — the exact semantic the weight column adds."""
    from data_lake_with_spark_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [("n", "x1", 5), ("n", "y1", 1), ("n", "y2", 1)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame(
        [("x1", "X"), ("y1", "Y"), ("y2", "Y")], ["node", "label"]
    )
    weighted = {
        r["node"]: r["label"]
        for r in label_propagation(
            edges, seeds, iterations=1, weight_col="w"
        ).collect()
    }
    assert weighted["n"] == "X"
    plain = {
        r["node"]: r["label"]
        for r in label_propagation(edges, seeds, iterations=1).collect()
    }
    assert plain["n"] == "Y"
    # parallel edges SUM their weights during symmetrization
    multi = spark.createDataFrame(
        [("n", "y1", 3), ("y1", "n", 3), ("n", "x1", 5)],
        "src string, dst string, w long",
    )
    summed = {
        r["node"]: r["label"]
        for r in label_propagation(
            multi, seeds, iterations=1, weight_col="w"
        ).collect()
    }
    assert summed["n"] == "Y"  # 3+3 = 6 beats 5


def test_hits_overflow_raises_not_zero(spark):
    """An overflow past DECIMAL(38,0) must RAISE, never reach the
    output as a coalesced 0 (advisor r9). Under ANSI mode (the Spark 4
    default, active here) the SUM itself raises ARITHMETIC_OVERFLOW;
    under non-ANSI it returns NULL silently and hits_fixed's
    per-iteration null assert raises ArithmeticError — either way the
    failure is loud. A dense complete graph blows past 10^38 within a
    dozen iterations."""
    from data_lake_with_spark_spark.operators.graph import hits_fixed

    n = 60
    rows = [(f"v{i}", f"v{j}") for i in range(n) for j in range(n) if i != j]
    e = spark.createDataFrame(rows, "src string, dst string")
    with pytest.raises(Exception, match="(?i)overflow"):
        hits_fixed(e, iterations=12)


def test_hits_overflow_raises_under_non_ansi(spark):
    """The r15 job-count fold gates the per-iteration NULL probe on
    ANSI being OFF (under ANSI the SUM itself raises, making the
    probe a redundant job) — so the non-ANSI path must still be loud:
    with ansi disabled the probe is the ONLY guard, and it must fire.
    """
    from data_lake_with_spark_spark.operators.graph import hits_fixed

    n = 60
    rows = [(f"v{i}", f"v{j}") for i in range(n) for j in range(n) if i != j]
    e = spark.createDataFrame(rows, "src string, dst string")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="(?i)overflow"):
            hits_fixed(e, iterations=12)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")


def test_related_items_min_count_floor(spark):
    """min_count cuts sub-floor pairs BEFORE symmetrize+rank;
    min_count=1 is the identity. The floor changes membership, never
    the surviving pairs' counts/scores."""
    from data_lake_with_spark_spark.operators.graph import related_items

    rows = (
        [(b, i) for b in ("b1", "b2", "b3") for i in ("a", "b")]
        + [("b1", "c")]  # (a,c)/(b,c) co-occur once
    )
    df = spark.createDataFrame(rows, ["basket", "item"])
    full = related_items(df, k=5)
    floored = related_items(df, k=5, min_count=2)
    full_pairs = {(r["item"], r["other"]): r["n_ab"] for r in full.collect()}
    fl_pairs = {(r["item"], r["other"]): r["n_ab"] for r in floored.collect()}
    assert full_pairs[("a", "b")] == 3 and ("a", "c") in full_pairs
    assert ("a", "c") not in fl_pairs and ("c", "a") not in fl_pairs
    assert fl_pairs == {("a", "b"): 3, ("b", "a"): 3}
    ident = related_items(df, k=5, min_count=1)
    assert sorted(map(tuple, ident.collect())) == sorted(
        map(tuple, full.collect())
    )
    with pytest.raises(ValueError, match="min_count"):
        related_items(df, min_count=0)


def test_hits_weighted_integer_exact(spark):
    """Weighted HITS stays exact-integer (products of bigint weights
    and integer scores inside DECIMAL(38,0)); w=1 is identical to the
    unweighted path; a weight-9 edge pulls authority toward its
    target vs an equal-degree weight-1 sibling."""
    from data_lake_with_spark_spark.operators.graph import hits_fixed

    e1 = spark.createDataFrame(
        [("u", "a", 1), ("u", "b", 1), ("v", "a", 1)],
        "src string, dst string, w long",
    )
    plain = sorted(map(tuple, hits_fixed(e1, iterations=2).collect()))
    unit = sorted(
        map(tuple, hits_fixed(e1, iterations=2, weight_col="w").collect())
    )
    assert plain == unit
    e9 = spark.createDataFrame(
        [("u", "a", 9), ("u", "b", 1)], "src string, dst string, w long"
    )
    r = {
        x["node"]: (int(x["authority"]), int(x["hub"]))
        for x in hits_fixed(e9, iterations=1, weight_col="w").collect()
    }
    # h0=1: a(a)=9, a(b)=1, h(u)=9*9+1*1=82
    assert r["a"][0] == 9 and r["b"][0] == 1 and r["u"][1] == 82


def test_hub_clustering_pushdown_equals_full_attribution(spark):
    """Regression gate for the round-12 flake (MEASUREMENTS_r12 §5):
    the members-pushdown triangle attribution must EQUAL counting the
    hub's triangles from the FULL (unrestricted) triangle set — the
    pushdown is an I/O optimization, never a semantic change — and
    repeated evaluations must be identical (the old three-
    overlapping-branch union-dedup intermittently let duplicate
    wedges through, inflating n_tri)."""
    import random

    import pyspark.sql.functions as F

    from data_lake_with_spark_spark.operators import graph

    rnd = random.Random(12)
    # a hub-skewed random graph: multi-hub triangles (the overlap
    # shape that triggered the duplicates) are common
    edges = set()
    for _ in range(1500):
        a = rnd.randint(0, 20) if rnd.random() < 0.5 else rnd.randint(0, 200)
        b = rnd.randint(0, 200)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    e_df = spark.createDataFrame(sorted(edges), "src int, dst int")
    out1 = sorted(map(tuple, graph.hub_clustering(e_df, k=15).collect()))
    out2 = sorted(map(tuple, graph.hub_clustering(e_df, k=15).collect()))
    assert out1 == out2  # run-to-run identical
    # full-set ground truth for every audited hub
    e = graph._canonical_undirected(e_df, "src", "dst")
    deg = graph._degrees(e)
    tri_all = graph._triangles(graph._oriented(e, deg)).localCheckpoint()
    full = {
        r["node"]: r["n"]
        for r in tri_all.select(F.col("u").alias("node"))
        .unionByName(tri_all.select(F.col("v").alias("node")))
        .unionByName(tri_all.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for node, _deg, n_tri, _lc, _pos in out1:
        assert n_tri == full.get(node, 0), (node, n_tri, full.get(node, 0))


def test_run_concurrent_order_and_exception_propagation():
    """run_concurrent (the §2.6 overlap helper the maintenance ops use)
    must return results in input order and surface a leg's exception —
    the RI delta core's negative-support integrity raise rides on it."""
    import time

    from data_lake_with_spark_spark.session import run_concurrent

    def slow():
        time.sleep(0.2)
        return "slow"

    assert run_concurrent([slow, lambda: "fast", lambda: 3]) == [
        "slow",
        "fast",
        3,
    ]
    assert run_concurrent([lambda: "only"]) == ["only"]

    def boom():
        raise ValueError("leg failed")

    try:
        run_concurrent([lambda: 1, boom, lambda: 2])
    except ValueError as e:
        assert "leg failed" in str(e)
    else:  # pragma: no cover
        raise AssertionError("exception was swallowed")


def test_pair_supports_matches_self_join(spark):
    """_pair_supports (one-shuffle array expansion) must equal the
    self-join formulation it replaced — including on incidence with
    duplicate (basket, item) rows, which collapse per basket."""
    import random

    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators import graph

    rng = random.Random(14)
    rows = []
    for basket in range(60):
        items = rng.sample(range(25), rng.randint(1, 7))
        for it in items:
            for _ in range(rng.randint(1, 3)):  # duplicates
                rows.append((basket, it))
    b = spark.createDataFrame(rows, "basket int, item int")
    got = sorted(
        map(tuple, graph._pair_supports(b).collect())
    )
    bd = b.distinct()
    x, y = bd.alias("x"), bd.alias("y")
    want = sorted(
        map(
            tuple,
            x.join(
                y,
                (F.col("x.basket") == F.col("y.basket"))
                & (F.col("x.item") < F.col("y.item")),
            )
            .groupBy(F.col("x.item").alias("a"), F.col("y.item").alias("b"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
            .collect(),
        )
    )
    assert got == want and len(got) > 50
