from data_lake_with_spark_spark.operators import profile




def test_snapshot_diff_labels_all_four_statuses(spark):
    from data_lake_with_spark_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "en"), (3, "c", "en")],
        ["doc_id", "text", "lang"],
    )
    new = spark.createDataFrame(
        [(1, "a", "en"), (2, "B", "en"), (4, "d", "en")],
        ["doc_id", "text", "lang"],
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_requires_shared_columns(spark):
    import pytest
    from data_lake_with_spark_spark.operators.profile import snapshot_diff

    a = spark.createDataFrame([(1, "x")], ["doc_id", "only_a"])
    b = spark.createDataFrame([(1, "y")], ["doc_id", "only_b"])
    with pytest.raises(ValueError):
        snapshot_diff(a, b)


def test_content_manifest_detects_single_row_drift(spark):
    rows = [(i, i % 3, f"text {i}") for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "shard", "text"])
    base = {r["shard"]: r for r in profile.content_manifest(
        df, ["shard"], ["id", "text"]
    ).collect()}
    assert sum(r["n_rows"] for r in base.values()) == 30
    # flip one character in one row -> that shard's digests move, others don't
    rows2 = [(i, i % 3, "text X" if i == 7 else f"text {i}") for i in range(30)]
    drift = {r["shard"]: r for r in profile.content_manifest(
        spark.createDataFrame(rows2, ["id", "shard", "text"]), ["shard"],
        ["id", "text"]
    ).collect()}
    assert drift[1]["digest_sum"] != base[1]["digest_sum"]
    assert drift[1]["digest_xor"] != base[1]["digest_xor"]
    for s in (0, 2):
        assert drift[s]["digest_sum"] == base[s]["digest_sum"]
        assert drift[s]["digest_xor"] == base[s]["digest_xor"]


def test_content_manifest_is_order_and_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, 0, f"t{i}") for i in range(50)], ["id", "shard", "text"]
    )
    a = profile.content_manifest(df, ["shard"]).collect()[0]
    b = profile.content_manifest(
        df.repartition(13).sortWithinPartitions("text"), ["shard"]
    ).collect()[0]
    assert (a["digest_sum"], a["digest_xor"]) == (b["digest_sum"], b["digest_xor"])


def test_content_manifest_null_sentinel_and_validation(spark):
    schema = "id bigint, shard int, text string"
    df = spark.createDataFrame([(1, 0, None), (2, 0, "")], schema)
    out = profile.content_manifest(df, ["shard"], ["text"]).collect()[0]
    assert out["n_rows"] == 2
    # NULL and '' must digest differently (sentinel, not empty string)
    one = profile.content_manifest(
        spark.createDataFrame([(1, 0, "")], schema), ["shard"], ["text"]
    ).collect()[0]
    two = profile.content_manifest(
        spark.createDataFrame([(1, 0, None)], schema), ["shard"], ["text"]
    ).collect()[0]
    assert one["digest_sum"] != two["digest_sum"]
    import pytest

    with pytest.raises(ValueError):
        profile.content_manifest(df, ["id", "shard", "text"])


def test_classifier_eval_perfect_separation(spark):
    """Scores fully separating the classes give AUC=1; reversed give
    AUC=0; the bins partition the score range."""
    from data_lake_with_spark_spark.operators.profile import classifier_eval

    rows = [(i, float(i), i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "s", "y"])
    out = classifier_eval(df, "s", "y", "id", n_bins=5).collect()
    assert all(r["auc"] == 1.0 for r in out)
    assert sum(r["n"] for r in out) == 10
    assert sum(r["n_pos"] for r in out) == 5
    rev = [(i, float(-i), i >= 5) for i in range(10)]
    out2 = classifier_eval(
        spark.createDataFrame(rev, ["id", "s", "y"]), "s", "y", "id", n_bins=5
    ).collect()
    assert all(r["auc"] == 0.0 for r in out2)


def test_classifier_eval_ties_use_midrank(spark):
    """All-equal scores → AUC = 0.5 exactly (midrank tie handling),
    and everything lands in bin 0 (degenerate width)."""
    from data_lake_with_spark_spark.operators.profile import classifier_eval

    rows = [(i, 1.0, i % 2 == 0) for i in range(8)]
    df = spark.createDataFrame(rows, ["id", "s", "y"])
    out = classifier_eval(df, "s", "y", "id", n_bins=10).collect()
    assert len(out) == 1 and out[0]["bin"] == 0
    assert out[0]["auc"] == 0.5
    assert out[0]["pos_rate"] == 0.5


def test_classifier_eval_hand_auc(spark):
    """Hand-computed Mann-Whitney: scores 1,2,3,4 labels F,T,F,T →
    concordant pairs {(1,2),(1,4),(3,4)} of 4 → AUC = 3/4."""
    from data_lake_with_spark_spark.operators.profile import classifier_eval

    rows = [(1, 1.0, False), (2, 2.0, True), (3, 3.0, False), (4, 4.0, True)]
    df = spark.createDataFrame(rows, ["id", "s", "y"])
    out = classifier_eval(df, "s", "y", "id", n_bins=2).collect()
    assert all(r["auc"] == 0.75 for r in out)


def test_weighted_median_hand_case(spark):
    """values 1..4, weights 1/1/1/5: half of 8 is reached only at
    value 4 — the doc-count median (2) and the weighted one differ."""
    from data_lake_with_spark_spark.operators.profile import weighted_median

    rows = [(i, "g", i, w) for i, w in [(1, 1), (2, 1), (3, 1), (4, 5)]]
    df = spark.createDataFrame(rows, ["id", "grp", "val", "wt"])
    out = weighted_median(df, "grp", "val", "wt", "id").collect()
    assert out[0]["weighted_median"] == 4 and out[0]["total_weight"] == 8
    even = spark.createDataFrame(
        [(i, "g", i, 1) for i in (1, 2, 3, 4)], ["id", "grp", "val", "wt"]
    )
    # lower median on even total weight
    assert weighted_median(even, "grp", "val", "wt", "id").collect()[0][
        "weighted_median"
    ] == 2


def test_grouped_linear_trend_exact_line(spark):
    """Points exactly on y = 2x + 3 recover slope 2, intercept 3
    bit-exactly; a constant-x group yields NULLs."""
    from data_lake_with_spark_spark.operators.profile import (
        grouped_linear_trend,
    )
    import pyspark.sql.functions as F

    rows = [("a", x, 2.0 * x + 3.0) for x in range(10)] + [
        ("b", 5, 1.0), ("b", 5, 2.0)
    ]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = {
        r["grp"]: r
        for r in grouped_linear_trend(
            df, "grp", F.col("x"), F.col("y")
        ).collect()
    }
    assert out["a"]["slope"] == 2.0 and out["a"]["intercept"] == 3.0
    assert out["b"]["slope"] is None and out["b"]["intercept"] is None


def test_key_uniqueness_null_combinations_count(spark):
    """Struct-count semantics: a NULL-bearing combination is a
    combination — bare COUNT DISTINCT would drop it and declare a
    dirty column MORE unique."""
    from data_lake_with_spark_spark.operators.profile import key_uniqueness

    rows = [(1, "a"), (2, None), (3, None), (1, "a")]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {r["candidate"]: r for r in key_uniqueness(
        df, [["k"], ["k", "v"], ["v"]]
    ).collect()}
    assert out["k"]["n_distinct"] == 3 and not out["k"]["is_key"]
    # (1,a),(2,NULL),(3,NULL),(1,a) → 3 distinct combos incl. NULLs
    assert out["k,v"]["n_distinct"] == 3
    assert out["v"]["n_distinct"] == 2  # 'a' and NULL
    import pytest as _p

    with _p.raises(ValueError):
        key_uniqueness(df, [])


def test_categorical_concentration_hand_case(spark):
    """Counts 3/1 over 4 rows: HHI = (9+1)/16, gini = 6/16; a
    uniform column of k singletons gives HHI = 1/k."""
    from data_lake_with_spark_spark.operators.profile import (
        categorical_concentration,
    )

    rows = [("a", str(i)) for i in range(3)] + [("b", "x")]
    df = spark.createDataFrame(rows, ["c1", "c2"])
    out = {r["column"]: r for r in
           categorical_concentration(df, ["c1", "c2"]).collect()}
    assert out["c1"]["hhi"] == 10 / 16 and out["c1"]["gini"] == 1 - 10 / 16
    assert out["c1"]["n_distinct"] == 2
    assert out["c2"]["hhi"] == 4 / 16  # 4 singletons → 1/k = 1/4
    import pytest as _p

    with _p.raises(ValueError):
        categorical_concentration(df, [])


def test_grouped_linear_trend_overflow_raises(spark):
    """Regression (r7 advisor): past |sum|*10^4 >= 2^63 the exact
    decimal->bigint conversion would silently NULL on non-ANSI Spark
    (while DuckDB errors) — the exactness-window exit must be LOUD."""
    import pytest

    from data_lake_with_spark_spark.operators.profile import (
        grouped_linear_trend,
    )

    import pyspark.sql.functions as F

    # 10 rows of 9.9e13 (each fits decimal(18,4)): Σy ≈ 9.9e14, so
    # Σy·10⁴ ≈ 9.9e18 > 2^63 ≈ 9.22e18
    rows = [("g", i, 99_000_000_000_000.0) for i in range(10)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    with pytest.raises(Exception, match="bigint window"):
        grouped_linear_trend(
            df, "grp", F.col("x"), F.col("y")
        ).collect()


def test_key_uniqueness_modes(spark, sf_dir):
    """approx mode's HLL counts land within 3σ (=3·rsd·exact) of the
    exact counts on the pinned fixture (the q53 discipline: tight
    bound in pytest where the dataset is pinned, 6·rsd in the SQL
    gate); verify mode emits the within_bound gate column; bad mode
    raises."""
    import pytest

    from data_lake_with_spark_spark.operators.profile import key_uniqueness

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cands = [["l_orderkey"], ["l_orderkey", "l_linenumber"]]
    exact = {
        r["candidate"]: r for r in key_uniqueness(li, cands).collect()
    }
    approx = {
        r["candidate"]: r
        for r in key_uniqueness(li, cands, mode="approx", rsd=0.02).collect()
    }
    assert set(approx) == set(exact)
    for cand, a in approx.items():
        e = exact[cand]["n_distinct"]
        assert abs(a["n_distinct"] - e) <= 3 * 0.02 * e
        assert "is_key" not in a.asDict()  # a sketch cannot certify
    verify = key_uniqueness(li, cands, mode="verify").collect()
    assert all(r["within_bound"] for r in verify)
    assert {r["candidate"]: r["n_distinct"] for r in verify} == {
        c: r["n_distinct"] for c, r in exact.items()
    }
    with pytest.raises(ValueError, match="mode"):
        key_uniqueness(li, cands, mode="hll")


def test_referential_integrity_hand_case(spark):
    """Orphans, NULL fks, and clean edges all counted correctly; NULL
    fk is 'unlinked', never 'dangling'."""
    import pytest

    from data_lake_with_spark_spark.operators.profile import (
        referential_integrity,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None), (5, 98)],
        "id bigint, fk bigint",
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk bigint")
    out = {r["edge"]: r for r in referential_integrity(
        [("c->p", child, ["fk"], parent, ["pk"])]
    ).collect()}
    r = out["c->p"]
    assert r["n_rows"] == 5 and r["n_null_fk"] == 1
    assert r["n_orphan_rows"] == 2 and r["n_orphan_keys"] == 2
    assert r["orphan_rate"] == 2 / 4
    clean = referential_integrity(
        [("ok", parent, ["pk"], parent, ["pk"])]
    ).collect()[0]
    assert clean["n_orphan_rows"] == 0 and clean["n_orphan_keys"] == 0
    with pytest.raises(ValueError):
        referential_integrity([])
    with pytest.raises(ValueError, match="mismatch"):
        referential_integrity([("bad", child, ["fk", "id"], parent, ["pk"])])


def test_numeric_outlier_report_hand_case(spark):
    """Values 1..8 plus a 100 spike: p25 = rank ceil(2.25)=3 -> 3,
    p75 = rank ceil(6.75)=7 -> 7, fences [-3, 13], exactly the spike
    flagged; NULLs excluded; an outlier-free group reports 0."""
    import pyspark.sql.functions as F

    from data_lake_with_spark_spark.operators.profile import (
        numeric_outlier_report,
    )

    rows = [("a", float(v)) for v in range(1, 9)] + [
        ("a", 100.0), ("a", None), ("b", 5.0), ("b", 6.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in numeric_outlier_report(
        df, "g", F.col("v"), k=1.5
    ).collect()}
    a = out["a"]
    assert a["n"] == 9 and a["p25"] == 3.0 and a["p75"] == 7.0
    assert a["iqr"] == 4.0 and a["lo_fence"] == -3.0 and a["hi_fence"] == 13.0
    assert a["n_outliers"] == 1 and a["outlier_rate"] == 1 / 9
    assert out["b"]["n_outliers"] == 0 and out["b"]["outlier_rate"] == 0.0


def test_functional_dependencies_holds_and_violations(spark):
    """c→n holds (each customer one nation); c→v violated by value
    AND by a NULL variant (NULL dependents count as values via the
    struct trick — an FD violated only by NULLs is still violated)."""
    import pytest

    from data_lake_with_spark_spark.operators.profile import (
        functional_dependencies,
    )

    df = spark.createDataFrame(
        [(1, "us", 10), (1, "us", 10), (2, "de", 5),
         (2, "de", None), (3, "fr", 7)],
        "cust bigint, nation string, v bigint",
    )
    out = {
        (r["determinant"], r["dependent"]): r
        for r in functional_dependencies(
            df, [(["cust"], "nation"), (["cust"], "v")]
        ).collect()
    }
    fd1 = out[("cust", "nation")]
    assert fd1["holds"] and fd1["n_groups"] == 3
    assert fd1["n_violating_groups"] == 0 and fd1["max_dep_values"] == 1
    fd2 = out[("cust", "v")]
    assert not fd2["holds"]
    assert fd2["n_violating_groups"] == 1  # cust 2 maps to {5, NULL}
    assert fd2["max_dep_values"] == 2
    with pytest.raises(ValueError):
        functional_dependencies(df, [])
    with pytest.raises(ValueError):
        functional_dependencies(df, [([], "v")])


def test_percentile_envelope_gk_bound(spark):
    """The GK rank guarantee holds on a hand-built group, and the
    bound test itself is integer cross-multiplication (no float
    compare). A degenerate accuracy=1 sketch still satisfies its own
    (loose) bound; bad params raise."""
    import pytest

    from data_lake_with_spark_spark.operators.profile import (
        percentile_envelope,
    )

    rows = [("a", float(i)) for i in range(1, 101)] + [("b", 5.0)] * 10
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["group"]: r for r in percentile_envelope(
        df, "g", "v", p=0.5, accuracy=1000
    ).collect()}
    assert out["a"]["n"] == 100 and out["a"]["within_bound"]
    assert out["b"]["n"] == 10 and out["b"]["within_bound"]
    loose = {r["group"]: r["within_bound"] for r in percentile_envelope(
        df, "g", "v", p=0.9, accuracy=1
    ).collect()}
    assert loose == {"a": True, "b": True}
    with pytest.raises(ValueError):
        percentile_envelope(df, "g", "v", p=1.0)
    with pytest.raises(ValueError):
        percentile_envelope(df, "g", "v", accuracy=0)
