

def test_skew_report_ranks_hot_key_first(spark):
    from data_lake_with_spark_spark.operators.skew import skew_report

    left = spark.createDataFrame(
        [(1,)] * 10 + [(2,)] * 3 + [(3,)] * 1, ["k"]
    )
    right = spark.createDataFrame([(1,)] * 4 + [(2,)] * 2 + [(9,)], ["k"])
    out = skew_report(left, right, ["k"], top_n=10).collect()
    assert [r["k"] for r in out[:2]] == [1, 2]
    top = out[0]
    assert (top["n_left"], top["n_right"], top["est_pairs"]) == (10, 4, 40)
    total = 10 * 4 + 3 * 2 + 0 + 0
    assert abs(top["pair_share"] - 40 / total) < 1e-15
    # keys absent from one side surface with zero pairs
    by_k = {r["k"]: r for r in out}
    assert by_k[9]["n_left"] == 0 and by_k[9]["est_pairs"] == 0
    assert by_k[3]["n_right"] == 0


def test_skew_report_top_n_and_validation(spark):
    from data_lake_with_spark_spark.operators.skew import skew_report
    import pytest

    df = spark.createDataFrame([(i % 5,) for i in range(50)], ["k"])
    out = skew_report(df, df, ["k"], top_n=3).collect()
    assert len(out) == 3
    with pytest.raises(ValueError):
        skew_report(df, df, ["k"], top_n=0)
