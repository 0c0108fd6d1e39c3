

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
