from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_lake_with_spark_spark.operators import ranking


def test_global_rank_matches_single_partition_window(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(500)], ["id", "v"]
    )
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["rank"]
        for r in ranking.global_rank(df, order, num_partitions=8).collect()
    }
    want = {
        r["id"]: r["want"]
        for r in df.withColumn(
            "want", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_global_rank_deterministic_under_repartitioning(spark):
    df = spark.createDataFrame([(i, i % 7) for i in range(300)], ["id", "v"])
    order = [F.col("v").asc(), F.col("id").asc()]
    a = {(r["id"], r["rank"]) for r in ranking.global_rank(df, order).collect()}
    b = {
        (r["id"], r["rank"])
        for r in ranking.global_rank(df.repartition(13), order).collect()
    }
    assert a == b


def test_global_rank_plan_never_runs_a_whole_data_window(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["id"])
    out = ranking.global_rank(df, [F.col("id").asc()], num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the scale claim: the only window is PARTITIONED on _pid (one
    # range partition per group), never the single-task
    # no-PARTITION-BY global window. (The range exchange itself sits
    # behind the localCheckpoint lineage cut, so the visible plan
    # starts at Scan ExistingRDD — the partition-local window is the
    # assertable part.)
    assert "windowspecdefinition(_pid" in plan
    assert "Scan ExistingRDD" in plan  # checkpoint pinned the partitioning


def test_length_batches_contiguous_and_sized(spark):
    docs = spark.createDataFrame(
        [(i, "w " * ((i * 13) % 40 + 1)) for i in range(100)],
        ["doc_id", "text"],
    )
    out = ranking.length_batches(
        docs,
        F.size(F.split(F.trim(F.col("text")), r"\s+")),
        batch_size=8,
    ).collect()
    by_batch: dict[int, list] = {}
    for r in out:
        by_batch.setdefault(r["batch_id"], []).append(r)
    sizes = {b: len(rs) for b, rs in by_batch.items()}
    # all full batches except possibly the last
    last = max(sizes)
    assert all(s == 8 for b, s in sizes.items() if b != last)
    assert 1 <= sizes[last] <= 8
    # batches are length-contiguous: max length of batch b <= min of b+1
    for b in range(last):
        assert max(r["n_tokens"] for r in by_batch[b]) <= min(
            r["n_tokens"] for r in by_batch[b + 1]
        )


def test_length_batches_validates_batch_size(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        ranking.length_batches(docs, F.lit(2), batch_size=0)


def test_rrf_fuse_known_math(spark):
    """Hand-checked fusion: doc present in both lists scores
    1/(60+ra) + 1/(60+rb); single-list docs contribute one term."""
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], ["query_id", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], ["query_id", "doc_id", "rank"]
    )
    out = {
        r["doc_id"]: r
        for r in ranking.rrf_fuse([a, b], k0=60, topk=10).collect()
    }
    assert out[11]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert out[10]["rrf_score"] == 1.0 / 61
    assert out[12]["rrf_score"] == 1.0 / 62
    # doc 11 (in both lists) outranks the single-list docs
    assert out[11]["rank"] == 1
    assert out[10]["rank"] == 2  # 1/61 > 1/62


def test_rrf_fuse_topk_and_validation(spark):
    a = spark.createDataFrame(
        [(1, d, d) for d in range(1, 6)], ["query_id", "doc_id", "rank"]
    )
    assert ranking.rrf_fuse([a], topk=3).count() == 3
    with pytest.raises(ValueError):
        ranking.rrf_fuse([])
    with pytest.raises(ValueError):
        ranking.rrf_fuse([a], k0=0)


def test_rank_overlap_counts(spark):
    """Hand-checked: lists {1,2,3} vs {2,3,4} → common 2, jaccard
    2/4; a query present on one side only reports 0/0.0."""
    a = spark.createDataFrame(
        [(1, d) for d in (1, 2, 3)] + [(9, 7)], ["query_id", "doc_id"]
    )
    b = spark.createDataFrame([(1, d) for d in (2, 3, 4)], ["query_id", "doc_id"])
    out = {r["query_id"]: r for r in ranking.rank_overlap(a, b).collect()}
    assert out[1]["n_a"] == 3 and out[1]["n_b"] == 3
    assert out[1]["n_common"] == 2 and out[1]["jaccard"] == 0.5
    assert out[9]["n_b"] == 0 and out[9]["n_common"] == 0
    assert out[9]["jaccard"] == 0.0  # {7} vs {} → 0 / union-of-1


def test_retrieval_metrics_hand_case(spark):
    """Hand-scored run: q1 run [d1,d2,d3], qrels {d2,d9} → n_rel 2,
    hits 1, recall .5, RR 1/2; q2 no hits → zeros (never dropped);
    ranks past k are invisible."""
    import pytest

    from data_lake_with_spark_spark.operators.ranking import (
        retrieval_metrics,
    )

    run = spark.createDataFrame(
        [(1, "d1", 1), (1, "d2", 2), (1, "d3", 3),
         (2, "d4", 1), (1, "d9", 7)],
        "query_id bigint, doc_id string, rank bigint",
    )
    qrels = spark.createDataFrame(
        [(1, "d2"), (1, "d9"), (2, "d5")],
        "query_id bigint, doc_id string",
    )
    out = {r["query_id"]: r for r in retrieval_metrics(run, qrels, k=5).collect()}
    assert out[1]["n_rel"] == 2 and out[1]["n_hits"] == 1
    assert out[1]["recall_at_k"] == 0.5
    assert out[1]["reciprocal_rank"] == 0.5  # first hit at rank 2
    assert out[2]["n_hits"] == 0 and out[2]["recall_at_k"] == 0.0
    assert out[2]["reciprocal_rank"] == 0.0
    # d9 at rank 7 > k=5 must not count
    out3 = {r["query_id"]: r for r in retrieval_metrics(run, qrels, k=10).collect()}
    assert out3[1]["n_hits"] == 2
    with pytest.raises(ValueError):
        retrieval_metrics(run, qrels, k=0)
