from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_lake_with_spark_spark.sources.catalog import load_table
from data_lake_with_spark_spark.streaming import events as SE


@pytest.fixture(scope="module")
def staged_stream(spark, sf_dir, tmp_path_factory):
    stage = str(tmp_path_factory.mktemp("stream"))
    df = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    df.coalesce(2).write.mode("overwrite").json(stage)
    return stage


def _run(stream_df, name, mode="update"):
    q = SE.run_to_memory(stream_df, name, output_mode=mode)
    q.awaitTermination(120)
    return q


def test_windowed_counts_match_batch(spark, sf_dir, staged_stream):
    stream = SE.read_event_stream(spark, staged_stream)
    _run(SE.windowed_counts(stream, window="1 hour"), "t_windowed", mode="complete")
    got = spark.table("t_windowed")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got_map = {
        (r["window_start"], r["event_type"]): r["n"] for r in got.collect()
    }
    for r in batch.collect():
        assert got_map[(r["window_start"], r["event_type"])] == r["n"]


def test_session_counts_runs(spark, staged_stream):
    stream = SE.read_event_stream(spark, staged_stream)
    _run(SE.session_counts(stream, gap="30 minutes"), "t_sessions", mode="complete")
    rows = spark.table("t_sessions").collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)


def test_dedup_stream_collapses_redelivery(spark, sf_dir, staged_stream, tmp_path):
    # stage the SAME events twice (at-least-once redelivery), dedup on
    # event_id must collapse back to the batch-distinct count
    stage = str(tmp_path / "dup")
    df = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    df.coalesce(2).write.mode("overwrite").json(stage)
    df.coalesce(2).write.mode("append").json(stage)
    stream = SE.read_event_stream(spark, stage)
    _run(SE.dedup_stream(stream, keys=("event_id",)), "t_dedup", mode="append")
    n_distinct = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert spark.table("t_dedup").count() == n_distinct


def test_running_user_totals_stateful(spark, sf_dir, staged_stream):
    stream = SE.read_event_stream(spark, staged_stream)
    _run(SE.running_user_totals(stream), "t_totals", mode="update")
    got = {r["user_id"]: r["n_events"] for r in spark.table("t_totals").collect()}
    batch = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # final state after availableNow == batch counts
    for uid, n in batch.items():
        assert got[uid] == n
