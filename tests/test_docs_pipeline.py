"""End-to-end curation pipeline (plans/docs_pipeline.py): stage
containment/monotonicity invariants and the packing budget, on the
real documents fixture."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_lake_with_spark_spark.plans.docs_pipeline import (
    curate_documents,
    run_pipeline,
)
from data_lake_with_spark_spark.sources.catalog import load_table


def test_stage_containment_and_monotonicity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    st = curate_documents(docs)
    ids = {
        name: {r["doc_id"] for r in st[name].select("doc_id").collect()}
        for name in ("kept", "balanced", "survivors")
    }
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids["kept"] <= all_ids
    assert ids["balanced"] <= ids["kept"]
    assert ids["survivors"] <= ids["balanced"]
    assert len(ids["survivors"]) > 0
    # chunking covers every survivor exactly (no doc lost or invented)
    chunk_ids = {r["doc_id"] for r in st["chunks"].select("doc_id").collect()}
    assert chunk_ids == ids["survivors"]
    # every language present in the balanced mix within ~2x of min
    counts = {
        r["lang"]: r["n"]
        for r in st["balanced"].groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert len(counts) > 1
    assert max(counts.values()) <= 2 * min(counts.values()) + 16


def test_packing_respects_budget_shape(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    st = curate_documents(docs, pack_budget=512)
    packs = (
        st["packed"]
        .groupBy("lang", "pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n_chunks"))
    )
    rows = packs.collect()
    assert rows
    # capacity-target packing: a pack exceeds the budget by at most
    # one chunk's tokens (chunks are <= 128 tokens here)
    assert all(r["tot"] <= 512 + 128 for r in rows)
    # packs are dense: every non-final pack per lang is at least half full
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["pack_id"], r["tot"]))
    for lang, ps in by_lang.items():
        ps.sort()
        for _pid, tot in ps[:-1]:
            assert tot >= 512 - 128, (lang, ps)


def test_run_pipeline_writes_three_sinks(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    run_pipeline(spark, docs, str(tmp_path / "out"))
    for name in ("survivors", "chunks", "packed"):
        back = spark.read.parquet(str(tmp_path / "out" / name))
        assert back.count() > 0
