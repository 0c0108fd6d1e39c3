from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from data_lake_with_spark_spark.operators import sampling


def test_rate_threshold_quantization():
    assert sampling.rate_threshold(0.0) == "00"
    assert sampling.rate_threshold(0.25) == "40"
    assert sampling.rate_threshold(0.5) == "80"
    assert sampling.rate_threshold(1.0) == "gg"  # sorts after any hex prefix
    assert sampling.rate_threshold(0.5, precision=4) == "8000"
    with pytest.raises(ValueError):
        sampling.rate_threshold(1.5)


def test_deterministic_sample_matches_local_md5(spark):
    df = spark.range(0, 1000).select(F.col("id").cast("string").alias("k"))
    out = {
        r["k"] for r in sampling.deterministic_sample(df, F.col("k"), 0.25).collect()
    }
    expected = {
        str(i)
        for i in range(1000)
        if hashlib.md5(str(i).encode()).hexdigest()[:2] < "40"
    }
    assert out == expected
    # deterministic: a re-run selects the identical row set
    rerun = {
        r["k"] for r in sampling.deterministic_sample(df, F.col("k"), 0.25).collect()
    }
    assert rerun == out


def test_stratified_sample_rates_and_edges(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.stratified_sample(
        df,
        "lang",
        {"en": 0.5, "de": 1.0},
        key=F.col("doc_id").cast("string"),
        default_rate=0.0,
    )
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_lang.get("de") == 200  # keep-all regime
    assert "fr" not in by_lang  # default-rate drop regime
    assert 60 < by_lang.get("en", 0) < 140  # ~50% of 200, hash-binomial
