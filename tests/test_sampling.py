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


def test_balance_strata_downsamples_to_min(spark):
    # 300 en / 60 fr: balancing should keep all fr and ~60 en
    rows = [(i, "en") for i in range(300)] + [(1000 + i, "fr") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.balance_strata(df, "lang", F.col("doc_id").cast("string"))
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_lang["fr"] == 60  # min stratum: keep-all ('gg' threshold)
    assert 30 < by_lang["en"] < 100  # ~min/count = 20% of 300, hash-binomial
    # deterministic: identical rows on rerun
    ids = {r["doc_id"] for r in out.collect()}
    ids2 = {
        r["doc_id"]
        for r in sampling.balance_strata(
            df, "lang", F.col("doc_id").cast("string")
        ).collect()
    }
    assert ids == ids2


def test_balance_strata_uniform_is_noop(spark):
    rows = [(i, ["a", "b"][i % 2]) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.balance_strata(df, "lang", F.col("doc_id").cast("string"))
    assert out.count() == 100


def test_temperature_rebalance_interpolates(spark):
    """alpha=0 reproduces balance_strata exactly (full flatten);
    alpha=1 is the identity; alpha=0.5 lands strictly between on the
    head stratum while the tail stratum stays whole at every alpha."""
    rows = [(i, "en" if i < 400 else "fr") for i in range(460)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    key = F.col("doc_id").cast("string")

    def by_lang(out):
        return {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    flat = by_lang(sampling.balance_strata(df, "lang", key))
    a0 = by_lang(sampling.temperature_rebalance(df, "lang", key, alpha=0.0))
    a5 = by_lang(sampling.temperature_rebalance(df, "lang", key, alpha=0.5))
    a1 = by_lang(sampling.temperature_rebalance(df, "lang", key, alpha=1.0))
    assert a0 == flat  # alpha=0 == full flatten
    assert a1 == {"en": 400, "fr": 60}  # alpha=1 == natural mix
    assert flat["en"] < a5["en"] < 400  # head damped, not flattened
    assert a0["fr"] == a5["fr"] == 60  # tail (min stratum) kept whole
    # kept sets NEST as alpha grows (same hash, larger threshold):
    # raising the temperature only ADDS rows, never swaps them — a
    # curriculum can warm up the mix without churning the corpus
    ids = [
        {r["doc_id"] for r in sampling.temperature_rebalance(
            df, "lang", key, alpha=a
        ).collect()}
        for a in (0.0, 0.5, 1.0)
    ]
    assert ids[0] <= ids[1] <= ids[2]
    import pytest

    with pytest.raises(ValueError, match="alpha"):
        sampling.temperature_rebalance(df, "lang", key, alpha=1.5)


def test_split_assign_covers_all_rows_and_respects_weights(spark, sf_dir):
    from data_lake_with_spark_spark.operators.sampling import split_assign
    from data_lake_with_spark_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    got = split_assign(
        d, F.col("doc_id").cast("string"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    counts = {r["split"]: r["n"] for r in got.groupBy("split")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n  # total partition, no row lost
    assert 0.7 * n <= counts["train"] <= 0.9 * n
    assert counts["val"] > 0 and counts["test"] > 0
    # stability: rerun assigns identically
    again = {r["doc_id"]: r["split"] for r in split_assign(
        d, F.col("doc_id").cast("string"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ).select("doc_id", "split").collect()}
    first = {r["doc_id"]: r["split"] for r in got.select("doc_id", "split").collect()}
    assert first == again
    # weight validation
    import pytest
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(d, F.col("doc_id").cast("string"), {"a": 0.5})


def test_sample_per_group_exact_k_and_deterministic(spark, sf_dir):
    from data_lake_with_spark_spark.operators.sampling import sample_per_group
    from data_lake_with_spark_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    got = sample_per_group(
        d, ["lang"], F.col("doc_id").cast("string"), k=5
    )
    per = {r["lang"]: r["n"] for r in got.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    group_sizes = {r["lang"]: r["n"] for r in d.groupBy("lang")
                   .agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(5, group_sizes[lang])
    ids1 = {r["doc_id"] for r in got.collect()}
    ids2 = {r["doc_id"] for r in sample_per_group(
        d.repartition(7), ["lang"], F.col("doc_id").cast("string"), k=5
    ).collect()}
    assert ids1 == ids2  # partitioning-independent selection


def test_relative_buckets_thirds_per_group(spark):
    # 9 rows in group a -> exactly 3/3/3; 4 rows in group b -> the
    # integer split floor(3*(r-1)/n) gives 2/1/1 (head gets the
    # remainder first)
    rows = [("a", i, float(100 - i)) for i in range(9)] + [
        ("b", 100 + i, float(i)) for i in range(4)
    ]
    df = spark.createDataFrame(rows, ["grp", "id", "sig"])
    out = sampling.relative_buckets(
        df, "grp", [F.col("sig").desc(), F.col("id").asc()], k=3
    )
    got = {(r["grp"], r["id"]): r["bucket"] for r in out.collect()}
    # group a: best sig = lowest i (sig=100-i desc)
    assert [got[("a", i)] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    # group b: sig asc ids 103 (sig 3) best
    assert got[("b", 103)] == "head" and got[("b", 102)] == "head"
    assert got[("b", 101)] == "middle" and got[("b", 100)] == "tail"


def test_relative_buckets_integer_indices_and_validation(spark):
    df = spark.createDataFrame([("a", 1, 1.0), ("a", 2, 2.0)], ["grp", "id", "sig"])
    out = sampling.relative_buckets(
        df, "grp", [F.col("sig").asc(), F.col("id").asc()], k=2, labels=None
    )
    got = {r["id"]: r["bucket"] for r in out.collect()}
    assert got == {1: 0, 2: 1}
    with pytest.raises(ValueError):
        sampling.relative_buckets(df, "grp", [F.col("sig")], k=3, labels=("a", "b"))


def test_shard_assignment_matches_local_md5_and_is_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    out = sampling.shard_assignment(
        df, F.col("doc_id").cast("string"), n_shards=7
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # shard matches a local md5 recomputation (engine-portable contract)
    for i in (0, 13, 127, 199):
        h = hashlib.md5(str(i).encode()).hexdigest()
        assert by_id[i]["shard"] == int(h[:8], 16) % 7
    # positions are a permutation 1..len within each shard
    from collections import defaultdict

    shards = defaultdict(list)
    for r in out:
        shards[r["shard"]].append(r["shard_pos"])
    for s, ps in shards.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # deterministic under repartitioning
    out2 = {
        (r["doc_id"], r["shard"], r["shard_pos"])
        for r in sampling.shard_assignment(
            df.repartition(11), F.col("doc_id").cast("string"), n_shards=7
        ).collect()
    }
    assert out2 == {(r["doc_id"], r["shard"], r["shard_pos"]) for r in out}


def test_mixture_repeats_matches_local_recomputation(spark):
    import hashlib
    import math

    rows = [(i, "en" if i % 3 else "de") for i in range(90)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    weights = {"en": 0.7, "de": 0.2}
    out = {
        r["doc_id"]: r["n_repeats"]
        for r in sampling.mixture_repeats(
            df, "lang", weights, F.col("doc_id").cast("string")
        ).collect()
    }
    t = len(rows)
    counts = {"en": sum(1 for _, l in rows if l == "en"),
              "de": sum(1 for _, l in rows if l == "de")}
    for i, lang in rows:
        x = weights[lang] * t / counts[lang]
        base = math.floor(x)
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
        want = base + (1 if u < (x - base) * 65536.0 else 0)
        assert out[i] == want, (i, lang, out[i], want)
    # per-stratum totals: each doc contributes base + Bernoulli(frac),
    # so the total is binomial around the target — bound at 4 sigma
    for lang in weights:
        total = sum(out[i] for i, l in rows if l == lang)
        x = weights[lang] * t / counts[lang]
        frac = x - math.floor(x)
        sigma = math.sqrt(counts[lang] * frac * (1 - frac))
        assert abs(total - weights[lang] * t) <= 4 * sigma + 1


def test_mixture_repeats_zero_weight_stratum_drops(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "zh"), (3, "zh")], ["doc_id", "lang"]
    )
    out = {
        r["doc_id"]: r["n_repeats"]
        for r in sampling.mixture_repeats(
            df, "lang", {"en": 1.0}, F.col("doc_id").cast("string")
        ).collect()
    }
    assert out[2] == 0 and out[3] == 0
    assert out[1] >= 3  # en gets the whole budget: 1.0 * 3 / 1


def test_token_budget_fill_greedy_prefix(spark):
    """Priority order is respected and the cumulative budget cuts
    exactly: 3 docs of 5/4/3 tokens under budget 9 keeps the top-2
    (5+4=9), never the third."""
    from data_lake_with_spark_spark.operators.sampling import token_budget_fill
    import pyspark.sql.functions as F

    rows = [
        (1, "a", "w w w w w", 50),
        (2, "a", "w w w w", 40),
        (3, "a", "w w w", 30),
        (4, "b", "w w", 20),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text", "n_chars"])
    out = token_budget_fill(df, budget_tokens=9, group_col="source")
    got = {r["id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 4}
    assert got[2]["cum_tokens"] == 9 and got[2]["fill_rank"] == 2
    assert got[4]["cum_tokens"] == 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        token_budget_fill(df, budget_tokens=0)


def test_weighted_priority_sample_prefers_heavy_items(spark):
    """Selection frequency must track weight: with one item given
    1000x the weight of 200 peers, it is sampled (top-1 by priority)
    in essentially every shifted id-universe; uniform weights pick
    ~uniformly. Also: deterministic, k-bounded, zero-weight excluded."""
    import pyspark.sql.functions as F

    from data_lake_with_spark_spark.operators.sampling import (
        weighted_priority_sample,
    )

    hits = 0
    for shift in range(10):
        rows = [(i + shift * 1000, 1000 if i == 0 else 1) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
        top = weighted_priority_sample(df, F.col("w"), k=1).collect()
        hits += top[0]["doc_id"] == shift * 1000
    assert hits >= 8  # heavy item wins ~P(w=1000 of 1199 total mass)

    df = spark.createDataFrame(
        [(i, 1 if i < 50 else 0) for i in range(100)], "doc_id bigint, w bigint"
    )
    out = weighted_priority_sample(df, F.col("w"), k=10).collect()
    assert len(out) == 10 and all(r["doc_id"] < 50 for r in out)
    again = weighted_priority_sample(df, F.col("w"), k=10).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)
    import pytest

    with pytest.raises(ValueError):
        weighted_priority_sample(df, F.col("w"), k=0)


def test_mixture_plan_caps_at_availability(spark):
    """Targets are weight-proportional; an under-supplied stratum
    caps at availability (planned < target surfaces, never silently
    rescales); zero-weight strata are excluded."""
    import pytest
    import pyspark.sql.functions as F

    from data_lake_with_spark_spark.operators.sampling import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "a", "x y"), (3, "b", "x"), (4, "c", "x y")],
        ["doc_id", "lang", "text"],
    )
    out = {r["stratum"]: r for r in mixture_plan(
        docs, {"a": 3, "b": 1, "c": 0}, token_budget=8
    ).collect()}
    assert set(out) == {"a", "b"}  # zero-weight c excluded
    # a: avail 5, target 8*3/4 = 6.0 -> capped at 5, rate 1.0
    assert out["a"]["n_tokens_avail"] == 5
    assert out["a"]["target_tokens"] == 6.0
    assert out["a"]["planned_tokens"] == 5.0
    assert out["a"]["sampling_rate"] == 1.0
    # b: avail 1, target 2.0 -> capped, surfaced as planned < target
    assert out["b"]["planned_tokens"] == 1.0 and out["b"]["target_tokens"] == 2.0
    with pytest.raises(ValueError):
        mixture_plan(docs, {}, token_budget=10)
    with pytest.raises(ValueError):
        mixture_plan(docs, {"a": 1}, token_budget=0)
    # all-zero weights is a config error, not an empty plan
    with pytest.raises(ValueError, match="w > 0"):
        mixture_plan(docs, {"a": 0, "b": 0}, token_budget=10)
