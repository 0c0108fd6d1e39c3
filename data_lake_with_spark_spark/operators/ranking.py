"""Distributed global ranking — the scale-correct replacement for the
single-partition window.

``ROW_NUMBER() OVER (ORDER BY …)`` with no PARTITION BY is the classic
anti-scale trap: Spark plans it as ONE task holding the entire dataset.
The distributed construction here is the standard two-phase rank:

1. range-partition by the order key (``repartitionByRange`` — Spark
   samples boundaries, so partitions are balanced even under key skew)
   and sort within partitions;
2. count rows per partition (a tiny aggregate, one row per partition),
   collect the counts — bounded by the partition COUNT, never the data
   — and broadcast cumulative offsets back;
3. global rank = partition-local row_number + the partition's offset.

The result is exact and deterministic for any TOTAL order (callers
must include a unique tiebreak), independent of where the sampled
boundaries land: boundary placement moves rows between partitions but
local-rank-plus-offset reproduces the same global rank either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_by: "list[Column]",
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number under ``order_by`` (a total
    order — include a unique tiebreak), computed distributed.

    Plan: one range exchange + one partition-local window (the window
    hash-partitions on ``spark_partition_id()``, which keeps each
    range partition intact) + a count-per-partition aggregate whose
    driver collect is bounded by the number of partitions — at 1000
    executors that is 1000 longs, not data. No stage ever holds more
    than one range partition.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint PINS the range partitioning: repartitionByRange
    # samples its boundaries per job, so without it the offsets
    # (counted in one job) could describe a different partitioning
    # than the one the final job computes ranks in — silent
    # corruption, not just nondeterminism. At real scale this is
    # persist(DISK_ONLY) / a staging write; the one-materialization
    # cost is inherent to two-phase ranking (the counts must describe
    # the exact partitioning the ranks use).
    ranged = (
        df.repartitionByRange(n, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # partition sizes -> cumulative offsets (tiny: one row/partition)
    sizes = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off = F.lit(0)
    for pid, o in sorted(offsets.items()):
        if o:
            off = F.when(F.col("_pid") == pid, F.lit(o)).otherwise(off)
    w = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        ranged.withColumn(
            rank_col, (F.row_number().over(w) + off).cast("bigint")
        )
        .drop("_pid")
    )


def length_batches(
    df: DataFrame,
    length_col: Column,
    id_col: str = "doc_id",
    batch_size: int = 32,
    batch_col: str = "batch_id",
) -> DataFrame:
    """Length-sorted inference batching: order the corpus by sequence
    length (unique-id tiebreak), then cut consecutive runs of
    ``batch_size`` into batches — the standard padding-minimizing
    layout for batched model inference (every batch pads to its own
    max length instead of the corpus max).

    Emits the input plus ``n_tokens``, the global ``rank`` and
    ``batch_id = (rank-1) div batch_size``. Built on
    :func:`global_rank`, so the sort is a range exchange, never a
    single-partition window.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    with_len = df.withColumn("n_tokens", length_col.cast("bigint"))
    ranked = global_rank(
        with_len,
        [F.col("n_tokens").asc(), F.col(id_col).asc()],
        rank_col="rank",
    )
    a = F.col("rank") - F.lit(1)
    return ranked.withColumn(
        batch_col, ((a - (a % F.lit(batch_size))) / F.lit(batch_size)).cast("bigint")
    )


def rrf_fuse(
    rankings: "list[DataFrame]",
    k0: int = 60,
    topk: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of N
    per-query rankings — the standard hybrid-retrieval combiner for a
    sparse (BM25) and a dense (embedding) ranker feeding one RAG /
    data-selection pipeline.

    ``score(q, d) = Σ_i 1 / (k0 + rank_i(q, d))`` with absent entries
    contributing 0. Implemented as a chain of full-outer joins on
    ``(query_id, doc_id)`` — each join is co-keyed (one hash exchange
    per side on the same key, and the inputs are top-k lists, i.e.
    already k·|queries| rows, tiny next to the corpora that produced
    them), never a corpus-side shuffle. The fused score is a sum of
    ``1/(k0+rank)`` terms in FIXED written order (ranker 0 first), so
    every float is reproducible cross-engine: each term is one IEEE
    division of exact integers, and the chained add order is pinned.

    Returns (query_id, doc_id, rrf_score, rank) with the fused rank a
    per-query ``row_number`` (score desc, doc id tiebreak) — a
    PARTITIONED window, safe at any query count.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    sides = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            F.col(rank_col).cast("bigint").alias(f"_r{i}"),
        )
        for i, r in enumerate(rankings)
    ]
    fused = sides[0]
    for s in sides[1:]:
        fused = fused.join(s, ["query_id", "doc_id"], "full_outer")
    score = None
    for i in range(len(sides)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"_r{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rrf_score", score)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= topk)
        .select("query_id", "doc_id", "rrf_score", "rank")
    )


def rank_overlap(
    a: DataFrame,
    b: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Per-query agreement report between two top-k rankings (e.g.
    the sparse and dense sides of a hybrid retriever): result-set
    sizes, intersection size, and Jaccard — the retrieval-QA number
    that says whether two rankers are redundant or complementary
    BEFORE you pay for fusing them.

    Top-k lists are k·|queries|-sized, so everything here is
    bounded: one inner join on (query, doc) for the intersection, a
    per-query count on each side, two co-keyed outer joins to stitch
    the report. Counts are exact integers; Jaccard is ONE int/int
    division.

    Returns (query_id, n_a, n_b, n_common, jaccard); queries present
    in only one ranking report 0 for the other side.
    """
    # each side feeds TWO consumers (its size count + the common
    # join); without pinning, the entire upstream retrieval lineage
    # re-runs per consumer (the ngram_rarity recompute class, caught
    # again by the exchange audit: 38 exchanges → 5). Top-k lists
    # are k·|queries| rows — the checkpoint is trivially cheap. The
    # two upstream lineages are independent (typically the sparse and
    # dense retrievers), so they materialize CONCURRENTLY (guide §2.6)
    from data_lake_with_spark_spark.session import run_concurrent

    an, bn = run_concurrent(
        [
            lambda: a.select(
                F.col(query_col).alias("query_id"),
                F.col(doc_col).alias("doc_id"),
            ).localCheckpoint(),
            lambda: b.select(
                F.col(query_col).alias("query_id"),
                F.col(doc_col).alias("doc_id"),
            ).localCheckpoint(),
        ]
    )
    ca = an.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_a"))
    cb = bn.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_b"))
    common = (
        an.join(bn, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    rep = (
        ca.join(cb, "query_id", "full_outer")
        .join(common, "query_id", "left_outer")
        .select(
            "query_id",
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
            F.coalesce("n_common", F.lit(0)).cast("bigint").alias("n_common"),
        )
    )
    union_sz = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return rep.withColumn(
        "jaccard",
        F.when(union_sz > 0,
               F.col("n_common") / union_sz.cast("double")).otherwise(
            F.lit(0.0)
        ),
    )


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Retrieval-quality metrics per query: given a ranked ``run``
    (query, doc, rank) and a relevance set ``qrels`` (query, doc),
    emit ``(query_id, n_rel, n_hits, recall_at_k, reciprocal_rank)``
    — the eval loop every retrieval change (pruning ceiling, index
    config, fusion weights) is judged by. MRR uses the rational form
    ``1/first_hit_rank`` directly (no log-discounted nDCG: log ulps
    diverge between engines — the rational-idf rule; RR preserves the
    same "earlier is better" ordering and IS the standard companion
    metric).

    Every frame is top-k-list-sized: run is ≤ k·|queries| by
    construction, qrels is the (bounded) relevance judgments, the
    join is co-keyed on (query, doc), and the aggregates are per
    query. Queries with no run hits still report (recall 0, RR 0.0) —
    silently dropping them would inflate every mean downstream.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    r = run.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(rank_col).alias("_rank"),
    )
    q = qrels.select(
        F.col(query_col).alias("query_id"), F.col(doc_col).alias("doc_id")
    ).distinct()
    rel = q.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel")
    )
    hits = (
        r.join(q, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
            F.min("_rank").cast("bigint").alias("_first"),
        )
    )
    return (
        rel.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0))
                / F.col("n_rel").cast("double")
            ).alias("recall_at_k"),
            F.coalesce(
                F.lit(1.0) / F.col("_first"), F.lit(0.0)
            ).alias("reciprocal_rank"),
        )
    )
