"""Skew-handling utilities (SURVEY.md §7 M6).

The reference's songplays join keys are natural strings with hot keys
(popular titles) and a null-heavy side (1,236/8,056 sample log rows
have null artist — SURVEY §4). Three escalation levels:

1. **AQE skew join** — on by default in session.py
   (``spark.sql.adaptive.skewJoin.enabled``): splits oversized
   partitions at runtime. First line of defense; zero code.
2. **Broadcast** — if one side fits in memory, skew is irrelevant
   (operators/relational.py join hints).
3. **Salting** (:func:`salted_join`) — when both sides are large and
   hot keys remain: explode the hot side's key space by a salt
   factor, replicate the other side across salts, join, drop salt.
   Turns one partition of size H into S partitions of size H/S.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skewed keys.

    ``left`` (the skewed/fact side) gets a random-but-deterministic
    salt derived from a row hash; ``right`` is replicated ``salt``
    times (explode of a literal range — cheap when right is the
    smaller side). Result equals ``left.join(right, on, how)`` for
    equi-joins on non-null keys.
    """
    on = list(on)
    lsalt = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    rsalt = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lsalt.join(rsalt, on=on + [SALT_COL], how=how)
    return out.drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    salt: int = 8,
) -> DataFrame:
    """Two-phase (salted) aggregation for skewed group keys.

    Phase 1 groups by (keys, salt) computing partial sums/counts;
    phase 2 re-aggregates by keys alone. For decomposable aggregates
    over exact types (counts, decimal sums) the result is identical
    to the direct ``groupBy(keys)`` — this pattern matters when hot
    keys would overflow a single reducer's partial-agg hash table or
    produce one giant final partition. ``sums`` maps output column
    name → a sum-able input expression (summed exactly as given in
    phase 1, then re-summed in phase 2).
    """
    salted = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial = salted.groupBy(*list(keys), SALT_COL).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(expr).alias(f"__s_{name}") for name, expr in sums.items()],
    )
    return partial.groupBy(*list(keys)).agg(
        F.sum("__n").alias("n"),
        *[F.sum(f"__s_{name}").alias(name) for name in sums],
    )


def explain_shuffles(df: DataFrame) -> str:
    """Return the formatted physical plan (debug aid: count the
    Exchange nodes you expected — and the ones you didn't)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def skew_report(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 20,
) -> DataFrame:
    """Pre-join skew diagnostic — the report you run BEFORE choosing
    between AQE, broadcast, and :func:`salted_join`: the ``top_n``
    heaviest join keys by estimated output contribution, with each
    side's row count, the key's estimated pair count
    (``n_left × n_right`` — exactly the partition size a shuffle join
    materializes for that key), and its share of the total estimated
    join output. A key with ``pair_share`` ≈ 0.3 means one reducer
    partition does 30% of the join work — the straggler signature.

    Scale shape: one partial-agg groupBy per side (map-side combine
    does the heavy lifting — the count tables are |distinct keys|,
    not |rows|), a full-outer count join keyed the same way, and a
    bounded ``top_n`` TakeOrderedAndProject. All integer arithmetic
    except the single share division. Keys absent from one side count
    0 pairs but still surface if NULL-heavy (the reference's
    1,236-null artist column is the motivating case — SURVEY §4);
    NULL keys group like any value.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    keys = list(key_cols)
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("n_left"))
    rc = right.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_right")
    )
    j = lc.join(rc, keys, "full_outer").select(
        *keys,
        F.coalesce("n_left", F.lit(0)).cast("bigint").alias("n_left"),
        F.coalesce("n_right", F.lit(0)).cast("bigint").alias("n_right"),
    )
    # j feeds TWO consumers (the total aggregate and the ranked
    # output); without a materialization each action re-runs both
    # per-side count aggregations (the lineage-recompute class —
    # rank_overlap/event_lift/bm25_topk all pin it the same way).
    # Bounded: |distinct keys| rows of counters.
    j = j.withColumn(
        "est_pairs", (F.col("n_left") * F.col("n_right")).cast("bigint")
    ).localCheckpoint()
    total = j.agg(F.sum("est_pairs").cast("bigint").alias("_tot"))
    ranked = (
        j.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_left",
            "n_right",
            "est_pairs",
            F.when(
                F.col("_tot") > 0, F.col("est_pairs") / F.col("_tot")
            ).otherwise(F.lit(0.0)).alias("pair_share"),
        )
        .orderBy(F.col("est_pairs").desc(), *[F.col(k).asc_nulls_last() for k in keys])
        .limit(top_n)
    )
    return ranked
