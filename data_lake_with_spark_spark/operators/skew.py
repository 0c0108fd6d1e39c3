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
