"""Event-analytics operators over the ``events`` table: ordered-funnel
conversion and SCD2 (type-2 slowly-changing-dimension) history builds.

Beyond-reference family (the reference processes its event log as a
flat batch — SURVEY §2 I5): these are the standard product-analytics /
lakehouse-dimension shapes a training-data platform also needs for
user-behavior curation. Both are pure DataFrame compositions — per-key
window functions and co-partitioned re-joins on the same key — so
every shuffle hashes on the entity key once and Catalyst reuses that
partitioning across stages.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: a user converts stage *i* only with an
    event of type ``stages[i]`` at a timestamp strictly after their
    stage *i-1* conversion time (first-touch semantics: the earliest
    qualifying event per stage).

    Returns one row per stage: ``(stage, stage_idx, n_users)`` with
    ``n_users`` monotonically non-increasing down the funnel.

    Scale shape: one declarative plan, no driver-side per-stage
    actions — the per-user conversion frame (:func:`funnel_users`)
    collapses to a single row of ``count(t_<stage>)`` aggregates,
    unpivoted with ``stack``. Stage *i* inside that frame is a
    groupBy + join keyed on ``user_col``: after the first hash
    exchange every later stage reuses the same key partitioning, and
    each per-user state frame carries exactly one row per converted
    user, so the joins stay dim-sized regardless of event volume.
    """
    per_user = funnel_users(events, stages, user_col, type_col, ts_col)
    agg = per_user.agg(
        *[F.count(f"t_{s}").alias(f"n_{i}") for i, s in enumerate(stages)]
    )
    stack_args = ", ".join(
        f"'{s}', {i}, `n_{i}`" for i, s in enumerate(stages)
    )
    return agg.selectExpr(
        f"stack({len(stages)}, {stack_args}) AS (stage, stage_idx, n_users)"
    )


def funnel_users(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel conversion times: ``(user, t_<stage>...)`` with
    NULL from the first unconverted stage on. Same first-touch /
    strictly-after semantics as :func:`funnel_stages`, fully
    distributed output (one row per user who entered the funnel)."""
    out = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{stages[0]}"))
    )
    prev = f"t_{stages[0]}"
    for stage in stages[1:]:
        col = f"t_{stage}"
        nxt = (
            events.where(F.col(type_col) == stage)
            .join(out.select(user_col, F.col(prev).alias("_p")), on=user_col)
            .where(F.col(ts_col) > F.col("_p"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(col))
        )
        out = out.join(nxt, on=user_col, how="left")
        prev = col
    return out


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_col: str,
    ts_col: str = "ts",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event/CDC log:
    collapse consecutive same-value rows per key and emit one validity
    interval per attribute *change* —
    ``(key..., attr, valid_from, valid_to, is_current)`` with
    half-open intervals (``valid_to`` = next change's ``valid_from``,
    NULL while current).

    Two window passes over one hash partitioning on the key (lag to
    detect changes, lead to close intervals) — the standard
    MERGE-free SCD2 derivation; at scale the only shuffle is the
    per-key sort the windows share. Ties on ``ts_col`` break on
    ``tiebreak_cols`` for deterministic output.

    NULL attribute values are first-class states: the previous value
    rides inside a lagged STRUCT (NULL only on the true first row per
    key, even when the attribute itself is NULL) and change detection
    is null-safe (``eqNullSafe``), so a non-null→NULL transition
    opens a new interval and consecutive NULLs collapse — a plain
    ``!=`` filter silently drops the former and duplicates the
    latter.
    """
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    changes = (
        df.withColumn("_prev", F.lag(F.struct(F.col(attr_col).alias("v"))).over(w))
        .where(
            F.col("_prev").isNull()
            | ~F.col(attr_col).eqNullSafe(F.col("_prev.v"))
        )
        .drop("_prev")
    )
    # same ordering as the change detection so ts ties close
    # deterministically
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .select(
            *keys,
            F.col(attr_col),
            "valid_from",
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "month",
) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    cohorted by the period of their FIRST event; cell (cohort, k) =
    distinct users of that cohort active k periods later.

    Two shuffles: the per-user min (partial-aggregable groupBy) and
    the final (cohort, offset) distinct-count; the per-user cohort
    frame joins back broadcast-or-shuffle on user id as Catalyst
    prefers. Offsets are exact integers per period: day/week counts
    from ``datediff`` of truncated dates, month from
    ``months_between`` of month-starts — no float fuzz in any mode.
    Returns (cohort, offset, n_users).
    """
    if period not in ("day", "week", "month"):
        raise ValueError(f"period {period!r}: use day, week, or month")
    first = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("_cohort")
    )
    act = events.select(
        F.col(user_col).alias("_u"),
        F.date_trunc(period, F.col(ts_col)).alias("_p"),
    ).distinct()
    if period == "month":
        offset = F.months_between(F.col("_p"), F.col("_cohort"))
    elif period == "week":
        offset = F.datediff(F.col("_p"), F.col("_cohort")) / 7
    else:
        offset = F.datediff(F.col("_p"), F.col("_cohort"))
    return (
        act.join(first, on="_u")
        .select(
            F.col("_cohort").alias("cohort"),
            offset.cast("int").alias("offset"),
            F.col("_u"),
        )
        .groupBy("cohort", "offset")
        .agg(F.countDistinct("_u").alias("n_users"))
    )


def attribute_conversions(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_type: str = "click",
    max_gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch attribution: credit each conversion event to the
    most recent preceding touch event by the same user within
    ``max_gap_s`` seconds — the marketing/behavior-curation join that
    labels which interaction "caused" each purchase.

    One per-user window pass, no self-join: the touch candidate is
    carried as a MAX over a zero-padded ``(epoch_micros, event_id)``
    string key over ``ROWS UNBOUNDED PRECEDING .. 1 PRECEDING`` —
    string max is portable across engines, and the padding makes
    lexicographic order equal (ts, id) order. A user's history never
    leaves its hash partition, so the whole operator is one exchange
    on the user key. Outside-window or touchless conversions emit
    NULL attribution rather than dropping — the unattributed rate is
    itself the metric analysts want.

    Returns (conversion_id, user_id, touch_id, gap_us) — the gap kept
    in exact integer microseconds (no float division).
    """
    # NTZ parquet timestamps cast through the session tz (pinned UTC
    # in session.py), so unix_micros equals DuckDB's naive epoch_us
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # The string MAX is only order-correct while both key parts
    # zero-pad without truncation: lpad TRUNCATES past the pad width
    # (silently corrupting both the (ts, id) order and the decoded
    # touch_id), and a '-' sign sorts below digits. 20 covers the full
    # bigint digit span; negative ids / pre-1970 timestamps raise
    # instead of mis-attributing.
    bad_domain = (micros < 0) | (F.col(id_col) < 0)
    touch_key = F.when(
        F.col(type_col) == touch_type,
        F.when(
            bad_domain,
            F.raise_error(
                F.lit(
                    "attribute_conversions: negative event id or pre-1970 "
                    "timestamp breaks the lexicographic touch key"
                )
            ),
        ).otherwise(
            F.concat_ws(
                ":",
                F.lpad(micros.cast("string"), 20, "0"),
                F.lpad(F.col(id_col).cast("string"), 20, "0"),
            )
        ),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    annotated = events.withColumn("_last_touch", F.max(touch_key).over(w))
    conv = annotated.where(F.col(type_col) == conversion_type)
    touch_us = F.split(F.col("_last_touch"), ":").getItem(0).cast("bigint")
    touch_id = F.split(F.col("_last_touch"), ":").getItem(1).cast("bigint")
    gap = micros - touch_us
    in_window = gap <= F.lit(max_gap_s) * F.lit(1_000_000)
    return conv.select(
        F.col(id_col).alias("conversion_id"),
        F.col(user_col).alias("user_id"),
        F.when(in_window, touch_id).alias("touch_id"),
        F.when(in_window, gap).alias("gap_us"),
    )


def multitouch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_type: str = "click",
    window_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Linear multi-touch attribution: every touch in the lookback
    window shares the conversion's credit equally — the
    position-agnostic counterpart of :func:`attribute_conversions`
    (last-touch). Emits per conversion the in-window touch count and
    the per-touch credit fraction.

    Mechanism: a RANGE-frame window over exact epoch microseconds —
    ``RANGE BETWEEN window_s·10⁶ PRECEDING AND 1 PRECEDING`` — counts
    the user's touches in (t−W, t) directly; no self-join, no
    interval explosion, one exchange on the user key. Range frames
    (vs row frames) are the piece Spark windowing is usually demoed
    without; over an integer epoch column they are exact and
    engine-portable.

    Returns (conversion_id, user_id, n_touches, credit) where credit
    = 1/n_touches (NULL when no touch is in window — the
    unattributed-conversion marker, same convention as last-touch).
    """
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(user_col)
        .orderBy(micros)
        .rangeBetween(-window_s * 1_000_000, -1)
    )
    is_touch = F.when(F.col(type_col) == touch_type, F.lit(1))
    annotated = events.withColumn("_n", F.count(is_touch).over(w))
    conv = annotated.where(F.col(type_col) == conversion_type)
    return conv.select(
        F.col(id_col).alias("conversion_id"),
        F.col(user_col).alias("user_id"),
        F.col("_n").cast("bigint").alias("n_touches"),
        F.when(F.col("_n") > 0, F.lit(1.0) / F.col("_n")).alias("credit"),
    )


def event_lift(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Event co-occurrence lift matrix (market-basket association
    over users): for every unordered event-type pair, how much more
    often users exhibit BOTH types than independence predicts —
    ``lift = (n_both · n_users) / (n_a · n_b)``.

    The pair space is bounded by the TYPE vocabulary, not the data:
    one distinct on (user, type) — the only data-sized shuffle —
    then a per-user self-join whose fan-out is ≤ |types|² per user,
    and a final count per pair. All counts exact integers; lift is
    exact-integer products cast to double once each, then ONE
    division (pinned order, engine-portable).

    Returns (type_a, type_b, n_a, n_b, n_both, lift) with
    type_a < type_b.
    """
    ut = events.select(
        F.col(user_col).alias("_u"), F.col(type_col).alias("_t")
    ).distinct()
    # one materialization: the distinct frame feeds the per-type
    # counts, the user total, and BOTH sides of the pair join (the
    # lineage-recompute class otherwise re-runs the distinct 4×)
    ut = ut.localCheckpoint()
    n_users = ut.select("_u").distinct().count()
    per_type = ut.groupBy("_t").agg(F.count(F.lit(1)).alias("_n"))
    a = ut.select(F.col("_u"), F.col("_t").alias("type_a"))
    b = ut.select(F.col("_u"), F.col("_t").alias("type_b"))
    both = (
        a.join(b, "_u")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        both.join(per_type.select(F.col("_t").alias("type_a"),
                                  F.col("_n").alias("n_a")), "type_a")
        .join(per_type.select(F.col("_t").alias("type_b"),
                              F.col("_n").alias("n_b")), "type_b")
        .select(
            "type_a", "type_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_both").cast("bigint").alias("n_both"),
            (
                (F.col("n_both") * F.lit(n_users)).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


def rate_spikes(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    factor: int = 3,
    trailing: int = 4,
    bucket: str = "hour",
) -> DataFrame:
    """Event-rate spike detection — the pipeline-monitoring pass that
    catches an ingest storm, a clickbot burst, or a broken producer
    the hour it happens: per (event type, time bucket), is the
    bucket's event count more than ``factor`` times its trailing
    baseline (the mean of the previous ``trailing`` buckets)?

    ENTIRELY INTEGER ARITHMETIC: counts are bigints, the baseline
    stays a (sum, n) pair, and the spike test cross-multiplies —
    ``count · baseline_n > factor · baseline_sum`` — so there is no
    division, no float, and nothing an engine can round differently
    (the graph-family lesson applied preemptively). One keyed
    groupBy + one ROWS-frame window per type (ROWS, not RANGE — the
    compaction-planner peer-row lesson); a bucket with no
    predecessors has baseline_n = 0 and is never flagged
    (cross-multiplying keeps that case exact too: 0 > 0 is false).
    Buckets with zero events are ABSENT, not zero — the trailing
    frame walks existing buckets; feed :func:`timeseries` gap-fill
    first when silence itself must count.

    Returns (event_type, bucket_ts, n_events, baseline_sum,
    baseline_n, is_spike).
    """
    from pyspark.sql import Window

    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    if trailing < 1:
        raise ValueError(f"trailing must be >= 1, got {trailing}")
    counts = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-trailing, -1)
    )
    return counts.select(
        "event_type",
        "bucket_ts",
        "n_events",
        F.coalesce(F.sum("n_events").over(w), F.lit(0))
        .cast("bigint")
        .alias("baseline_sum"),
        F.count("n_events").over(w).cast("bigint").alias("baseline_n"),
    ).withColumn(
        "is_spike",
        (F.col("n_events") * F.col("baseline_n"))
        > (F.lit(int(factor)) * F.col("baseline_sum")),
    )
