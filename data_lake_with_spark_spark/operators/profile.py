"""Data profiling (SURVEY.md §2 J4 / §5: the reference's entire
correctness methodology is interactive profiling — printSchema,
null-pattern eyeballing, count/distinct spot checks in
``data_profiling.ipynb``). This operator turns that workflow into one
engine pass: per-column row/null/distinct counts and min/max, for any
column subset, in a SINGLE aggregate over the data (no per-column
scans).

Numeric min/max surface as double, string min/max as-is; each column
becomes one output row via an explode of the one-row aggregate —
cheap regardless of table size, since the explode happens after the
aggregation has reduced everything to a single row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC


def summarize(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per profiled column:
    (column, n, n_null, n_distinct, min_num, max_num, min_str, max_str).
    """
    dtypes = dict(df.dtypes)
    cols = cols or list(dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"_null_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
        if _is_numeric(dtypes[c]):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_max_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"_smin_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"_smax_{c}"))
    one = df.agg(*aggs)

    rows = []
    for c in cols:
        numeric = _is_numeric(dtypes[c])
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                (F.col(f"_min_{c}") if numeric else F.lit(None).cast("double")).alias(
                    "min_num"
                ),
                (F.col(f"_max_{c}") if numeric else F.lit(None).cast("double")).alias(
                    "max_num"
                ),
                (F.lit(None).cast("string") if numeric else F.col(f"_smin_{c}")).alias(
                    "min_str"
                ),
                (F.lit(None).cast("string") if numeric else F.col(f"_smax_{c}")).alias(
                    "max_str"
                ),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("_p")).select("_p.*")


def check_expectations(df: DataFrame, rules: dict[str, "F.Column"]) -> DataFrame:
    """Data-quality expectations audit (the Deequ / Delta-constraints
    / dbt-test shape a production lake runs before publishing a
    table): ``rules`` maps rule name -> boolean Column; returns one
    row per rule — ``(rule, n_rows, n_violations, violation_rate)``.

    A row VIOLATES a rule unless the predicate is literally TRUE — a
    NULL check result counts as a violation (an unverifiable row is
    not a verified one; same convention as SQL CHECK constraints
    rejecting unknown on write... inverted: we audit, not reject).

    Scale shape: all rules evaluate in ONE partial-aggregable pass —
    per-rule violation counts combine map-side, the shuffle carries a
    single row of counters, and the per-rule explode happens after
    aggregation (cost independent of table size). Adding a rule adds
    a counter, not a scan. No oracle-visible nondeterminism: counts
    only.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    names = list(rules)
    for i, name in enumerate(names):
        cond = rules[name]
        aggs.append(
            F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(f"_v{i}")
        )
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v{i}").alias("n_violations"),
            # unrounded int/int division: bit-identical cross-engine
            (F.col(f"_v{i}") / F.col("_n")).alias("violation_rate"),
        )
        for i, name in enumerate(names)
    ]
    return one.select(F.explode(F.array(*rows)).alias("_e")).select("_e.*")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: "list[str] | None" = None,
) -> DataFrame:
    """Row-level diff between two corpus versions by content hash —
    the dataset-versioning audit ("what changed between crawl v3 and
    v4?"): every id labeled added / removed / changed / unchanged.

    Content equality is ``md5(concat_ws(US, cols))`` over
    ``content_cols`` (default: every shared non-id column, sorted) —
    the unit-separator delimiter keeps ("ab","c") ≠ ("a","bc"), and
    hashing means the full outer join carries one 32-char hash per
    side instead of the row bodies. One shuffle per side on the id;
    at 100 TB both sides bucket by id and the join is co-located.
    md5 keeps the diff re-derivable by any engine (same reason the
    sampling family uses it).
    """
    if content_cols is None:
        shared = set(old.columns) & set(new.columns) - {id_col}
        content_cols = sorted(shared)
    if not content_cols:
        raise ValueError("no shared content columns to diff")

    def hashed(df: DataFrame, out: str) -> DataFrame:
        cols = [F.col(c).cast("string") for c in content_cols]
        return df.select(
            F.col(id_col), F.md5(F.concat_ws("\x1f", *cols)).alias(out)
        )

    o = hashed(old, "_h_old")
    n = hashed(new, "_h_new")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        o.join(n, on=id_col, how="full_outer")
        .select(F.col(id_col), status.alias("status"))
    )

def content_manifest(
    df: DataFrame,
    group_cols: "list[str]",
    hash_cols: "list[str] | None" = None,
) -> DataFrame:
    """Content-addressed delivery manifest: per output shard/partition,
    the row count, character volume, and TWO order-independent content
    digests — the reproducibility receipt a training-data delivery
    ships alongside its files (re-run the pipeline, re-hash, diff the
    manifest: byte-level drift detection without re-reading old
    output; the snapshot_diff complement that needs only aggregates,
    not the previous corpus).

    Digests: per row, the canonical repr is the US-sep concat of the
    hashed columns (NULL → a sentinel no real value contains); rows
    digest to ``md5`` ints and combine with SUM (first 7 hex = 28
    bits, so 2^31 rows/shard stay well under bigint overflow) and
    BIT_XOR (first 15 hex = 60 bits) — both commutative/associative,
    hence shuffle-order-independent and exact (no floats anywhere).
    One partial-agg groupBy; digest arithmetic is scan-side JVM.

    Cross-engine caveat: hashed columns must be string/integer typed —
    float→string rendering differs between engines, so the caller
    casts floats explicitly (the manifest of a float column is a
    manifest of its chosen decimal rendering).
    """
    cols = hash_cols or [c for c in df.columns if c not in group_cols]
    if not cols:
        raise ValueError("content_manifest needs at least one hash column")
    row_repr = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    )
    h = F.md5(row_repr)
    h_sum = F.conv(F.substring(h, 1, 7), 16, 10).cast("bigint")
    h_xor = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    return (
        df.select(
            *group_cols,
            row_repr.alias("_repr"),
            h_sum.alias("_hs"),
            h_xor.alias("_hx"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.length("_repr")).cast("bigint").alias("n_chars"),
            F.sum("_hs").cast("bigint").alias("digest_sum"),
            F.expr("bit_xor(_hx)").cast("bigint").alias("digest_xor"),
        )
    )


def classifier_eval(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Offline eval report for a quality classifier: ROC-AUC (exact,
    via the Mann-Whitney rank-sum with midrank tie handling) plus an
    ``n_bins`` equal-width calibration table — the QA artifact that
    gates a scorer before it filters a corpus.

    Scale shape: the only global total order (the rank over the
    score) goes through
    :func:`~data_lake_with_spark_spark.operators.ranking.global_rank`
    — a range exchange, never a single-partition window. Tie midranks
    are then derived per DISTINCT score with one groupBy (midrank =
    min rank + (ties-1)/2, exact in binary: halves), so
    ``rank_sum_pos = Σ_groups n_pos · midrank`` needs no per-row
    second pass. AUC = (rank_sum_pos − P(P+1)/2) / (P·N): all-integer
    (and half-integer) arithmetic until ONE final IEEE division —
    bit-identical cross-engine while P·N < 2^52.

    Calibration bins are equal-width over [min, max] of the score
    (two order-independent aggs); each row reports the bin's floor,
    count, positives and positive rate (one int/int division).
    Returns (bin, bin_lo, n, n_pos, pos_rate, auc) — ``auc`` repeated
    per row so the report stays one flat frame.
    """
    from data_lake_with_spark_spark.operators.ranking import global_rank

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    base = scored.select(
        F.col(id_col).alias("_id"),
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    )
    ranked = global_rank(
        base, [F.col("_s").asc(), F.col("_id").asc()], rank_col="_rn"
    )
    # one materialization feeds rank groups, bin stats and the P/N
    # totals — without it the two-phase rank recomputes per consumer
    # (the ngram_rarity recompute class)
    ranked = ranked.localCheckpoint()
    groups = ranked.groupBy("_s").agg(
        F.min("_rn").alias("_minrn"),
        F.count(F.lit(1)).alias("_ties"),
        F.sum(F.col("_y").cast("bigint")).alias("_pos"),
    )
    # midrank = minrank + (ties-1)/2 — exact halves
    contrib = groups.select(
        (
            F.col("_pos").cast("double")
            * (F.col("_minrn") + (F.col("_ties") - F.lit(1)) / F.lit(2.0))
        ).alias("_c")
    )
    totals = ranked.agg(
        F.sum(F.col("_y").cast("bigint")).alias("_p"),
        F.count(F.lit(1)).alias("_n"),
        F.min("_s").alias("_lo"),
        F.max("_s").alias("_hi"),
    )
    rank_sum = contrib.agg(F.sum("_c").alias("_rs"))
    auc_row = totals.crossJoin(rank_sum).select(
        "_p",
        "_n",
        "_lo",
        "_hi",
        F.when(
            (F.col("_p") > 0) & (F.col("_n") - F.col("_p") > 0),
            (
                F.col("_rs")
                - F.col("_p").cast("double")
                * (F.col("_p") + F.lit(1)).cast("double")
                / F.lit(2.0)
            )
            / (F.col("_p") * (F.col("_n") - F.col("_p"))).cast("double"),
        ).alias("auc"),
    )
    width = F.col("_hi") - F.col("_lo")
    binned = ranked.crossJoin(F.broadcast(auc_row)).withColumn(
        "bin",
        F.when(width > 0,
               F.least(
                   F.lit(n_bins - 1),
                   F.floor((F.col("_s") - F.col("_lo")) / width * F.lit(n_bins)),
               ))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return (
        binned.groupBy("bin", "_lo", "_hi", "auc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("_y").cast("bigint")).cast("bigint").alias("n_pos"),
        )
        .select(
            "bin",
            # bin floor: deterministic per-row float expression
            (
                F.col("_lo")
                + F.col("bin").cast("double")
                * (F.col("_hi") - F.col("_lo"))
                / F.lit(float(n_bins))
            ).alias("bin_lo"),
            "n",
            "n_pos",
            (F.col("n_pos") / F.col("n").cast("double")).alias("pos_rate"),
            "auc",
        )
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group weighted (lower) median: the smallest value v such
    that the weights of rows with value ≤ v reach half the group's
    total weight — e.g. "half the TOKENS live in documents shorter
    than X", the corpus-shape number a doc-count median hides.

    Exact integer arithmetic end to end: one per-group cumulative-sum
    window over (value, id) order, one per-group total, and the
    ``2·cum >= total`` comparison (no halving division). Two keyed
    exchanges on the group column; no global sort.

    Returns (group, weighted_median, total_weight).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("bigint").alias("val"),
        F.col(weight_col).cast("bigint").alias("wt"),
        F.col(id_col).alias("_id"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("val").asc(), F.col("_id").asc())
    cum = base.withColumn("cum", F.sum("wt").over(w))
    tot = base.groupBy("grp").agg(F.sum("wt").cast("bigint").alias("total_weight"))
    return (
        cum.join(tot, "grp")
        .where(F.col("cum") * 2 >= F.col("total_weight"))
        .groupBy("grp", "total_weight")
        .agg(F.min("val").cast("bigint").alias("weighted_median"))
        .select(
            F.col("grp").alias(group_col), "weighted_median", "total_weight"
        )
    )


def grouped_linear_trend(
    df: DataFrame,
    group_col: str,
    x: "F.Column",
    y: "F.Column",
) -> DataFrame:
    """Per-group OLS line (closed form): slope and intercept of
    y ~ x within each group — segment-level trend detection (is this
    source's quality drifting? is this priority band's revenue
    growing?) as ONE aggregation pass.

    Exactness contract: x must be an integer expression and y a
    DECIMAL — all five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    then aggregate EXACTLY (integer/decimal sums are
    order-independent); the closed form is computed over those five
    SCALARS in pinned-order double arithmetic — bit-identical
    cross-engine, unlike a naive double-sum formulation whose
    partial-aggregation order would diverge between engines.

    Returns (group, n, slope, intercept); slope/intercept NULL for
    degenerate groups (all x equal).
    """
    base = df.select(
        F.col(group_col).alias("grp"),
        x.cast("bigint").alias("_x"),
        y.cast("decimal(18,4)").alias("_y"),
    )
    agg = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        # x is re-cast to decimal(10,0) and y held at decimal(18,4)
        # so the xy product stays inside decimal width 38 in BOTH
        # engines: DuckDB widths ADD on multiply (silently double past
        # 38), and Spark CAPS precision at 38 by ROUNDING THE SCALE —
        # a 39-wide product cost one ulp on the largest group and
        # hash-diverged from the exact oracle at sf0.1 (caught by the
        # multi-SF sweep, the q85 divergence class)
        F.sum(F.col("_x").cast("decimal(10,0)") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
    )
    # the five stats aggregate EXACTLY; each is cast to double ONCE
    # (round-to-nearest from an exact value — identical both engines)
    # and the closed form is then pinned-order scalar IEEE arithmetic,
    # never a float aggregation. Decimal-typed final arithmetic would
    # hit engine-specific width-overflow rules (DuckDB silently
    # promotes >38-digit products to DOUBLE; Spark caps precision) —
    # scalar doubles sidestep that divergence class.
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")

    # decimal→double must NOT go through the engine's native cast:
    # when the decimal's raw integer exceeds 2^53 (sxy does at sf0.1),
    # DuckDB's raw/10^scale double path and Spark's BigDecimal path
    # round DIFFERENTLY by 1 ulp (caught by the multi-SF sweep).
    # Converting via an exact BIGINT (raw units) then ONE division by
    # the scale factor is bit-identical everywhere int→double is
    # correctly rounded. Bound: |Σ|·10⁴ < 2^63.
    def dec_d(c: str) -> Column:
        raw = F.col(c) * F.lit(10_000)
        # Past |Σ|·10⁴ ≥ 2⁶³ non-ANSI Spark would silently NULL the
        # bigint cast while DuckDB errors — make the exactness-window
        # exit LOUD on both engines (bound is 2⁶³ rounded down to the
        # nearest double, so it can only raise early, never late).
        guarded = F.when(
            F.abs(raw) >= F.lit(9.223372036854775e18),
            F.raise_error(
                F.lit(
                    "grouped_linear_trend: |sum|*10^4 exceeds the exact "
                    "bigint window (2^63) — rescale x/y before aggregating"
                )
            ),
        ).otherwise(raw)
        return guarded.cast("bigint").cast("double") / F.lit(10_000.0)

    sy_d = dec_d("sy")
    sxy_d = dec_d("sxy")
    sxx_d = F.col("sxx").cast("double")
    num = n_d * sxy_d - sx_d * sy_d
    den = n_d * sxx_d - sx_d * sx_d
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n").cast("bigint").alias("n"),
        F.when(den != 0, num / den).alias("slope"),
        F.when(den != 0, (sy_d - (num / den) * sx_d) / n_d).alias("intercept"),
    )


def key_uniqueness(
    df: DataFrame,
    candidates: "list[list[str]]",
    mode: str = "exact",
    rsd: float = 0.02,
) -> DataFrame:
    """Candidate-key discovery report (the Deequ/profiling staple):
    for each candidate column set, the distinct-combination count,
    the uniqueness ratio, and whether the set is a key — which
    identifier survives as the dedup/join key is the FIRST decision
    every new dataset forces.

    All candidates evaluate in ONE aggregate (Spark plans the
    multi-countDistinct via a single expand + partial aggregation;
    adding a candidate adds a counter, not a scan). NULL-bearing
    combinations count as distinct combinations via a
    NULL-sentinel-free struct count — candidates are compared on
    distinct counts, one int/int division each for the ratio.

    ``mode`` (the honest-linear-asymptote escape hatch — the exact
    expand × candidates pass is α≈0.56-linear, SCALING_r07.md):

    - ``"exact"`` (default): exact countDistinct per candidate.
      Returns (candidate, n_rows, n_distinct, uniqueness, is_key).
    - ``"approx"``: HyperLogLog++ ``approx_count_distinct`` at
      ``rsd`` — the production path past ~10⁹ rows; the sketch
      merges instead of shuffling combination values, so the pass is
      one partial-aggregable scan regardless of key cardinality.
      Same schema; ``is_key`` is dropped (a sketch cannot certify
      exact equality — uniqueness ≈ 1 is the signal).
    - ``"verify"``: BOTH counters, emitting the q53-style
      driver-checkable gate (candidate, n_rows, n_distinct [exact],
      within_bound = |approx − exact| ≤ 6·rsd·exact). Costs more
      than either alone — it is the accuracy gate, not the
      production call (q53's documented tradeoff).
    """
    if not candidates:
        raise ValueError("key_uniqueness needs at least one candidate")
    if mode not in ("exact", "approx", "verify"):
        raise ValueError(f"mode must be exact|approx|verify, got {mode!r}")
    # distinct over a STRUCT, not bare columns: bare countDistinct
    # drops NULL-bearing rows (SQL COUNT DISTINCT semantics), which
    # silently inflates "uniqueness" exactly on the dirty data a key
    # check exists to catch. The struct is never null, so every
    # combination counts — and DuckDB's COUNT(DISTINCT (a, b)) row
    # syntax matches.
    structs = [F.struct(*[F.col(c) for c in cols]) for cols in candidates]
    exact_aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.countDistinct(st).alias(f"_d{i}") for i, st in enumerate(structs)
    ]
    approx_aggs = [
        F.approx_count_distinct(st, rsd=rsd).alias(f"_a{i}")
        for i, st in enumerate(structs)
    ]
    if mode == "exact":
        one = df.agg(*exact_aggs)
    elif mode == "approx":
        one = df.agg(F.count(F.lit(1)).alias("_n"), *approx_aggs)
    else:
        # verify = exact ⨯ approx as TWO one-row aggregates, never one:
        # Spark plans multi-countDistinct via EXPAND with the struct
        # values as pre-aggregation GROUPING KEYS, so an HLL aggregate
        # mixed into the same Aggregate allocates a 2^12-register
        # sketch buffer PER expand group (≈ rows × candidates groups —
        # measured 95 s vs 3 s at sf0.1, pure allocation/GC). Split,
        # the exact pass keeps q158's plan and the approx pass carries
        # exactly (partitions × candidates) sketches.
        one = df.agg(*exact_aggs).crossJoin(
            F.broadcast(df.agg(*approx_aggs))
        )

    def row(i: int, cols: "list[str]"):
        name = F.lit(",".join(cols)).alias("candidate")
        n = F.col("_n").cast("bigint").alias("n_rows")
        if mode == "verify":
            return F.struct(
                name,
                n,
                F.col(f"_d{i}").cast("bigint").alias("n_distinct"),
                (
                    F.abs(F.col(f"_a{i}") - F.col(f"_d{i}"))
                    <= F.lit(6 * rsd) * F.col(f"_d{i}")
                ).alias("within_bound"),
            )
        d = F.col(f"_d{i}" if mode == "exact" else f"_a{i}")
        fields = [
            name,
            n,
            d.cast("bigint").alias("n_distinct"),
            (d / F.col("_n").cast("double")).alias("uniqueness"),
        ]
        if mode == "exact":
            fields.append((d == F.col("_n")).alias("is_key"))
        return F.struct(*fields)

    rows = [row(i, cols) for i, cols in enumerate(candidates)]
    return one.select(F.explode(F.array(*rows)).alias("_k")).select("_k.*")


def categorical_concentration(
    df: DataFrame,
    cols: "list[str]",
) -> DataFrame:
    """Categorical concentration report: per column, the exact
    Herfindahl index ``HHI = Σ nᵢ² / N²`` and Gini impurity
    ``1 − HHI`` — the log-free answer to "is this corpus dominated by
    one language / one source / one event type?". Shannon entropy
    would say the same thing through ``ln``, whose ulps differ
    between JVM and C libm (the BM25 rational-idf lesson); HHI is
    exact-integer sums with ONE IEEE division per column, so it
    cross-engine hash-matches.

    One value-keyed groupBy per column (partial-aggregable counts),
    each collapsing to a single row before the union — adding a
    column adds a dim-sized aggregate, never a second scan shape.
    Integer bound: Σnᵢ² needs the per-value counts' squares to fit a
    BIGINT — true while the hottest value stays under ~3·10⁹ rows;
    past that, widen the squares to decimal(38,0) in BOTH engines.

    Returns (column, n_rows, n_distinct, hhi, gini).
    """
    if not cols:
        raise ValueError("categorical_concentration needs at least one column")
    parts = []
    for c in cols:
        counts = df.groupBy(F.col(c).alias("_v")).agg(
            F.count(F.lit(1)).alias("_n")
        )
        one = counts.agg(
            F.sum("_n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.sum(F.col("_n") * F.col("_n")).cast("bigint").alias("_sq"),
        )
        parts.append(
            one.select(
                F.lit(c).alias("column"),
                "n_rows",
                "n_distinct",
                (
                    F.col("_sq").cast("double")
                    / (F.col("n_rows") * F.col("n_rows")).cast("double")
                ).alias("hhi"),
                (
                    F.lit(1.0)
                    - F.col("_sq").cast("double")
                    / (F.col("n_rows") * F.col("n_rows")).cast("double")
                ).alias("gini"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def referential_integrity(
    edges: "list[tuple[str, DataFrame, list[str], DataFrame, list[str]]]",
) -> DataFrame:
    """Foreign-key integrity audit: for each named edge
    ``(name, child, fk_cols, parent, pk_cols)`` — how many child rows
    carry a NULL foreign key, how many reference a parent key that
    does not exist (orphans), and how many DISTINCT orphan keys there
    are. The first join-safety question a new lake forces: every
    orphan row silently vanishes from the inner joins every query
    downstream will write.

    Scale shape: the child side collapses to ``|distinct fk|`` keyed
    counts FIRST (one partial-agg groupBy — map-side combine does the
    heavy lifting), the parent side to its distinct keys, and the
    orphan test is a left-anti join of the two KEY frames — row
    volume never reaches the join. One edge = one such pipeline
    collapsing to a single row; edges union (bounded by the schema's
    edge count, never data). NULL-bearing foreign keys are counted
    separately, not as orphans: "unlinked" and "dangling" are
    different data bugs with different fixes.

    Returns (edge, n_rows, n_null_fk, n_orphan_rows, n_orphan_keys,
    orphan_rate) with orphan_rate = orphans / non-null rows (one
    exact-integer division; NULL when no non-null rows).
    """
    if not edges:
        raise ValueError("referential_integrity needs at least one edge")
    parts = []
    for name, child, fk_cols, parent, pk_cols in edges:
        if len(fk_cols) != len(pk_cols):
            raise ValueError(f"edge {name!r}: fk/pk column count mismatch")
        fk = [F.col(c) for c in fk_cols]
        has_null = None
        for c in fk:
            has_null = c.isNull() if has_null is None else (has_null | c.isNull())
        # ONE scan of the child per edge: row totals and the NULL-fk
        # count both derive from the keyed count frame, which is
        # pinned (it feeds the stats agg AND the anti join — the
        # lineage-recompute class) and is |distinct fk|-bounded.
        keyed = (
            child.select(*[c.alias(f"_k{i}") for i, c in enumerate(fk)],
                         has_null.alias("_null"))
            .groupBy(*[f"_k{i}" for i in range(len(fk))], "_null")
            .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
            .localCheckpoint()
        )
        stats = keyed.agg(
            F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("n_rows"),
            F.coalesce(F.sum(F.when(F.col("_null"), F.col("_n"))), F.lit(0))
            .cast("bigint")
            .alias("n_null_fk"),
        )
        pk = parent.select(
            *[F.col(c).alias(f"_k{i}") for i, c in enumerate(pk_cols)]
        ).distinct()
        orphans = keyed.where(~F.col("_null")).join(
            pk, [f"_k{i}" for i in range(len(fk))], "left_anti"
        ).agg(
            F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias(
                "n_orphan_rows"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_orphan_keys"),
        )
        parts.append(
            stats.crossJoin(F.broadcast(orphans))
            .select(
                F.lit(name).alias("edge"),
                "n_rows",
                "n_null_fk",
                "n_orphan_rows",
                "n_orphan_keys",
                F.when(
                    F.col("n_rows") - F.col("n_null_fk") > 0,
                    F.col("n_orphan_rows")
                    / (F.col("n_rows") - F.col("n_null_fk")).cast("double"),
                ).alias("orphan_rate"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def numeric_outlier_report(
    df: DataFrame,
    group_col: str,
    value: "Column",
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier audit per group: discrete quartiles, IQR,
    the ``k``·IQR fences, and how many values fall outside — the
    numeric-column sanity gate (a corrupted ingest shows up as an
    outlier-rate spike before any model sees it).

    Exactness: quartiles are DISCRETE — the value at rank
    ``ceil(p·n)`` of the group's sort — so every reported number is
    an actual data value (no interpolation arithmetic to diverge
    cross-engine; both engines compute the identical rank from exact
    integers). Fences are two pinned-order IEEE ops on those values;
    the outlier comparison is exact. NULL values are excluded (a
    NULL is a missing-ness finding, not an outlier).

    One exchange: the rank window partitions by group; the stats agg
    and the fence count reuse the ranked frame (pinned — two
    consumers, the lineage-recompute class).

    Returns (group, n, p25, p75, iqr, lo_fence, hi_fence,
    n_outliers, outlier_rate).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(F.col("_v").asc())
    wn = Window.partitionBy("grp")
    ranked = (
        df.select(F.col(group_col).alias("grp"), value.cast("double").alias("_v"))
        .where(F.col("_v").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .localCheckpoint()
    )
    r25 = F.ceil(F.lit(0.25) * F.col("_n"))
    r75 = F.ceil(F.lit(0.75) * F.col("_n"))
    stats = ranked.groupBy("grp").agg(
        F.max("_n").cast("bigint").alias("n"),
        F.max(F.when(F.col("_rn") == r25, F.col("_v"))).alias("p25"),
        F.max(F.when(F.col("_rn") == r75, F.col("_v"))).alias("p75"),
    )
    iqr = F.col("p75") - F.col("p25")
    fenced = stats.select(
        "grp",
        "n",
        "p25",
        "p75",
        iqr.alias("iqr"),
        (F.col("p25") - F.lit(k) * iqr).alias("lo_fence"),
        (F.col("p75") + F.lit(k) * iqr).alias("hi_fence"),
    )
    out = (
        ranked.join(fenced, "grp")
        .where((F.col("_v") < F.col("lo_fence")) | (F.col("_v") > F.col("hi_fence")))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_outliers"))
    )
    return (
        fenced.join(out, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n",
            "p25",
            "p75",
            "iqr",
            "lo_fence",
            "hi_fence",
            F.coalesce("n_outliers", F.lit(0)).cast("bigint").alias(
                "n_outliers"
            ),
            (
                F.coalesce("n_outliers", F.lit(0))
                / F.col("n").cast("double")
            ).alias("outlier_rate"),
        )
    )


def functional_dependencies(
    df: DataFrame,
    pairs: "list[tuple[list[str], str]]",
) -> DataFrame:
    """Functional-dependency audit: for each candidate dependency
    ``determinant columns → dependent column``, does every
    determinant group map to exactly ONE dependent value? The
    profiling staple next to key discovery (:func:`key_uniqueness`):
    keys say which columns identify a row; FDs say which columns are
    DERIVABLE — the difference between "safe to denormalize/join on"
    and "this 'attribute' secretly varies per group" (the data bug
    that silently duplicates rows after an enrichment join).

    Per pair: ONE keyed groupBy counting distinct dependent values
    (over a STRUCT, so NULL dependents count as a value — an FD
    violated only by NULLs is still violated), then one summary agg.
    Pairs union (bounded by the audit list, never data); each
    pipeline is partial-aggregable, row volume collapses at the
    first groupBy. All counts exact integers.

    Returns (determinant, dependent, n_groups, n_violating_groups,
    max_dep_values, holds) — ``holds`` iff no group maps to more
    than one dependent value.
    """
    if not pairs:
        raise ValueError("functional_dependencies needs at least one pair")
    parts = []
    for dets, dep in pairs:
        if not dets:
            raise ValueError("determinant column list must be non-empty")
        per_group = (
            df.groupBy(*[F.col(c) for c in dets])
            .agg(
                F.countDistinct(F.struct(F.col(dep))).alias("_nd")
            )
        )
        parts.append(
            per_group.agg(
                F.lit(",".join(dets)).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_groups"),
                F.max("_nd").cast("bigint").alias("max_dep_values"),
            ).withColumn("holds", F.col("n_violating_groups") == 0)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def percentile_envelope(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: float = 0.5,
    accuracy: int = 1000,
) -> DataFrame:
    """Driver-verifiable gate for the OTHER Spark sketch:
    ``approx_percentile`` (Greenwald–Khanna). Unlike HLL (q53/q179's
    6·rsd envelope — a standard-error multiple, not a guarantee), GK
    carries a HARD deterministic rank bound: the returned value's
    rank is within ``±n/accuracy`` of ``p·n``. The gate computes the
    estimate per group, then the estimate's EXACT rank INTERVAL
    (duplicate values occupy a rank range, not a point) in a second
    keyed pass, and emits whether that interval intersects the
    guaranteed band — the estimate itself (engine-specific) never
    reaches the output, so the oracle is portable (the q53 pattern,
    with a hard bound instead of an envelope). NULL values are
    excluded from both the sketch and the rank, matching SQL
    percentile semantics.

    Returns (group, n, within_bound).
    """
    if not (0.0 < p < 1.0):
        raise ValueError(f"p must be in (0, 1), got {p}")
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1, got {accuracy}")
    v = F.col(value_col)
    est = df.groupBy(F.col(group_col).alias("group")).agg(
        F.percentile_approx(v, p, accuracy).alias("_est"),
        F.count(v).cast("bigint").alias("n"),
    )
    ranked = (
        df.select(F.col(group_col).alias("group"), v.alias("_v"))
        .where(F.col("_v").isNotNull())
        .join(F.broadcast(est), "group")
        .groupBy("group")
        .agg(
            F.sum(F.when(F.col("_v") < F.col("_est"), 1).otherwise(0))
            .cast("bigint")
            .alias("_lt"),
            F.sum(F.when(F.col("_v") <= F.col("_est"), 1).otherwise(0))
            .cast("bigint")
            .alias("_le"),
            F.max("n").alias("n"),
        )
    )
    # GK guarantee: the returned VALUE occupies the rank interval
    # [count(v < est) + 1, count(v ≤ est)] (duplicates widen it), and
    # SOME rank in that interval lies within ±n/accuracy (+1 for the
    # discrete floor) of p·n. The bound test is whether the two
    # intervals intersect — pure rational arithmetic via integer
    # cross-multiplication (no float comparison at all), with p
    # scaled to an exact rational p_num/10^6:
    #   rank_lo ≤ p·n + n/acc + 1   AND   rank_hi ≥ p·n − n/acc − 1
    p_num = int(round(p * 10**6))
    acc = int(accuracy)
    m = F.lit(10**6)
    target = F.lit(p_num) * F.col("n") * F.lit(acc)  # p·n · acc·10^6
    slack = (F.col("n") + F.lit(acc)) * m  # (n/acc + 1) · acc·10^6
    rank_lo = (F.col("_lt") + F.lit(1)) * F.lit(acc) * m
    rank_hi = F.col("_le") * F.lit(acc) * m
    return ranked.select(
        "group",
        "n",
        (
            (rank_lo <= target + slack) & (rank_hi >= target - slack)
        ).alias("within_bound"),
    )
