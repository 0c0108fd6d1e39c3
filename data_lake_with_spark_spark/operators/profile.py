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

from pyspark.sql import DataFrame
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
