"""Text-analysis operators over the ``documents`` table.

LLM-training-data pipeline primitives: language ID, quality scoring,
token counting, document fingerprinting. All pure built-in SQL
functions (JVM-side, codegen-friendly) and expressed so the DuckDB
oracle can compute identical values — the regexes used are valid and
equivalent in both engines.

At 100 TB these are embarrassingly parallel projections: no shuffle,
filter-pushdown-friendly, and cheap enough to fuse into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language marker-word lists for the n-gram/stopword
#: heuristic language scorer. Deliberately small + deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "des", "est"),
    "de": ("der", "die", "das", "und", "ist"),
}


def _count_word(col: Column, word: str) -> Column:
    """Whole-word occurrence count. Oracle twin:
    ``len(regexp_extract_all(col, pat))`` — \\b works in both RE2 and
    Java regex."""
    pat = rf"\b{word}\b"
    return F.regexp_count(col, F.lit(pat))


def token_count(col: Column) -> Column:
    """Whitespace token count. Oracle: len(string_split_regex(.,'\\s+'))."""
    return F.size(F.split(F.trim(col), r"\s+"))


def char_classes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring signals: length, punctuation ratio, digit ratio,
    uppercase ratio, mean word length."""
    c = F.col(text_col)
    n = F.length(c).cast("double")
    def ratio(pattern: str) -> Column:
        # n == 0 guard: Spark's non-ANSI 0/0 is NULL but DuckDB's is
        # NaN, so an unguarded ratio diverges from the SQL oracle on
        # empty documents; NULL on both engines is the portable answer.
        return F.when(
            n > 0,
            F.round((n - F.length(F.regexp_replace(c, pattern, ""))) / n, 6),
        ).otherwise(F.lit(None).cast("double"))
    return df.select(
        "*",
        n.cast("bigint").alias("n_chars_measured"),
        ratio(r"[.,;:!?]").alias("punct_ratio"),
        ratio(r"[0-9]").alias("digit_ratio"),
        ratio(r"[A-Z]").alias("upper_ratio"),
        token_count(c).alias("n_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: favors mid-length docs with
    low punctuation/digit density and a sane mean token length."""
    scored = char_classes(df, text_col)
    length_score = F.least(F.col("n_chars_measured") / F.lit(500.0), F.lit(1.0))
    clean_score = F.lit(1.0) - F.least(
        F.col("punct_ratio") + F.col("digit_ratio"), F.lit(1.0)
    )
    return scored.withColumn(
        "quality", F.round(F.lit(0.5) * length_score + F.lit(0.5) * clean_score, 6)
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word hit counts per language + argmax prediction.

    A real system would use fastText/CLD3 via a pandas UDF; this
    n-gram/stopword heuristic keeps the operator oracle-checkable and
    JVM-side. Ties break by language code order (deterministic).
    """
    c = F.lower(F.col(text_col))
    score_cols = []
    for lang, words in LANG_MARKERS.items():
        s = sum((_count_word(c, w) for w in words), F.lit(0))
        score_cols.append(s.alias(f"score_{lang}"))
    scored = df.select("*", *score_cols)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"score_{lang}") == best), lang).otherwise(pred)
    return scored.withColumn("lang_pred", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: lowercase, collapse whitespace,
    strip non-alphanumerics, md5. Identical normalization in the
    DuckDB oracle; used by exact dedup as the grouping key."""
    c = F.col(text_col)
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", ""), r"\s+", " "
    )
    return df.withColumn("fp", F.md5(F.trim(normalized)))
