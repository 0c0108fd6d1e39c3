from __future__ import annotations

import pyspark.sql.functions as F

from data_lake_with_spark_spark.operators import text


def test_lang_id_picks_marker_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is big"),
            (2, "el gato de la casa que los perros"),
            (3, "der hund und die katze das ist gut"),
            (4, "xyzzy plugh"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in text.lang_scores(df).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "de"
    assert out[4] == "und"


def test_token_count_and_ratios(spark):
    df = spark.createDataFrame([(1, "Hello, World 42!")], ["doc_id", "text"])
    row = text.char_classes(df).first()
    assert row["n_tokens"] == 3
    assert row["n_chars_measured"] == 16
    assert row["punct_ratio"] == round(2 / 16, 6)
    assert row["digit_ratio"] == round(2 / 16, 6)
    assert row["upper_ratio"] == round(2 / 16, 6)


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, "x" * 600)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r["quality"] for r in text.quality_score(df).collect()}
    assert 0.0 <= rows[1] <= 1.0
    assert rows[2] == 1.0  # long, no punctuation/digits


def test_fingerprint_invariant_to_case_punct_whitespace(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,   World!"),
            (2, "hello world"),
            (3, "different"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["fp"] for r in text.fingerprint(df).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
