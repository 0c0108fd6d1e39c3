"""Tokenizer / language-ID seam (functions/tokenizers.py): default
backends must be byte-identical to the oracled expressions; the
gpt2_regex backend must segment like the public GPT-2 pre-tokenizer;
model-backed backends are import-gated."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from data_lake_with_spark_spark.functions.tokenizers import (
    language_id,
    tokenize,
)

SAMPLES = [
    (1, "the cat and the hat"),
    (2, "Hello, world! It's 2026."),
    (3, ""),
    (4, "der hund und die katze ist da"),
]


def _df(spark):
    return spark.createDataFrame(SAMPLES, ["doc_id", "text"])


def test_whitespace_backend_matches_oracle_expression(spark):
    from data_lake_with_spark_spark.operators.text import tokens

    got = {
        r["doc_id"]: r["tokens"] for r in tokenize(_df(spark)).collect()
    }
    exp = {
        r["doc_id"]: r["t"]
        for r in _df(spark).select("doc_id", tokens(F.col("text")).alias("t")).collect()
    }
    assert got == exp


def test_gpt2_regex_backend_segments_like_bpe_pretokenizer(spark):
    got = {
        r["doc_id"]: r["tokens"]
        for r in tokenize(_df(spark), backend="gpt2_regex").collect()
    }
    # leading-space word pieces, contraction split, punct separated —
    # the GPT-2 pre-tokenizer's signature behavior
    assert got[1] == ["the", " cat", " and", " the", " hat"]
    assert got[2] == ["Hello", ",", " world", "!", " It", "'s", " 2026", "."]
    assert got[3] == []
    # lossless: concatenation reproduces the input
    assert "".join(got[2]) == "Hello, world! It's 2026."


def test_markers_backend_matches_lang_scores(spark):
    from data_lake_with_spark_spark.operators.text import lang_scores

    got = {
        r["doc_id"]: r["lang_pred"] for r in language_id(_df(spark)).collect()
    }
    exp = {
        r["doc_id"]: r["lang_pred"] for r in lang_scores(_df(spark)).collect()
    }
    assert got == exp
    assert got[1] == "en" and got[4] == "de"
    # contract: no score_* columns leak through the seam
    assert language_id(_df(spark)).columns == ["doc_id", "text", "lang_pred"]


def test_unknown_backends_rejected(spark):
    with pytest.raises(ValueError, match="unknown tokenizer backend"):
        tokenize(_df(spark), backend="sentencepiece")
    with pytest.raises(ValueError, match="unknown language-ID backend"):
        language_id(_df(spark), backend="cld3")


def test_model_backends_import_gated(spark):
    try:
        import tiktoken  # noqa: F401

        have_tiktoken = True
    except ImportError:
        have_tiktoken = False
    if have_tiktoken:
        got = {
            r["doc_id"]: r["tokens"]
            for r in tokenize(_df(spark), backend="tiktoken").collect()
        }
        assert "".join(got[2]) == "Hello, world! It's 2026."
    else:
        with pytest.raises(ImportError, match="tiktoken"):
            tokenize(_df(spark), backend="tiktoken")
    try:
        import fasttext  # noqa: F401

        have_fasttext = True
    except ImportError:
        have_fasttext = False
    if not have_fasttext:
        with pytest.raises(ImportError, match="fasttext"):
            language_id(_df(spark), backend="fasttext")
