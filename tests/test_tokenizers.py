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


def test_bpe_trainer_is_deterministic_and_compresses():
    from data_lake_with_spark_spark.functions.bpe import (
        BPETokenizer,
        train_bpe,
    )

    corpus = ["low lower lowest", "new newer newest", "low low newest"] * 3
    m1 = train_bpe(corpus, 30)
    m2 = train_bpe(list(reversed(corpus)), 30)
    assert m1 == m2  # order-independent, tie-broken deterministically
    tok = BPETokenizer(m1)
    toks = tok.encode("low lowest newer")
    # lossless + compressive: fewer tokens than characters
    assert "".join(toks) == "low lowest newer"
    assert len(toks) < len("low lowest newer")


def test_bpe_vendored_model_loads_and_is_lossless():
    from data_lake_with_spark_spark.functions.bpe import load_vendored

    tok = load_vendored()
    assert len(tok.ranks) > 50  # a real learned table, not a stub
    for text in (
        "the fast key order sort table scan merge",
        "Hello, world! It's 2026.",
        "",
        "tabs\tand\nnewlines stay lossless",
    ):
        assert "".join(tok.encode(text)) == text
    # fixture-vocabulary words merge to whole word pieces
    assert tok.encode("the fast merge")[:2] == ["the", " fast"]


def test_bpe_mini_backend_through_spark_seam(spark):
    from data_lake_with_spark_spark.functions.bpe import load_vendored

    got = {
        r["doc_id"]: r["tokens"]
        for r in tokenize(_df(spark), backend="bpe_mini").collect()
    }
    tok = load_vendored()
    for doc_id, text in SAMPLES:
        assert got[doc_id] == tok.encode(text)  # seam == local model
        assert "".join(got[doc_id]) == text
    # contract: same output columns/types as every other tokenizer
    # backend (simpleString ignores the nullability flag, which
    # pandas-UDF array results mark containsNull=true)
    a = tokenize(_df(spark), backend="bpe_mini").schema
    b = tokenize(_df(spark)).schema
    assert [(f.name, f.dataType.simpleString()) for f in a] == [
        (f.name, f.dataType.simpleString()) for f in b
    ]


def test_char_ngram_langid_classifies_held_out_sentences():
    from data_lake_with_spark_spark.functions.langid_ngram import classify

    held_out = {
        "en": "The old man sat near the window and watched the birds.",
        "es": "Los estudiantes escribieron una carta muy larga para el profesor.",
        "fr": "Les étudiants ont écrit une longue lettre pour le professeur.",
        "de": "Die Studenten schrieben einen sehr langen Brief für den Professor.",
    }
    for lang, sentence in held_out.items():
        assert classify(sentence) == lang
    assert classify("") == "und"


def test_char_ngram_backend_through_spark_seam(spark):
    rows = [
        (1, "the cat and the dog sat near the house"),
        (2, "el perro y el gato estaban en la casa"),
        (3, "le chien et le chat étaient dans la maison"),
        (4, "der hund und die katze waren in dem haus"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["lang_pred"]
        for r in language_id(df, backend="char_ngram").collect()
    }
    assert got == {1: "en", 2: "es", 3: "fr", 4: "de"}
    # contract: same schema as the oracled markers backend
    assert language_id(df, backend="char_ngram").columns == language_id(df).columns
