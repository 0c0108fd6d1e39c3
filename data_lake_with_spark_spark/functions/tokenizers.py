"""Pluggable tokenizer / language-ID seam.

The oracled text operators (operators/text.py) deliberately use a
whitespace tokenizer and a marker-word language scorer: deterministic,
JVM-side, and expressible in the DuckDB oracle. Production pipelines
want real components — a BPE tokenizer (tiktoken), a trained lang-ID
model (fastText) — so this module provides both behind one column
contract, selected by backend name:

- ``tokenize(df, backend=...)`` appends ``tokens array<string>``
  - ``whitespace`` — the oracle-checked default; identical output to
    ``text.tokens`` (split on ``\\s+``), whole-stage codegen'd.
  - ``gpt2_regex`` — the public GPT-2/tiktoken *pre-tokenizer* regex
    evaluated with ``regexp_extract_all``: a real BPE segmentation
    boundary, still JVM-side and shuffle-free (Java regex supports the
    pattern's lookahead; the DuckDB oracle's RE2 does not, so this
    backend is test-verified rather than oracled).
  - ``tiktoken`` — true BPE ids decoded back to token strings through
    an Arrow-batched pandas UDF. Import-gated: raises ImportError
    with the install hint when the package is absent (as here).
  - ``bpe_mini`` — true greedy rank-ordered BPE (functions/bpe.py,
    pure Python) over the VENDORED merges table
    (resources/bpe_merges_mini.jsonl, trained by tools/train_bpe.py).
    Runs through the same Arrow-batched pandas-UDF shape as the
    tiktoken backend — one model load per worker process, cached —
    so the model-backed seam contract is TESTED offline, not
    import-gated away.
- ``language_id(df, backend=...)`` appends ``lang_pred string``
  - ``markers`` — the oracle-checked marker-word argmax
    (text.lang_scores), JVM-side.
  - ``fasttext`` — model-based prediction via a pandas UDF over the
    same contract; import- and model-path-gated.
  - ``char_ngram`` — Cavnar-Trenkle rank-ordered char-n-gram
    profiles (functions/langid_ngram.py, vendored seed model), the
    dependency-free tested twin of the fasttext backend.

Every backend is a pure projection (no shuffle); the pandas-UDF
backends batch through Arrow, load their model once per worker
process, and add one Python stage to the plan — the documented cost
of leaving codegen. Swapping backends changes no downstream operator:
everything consumes the ``tokens`` / ``lang_pred`` columns.
"""

from __future__ import annotations

# Module-level on purpose: the pandas-UDF backends annotate their
# kernels with ``pd.Series``, and under PEP-563 string annotations
# PySpark resolves those hints against MODULE globals — a
# function-local ``import pandas as pd`` leaves the hint unresolvable
# (PySparkNotImplementedError: UNSUPPORTED_SIGNATURE). But guarded
# (round-6 advisor): the pure-JVM backends (whitespace, gpt2_regex,
# markers) must import fine on a pandas-less driver; only selecting a
# pandas-UDF backend requires pandas, enforced in _require_pandas.
try:
    import pandas as pd  # noqa: F401
except ImportError:  # pragma: no cover - exercised on pandas-less drivers
    pd = None  # type: ignore[assignment]

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _require_pandas(backend: str) -> None:
    if pd is None:
        raise ImportError(
            f"tokenizer backend {backend!r} is a pandas UDF and needs "
            "pandas on the driver; the JVM backends (whitespace, "
            "gpt2_regex, markers) work without it"
        )

#: The public GPT-2 pre-tokenizer pattern (also used by tiktoken's
#: ``gpt2`` encoding) in Java-regex syntax.
GPT2_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)


def _tokenize_whitespace(df: DataFrame, text_col: str, out_col: str) -> DataFrame:
    from data_lake_with_spark_spark.operators.text import tokens

    return df.withColumn(out_col, tokens(F.col(text_col)))


def _tokenize_gpt2_regex(df: DataFrame, text_col: str, out_col: str) -> DataFrame:
    return df.withColumn(
        out_col,
        F.regexp_extract_all(F.col(text_col), F.lit(GPT2_PRETOKEN_PATTERN), 0),
    )


def _tokenize_tiktoken(
    df: DataFrame, text_col: str, out_col: str, encoding: str = "gpt2"
) -> DataFrame:
    try:
        import tiktoken  # noqa: F401
    except ImportError as e:  # pragma: no cover - exercised via test msg
        raise ImportError(
            "tokenize(backend='tiktoken') needs the public 'tiktoken' "
            "package (pip install tiktoken); in environments without it "
            "use backend='whitespace' (oracled) or 'gpt2_regex' (the "
            "same encoding's pre-tokenizer, JVM-side)."
        ) from e
    _require_pandas("tiktoken")

    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def bpe_tokens(texts: pd.Series) -> pd.Series:
        # one encoder per worker process, reused across Arrow batches
        enc = tiktoken.get_encoding(encoding)
        return texts.map(
            lambda t: [
                enc.decode_single_token_bytes(i).decode("utf-8", "replace")
                for i in enc.encode_ordinary(t or "")
            ]
        )

    return df.withColumn(out_col, bpe_tokens(F.col(text_col)))


def _tokenize_bpe_mini(df: DataFrame, text_col: str, out_col: str) -> DataFrame:
    _require_pandas("bpe_mini")
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def bpe_tokens(texts: pd.Series) -> pd.Series:
        # one tokenizer per worker process, reused across Arrow
        # batches (module-level cache survives between batches of the
        # same worker — the exact lifecycle the tiktoken/fasttext
        # backends rely on)
        from data_lake_with_spark_spark.functions import bpe

        tok = getattr(bpe, "_VENDORED_CACHE", None)
        if tok is None:
            tok = bpe.load_vendored()
            bpe._VENDORED_CACHE = tok
        return texts.map(lambda t: tok.encode(t or ""))

    return df.withColumn(out_col, bpe_tokens(F.col(text_col)))


TOKENIZERS = {
    "whitespace": _tokenize_whitespace,
    "gpt2_regex": _tokenize_gpt2_regex,
    "tiktoken": _tokenize_tiktoken,
    "bpe_mini": _tokenize_bpe_mini,
}


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
    backend: str = "whitespace",
    **kwargs,
) -> DataFrame:
    """Append ``out_col array<string>`` with the chosen backend."""
    try:
        fn = TOKENIZERS[backend]
    except KeyError:
        raise ValueError(
            f"unknown tokenizer backend {backend!r}; use {sorted(TOKENIZERS)}"
        ) from None
    return fn(df, text_col, out_col, **kwargs)


def _langid_markers(df: DataFrame, text_col: str, out_col: str) -> DataFrame:
    from data_lake_with_spark_spark.operators.text import LANG_MARKERS, lang_scores

    scored = lang_scores(df, text_col)
    out = scored.withColumnRenamed("lang_pred", out_col)
    return out.drop(*[f"score_{lang}" for lang in LANG_MARKERS])


def _langid_fasttext(
    df: DataFrame, text_col: str, out_col: str, model_path: str | None = None
) -> DataFrame:
    try:
        import fasttext  # noqa: F401
    except ImportError as e:  # pragma: no cover - exercised via test msg
        raise ImportError(
            "language_id(backend='fasttext') needs the public 'fasttext' "
            "package and a lid model (e.g. lid.176.bin); in environments "
            "without it use backend='markers' (oracled)."
        ) from e
    if not model_path:
        raise ValueError("language_id(backend='fasttext') requires model_path=")
    _require_pandas("fasttext")

    import pandas as pd
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def predict(texts: pd.Series) -> pd.Series:
        model = fasttext.load_model(model_path)
        labels, _scores = model.predict(
            [(t or "").replace("\n", " ") for t in texts]
        )
        return pd.Series([ls[0].removeprefix("__label__") for ls in labels])

    return df.withColumn(out_col, predict(F.col(text_col)))


def _langid_char_ngram(df: DataFrame, text_col: str, out_col: str) -> DataFrame:
    _require_pandas("char_ngram")
    import pandas as pd
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def predict(texts: pd.Series) -> pd.Series:
        from data_lake_with_spark_spark.functions.langid_ngram import classify

        return texts.map(lambda t: classify(t or ""))

    return df.withColumn(out_col, predict(F.col(text_col)))


LANG_BACKENDS = {
    "markers": _langid_markers,
    "fasttext": _langid_fasttext,
    "char_ngram": _langid_char_ngram,
}


def language_id(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "lang_pred",
    backend: str = "markers",
    **kwargs,
) -> DataFrame:
    """Append ``out_col string`` (predicted language) with the chosen
    backend."""
    try:
        fn = LANG_BACKENDS[backend]
    except KeyError:
        raise ValueError(
            f"unknown language-ID backend {backend!r}; use {sorted(LANG_BACKENDS)}"
        ) from None
    return fn(df, text_col, out_col, **kwargs)
