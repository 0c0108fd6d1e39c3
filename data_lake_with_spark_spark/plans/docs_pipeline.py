"""End-to-end training-data curation pipeline over ``documents`` —
the LLM-corpus twin of the star-schema flagship (plans/star_schema.py).

Composes the operator library into the standard pre-training data
flow:

1. **quality gate** — text.quality_score, keep docs above a floor;
2. **language rebalance** — sampling.temperature_rebalance at
   ``mix_alpha`` (0.0 default = full flatten to ~the smallest
   language, the balance_strata behavior; raise toward 1.0 to keep
   more of the head languages), scan-side filter, corpus never
   shuffles;
3. **fuzzy dedup** — dedup.minhash_dedup greedy survivor set (LSH
   candidates only, never all-pairs);
4. **chunking** — text.chunk_documents fixed token windows with
   overlap, shuffle-free explode inside the scan stage;
5. **packing** — text.pack_sequences capacity-target packs per
   language (one window shuffle).

Every stage is a pure ``DataFrame → DataFrame`` transform; the
composition is one lazy plan per output, so Catalyst prunes columns
across stage boundaries and the only materialization decisions are
the caller's (``run_pipeline`` caches the survivor set — the one
frame every downstream output shares).

Scale shape end to end: quality + rebalance are scan-side
projections/filters; dedup is the MinHash band shuffle; chunk is a
linear explode; pack is one window. Nothing holds a document anywhere
but inside its scan/shuffle block, so the pipeline's cost is the
dedup shuffle plus output size — the profile a 100 TB corpus needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.operators.dedup import minhash_dedup
from data_lake_with_spark_spark.operators.sampling import temperature_rebalance
from data_lake_with_spark_spark.operators.text import (
    chunk_documents,
    pack_sequences,
    quality_score,
)


def curate_documents(
    docs: DataFrame,
    quality_min: float = 0.35,
    chunk_tokens: int = 128,
    overlap: int = 16,
    pack_budget: int = 2048,
    mix_alpha: float = 0.0,
) -> dict[str, DataFrame]:
    """Build every stage of the curation flow lazily; returns the
    stage map (``kept`` → ``balanced`` → ``survivors`` → ``chunks`` →
    ``packed``). ``mix_alpha`` is the language-mix temperature
    (sampling.temperature_rebalance): 0.0 = full flatten (the
    default, byte-identical to balance_strata — pinned in
    tests/test_sampling.py), 1.0 = natural distribution."""
    base_cols = docs.columns
    kept = (
        quality_score(docs)
        .where(F.col("quality") >= quality_min)
        .select(*base_cols)
    )
    balanced = temperature_rebalance(
        kept, "lang", F.col("doc_id").cast("string"), alpha=mix_alpha
    )
    survivors = minhash_dedup(balanced)
    # lang rides through the chunk explode (carry_cols) so packing
    # never re-joins the chunk stream to the corpus — at 100 TB that
    # join would shuffle the LARGER (post-explode) side by doc id;
    # carrying the column costs one string per chunk row instead
    chunks = chunk_documents(
        survivors,
        chunk_tokens=chunk_tokens,
        overlap=overlap,
        carry_cols=["lang"],
    )
    chunks_lang = chunks.withColumn(
        # unique orderable chunk key (chunk_id is 1-based and bounded
        # by tokens/stride, far below 1e6)
        "chunk_uid",
        (F.col("doc_id") * F.lit(1_000_000) + F.col("chunk_id")).cast("bigint"),
    )
    packed = pack_sequences(
        chunks_lang,
        budget=pack_budget,
        partition_col="lang",
        id_col="chunk_uid",
        text_col="chunk_text",
    )
    return {
        "kept": kept,
        "balanced": balanced,
        "survivors": survivors,
        "chunks": chunks,
        "packed": packed,
    }


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    **kwargs,
) -> dict[str, DataFrame]:
    """Materialize the curation flow: caches the survivor set (shared
    by the chunk and pack sinks), writes survivors/chunks/packed as
    parquet, returns the stage map."""
    from data_lake_with_spark_spark.session import run_concurrent

    stages = curate_documents(docs, **kwargs)
    stages["survivors"].cache()
    try:
        # survivors first (populates the shared cache), then the two
        # downstream sinks — which read only cached survivor rows —
        # overlap (guide §2.6)
        stages["survivors"].write.mode("overwrite").parquet(
            os.path.join(out_dir, "survivors")
        )
        run_concurrent(
            [
                lambda: stages["chunks"]
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "chunks")),
                lambda: stages["packed"]
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "packed")),
            ]
        )
    finally:
        stages["survivors"].unpersist()
    return stages
