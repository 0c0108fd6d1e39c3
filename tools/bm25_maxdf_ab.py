"""A/B the BM25 ``max_df_ratio`` pruning knob on a shared-vocabulary
Zipf fixture (r7 verdict "what's wrong" #2: the knob was claimed as
"the 100 TB lever" with zero measurements).

Usage: python tools/bm25_maxdf_ab.py [docs_dir] [ratio] [reps]

For max_df_ratio in (1.0, ratio) over the SAME query set (doc_id %
200 == 0, capped < 5000 — the registered q145-family query shape),
reports:

- ``candidates``: posting-join candidate rows (the Σ_q Σ_{t∈q} df(t)
  cost BM25 is bound by) — measured as the size of the
  (query × matched-posting) expansion, i.e. the rows entering the
  per-(query, doc) score fold;
- ``hits``: output rows (sanity: pruning head terms should barely
  move top-k membership, since a term in >30% of docs carries idf<1);
- ``wall_s``: min-of-N wall for the full top-k query.

One session, alternating variant order per rep (measurement hygiene:
MEASUREMENTS_r06.md).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> int:
    docs_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dlws_zipf"
    ratio = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    sys.path.insert(0, ".")
    from data_lake_with_spark_spark.operators import text
    from data_lake_with_spark_spark.operators.text import tokens
    from data_lake_with_spark_spark.session import get_spark
    from data_lake_with_spark_spark.sources.catalog import load_table

    spark = get_spark(app_name="bm25-maxdf-ab")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, docs_dir, "documents")
    is_q = (F.col("doc_id") % 200 == 0) & (F.col("doc_id") < 5000)
    qs = d.where(is_q).select(F.col("doc_id").alias("query_id"), "text")
    corpus = d.where(~is_q)

    def candidates(max_df: float) -> int:
        # the (query × posting) expansion entering the score fold:
        # rebuild the operator's own frames up to that point
        ctf = (
            corpus.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
            .where(F.col("tok") != "")
            .groupBy("doc_id", "tok")
            .agg(F.count(F.lit(1)).alias("tf"))
            .localCheckpoint()
        )
        n_corpus = ctf.select("doc_id").distinct().count()
        qtok = (
            qs.select("query_id", F.explode(tokens(F.col("text"))).alias("tok"))
            .where(F.col("tok") != "")
            .distinct()
            .localCheckpoint()
        )
        mt = ctf.join(F.broadcast(qtok.select("tok").distinct()), "tok")
        dfsub = mt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        if max_df < 1.0:
            dfsub = dfsub.where(F.col("df") <= F.lit(max_df) * F.lit(n_corpus))
        return mt.join(F.broadcast(dfsub), "tok").join(
            F.broadcast(qtok), "tok"
        ).count()

    results: dict[float, dict] = {}
    for variant in (1.0, ratio):
        results[variant] = {
            "candidates": candidates(variant),
            "walls": [],
            "hits": None,
        }
    for rep in range(reps):
        order = (1.0, ratio) if rep % 2 == 0 else (ratio, 1.0)
        for variant in order:
            t0 = time.monotonic()
            hits = text.bm25_topk(
                corpus, qs, k=5, max_df_ratio=variant
            ).count()
            results[variant]["walls"].append(round(time.monotonic() - t0, 2))
            results[variant]["hits"] = hits
    for variant, r in results.items():
        print(
            f"max_df={variant}: candidates={r['candidates']:,} "
            f"hits={r['hits']} wall_s(min)={min(r['walls'])} reps={r['walls']}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
