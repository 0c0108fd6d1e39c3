"""A/B the BM25 scoring-tail REORDER on a shared-vocabulary fixture
(r14 OPTIMIZATION "tried and reverted"; r15 verdict item #6 asks for
the re-try at per-term query fan-out > 1).

The reorder: compute the QUERY-INDEPENDENT per-(doc, term)
contribution c(t, d) = saturation(tf, dl) · idf(df) ONCE per matched
posting row — i.e. join dl/df/stats onto mt BEFORE expanding by the
per-term query list — instead of once per (query, term, doc) row.
Scores are bit-identical (same values, same sorted-term fold order);
only the cost moves: the dl join and the saturation arithmetic run
|mt| times instead of Σ_t fanout(t)·|postings(t)| times, at the price
of one extra join boundary. Worth it exactly when the mean per-term
query fan-out is >1; the bench fixture's is ≈1 (r14 measured the
reorder equal-or-slower there), a real web corpus's shared Zipf head
is much higher.

Usage: python tools/bm25_reorder_ab.py [docs_dir] [reps] [max_df]
(docs_dir from tools/make_zipf_docs.py for the shared-vocab shape.)
Prints per-variant min-of-N walls, the measured mean fan-out, and a
full result-parity check.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> int:
    docs_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dlws_zipf"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    max_df = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0

    sys.path.insert(0, ".")
    from pyspark.sql import Window

    from data_lake_with_spark_spark.operators import text
    from data_lake_with_spark_spark.operators.text import tokens
    from data_lake_with_spark_spark.session import get_spark
    from data_lake_with_spark_spark.sources.catalog import load_table

    spark = get_spark(app_name="bm25-reorder-ab")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, docs_dir, "documents")
    qs = d.where((F.col("doc_id") % 200 == 0) & (F.col("doc_id") < 5000)).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    corpus = d.where(F.col("doc_id") % 200 != 0)
    k, k1, b = 5, 1.2, 0.75

    ctf = (
        corpus.select(
            F.col("doc_id"), F.explode(tokens(F.col("text"))).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .localCheckpoint()
    )
    dl = ctf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_corpus"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    qtok = (
        qs.select(
            F.col("query_id"), F.explode(tokens(F.col("text"))).alias("tok")
        )
        .where(F.col("tok") != "")
        .distinct()
        .localCheckpoint()
    )
    qvocab = qtok.select("tok").distinct()
    mt = ctf.join(F.broadcast(qvocab), "tok").localCheckpoint()
    dfsub = mt.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    if max_df < 1.0:
        dfsub = dfsub.crossJoin(F.broadcast(stats.select("n_corpus"))).where(
            F.col("df") <= F.lit(max_df) * F.col("n_corpus")
        ).select("tok", "df")

    # measured mean per-term query fan-out over the SURVIVING vocab
    fan = (
        qtok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
        .join(dfsub, "tok", "left_semi")
        .agg(F.avg("f").alias("mean_fanout"), F.count(F.lit(1)).alias("terms"))
        .collect()[0]
    )
    print(f"surviving terms={fan['terms']} mean query fan-out="
          f"{fan['mean_fanout']:.2f}", flush=True)

    idf = (F.col("n_corpus") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    norm = F.lit(k1) * (
        (F.lit(1.0) - F.lit(b)) + F.lit(b) * (F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        (F.col("tf") * (F.lit(k1) + F.lit(1.0))) / (F.col("tf") + norm)
    ) * idf

    def fold(scored):
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        return (
            scored.groupBy("query_id", "doc_id")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("tok", "_c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["_c"],
                ).alias("score")
            )
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .where(F.col("rank") <= k)
        )

    def shipped():
        # the shipped order: expand by qtok FIRST, then contrib math
        # per (query, term, doc) row (text._bm25_rank verbatim)
        return fold(
            mt.join(F.broadcast(dfsub), "tok")
            .join(F.broadcast(qtok), "tok")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select("query_id", "doc_id", F.col("tok"), contrib.alias("_c"))
        )

    def reordered():
        # contrib per (doc, term) FIRST, then the qtok expansion
        cdt = (
            mt.join(F.broadcast(dfsub), "tok")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select("doc_id", "tok", contrib.alias("_c"))
        )
        return fold(
            cdt.join(F.broadcast(qtok), "tok").select(
                "query_id", "doc_id", "tok", "_c"
            )
        )

    shipped().write.format("noop").mode("overwrite").save()  # warm
    walls = {"shipped": [], "reordered": []}
    for _ in range(reps):
        for name, fn in (("shipped", shipped), ("reordered", reordered)):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            walls[name].append(time.time() - t0)
            print(f"{name}: {walls[name][-1]:.2f}s", flush=True)
    print({n: round(min(w), 2) for n, w in walls.items()})
    a, bb = shipped(), reordered()
    print("parity diff:", a.exceptAll(bb).count(), bb.exceptAll(a).count())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
