"""Read-amplification measurement for manifest epoch chains: how does
serving wall grow as maintenance epochs accumulate, and what does
compaction buy back? Quantifies WHEN to run compact_ivf_index — the
vacuum-cadence number the manifest layout's docstrings promise.

Method: build a plain IVF index over a deterministic synthetic
corpus, apply K successive manifest merge epochs (each a small fresh
batch), and min-of-2 time the SAME serving query batch against chain
lengths 0 (plain), then after each epoch, then after compaction.
Owners-touched counts come from the manifest itself.

Usage: python tools/manifest_chain_probe.py [n_corpus] [n_epochs]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators.similarity import (
        build_ivf_index,
        compact_ivf_index,
        ivf_topk_indexed,
        merge_ivf_index,
    )
    from data_lake_with_spark_spark.session import get_spark
    from data_lake_with_spark_spark.sources import cow

    spark = get_spark(app_name="manifest-chain-probe")
    spark.sparkContext.setLogLevel("ERROR")
    dim = 32

    def synth(lo: int, hi: int):
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (
                    (F.abs(F.xxhash64(F.col("id"), i)) % 1000)
                    / F.lit(500.0)
                    - F.lit(1.0)
                ),
            ).alias("embedding"),
        )

    corpus = synth(0, n).localCheckpoint()
    queries = corpus.where(F.col("vec_id") % (n // 25) == 0)
    root = tempfile.mkdtemp(prefix="dlws_chainprobe_")
    results = []
    try:
        base = f"{root}/e0"
        build_ivf_index(
            corpus, base, target_centroids=max(100, n // 100), vec_dim=dim
        )

        def serve_wall(idx: str) -> float:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                ivf_topk_indexed(
                    spark, idx, queries, k=5, nprobe=4, vec_dim=dim
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            return round(best, 2)

        results.append({"chain": 0, "owners": 1, "serve_s": serve_wall(base)})
        cur = base
        for epoch in range(1, k + 1):
            batch = synth(n + epoch * 50, n + epoch * 50 + 50)
            nxt = f"{root}/e{epoch}"
            merge_ivf_index(
                spark, cur, batch, nxt, vec_dim=dim, layout="manifest"
            )
            cur = nxt
            m = cow.read_manifest(spark, cur, "lists")
            owners = len(set(m["entries"].values()))
            results.append(
                {
                    "chain": epoch,
                    "owners": owners,
                    "serve_s": serve_wall(cur),
                }
            )
            print(results[-1], flush=True)
        flat = f"{root}/flat"
        t0 = time.time()
        compact_ivf_index(spark, cur, flat)
        compact_s = round(time.time() - t0, 2)
        results.append(
            {
                "chain": "compacted",
                "owners": 1,
                "serve_s": serve_wall(flat),
                "compact_s": compact_s,
            }
        )
        print(results[-1], flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
