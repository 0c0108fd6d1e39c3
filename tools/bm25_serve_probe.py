"""Serve-only scaling probe for the persisted BM25 index.

The r8 rung for q161 (α=0.71, SCALING_r08.md) is BUILD-dominated:
the registered entry pays the per-process index build once, so the
exponent mixes the one-time maintenance cost into the serving claim.
This probe separates them (the r8 verdict #4 ask): the index is
built OUTSIDE the timed region for each scale dir, then the timed
region is ``bm25_topk_indexed`` alone — the path a deployment runs
per query batch — at min-of-2 per dir.

The serving claim under test: the probe reads |query vocab| postings
buckets (tok_bucket partition pruning + tok-sorted row-group
skipping), never the corpus, so serve wall should scale with the
MATCHED postings volume, not the corpus size.

Usage:
    python tools/bm25_serve_probe.py [dir ...]

Defaults to /root/testdata/sf0.1 /tmp/dlws_sf3 /tmp/dlws_sf10
(1× / 30× / 100× of the driver SF). Prints per-dir build and serve
walls and per-step alphas; one JSON line at the end for
SCALING_r{N}.md.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_lake_with_spark_spark.operators import text  # noqa: E402
from data_lake_with_spark_spark.session import get_spark  # noqa: E402
from data_lake_with_spark_spark.sources.catalog import load_table  # noqa: E402


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/dlws_sf3",
        "/tmp/dlws_sf10",
    ]
    spark = get_spark(app_name="bm25-serve-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup action (JVM/codegen startup outside every timed region)
    load_table(spark, dirs[0], "documents").count()

    results = {}
    for d in dirs:
        docs = load_table(spark, d, "documents")
        qs = docs.where(F.col("doc_id") % 200 == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        )
        corpus = docs.where(F.col("doc_id") % 200 != 0)
        idx = tempfile.mkdtemp(prefix="dlws_bm25_probe_")
        try:
            t0 = time.time()
            text.build_bm25_index(corpus, idx)
            t_build = time.time() - t0
            serve, rows = float("inf"), 0
            for _rep in range(2):
                t0 = time.time()
                rows = text.bm25_topk_indexed(spark, idx, qs, k=5).count()
                serve = min(serve, time.time() - t0)
            results[d] = {
                "build_s": round(t_build, 2),
                "serve_s": round(serve, 2),
                "rows": rows,
            }
            print(
                f"{d:28s} build {t_build:7.2f}s  serve {serve:6.2f}s  "
                f"rows {rows}",
                flush=True,
            )
        finally:
            shutil.rmtree(idx, ignore_errors=True)

    keys = list(results)
    # per-step alphas: infer the ratio from the dir naming convention
    # (sf0.1=1x, dlws_sf3=30x, dlws_sf10=100x) when possible, else
    # report the raw ratio of serve walls only.
    def scale_of(d: str) -> float:
        if d.endswith("sf0.1"):
            return 1.0
        if d.endswith("sf3"):
            return 30.0
        if d.endswith("sf10"):
            return 100.0
        return float("nan")

    alphas = {}
    for i in range(1, len(keys)):
        a, b = keys[0], keys[i]
        r = scale_of(b) / scale_of(a)
        if r == r:  # not NaN
            alphas[b] = {
                "ratio": r,
                "alpha_build": round(
                    math.log(
                        max(results[b]["build_s"], 1e-9)
                        / max(results[a]["build_s"], 1e-9)
                    )
                    / math.log(r),
                    2,
                ),
                "alpha_serve": round(
                    math.log(
                        max(results[b]["serve_s"], 1e-9)
                        / max(results[a]["serve_s"], 1e-9)
                    )
                    / math.log(r),
                    2,
                ),
            }
            print(
                f"vs {a}: {b} ratio {r:.0f}x  "
                f"alpha_build={alphas[b]['alpha_build']}  "
                f"alpha_serve={alphas[b]['alpha_serve']}",
                flush=True,
            )
    print(json.dumps({"dirs": results, "alphas": alphas}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
