"""Build-vs-maintain decomposition for the bench's composition
entries (r12 verdict #6): q199 / q201 / q206 price a FULL state or
index BUILD in-entry (the q199/q171 precedent — the bench line is the
whole composition), so a round-over-round delta on those bench
positions cannot be attributed to the right leg without this split.

Measures, at the bench SF (default /root/testdata/sf0.1) on the bench
core count, each leg separately with min-of-2 walls:

- ``build_s``  — the in-entry from-scratch build (state or index)
- ``op_s``     — the maintenance op itself (merge / GDPR delete)
- ``serve_s``  — reading the serving table off the result

Emits one JSON line per entry (→ the MEASUREMENTS_r{N} split table).
Usage: python tools/bench_split.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _min2(fn, fresh_dir: bool = False):
    """Min-of-2 wall over idempotent fn; fn takes an out dir when
    fresh_dir (a maintenance op needs a fresh target per rep)."""
    best = None
    for _ in range(2):
        out = tempfile.mkdtemp(prefix="bsplit_") if fresh_dir else None
        t0 = time.time()
        fn(out) if fresh_dir else fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        if out is None:
            continue
        last_out = out
    return round(best, 2), (last_out if fresh_dir else None)


def main() -> int:
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark import queries as Q
    from data_lake_with_spark_spark.operators import graph, similarity
    from data_lake_with_spark_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench-split", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = Q._t(spark, sf, "lineitem").localCheckpoint()
    emb = Q._t(spark, sf, "embeddings").localCheckpoint()

    # --- q199: related-items build (7/8 history) + merge (1/8) -------
    is_batch = F.col("l_orderkey") % 8 == 0
    base199 = tempfile.mkdtemp(prefix="bsplit_q199_base_")

    def build199(out):
        shutil.rmtree(out, ignore_errors=True)
        graph.build_related_items_state(
            li.where(~is_batch), out, basket_col="l_orderkey",
            item_col="l_partkey", k=5, min_count=2, n_buckets=32,
        )

    b199, _ = _min2(lambda out: build199(out), fresh_dir=True)
    build199(base199)

    def merge199(out):
        shutil.rmtree(out, ignore_errors=True)
        graph.merge_related_items_state(
            spark, base199, li.where(is_batch), out,
            basket_col="l_orderkey", item_col="l_partkey",
        )

    o199, out199 = _min2(lambda out: merge199(out), fresh_dir=True)
    s199, _ = _min2(
        lambda: graph.related_items_topk(spark, out199).write.format(
            "noop"
        ).mode("overwrite").save()
    )
    print(json.dumps({"entry": "q199", "build_s": b199, "op_s": o199,
                      "serve_s": s199, "sf": sf}))

    # --- q206: related-items FULL build + GDPR delete -----------------
    base206 = tempfile.mkdtemp(prefix="bsplit_q206_base_")

    def build206(out):
        shutil.rmtree(out, ignore_errors=True)
        graph.build_related_items_state(
            li, out, basket_col="l_orderkey", item_col="l_partkey",
            k=5, min_count=2, n_buckets=32,
        )

    b206, _ = _min2(lambda out: build206(out), fresh_dir=True)
    build206(base206)
    doomed = (
        li.where(F.col("l_orderkey") % 10 == 3)
        .select(F.col("l_orderkey").alias("basket"))
        .distinct()
        .localCheckpoint()
    )

    def del206(out):
        shutil.rmtree(out, ignore_errors=True)
        graph.delete_from_related_items_state(spark, base206, doomed, out)

    o206, out206 = _min2(lambda out: del206(out), fresh_dir=True)
    s206, _ = _min2(
        lambda: graph.related_items_topk(spark, out206).write.format(
            "noop"
        ).mode("overwrite").save()
    )
    print(json.dumps({"entry": "q206", "build_s": b206, "op_s": o206,
                      "serve_s": s206, "sf": sf}))

    # --- q201: IVFPQ build (corpus minus delta) + doubly-frozen merge -
    md = max(1, emb.count() // 40)
    is_delta = (
        (F.col("vec_id") % md != 0)
        & (F.col("vec_id") % md != 1)
        & (F.col("vec_id") % 5 == 0)
    )
    base201 = tempfile.mkdtemp(prefix="bsplit_q201_base_")

    def build201(out):
        shutil.rmtree(out, ignore_errors=True)
        similarity.build_ivfpq_index(
            emb.where(~is_delta), out, dim=64, m=8,
            centroid_mod=md, n_buckets=8, vec_dim=64,
        )

    b201, _ = _min2(lambda out: build201(out), fresh_dir=True)
    build201(base201)

    def merge201(out):
        shutil.rmtree(out, ignore_errors=True)
        similarity.merge_ivfpq_index(
            spark, base201, emb.where(is_delta), out, vec_dim=64
        )

    o201, out201 = _min2(lambda out: merge201(out), fresh_dir=True)
    s201, _ = _min2(
        lambda: similarity.ivfpq_topk_indexed(
            spark, out201, emb.where(F.col("vec_id") < 10), k=5, nprobe=4
        ).write.format("noop").mode("overwrite").save()
    )
    print(json.dumps({"entry": "q201", "build_s": b201, "op_s": o201,
                      "serve_s": s201, "sf": sf}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
