"""Scale + written-bytes probe for the round-11 operator classes:

1. PQ index lifecycle at a production-shaped layout (synthetic
   100k×64 corpus, 256 maintenance buckets): build once, merge a
   ~0.33% batch, delete a ~0.33% stripe, and serve — recording the
   written-bytes FRACTION per maintenance call (the MEASUREMENTS_r10
   §1 contract applied to the third index family) and the serve-time
   win of persisted codes vs the inline re-encode path. A second rung
   at 10k gives the decade slope.

2. Incremental related-items maintenance vs from-scratch rebuild on a
   synthetic basket fixture at two decades (30k / 300k baskets, fixed
   ~0.5% batch FRACTION): the serving-table claim is that merge wall
   tracks the batch's graph neighborhood, not history length, so the
   merge/rebuild ratio must WIDEN with scale.

Deterministic xxhash64 synthetics, no RNG (resume-safe, replayable).
Min-of-2 timing per measured call (measurement-hygiene lesson #4).
Usage: python tools/pq_ri_probe.py [--quick]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _min2(fn):
    """Min-of-2 wall: call fn twice (it must be idempotent), return
    (best_seconds, last_result)."""
    best, res = None, None
    for _ in range(2):
        t0 = time.time()
        res = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), res


def main() -> int:
    quick = "--quick" in sys.argv
    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators import graph, similarity
    from data_lake_with_spark_spark.session import get_spark
    from data_lake_with_spark_spark.sources import cow

    spark = get_spark(app_name="pq-ri-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    # ------------------------------------------------------------------
    # 1) PQ lifecycle, production shape
    # ------------------------------------------------------------------
    dim, m = 64, 8

    def mk_emb(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (
                    (F.abs(F.xxhash64(F.col("id"), i)) % 1000) / F.lit(500.0)
                    - F.lit(1.0)
                ),
            ).alias("embedding"),
        ).localCheckpoint()

    for n in ([10_000] if quick else [10_000, 100_000]):
        emb = mk_emb(n)
        base_idx = tempfile.mkdtemp(prefix="pqp_base_")
        merged_idx = tempfile.mkdtemp(prefix="pqp_merged_")
        del_idx = tempfile.mkdtemp(prefix="pqp_del_")
        try:
            t0 = time.time()
            similarity.build_pq_index(
                emb.where(F.col("vec_id") % 300 != 7),
                base_idx,
                dim=dim,
                m=m,
                target_codes=256,
                n_buckets=256,
            )
            build_s = round(time.time() - t0, 2)
            base_bytes = _dir_bytes(f"{base_idx}/codes")
            batch = emb.where(F.col("vec_id") % 300 == 7).localCheckpoint()

            def do_merge():
                shutil.rmtree(merged_idx, ignore_errors=True)
                return similarity.merge_pq_index(
                    spark, base_idx, batch, merged_idx
                )

            merge_s, st = _min2(do_merge)
            w = cow.written_bytes(f"{merged_idx}/codes")
            dead = emb.where(F.col("vec_id") % 300 == 11).select(
                "vec_id"
            ).localCheckpoint()

            def do_delete():
                shutil.rmtree(del_idx, ignore_errors=True)
                return similarity.delete_from_pq_index(
                    spark, base_idx, dead, del_idx
                )

            del_s, st_d = _min2(do_delete)
            w_d = cow.written_bytes(f"{del_idx}/codes")
            qs = emb.where(F.col("vec_id") < 8)

            def serve_indexed():
                return similarity.pq_topk_indexed(
                    spark, merged_idx, qs, k=5
                ).collect()

            def serve_inline():
                cb = similarity.pq_codebooks(
                    emb, dim=dim, m=m, target_codes=256
                )
                codes = similarity.pq_encode(emb, cb, dim=dim, m=m)
                return similarity.pq_topk(
                    codes, cb, qs, k=5, dim=dim, m=m
                ).collect()

            serve_idx_s, _ = _min2(serve_indexed)
            serve_inline_s, _ = _min2(serve_inline)
            out[f"pq_n{n}"] = {
                "n_corpus": n,
                "batch_rows": batch.count(),
                "build_s": build_s,
                "merge_s": merge_s,
                "merge_changed_partitions": len(st["changed_partitions"]),
                "merge_written_fraction": round(w / max(1, base_bytes), 4),
                "delete_s": del_s,
                "delete_changed_partitions": len(st_d["changed_partitions"]),
                "delete_written_fraction": round(
                    w_d / max(1, base_bytes), 4
                ),
                "serve_indexed_s": serve_idx_s,
                "serve_inline_s": serve_inline_s,
            }
            print(json.dumps({f"pq_n{n}": out[f"pq_n{n}"]}))
        finally:
            for p in (base_idx, merged_idx, del_idx):
                shutil.rmtree(p, ignore_errors=True)

    # ------------------------------------------------------------------
    # 2) related-items incremental vs rebuild, two decades
    # ------------------------------------------------------------------
    def mk_baskets(n_baskets, n_items, start=0):
        # ~4 items per basket; item popularity skewed by squaring the
        # hash fraction (popular head, long tail — the Zipf-ish shape
        # a catalog actually has)
        return (
            spark.range(start, start + n_baskets)
            .select(
                F.col("id").alias("basket"),
                F.explode(F.sequence(F.lit(1), F.lit(4))).alias("slot"),
            )
            .select(
                "basket",
                (
                    F.pow(
                        (F.abs(F.xxhash64("basket", "slot")) % 10_000)
                        / F.lit(10_000.0),
                        F.lit(2.0),
                    )
                    * F.lit(n_items)
                )
                .cast("bigint")
                .alias("item"),
            )
            .localCheckpoint()
        )

    for n_b in ([30_000] if quick else [30_000, 300_000]):
        n_items = max(2_000, n_b // 15)
        hist = mk_baskets(n_b, n_items)
        batch = mk_baskets(max(1, n_b // 200), n_items, start=10_000_000)
        base_p = tempfile.mkdtemp(prefix="rip_base_")
        out_p = tempfile.mkdtemp(prefix="rip_out_")
        try:
            t0 = time.time()
            graph.build_related_items_state(
                hist, base_p, k=10, min_count=2, n_buckets=256
            )
            build_s = round(time.time() - t0, 2)
            base_bytes = _dir_bytes(f"{base_p}/pairs") + _dir_bytes(
                f"{base_p}/topk"
            )

            def do_merge():
                shutil.rmtree(out_p, ignore_errors=True)
                return graph.merge_related_items_state(
                    spark, base_p, batch, out_p
                )

            merge_s, st = _min2(do_merge)
            w = cow.written_bytes(f"{out_p}/pairs") + cow.written_bytes(
                f"{out_p}/topk"
            )

            def do_rebuild():
                p = tempfile.mkdtemp(prefix="rip_scratch_")
                try:
                    graph.build_related_items_state(
                        hist.unionByName(batch),
                        p,
                        k=10,
                        min_count=2,
                        n_buckets=256,
                    )
                finally:
                    shutil.rmtree(p, ignore_errors=True)

            rebuild_s, _ = _min2(do_rebuild)
            out[f"ri_b{n_b}"] = {
                "n_hist_baskets": n_b,
                "n_batch_baskets": max(1, n_b // 200),
                "state_build_s": build_s,
                "merge_s": merge_s,
                "rebuild_s": rebuild_s,
                "merge_over_rebuild": round(merge_s / max(0.01, rebuild_s), 3),
                "affected_items": st["affected_items"],
                "changed_pair_partitions": len(st["changed_partitions"]),
                "changed_topk_partitions": len(
                    st["changed_topk_partitions"]
                ),
                "written_fraction": round(w / max(1, base_bytes), 4),
            }
            print(json.dumps({f"ri_b{n_b}": out[f"ri_b{n_b}"]}))
        finally:
            for p in (base_p, out_p):
                shutil.rmtree(p, ignore_errors=True)

    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
