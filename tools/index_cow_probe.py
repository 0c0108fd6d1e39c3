"""Bytes-written measurement for the copy-on-write index maintenance
(round-10 verdict #1's "Done" criterion): at sf0.1, maintain both
index families with small batches under PRODUCTION-SHAPED layouts and
report what fraction of the index's bytes each maintenance call
actually materialized (written = files with st_nlink == 1; linked
bytes cost nothing).

Configs deliberately mirror deployment, not the oracle fixtures:
- IVF: target_centroids scaled so lists ≫ batch spread (at 100 TB an
  IVF coarse quantizer has 10^5–10^6 centroids; a daily batch touches
  the lists it assigns to). Batch = a ~0.3% id stripe.
- BM25: n_buckets=256 (pruning granularity grows with the corpus) on
  the Zipf doc fixture; the GDPR case deletes a 5-doc batch (changed
  buckets = the docs' vocabulary footprint), the merge case upserts a
  5-doc batch.

The HONEST caveat printed with the numbers: a natural-language MERGE
batch has broad vocabulary coverage, so merge-touched buckets ≈
min(|batch vocab|, n_buckets) — CoW pays off for merges exactly when
batches are small/targeted or bucket counts production-sized, and
degenerates gracefully to the full rewrite when every bucket changes
(q171's 20% delta). Deletes are the sweet spot: a GDPR batch's
footprint is a handful of documents' vocabulary.

Usage: python tools/index_cow_probe.py [sf_dir]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators import similarity, text
    from data_lake_with_spark_spark.session import get_spark
    from data_lake_with_spark_spark.sources import cow

    spark = get_spark(app_name="cow-io-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    # ---- IVF: 0.3% merge batch + 0.3% GDPR delete -----------------
    # synthetic 100k×64 corpus (the sf fixtures cap embeddings at 2k
    # rows — too thin to exercise a production-shaped 10^3-centroid
    # layout); deterministic xxhash64 fractions, no RNG
    dim = 64
    emb = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                (F.abs(F.xxhash64(F.col("id"), i)) % 1000) / F.lit(500.0)
                - F.lit(1.0)
            ),
        ).alias("embedding"),
    ).localCheckpoint()
    n = emb.count()
    base_idx = tempfile.mkdtemp(prefix="cowp_ivf_base_")
    merged_idx = tempfile.mkdtemp(prefix="cowp_ivf_merged_")
    del_idx = tempfile.mkdtemp(prefix="cowp_ivf_del_")
    try:
        t0 = time.time()
        similarity.build_ivf_index(
            emb.where(F.col("vec_id") % 300 != 7),
            base_idx,
            target_centroids=max(200, n // 40),
            vec_dim=64,
        )
        build_s = round(time.time() - t0, 2)
        base_bytes = _dir_bytes(f"{base_idx}/lists")
        batch = emb.where(F.col("vec_id") % 300 == 7)
        t0 = time.time()
        st = similarity.merge_ivf_index(
            spark, base_idx, batch, merged_idx, vec_dim=64
        )
        merge_s = round(time.time() - t0, 2)
        w = cow.written_bytes(f"{merged_idx}/lists")
        out["ivf_merge"] = {
            "n_corpus": n,
            "batch_rows": batch.count(),
            "n_partitions_changed": len(st["changed_partitions"]),
            "n_partitions_linked": st["promoted_dirs"],
            "written_bytes": w,
            "linked_bytes": st["linked_bytes"],
            "written_fraction": round(w / max(1, base_bytes), 4),
            "build_s": build_s,
            "merge_s": merge_s,
        }
        dead = emb.where(F.col("vec_id") % 300 == 11).select("vec_id")
        t0 = time.time()
        st = similarity.delete_from_ivf_index(spark, base_idx, dead, del_idx)
        del_s = round(time.time() - t0, 2)
        w = cow.written_bytes(f"{del_idx}/lists")
        out["ivf_delete"] = {
            "deleted_rows": dead.count(),
            "n_partitions_changed": len(st["changed_partitions"]),
            "n_partitions_linked": st["promoted_dirs"],
            "written_bytes": w,
            "linked_bytes": st["linked_bytes"],
            "written_fraction": round(w / max(1, base_bytes), 4),
            "delete_s": del_s,
        }
    finally:
        for p in (base_idx, merged_idx, del_idx):
            shutil.rmtree(p, ignore_errors=True)

    # ---- BM25 on the Zipf fixture: 5-doc GDPR delete + 5-doc merge
    zipf = "/tmp/dlws_zipf"
    docs_path = (
        f"{zipf}/documents.parquet"
        if os.path.exists(f"{zipf}/documents.parquet")
        else f"{sf_dir}/documents.parquet"
    )
    docs = spark.read.parquet(docs_path)
    base_idx = tempfile.mkdtemp(prefix="cowp_bm_base_")
    merged_idx = tempfile.mkdtemp(prefix="cowp_bm_merged_")
    del_idx = tempfile.mkdtemp(prefix="cowp_bm_del_")
    try:
        nd = docs.count()
        t0 = time.time()
        text.build_bm25_index(
            docs.where(F.col("doc_id") % 5000 != 3), base_idx, n_buckets=256
        )
        build_s = round(time.time() - t0, 2)
        base_bytes = _dir_bytes(f"{base_idx}/postings")
        batch = docs.where(F.col("doc_id") % 5000 == 3).limit(5)
        t0 = time.time()
        st = text.merge_bm25_index(spark, base_idx, batch, merged_idx)
        merge_s = round(time.time() - t0, 2)
        w = cow.written_bytes(f"{merged_idx}/postings")
        out["bm25_merge_5docs"] = {
            "n_corpus": nd,
            "n_buckets_changed": len(st["changed_partitions"]),
            "n_buckets_linked": st["promoted_dirs"],
            "written_bytes": w,
            "linked_bytes": st["linked_bytes"],
            "written_fraction": round(w / max(1, base_bytes), 4),
            "build_s": build_s,
            "merge_s": merge_s,
        }
        dead = (
            docs.where(F.col("doc_id") % 5000 != 3)
            .select("doc_id")
            .orderBy("doc_id")
            .limit(5)
        )
        t0 = time.time()
        st = text.delete_from_bm25_index(spark, base_idx, dead, del_idx)
        del_s = round(time.time() - t0, 2)
        w = cow.written_bytes(f"{del_idx}/postings")
        out["bm25_delete_5docs"] = {
            "n_buckets_changed": len(st["changed_partitions"]),
            "n_buckets_linked": st["promoted_dirs"],
            "written_bytes": w,
            "linked_bytes": st["linked_bytes"],
            "written_fraction": round(w / max(1, base_bytes), 4),
            "delete_s": del_s,
        }
        # the realistic single-request GDPR case: ONE short document
        one_idx = tempfile.mkdtemp(prefix="cowp_bm_one_")
        try:
            shortest = (
                docs.where(F.col("doc_id") % 5000 != 3)
                .select("doc_id", F.length("text").alias("_l"))
                .orderBy("_l", "doc_id")
                .limit(1)
                .select("doc_id")
            )
            t0 = time.time()
            st = text.delete_from_bm25_index(
                spark, base_idx, shortest, one_idx
            )
            del1_s = round(time.time() - t0, 2)
            w = cow.written_bytes(f"{one_idx}/postings")
            out["bm25_delete_1doc"] = {
                "n_buckets_changed": len(st["changed_partitions"]),
                "n_buckets_linked": st["promoted_dirs"],
                "written_bytes": w,
                "linked_bytes": st["linked_bytes"],
                "written_fraction": round(w / max(1, base_bytes), 4),
                "delete_s": del1_s,
            }
        finally:
            shutil.rmtree(one_idx, ignore_errors=True)
    finally:
        for p in (base_idx, merged_idx, del_idx):
            shutil.rmtree(p, ignore_errors=True)

    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
