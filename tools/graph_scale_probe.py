"""Purpose-built scaling probe for the GRAPH-SIDE work of the
triangle/clustering operators.

Why it exists: the standard 30×/100× fixtures replicate lineitem
with SHIFTED ORDER KEYS but UNSHIFTED PART KEYS, so the distinct
part–part co-purchase edge set SATURATES — identical at 1× and 30×
(measured: 1,196,000 edges both). q186/q187/q188/q189's fixture
exponents therefore measure the corpus-linear EXTRACTION (lineitem
self-join + distinct) plus CONSTANT graph work, and say nothing
about how the wedge machinery itself scales. The same class of
fixture blindness as BM25 max_df (the affine replicas could not
exercise pruning → tools/make_zipf_docs.py); this probe is the
graph-side equivalent.

It generates DETERMINISTIC synthetic graphs (xxhash64 targets — no
RNG, identical across runs) at two sizes with constant average
degree, plus a HUB-SKEWED variant at the large size (5% of edges
funneled into a hot set of n_nodes // 10000 nodes — 0.01% of nodes,
an EXTREME hub concentration), and times triangle_stats /
hub_clustering / label_propagation on each. Claims under test:

- census wall grows ~linearly in E at constant degree (wedges =
  Σ C(outdeg, 2) ∝ N·C(d, 2));
- the DEGREE-ORDERED ORIENTATION keeps the skewed graph's cost near
  the uniform graph's at equal |E| — a hub's edges orient INTO it,
  so hubs contribute no quadratic wedge term (the naive neighbor
  self-join would pay Σ C(deg_hub, 2) ≈ hundreds of millions of
  extra candidates on the skewed variant).

Usage: python tools/graph_scale_probe.py [small_E_nodes] [ratio]
"""

from __future__ import annotations

import json
import sys
import time


def synth_edges(spark, n_nodes: int, d: int, skew: bool):
    """Deterministic multigraph: d pseudo-random out-stubs per node
    (xxhash64(src, t) % N). skew=True redirects stubs where
    hash % 20 == 0 (5%) into the first N // 10000 nodes (hubs —
    0.01% of nodes, an extreme concentration).
    Self-loops/duplicates are dropped by the operators'
    canonicalization."""
    from pyspark.sql import functions as F

    base = spark.range(n_nodes).select(F.col("id").alias("src"))
    stubs = base.select(
        "src",
        F.explode(
            F.sequence(F.lit(1), F.lit(d))
        ).alias("t"),
    )
    h = F.abs(F.xxhash64(F.col("src"), F.col("t")))
    dst_uniform = h % F.lit(n_nodes)
    if skew:
        hot = max(1, n_nodes // 10000)
        dst = F.when(h % 20 == 0, h % F.lit(hot)).otherwise(dst_uniform)
    else:
        dst = dst_uniform
    return stubs.select("src", dst.cast("bigint").alias("dst"))


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    ratio = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    d = 8

    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators.graph import (
        hub_clustering,
        label_propagation,
        triangle_stats,
    )
    from data_lake_with_spark_spark.session import get_spark

    spark = get_spark(app_name="graph-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    configs = [
        ("uniform_1x", n_small, False),
        (f"uniform_{ratio}x", n_small * ratio, False),
        (f"skewed_{ratio}x", n_small * ratio, True),
    ]
    results = {}
    for tag, n, skew in configs:
        edges = synth_edges(spark, n, d, skew).localCheckpoint()
        seeds = (
            spark.range(0, n, 100)
            .select(
                F.col("id").alias("node"),
                (F.col("id") % 7).cast("string").alias("label"),
            )
        )
        row = {}
        t0 = time.time()
        stats = triangle_stats(edges).collect()[0].asDict()
        row["census_s"] = round(time.time() - t0, 2)
        row.update(
            {
                k: int(stats[k])
                for k in ("n_nodes", "n_edges", "n_wedges", "n_triangles")
            }
        )
        t0 = time.time()
        hub_clustering(edges, k=50).count()
        row["hub_audit_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        label_propagation(edges, seeds, iterations=2).count()
        row["lpa_s"] = round(time.time() - t0, 2)
        results[tag] = row
        print(tag, row, flush=True)

    import math

    for op in ("census_s", "hub_audit_s", "lpa_s"):
        a = results["uniform_1x"][op]
        b = results[f"uniform_{ratio}x"][op]
        alpha = math.log(max(b, 1e-9) / max(a, 1e-9)) / math.log(ratio)
        print(f"{op}: alpha={alpha:.2f} ({a}s -> {b}s)", flush=True)
    u = results[f"uniform_{ratio}x"]["census_s"]
    s = results[f"skewed_{ratio}x"]["census_s"]
    print(
        f"skew resilience: skewed/uniform census wall = {s / u:.2f}x "
        f"at equal |E| (orientation bound holds if ~1)",
        flush=True,
    )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
