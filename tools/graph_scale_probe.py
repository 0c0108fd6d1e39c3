"""Standing scaling probe for the GRAPH-SIDE work of every
graph-family operator (q175/q180/q186–q191).

Why it exists: the standard 30×/100× fixtures replicate lineitem
with SHIFTED ORDER KEYS but UNSHIFTED PART KEYS, so the distinct
part–part co-purchase edge set SATURATES — identical at 1× and 30×
(measured: 1,196,000 edges both). The part-graph queries'
(q186–q189, q191) fixture exponents therefore measure the
corpus-linear EXTRACTION (lineitem self-join + distinct) plus
CONSTANT graph work, and say nothing about how the wedge/iteration
machinery itself scales. The same class of fixture blindness as BM25
max_df (the affine replicas could not exercise pruning →
tools/make_zipf_docs.py); this probe is the graph-side equivalent,
folded into the standing per-round discipline from round 10 (the r9
verdict's ask): TWO DECADES (1× → ratio1× → ratio2×, default
1×/30×/100×) of constant-average-degree graphs plus a HUB-SKEWED
variant at the top size.

It generates DETERMINISTIC synthetic inputs (xxhash64 targets — no
RNG, identical across runs):

- directed multigraphs at constant average degree, skew=True
  funneling 5% of edges into a hot set of n_nodes // 10000 nodes
  (0.01% of nodes — an extreme hub concentration);
- Zipf-popular item BASKETS (cubed-uniform item draw) for the
  related-items serving table, including the min_count pair-space
  A/B the q188 floor claims.

Ops and claims under test:

- census (q186) / hub audit (q189): wall grows ~linearly in E at
  constant degree (wedges = Σ C(outdeg, 2) ∝ N·C(d, 2)); the
  DEGREE-ORDERED ORIENTATION keeps the skewed graph's cost near the
  uniform graph's at equal |E| (a hub's edges orient INTO it).
- label propagation (q187 unweighted / q191 weighted): per-round
  node-keyed join + count — linear in E; weighted votes add no
  asymptotics (the multigraph's multiplicity IS the weight).
- PageRank (q175 unweighted / q190 weighted): per-iteration edge⋈rank
  join + dst-keyed fold — linear in E; weighted contribution adds one
  multiply.
- related items (q188): pair candidates Σ C(|basket|, 2) — linear in
  baskets at bounded basket size regardless of item popularity; the
  min_count floor's pair-table reduction is reported per size.

Usage: python tools/graph_scale_probe.py [small_E_nodes] [r1] [r2]
"""

from __future__ import annotations

import json
import math
import sys
import time


def synth_edges(spark, n_nodes: int, d: int, skew: bool):
    """Deterministic multigraph: d pseudo-random out-stubs per node
    (xxhash64(src, t) % N). skew=True redirects stubs where
    hash % 20 == 0 (5%) into the first N // 10000 nodes (hubs —
    0.01% of nodes, an extreme concentration).
    Self-loops/duplicates are dropped (or weight-collapsed) by the
    consuming operators."""
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


def synth_baskets(spark, n_baskets: int, basket_size: int, n_items: int):
    """Deterministic Zipf-ish baskets: item popularity follows a
    cubed-uniform draw (item = ⌊n_items · u³⌋ with u = a 6-digit
    xxhash64 fraction), so low item ids are hot — the catalog's long
    tail co-occurs mostly once, which is exactly the pair space the
    min_count floor exists to cut."""
    from pyspark.sql import functions as F

    base = spark.range(n_baskets).select(F.col("id").alias("basket"))
    slots = base.select(
        "basket",
        F.explode(F.sequence(F.lit(1), F.lit(basket_size))).alias("t"),
    )
    u = (F.abs(F.xxhash64(F.col("basket"), F.col("t"))) % 1000000) / 1000000.0
    item = F.floor(F.lit(n_items) * u * u * u).cast("bigint")
    return slots.select("basket", item.alias("item"))


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    r1 = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    r2 = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    d = 8

    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators.graph import (
        hits_fixed,
        hub_clustering,
        label_propagation,
        pagerank_fixed,
        related_items,
        triangle_stats,
    )
    from data_lake_with_spark_spark.session import get_spark

    spark = get_spark(app_name="graph-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    configs = [
        ("uniform_1x", n_small, False),
        (f"uniform_{r1}x", n_small * r1, False),
        (f"uniform_{r2}x", n_small * r2, False),
        (f"skewed_{r2}x", n_small * r2, True),
    ]
    results = {}
    for tag, n, skew in configs:
        edges = synth_edges(spark, n, d, skew).localCheckpoint()
        # multiplicity-collapsed weighted frame: the multigraph's
        # parallel stubs ARE the weights the weighted variants consume
        wedges_frame = (
            edges.groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
            .localCheckpoint()
        )
        seeds = spark.range(0, n, 100).select(
            F.col("id").alias("node"),
            (F.col("id") % 7).cast("string").alias("label"),
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
        t0 = time.time()
        label_propagation(
            wedges_frame, seeds, iterations=2, weight_col="w"
        ).count()
        row["lpa_weighted_s"] = round(time.time() - t0, 2)
        # synthetic stubs guarantee outdeg ≥ 1 per node (d stubs each,
        # self-loops still count toward outdeg) — pre-validated
        t0 = time.time()
        pagerank_fixed(edges, iterations=3, validate=False).count()
        row["pagerank_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        pagerank_fixed(
            wedges_frame, iterations=3, validate=False, weight_col="w"
        ).count()
        row["pagerank_weighted_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        hits_fixed(edges, iterations=2).count()
        row["hits_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        hits_fixed(wedges_frame, iterations=2, weight_col="w").count()
        row["hits_weighted_s"] = round(time.time() - t0, 2)
        results[tag] = row
        print(tag, row, flush=True)

    # related items: baskets scale independently of the edge graphs
    for tag, nb in (
        ("baskets_1x", n_small),
        (f"baskets_{r1}x", n_small * r1),
        (f"baskets_{r2}x", n_small * r2),
    ):
        baskets = synth_baskets(spark, nb, 8, max(100, nb // 10))
        baskets = baskets.localCheckpoint()
        row = {}
        t0 = time.time()
        related_items(baskets, k=5).count()
        row["related_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        related_items(baskets, k=5, min_count=2).count()
        row["related_floor2_s"] = round(time.time() - t0, 2)
        # pair-space A/B: the floor's reduction of the symmetrize/
        # join/window input (distinct (a,b) support classes)
        b = baskets.distinct()
        x, y = b.alias("x"), b.alias("y")
        pairs = (
            x.join(
                y,
                (F.col("x.basket") == F.col("y.basket"))
                & (F.col("x.item") < F.col("y.item")),
            )
            .groupBy(F.col("x.item"), F.col("y.item"))
            .agg(F.count(F.lit(1)).alias("n_ab"))
            .localCheckpoint()
        )
        row["pairs_all"] = pairs.count()
        row["pairs_floor2"] = pairs.where(F.col("n_ab") >= 2).count()
        results[tag] = row
        print(tag, row, flush=True)

    ops = (
        "census_s",
        "hub_audit_s",
        "lpa_s",
        "lpa_weighted_s",
        "pagerank_s",
        "pagerank_weighted_s",
        "hits_s",
        "hits_weighted_s",
    )
    for hi, ratio in ((f"uniform_{r1}x", r1), (f"uniform_{r2}x", r2)):
        for op in ops:
            a = results["uniform_1x"][op]
            b = results[hi][op]
            alpha = math.log(max(b, 1e-9) / max(a, 1e-9)) / math.log(ratio)
            print(f"{op} @{ratio}x: alpha={alpha:.2f} ({a}s -> {b}s)", flush=True)
    u = results[f"uniform_{r2}x"]["census_s"]
    s = results[f"skewed_{r2}x"]["census_s"]
    print(
        f"skew resilience: skewed/uniform census wall = {s / u:.2f}x "
        f"at equal |E| (orientation bound holds if ~1)",
        flush=True,
    )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
