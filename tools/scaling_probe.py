"""Scaling probe: wall-clock the most expensive registry queries at
two scale factors and report the per-query scaling exponent.

Usage: python tools/scaling_probe.py [small_dir] [big_dir] [ratio]

Defaults: /root/testdata/sf0.1 vs /tmp/dlws_sf1 (ratio 10; build the
big dir first with tools/make_scaled_sf.py). For each probed query,
prints t_small, t_big and alpha = log(t_big/t_small)/log(ratio) —
alpha ≈ 1 is linear scaling, alpha ≈ 2 quadratic, alpha < 1
fixed-overhead-dominated. One JSON line at the end for the round
notes (SCALING_r{N}.md).

CAVEAT (the q126 lesson, MEASUREMENTS_r08.md): the probe times
``.count()``, and Catalyst column-prunes aggregate expressions the
count never references — for operators whose output is an expensive
REBUILT column (q126's clean_text: 0.82s counted vs 3.65s delivered
at sf0.1) the probe measures the distributed plan, NOT the delivered
output. Exponents stay comparable probe-to-probe; absolute walls are
not bench walls.
"""

from __future__ import annotations

import json
import math
import sys
import time

PROBES = [
    "q01_pricing_summary",  # lineitem scan + agg (linear baseline)
    "q04_join_composite",  # orders⋈lineitem shuffle join
    "q13_ann_ivf",  # IVF ANN (corpus scan linear, top-k bounded)
    "q18_minhash_dedup",  # MinHash end-to-end
    "q21_exact_dedup",  # hash groupBy dedup
    "q24_jaccard_verify",  # candidate verify join
    "q26_embedding_topk",  # brute-force ANN (linear in corpus)
    "q33_dedup_clusters",  # CC driver union-find regime
    "q92_token_jaccard_ppjoin",  # PPJoin similarity join
    "q100_dedup_clusters_two_phase",  # CC distributed regime
    "q105_quantized_topk",  # int8 ANN serving
    # round 6 additions
    "q113_ann_ivf_budgeted",  # fixed-centroid-budget IVF (the production config)
    "q115_ngram_rarity",  # perplexity-proxy quality filter
    "q116_semantic_dedup",  # SemDeDup within-cluster pruning
    "q118_pq_topk",  # PQ ADC serving
]


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dlws_sf1"
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    probes = list(sys.argv[4:]) or PROBES

    sys.path.insert(0, ".")
    from data_lake_with_spark_spark import queries as Q
    from data_lake_with_spark_spark.session import get_spark

    spark = get_spark(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        # min-of-2 per (query, dir): BOTH dirs get warm-cache timings,
        # so alpha compares like with like (timing only the small side
        # warm overstated the baseline's exponent — review finding)
        best, n = float("inf"), 0
        for _rep in range(2):
            t0 = time.time()
            n = registry[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return best, n

    # one warmup action (non-probed query) absorbs JVM startup
    registry["q55_count_lineitem"](spark, small).count()

    unknown = [n for n in probes if n not in registry]
    if unknown:
        print(f'unknown probe names: {unknown}', file=sys.stderr)
        return 2

    results = {}
    for name in probes:
        t_s, n_s = run(name, small)
        t_b, n_b = run(name, big)
        alpha = math.log(max(t_b, 1e-9) / max(t_s, 1e-9)) / math.log(ratio)
        results[name] = {
            "t_small": round(t_s, 2),
            "t_big": round(t_b, 2),
            "rows_small": n_s,
            "rows_big": n_b,
            "alpha": round(alpha, 2),
        }
        print(
            f"{name:34s} {t_s:7.2f}s -> {t_b:8.2f}s  "
            f"alpha={alpha:5.2f}  rows {n_s} -> {n_b}",
            flush=True,
        )
    print(json.dumps({"ratio": ratio, "probes": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
