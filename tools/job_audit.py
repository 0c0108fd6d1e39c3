"""Spark JOB-COUNT audit (r15 verdict #1: the heavy maintenance ops
run as fast on 8 cores as on 32 — their wall is fixed per-job driver
cost × job count, not data parallelism; and ~120s of the bench is
sub-3s entries paying fixed per-entry costs).

Counts the DAGScheduler job ids consumed by each benched entry (the
id counter is monotonic, so ``nextJobId`` before/after an entry is an
exact job count regardless of UI retention), together with the wall.
An entry whose wall is dominated by N small jobs improves by FOLDING
scalar actions and checkpoints, not by per-stage surgery — this tool
says which entries those are and verifies the fold afterwards.

Usage:
    python tools/job_audit.py [sf_dir] [entry ...]   # default: top ops
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _next_job_id(spark) -> int:
    # DAGScheduler.nextJobId is an AtomicInteger that only this
    # counter increments; reading it costs nothing and needs no
    # listener registration (the UI/status stores are trimmed or
    # disabled in bench sessions).
    nid = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return int(nid if isinstance(nid, int) else nid.get())


def main() -> int:
    from data_lake_with_spark_spark import queries as Q
    from data_lake_with_spark_spark.session import (
        clear_persistent_rdds,
        get_spark,
    )

    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = [a for a in args if not os.path.isdir(a)]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="job-audit",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    reg = Q.queries()
    if not names:
        names = [
            "q206_related_items_gdpr_delete",
            "q199_related_items_incremental",
            "q201_ivfpq_merge",
            "q198_index_lifecycle",
            "q194_hits_weighted",
            "q181_hits_copurchase",
            "q202_ivfpq_delete",
            "q196_pq_merge",
            "q163_bm25_pruned",
            "q186_triangle_census",
            "q180_pagerank_seeded",
            "q175_pagerank",
            "q187_label_propagation",
            "q151_rank_overlap",
            "q140_bm25_retrieval",
            "q131_bloom_decontaminate",
            "q92_token_jaccard_ppjoin",
        ]

    # warmup (the bench's): JVM/codegen + the Python worker pool
    from data_lake_with_spark_spark.sources.catalog import load_table

    load_table(spark, sf, "lineitem").groupBy("l_returnflag").count().write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(4).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in names:
        fn = reg[name]
        best_wall, best_jobs = None, None
        for _rep in range(2):
            j0 = _next_job_id(spark)
            t0 = time.time()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            jobs = _next_job_id(spark) - j0
            if best_wall is None or wall < best_wall:
                best_wall, best_jobs = wall, jobs
            clear_persistent_rdds(spark)
        out[name] = {"wall_s": round(best_wall, 2), "jobs": best_jobs}
        print(
            f"{name:42s} {best_wall:7.2f}s  {best_jobs:4d} jobs "
            f"({1000 * best_wall / max(1, best_jobs):6.0f} ms/job)",
            flush=True,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
