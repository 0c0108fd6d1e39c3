"""Link-graph analytics (beyond-reference LLM-pipeline extension):
fixed-iteration PageRank for crawl seeding / source-authority
weighting. The reference has no graph surface; this module exists
because training-data curation ranks crawl frontiers and weights
sources by link authority, and the dedup module's connected
components already established the graph data model (edge frames).

Design for 100 TB: iterations are UNROLLED declaratively (a fixed
small iteration count is the curation norm — rank stabilizes in a
handful of rounds for seeding purposes), each one join + one
aggregate on the edge frame, which is materialized once; no driver
loop state beyond the plan itself. Float contract: per-node incoming
contributions SUM through the exact decimal route (float addition is
order-dependent; a shuffle-order-dependent PageRank would never
hash-verify) — the dsum discipline from the aggregate family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    validate: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge frame:
    ``r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u)/outdeg(u)``, starting
    uniform. Returns (node, rank) for EVERY node that has at least
    one incoming edge (with symmetric/bipartite edge frames — the
    curation use — that is every node).

    Exactness: each contribution ``r/outdeg`` is one IEEE division;
    contributions sum as DECIMAL(24,15) (exact, order-independent;
    scale 15 keeps the SUM's raw integer under 2^53 for any rank
    mass ≤ 1, so the decimal→double conversion is exactly rounded in
    BOTH engines — scale 18 put raw units past 2^53 and hit the
    1-ulp decimal→double divergence the q154/grouped-OLS lesson
    documents); the damped update is
    pinned-order scalar arithmetic. Every iteration is one
    (dst-keyed) aggregate over the edge⋈rank join; the edge and
    outdegree frames are pinned once and reused by all iterations.

    Dangling nodes (outdeg 0) cannot exist in the supported input
    shape (symmetric edges); ``validate=True`` checks and raises on
    violation. The check is an extra full-edge anti-join action per
    call, so it defaults OFF for pre-validated edge frames (e.g.
    explicitly symmetrized unions, where danglers are impossible by
    construction) — a dangling node under ``validate=False`` simply
    receives no contributions and its rank row is dropped, it does
    not corrupt other nodes' ranks.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    outdeg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    if validate:
        # symmetric-input contract: every node must have out-edges
        dangling = nodes.join(
            outdeg.withColumnRenamed("src", "node"), "node", "left_anti"
        )
        if dangling.limit(1).count() > 0:
            raise ValueError(
                "pagerank_fixed requires every node to have out-edges "
                "(symmetric/bipartite edge frames) — dangling nodes found"
            )
    n_nodes = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    # the per-iteration frames are rank-table-sized; pin each round so
    # the next one consumes a materialized table, not 2^t plan copies
    r = r.localCheckpoint()
    contribs = e.join(outdeg, "src")
    for _ in range(iterations):
        incoming = (
            contribs.join(r.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg"))
                .cast("decimal(24,15)")
                .alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        r = (
            incoming.crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.col("_s").cast("double")
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return r
