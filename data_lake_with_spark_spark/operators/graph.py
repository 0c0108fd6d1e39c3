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
contributions SUM as exact integers — PageRank through the tie-free
floor-grid fold (FLOOR(x·10^15) bigint units), HITS natively (its
rational formulation is integer-valued) — because float addition is
order-dependent and a shuffle-order-dependent rank would never
hash-verify; the dsum discipline from the aggregate family, hardened
after the double→decimal cast's half-up tie diverged cross-engine.
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

    Exactness — the FLOOR-GRID fold: each contribution
    ``r/outdeg`` is one IEEE division, then ``FLOOR(x · 10^15)``
    snaps it to an exact bigint grid unit; units SUM as bigints
    (exact, order-independent) and convert back with ONE division by
    10^15. FLOOR has no rounding ties, which is the point: the
    previous route cast the double to DECIMAL(24,15), and a
    double→decimal cast ROUNDS half-up on the decimal expansion in
    Spark but on the binary value in DuckDB — a contribution landing
    exactly on a half-grid point diverges by one grid unit
    (observed live: two seeded-PageRank nodes off by exactly
    0.85·10⁻¹⁵ at sf0.01 — the q85 round() class, resurfacing in a
    cast). The grid truncates ≤10⁻¹⁵ mass per contribution —
    deterministically, identically, in any IEEE engine. The scaled
    sum stays under 2^53 for rank mass ≤ 1 (the q154 magnitude
    rule), so the bigint→double conversion is exact. The damped
    update is pinned-order scalar arithmetic. Every iteration is one
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
                F.floor(
                    (F.col("rank") / F.col("outdeg")) * F.lit(1e15)
                ).alias("_c"),
            )
            .groupBy("node")
            .agg((F.sum("_c") / F.lit(1e15)).alias("_s"))
        )
        r = (
            incoming.crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.col("_s")
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return r


def pagerank_personalized(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Personalized (seeded-teleport) PageRank — the crawl-frontier /
    source-authority variant a curation pipeline actually runs:
    instead of teleporting uniformly, the random surfer restarts at a
    TRUSTED SEED SET, so rank measures authority *relative to the
    seeds* (TrustRank / topic-sensitive PageRank; Haveliwala 2002):
    ``r_{t+1}(v) = (1-d)·s(v) + d · Σ_{u→v} r_t(u)/outdeg(u)`` with
    ``s(v) = 1/|S|`` for seed nodes and 0 elsewhere, starting
    ``r_0 = s``.

    Same execution shape and float contract as
    :func:`pagerank_fixed`: edges and outdegrees pinned once,
    per-iteration dst-keyed FLOOR-GRID contribution sums
    (``FLOOR(x·10^15)`` bigint units — exact, order-independent, and
    tie-free where a double→decimal cast can round apart across
    engines, the divergence THIS operator exposed live at sf0.01;
    the scaled sum stays under 2^53 because personalized rank mass
    stays ≤ 1, Σs = 1), pinned-order scalar damped update, per-round
    localCheckpoint. The teleport term is a broadcast left join of
    the (small) seed frame; non-seed nodes with no inbound rank mass
    simply carry rank d·0 + 0 and drop out of the frame — identical
    to their limit value of 0 for ranking purposes.

    Returns (node, rank) for nodes with inbound contributions or
    seed membership.
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
    s = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = s.agg(F.count(F.lit(1)).cast("bigint").alias("ns"))
    s = s.crossJoin(F.broadcast(n_seeds)).select(
        "node", (F.lit(1.0) / F.col("ns")).alias("s")
    ).localCheckpoint()
    r = s.select("node", F.col("s").alias("rank"))
    contribs = e.join(outdeg, "src")
    for _ in range(iterations):
        incoming = (
            contribs.join(r.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(
                    (F.col("rank") / F.col("outdeg")) * F.lit(1e15)
                ).alias("_c"),
            )
            .groupBy("node")
            .agg((F.sum("_c") / F.lit(1e15)).alias("_s"))
        )
        r = (
            incoming.join(F.broadcast(s), "node", "full_outer")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.coalesce(F.col("s"), F.lit(0.0))
                    + F.lit(damping)
                    * F.coalesce(F.col("_s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return r


def hits_fixed(
    edges: DataFrame,
    iterations: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg's hubs-and-authorities) over a
    directed edge frame — the second classic source-authority signal
    next to PageRank, and the one that separates *pointers-to-good-
    content* (hubs: link lists, directories, sitemaps) from
    *good-content* (authorities) — a distinction crawl curation uses
    to rank frontier pages differently from content pages. Per
    iteration: ``a(v) = Σ_{u→v} h(u)`` then ``h(u) = Σ_{u→v} a(v)``,
    starting ``h_0 = 1``.

    RATIONAL-ARITHMETIC FORMULATION (stronger than the PageRank
    decimal route): with the integer start and no per-round
    normalization, every HITS score on an unweighted graph is an
    INTEGER — each iteration is a bigint-sum aggregate, so scores
    are exact and order-independent in ANY engine with no
    double→decimal cast anywhere (the cast of a binary double to a
    decimal is the one step that can round differently across
    engines — the q85/q154 lesson family; integers never take it).
    Scores accumulate through DECIMAL(38,0) so a deep-degree graph
    cannot silently overflow a bigint (magnitude after t iterations
    is ≤ E·maxdeg^(2t-1); DECIMAL(38,0) holds 10^38). HITS rankings
    are scale-invariant, so the unnormalized integers rank
    identically to Kleinberg's normalized scores; callers needing
    the normalized view divide by the L1 total once at the end.
    Iterations are unrolled with per-step localCheckpoint; edges
    pinned once (the pagerank_fixed execution shape).

    Returns (node, authority, hub) as exact integers (DECIMAL(38,0))
    from the final iteration — full outer over both score frames;
    nodes with no in-edges carry authority 0, no out-edges hub 0.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    h = nodes.select(
        "node", F.lit(1).cast("decimal(38,0)").alias("score")
    ).localCheckpoint()
    a = None
    for _ in range(iterations):
        a = (
            e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("score").cast("decimal(38,0)").alias("score"))
            .localCheckpoint()
        )
        h = (
            e.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("score").cast("decimal(38,0)").alias("score"))
            .localCheckpoint()
        )
    zero = F.lit(0).cast("decimal(38,0)")
    return (
        a.withColumnRenamed("score", "authority")
        .join(
            h.withColumnRenamed("score", "hub"), "node", "full_outer"
        )
        .select(
            "node",
            F.coalesce("authority", zero).alias("authority"),
            F.coalesce("hub", zero).alias("hub"),
        )
    )
