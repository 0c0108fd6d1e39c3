"""Deduplication operators over the ``documents`` table.

The training-data-pipeline dedup family, each designed as a shuffle-
conscious DataFrame composition:

- :func:`exact_dedup` — normalize → md5 fingerprint → keep min id per
  fingerprint. One shuffle on the fingerprint; the groupBy is the
  classic hash-dedup that scales linearly.
- :func:`minhash_signatures` / :func:`minhash_candidate_pairs` /
  :func:`minhash_dedup` — MinHash+LSH: shingle → per-doc minimum of a
  keyed-md5 hash family → band → bucket-join. Only documents sharing
  a band bucket are ever paired, so the quadratic pair space is never
  materialized — the scale path for fuzzy dedup.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via
  shingle-explode + self-join on shingle (inverted-index join). Exact
  but heavier; use as the verifier behind MinHash candidates.
- :func:`simhash` — 16-bit SimHash over whitespace tokens with a
  portable md5-derived per-token hash; near-dups share (or nearly
  share) a fingerprint.

Portability: every hash here is md5-based (functions/texthash.py) so
the DuckDB oracle reproduces identical values — engine-native hashes
(xxhash64 vs DuckDB hash) would diverge.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_with_spark_spark.functions.texthash import char_shingles
from data_lake_with_spark_spark.operators.text import fingerprint


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: one survivor (min id) per normalized fingerprint."""
    return (
        fingerprint(df, text_col)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dupes"))
    )


def _shingle_frame(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int
) -> DataFrame:
    """(id, shingle) pairs, distinct — the inverted-index base."""
    return (
        df.select(F.col(id_col), F.explode(char_shingles(F.col(text_col), shingle_k)).alias("sh"))
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """Per-doc MinHash signature: hash family j is the j-th 32-bit
    hex slice across ⌈num_hashes/4⌉ md5 digests per shingle —
    digest 0 is ``md5(shingle)`` (so signatures for num_hashes ≤ 4
    are unchanged from earlier rounds and match the SQL oracles),
    digest g ≥ 1 is ``md5('{g}:' + shingle)``.

    Position explode (int sequence) + scalar substring + md5:
    everything after the explode is whole-stage-codegen'd; no
    interpreted array-of-strings is ever built. This formulation now
    covers EVERY num_hashes — the old > 4 fallback ran one
    interpreted higher-order lambda per hash function (8 md5s per
    shingle for the docs-pipeline default), measured ~3× slower than
    ⌈n/4⌉ digests here.

    Hash-repartition by id first: a corpus read from few/small
    files otherwise runs the whole explode+hash pipeline in one
    task (input-split parallelism, not row parallelism). The
    partition count MUST be explicit: a bare repartition(col) is
    an AQE coalescing target, and on a small-bytes/high-CPU input
    (KBs of text that explode into millions of hashes) AQE
    collapses it to ONE partition and serializes the whole
    pipeline — observed 3.6x on a 1.5 MB corpus.

    Docs shorter than ``shingle_k`` (no shingles) are dropped,
    matching the SQL-oracle formulation.
    """
    parts = df.sparkSession.sparkContext.defaultParallelism
    n_digests = (num_hashes + 3) // 4
    sh = F.expr(f"substring(_txt, _i, {shingle_k})")
    digests = [
        F.md5(sh if g == 0 else F.concat(F.lit(f"{g}:"), sh)).alias(f"_d{g}")
        for g in range(n_digests)
    ]
    exploded = (
        df.where(F.length(text_col) >= shingle_k)
        .repartition(parts, F.col(id_col))
        .select(
            F.col(id_col),
            F.col(text_col).alias("_txt"),
            F.explode(
                F.sequence(
                    F.lit(1), F.length(text_col) - F.lit(shingle_k - 1)
                )
            ).alias("_i"),
        )
        .select(F.col(id_col), *digests)
    )
    cols = [
        F.min(
            F.substring(F.col(f"_d{j // 4}"), 8 * (j % 4) + 1, 8)
        ).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*cols)


def minhash_bands(
    sig: DataFrame, id_col: str = "doc_id", bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """(id, band_idx, band_key) — band_key concatenates ``rows_per_band``
    signature components; docs agreeing on ANY band are candidates."""
    parts = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        parts.append(
            sig.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.concat_ws("|", *cols).alias("band_key"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 5,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b), deduped across bands.

    One shuffle on the bucket key into ``collect_list``, then pairs
    expand inside each bucket array — the signature lineage runs ONCE
    (a band self-join would recompute it per side: Spark's exchange
    reuse does not fire across the differently-aliased branches).
    Bucket sizes ~ collision rate, so the expansion is bounded; a
    pathologically hot bucket (⇒ quadratic pairs) is inherent to LSH
    itself, not this formulation.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    banded = minhash_bands(sig, id_col, bands, rows_per_band)
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_ids"))
        .where(F.size("_ids") >= 2)
    )
    pairs = F.expr(
        "flatten(transform(_ids, (x, i) -> "
        "transform(slice(_ids, i + 2, size(_ids)), y -> struct(x AS id_a, y AS id_b))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.id_a"), F.col("_p.id_b"))
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 5,
    bands: int = 4,
) -> DataFrame:
    """Greedy MinHash dedup: drop any doc LSH-matched to a lower id.

    (Single-link transitive closure would need iterative connected
    components; greedy drop-higher-id is the standard one-pass
    approximation used by large-scale dedup pipelines.)
    """
    pairs = minhash_candidate_pairs(df, id_col, text_col, num_hashes, shingle_k, bands)
    dupes = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dupes, on=id_col, how="left_anti")


def jaccard_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-set Jaccard for a GIVEN candidate-pair set
    (id_a, id_b) — the scale path behind MinHash: candidates come from
    LSH, exact verification touches only those pairs.

    Per-doc distinct shingle sets are materialized once
    (``array_distinct`` projection — no explode), the candidate join
    fetches two arrays per pair, and the intersection is a JVM-side
    ``array_intersect``. Cost is O(|pairs| · shingles/doc), never the
    inverted-index blow-up (sum over shingles of doc-frequency²).
    """
    # repartition: shingle-array construction is per-row CPU work that
    # must not run in the scan's (often single) input task; explicit
    # count so AQE can't coalesce the small-bytes exchange to 1 task
    sets = (
        df.where(F.length(text_col) >= shingle_k)
        .repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
        .select(
            F.col(id_col),
            F.array_distinct(char_shingles(F.col(text_col), shingle_k)).alias("shs"),
        )
    )
    a = sets.select(F.col(id_col).alias("id_a"), F.col("shs").alias("shs_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("shs").alias("shs_b"))
    joined = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "shs_a",
            "shs_b",
            F.size("shs_a").alias("sz_a"),
            F.size("shs_b").alias("sz_b"),
        )
    )
    if threshold > 0:
        # size-ratio early exit (round-6 verdict #7): J(A,B) ≤
        # min(|A|,|B|)/max(|A|,|B|), and sizes are O(1) array-length
        # reads — pairs that cannot reach the threshold skip the
        # O(shingles/doc) array_intersect entirely. The 1e-6 slack
        # keeps pairs whose exact J sits just under the threshold but
        # ROUNDS to it (the emitted jaccard is round(·, 6) ≥ t), so
        # the survivor set is bit-identical to the unbounded path.
        joined = joined.where(
            F.least("sz_a", "sz_b")
            >= (F.lit(threshold) - F.lit(1e-6)) * F.greatest("sz_a", "sz_b")
        )
    return (
        joined.select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("shs_a", "shs_b")).alias("inter"),
            "sz_a",
            "sz_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_jaccard_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 5,
    bands: int = 4,
    threshold: float = 0.2,
) -> DataFrame:
    """The full fuzzy-dedup pipeline: LSH candidates → exact Jaccard
    verify ≥ threshold. This is the composition a 100 TB dedup run
    uses end-to-end."""
    cands = minhash_candidate_pairs(df, id_col, text_col, num_hashes, shingle_k, bands)
    return jaccard_verify_pairs(df, cands, id_col, text_col, shingle_k, threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.0,
    prefilter: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for all pairs sharing ≥1 shingle.

    Inverted-index self-join: |A∩B| from the join, |A|,|B| from a
    per-doc count, J = inter/(|A|+|B|-inter). Pass ``prefilter``
    (id_a,id_b candidate pairs, e.g. from MinHash) to bound the join
    at scale.
    """
    sh = _shingle_frame(df, id_col, text_col, shingle_k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("sh"), F.col(id_col).alias("id_a"))
    b = sh.select(F.col("sh"), F.col(id_col).alias("id_b"))
    inter = (
        a.join(b, on="sh", how="inner")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if prefilter is not None:
        inter = inter.join(prefilter, on=["id_a", "id_b"], how="left_semi")
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_star_edges(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 5,
    bands: int = 4,
) -> DataFrame:
    """Linear-size dedup graph: one edge per (doc, band) linking each
    doc to the MINIMUM doc id in its LSH bucket.

    Connected components over these star edges are IDENTICAL to
    components over the all-pairs bucket graph (a bucket is a clique
    either way), but the edge count is O(docs x bands) instead of
    O(sum bucket_size^2) — the scale-safe clustering input: a hot
    bucket of B docs emits B-1 edges, not B(B-1)/2 pairs. Use
    :func:`minhash_candidate_pairs` only when the pairs themselves
    are the output (e.g. feeding a pairwise verifier).

    One shuffle (groupBy bucket key for the per-bucket min) plus a
    broadcast-size map join back — expressed as min-over-window so
    Spark plans a single exchange on (band, band_key).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    banded = minhash_bands(sig, id_col, bands, rows_per_band)
    w = Window.partitionBy("band", "band_key")
    return (
        banded.withColumn("_min", F.min(id_col).over(w))
        .where(F.col(id_col) != F.col("_min"))
        .select(F.col("_min").alias("id_a"), F.col(id_col).alias("id_b"))
        .distinct()
    )


def _cc_driver_union_find(
    nodes: DataFrame, edges: DataFrame, id_col: str
) -> DataFrame:
    """Small-graph path for :func:`connected_components`: union-find
    over a collected edge list, labels pushed back via broadcast map
    join. Only ids that appear in an edge need a mapping row —
    singletons label themselves through the coalesce."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in edges.collect():
        ra, rb = find(row[0]), find(row[1])
        if ra != rb:
            # union by min keeps find() roots == component minima
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    mapping = [(x, find(x)) for x in parent]
    spark = nodes.sparkSession
    id_type = nodes.schema[id_col].dataType
    map_schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("_cc", id_type)]
    )
    map_df = spark.createDataFrame(mapping, map_schema)
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(F.broadcast(map_df), on="id", how="left")
        .select("id", F.coalesce("_cc", F.col("id")).alias("cluster"))
    )


def _cc_two_phase(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    max_iterations: int,
) -> DataFrame:
    """Web-scale regime for :func:`connected_components`: alternating
    large-star / small-star rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — the algorithm
    Google ran on trillion-edge graphs; no counterpart in the
    reference repo). Unlike min-label propagation, whose per-round
    state is one label row per NODE but whose round count is
    O(log diameter) only after pointer-jumping's self-join, each star
    round here is a pure per-neighborhood min over the EDGE set —
    two window shuffles, no self-join — and the edge set provably
    shrinks toward a star forest in O(log² n) rounds (O(log n)
    observed). The win at scale: every operation is per-source-
    neighborhood (map-side after one hash partition on src), so hot
    components never concentrate on one reducer the way a global
    label join can.

    - large-star: every node u links its LARGER neighbors to
      m = min(Γ(u) ∪ {u}) — breaks tall chains.
    - small-star: every node u links its smaller-or-self neighborhood
      to its minimum — collapses each neighborhood onto the root.

    Convergence: the edge set is a fixpoint of both operations, at
    which point every edge is (child, component-min). Checked with
    ``exceptAll`` both ways only when counts match (cheap guard
    first). Each round is ``localCheckpoint``-truncated like the
    pointer-jump loop — the edge frame is rebuilt from itself every
    round, so lineage would otherwise double.
    """
    ed = (
        edges.select("id_a", "id_b")
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def bidirectional(e: DataFrame) -> DataFrame:
        return e.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).unionByName(
            e.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )

    w = Window.partitionBy("src")
    converged = False
    for _ in range(max_iterations):
        bidir = bidirectional(ed)
        # large-star: (v, m) for v in Γ(u), v > u; m = min(Γ(u) ∪ {u})
        large = (
            bidir.withColumn(
                "_m", F.least(F.min("dst").over(w), F.col("src"))
            )
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("id_a"), F.col("_m").alias("id_b"))
            .where(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        # small-star over the large-star output: for each u, link its
        # strictly-smaller neighbors AND itself to their joint min
        sm = bidirectional(large).where(F.col("dst") < F.col("src"))
        sm = sm.withColumn("_m", F.min("dst").over(w))
        new_ed = (
            sm.select(F.col("dst").alias("id_a"), F.col("_m").alias("id_b"))
            .unionByName(
                sm.select(
                    F.col("src").alias("id_a"), F.col("_m").alias("id_b")
                )
            )
            .where(F.col("id_a") != F.col("id_b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if new_ed.count() == ed.count() and (
            new_ed.exceptAll(ed).limit(1).count() == 0
        ):
            ed = new_ed
            converged = True
            break
        ed = new_ed
    if not converged:
        warnings.warn(
            f"connected_components(two_phase): max_iterations="
            f"{max_iterations} exhausted before the edge set reached "
            "its star-forest fixpoint; returned clusters may be "
            "under-merged (rounds needed is O(log^2 n)).",
            RuntimeWarning,
            stacklevel=3,
        )
    # fixpoint edge set is a star forest: child -> component min
    # (groupBy-min instead of trusting uniqueness, so a truncated
    # non-converged run still yields each node's best-known root)
    roots = ed.groupBy(F.col("id_a").alias("id")).agg(
        F.min("id_b").alias("_cc")
    )
    if not converged:
        # A truncated run's labels need not be self-consistent: a
        # node can carry a root that itself maps to a smaller id —
        # and one jump is NOT enough (a chain of depth d needs
        # ceil(log2 d) doubling rounds; verified by counterexample in
        # review: a 7-edge path truncated at 1 round still had
        # lab(lab(x)) != lab(x) after a single jump). Pointer-jump
        # the root mapping to its fixpoint: each round halves chain
        # depth, and the loop stops when no label changes, so every
        # emitted label IS a fixed point of the mapping. Clusters may
        # still be under-MERGED (the warning above stands); the
        # mapping is one row per node, localCheckpointed per round to
        # keep lineage flat.
        while True:
            r2 = roots.select(
                F.col("id").alias("_rid"), F.col("_cc").alias("_rcc")
            )
            jumped = (
                roots.join(r2, roots["_cc"] == r2["_rid"], how="left")
                .select(
                    "id",
                    F.least(
                        F.col("_cc"), F.coalesce("_rcc", F.col("_cc"))
                    ).alias("_cc"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                jumped.alias("n")
                .join(roots.alias("o"), on="id")
                .where(F.col("n._cc") != F.col("o._cc"))
                .limit(1)
                .count()
            )
            roots = jumped
            if changed == 0:
                break
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(roots, on="id", how="left")
        .select("id", F.coalesce("_cc", F.col("id")).alias("cluster"))
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
    collect_threshold: int = 1_500_000,
    algorithm: str = "pointer_jump",
) -> DataFrame:
    """Connected components over a candidate-pair graph: every node
    labeled with the MINIMUM id reachable from it — the clustering
    step that turns pairwise near-dup candidates into dedup groups
    (transitive closure; the greedy drop-lower-id pass in
    :func:`minhash_dedup` under-merges chains a-b, b-c).

    Two regimes, split on edge count (the same collect-when-small
    trade Spark itself makes for broadcast joins):

    - ``<= collect_threshold`` edges: collect the edge list and run
      union-find on the driver (microseconds), broadcast the
      non-trivial labels back as a map join. Each distributed
      iteration below costs seconds of scheduling latency regardless
      of data size, so for graphs this small the loop is pure
      overhead. The 1.5M default sits at the MEASURED crossing
      (SCALING_r06.md: min-of-2 on synthetic star graphs, driver
      wins 6.8s vs 9.0s at 1M edges, loses 13.6s vs 8.6s at 2M and
      64.6s vs 24.0s at 8M — the collect + Python loop grows
      super-linearly past it); on a real cluster the driver collect
      also pays network, so err lower, not higher.
    - larger: iterative distributed min-label propagation (below).
      This is the 100 TB path — star-edge inputs
      (:func:`minhash_star_edges`) keep the edge count linear in
      docs, and each round is a pair of shuffles over (id, label)
      rows, never materializing anything quadratic.

    Iterative min-label propagation with pointer jumping: each round
    (a) pulls the minimum neighbor label across edges and (b) jumps
    through the label mapping itself (``cluster := cluster[cluster]``),
    so chains collapse in O(log diameter) rounds, not O(diameter).
    Each round's result is truncated with ``localCheckpoint(eager)``
    before the next round builds on it. ``cache()`` is NOT enough
    here: the pointer-jump self-join references the round's frame
    twice, so the LOGICAL plan doubles every iteration, and caching
    only short-circuits physical execution — Catalyst still
    re-analyzes the full exponential lineage on every action (at
    ~8 rounds that is minutes of driver time with zero tasks
    running; observed 18+ min on a 5k-doc graph). Checkpointing
    makes each round's plan a flat scan of materialized blocks. On a
    cluster, pass a reliable ``spark.sparkContext.setCheckpointDir``
    path and swap ``checkpoint`` for ``localCheckpoint`` if executor
    loss matters — same interface.

    ``algorithm`` selects the distributed regime (graphs above
    ``collect_threshold``): ``"pointer_jump"`` (min-label
    propagation, below) or ``"two_phase"`` (alternating large-star /
    small-star, :func:`_cc_two_phase` — the web-scale choice: pure
    per-neighborhood edge transforms, no global label self-join).
    Both converge to the same min-id labeling; both are
    value-verified against the q33 oracle (q91 / q100).

    ``edges`` must have columns (id_a, id_b). Returns (id, cluster)
    with cluster = min reachable id.
    """
    if algorithm not in ("pointer_jump", "two_phase"):
        raise ValueError(
            f"unknown algorithm {algorithm!r}; use 'pointer_jump' or 'two_phase'"
        )
    ed = edges.select("id_a", "id_b").localCheckpoint(eager=True)
    if collect_threshold and ed.count() <= collect_threshold:
        return _cc_driver_union_find(nodes, ed, id_col)
    if algorithm == "two_phase":
        return _cc_two_phase(nodes, ed, id_col, max_iterations)

    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("cluster")
    ).localCheckpoint(eager=True)
    bidir = (
        ed.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(ed.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            bidir.join(labels, on=[bidir["src"] == labels["id"]])
            .groupBy("dst")
            .agg(F.min("cluster").alias("n_min"))
        )
        pulled = (
            labels.join(
                neighbor_min, on=[labels["id"] == neighbor_min["dst"]], how="left"
            )
            .select(
                "id",
                F.col("cluster").alias("_old"),
                F.least(
                    F.col("cluster"), F.coalesce(F.col("n_min"), F.col("cluster"))
                ).alias("cluster"),
            )
        )
        mapping = pulled.select(
            F.col("id").alias("_mid"), F.col("cluster").alias("_mcluster")
        )
        new_labels = (
            pulled.join(mapping, on=[pulled["cluster"] == mapping["_mid"]], how="left")
            .select(
                "id",
                "_old",
                F.least(
                    F.col("cluster"),
                    F.coalesce(F.col("_mcluster"), F.col("cluster")),
                ).alias("cluster"),
            )
            .localCheckpoint(eager=True)
        )
        # Convergence: labels only ever decrease (every update is a
        # least(old, ...)), so changed == 0 <=> fixpoint. The previous
        # label rides along as _old, so the check is one scan of the
        # checkpointed round — no extra confirm round and no join
        # against the previous iteration (each local round costs
        # seconds of scheduler latency regardless of data size).
        changed = (
            new_labels.agg(
                F.count(F.when(F.col("cluster") != F.col("_old"), 1)).alias("c")
            ).collect()[0]["c"]
        )
        labels = new_labels.select("id", "cluster")
        if changed == 0:
            return labels
    warnings.warn(
        f"connected_components: max_iterations={max_iterations} exhausted "
        "without reaching the fixpoint (a round with zero label changes); "
        "returned clusters may be "
        "under-merged. Raise max_iterations (rounds needed is "
        "O(log(graph diameter)) with pointer jumping).",
        RuntimeWarning,
        stacklevel=2,
    )
    return labels


def token_jaccard_blas(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
    block_by: list[str] | None = None,
) -> DataFrame:
    """Exact within-block token-set Jaccard via per-block GEMM.

    Each block (applyInPandas group) builds a docs×vocab 0/1 matrix;
    ``M @ M.T`` yields all pairwise intersection counts in one BLAS
    call — exact (counts ≤ vocab size are exact in float32) and ~10×
    the inverted-index/verify path on dense corpora where most pairs
    genuinely exceed the threshold (there, candidate pruning can't
    win by construction).

    Choose by block shape: blocks that fit a worker (≲100k docs) →
    this; larger blocks → token_jaccard_pairs(prefix_filter=True);
    web-scale approximate → minhash_candidate_pairs.
    """
    import numpy as np
    import re as _re

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("jaccard", DoubleType()),
        ]
    )
    block = list(block_by) if block_by else []

    def run(pdf):
        import pandas as pd

        ids = pdf[id_col].to_numpy(dtype=np.int64)
        token_sets = [
            set(_re.split(r"\s+", t.strip())) if t is not None else set()
            for t in pdf[text_col]
        ]
        vocab: dict[str, int] = {}
        for s in token_sets:
            for t in s:
                vocab.setdefault(t, len(vocab))
        m = np.zeros((len(ids), len(vocab)), dtype=np.float32)
        for i, s in enumerate(token_sets):
            for t in s:
                m[i, vocab[t]] = 1.0
        inter = m @ m.T
        sz = m.sum(axis=1)
        union = sz[:, None] + sz[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.round(
                np.where(union > 0, inter.astype(np.float64) / union, 0.0), 6
            )
        keep = (jac >= threshold) & (ids[:, None] < ids[None, :])
        ai, bi = np.nonzero(keep)
        return pd.DataFrame(
            {"id_a": ids[ai], "id_b": ids[bi], "jaccard": jac[ai, bi]}
        )

    if block:
        return df.select(id_col, text_col, *block).groupBy(*block).applyInPandas(
            lambda _key, pdf: run(pdf), out_schema
        )
    return df.select(id_col, text_col).groupBy(F.lit(1)).applyInPandas(
        lambda _key, pdf: run(pdf), out_schema
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Per-doc SimHash fingerprint over whitespace tokens.

    Token hash = first 32 bits of md5 (portable). Bit b of the
    fingerprint is 1 iff sum over tokens of (±1 by token-hash bit b)
    is positive. All ``bits`` sums run as one groupBy with map-side
    combine — a single shuffle regardless of bit width.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
    tok = tok.select(id_col, h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    fp: Column = F.lit(0).cast("bigint")
    for b in range(bits):
        fp = fp + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(0)
    return agg.select(F.col(id_col), fp.cast("bigint").alias("simhash"))


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bucket_dims: tuple[int, ...] | None = None,
    vec_dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ t).

    With ``bucket_dims=None``: brute-force all-pairs (exact baseline;
    O(N²·d) — fine for a corpus sample, never for 100 TB). With
    ``bucket_dims``: sign-LSH bucketing (similarity.lsh_sign_buckets)
    restricts pairing to same-bucket candidates — the scale path; the
    cross join becomes an equi-join whose shuffle key is the bucket.
    """
    from data_lake_with_spark_spark.operators.similarity import (
        cosine_expr,
        lsh_sign_buckets,
    )

    if bucket_dims is None:
        a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        bucketed = lsh_sign_buckets(emb, vec_col, bucket_dims)
        a = bucketed.select(
            "bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
        )
        b = bucketed.select(
            "bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
        )
        pairs = a.join(b, on="bucket", how="inner").where(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", F.round(cosine_expr("va", "vb", vec_dim), 6).alias("cos")
    ).where(F.col("cos") >= threshold)


def token_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
    block_by: list[str] | None = None,
    prefix_filter: bool = False,
    max_broadcast_docs: int = 2_000_000,
) -> DataFrame:
    """Word-token-set Jaccard similarity join (bag-of-words twin of
    the char-shingle Jaccard). EXACT results (within blocks) on the
    naive path; the ``prefix_filter`` path computes Jaccard over
    60-bit md5-sliced token hashes, so exactness there is
    probabilistic — a cross-token collision (~1e-9 at vocabulary
    scale, birthday-bounded) could inflate one intersection count.
    Every candidate is still verified on full (hashed) token sets;
    only hash collisions, not filtering, can perturb a value.

    Two scale levers, both semantics-preserving:

    - ``block_by``: restrict pairing to rows sharing the blocking
      key(s) (e.g. language) — the first move of every production
      similarity join; cross-block pairs are definitionally out of
      scope.
    - ``prefix_filter=True`` (requires threshold > 0): PPJoin-style
      prefix filtering (Xiao et al., WWW'08). Tokens are globally
      ordered by ascending document frequency; a pair with
      J ≥ t must share a token within each side's first
      ``|A| - ceil(t·|A|) + 1`` tokens, so the inverted index is
      built over those (rare-token) prefixes only — hot stop-tokens
      never enter the candidate join, which is what makes the naive
      index quadratic. Candidates are then verified exactly on the
      full token sets (array_intersect, JVM-side).

    Without either lever this is the naive inverted-index self-join —
    fine for samples, quadratic in hot-token document frequency at
    scale.
    """
    block = list(block_by) if block_by else []
    tok = df.select(
        F.col(id_col),
        *[F.col(c) for c in block],
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).distinct()
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    if prefix_filter:
        if threshold <= 0:
            raise ValueError("prefix_filter requires threshold > 0")
        from pyspark.sql import Window

        # Tokens ride as 60-bit ints (md5 slice — portable, codegen'd)
        # from here on: the candidate join shuffles longs instead of
        # strings and the verify intersects long arrays (~20% off the
        # whole query at sf0.1). Jaccard values are unchanged —
        # 60-bit collisions at vocabulary scale are ~1e-9 — and the
        # global df-order is over hashed tokens, which is still A
        # global order (any consistent order makes the prefix bound
        # valid; Xiao et al. recommend df-ascending, kept here).
        hjoin = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
        htok = tok.select(F.col(id_col), *[F.col(c) for c in block], hjoin.alias("th"))
        dfreq = htok.groupBy(*block, "th").agg(F.count(F.lit(1)).alias("_df"))
        ranked = (
            htok.join(dfreq, on=block + ["th"])
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy("_df", "th")
                ),
            )
            .join(sizes, on=id_col)
        )
        # Materialize the inverted index before self-joining it: the
        # index is tiny (prefix tokens only) but its lineage is not
        # (explode → distinct → df-join → window), and Spark rebuilds
        # the full lineage for EACH side of a self-join. Measured at
        # sf0.1: checkpoint + broadcast verify took the query
        # 40.9s → 10.3s, and the int-hashed tokens a further ~20%
        # (→ ~8s) — byte-identical output throughout.
        index = (
            ranked.where(
                F.col("_rn")
                <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
            )
            .select(*block, "th", F.col(id_col), "_rn", "sz")
            .localCheckpoint()
        )
        a = index.select(
            *block,
            "th",
            F.col(id_col).alias("id_a"),
            F.col("_rn").alias("_rn_a"),
            F.col("sz").alias("sz_a"),
        )
        b = index.select(
            *block,
            "th",
            F.col(id_col).alias("id_b"),
            F.col("_rn").alias("_rn_b"),
            F.col("sz").alias("sz_b"),
        )
        # PPJoin length + positional filters (Xiao et al. §3): both are
        # pure column predicates evaluated inside the candidate join,
        # BEFORE the pair-distinct shuffle and the verify stage. At
        # sf0.1 (t=0.7) they cut candidate pairs 3.17M -> 2.13M against
        # 1.31M TRUE output pairs — this synthetic corpus is near-dup-
        # saturated, so candidates are floor-bounded by the output. On
        # a realistic corpus the cut is the whole story, MEASURED in
        # tests/test_dedup.py::test_ppjoin_prefix_filter_wins...: 2k
        # Zipf docs / 20 true pairs -> naive 1,997,471 candidates vs
        # 33,158 here (60×); wall-clock crossover at 8k docs: 26.9s
        # vs naive 123.2s (4.6×, widening quadratically).
        #   length:      J ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|)
        #   positional:  any common token at prefix positions (i, j)
        #                bounds the overlap by min(i-1, j-1) + 1 +
        #                min(|A|-i, |B|-j), which must reach
        #                α = ceil(t/(1+t)·(|A|+|B|)).
        # The 1e-9 epsilon keeps float ceil from rounding an exact
        # integer up, which would over-filter and break exactness;
        # under-filtering only admits extra candidates for verify.
        alpha = F.ceil(
            F.lit(threshold / (1.0 + threshold))
            * (F.col("sz_a") + F.col("sz_b"))
            - F.lit(1e-9)
        )
        overlap_ub = (
            F.least(F.col("_rn_a") - 1, F.col("_rn_b") - 1)
            + 1
            + F.least(
                F.col("sz_a") - F.col("_rn_a"), F.col("sz_b") - F.col("_rn_b")
            )
        )
        cands = (
            a.join(b, on=block + ["th"])
            .where(F.col("id_a") < F.col("id_b"))
            .where(
                F.least("sz_a", "sz_b")
                >= F.lit(threshold) * F.greatest("sz_a", "sz_b") - F.lit(1e-9)
            )
            .where(overlap_ub >= alpha)
            .select("id_a", "id_b")
            .distinct()
        )
        # Hashed token sets for the verify intersect, built by
        # re-aggregating the already-distinct (id, th) frame — no
        # second text-split pass, and array_intersect runs on longs.
        # collect_set (not collect_list): distinct tokens can collide
        # at 60 bits, and a duplicated hash in the list would skew
        # size(_set) — the set keeps the verify side duplicate-free.
        sets = htok.groupBy(id_col).agg(F.collect_set("th").alias("_set"))
        # Broadcast the token-set side of the verify joins when the
        # corpus is broadcastable: one row per document vs millions of
        # candidate pairs — AQE underestimates this asymmetry (the sets
        # subplan carries the full-scan size estimate) and falls back
        # to shuffling the candidate table twice. The hint is
        # size-gated exactly like similarity.all_pairs_blas: a bounded
        # limit(n+1).count() detects an oversize corpus without a full
        # count job, and above the bound the verify falls back to a
        # plain shuffled (sort-merge) join on the pair ids — both
        # sides hash-partition on the same key, no driver-sized
        # materialization anywhere.
        n_docs = sets.select(id_col).limit(max_broadcast_docs + 1).count()
        sa = sets.select(F.col(id_col).alias("id_a"), F.col("_set").alias("_sa"))
        sb = sets.select(F.col(id_col).alias("id_b"), F.col("_set").alias("_sb"))
        if n_docs <= max_broadcast_docs:
            sa, sb = F.broadcast(sa), F.broadcast(sb)
        verified = (
            cands.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a",
                "id_b",
                F.size(F.array_intersect("_sa", "_sb")).alias("inter"),
                F.size("_sa").alias("sz_a"),
                F.size("_sb").alias("sz_b"),
            )
        )
        return verified.select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        ).where(F.col("jaccard") >= threshold)

    a = tok.select(*block, "tok", F.col(id_col).alias("id_a"))
    b = tok.select(*block, "tok", F.col(id_col).alias("id_b"))
    inter = (
        a.join(b, on=block + ["tok"], how="inner")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def duplicated_spans(
    docs: DataFrame,
    window: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-level (substring) duplicate detection — the Spark-shaped
    analog of suffix-array training-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"):
    every rolling ``window``-token span that recurs in at least
    ``min_docs`` distinct documents, with its document frequency and
    total occurrence count. Downstream passes use the output either to
    cut the repeated spans out of documents or to drop documents
    dominated by boilerplate.

    Plan: one linear per-doc rolling-window explode (no join — spans
    come from ``text.word_ngram_rows``, codegen'd and shuffle-free),
    then a single hash-shuffle on the span for the two aggregates.
    Output is bounded by total corpus tokens, never corpus². At
    100 TB the grouping key would be ``xxhash64(span)`` (8 bytes
    instead of the span text); the text key is kept here so the
    DuckDB oracle compares values. Beyond-reference LLM-pipeline
    operator.
    """
    from data_lake_with_spark_spark.operators.text import word_ngram_rows

    spans = word_ngram_rows(
        docs, window, id_col, text_col, out_col="span"
    ).where(F.col("span") != "")
    return (
        spans.groupBy("span")
        .agg(
            F.count_distinct(F.col(id_col)).cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )

def remove_duplicated_spans(
    docs: DataFrame,
    window: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The excision pass :func:`duplicated_spans` detects for — the
    actual Lee et al. 2022 operation: rewrite every document with all
    occurrences of corpus-recurring ``window``-token spans removed,
    keeping only tokens no recurring span covers.

    Output: ``(id, clean_text, n_tokens_kept, n_tokens)`` — one row
    per input document, including fully-excised docs
    (``clean_text = ''``) and docs shorter than ``window`` (pass
    through whitespace-normalized: the rebuild joins tokens with a
    single space, as any token-level rewrite must).

    Plan shape (all JVM expressions, no Python): the recurring-span
    set comes from the same single span-groupBy as detection; one
    hash join of span starts against that set marks hit positions;
    one explode widens hits to covered token positions; a left-anti
    join drops covered tokens; one final groupBy rebuilds the text in
    position order (``array_sort(collect_list(struct(pos, tok)))`` —
    sorts within each doc's group, never a global sort). Seven
    exchange nodes (plan-gated in tests/test_plan_gates.py),
    every one keyed on span-hash or doc id — at 100 TB the
    span join keys become ``xxhash64(span)`` exactly as in
    :func:`duplicated_spans`, and no stage ever holds more than one
    document's tokens in a single row. Beyond-reference LLM-pipeline
    operator (the detect half is q42; this is the rewrite half).
    """
    from data_lake_with_spark_spark.operators.text import tokens

    bad = duplicated_spans(docs, window, min_docs, id_col, text_col).select(
        "span"
    )
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("_t"))
    starts = (
        base.where(F.size("_t") >= window)
        .select(
            id_col,
            "_t",
            F.explode(
                F.sequence(F.lit(1), F.size("_t") - (window - 1))
            ).alias("_i"),
        )
        .select(
            id_col,
            "_i",
            F.array_join(F.slice("_t", F.col("_i"), window), " ").alias(
                "span"
            ),
        )
    )
    covered = (
        starts.join(bad, "span")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("_i"), F.col("_i") + (window - 1))
            ).alias("_p"),
        )
        .distinct()
    )
    tokrows = base.select(
        F.col(id_col), F.posexplode("_t").alias("_p0", "tok")
    ).select(id_col, (F.col("_p0") + 1).alias("_p"), "tok")
    cleaned = (
        tokrows.join(covered, [id_col, "_p"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens_kept"),
        )
    )
    return (
        docs.select(F.col(id_col), F.size(toks).cast("bigint").alias("n_tokens"))
        .join(cleaned, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_tokens_kept", F.lit(0)).cast("bigint").alias(
                "n_tokens_kept"
            ),
            "n_tokens",
        )
    )

def canonical_per_cluster(
    df: DataFrame,
    clusters: DataFrame,
    order_by: "list[Column]",
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Pick ONE canonical survivor per near-duplicate cluster by an
    explicit preference order — the selection policy production dedup
    actually ships: keep the best-quality (most-starred, longest,
    canonical-URL…) member of each duplicate group, not the lowest id.
    (:func:`minhash_dedup`'s greedy drop-higher-id and the
    min-id-per-cluster convention are tie-breaks of convenience;
    corpus quality improves when the survivor is CHOSEN.)

    ``clusters`` is a ``(id, cluster)`` assignment — the output of
    :func:`connected_components`, which labels every node including
    singletons, so this is a total pass: every cluster emits exactly
    one row. ``order_by`` ranks within a cluster, best first, and
    must end in a unique tiebreak (the id) for determinism.

    Plan: one hash join on the id (cluster assignment is ≤ one row
    per doc) + one window shuffle on the cluster label. No driver
    action; at 100 TB both shuffles key on ids, and cluster skew is
    bounded by the largest duplicate group — the same bound the CC
    step already carries.
    """
    w = Window.partitionBy(cluster_col).orderBy(*order_by)
    return (
        df.join(clusters, id_col)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

def minhash_dedup_incremental(
    new: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 5,
    bands: int = 4,
) -> DataFrame:
    """Delta-mode fuzzy dedup — the shape a DAILY ingest actually
    runs: survivors of a NEW batch against an already-curated corpus.
    A new doc is dropped if any of its LSH bands collides with (a) any
    INDEX doc's band, or (b) a lower-id doc within the new batch
    (identical greedy semantics to :func:`minhash_dedup` — with an
    empty index this IS minhash_dedup).

    The point is what it never does: index×index candidates are never
    generated — the join touches index bands only as the build side
    of a semi-join, so daily cost is O(new·bands) probe rows against
    the indexed band set, not a re-dedup of the full corpus. In
    production the index band rows are precomputed once and stored
    (they are exactly :func:`minhash_bands` output — a parquet table
    bucketed by band_key); here they are derived inline so the
    operator is self-contained and oracle-checkable.

    Two shuffles on the new side (signature groupBy, band bucket) +
    the index-side signature build; the within-batch pass reuses the
    same band rows via one window. Beyond-reference LLM-pipeline
    operator.
    """
    rows_per_band = num_hashes // bands
    # bn is consumed TWICE (index semi-join + within-batch window);
    # without the checkpoint the whole new-side shingle→md5→groupBy
    # lineage executes once per consumer (the ngram_rarity lesson,
    # ADVICE r6). Band rows are |new|·bands tiny tuples — cheap to pin.
    bn = minhash_bands(
        minhash_signatures(new, id_col, text_col, num_hashes, shingle_k),
        id_col,
        bands,
        rows_per_band,
    ).localCheckpoint()
    bi = minhash_bands(
        minhash_signatures(index, id_col, text_col, num_hashes, shingle_k),
        id_col,
        bands,
        rows_per_band,
    )
    vs_index = (
        bn.join(
            bi.select("band", "band_key").distinct(),
            ["band", "band_key"],
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    w = Window.partitionBy("band", "band_key")
    within = (
        bn.withColumn("_m", F.min(id_col).over(w))
        .where(F.col(id_col) > F.col("_m"))
        .select(id_col)
        .distinct()
    )
    dropped = vs_index.unionByName(within).distinct()
    return new.join(dropped, id_col, "left_anti")

def cluster_stats(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
    stratum_col: str = "source",
) -> DataFrame:
    """Dedup AUDIT report — the QA numbers a dedup run publishes:
    per stratum (source/crawl/language), document count, duplicate
    count (docs minus clusters), duplication rate, and the largest
    cluster size. Consumes a cluster assignment
    (:func:`connected_components` output shape) joined back to the
    corpus — two keyed aggregates over (id, cluster, stratum) triples,
    never the text.

    A cluster spanning strata is attributed to each stratum it
    touches (counts are per-(stratum ∩ cluster) — the report answers
    'how duplicated is THIS source', not 'which source owns the
    cluster')."""
    joined = docs.select(F.col(id_col), F.col(stratum_col)).join(
        clusters.select(F.col(id_col), F.col(cluster_col)), id_col
    )
    per_cluster = joined.groupBy(stratum_col, cluster_col).agg(
        F.count(F.lit(1)).alias("_sz")
    )
    return per_cluster.groupBy(stratum_col).agg(
        F.sum("_sz").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.sum("_sz") - F.count(F.lit(1))).cast("bigint").alias("n_dupes"),
        # unrounded: int/int is ONE IEEE division, bit-identical
        # cross-engine; a 6dp round can land on a .xxxxxx5 boundary
        # where Spark and DuckDB round the same double apart (the q85
        # divergence class)
        (
            (F.sum("_sz") - F.count(F.lit(1))) / F.sum("_sz").cast("double")
        ).alias("dup_rate"),
        F.max("_sz").cast("bigint").alias("max_cluster"),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str = "c_custkey",
    key_col: str = "c_name",
    window: int = 3,
    max_dist: int = 2,
) -> DataFrame:
    """Entity resolution by the sorted-neighborhood method
    (Hernández & Stolfo, SIGMOD 1995): sort records by a blocking
    key, compare each record only to its ``window`` successors in
    sort order, keep pairs within ``max_dist`` Levenshtein edits.

    SNM is the LINEAR-work alternative to quadratic blocking: a block
    key with a hot value (every "Smith" in one block) degrades
    hash-blocking to O(block²), while SNM's candidate count is
    exactly ``window · N`` regardless of key skew. The sort itself
    uses :func:`~data_lake_with_spark_spark.operators.ranking.global_rank`
    (range exchange + per-partition window), never a single-partition
    ``ROW_NUMBER``. The neighbor join is W equi-joins in one shot —
    ``rank_b == rank_a + offset`` for offset 1..W via a tiny
    ``explode`` of the offset array — so Spark plans a shuffled hash
    join on the rank, never a broadcast-nested-loop range join.

    The Levenshtein DP (O(len²) per pair) runs AFTER two cheap
    pushed-down prunes: the length-difference lower bound
    ``|len(a)-len(b)| <= max_dist`` and the sort-order window itself.
    Returns (id_a, id_b, key_a, key_b, dist) with a < b in sort
    order; distances are exact integers (Spark ``levenshtein`` and
    DuckDB ``levenshtein`` implement the same classic DP).
    """
    from data_lake_with_spark_spark.operators.ranking import global_rank

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    ranked = global_rank(
        df.select(F.col(id_col).alias("_id"), F.col(key_col).alias("_key")),
        [F.col("_key").asc(), F.col("_id").asc()],
        rank_col="_rn",
    )
    left = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("_key").alias("key_a"),
        F.col("_rn").alias("_rn_a"),
    ).withColumn("_off", F.explode(F.array(*[F.lit(i) for i in range(1, window + 1)])))
    right = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("_key").alias("key_b"),
        F.col("_rn").alias("_rn_b"),
    )
    return (
        left.join(right, left["_rn_a"] + left["_off"] == right["_rn_b"])
        # length bound FIRST: |len(a)-len(b)| > d implies lev > d, so
        # the O(len²) DP never runs on those pairs
        .where(F.abs(F.length("key_a") - F.length("key_b")) <= max_dist)
        .withColumn("dist", F.levenshtein("key_a", "key_b").cast("int"))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "key_a", "key_b", "dist")
    )


def soft_dedup_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Soft (weighted) exact dedup: instead of DROPPING duplicate
    documents, weight each by ``1/cluster_size`` so a training run
    sees every duplicate group with total mass 1 — the down-weighting
    alternative the drop-based q21/q128 path can't express (some
    mixtures keep duplicates deliberately: freshness, domain
    balance). Clusters are md5(content) groups (the exact-dup
    definition q21 uses; md5 so any engine re-derives membership).

    One scan-side hash + one keyed count + a co-keyed join back —
    the join reuses the groupBy's hash partitioning (no extra
    exchange). Weight is ONE int/int→double division, exact
    cross-engine.

    Returns (id, content_hash, cluster_size, weight).
    """
    hashed = docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("content_hash")
    )
    sizes = hashed.groupBy("content_hash").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return hashed.join(sizes, "content_hash").select(
        id_col,
        "content_hash",
        "cluster_size",
        (F.lit(1.0) / F.col("cluster_size")).alias("weight"),
    )
