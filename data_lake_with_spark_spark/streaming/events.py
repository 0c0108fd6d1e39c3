"""Structured Streaming over the events stream.

The reference is pure batch (SURVEY §2 I5) — its "stream-shaped" data
(user event logs) is processed as daily files. This module is the
north-star streaming surface: the same event pipeline expressed as
``readStream → transform → writeStream`` with event-time semantics.

Components:
- :func:`read_event_stream` — file-source stream over a directory of
  parquet event files (schema pinned; new files picked up per batch).
- :func:`windowed_counts` — watermarked tumbling/sliding window
  aggregation (late data beyond the watermark dropped, state bounded).
- :func:`session_counts` — native ``session_window`` gap sessions,
  the streaming twin of operators/windows.sessionize.
- :func:`running_user_totals` — custom stateful aggregation via
  ``applyInPandasWithState`` (per-user running totals with timeout) —
  the escape hatch for operators Spark's built-ins can't express.

Scale notes: state stores partition by group key; watermarks bound
state size; at 100 TB/day the source would be Kafka with the same
transform graph (source/sink swap only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Event schema for streaming reads (events.parquet re-written to a
#: stream dir by tests; ts as TIMESTAMP, not the nanos wart).
EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", StringType()),  # ISO string in stream files
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    """File-source stream with a pinned schema (no inference races)."""
    reader = spark.readStream.schema(EVENT_STREAM_SCHEMA).format(fmt)
    df = reader.load(path)
    return df.withColumn("ts", F.to_timestamp("ts"))


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked (sliding) window counts per event_type."""
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal-routed sum AND decimal-space round: the sum is
            # exact regardless of accumulation order, and rounding
            # BEFORE the double cast keeps .xx5 boundaries exact too
            # (round-on-double diverges between engines: Spark
            # re-quantizes via BigDecimal.valueOf, DuckDB rounds the
            # raw binary double — review finding)
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows keyed by user (gap-based)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal-space round before the double cast (see
            # windowed_counts)
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def stream_stream_conversions(
    events_a: DataFrame,
    events_b: DataFrame,
    type_a: str = "view",
    type_b: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: every ``type_b`` event matched to the
    same user's earlier ``type_a`` events within ``within`` — the
    watermarked conversion-attribution join (view→purchase within an
    hour), the one streaming join shape the rest of this module
    doesn't cover (windowed agg / session / stream-static / dedup /
    CDC / custom state).

    Both sides carry watermarks and the join condition bounds b.ts to
    ``[a.ts, a.ts + within]``, so Spark can compute a state watermark
    and EVICT buffered rows — without the time bound a stream-stream
    join must hold both streams forever. At 100 TB/day this is the
    difference between bounded per-key state and an unbounded join
    buffer. Equi-key: user_id (state partitioned by it).
    """
    a = (
        events_a.where(F.col("event_type") == type_a)
        .select(
            F.col("user_id").alias("a_user"),
            F.col("ts").alias("a_ts"),
            F.col("event_id").alias("a_event_id"),
        )
        .withWatermark("a_ts", watermark)
    )
    b = (
        events_b.where(F.col("event_type") == type_b)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
            F.col("event_id").alias("b_event_id"),
        )
        .withWatermark("b_ts", watermark)
    )
    cond = (
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {within}"))
    )
    return a.join(b, cond, "inner").select(
        F.col("a_user").alias("user_id"),
        "a_event_id",
        "b_event_id",
        "a_ts",
        "b_ts",
    )


def running_user_totals(events: DataFrame, timeout_ms: int = 3600_000) -> DataFrame:
    """Custom stateful operator: per-user running event count + value
    total via applyInPandasWithState (GroupState), emitting one update
    row per batch per active user."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def enriched_windowed_counts(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    group_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static join + windowed aggregation: each micro-batch
    broadcast-joins the static dimension (no state, no shuffle of the
    stream), then counts per (window, dim attribute). The canonical
    'enrich events with a dimension while they flow' shape."""
    joined = events.join(
        F.broadcast(dim), on=events[stream_key] == dim[dim_key], how="inner"
    )
    return (
        joined.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col(group_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(group_col),
            "n",
        )
    )


def dedup_stream(
    events: DataFrame, keys: tuple[str, ...] = ("event_id",), watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once dedup: ``dropDuplicates`` on the event
    key under a watermark, so the dedup state store holds only keys
    newer than (max event time − watermark) — bounded state, the
    standard at-least-once-source → exactly-once-pipeline repair shape
    (re-delivered files/offsets collapse to one row)."""
    return events.withWatermark("ts", watermark).dropDuplicates([*keys])


def cdc_apply_stream(
    updates: DataFrame,
    snapshot_dir: str,
    keys: tuple[str, ...],
    order_col: str,
    table_format: str = "auto",
    tiebreak_cols: tuple[str, ...] = (),
    op_col: str | None = None,
    delete_op: str = "D",
) -> "object":
    """Streaming CDC apply: each micro-batch is reduced to its latest
    row per key (``order_col`` descending, then ``tiebreak_cols``)
    and applied to the target table through the lakehouse
    table-format seam (sources.lakehouse.resolve_format,
    ``apply_cdc``) — the foreachBatch escape hatch that gives any
    lake Delta-style upsert/delete semantics.

    Ordering-safe since round 5: a change replaces the snapshot row
    only when NEWER by ``(order_col, *tiebreak_cols)`` — so the final
    state is a pure function of the change SET, independent of how
    the file source splits it into micro-batches or replays it,
    which is what makes q90 SQL-oracle-able. With ``op_col``, rows
    whose op equals ``delete_op`` tombstone their key (only when at
    least as new as the snapshot row) — delete/update interleavings
    are value-checked against a batch twin in tests/test_streaming.
    Tombstone caveat (shared with Delta/Kafka-compaction designs):
    an applied delete removes the key outright, so an
    out-of-order UPDATE older than the delete but arriving in a
    LATER batch would re-insert it — batch-split independence with
    deletes holds when each delete is its key's final change (or
    arrives no earlier than the batch of the changes it supersedes);
    full generality needs retained tombstones, which the versioned
    snapshots make easy to add (keep the delete row with a flag).

    ``table_format="auto"`` uses a real ACID format (Delta MERGE)
    when its jars are on the classpath and degrades to immutable
    versioned parquet snapshots (``v000042/``) otherwise: each batch
    reads the latest version and writes the next, so readers never
    observe a half-written snapshot and the swap is atomic at
    directory granularity (object-store safe). State never lives in
    the stream — a restart resumes from the last committed version +
    source offsets.
    """
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as SF

    from data_lake_with_spark_spark.sources.lakehouse import resolve_format

    fmt = resolve_format(table_format, updates.sparkSession)
    order_cols = (order_col, *tiebreak_cols)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = Window.partitionBy(*keys).orderBy(
            *[SF.col(c).desc() for c in order_cols]
        )
        latest = (
            batch_df.withColumn("_rn", SF.row_number().over(w))
            .where(SF.col("_rn") == 1)
            .drop("_rn")
        )
        fmt.apply_cdc(
            batch_df.sparkSession,
            snapshot_dir,
            latest,
            keys,
            order_cols,
            version=batch_id,
            op_col=op_col,
            delete_op=delete_op,
        )

    return (
        updates.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(snapshot_dir, "_checkpoints"))
        .start()
    )


DOCUMENT_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, fmt: str = "json"
) -> DataFrame:
    """File-source document stream with a pinned schema."""
    return spark.readStream.schema(DOCUMENT_STREAM_SCHEMA).format(fmt).load(path)


def fuzzy_dedup_ingest(
    stream_docs: DataFrame,
    corpus_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 5,
    bands: int = 4,
    checkpoint_dir: str | None = None,
) -> "object":
    """Continuous corpus ingestion with MinHash-LSH fuzzy dedup: each
    micro-batch is deduped within itself (greedy min-id survivors,
    dedup.minhash_dedup) and then against everything already ACCEPTED
    — any LSH band collision with the accumulated band index drops
    the document. Novel documents append to ``corpus_dir``; their
    band keys append to ``index_dir``, so the index is exactly the
    banded fingerprint of the corpus and grows linearly
    (docs × bands rows, a few dozen bytes each).

    This is the streaming twin of the batch dedup family: the
    cross-corpus check is the same band-key equi-join LSH uses for
    candidate pairs, but as a semi-join against a static side — no
    pair expansion, no verify stage (band collision = drop, the
    standard ingestion-time policy; run the batch Jaccard verify
    offline when precision matters). At 100 TB the index side should
    be written bucketed on ``band_key`` (sinks.write_bucketed) or
    kept in a lakehouse table; file appends here are at-least-once
    under task retries — production points both sinks at the
    table-format seam (sources/lakehouse.py) for ACID appends.
    """
    import os

    from data_lake_with_spark_spark.operators.dedup import (
        minhash_bands,
        minhash_dedup,
        minhash_signatures,
    )

    rows_per_band = num_hashes // bands

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        survivors = minhash_dedup(
            batch_df,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            shingle_k=shingle_k,
            bands=bands,
        ).cache()
        try:
            bnd = minhash_bands(
                minhash_signatures(
                    survivors, id_col, text_col, num_hashes, shingle_k
                ),
                id_col,
                bands,
                rows_per_band,
            )
            # index presence probed through the Hadoop FileSystem API
            # (not os.listdir) so the ingest works against s3a://hdfs://
            # index locations, matching the lakehouse seam's contract
            from data_lake_with_spark_spark.sources.lakehouse import (
                _hadoop_fs,
            )

            fs, hpath = _hadoop_fs(spark, index_dir)
            if fs.exists(hpath) and any(
                s.getPath().getName().endswith(".parquet")
                for s in fs.listStatus(hpath)
            ):
                idx = spark.read.parquet(index_dir)
                dup_ids = (
                    bnd.join(idx, on=["band", "band_key"], how="left_semi")
                    .select(id_col)
                    .distinct()
                )
                novel = survivors.join(dup_ids, on=id_col, how="left_anti")
            else:
                novel = survivors
            novel = novel.cache()
            novel.write.mode("append").parquet(corpus_dir)
            bnd.join(
                novel.select(id_col), on=id_col, how="left_semi"
            ).write.mode("append").parquet(index_dir)
            novel.unpersist()
        finally:
            survivors.unpersist()

    return (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(corpus_dir, "_checkpoints"),
        )
        .start()
    )


def _epochs_since_compact(spark, root: str) -> int:
    """Maintenance-chain length for the streaming ingests' compaction
    gate: the number of epoch directories created AFTER the last
    APPLIED ``_compact``-labeled epoch, plus that compact base itself
    (it is an owner of the chain). Before any compaction this is
    simply the epoch count. Derived from epoch NAMES (zero-padded, so
    lexical order is creation order), which makes it restart-safe AND
    immune to deferred vacuum: retired-but-unvacuumed directories all
    sort before the compact that superseded them, so they never
    inflate the count (r11 ADVICE — a raw directory-count gate
    re-compacted every batch once ``vacuum_on_compact=False`` let
    them linger).

    "Applied" means AT-OR-BEFORE the current pointer (r12 ADVICE): a
    compact epoch written by a crashed run that never reached
    ``set_current`` sorts AFTER the pointer and must not reset the
    counter — anchoring on any ``*_compact`` name under-reported the
    live chain and deferred the next compaction a full cycle. Such an
    orphaned compact dir still counts as one chain member (it sits in
    the listing), which only errs toward compacting sooner. An upper
    bound on the true manifest-owner chain (a merge that happens to
    rewrite every partition shortens the real chain but not this
    count) — the right direction for a cadence bound."""
    from data_lake_with_spark_spark.sources import cow

    names = cow.list_epochs(spark, root)
    try:
        cur_name = cow.get_current(spark, root).rstrip("/").split("/")[-1]
    except FileNotFoundError:
        cur_name = None
    last = -1
    for i, n in enumerate(names):
        if n.endswith("_compact") and (cur_name is None or n <= cur_name):
            last = i
    after = len(names) - last - 1
    return after if last < 0 else after + 1


def _emit_batch_stats(root: str, stats_dir: str, batch_id: int, report) -> None:
    """Append one health row per COMMITTED micro-batch to
    ``stats_dir`` (parquet, schema = the family's health report plus
    ``batch_id``/``epoch``) — the r13 verdict #5 stats sink: drift is
    observed DURING maintenance instead of by a separate probe. Runs
    AFTER set_current, so every row describes a published epoch; the
    report legs are the same bounded column-pruned scans the
    standalone reports pay (the quantized families emit their
    occupancy/utilization legs — the ingest holds no corpus handle,
    so the sampled-error leg stays NULL; run the full report
    out-of-band when the error axis is needed)."""
    from data_lake_with_spark_spark.sources import cow

    spark = report.sparkSession
    (
        report.withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        .withColumn("epoch", F.lit(cow.get_current(spark, root)))
        .coalesce(1)
        .write.mode("append")
        .parquet(stats_dir)
    )


def index_maintenance_ingest(
    stream_docs: DataFrame,
    root: str,
    n_buckets: int | None = None,
    checkpoint_dir: str | None = None,
    compact_every: int | None = None,
    vacuum_on_compact: bool = True,
    stats_dir: str | None = None,
) -> "object":
    """Continuous SERVING-INDEX maintenance — the streaming half of
    the index lifecycle (``sources/cow.py``): each document
    micro-batch becomes one manifest epoch of the BM25 index under a
    stable root. The first batch builds epoch 0; every later batch
    manifest-MERGES against ``cow.get_current`` (writing only its
    changed ``tok_bucket=`` partitions plus a small JSON) and
    ``cow.set_current`` re-points the pointer LAST — so a serving
    fleet resolving ``get_current`` mid-stream always reads a
    complete epoch, and the index trails the stream by at most one
    trigger.

    Delivery semantics: foreachBatch is at-least-once under task
    retries, and that is SAFE here because ``merge_bm25_index`` is an
    UPSERT — a replayed batch re-merges the same doc ids onto
    themselves and the resolved view is unchanged; the only residue
    is an extra epoch directory.

    ``compact_every=N`` makes the stream SELF-BOUNDING: whenever the
    maintenance-chain length (epochs since the last compaction plus
    the compact base — :func:`_epochs_since_compact`, an upper bound
    on the manifest-owner chain a read spans; NOT the raw directory
    count, which deferred vacuum would leave permanently ≥ N)
    reaches N, the trigger compacts the manifest
    chain into a fresh plain epoch, re-points the pointer, and
    ``cow.vacuum_index`` retires every epoch the compacted view no
    longer references — read amplification is bounded at N owners
    and disk at ~2× the index (the MEASUREMENTS_r10 §1c cadence
    arithmetic, executed in-stream instead of left as an operator
    chore). None leaves compaction out-of-band.

    QUIESCE CAVEAT: the in-stream vacuum has no reader-quiesce
    window — ``vacuum_on_compact=True`` (the default) is correct for
    the drain-and-stop ``availableNow`` shape this function starts
    (no concurrent readers while the stream runs) and for fleets
    that re-resolve ``get_current`` between requests; a CONTINUOUS
    deployment with long-running readers of older epochs should pass
    ``vacuum_on_compact=False`` and vacuum out-of-band after
    quiesce, per ``cow.vacuum_index``'s retire-after-quiesce
    discipline — compaction still bounds READ amplification either
    way, deferral only postpones the disk reclaim.

    ``n_buckets`` sizes the FIRST build only (later merges inherit
    the layout); None takes the builder default. Returns the started
    streaming query (``availableNow`` trigger — drain-and-stop)."""
    import os
    import tempfile

    from data_lake_with_spark_spark.operators import text as _text
    from data_lake_with_spark_spark.sources import cow

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # the stream delivers only (doc_id, text) to the index
        batch = batch_df.select("doc_id", "text").localCheckpoint()
        epoch = cow.new_epoch_path(spark, root, label=f"b{batch_id}")
        try:
            cur = cow.get_current(spark, root)
        except FileNotFoundError:
            kw = {} if n_buckets is None else {"n_buckets": n_buckets}
            _text.build_bm25_index(batch, epoch, **kw)
            cur = None
        else:
            _text.merge_bm25_index(spark, cur, batch, epoch, layout="manifest")
        # CAS commit: the epoch was derived FROM `cur`, so the commit
        # asserts the pointer hasn't moved since (an out-of-band
        # maintainer racing the stream). On StalePointerError the
        # batch fails fast; on restart foreachBatch re-delivers it and
        # this function re-resolves get_current — i.e. the replayed
        # batch merges against whatever the other maintainer published.
        cow.set_current(spark, root, epoch, expected=cur)
        # gate on the CHAIN LENGTH since the last compaction (epoch
        # names after the last `_compact` dir, plus that compact base)
        # — NOT the raw directory count: with vacuum_on_compact=False
        # the retired dirs linger, and a directory-count gate would
        # re-compact EVERY later batch (r11 ADVICE). The name-derived
        # count is restart-safe and resets to 1 per compaction
        # whether or not the reclaim is deferred.
        if (
            compact_every is not None
            and _epochs_since_compact(spark, root) >= compact_every
        ):
            flat = cow.new_epoch_path(spark, root, label="compact")
            base = cow.get_current(spark, root)
            _text.compact_bm25_index(spark, base, flat)
            cow.set_current(spark, root, flat, expected=base)
            if vacuum_on_compact:
                cow.vacuum_index(
                    spark, root, ["postings"], min_age_seconds=0.0
                )
        if stats_dir is not None:
            _emit_batch_stats(
                root, stats_dir, batch_id,
                _text.bm25_staleness_report(spark, root),
            )

    return (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir
            or os.path.join(tempfile.mkdtemp(prefix="idx_ingest_"), "cp"),
        )
        .start()
    )


def vector_index_maintenance_ingest(
    stream_vecs: DataFrame,
    root: str,
    centroid_mod: int,
    vec_dim: int | None = None,
    checkpoint_dir: str | None = None,
    compact_every: int | None = None,
    vacuum_on_compact: bool = True,
    stats_dir: str | None = None,
) -> "object":
    """The dense-side twin of :func:`index_maintenance_ingest`:
    continuous IVF serving-index maintenance from an EMBEDDING
    stream. Batch 0 bootstraps — it builds epoch 0 and, through the
    ``id % centroid_mod == 0`` stripe it contains, trains the coarse
    quantizer that every later epoch carries FROZEN (the
    merge_ivf_index contract: batches assign against the carried
    centroids; a batch that would REPLACE a centroid-source vector
    raises rather than letting the frozen quantizer silently go
    stale). This is the production bootstrap shape: the quantizer
    trains on the initial corpus load, and the stream that follows
    adds vectors, never re-trains — re-training is a rebuild, by
    design out-of-band (FAISS retrain ≙ build_ivf_index).

    ``centroid_mod`` applies to the BOOTSTRAP build; later batches
    enforce the stripe rule against the mod STAMPED in the index's
    own meta sidecar (``ivf_meta.json``), so a retrain that changes
    the budget re-keys the rule automatically (r13 — gated in
    test_ingest_stripe_rule_tracks_retrained_mod).

    IMPORTANT bootstrap contract: batch 0 must CONTAIN the centroid
    stripe of the eventual corpus (route the initial/bootstrap load
    to the first file; the stream after it must not carry NEW ids
    ``≡ 0 (mod centroid_mod)``). An empty-stripe bootstrap RAISES
    (it would train zero centroids and every later batch would
    silently assign into nothing); a PARTIAL stripe surfaces on the
    first later batch that carries the missing stripe id — the merge
    path RAISES on any new id ≡ 0 (mod centroid_mod), enforced HERE
    in the ingest (``merge_ivf_index`` cannot see it: its
    frozen-quantizer validation only checks batch ids against
    EXISTING cent_ids, so without this gate a fresh stripe id would
    merge silently and the streamed index would diverge from a
    from-scratch rebuild over the same corpus).

    Replay safety (at-least-once foreachBatch): ordinary ids
    re-merge onto themselves (upsert — the resolved view is
    unchanged). A REPLAYED BOOTSTRAP batch (crash between
    ``set_current`` and the checkpoint commit) re-delivers the
    centroid-stripe ids, which the frozen-quantizer validation would
    reject as replacements — so the merge path first splits out
    stripe ids whose vectors are BIT-IDENTICAL to the carried
    centroids (a replay) and drops them as no-ops; a stripe id with
    a DIFFERENT vector is a genuine retrain attempt and raises.

    Each later micro-batch becomes one MANIFEST merge epoch (only
    its changed ``cent_id=`` partitions + a small JSON are written);
    ``cow.set_current`` re-points LAST, so readers mid-stream always
    resolve a complete epoch. ``compact_every=N`` bounds the chain
    in-stream exactly as in :func:`index_maintenance_ingest`,
    including ``vacuum_on_compact``'s quiesce caveat. Returns the
    started ``availableNow`` query."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators import similarity as _sim
    from data_lake_with_spark_spark.sources import cow

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.select("vec_id", "embedding").localCheckpoint()
        epoch = cow.new_epoch_path(spark, root, label=f"b{batch_id}")
        try:
            cur = cow.get_current(spark, root)
        except FileNotFoundError:
            stripe_empty = (
                batch.where(
                    (F.col("vec_id") % centroid_mod) == 0
                ).limit(1).count() == 0
            )
            if stripe_empty:
                raise ValueError(
                    "vector_index_maintenance_ingest: bootstrap batch "
                    "carries no vec_id % centroid_mod == 0 stripe — it "
                    "would train ZERO centroids and every later batch "
                    "would silently assign into nothing; route the "
                    "initial load (with its centroid stripe) to the "
                    "first micro-batch"
                )
            _sim.build_ivf_index(
                batch, epoch, centroid_mod=centroid_mod, vec_dim=vec_dim
            )
            cur = None
        else:
            # bootstrap-replay split: stripe ids bit-identical to the
            # carried centroids are replays (no-ops); different
            # vectors are genuine retrain attempts and must raise
            cents = cow.read_component(spark, cur, "centroids")
            stripe = batch.join(
                F.broadcast(cents),
                batch["vec_id"] == cents["cent_id"],
            )
            same = F.col("embedding").cast("array<double>").eqNullSafe(
                F.col("cent_v").cast("array<double>")
            )
            if stripe.where(~same).limit(1).count() > 0:
                raise ValueError(
                    "vector_index_maintenance_ingest: batch carries a "
                    "centroid-source id with a DIFFERENT vector — the "
                    "frozen quantizer would go stale; quiesce the "
                    "stream and retrain_ivf_index the root"
                )
            replay_ids = stripe.select("vec_id")
            fresh = batch.join(replay_ids, "vec_id", "left_anti")
            if fresh.limit(1).count() == 0:
                return  # pure bootstrap replay — nothing to merge
            # fresh-stripe enforcement (r11 ADVICE): merge_ivf_index
            # validates batch ids against EXISTING cent_ids only — a
            # NEW id ≡ 0 (mod centroid_mod) would merge silently as an
            # ordinary vector and the streamed index would diverge
            # from a from-scratch rebuild over the same corpus (whose
            # build WOULD train on that id). Only the ingest knows
            # centroid_mod, so the contract is enforced here.
            # the stripe rule must track the mod the INDEX was built
            # or RETRAINED with (stamped in ivf_meta.json), not this
            # ingest's constructor parameter — a retrain that changes
            # the budget would otherwise make this check guard the
            # wrong stripe (pre-meta layouts fall back to the param)
            meta = cow.read_json(spark, _sim._ivf_meta_uri(cur)) or {}
            eff_mod = meta.get("centroid_mod", centroid_mod)
            if (
                fresh.where((F.col("vec_id") % eff_mod) == 0)
                .limit(1)
                .count()
                > 0
            ):
                raise ValueError(
                    "vector_index_maintenance_ingest: batch carries a "
                    "NEW id ≡ 0 (mod centroid_mod) after bootstrap — "
                    "a from-scratch build over the same corpus would "
                    "train this id as a centroid, so merging it as an "
                    "ordinary vector silently diverges the streamed "
                    "index from the rebuild; route centroid-stripe "
                    "ids to the bootstrap batch, or quiesce the "
                    "stream and retrain_ivf_index the root"
                )
            _sim.merge_ivf_index(
                spark, cur, fresh, epoch, vec_dim=vec_dim,
                layout="manifest",
            )
        # CAS commit against the pointer this epoch derived from —
        # see index_maintenance_ingest for the race/restart semantics
        cow.set_current(spark, root, epoch, expected=cur)
        # chain-since-last-compact gate, not directory count — see
        # index_maintenance_ingest (r11 ADVICE: deferred vacuum must
        # not turn every later batch into a full compaction)
        if (
            compact_every is not None
            and _epochs_since_compact(spark, root) >= compact_every
        ):
            flat = cow.new_epoch_path(spark, root, label="compact")
            base = cow.get_current(spark, root)
            _sim.compact_ivf_index(spark, base, flat)
            cow.set_current(spark, root, flat, expected=base)
            if vacuum_on_compact:
                cow.vacuum_index(
                    spark, root, ["lists", "centroids"],
                    min_age_seconds=0.0,
                )
        if stats_dir is not None:
            _emit_batch_stats(
                root, stats_dir, batch_id,
                _sim.ivf_staleness_report(spark, root),
            )

    return (
        stream_vecs.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir
            or os.path.join(tempfile.mkdtemp(prefix="vidx_ingest_"), "cp"),
        )
        .start()
    )


def related_items_maintenance_ingest(
    stream_baskets: DataFrame,
    root: str,
    k: int = 5,
    min_count: int = 1,
    n_buckets: int | None = None,
    checkpoint_dir: str | None = None,
    compact_every: int | None = None,
    vacuum_on_compact: bool = True,
    stats_dir: str | None = None,
) -> "object":
    """Continuous maintenance of the related-items SERVING state from
    a (basket, item) stream — the co-occurrence twin of
    :func:`index_maintenance_ingest` (r11 verdict #7: the last
    serving table without a streaming maintenance shape). Batch 0
    builds the state (``graph.build_related_items_state``); every
    later micro-batch of NEW baskets manifest-merges
    (``merge_related_items_state``: pair/item supports sum into
    exactly the batch's hash buckets, top-k recomputes for affected
    items only) as one epoch under the lifecycle root;
    ``cow.set_current`` re-points LAST so serving fleets always
    resolve a complete state.

    Replay semantics (at-least-once foreachBatch) — DECIDED AS SKIP,
    not raise, and here is why the two ingests differ: the merge
    itself must RAISE on a re-delivered basket id (double-counting
    silently inflates supports, and the merge cannot tell a
    delivery-layer retry from a source bug). The INGEST however can:
    ``set_current`` is the state's commit point and runs before the
    checkpoint commit, so a crash between them re-delivers a batch
    whose baskets are either ALL in the ledger (applied — the retry
    shape) or NONE (never applied). An all-in batch is verified
    INCIDENCE-IDENTICAL against the ledger (same basket ids with
    different items is a source corruption → raise) and then skipped
    as a no-op; a PARTIAL overlap cannot be a retry, so it raises —
    basket ids must be unique across the stream's batches.

    ``compact_every`` bounds the manifest chain exactly as in
    :func:`index_maintenance_ingest` (the chain-since-last-compact
    gate, with ``vacuum_on_compact``'s quiesce caveat) via
    ``graph.compact_related_items_state``. Note the compaction
    rewrites the history-sized ledger whole — size the cadence
    accordingly. ``k``/``min_count``/``n_buckets`` apply to the FIRST
    build only (merges read them back from the meta sidecar).
    Returns the started ``availableNow`` query."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators import graph as _graph
    from data_lake_with_spark_spark.sources import cow

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = (
            batch_df.select("basket", "item").distinct().localCheckpoint()
        )
        epoch = cow.new_epoch_path(spark, root, label=f"b{batch_id}")
        try:
            cur = cow.get_current(spark, root)
        except FileNotFoundError:
            kw = {} if n_buckets is None else {"n_buckets": n_buckets}
            _graph.build_related_items_state(
                batch, epoch, k=k, min_count=min_count, **kw
            )
            cur = None
        else:
            meta = cow.read_json(spark, _graph._ri_meta_uri(cur))
            if meta is None:
                # surface the batch ops' clear error instead of an
                # AttributeError on None inside the format check
                raise FileNotFoundError(f"no ri_meta.json under {cur!r}")
            _graph._ri_check_format(meta, cur)
            nbk = meta["n_buckets"]
            ids = batch.select("basket").distinct()
            ch = sorted(
                r["b"]
                for r in ids.select(
                    _graph._ri_bucket(["basket"], nbk).alias("b")
                )
                .distinct()
                .collect()
            )
            bfilter = (
                F.col("basket_bucket").isin(ch) if ch else F.lit(False)
            )
            seen_rows = (
                _graph._ri_read(spark, cur, "baskets", meta)
                .where(bfilter)
                .join(ids, "basket", "left_semi")
                .select("basket", "item")
                .localCheckpoint()
            )
            n_seen = seen_rows.select("basket").distinct().count()
            if n_seen > 0:
                if n_seen < ids.count():
                    raise ValueError(
                        "related_items_maintenance_ingest: batch "
                        "overlaps the ledger PARTIALLY — a "
                        "delivery-layer retry re-delivers a whole "
                        "batch (the state commits atomically at "
                        "set_current), so partial overlap means the "
                        "source re-used basket ids across batches; "
                        "basket ids must be unique stream-wide"
                    )
                # full overlap = the crash-between-set_current-and-
                # checkpoint retry — verify the incidence is
                # IDENTICAL, then skip as a no-op
                if (
                    seen_rows.exceptAll(batch).limit(1).count() > 0
                    or batch.exceptAll(seen_rows).limit(1).count() > 0
                ):
                    raise ValueError(
                        "related_items_maintenance_ingest: replayed "
                        "batch carries the SAME basket ids with "
                        "DIFFERENT items than the ledger — not a "
                        "retry but a source corruption; rebuild from "
                        "the source history"
                    )
                return
            _graph.merge_related_items_state(
                spark, cur, batch, epoch, layout="manifest"
            )
        # CAS commit against the pointer this epoch derived from —
        # see index_maintenance_ingest for the race/restart semantics
        cow.set_current(spark, root, epoch, expected=cur)
        if (
            compact_every is not None
            and _epochs_since_compact(spark, root) >= compact_every
        ):
            flat = cow.new_epoch_path(spark, root, label="compact")
            base = cow.get_current(spark, root)
            _graph.compact_related_items_state(spark, base, flat)
            cow.set_current(spark, root, flat, expected=base)
            if vacuum_on_compact:
                cow.vacuum_index(
                    spark, root, ["pairs", "items", "baskets", "topk"],
                    min_age_seconds=0.0,
                )
        if stats_dir is not None:
            _emit_batch_stats(
                root, stats_dir, batch_id,
                _graph.related_items_health(spark, root),
            )

    return (
        stream_baskets.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir
            or os.path.join(tempfile.mkdtemp(prefix="ri_ingest_"), "cp"),
        )
        .start()
    )


def ivfpq_index_maintenance_ingest(
    stream_vecs: DataFrame,
    root: str,
    dim: int,
    m: int = 8,
    centroid_mod: int = 50,
    n_buckets: int | None = None,
    vec_dim: int | None = None,
    checkpoint_dir: str | None = None,
    compact_every: int | None = None,
    vacuum_on_compact: bool = True,
    stats_dir: str | None = None,
) -> "object":
    """Continuous maintenance of the PRODUCTION serving family — the
    IVFPQ composite index (r12 verdict #3: BM25, IVF, and the
    related-items state had streaming twins; IVFPQ, the
    pruning×compression layout actually deployed at 100 TB, could
    only be maintained by batch ``merge_ivfpq_index`` calls). Batch 0
    bootstraps: it builds epoch 0 and, through the TWO seed stripes
    it must contain, trains BOTH frozen quantizers — the coarse
    centroids (``vec_id % centroid_mod == 0``) and the residual
    codebooks (the OFFSET stripe ``== 1``) — the q205 bootstrap
    contract extended to the doubly-frozen composite (frozen
    codebooks are exactly what make later merges cheap: each batch
    only assigns + encodes itself). An empty EITHER stripe raises
    inside ``build_ivfpq_index``'s pre-write validation, so a bad
    bootstrap leaves no partial index. Every later micro-batch
    becomes one manifest epoch (only its changed ``id_bucket=``
    partitions plus a small JSON) and the pointer re-points LAST.

    Replay safety (at-least-once foreachBatch): ordinary ids re-merge
    onto themselves (upsert — resolved view unchanged). A REPLAYED
    BOOTSTRAP batch (crash between ``set_current`` and the checkpoint
    commit) re-delivers BOTH frozen-source stripes, which
    ``merge_ivfpq_index`` would reject as replacements — so the merge
    path first verifies and drops them as no-ops: a centroid-source
    id whose vector is BIT-IDENTICAL to the carried centroid is a
    replay; a codebook-source id whose residual sub-vectors —
    recomputed through the builder's own assign+slice kernel against
    the CARRIED centroids — are bit-identical to the carried codebook
    entries is a replay. Either frozen-source id arriving with
    DIFFERENT bytes is a genuine retrain attempt and raises (quiesce
    the stream and ``retrain_ivfpq_index`` — the lifecycle-safe
    recovery).

    Fresh-stripe enforcement, BOTH stripes (the r11 IVF rule,
    doubled), keyed to the mod STAMPED in the index meta — so a
    retrain that changes the budget re-keys the rule automatically;
    ``centroid_mod`` itself applies to the bootstrap build only:
    after bootstrap a NEW id ≡ 0 OR ≡ 1 (mod the stamped mod)
    raises — a from-scratch rebuild over the same corpus would train
    that id into a quantizer, so merging it as an ordinary vector
    silently diverges the streamed index from the rebuild. Only the
    ingest knows ``centroid_mod``, so the contract lives here.

    Pointer commits are CAS (``cow.set_current(..., expected=...)``):
    a retrain or any out-of-band maintainer re-pointing the root
    mid-batch makes the commit raise ``cow.StalePointerError`` — the
    batch fails fast instead of orphaning the other maintainer's
    applied epoch; on restart foreachBatch re-delivers the batch and
    this function re-resolves ``get_current``, merging against the
    retrained quantizers (the decided retrain-under-ingest semantics,
    gated in tests/test_streaming.py).

    ``compact_every`` bounds the manifest chain exactly as in
    :func:`index_maintenance_ingest` (chain-since-last-APPLIED-compact
    gate, ``vacuum_on_compact`` quiesce caveat) via
    ``compact_ivfpq_index``. ``n_buckets`` sizes the FIRST build only.
    Returns the started ``availableNow`` query."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators import similarity as _sim
    from data_lake_with_spark_spark.sources import cow

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.select("vec_id", "embedding").localCheckpoint()
        epoch = cow.new_epoch_path(spark, root, label=f"b{batch_id}")
        try:
            cur = cow.get_current(spark, root)
        except FileNotFoundError:
            kw = {} if n_buckets is None else {"n_buckets": n_buckets}
            _sim.build_ivfpq_index(
                batch, epoch, dim=dim, m=m, centroid_mod=centroid_mod,
                vec_dim=vec_dim, **kw,
            )
            cur = None
        else:
            meta = cow.read_json(spark, _sim._ivfpq_meta_uri(cur))
            if meta is None:
                raise FileNotFoundError(f"no ivfpq_meta.json under {cur!r}")
            cents = cow.read_component(spark, cur, "centroids")
            cb = cow.read_component(spark, cur, "codebooks")
            # (1) centroid-source ids: bit-identical = bootstrap
            # replay (no-op); different bytes = retrain attempt
            stripe = batch.join(
                F.broadcast(cents), batch["vec_id"] == cents["cent_id"]
            )
            same_c = F.col("embedding").cast("array<double>").eqNullSafe(
                F.col("cent_v").cast("array<double>")
            )
            if stripe.where(~same_c).limit(1).count() > 0:
                raise ValueError(
                    "ivfpq_index_maintenance_ingest: batch carries a "
                    "centroid-source id with a DIFFERENT vector — the "
                    "frozen coarse quantizer would go stale; quiesce "
                    "the stream and retrain_ivfpq_index the root"
                )
            replay_ids = stripe.select("vec_id")
            # (2) codebook-source ids: recompute their residual
            # sub-vectors through the builder's own kernel against the
            # CARRIED centroids and require bit-identity with the
            # carried codebook entries — the codebook stores residual
            # SLICES, not raw vectors, so replay detection must
            # re-derive them (bounded: the codebook stripe is
            # broadcast-small by construction)
            cb_ids = cb.select(F.col("code").alias("vec_id")).distinct()
            cb_rows = batch.join(F.broadcast(cb_ids), "vec_id", "left_semi")
            if cb_rows.limit(1).count() > 0:
                w = meta["dim"] // meta["m"]
                asg = _sim._ivfpq_assign_resid(
                    cb_rows, cents, "vec_id", "embedding", vec_dim
                )
                slices = F.array(
                    *[
                        F.slice(F.col("rv"), s * w + 1, w)
                        for s in range(meta["m"])
                    ]
                )
                got = asg.select(
                    F.col("vec_id").cast("bigint").alias("code"),
                    F.posexplode(slices),
                ).select(
                    "code",
                    F.col("pos").cast("bigint").alias("subspace"),
                    F.col("col").alias("sub_v"),
                )
                mismatch = got.join(
                    F.broadcast(cb), ["subspace", "code"], "left"
                ).where(
                    F.col("cent_sub").isNull()
                    | ~F.col("sub_v").cast("array<double>").eqNullSafe(
                        F.col("cent_sub").cast("array<double>")
                    )
                )
                if mismatch.limit(1).count() > 0:
                    raise ValueError(
                        "ivfpq_index_maintenance_ingest: batch carries "
                        "a codebook-source id whose residual differs "
                        "from the carried codebook entry — the frozen "
                        "residual codebooks would go stale; quiesce "
                        "the stream and retrain_ivfpq_index the root"
                    )
                replay_ids = replay_ids.unionByName(
                    cb_rows.select("vec_id")
                )
            fresh = batch.join(
                replay_ids.distinct(), "vec_id", "left_anti"
            )
            if fresh.limit(1).count() == 0:
                return  # pure bootstrap replay — nothing to merge
            # stripe rule keyed to the INDEX's stamped mod (a retrain
            # may have changed the budget) — see the IVF twin
            eff_mod = meta.get("centroid_mod", centroid_mod)
            if (
                fresh.where(
                    (F.col("vec_id") % eff_mod == 0)
                    | (F.col("vec_id") % eff_mod == 1)
                )
                .limit(1)
                .count()
                > 0
            ):
                raise ValueError(
                    "ivfpq_index_maintenance_ingest: batch carries a "
                    "NEW id ≡ 0 or ≡ 1 (mod centroid_mod) after "
                    "bootstrap — a from-scratch build over the same "
                    "corpus would train this id into the coarse "
                    "centroids (≡0) or residual codebooks (≡1), so "
                    "merging it as an ordinary vector silently "
                    "diverges the streamed index from the rebuild; "
                    "route frozen-stripe ids to the bootstrap batch, "
                    "or quiesce the stream and retrain_ivfpq_index "
                    "the root"
                )
            _sim.merge_ivfpq_index(
                spark, cur, fresh, epoch, vec_dim=vec_dim,
                layout="manifest",
            )
        # CAS commit against the pointer this epoch derived from —
        # see index_maintenance_ingest for the race/restart semantics
        cow.set_current(spark, root, epoch, expected=cur)
        if (
            compact_every is not None
            and _epochs_since_compact(spark, root) >= compact_every
        ):
            flat = cow.new_epoch_path(spark, root, label="compact")
            base = cow.get_current(spark, root)
            _sim.compact_ivfpq_index(spark, base, flat)
            cow.set_current(spark, root, flat, expected=base)
            if vacuum_on_compact:
                cow.vacuum_index(
                    spark, root, ["codes", "codebooks", "centroids"],
                    min_age_seconds=0.0,
                )
        if stats_dir is not None:
            _emit_batch_stats(
                root, stats_dir, batch_id,
                _sim.index_staleness_report(spark, root),
            )

    return (
        stream_vecs.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir
            or os.path.join(tempfile.mkdtemp(prefix="pqidx_ingest_"), "cp"),
        )
        .start()
    )


def pq_index_maintenance_ingest(
    stream_vecs: DataFrame,
    root: str,
    dim: int,
    m: int = 8,
    centroid_mod: int = 50,
    n_buckets: int | None = None,
    checkpoint_dir: str | None = None,
    compact_every: int | None = None,
    vacuum_on_compact: bool = True,
    stats_dir: str | None = None,
) -> "object":
    """The plain-PQ member of the streaming index-maintenance family
    (r12 verdict #3 named BOTH composite and plain PQ): batch 0
    bootstraps — builds epoch 0 and, through the ``vec_id %
    centroid_mod == 0`` seed stripe it must contain, trains the
    frozen codebooks (PQ's ONE frozen quantizer; an empty stripe
    raises HERE, before any write — ``build_pq_index`` cannot see the
    contract); later batches encode against the carried codebooks and
    manifest-merge (changed ``id_bucket=`` partitions + a small
    JSON). Replay safety mirrors :func:`ivfpq_index_maintenance_ingest`
    minus the centering: a replayed bootstrap's codebook-source ids
    verify bit-identical by SLICING the raw vector (PQ codebooks store
    raw sub-vectors) against the carried entries and drop as no-ops;
    different bytes raise (retrain attempt →
    ``similarity.retrain_pq_index``). A NEW id ≡ 0 (mod the mod
    STAMPED in the index meta — retrains re-key the rule;
    ``centroid_mod`` applies to the bootstrap build only) after
    bootstrap raises (fresh-stripe rule — a rebuild would train on
    it). Pointer commits are CAS; ``compact_every`` chain-gated via
    ``compact_pq_index``. Returns the started ``availableNow``
    query."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators import similarity as _sim
    from data_lake_with_spark_spark.sources import cow

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.select("vec_id", "embedding").localCheckpoint()
        epoch = cow.new_epoch_path(spark, root, label=f"b{batch_id}")
        try:
            cur = cow.get_current(spark, root)
        except FileNotFoundError:
            if (
                batch.where((F.col("vec_id") % centroid_mod) == 0)
                .limit(1)
                .count()
                == 0
            ):
                raise ValueError(
                    "pq_index_maintenance_ingest: bootstrap batch "
                    "carries no vec_id % centroid_mod == 0 stripe — "
                    "the codebooks would train EMPTY and the index "
                    "would silently serve zero results; route the "
                    "initial load (with its seed stripe) to the first "
                    "micro-batch"
                )
            kw = {} if n_buckets is None else {"n_buckets": n_buckets}
            _sim.build_pq_index(
                batch, epoch, dim=dim, m=m, centroid_mod=centroid_mod,
                **kw,
            )
            cur = None
        else:
            cb = cow.read_component(spark, cur, "codebooks")
            meta = cow.read_json(spark, _sim._pq_meta_uri(cur))
            if meta is None:
                raise FileNotFoundError(f"no pq_meta.json under {cur!r}")
            cb_ids = cb.select(F.col("code").alias("vec_id")).distinct()
            cb_rows = batch.join(F.broadcast(cb_ids), "vec_id", "left_semi")
            replay_ids = cb_rows.select("vec_id").limit(0)
            if cb_rows.limit(1).count() > 0:
                # codebook-source ids: slice the raw vector through
                # the builder's kernel and require bit-identity with
                # the carried entries (replay) — different bytes are
                # a retrain attempt
                w = meta["dim"] // meta["m"]
                slices = F.array(
                    *[
                        F.slice(
                            F.col("embedding").cast("array<double>"),
                            s * w + 1,
                            w,
                        )
                        for s in range(meta["m"])
                    ]
                )
                got = cb_rows.select(
                    F.col("vec_id").cast("bigint").alias("code"),
                    F.posexplode(slices),
                ).select(
                    "code",
                    F.col("pos").cast("bigint").alias("subspace"),
                    F.col("col").alias("sub_v"),
                )
                mismatch = got.join(
                    F.broadcast(cb), ["subspace", "code"], "left"
                ).where(
                    F.col("cent_sub").isNull()
                    | ~F.col("sub_v").eqNullSafe(
                        F.col("cent_sub").cast("array<double>")
                    )
                )
                if mismatch.limit(1).count() > 0:
                    raise ValueError(
                        "pq_index_maintenance_ingest: batch carries a "
                        "codebook-source id with DIFFERENT bytes — "
                        "the frozen codebooks would go stale; quiesce "
                        "the stream and retrain_pq_index the root"
                    )
                replay_ids = cb_rows.select("vec_id")
            fresh = batch.join(replay_ids, "vec_id", "left_anti")
            if fresh.limit(1).count() == 0:
                return  # pure bootstrap replay — nothing to merge
            # stripe rule keyed to the INDEX's stamped mod — see the
            # IVF twin (a retrain may have changed the budget)
            eff_mod = meta.get("centroid_mod", centroid_mod)
            if (
                fresh.where((F.col("vec_id") % eff_mod) == 0)
                .limit(1)
                .count()
                > 0
            ):
                raise ValueError(
                    "pq_index_maintenance_ingest: batch carries a NEW "
                    "id ≡ 0 (mod centroid_mod) after bootstrap — a "
                    "from-scratch build over the same corpus would "
                    "train this id into the codebooks, so merging it "
                    "as an ordinary vector silently diverges the "
                    "streamed index from the rebuild; route seed-"
                    "stripe ids to the bootstrap batch, or quiesce "
                    "the stream and retrain_pq_index the root"
                )
            _sim.merge_pq_index(spark, cur, fresh, epoch, layout="manifest")
        # CAS commit against the pointer this epoch derived from —
        # see index_maintenance_ingest for the race/restart semantics
        cow.set_current(spark, root, epoch, expected=cur)
        if (
            compact_every is not None
            and _epochs_since_compact(spark, root) >= compact_every
        ):
            flat = cow.new_epoch_path(spark, root, label="compact")
            base = cow.get_current(spark, root)
            _sim.compact_pq_index(spark, base, flat)
            cow.set_current(spark, root, flat, expected=base)
            if vacuum_on_compact:
                cow.vacuum_index(
                    spark, root, ["codes", "codebooks"],
                    min_age_seconds=0.0,
                )
        if stats_dir is not None:
            _emit_batch_stats(
                root, stats_dir, batch_id,
                _sim.pq_staleness_report(spark, root),
            )

    return (
        stream_vecs.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir
            or os.path.join(tempfile.mkdtemp(prefix="pq_ingest_"), "cp"),
        )
        .start()
    )


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "update",
    checkpoint_dir: str | None = None,
) -> "object":
    """Drive a stream into an in-memory sink (test/debug harness).
    Pass ``checkpoint_dir`` to persist offsets + state across
    successive availableNow runs — required to exercise multi-batch
    semantics such as watermark late-data drops."""
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
