"""Epoch lifecycle for manifest-maintained indexes: one stable index
ROOT (``{root}/epochs/epoch_N`` + ``{root}/current.json``), maintenance
re-points the current pointer LAST, and ``cow.vacuum_index`` deletes
EXACTLY the epoch dirs the current epoch no longer references — the
_last_checkpoint + VACUUM pair every manifest-based table format needs
(r10 verdict item #1). Serving equality with a from-scratch rebuild is
asserted through the whole merge → merge → compact → vacuum chain."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_spark.operators import similarity, text
from data_lake_with_spark_spark.sources import cow


def _ivf_rows(spark, idx, queries, **kw):
    return sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos"])
        for r in similarity.ivf_topk_indexed(spark, idx, queries, **kw).collect()
    )


def test_pointer_guards(spark, tmp_path):
    root = str(tmp_path / "root")
    with pytest.raises(FileNotFoundError, match="current.json"):
        cow.get_current(spark, root)
    # the first epoch name is deterministic and zero-padded
    e0 = cow.new_epoch_path(spark, root)
    assert e0.endswith("/epochs/epoch_00000000")
    # an epoch outside {root}/epochs is rejected — vacuum could not
    # reason about its siblings
    with pytest.raises(ValueError, match="not under"):
        cow.set_current(spark, root, str(tmp_path / "elsewhere"))
    os.makedirs(e0)
    cow.set_current(spark, root, e0)
    assert cow.get_current(spark, root) == os.path.abspath(e0)
    # labels ride along; numbering continues past them
    e1 = cow.new_epoch_path(spark, root, label="merge")
    assert e1.endswith("/epochs/epoch_00000001_merge")
    os.makedirs(e1)
    assert cow.new_epoch_path(spark, root).endswith("epoch_00000002")


@pytest.mark.slow
def test_ivf_lifecycle_merge_merge_compact_vacuum_serve(spark, tmp_path):
    """The full operator sequence a serving fleet runs: build → merge
    → merge → compact → vacuum, with current.json re-pointed after
    each step. Vacuum removes EXACTLY the unreferenced epochs, and
    the served top-k stays bit-identical to a from-scratch rebuild
    over the final corpus at every stage."""
    rnd = random.Random(17)
    mk = lambda: [rnd.uniform(-1, 1) for _ in range(4)]  # noqa: E731
    state = {i: mk() for i in range(150)}
    batch1 = {(301 + i): mk() for i in range(4)}
    batch2 = {(401 + i): mk() for i in range(3)}
    root = str(tmp_path / "root")

    e0 = cow.new_epoch_path(spark, root)
    similarity.build_ivf_index(
        spark.createDataFrame(sorted(state.items()), ["vec_id", "embedding"]),
        e0,
        centroid_mod=10,
    )
    cow.set_current(spark, root, e0)

    e1 = cow.new_epoch_path(spark, root, label="merge")
    similarity.merge_ivf_index(
        spark,
        cow.get_current(spark, root),
        spark.createDataFrame(sorted(batch1.items()), ["vec_id", "embedding"]),
        e1,
        layout="manifest",
    )
    cow.set_current(spark, root, e1)
    state.update(batch1)

    # vacuum NOW is a no-op: e1's manifest still owns bytes in e0
    vac0 = cow.vacuum_index(spark, root, ["lists", "centroids"], min_age_seconds=0.0)
    assert vac0["removed"] == [] and vac0["freed_bytes"] == 0
    assert len(vac0["kept"]) == 2 and vac0["external_refs"] == []

    e2 = cow.new_epoch_path(spark, root, label="merge")
    similarity.merge_ivf_index(
        spark,
        cow.get_current(spark, root),
        spark.createDataFrame(sorted(batch2.items()), ["vec_id", "embedding"]),
        e2,
        layout="manifest",
    )
    cow.set_current(spark, root, e2)
    state.update(batch2)

    # an ABANDONED epoch: written but never promoted (a failed deploy)
    e_abandoned = cow.new_epoch_path(spark, root, label="abandoned")
    similarity.merge_ivf_index(
        spark,
        cow.get_current(spark, root),
        spark.createDataFrame([(999, mk())], ["vec_id", "embedding"]),
        e_abandoned,
        layout="manifest",
    )

    scratch = str(tmp_path / "scratch")
    similarity.build_ivf_index(
        spark.createDataFrame(sorted(state.items()), ["vec_id", "embedding"]),
        scratch,
        centroid_mod=10,
    )
    qs = spark.createDataFrame(
        sorted(state.items())[:5] + sorted(batch2.items())[:1],
        ["vec_id", "embedding"],
    )
    exp = _ivf_rows(spark, scratch, qs, k=5, nprobe=3)
    assert _ivf_rows(spark, cow.get_current(spark, root), qs, k=5, nprobe=3) == exp

    # vacuum with the chain live: keeps e0/e1/e2 (all referenced),
    # removes EXACTLY the abandoned epoch
    vac1 = cow.vacuum_index(spark, root, ["lists", "centroids"], min_age_seconds=0.0)
    assert vac1["removed"] == [os.path.basename(e_abandoned)]
    assert vac1["freed_bytes"] > 0
    assert not os.path.exists(e_abandoned)
    assert _ivf_rows(spark, cow.get_current(spark, root), qs, k=5, nprobe=3) == exp

    # compact → re-point → vacuum retires the whole chain
    e3 = cow.new_epoch_path(spark, root, label="compact")
    similarity.compact_ivf_index(spark, cow.get_current(spark, root), e3)
    cow.set_current(spark, root, e3)
    vac2 = cow.vacuum_index(spark, root, ["lists", "centroids"], min_age_seconds=0.0)
    assert vac2["removed"] == [
        os.path.basename(p) for p in (e0, e1, e2)
    ]
    assert cow.list_epochs(spark, root) == [os.path.basename(e3)]
    assert _ivf_rows(spark, cow.get_current(spark, root), qs, k=5, nprobe=3) == exp


def test_vacuum_leaves_external_links_base_alone(spark, tmp_path):
    """A manifest chain whose base index lives OUTSIDE the root (the
    first migration step an existing deployment takes): vacuum keeps
    every in-root epoch the manifest references, reports the external
    base under external_refs, and never touches it."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 13:02d} w{(i * 5) % 13:02d}") for i in range(120)],
        ["doc_id", "text"],
    )
    outside_base = str(tmp_path / "legacy_index")
    text.build_bm25_index(docs, outside_base, n_buckets=8)
    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    text.delete_from_bm25_index(
        spark,
        outside_base,
        spark.createDataFrame([(7,)], ["doc_id"]),
        e0,
        layout="manifest",
    )
    cow.set_current(spark, root, e0)
    vac = cow.vacuum_index(spark, root, ["postings"], min_age_seconds=0.0)
    assert vac["removed"] == []
    assert vac["external_refs"] == [os.path.abspath(f"{outside_base}/postings")]
    assert os.path.isdir(outside_base)
    qs = spark.createDataFrame([(1, "w02 w07")], ["query_id", "text"])
    assert (
        text.bm25_topk_indexed(spark, cow.get_current(spark, root), qs, k=3).count()
        > 0
    )


def test_set_current_cas_guards(spark, tmp_path):
    """Optimistic-concurrency on the lifecycle pointer (r12 verdict
    #1): two maintainers racing one root — the loser RAISES instead
    of silently orphaning the winner's applied epoch (which a later
    vacuum_index would then physically delete: a lost update that can
    destroy an applied merge or an applied GDPR erasure)."""
    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    os.makedirs(e0)
    # first build: expected=None asserts a fresh root
    cow.set_current(spark, root, e0, expected=None)
    # a second "first build" racing the same root raises
    e_dup = cow.new_epoch_path(spark, root, label="dup")
    os.makedirs(e_dup)
    with pytest.raises(cow.StalePointerError, match="first build"):
        cow.set_current(spark, root, e_dup, expected=None)
    # two maintainers both derive from e0 (a streaming ingest and an
    # out-of-band retrain, say)
    cur_a = cow.get_current(spark, root)
    cur_b = cow.get_current(spark, root)
    e1 = cow.new_epoch_path(spark, root, label="a")
    os.makedirs(e1)
    e2 = cow.new_epoch_path(spark, root, label="b")
    os.makedirs(e2)
    # A commits first — its CAS passes
    cow.set_current(spark, root, e1, expected=cur_a)
    # B's CAS fails: the pointer moved since it resolved e0. Nothing
    # is written — A's applied epoch stays current (no lost update),
    # and B's epoch remains an EXPLICIT un-applied directory B can
    # re-derive from, instead of a silently orphaned applied one.
    with pytest.raises(cow.StalePointerError, match="moved"):
        cow.set_current(spark, root, e2, expected=cur_b)
    assert cow.get_current(spark, root) == os.path.abspath(e1)
    # omitting expected keeps last-writer-wins (single-writer
    # deployments, tests) — the pre-CAS behavior, unchanged
    cow.set_current(spark, root, e2)
    assert cow.get_current(spark, root) == os.path.abspath(e2)


def test_lifecycle_report(spark, tmp_path):
    """cow.lifecycle_report: the metadata-only status row — live set =
    read amplification, retired (unvacuumed) epochs with reclaimable
    bytes, external owners reported. Cross-checked against vacuum:
    what the report calls retired is exactly what vacuum removes."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 13:02d} w{(i * 5) % 13:02d}") for i in range(120)],
        ["doc_id", "text"],
    )
    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    text.build_bm25_index(docs, e0, n_buckets=8)
    cow.set_current(spark, root, e0, expected=None)
    e1 = cow.new_epoch_path(spark, root, label="merge")
    text.merge_bm25_index(
        spark,
        e0,
        spark.createDataFrame([(900, "w01 w02")], ["doc_id", "text"]),
        e1,
        layout="manifest",
    )
    cow.set_current(spark, root, e1, expected=e0)
    rep = cow.lifecycle_report(spark, root, ["postings"])
    assert rep["current"] == os.path.abspath(e1)
    assert rep["n_epochs"] == 2 and rep["read_amplification"] == 2
    assert rep["retired"] == [] and rep["retired_bytes"] == 0
    # compact: the chain retires but stays on disk until vacuum
    e2 = cow.new_epoch_path(spark, root, label="compact")
    text.compact_bm25_index(spark, cow.get_current(spark, root), e2)
    cow.set_current(spark, root, e2, expected=e1)
    rep2 = cow.lifecycle_report(spark, root, ["postings"])
    assert rep2["read_amplification"] == 1
    assert sorted(rep2["retired"]) == [
        os.path.basename(e0), os.path.basename(e1)
    ]
    assert rep2["retired_bytes"] > 0
    # vacuum removes exactly what the report called retired
    vac = cow.vacuum_index(spark, root, ["postings"], min_age_seconds=0.0)
    assert sorted(vac["removed"]) == sorted(rep2["retired"])
    assert vac["freed_bytes"] == rep2["retired_bytes"]
    rep3 = cow.lifecycle_report(spark, root, ["postings"])
    assert rep3["retired"] == [] and rep3["n_epochs"] == 1


def test_cas_random_interleavings_never_lose_updates(spark, tmp_path):
    """Property: under ANY interleaving of two maintainers that each
    resolve → derive → CAS-commit (retrying from the new pointer on
    StalePointerError), every SUCCESSFUL commit observed the then-
    current pointer (no lost update: a commit never overwrote a
    pointer the committer hadn't seen), and the pointer history is
    exactly the sequence of successful commits."""
    rnd = random.Random(97)
    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    os.makedirs(e0)
    cow.set_current(spark, root, e0, expected=None)
    history = [cow.get_current(spark, root)]

    class Maintainer:
        def __init__(self, label):
            self.label = label
            self.derived_from = None
            self.pending = None

        def step(self):
            if self.pending is None:
                # resolve + derive a new epoch from the current state
                self.derived_from = cow.get_current(spark, root)
                self.pending = cow.new_epoch_path(spark, root, self.label)
                os.makedirs(self.pending)
            else:
                try:
                    cow.set_current(
                        spark, root, self.pending,
                        expected=self.derived_from,
                    )
                except cow.StalePointerError:
                    # the pointer moved underneath us: the commit
                    # wrote NOTHING — re-derive against the new state
                    assert cow.get_current(spark, root) != os.path.abspath(
                        self.pending
                    )
                    self.pending = None
                    return
                # success: we must have observed the pointer we
                # replaced (the no-lost-update invariant)
                assert history[-1] == self.derived_from
                history.append(cow.get_current(spark, root))
                assert history[-1] == os.path.abspath(self.pending)
                self.pending = None

    a, b = Maintainer("a"), Maintainer("b")
    for _ in range(60):
        (a if rnd.random() < 0.5 else b).step()
    assert len(history) > 5  # the dance actually made progress
    assert len(set(history)) == len(history)  # no pointer revisits


def test_vacuum_retention_window_protects_inflight_epoch(spark, tmp_path):
    """r13 verdict #1 — the vacuum-vs-in-flight-maintainer race: a
    maintainer that has WRITTEN its epoch but not yet CAS-committed is
    invisible to live_epochs, so an unguarded concurrent vacuum
    deletes that epoch and the maintainer's set_current then SUCCEEDS
    (the pointer never moved → the CAS passes), leaving current.json
    pointing at a deleted directory. Two independent guards close it:

    1. the retention window — vacuum never deletes an epoch younger
       than ``min_age_seconds`` (reported under ``kept_recent``);
    2. the existence check — set_current raises StalePointerError when
       the target epoch directory is gone (forced vacuum case).

    Either way: never a current.json pointing at a deleted epoch."""
    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    os.makedirs(e0)
    with open(f"{e0}/data.bin", "wb") as f:
        f.write(b"x" * 64)
    cow.set_current(spark, root, e0, expected=None)

    # maintainer writes its epoch but has NOT committed yet
    pending = cow.new_epoch_path(spark, root, label="inflight")
    os.makedirs(pending)
    with open(f"{pending}/data.bin", "wb") as f:
        f.write(b"y" * 64)

    # (1) windowed vacuum: the in-flight epoch survives, reported
    vac = cow.vacuum_index(spark, root, [])
    assert vac["removed"] == []
    assert vac["kept_recent"] == [os.path.basename(pending)]
    assert os.path.isdir(pending)
    # the maintainer's commit then lands normally
    cow.set_current(spark, root, pending, expected=e0)
    assert cow.get_current(spark, root) == os.path.abspath(pending)

    # (2) forced vacuum (min_age 0, e.g. a mis-run GDPR job): a second
    # in-flight epoch is deleted — but the commit RAISES instead of
    # corrupting the root
    pending2 = cow.new_epoch_path(spark, root, label="inflight2")
    os.makedirs(pending2)
    with open(f"{pending2}/data.bin", "wb") as f:
        f.write(b"z" * 64)
    vac2 = cow.vacuum_index(spark, root, [], min_age_seconds=0.0)
    assert os.path.basename(pending2) in vac2["removed"]
    assert vac2["kept_recent"] == []
    with pytest.raises(cow.StalePointerError, match="no longer exists"):
        cow.set_current(spark, root, pending2, expected=pending)
    # the pointer still resolves to a COMPLETE epoch
    assert cow.get_current(spark, root) == os.path.abspath(pending)
    assert os.path.isdir(cow.get_current(spark, root))


def test_vacuum_retention_window_ages_out(spark, tmp_path):
    """An unreferenced epoch OLDER than the window is reclaimed by a
    windowed vacuum (the guard defers deletion, it doesn't leak
    epochs forever) — aged via a backdated dir mtime, the signal the
    window keys on. Long-running readers get the same window: a
    reader mid-scan on a just-retired epoch keeps its files until the
    window elapses (same mechanism, documented here)."""
    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    os.makedirs(e0)
    cow.set_current(spark, root, e0, expected=None)
    retired = cow.new_epoch_path(spark, root, label="old")
    os.makedirs(retired)
    with open(f"{retired}/data.bin", "wb") as f:
        f.write(b"o" * 32)
    os.utime(retired, (1_000_000_000, 1_000_000_000))  # long past
    vac = cow.vacuum_index(spark, root, [])
    assert vac["removed"] == [os.path.basename(retired)]
    assert vac["kept_recent"] == []
    assert not os.path.isdir(retired)
    with pytest.raises(ValueError, match="min_age_seconds"):
        cow.vacuum_index(spark, root, [], min_age_seconds=-1.0)


def test_locked_pointer_store_hammer_no_double_pass(spark, tmp_path):
    """r13 verdict #2 — the PointerStore seam, proven with a real
    mutual exclusion: N threads hammer CAS commits against one root
    through LockedPointerStore (O_CREAT|O_EXCL around check+replace).
    With the plain FilePointerStore two racers can both pass the
    compare inside the check-then-rename window; under the lock that
    window is CLOSED, so the successful commits must form a single
    linear chain — every success's ``expected`` is the previous
    success's committed epoch, no two successes share an expected
    value (a shared expected IS the double-pass)."""
    import threading

    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    os.makedirs(e0)
    store = cow.LockedPointerStore(timeout_seconds=60.0)
    cow.set_current(spark, root, e0, expected=None, store=store)

    successes = []  # (expected_abs, committed_abs) — appended in commit order
    log_lock = threading.Lock()
    errors = []

    def maintainer(tid: int) -> None:
        try:
            for i in range(12):
                while True:
                    cur = cow.get_current(spark, root)
                    pend = f"{root}/epochs/epoch_t{tid}_{i:03d}"
                    os.makedirs(pend, exist_ok=True)
                    try:
                        cow.set_current(
                            spark, root, pend, expected=cur, store=store
                        )
                    except cow.StalePointerError:
                        continue  # lost the race: re-resolve and retry
                    with log_lock:
                        successes.append((os.path.abspath(cur),
                                          os.path.abspath(pend)))
                    break
        except Exception as exc:  # pragma: no cover - debugging aid
            errors.append(exc)

    threads = [threading.Thread(target=maintainer, args=(t,)) for t in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert len(successes) == 6 * 12
    # zero double-pass: all expected values distinct, all committed
    # values distinct, and they chain from e0 to the final pointer
    exps = [e for e, _ in successes]
    news = [n for _, n in successes]
    assert len(set(exps)) == len(exps), "two commits passed the same CAS"
    assert len(set(news)) == len(news)
    final = os.path.abspath(cow.get_current(spark, root))
    assert set(exps) == ({os.path.abspath(e0), *news} - {final})
    # the lock is released (no leaked .lock file)
    assert not os.path.exists(f"{root}/current.json.lock")


def test_pointer_reader_never_sees_absent_current(spark, tmp_path):
    """The reader-gap half of r13 verdict #2: while a maintainer loop
    commits pointer updates, a concurrent reader polling the pointer
    must NEVER observe it absent — locally the commit is one atomic
    os.replace (and the remote branch now renames with OVERWRITE
    instead of delete-then-rename, same contract on HDFS)."""
    import threading

    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    os.makedirs(e0)
    cow.set_current(spark, root, e0, expected=None)

    stop = threading.Event()
    gaps = []

    def reader() -> None:
        while not stop.is_set():
            try:
                cow.get_current(spark, root)
            except FileNotFoundError as exc:  # pragma: no cover
                gaps.append(exc)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for i in range(200):
            pend = f"{root}/epochs/epoch_r{i:04d}"
            os.makedirs(pend)
            cow.set_current(spark, root, pend)
    finally:
        stop.set()
        t.join()
    assert gaps == []


def test_locked_pointer_store_guards(spark, tmp_path):
    """LockedPointerStore contract edges: remote roots raise toward
    the conditional-put seam; a dead maintainer's stale lock is
    broken after the lease; an in-lease lock times out."""
    store = cow.LockedPointerStore(
        timeout_seconds=0.2, stale_lock_seconds=60.0
    )
    with pytest.raises(NotImplementedError, match="conditional-put"):
        store.commit(spark, "s3a://bucket/root", "s3a://bucket/root/epochs/e", None)
    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    os.makedirs(e0)
    # a held (fresh) lock blocks until timeout
    os.makedirs(root, exist_ok=True)
    lock = f"{root}/current.json.lock"
    open(lock, "w").close()
    with pytest.raises(TimeoutError, match="could not acquire"):
        cow.set_current(spark, root, e0, expected=None, store=store)
    # a STALE lock (dead maintainer) is broken after the lease
    os.utime(lock, (1_000_000_000, 1_000_000_000))
    cow.set_current(spark, root, e0, expected=None, store=store)
    assert cow.get_current(spark, root) == os.path.abspath(e0)
    assert not os.path.exists(lock)
    # set_pointer_store swaps the process default and returns the old
    prev = cow.set_pointer_store(store)
    try:
        assert cow._POINTER_STORE is store
    finally:
        cow.set_pointer_store(prev)
    assert cow._POINTER_STORE is prev


@pytest.mark.slow
def test_maintenance_plan_branches(spark, tmp_path):
    """r13 verdict #4: cow.maintenance_plan composes lifecycle_report
    + pinned-baseline drift into one decision row. Each branch trips
    independently on its own trigger; thresholds are arguments:
    ratio-rising (>= thr >= 1) and ratio-falling (<= thr < 1)
    directions both work; a zero-baseline metric (ratio None) never
    trips; naming a metric the report lacks raises."""
    import pytest

    from data_lake_with_spark_spark.operators import text
    from data_lake_with_spark_spark.operators.similarity import (
        write_staleness_baseline,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 9} w{i % 5} w{i % 7} common filler") for i in range(120)],
        ["doc_id", "text"],
    )
    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    text.build_bm25_index(docs.where(F.col("doc_id") < 60), e0, n_buckets=2)
    cow.set_current(spark, root, e0, expected=None)
    write_staleness_baseline(
        spark, root, text.bm25_staleness_report(spark, root)
    )

    def plan(**kw):
        base = dict(
            drift_thresholds={"avgdl_live": 1.05},
            max_read_amplification=4,
            min_retired_bytes=1,
        )
        base.update(kw)
        return cow.maintenance_plan(
            spark, root, ["postings"],
            text.bm25_staleness_report(spark, root), **base,
        ).collect()[0].asDict()

    # fresh root: nothing due
    p0 = plan()
    assert (p0["retrain_due"], p0["compact_due"], p0["vacuum_due"]) == (
        False, False, False,
    )
    assert p0["trigger_metric"] is None and p0["trigger_ratio"] is None
    assert p0["read_amplification"] == 1 and p0["n_retired"] == 0

    # compact branch alone: tighten the amplification threshold after
    # a manifest merge (narrow-vocab batch → one changed bucket →
    # chain length 2); drift stays under 1.05
    e1 = cow.new_epoch_path(spark, root, label="m")
    text.merge_bm25_index(
        spark, cow.get_current(spark, root),
        docs.where((F.col("doc_id") >= 60) & (F.col("doc_id") < 70))
        .select("doc_id", F.lit("zz zz zz zz zz").alias("text")),
        e1, layout="manifest",
    )
    cow.set_current(spark, root, e1, expected=e0)
    p1 = plan(max_read_amplification=1)
    assert p1["compact_due"] and p1["read_amplification"] == 2
    assert not p1["vacuum_due"]

    # vacuum branch: compact without vacuuming leaves retired bytes
    e2 = cow.new_epoch_path(spark, root, label="c")
    text.compact_bm25_index(spark, cow.get_current(spark, root), e2)
    cow.set_current(spark, root, e2, expected=e1)
    p2 = plan()
    assert p2["vacuum_due"] and p2["n_retired"] == 2
    assert not p2["compact_due"]
    # ...and min_retired_bytes is a real threshold
    assert not plan(min_retired_bytes=10**15)["vacuum_due"]

    # retrain branch, rising direction: long-doc upsert drifts avgdl
    e3 = cow.new_epoch_path(spark, root, label="m2")
    text.merge_bm25_index(
        spark, cow.get_current(spark, root),
        docs.where(F.col("doc_id") >= 70).select(
            "doc_id",
            F.concat_ws(" ", "text", "text", "text", "text").alias("text"),
        ),
        e3, layout="manifest",
    )
    cow.set_current(spark, root, e3, expected=e2)
    p3 = plan()
    assert p3["retrain_due"] and p3["trigger_metric"] == "avgdl_live"
    assert p3["trigger_ratio"] > 1.05
    # falling direction: n_docs GREW, so a <1 threshold must NOT trip
    # on it, and the first tripping metric in sorted order is named
    p4 = plan(drift_thresholds={"n_docs": 0.5, "avgdl_live": 1.05})
    assert p4["retrain_due"] and p4["trigger_metric"] == "avgdl_live"
    # falling threshold that DOES trip: head_postings can only grow
    # here, so use a >=1.0 "any change" threshold on n_docs instead
    p5 = plan(drift_thresholds={"n_docs": 1.0})
    assert p5["retrain_due"] and p5["trigger_metric"] == "n_docs"

    with pytest.raises(ValueError, match="absent from the report"):
        plan(drift_thresholds={"not_a_metric": 2.0})
    with pytest.raises(ValueError, match="max_read_amplification"):
        plan(max_read_amplification=0)


def test_maintenance_plan_without_baseline(spark, tmp_path):
    """Omitting current_report + drift_thresholds together skips the
    retrain leg (compact/vacuum-only deployments, or a root whose
    baseline isn't pinned yet); supplying only one of the pair raises
    — a half-configured alert must fail loudly, not silently skip."""
    import pytest

    from data_lake_with_spark_spark.operators import text

    docs = spark.createDataFrame(
        [(i, f"a{i % 5} b{i % 3} c common") for i in range(80)],
        ["doc_id", "text"],
    )
    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    text.build_bm25_index(docs, e0, n_buckets=1)
    cow.set_current(spark, root, e0, expected=None)
    p = cow.maintenance_plan(spark, root, ["postings"]).collect()[0].asDict()
    assert not p["retrain_due"] and p["trigger_metric"] is None
    assert p["read_amplification"] == 1 and not p["vacuum_due"]
    rep = text.bm25_staleness_report(spark, root)
    with pytest.raises(ValueError, match="together"):
        cow.maintenance_plan(spark, root, ["postings"], current_report=rep)
    with pytest.raises(ValueError, match="together"):
        cow.maintenance_plan(
            spark, root, ["postings"], drift_thresholds={"n_docs": 1.5}
        )


def test_maintenance_plan_is_family_agnostic(spark, tmp_path):
    """maintenance_plan claims any family's one-row report plugs in —
    prove it on a DENSE family (IVF, whose report is self-contained)
    with a FALLING-direction threshold: after a manifest DELETE of
    half the vectors, n_vecs drops below the 0.8 ratio floor and the
    plan names it; the lifecycle legs read the same root."""
    rnd = random.Random(23)
    emb = spark.createDataFrame(
        [(i, [rnd.uniform(-1, 1) for _ in range(4)]) for i in range(200)],
        ["vec_id", "embedding"],
    )
    root = str(tmp_path / "root")
    e0 = cow.new_epoch_path(spark, root)
    similarity.build_ivf_index(emb, e0, centroid_mod=20)
    cow.set_current(spark, root, e0, expected=None)
    rep0 = similarity.ivf_staleness_report(spark, root)
    similarity.write_staleness_baseline(spark, root, rep0)
    e1 = cow.new_epoch_path(spark, root, label="gdpr")
    similarity.delete_from_ivf_index(
        spark,
        cow.get_current(spark, root),
        emb.where(F.col("vec_id") % 2 == 0).select("vec_id"),
        e1,
        layout="manifest",
    )
    cow.set_current(spark, root, e1, expected=e0)
    p = cow.maintenance_plan(
        spark,
        root,
        ["lists", "centroids"],
        similarity.ivf_staleness_report(spark, root),
        drift_thresholds={"n_vecs": 0.8},
        max_read_amplification=4,
        min_retired_bytes=1,
    ).collect()[0].asDict()
    assert p["retrain_due"] and p["trigger_metric"] == "n_vecs"
    assert p["trigger_ratio"] is not None and p["trigger_ratio"] < 0.8
    assert p["read_amplification"] == 2 and not p["compact_due"]
    assert not p["vacuum_due"]  # the chain is fully live, no debt
