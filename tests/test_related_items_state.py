"""Incremental related-items serving state: delta-updating the
pair/item aggregates and rewriting ONLY affected items' top-k must be
bit-identical to a from-scratch related_items over the full basket
history (r10 verdict item #4 — the last registered serving table still
rebuilt from scratch)."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_spark.operators import graph
from data_lake_with_spark_spark.sources import cow


def _mk_baskets(rnd, basket_ids, items, lo=2, hi=5):
    rows = []
    for bid in basket_ids:
        size = rnd.randint(lo, hi)
        for it in rnd.sample(items, size):
            rows.append((bid, it))
    return rows


def _topk_rows(df):
    return sorted(
        (r["item"], r["rank"], r["other"], r["n_ab"], r["score"])
        for r in df.collect()
    )


@pytest.mark.parametrize("layout", ["links", "manifest"])
def test_merge_equals_rebuild_over_full_history(spark, tmp_path, layout):
    rnd = random.Random(77)
    items = list(range(100, 160))
    hist = _mk_baskets(rnd, range(300), items)
    # a NARROW batch (4 baskets): its pair deltas hash into a small
    # bucket subset, so the CoW promotion has unchanged buckets to
    # link — the same written-∝-batch contract the index families
    # assert (a broad batch honestly touches ~every bucket)
    batch = _mk_baskets(rnd, range(300, 304), items)
    base_df = spark.createDataFrame(hist, ["basket", "item"])
    batch_df = spark.createDataFrame(batch, ["basket", "item"])
    full_df = base_df.unionByName(batch_df)
    base_p, out_p = str(tmp_path / "b"), str(tmp_path / "o")
    graph.build_related_items_state(
        base_df, base_p, k=5, min_count=2, n_buckets=64
    )
    stats = graph.merge_related_items_state(
        spark, base_p, batch_df, out_p, layout=layout
    )
    got = _topk_rows(graph.related_items_topk(spark, out_p))
    exp = _topk_rows(
        graph.related_items(full_df, k=5, min_count=2)
    )
    assert got == exp and len(got) > 0
    # the build itself equals the query too
    assert _topk_rows(graph.related_items_topk(spark, base_p)) == _topk_rows(
        graph.related_items(base_df, k=5, min_count=2)
    )
    assert stats["affected_items"] >= 1
    if layout == "links":
        assert stats["linked_files"] > 0
    else:
        assert stats["linked_bytes"] == 0 and stats["copied_files"] == 0
        # epoch dirs hold ONLY the changed pair buckets
        e_dirs = {
            n.split("=")[1]
            for n in os.listdir(f"{out_p}/pairs")
            if n.startswith("pair_bucket=")
        }
        assert e_dirs == set(stats["changed_partitions"])


def test_replayed_basket_rejected_and_floor_crossing(spark, tmp_path):
    """A re-delivered basket id raises (double-count guard), and a
    pair whose support crosses min_count only WITH the batch appears
    in the merged top-k exactly as a rebuild would have it — the
    state stores unfloored supports."""
    base_rows = [(1, "a"), (1, "b"), (2, "a"), (2, "c"), (3, "b"), (3, "c")]
    batch_rows = [(4, "a"), (4, "b"), (5, "a"), (5, "c")]
    base_df = spark.createDataFrame(base_rows, ["basket", "item"])
    batch_df = spark.createDataFrame(batch_rows, ["basket", "item"])
    base_p, out_p = str(tmp_path / "b"), str(tmp_path / "o")
    graph.build_related_items_state(
        base_df, base_p, k=3, min_count=2, n_buckets=8
    )
    # (a,b) and (a,c) have support 1 in base (below floor) and 2 after
    assert _topk_rows(graph.related_items_topk(spark, base_p)) == []
    graph.merge_related_items_state(spark, base_p, batch_df, out_p)
    got = _topk_rows(graph.related_items_topk(spark, out_p))
    exp = _topk_rows(
        graph.related_items(
            base_df.unionByName(batch_df), k=3, min_count=2
        )
    )
    assert got == exp and len(got) > 0
    with pytest.raises(ValueError, match="re-delivers"):
        graph.merge_related_items_state(
            spark,
            base_p,
            spark.createDataFrame([(2, "z")], ["basket", "item"]),
            str(tmp_path / "x"),
        )


def test_randomized_merge_chain_equals_rebuild(spark, tmp_path):
    """Seeded random chain of manifest merge epochs vs a tracked
    history list: after every epoch the served top-k equals the
    from-scratch query (exercises carried/unaffected bucket rows,
    partner discovery, and floor crossings under arbitrary
    sequences)."""
    rnd = random.Random(404)
    items = list(range(50))
    hist = _mk_baskets(rnd, range(120), items)
    cur = str(tmp_path / "s0")
    graph.build_related_items_state(
        spark.createDataFrame(hist, ["basket", "item"]),
        cur, k=4, min_count=2, n_buckets=8,
    )
    next_bid = 1000
    for step in range(3):
        batch = _mk_baskets(rnd, range(next_bid, next_bid + 15), items)
        next_bid += 15
        out = str(tmp_path / f"s{step + 1}")
        graph.merge_related_items_state(
            spark,
            cur,
            spark.createDataFrame(batch, ["basket", "item"]),
            out,
            layout="manifest",
        )
        hist += batch
        cur = out
        got = _topk_rows(graph.related_items_topk(spark, cur))
        exp = _topk_rows(
            graph.related_items(
                spark.createDataFrame(hist, ["basket", "item"]),
                k=4,
                min_count=2,
            )
        )
        assert got == exp and len(got) > 0
