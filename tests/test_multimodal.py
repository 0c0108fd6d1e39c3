from __future__ import annotations

import hashlib

from data_lake_with_spark_spark.operators import multimodal as M


def _assets(spark):
    rows = [
        (1, "image", "image/png", b"\x01\x02\x03\x04" * 8, 4, 8, None),
        (2, "image", "image/jpeg", b"\xff" * 100, 10, 10, None),
        (3, "video", "video/mp4", b"\x00\x01" * 64, None, None, 3.5),
        (4, "audio", "audio/wav", b"\x10\x20\x30", None, None, 1.0),
    ]
    return spark.createDataFrame(rows, M.ASSET_SCHEMA)


def test_extract_features_shapes_and_determinism(spark):
    feats = {r["asset_id"]: r for r in M.extract_features(_assets(spark)).collect()}
    assert set(feats) == {1, 2, 3, 4}
    assert feats[1]["n_bytes"] == 32
    assert feats[1]["payload_md5"] == hashlib.md5(b"\x01\x02\x03\x04" * 8).hexdigest()
    assert feats[2]["feat_mean"] == 255.0
    assert feats[2]["feat_std"] == 0.0


def test_resize_images_filters_and_reshapes(spark):
    out = M.resize_images(_assets(spark), 4, 4).collect()
    assert {r["asset_id"] for r in out} == {1, 2}
    for r in out:
        assert len(r["payload"]) == 16
        assert r["meta_width"] == 4 and r["meta_height"] == 4


def test_sample_frames_fanout(spark):
    frames = M.sample_frames(_assets(spark), every_s=1.0).collect()
    # 3.5s video at 1 fps → 3 frames
    assert len(frames) == 3
    assert [f["frame_idx"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]
    assert all(f["asset_id"] == 3 for f in frames)
