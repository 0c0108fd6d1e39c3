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


def _ppm(w, h, pixels):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(pixels)


def _bmp24(w, h, rows_rgb):
    """Minimal uncompressed 24-bit BMP: bottom-up rows, 4-byte padded."""
    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(rows_rgb):  # bottom-up storage
        line = b"".join(bytes([b, g, r]) for (r, g, b) in row)  # BGR on disk
        body += line.ljust(stride, b"\x00")
    off = 54
    header = (
        b"BM"
        + (off + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + body


def test_decode_image_real_ppm_and_bmp():
    import numpy as np

    ppm = _ppm(2, 2, [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    img = M.decode_image(ppm)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [10, 20, 30]
    assert img[1, 1].tolist() == [100, 110, 120]

    rows = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (9, 9, 9)]]
    bimg = M.decode_image(_bmp24(2, 2, rows))
    assert bimg.shape == (2, 2, 3)
    assert bimg[0, 0].tolist() == [255, 0, 0]  # top-left restored (RGB)
    assert bimg[1, 1].tolist() == [9, 9, 9]
    # round-trip through the PPM encoder
    assert np.array_equal(M.decode_image(M.encode_ppm(bimg)), bimg)
    # non-images stay on the stub path
    assert M.decode_image(b"\xff\xd8\xff JPEG-ish garbage....") is None


def test_extract_features_uses_real_pixels_for_ppm(spark):
    ppm = _ppm(2, 2, [0, 0, 0, 0, 0, 0, 255, 255, 255, 255, 255, 255])
    rows = [(9, "image", "image/x-portable-pixmap", ppm, 2, 2, None)]
    feats = M.extract_features(
        spark.createDataFrame(rows, M.ASSET_SCHEMA)
    ).collect()[0]
    # pixel stats, not byte stats of the header+payload
    assert feats["feat_mean"] == 127.5
    assert feats["feat_std"] == 127.5


def test_resize_images_real_nearest_neighbor_for_ppm(spark):
    # 2x2 quadrant image upscaled to 4x4: each quadrant becomes 2x2
    ppm = _ppm(2, 2, [255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    rows = [(9, "image", "image/x-portable-pixmap", ppm, 2, 2, None)]
    out = M.resize_images(
        spark.createDataFrame(rows, M.ASSET_SCHEMA), 4, 4
    ).collect()[0]
    img = M.decode_image(out["payload"])
    assert img.shape == (4, 4, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 3].tolist() == [0, 255, 0]
    assert img[3, 0].tolist() == [0, 0, 255]
    assert img[3, 3].tolist() == [9, 9, 9]
    assert out["meta_width"] == 4 and out["meta_height"] == 4


def _wav16(samples, rate=8000):
    """Minimal mono 16-bit PCM WAV."""
    import numpy as np

    data = (np.asarray(samples, dtype=np.float64) * 32767).astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_decode_audio_real_pcm_wav():
    import numpy as np

    wav = _wav16([0.0, 0.5, -0.5, 1.0])
    out = M.decode_audio(wav)
    assert out is not None
    samples, rate = out
    assert rate == 8000
    assert np.allclose(samples, [0.0, 0.5, -0.5, 1.0], atol=1e-3)
    # non-WAV payloads return None (stub path)
    assert M.decode_audio(b"ID3\x03 mp3-ish garbage" + b"\x00" * 64) is None


def test_extract_features_uses_real_samples_for_wav(spark):
    wav = _wav16([0.5] * 100)
    rows = [(8, "audio", "audio/wav", wav, None, None, 0.0125)]
    feats = M.extract_features(
        spark.createDataFrame(rows, M.ASSET_SCHEMA)
    ).collect()[0]
    # sample stats in [-1, 1], not byte stats of the RIFF container
    assert abs(feats["feat_mean"] - 0.5) < 1e-3
    assert feats["feat_std"] < 1e-3


def test_sample_frames_fanout(spark):
    frames = M.sample_frames(_assets(spark), every_s=1.0).collect()
    # 3.5s video at 1 fps → 3 frames
    assert len(frames) == 3
    assert [f["frame_idx"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]
    assert all(f["asset_id"] == 3 for f in frames)


def _fwd_filter(flat, bpp, ftypes):
    """Spec-forward PNG filtering (PNG spec §9) — the test-side twin
    of multimodal._png_unfilter, covering Average/Paeth which the
    package encoder deliberately doesn't emit."""
    h, stride = flat.shape
    raw = bytearray()
    prev = [0] * stride
    for y in range(h):
        cur = flat[y].tolist()
        ft = ftypes[y % len(ftypes)]
        raw.append(ft)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                v = cur[x]
            elif ft == 1:
                v = cur[x] - a
            elif ft == 2:
                v = cur[x] - b
            elif ft == 3:
                v = cur[x] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = cur[x] - pred
            raw.append(v & 0xFF)
        prev = cur
    return bytes(raw)


def _png(w, h, color, channels, flat, ftypes, plte=None):
    import zlib

    def chunk(ct, body):
        return (
            len(body).to_bytes(4, "big")
            + ct
            + body
            + zlib.crc32(ct + body).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, color, 0, 0, 0])
    png = M._PNG_SIG + chunk(b"IHDR", ihdr)
    if plte is not None:
        png += chunk(b"PLTE", plte)
    raw = _fwd_filter(flat, channels, ftypes)
    return png + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_decode_png_round_trip_all_encoder_filters():
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    for ft in (0, 1, 2):
        out = M.decode_image(M.encode_png(img, filter_type=ft))
        assert out is not None and (out == img).all(), f"filter {ft}"


def test_decode_png_average_and_paeth_filters():
    import numpy as np

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    png = _png(9, 13, 2, 3, img.reshape(13, 27), [3, 4, 1, 2, 0])
    out = M.decode_image(png)
    assert out is not None and (out == img).all()


def test_decode_png_color_types_map_to_rgb():
    import numpy as np

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(5, 7, 1), dtype=np.uint8)
    out = M.decode_image(_png(7, 5, 0, 1, gray.reshape(5, 7), [4, 3]))
    assert (out == np.repeat(gray, 3, axis=2)).all()

    rgba = rng.integers(0, 256, size=(6, 4, 4), dtype=np.uint8)
    out = M.decode_image(_png(4, 6, 6, 4, rgba.reshape(6, 16), [4, 2, 3]))
    assert (out == rgba[:, :, :3]).all()

    ga = rng.integers(0, 256, size=(3, 8, 2), dtype=np.uint8)
    out = M.decode_image(_png(8, 3, 4, 2, ga.reshape(3, 16), [2, 4]))
    assert (out == np.repeat(ga[:, :, :1], 3, axis=2)).all()

    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(5, 5, 1), dtype=np.uint8)
    out = M.decode_image(
        _png(5, 5, 3, 1, idx.reshape(5, 5), [1, 0], plte=pal.tobytes())
    )
    assert (out == pal[idx[:, :, 0]]).all()


def test_decode_png_rejects_unsupported_gracefully():
    import numpy as np

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = M.encode_png(img)
    # 16-bit depth → None (byte at IHDR offset: depth)
    bad = bytearray(good)
    bad[len(M._PNG_SIG) + 8 + 8] = 16
    assert M.decode_image(bytes(bad)) is None
    # truncated IDAT → None, not an exception
    assert M.decode_image(good[: len(good) // 2]) is None


def test_extract_features_uses_real_pixels_for_png(spark):
    import numpy as np

    img = np.full((8, 8, 3), 200, dtype=np.uint8)
    png = M.encode_png(img, filter_type=1)
    rows = [(9, "image", "image/png", png, 8, 8, None)]
    feats = M.extract_features(
        spark.createDataFrame(rows, M.ASSET_SCHEMA)
    ).collect()[0]
    # pixel stats of the DECODED image (constant 200), not byte stats
    # of the compressed container
    assert feats["feat_mean"] == 200.0
    assert feats["feat_std"] == 0.0


def test_resize_images_real_nearest_neighbor_for_png(spark):
    import numpy as np

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    rows = [(10, "image", "image/png", M.encode_png(img, 2), 6, 10, None)]
    out = M.resize_images(
        spark.createDataFrame(rows, M.ASSET_SCHEMA), width=3, height=5
    ).collect()[0]
    resized = M.decode_image(out["payload"])  # re-encoded as PPM
    assert resized.shape == (5, 3, 3)
    yi = np.minimum((np.arange(5) * 10) // 5, 9)
    xi = np.minimum((np.arange(3) * 6) // 3, 5)
    assert (resized == img[yi][:, xi]).all()


def _psnr(a, b):
    import numpy as np

    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_jpeg_round_trip_all_modes():
    """Baseline JPEG is lossy — assert PSNR floors per mode on a
    smooth gradient (JPEG's design case), plus exactness on flat."""
    import numpy as np

    from data_lake_with_spark_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)
    for q, kw, floor in (
        (95, {}, 50.0),
        (85, {}, 45.0),
        (85, {"subsample": True}, 40.0),
        (30, {}, 33.0),
    ):
        dec = decode_jpeg(encode_jpeg(img, quality=q, **kw))
        assert dec is not None and dec.shape == img.shape
        p = _psnr(img, dec)
        assert p >= floor, f"q={q} {kw}: psnr {p:.1f} < {floor}"
    gray3 = np.repeat(
        (((yy + xx) * 4) % 256).astype(np.uint8)[:, :, None], 3, axis=2
    )
    dec = decode_jpeg(encode_jpeg(gray3, 90, grayscale=True))
    assert dec.shape == gray3.shape and _psnr(gray3, dec) >= 44.0
    flat = np.full((17, 23, 3), 123, np.uint8)
    assert _psnr(flat, decode_jpeg(encode_jpeg(flat, 90))) >= 90.0


def test_jpeg_restart_markers_round_trip():
    """RSTn handling (round-6 advisor, medium): a restart stream must
    decode BIT-IDENTICALLY to the unrestarted stream — restarts change
    the entropy coding (pad + marker + DC predictor reset), never the
    dequantized coefficients. Intervals of 1 (marker between every
    MCU — maximal pad/reset traffic), a non-divisor interval, and >8
    restarts (RSTn index wraps 0-7) are all exercised, in 4:4:4,
    4:2:0, and grayscale modes."""
    import numpy as np

    from data_lake_with_spark_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:41, 0:57]
    img = np.stack(
        [(yy * 5) % 256, (xx * 3) % 256, ((xx * yy) // 4) % 256], axis=2
    ).astype(np.uint8)
    noisy = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    for im in (img, noisy):
        for kw in ({}, {"subsample": True}, {"grayscale": True}):
            base = decode_jpeg(encode_jpeg(im, 85, **kw))
            assert base is not None
            for ri in (1, 3, 7):
                enc = encode_jpeg(im, 85, restart_interval=ri, **kw)
                assert b"\xff\xdd" in enc  # DRI segment present
                dec = decode_jpeg(enc)
                assert dec is not None, (kw, ri)
                assert np.array_equal(dec, base), (kw, ri)


def test_jpeg_bitreader_never_discards_premarker_bits():
    """The advisor's exact repro: with entropy bytes followed by an
    RST marker inside the prefetch window, the first bits read must
    come from the PRE-marker data (0xAA), not from after it (0x55) —
    _fill stops at markers instead of consuming them."""
    from data_lake_with_spark_spark.functions.jpeg import _BitReader

    r = _BitReader(bytes([0xAA, 0xCC, 0xF0, 0xFF, 0xD0, 0x55]), 0)
    assert r.read_bits(8) == 0xAA
    assert r.read_bits(8) == 0xCC
    assert r.read_bits(8) == 0xF0
    # only the marker remains: reading past it must fail, not skip it
    import pytest as _pytest

    with _pytest.raises(EOFError):
        r.read_bit()
    # and restart() consumes exactly the marker, exposing post-data
    r.restart()
    assert r.read_bits(8) == 0x55


def test_jpeg_shape_preservation_and_rejection():
    import numpy as np

    from data_lake_with_spark_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(1)
    for shape in ((1, 1, 3), (7, 9, 3), (9, 7, 3), (17, 31, 3)):
        im = rng.integers(0, 256, shape, dtype=np.uint8)
        for kw in ({}, {"subsample": True}):
            d = decode_jpeg(encode_jpeg(im, 90, **kw))
            assert d is not None and d.shape == shape, (shape, kw)
    assert decode_jpeg(b"not a jpeg at all, definitely not") is None
    # truncated stream → None, not an exception
    good = encode_jpeg(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), 85)
    assert decode_jpeg(good[: len(good) // 3]) is None
    # progressive SOF2 marker → None (honest fallback, not garbage)
    prog = bytearray(good)
    sof0 = prog.find(b"\xff\xc0")
    prog[sof0 + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None


def test_extract_features_uses_real_pixels_for_jpeg(spark):
    import numpy as np

    from data_lake_with_spark_spark.functions.jpeg import encode_jpeg

    img = np.full((16, 16, 3), 200, dtype=np.uint8)
    rows = [(11, "image", "image/jpeg", encode_jpeg(img, 95), 16, 16, None)]
    feats = M.extract_features(
        spark.createDataFrame(rows, M.ASSET_SCHEMA)
    ).collect()[0]
    # decoded pixel stats of the flat image, not byte stats of the
    # compressed container (flat blocks quantize losslessly)
    assert abs(feats["feat_mean"] - 200.0) < 1.0
    assert feats["feat_std"] < 1.0
