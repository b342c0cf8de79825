"""Multimodal plumbing + reference image-math parity tests.

The numeric ops mirror the reference's semantics exactly
(conversion.rs / normalize.rs / data_augment.py color jitter); decode
covers the uncompressed formats (PPM/PGM/BMP) in pure numpy, and the
Spark-side plumbing — binary column, Arrow batches, schema — is
exercised for real.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from piper_spark.sources.multimodal import (
    _area_weights,
    color_jitter,
    decode_image,
    encode_png,
    encode_ppm,
    fake_decode_meta,
    fake_image,
    normalize_imagenet,
    resize_area,
    scale_u8_to_f32,
    with_payload,
)


def _sample_img(h=6, w=8):
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_decode_rejects_unknown_payload_loudly():
    # The reference silently skips rows that fail to decode
    # (data_augment.py:74-75); this engine raises instead.
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\x00garbage")


def test_ppm_roundtrip():
    img = _sample_img()
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_ppm_comments_and_pgm_gray():
    img = _sample_img(2, 3)
    payload = encode_ppm(img)
    commented = payload.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert np.array_equal(decode_image(commented), img)
    gray = b"P5\n3 2\n255\n" + bytes(range(6))
    out = decode_image(gray)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[:, :, 0], np.arange(6, dtype=np.uint8).reshape(2, 3))
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def _make_bmp(img: np.ndarray) -> bytes:
    """Hand-rolled bottom-up 24-bit BI_RGB BMP for decoder testing."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    pixel_data = b""
    for row in img[::-1]:  # bottom-up
        line = row[:, [2, 1, 0]].tobytes()  # RGB → BGR storage
        pixel_data += line + b"\x00" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    return header + info + pixel_data


def test_bmp_decode_bottom_up_bgr_padded():
    img = _sample_img(3, 3)  # stride 9 → padded to 12: exercises padding
    assert np.array_equal(decode_image(_make_bmp(img)), img)


def test_area_weights_are_row_stochastic():
    for n_in, n_out in [(10, 3), (7, 7), (4, 6), (224, 32)]:
        w = _area_weights(n_in, n_out)
        np.testing.assert_allclose(w.sum(axis=1), 1.0)


def test_resize_area_integer_downscale_is_block_mean():
    # 4×4 → 2×2 with a 2× integer ratio: each output pixel is the exact
    # mean of its 2×2 source block (the INTER_AREA definition).
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_area(img, 2, 2)
    blocks = img.astype(np.float64).reshape(2, 2, 2, 2, 3).mean(axis=(1, 3))
    assert np.array_equal(out, np.clip(np.round(blocks), 0, 255).astype(np.uint8))


def test_resize_area_fractional_ratio_preserves_mean():
    # Row-stochastic weights ⇒ the global mean is a convex combination
    # of source pixels; for a constant image it is exactly preserved.
    img = np.full((5, 7, 3), 77, dtype=np.uint8)
    out = resize_area(img, 3, 2)
    assert out.shape == (2, 3, 3)
    assert (out == 77).all()


def test_resize_area_upscale_shape_and_dtype():
    img = _sample_img(2, 2)
    out = resize_area(img, 5, 4)
    assert out.shape == (4, 5, 3) and out.dtype == np.uint8


def test_decode_resize_augment_chain_end_to_end():
    """Reference S4/S5/S6 pipeline on a real (uncompressed) payload:
    decode → resize → jitter → scale → normalize, no stubs anywhere."""
    payload = encode_ppm(_sample_img(48, 64))
    img = decode_image(payload)
    resized = resize_area(img, 32, 24)
    jittered = color_jitter(resized)
    normed = normalize_imagenet(scale_u8_to_f32(jittered))
    assert normed.shape == (24, 32, 3) and normed.dtype == np.float32


def test_fake_image_tiles_payload_bytes():
    payload = b"abcde"
    img = fake_image(payload)
    w, h, _ = fake_decode_meta(payload)
    assert img.shape == (h, w, 3)
    flat = img.reshape(-1)
    expect = np.frombuffer(payload, dtype=np.uint8)
    assert np.array_equal(flat[: len(payload)], expect)
    assert flat[len(payload)] == expect[0]  # cyclic tiling


def test_fake_decode_meta_deterministic():
    assert fake_decode_meta(b"abc") == fake_decode_meta(b"abc") == (4, 4, 3)


def test_scale_and_normalize_match_reference_constants():
    img = np.full((2, 2, 3), 255, dtype=np.uint8)
    scaled = scale_u8_to_f32(img)
    assert scaled.dtype == np.float32 and scaled.max() == 1.0
    normed = normalize_imagenet(scaled)
    # channel 0: (1 - 0.485) / 0.229  (ImageNet stats, normalize.rs:8-15)
    assert abs(normed[0, 0, 0] - (1 - 0.485) / 0.229) < 1e-6


def test_color_jitter_clamps_like_reference():
    img = np.array([[[0, 128, 250]]], dtype=np.uint8)
    out = color_jitter(img)
    # x*1.2 + 10, clamped to u8 (data_augment.py:21-22)
    assert out.tolist() == [[[10, 164, 255]]]
    assert out.dtype == np.uint8


def test_png_roundtrip_rgb_all_filters():
    # cycle_filters=True gives scanline y filter y % 5, so a tall image
    # exercises none/sub/up/average/Paeth — decode must be bit-exact.
    img = _sample_img(10, 7)
    assert np.array_equal(decode_image(encode_png(img, cycle_filters=True)), img)
    assert np.array_equal(decode_image(encode_png(img)), img)


def test_png_gray_and_alpha_channel_policy():
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (5, 4), dtype=np.uint8)
    out = decode_image(encode_png(gray, cycle_filters=True))
    # gray replicated to 3 channels (cv2 IMREAD_COLOR policy)
    assert out.shape == (5, 4, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], out[:, :, 2])
    rgba = rng.integers(0, 256, (6, 3, 4), dtype=np.uint8)
    out = decode_image(encode_png(rgba, cycle_filters=True))
    # alpha dropped
    assert np.array_equal(out, rgba[:, :, :3])


def test_png_palette_decode():
    import zlib

    # Hand-build a 2×2 color-type-3 (palette) PNG: indices 0..3 → PLTE.
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 3])  # filter 0 rows

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_image(payload)
    assert out.tolist() == [
        [[255, 0, 0], [0, 255, 0]],
        [[0, 0, 255], [9, 9, 9]],
    ]


def test_png_rejects_unsupported_variants():
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # 16-bit depth and Adam7 interlace both raise loudly.
    for depth, interlace in [(16, 0), (8, 1)]:
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, depth, 2, 0, 0, interlace))
            + chunk(b"IDAT", zlib.compress(b"\x00" + b"\x00" * 6))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported"):
            decode_image(payload)


def test_png_decode_query_pixel_sum(spark):
    """img_decode_png's distributed proof, checked locally: the pixel
    sum equals 3× the tiled byte sum for a couple of real payloads."""
    from piper_spark.sources.multimodal import img_decode_png

    rows = img_decode_png(spark, "/root/testdata/sf0.001").orderBy("doc_id").take(3)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    for r in rows:
        (txt,) = con.execute(
            "SELECT text FROM documents WHERE doc_id = ?", [r.doc_id]
        ).fetchone()
        payload = txt.encode()
        w, h, _ = fake_decode_meta(payload)
        tiled = np.resize(np.frombuffer(payload, dtype=np.uint8), (h, w))
        assert (r.width, r.height) == (w, h)
        assert r.pix_sum == 3 * int(tiled.sum(dtype=np.int64))


def test_gif_roundtrip_real_lzw_and_degenerate():
    from piper_spark.sources.multimodal import encode_gif

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 60), dtype=np.uint8)
    out = decode_image(encode_gif(img))
    assert out.shape == (40, 60, 3)
    assert np.array_equal(out[:, :, 0], img)
    assert np.array_equal(out[:, :, 1], out[:, :, 2])
    # degenerate clear-per-symbol stream decodes identically
    assert np.array_equal(out, decode_image(encode_gif(img, real_lzw=False)))


def test_gif_lzw_stress_paths():
    """Repetitive + constant + large images force dictionary growth,
    KwKwK codes, code-width bumps, and the 4096-entry reset."""
    from piper_spark.sources.multimodal import encode_gif

    rep = np.tile(np.arange(16, dtype=np.uint8).repeat(8), (100, 1))
    assert np.array_equal(decode_image(encode_gif(rep))[:, :, 0], rep)
    const = np.full((200, 300), 77, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_gif(const))[:, :, 0], const)
    big = np.random.default_rng(5).integers(0, 256, (500, 400), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_gif(big))[:, :, 0], big)


def test_gif_interlaced_decode():
    """Hand-interlace the pixel stream (4-pass row order) and set the
    interlace flag: the decoder must un-interlace back to row order."""
    import struct as _struct

    from piper_spark.sources.multimodal import _GIF_INTERLACE, encode_gif

    img = np.arange(16 * 4, dtype=np.uint8).reshape(16, 4)
    h = 16
    order = [r for off, step in _GIF_INTERLACE for r in range(off, h, step)]
    payload = bytearray(encode_gif(img[order], real_lzw=False))
    # image descriptor starts after 6 (header) + 7 (LSD) + 768 (GCT);
    # its flags byte is at offset +9 — set the interlace bit.
    desc = 6 + 7 + 768
    assert payload[desc] == 0x2C
    l, t, w_, h_, fl = _struct.unpack("<HHHHB", payload[desc + 1 : desc + 10])
    assert (w_, h_) == (4, 16) and fl == 0
    payload[desc + 9] = 0x40
    out = decode_image(bytes(payload))
    assert np.array_equal(out[:, :, 0], img)


def test_gif_rejects_bad_payloads():
    with pytest.raises(ValueError, match="signature"):
        from piper_spark.sources.multimodal import _decode_gif

        _decode_gif(b"GIF88a" + b"\x00" * 20)
    # trailer with no frame
    import struct as _struct

    no_frame = b"GIF89a" + _struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b"
    with pytest.raises(ValueError, match="no image frame"):
        decode_image(no_frame)


def test_gif_decode_query_pixel_sum(spark):
    """img_decode_gif's distributed proof, checked locally (the GIF
    sibling of the PNG check above)."""
    from piper_spark.sources.multimodal import img_decode_gif

    rows = img_decode_gif(spark, "/root/testdata/sf0.001").orderBy("doc_id").take(3)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    for r in rows:
        (txt,) = con.execute(
            "SELECT text FROM documents WHERE doc_id = ?", [r.doc_id]
        ).fetchone()
        payload = txt.encode()
        w, h, _ = fake_decode_meta(payload)
        tiled = np.resize(np.frombuffer(payload, dtype=np.uint8), (h, w))
        assert (r.width, r.height) == (w, h)
        assert r.pix_sum == 3 * int(tiled.sum(dtype=np.int64))


def test_payload_column_roundtrip(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    row = with_payload(df).collect()[0]
    assert bytes(row.payload) == b"hello"


def test_mapinpandas_batches_are_columnar(spark):
    """The mapInPandas path sees Arrow batches, not pickled Rows."""
    from piper_spark.sources.multimodal import img_meta

    out = img_meta(spark, "/root/testdata/sf0.001").limit(5).collect()
    assert len(out) == 5
    for r in out:
        assert r.width == 1 + r.n_bytes % 64
        assert r.height == 1 + r.n_bytes % 48


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT) — the fifth and last reference format.
# ---------------------------------------------------------------------------


def test_jpeg_constant_blocks_roundtrip_exactly():
    # Constant 8x8 blocks carry only a DC coefficient, and 8*(v-128)/8
    # is integer-exact — the property img_decode_jpeg's oracle rests on.
    from piper_spark.sources.multimodal import encode_jpeg

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    dec = decode_image(encode_jpeg(img))
    assert np.array_equal(dec, np.repeat(img[:, :, None], 3, axis=2))


def test_jpeg_gray_near_lossless_at_unit_quant():
    # Arbitrary content through the full AC path (runs, ZRL, EOB,
    # magnitude categories): with all-ones quant tables the only error
    # source is DCT float rounding — at most 1 LSB.
    from piper_spark.sources.multimodal import encode_jpeg

    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    dec = decode_image(encode_jpeg(g))
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])  # gray replicated
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 1


def test_jpeg_rgb_444_and_420_paths():
    from piper_spark.sources.multimodal import encode_jpeg

    rng = np.random.default_rng(5)
    c = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    d444 = decode_image(encode_jpeg(c))
    # YCbCr forward+inverse each round once -> small bounded error
    assert np.abs(d444.astype(int) - c.astype(int)).max() <= 3
    yy, xx = np.mgrid[0:32, 0:32]
    smooth = np.stack([yy * 4, xx * 4, (yy + xx) * 2], 2).astype(np.uint8)
    d420 = decode_image(encode_jpeg(smooth, subsample=True))
    # 2x2 box-averaged chroma on a smooth gradient: tight bound still
    assert np.abs(d420.astype(int) - smooth.astype(int)).max() <= 6


def test_jpeg_non_mcu_multiple_dims():
    from piper_spark.sources.multimodal import encode_jpeg

    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    dec = decode_image(encode_jpeg(g))
    assert dec.shape == (13, 21, 3)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 1


def test_jpeg_rejects_unsupported_variants_loudly():
    from piper_spark.sources.multimodal import _decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="baseline"):
        _decode_jpeg(b"\xff\xd8\xff\xc9\x00\x05aaa")  # arithmetic SOF9
    with pytest.raises(ValueError, match="baseline"):
        _decode_jpeg(b"\xff\xd8\xff\xc3\x00\x05aaa")  # lossless SOF3
    with pytest.raises(ValueError, match="SOI"):
        _decode_jpeg(b"\x00\x00")
    # corrupting the entropy stream must raise, not return garbage
    good = bytearray(encode_jpeg(np.full((8, 8), 7, dtype=np.uint8)))
    with pytest.raises(ValueError):
        _decode_jpeg(bytes(good[:-10]) + b"\xff\xc7" + bytes(good[-8:]))


def test_jpeg_decode_query_pixel_sum(spark):
    """img_decode_jpeg's distributed proof, checked locally (the JPEG
    sibling of the PNG/GIF checks above)."""
    from piper_spark.sources.multimodal import img_decode_jpeg

    rows = img_decode_jpeg(spark, "/root/testdata/sf0.001").orderBy("doc_id").take(3)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    for r in rows:
        (txt,) = con.execute(
            "SELECT text FROM documents WHERE doc_id = ?", [r.doc_id]
        ).fetchone()
        payload = txt.encode()
        n = len(payload)
        wb, hb = 1 + n % 8, 1 + n % 6
        tiled = np.resize(np.frombuffer(payload, dtype=np.uint8), (hb, wb))
        assert r.width == 8 * wb and r.height == 8 * hb
        assert r.pix_sum == 192 * int(tiled.sum(dtype=np.int64))


def test_jpeg_quantized_streams_decode_with_bounded_loss():
    # Real (non-unit) quantization: lossy but bounded, and the stream
    # must shrink. Exercises the dequant path with genuine tables.
    from piper_spark.sources.multimodal import encode_jpeg

    yy, xx = np.mgrid[0:24, 0:32]
    smooth = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    b1 = encode_jpeg(smooth)
    b8 = encode_jpeg(smooth, quant=8)
    assert len(b8) < len(b1)
    d8 = decode_image(b8)[:, :, 0]
    assert np.abs(d8.astype(int) - smooth.astype(int)).max() <= 8


def test_jpeg_nonuniform_quant_table_order():
    # A non-uniform table catches any zigzag/natural-order mix-up in
    # quant/dequant — uniform tables are permutation-invariant and
    # CANNOT detect a mis-ordered dequant (the bug class this guards).
    from piper_spark.sources.multimodal import encode_jpeg

    yy, xx = np.mgrid[0:24, 0:32]
    smooth = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    tbl = np.ones((8, 8), dtype=np.int64)
    tbl[4:, :] = 16
    tbl[:, 4:] = 16  # crush only high frequencies
    dec = decode_image(encode_jpeg(smooth, quant=tbl.reshape(64)))[:, :, 0]
    # smooth image has little high-frequency energy -> tiny loss if the
    # table lines up positionally; garbage (>50) if permuted
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 4
    with pytest.raises(ValueError, match="1..255"):
        encode_jpeg(smooth, quant=0)


def test_jpeg_restart_markers_roundtrip():
    # DRI + RSTn every N MCUs with DC-predictor resets — the decoder's
    # restart path (byte re-align, predictor reset, marker consume)
    # must reproduce the no-DRI result exactly.
    from piper_spark.sources.multimodal import encode_jpeg

    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, size=(24, 48), dtype=np.uint8)  # 18 MCUs
    plain = decode_image(encode_jpeg(g))
    for interval in (1, 2, 5):
        b = encode_jpeg(g, restart_interval=interval)
        assert b"\xff\xdd" in b  # DRI segment present
        assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))
        assert np.array_equal(decode_image(b), plain)
    # interacts cleanly with chroma subsampling (multi-block MCUs)
    c = rng.integers(0, 256, size=(16, 32, 3), dtype=np.uint8)
    assert decode_image(encode_jpeg(c, subsample=True, restart_interval=1)).shape == (
        16,
        32,
        3,
    )


def test_jpeg_progressive_decodes_identical_to_baseline():
    """Baseline and progressive encodes carry the SAME quantized
    coefficients, so their decodes must be bit-identical — one equality
    that pins the entire progressive path (DC/AC first passes,
    successive-approximation refinement, spectral bands, EOB runs,
    non-interleaved scans, inter-scan DHT) against the already-proven
    baseline decoder."""
    from piper_spark.sources.multimodal import encode_jpeg

    rng = np.random.default_rng(1234)
    cases = [
        dict(shape=(37, 53), quant=1),  # gray, non-MCU dims, max quality
        dict(shape=(41, 29, 3), quant=rng.integers(1, 40, 64)),  # real table
        dict(shape=(50, 66, 3), quant=8, subsample=True),  # 4:2:0 upsampling
        dict(shape=(8, 8), quant=1),  # single block
    ]
    for c in cases:
        img = rng.integers(0, 256, c.pop("shape"), dtype=np.uint8)
        base = decode_image(encode_jpeg(img, **c))
        prog = decode_image(encode_jpeg(img, progressive=True, **c))
        assert np.array_equal(base, prog)


def test_jpeg_progressive_eob_runs_and_constant_blocks():
    from piper_spark.sources.multimodal import encode_jpeg

    # near-empty AC spectrum → long cross-block EOB runs (EOBn + ext
    # bits on both first and refinement passes)
    img = np.full((128, 128), 100, np.uint8)
    img[5, 7] = 240
    assert np.array_equal(
        decode_image(encode_jpeg(img, quant=2)),
        decode_image(encode_jpeg(img, quant=2, progressive=True)),
    )
    # constant 8×8 blocks survive progressive round trip EXACTLY — the
    # contract the img_decode_jpeg_prog oracle is built on
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 256, (4, 6), dtype=np.uint8)
    tiles = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    out = decode_image(encode_jpeg(tiles, progressive=True))
    assert np.array_equal(out[:, :, 0], tiles)
    # progressive + restart intervals are declared unsupported loudly
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(tiles, progressive=True, restart_interval=2)


def test_phash_survives_jpeg_reencode_and_flags_edits():
    """pHash must be stable under lossy re-encoding (near-zero Hamming)
    yet move far for a structural edit — the two properties that make
    it a near-dup signature rather than a checksum."""
    import numpy as np

    from piper_spark.sources.multimodal import decode_image, encode_jpeg, phash64

    rng = np.random.default_rng(11)
    # smooth content (random noise has no low-frequency structure for
    # a perceptual hash to hold on to)
    y, x = np.mgrid[0:64, 0:96]
    img = np.stack(
        [
            (127 + 80 * np.sin(x / 9.0) + 40 * np.cos(y / 7.0)).clip(0, 255),
            (127 + 80 * np.cos(x / 11.0)).clip(0, 255),
            (127 + 60 * np.sin((x + y) / 13.0)).clip(0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    h0 = phash64(img)
    reenc = decode_image(encode_jpeg(img, quant=8, subsample=True))
    h1 = phash64(reenc)
    flipped = img[:, ::-1]
    h2 = phash64(flipped)
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(h0, h1) <= 6  # lossy re-encode: perceptually same
    assert ham(h0, h2) >= 16  # mirror: structurally different


def test_img_phash_recovers_planted_near_dups(spark):
    """Every planted perturbed copy (1% of pixels +1) must be found by
    the banded pHash join at small Hamming distance."""
    from pyspark.sql import functions as F

    from piper_spark.session import table
    from piper_spark.sources.multimodal import (
        PHASH_PLANT_MOD,
        PHASH_PLANT_OFFSET,
        img_phash,
    )
    from tests.conftest import SF_SMOKE

    rows = img_phash(spark, SF_SMOKE).collect()
    found = {(r.id1, r.id2) for r in rows}
    planted = {
        (d, d + PHASH_PLANT_OFFSET)
        for (d,) in table(spark, SF_SMOKE, "documents")
        .filter((F.col("doc_id") % PHASH_PLANT_MOD == 0))
        .select("doc_id")
        .collect()
    }
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, (recall, len(planted))


def test_image_struct_parity_with_builtin_image_source(spark, tmp_path):
    """`read_image_struct` must match Spark's own
    `spark.read.format("image")` FIELD-FOR-FIELD — origin, dims,
    nChannels, OpenCV mode code, BGR(A)/gray byte layout, and the
    invalid-image sentinel row — on gray, RGB, RGBA, and broken files."""
    import os

    import numpy as np

    from piper_spark.sources.multimodal import encode_png, read_image_struct

    d = tmp_path / "tree" / "cls"
    d.mkdir(parents=True)
    rng = np.random.RandomState(7)
    (d / "gray.png").write_bytes(
        encode_png(rng.randint(0, 256, (5, 7), dtype=np.uint8))
    )
    (d / "rgb.png").write_bytes(
        encode_png(rng.randint(0, 256, (4, 6, 3), dtype=np.uint8))
    )
    (d / "rgba.png").write_bytes(
        encode_png(rng.randint(0, 256, (3, 5, 4), dtype=np.uint8))
    )
    (d / "broken.png").write_bytes(b"not a png at all")

    ours = read_image_struct(
        spark, str(tmp_path / "tree"), glob="*.png", recursive=True
    )
    theirs = (
        spark.read.format("image")
        .option("dropInvalid", "false")
        .option("recursiveFileLookup", "true")
        .load(str(tmp_path / "tree"))
    )
    assert ours.schema == theirs.schema
    om = {os.path.basename(r.image.origin): r.image for r in ours.collect()}
    tm = {os.path.basename(r.image.origin): r.image for r in theirs.collect()}
    assert set(om) == set(tm) == {"gray.png", "rgb.png", "rgba.png", "broken.png"}
    for k, t in tm.items():
        o = om[k]
        assert (o.origin, o.height, o.width, o.nChannels, o.mode) == (
            t.origin,
            t.height,
            t.width,
            t.nChannels,
            t.mode,
        ), k
        assert bytes(o.data) == bytes(t.data), k
    # mode codes are the published OpenCV constants
    assert tm["gray.png"].mode == 0 and om["gray.png"].mode == 0
    assert tm["rgb.png"].mode == 16 and tm["rgba.png"].mode == 24
    assert om["broken.png"].mode == -1  # invalid sentinel


def test_source_image_struct_registered_query(spark):
    """The registered key yields valid ImageSchema rows (dropInvalid
    semantics: the decoy .txt is globbed out, all rows decode)."""
    from piper_spark.sources.multimodal import source_image_struct
    from tests.conftest import SF_SMOKE

    rows = source_image_struct(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        img = r.image
        assert img.mode in (0, 16, 24)
        assert img.height > 0 and img.width > 0
        assert len(img.data) == img.height * img.width * img.nChannels
        assert img.origin.startswith("file://")


# ------------------------------------------------------------ WAV container


def test_wav_round_trip_and_truncation():
    """encode_wav → decode_wav is byte-exact on the PCM; odd-length
    input loses exactly its trailing half-sample."""
    from piper_spark.sources.multimodal import decode_wav, encode_wav

    pcm = bytes(range(256)) * 3
    assert decode_wav(encode_wav(pcm)) == pcm
    assert decode_wav(encode_wav(pcm + b"\x7f")) == pcm  # odd byte dropped
    assert decode_wav(encode_wav(b"")) == b""  # header-only clip


def test_wav_strict_parser_rejects_malformed_containers():
    """Every header field the parser depends on must be validated —
    ingest rejects malformed containers loudly instead of mis-framing
    samples."""
    import struct

    import pytest

    from piper_spark.sources.multimodal import decode_wav, encode_wav

    good = bytearray(encode_wav(b"ab" * 50))

    def corrupt(off, val):
        bad = bytearray(good)
        bad[off : off + len(val)] = val
        return bytes(bad)

    cases = [
        good[: 43],                                 # shorter than header
        corrupt(0, b"RIFX"),                        # bad RIFF magic
        corrupt(8, b"WEVA"),                        # bad WAVE magic
        corrupt(4, struct.pack("<I", 999)),         # RIFF size lies
        corrupt(12, b"LIST"),                       # not a canonical fmt
        corrupt(20, struct.pack("<H", 3)),          # IEEE-float format
        corrupt(22, struct.pack("<H", 2)),          # stereo
        corrupt(34, struct.pack("<H", 24)),         # 24-bit
        corrupt(32, struct.pack("<H", 4)),          # block align off
        corrupt(36, b"fact"),                       # not a data chunk
        corrupt(40, struct.pack("<I", 7)),          # data size lies
        bytes(good) + b"x",                         # trailing garbage
    ]
    for bad in cases:
        with pytest.raises(ValueError):
            decode_wav(bytes(bad))


def test_avi_roundtrip_and_frame_exactness():
    """encode_avi → decode_avi recovers every frame in order; each
    decoded frame is pixel-exact (constant DC-only blocks through the
    real JPEG codec); trailing sub-frame bytes are dropped."""
    import numpy as np

    from piper_spark.sources.multimodal import (
        AVI_FRAME_BYTES,
        AVI_H,
        AVI_W,
        decode_avi,
        decode_image,
        encode_avi,
    )

    payload = bytes(range(256)) * 2  # 8 whole frames
    frames = decode_avi(encode_avi(payload))
    assert len(frames) == len(payload) // AVI_FRAME_BYTES
    for f, j in enumerate(frames):
        rgb = decode_image(j)
        assert rgb.shape == (AVI_H, AVI_W, 3)
        want = 192 * sum(payload[f * AVI_FRAME_BYTES : (f + 1) * AVI_FRAME_BYTES])
        assert int(rgb.sum(dtype=np.int64)) == want
    assert len(decode_avi(encode_avi(bytes(AVI_FRAME_BYTES + 7)))) == 1
    assert len(decode_avi(encode_avi(bytes(AVI_FRAME_BYTES - 1)))) == 0


def test_dc_only_idct_fast_path_matches_einsum():
    """The decoder's DC-only IDCT shortcut (round 15) must equal the
    generic einsum bit-for-bit — single nonzero term, so the analytic
    product (A[0,x]·dc)·A[0,y] IS the sum; pinned across the dequant
    DC range and against a mixed DC-only/AC-bearing image decode."""
    import numpy as np

    from piper_spark.sources.multimodal import _JPEG_A, decode_image, encode_jpeg

    rng = np.random.RandomState(77)
    for dc in list(range(-2040, 2041, 97)) + [int(v) for v in rng.randint(-20000, 20000, 200)]:
        blocks = np.zeros((1, 8, 8))
        blocks[0, 0, 0] = float(dc)
        ein = np.einsum("ux,nuv,vy->nxy", _JPEG_A, blocks, _JPEG_A)[0]
        a0 = _JPEG_A[0]
        fast = (a0[:, None] * float(dc)) * a0[None, :]
        assert (ein == fast).all(), dc
    # Mixed image: flat 8×8 tiles (DC-only) next to noise (AC-bearing);
    # a max-quality round trip of the flat region is pixel-exact, which
    # only holds if the shortcut's floats match the old path's.
    img = rng.randint(0, 256, (24, 24), dtype=np.uint8)
    img[:8, :8] = 200
    out = decode_image(encode_jpeg(img))
    assert (out[:8, :8, 0] == 200).all()


def test_avi_const_frame_fast_path_matches_generic_encoder():
    """`_encode_jpeg_const_frame` (the round-15 analytic DC-only fast
    path encode_avi rides) must stay BYTE-IDENTICAL to the generic
    `encode_jpeg` on the constant-8×8-block frames AVI packs — across
    every byte value and random frames."""
    import numpy as np

    from piper_spark.sources.multimodal import (
        AVI_HB,
        AVI_WB,
        _encode_jpeg_const_frame,
        encode_jpeg,
    )

    rng = np.random.RandomState(1234)
    frames = [bytes([v] * 64) for v in range(0, 256, 17)]
    frames.append(bytes(range(64)))
    frames += [rng.randint(0, 256, 64, dtype=np.uint8).tobytes() for _ in range(24)]
    for payload in frames:
        vals = np.frombuffer(payload, dtype=np.uint8).reshape(AVI_HB, AVI_WB)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        assert _encode_jpeg_const_frame(list(payload)) == encode_jpeg(img)


def test_avi_strict_parser_rejects_malformed_containers():
    """Every container field the chunk walk depends on must be
    validated — ingest rejects malformed AVIs loudly instead of
    mis-framing (the decode_wav discipline, 13 classes)."""
    import struct

    import pytest

    from piper_spark.sources.multimodal import decode_avi, encode_avi

    good = bytes(encode_avi(bytes(range(130))))  # 2 frames

    def corrupt(off, val):
        bad = bytearray(good)
        bad[off : off + len(val)] = val
        return bytes(bad)

    hdrl_off = 12          # LIST hdrl header
    avih_off = hdrl_off + 12   # 'avih' fourcc inside hdrl
    frames_off = avih_off + 8 + 16  # dwTotalFrames (5th avih field)
    streams_off = avih_off + 8 + 24  # dwStreams
    strl_off = avih_off + 8 + 56
    strh_off = strl_off + 12
    strh_body = strh_off + 8
    strf_off = strh_body + 56
    movi_list_off = good.index(b"LIST", strf_off)
    first_dc = good.index(b"00dc")

    cases = [
        good[:10],                                   # truncated header
        corrupt(0, b"RIFX"),                         # bad RIFF magic
        corrupt(4, struct.pack("<I", 99)),           # RIFF size lies
        corrupt(8, b"AVIX"),                         # wrong form type
        corrupt(hdrl_off + 8, b"hdrX"),              # first LIST not hdrl
        corrupt(avih_off, b"avhX"),                  # missing avih
        corrupt(avih_off + 4, struct.pack("<I", 48)),  # avih wrong size
        corrupt(frames_off, struct.pack("<I", 9)),   # dwTotalFrames lies
        corrupt(streams_off, struct.pack("<I", 2)),  # two streams
        corrupt(strh_body + 4, b"H264"),             # wrong handler
        corrupt(strh_body + 32, struct.pack("<I", 5)),  # strh dwLength lies
        corrupt(first_dc, b"01wb"),                  # audio chunk in movi
        good + b"x",                                 # trailing garbage
        # hdrl LIST whose declared size truncates avih mid-field:
        # must be the documented ValueError, never a raw struct.error
        good[:hdrl_off]
        + b"LIST" + struct.pack("<I", 10) + b"hdrlavihXY"
        + good[hdrl_off + 8 + struct.unpack("<I", good[hdrl_off+4:hdrl_off+8])[0]:],
    ]
    assert len(cases) == 14
    for i, bad in enumerate(cases):
        with pytest.raises(ValueError):
            decode_avi(bytes(bad))


def test_img_augment_checksum_is_geometry_sensitive():
    """The position-weighted checksum must distinguish every flip code
    and the rotation direction on an asymmetric image — a plain pixel
    sum would be permutation-invariant and could not catch a wrong
    axis or a clockwise rotate."""
    import numpy as np

    from piper_spark.sources.augment import flip, rotate90

    img = np.arange(24, dtype=np.uint8).reshape(4, 6)[:, :, None]

    def cs(out):
        oh, ow = out.shape[:2]
        w = np.arange(1, oh * ow + 1, dtype=np.int64).reshape(oh, ow)
        return int((out[:, :, 0].astype(np.int64) * w).sum())

    variants = {
        f"flip{c}": cs(rotate90(flip(img, code=c))) for c in (-1, 0, 1)
    }
    variants["noflip"] = cs(rotate90(img))
    assert len(set(variants.values())) == len(variants), variants
    # Rotation DIRECTION on the same flip code must also be visible.
    # (Across codes it need not be: in the dihedral group
    # cw∘flip_vertical ≡ ccw∘flip_horizontal — a true identity, so the
    # checksum legitimately collides there.)
    assert cs(rotate90(flip(img, code=0), k=-1)) != cs(
        rotate90(flip(img, code=0))
    )


def test_tar_roundtrip_and_member_layout():
    """encode_tar → decode_tar recovers exactly the chunked payload:
    names in sequence, odd members gzip-framed, concatenation of
    decompressed members byte-equal to the input."""
    import gzip

    from piper_spark.sources.multimodal import TAR_CHUNK, decode_tar, encode_tar

    payload = bytes(range(33, 127)) * 5  # 470 bytes → 5 members
    members = decode_tar(encode_tar(payload, 7))
    assert [n for n, _ in members] == [
        f"7/{i:06d}.txt" + (".gz" if i % 2 else "") for i in range(5)
    ]
    chunks = [
        gzip.decompress(d) if i % 2 else d for i, (_, d) in enumerate(members)
    ]
    assert b"".join(chunks) == payload
    assert all(len(c) == TAR_CHUNK for c in chunks[:-1])


def test_tar_strict_parser_rejects_malformed():
    """Every structural field decode_tar depends on must fail LOUDLY
    when corrupted — 12 malformed classes, each built by mutating a
    valid stdlib-written archive."""
    import pytest

    from piper_spark.sources.multimodal import decode_tar, encode_tar

    good = bytearray(encode_tar(b"x" * 250, 3))  # 3 members

    def expect(buf, msg):
        with pytest.raises(ValueError, match=msg):
            decode_tar(bytes(buf))

    expect(good[:-1], "512-byte blocks")                      # 1 alignment
    expect(good[:512], "overruns archive")                    # 2 truncated data
    bad = good.copy(); bad[257:263] = b"notar\x00"
    expect(bad, "magic")                                      # 3 magic
    bad = good.copy(); bad[263:265] = b"99"
    expect(bad, "magic/version")                              # 4 version
    bad = good.copy(); bad[156] = ord("5")
    expect(bad, "typeflag")                                   # 5 typeflag
    bad = good.copy(); bad[0:100] = b"\x00" * 100
    expect(bad, "empty member name|checksum")                 # 6 name
    bad = good.copy(); bad[124:136] = b"00000000zz \x00"
    expect(bad, "octal")                                      # 7 size octal
    bad = good.copy(); bad[148:156] = b"0000000\x00"
    expect(bad, "checksum")                                   # 8 checksum
    # 9 data overrun: declare a huge size and refresh the checksum
    bad = good.copy(); bad[124:136] = b"77777777777\x00"
    s = sum(bad[:148]) + 8 * 0x20 + sum(bad[156:512])
    bad[148:156] = (oct(s)[2:].rjust(6, "0") + "\x00 ").encode()
    expect(bad, "overruns")
    # 10 nonzero padding: poke a pad byte of member 0 (100-byte data → pad 100..511)
    bad = good.copy(); bad[512 + 200] = 1
    expect(bad, "padding")
    # 11 missing terminator: cut the archive right after the last member
    last_end = 3 * 1024  # 3 members × (512 header + 512 padded data)
    expect(good[:last_end], "terminator")
    # 12 nonzero byte after the terminator
    bad = good.copy(); bad[-1] = 1
    expect(bad, "after end-of-archive|checksum|terminator")


def test_phash_int_perceptual_stability_and_sensitivity():
    """The integer-DCT hash must survive the perceptually-invisible
    plant (+1 on every 97th byte → ≤ 8 bits moved; measured ≤ 2) while
    separating structurally different payloads, and exact duplicates
    hash identically."""
    from piper_spark.sources.multimodal import _perturb, phash_int64

    payloads = [
        (b"the quick brown fox jumps over the lazy dog " * 12)[: 400 + 13 * i]
        for i in range(20)
    ]

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for p in payloads:
        h0, _ = phash_int64(p)
        assert phash_int64(p)[0] == h0
        h1, _ = phash_int64(_perturb(p))
        assert ham(h0, h1) <= 8, ham(h0, h1)
    # structurally different content should not collide wholesale
    ha, _ = phash_int64(payloads[0])
    hb, _ = phash_int64(bytes(range(256)) * 4)
    assert ham(ha, hb) > 8


def test_dedup_phash_int_guaranteed_recall(spark):
    """Round-10 dedup_phash_int: the 4-disjoint-window + Hamming-1
    probe geometry guarantees EVERY planted pair within the threshold
    is found — recall == 1.0 as an equality, not a floor (a miss needs
    >= 2 flips in all 4 windows = >= 8 > 6)."""
    import pyspark.sql.functions as F

    from piper_spark.sources.multimodal import (
        PHASH_INT_HAM_T,
        PHASH_PLANT_MOD,
        PHASH_PLANT_OFFSET,
        _perturb,
        phash_int64,
        with_payload,
    )
    from piper_spark.session import table
    from piper_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    pairs = {
        (r.id1, r.id2)
        for r in all_queries()["dedup_phash_int"](spark, SF_SMOKE).collect()
    }
    planted = [
        (r.doc_id, bytes(r.payload))
        for r in with_payload(table(spark, SF_SMOKE, "documents"))
        .filter(F.col("doc_id") % PHASH_PLANT_MOD == 0)
        .select("doc_id", "payload")
        .collect()
    ]
    assert planted
    n_in_threshold = 0
    for doc_id, payload in planted:
        h0 = phash_int64(payload)[0]
        h1 = phash_int64(_perturb(payload))[0]
        d = bin((h0 ^ h1) & ((1 << 64) - 1)).count("1")
        if d <= PHASH_INT_HAM_T:  # every plant measured <= 2, but be exact
            n_in_threshold += 1
            assert (doc_id, doc_id + PHASH_PLANT_OFFSET) in pairs, (doc_id, d)
    # Round-10 ADVICE 2: the guarantee must not pass VACUOUSLY — if a
    # fixture regeneration pushed every planted distance above the
    # threshold, the loop above would assert nothing.
    assert n_in_threshold > 0
