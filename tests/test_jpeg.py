"""Baseline JPEG codec — round-trip quality, every encoder/decoder
variant (4:4:4, 4:2:0, grayscale, restart markers, odd dims), the exact
DC-only subspace, and rejection of non-baseline streams."""

import numpy as np
import pytest

from kats_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / mse)


def _smooth(h=37, w=53):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (128 + 100 * np.sin(xx / 8.0)).clip(0, 255),
            (yy * 255 / h).clip(0, 255),
            (128 + 80 * np.cos((xx + yy) / 10.0)).clip(0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_roundtrip_444_high_quality():
    img = _smooth()
    payload = encode_jpeg(img, quality=90)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    dec = decode_jpeg(payload)
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 40.0


def test_jpeg_roundtrip_420_and_quality_ladder():
    img = _smooth()
    p420 = encode_jpeg(img, quality=90, subsampling="420")
    d420 = decode_jpeg(p420)
    assert d420.shape == img.shape
    assert _psnr(d420, img) > 30.0
    # subsampling actually shrinks the stream
    assert len(p420) < len(encode_jpeg(img, quality=90))
    # lower quality -> smaller payload, lower PSNR, still recognizable
    p50 = encode_jpeg(img, quality=50)
    assert len(p50) < len(encode_jpeg(img, quality=90))
    assert 28.0 < _psnr(decode_jpeg(p50), img)


def test_jpeg_restart_markers():
    img = _smooth()
    p = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xd0" in p or b"\xff\xd1" in p
    assert _psnr(decode_jpeg(p), img) > 40.0
    p2 = encode_jpeg(img, quality=90, subsampling="420", restart_interval=3)
    assert _psnr(decode_jpeg(p2), img) > 30.0


def test_jpeg_grayscale():
    yy, xx = np.mgrid[0:21, 0:34]
    g = ((yy * 3 + xx * 2) % 200 + 20).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=85))
    assert dec.shape == (21, 34, 3)
    assert (dec[..., 0] == dec[..., 1]).all() and (dec[..., 1] == dec[..., 2]).all()
    assert _psnr(dec[..., 0], g) > 35.0


def test_jpeg_exact_dc_subspace():
    """Uniform gray-RGB v = 128 + 3k survives quality-90 quantization
    bit-for-bit — the property the multimodal_decode oracle relies on."""
    for k in (-16, -5, 0, 7, 16):
        v = 128 + 3 * k
        img = np.full((16, 16, 3), v, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert (dec == v).all(), (v, np.unique(dec))


def test_jpeg_noise_worst_case():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 20.0  # noise is JPEG's worst case; stays sane


def test_jpeg_rejects_non_baseline():
    img = _smooth(16, 16)
    p = bytearray(encode_jpeg(img, quality=90))
    i = p.index(b"\xff\xc0")
    p[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(p))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_decode_real_classifies_jpeg(spark):
    from kats_spark.operators import multimodal

    imgs = [np.full((16, 16, 3), 128 + 3 * k, dtype=np.uint8) for k in (-4, 0, 9)]
    rows = [
        (i, bytearray(encode_jpeg(im, quality=90))) for i, im in enumerate(imgs)
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = multimodal.decode_real(df).toPandas().sort_values("media_id")
    assert list(out.kind) == ["image"] * 3
    assert (out.width == 16).all() and (out.height == 16).all()
    for i, im in enumerate(imgs):
        got = out[out.media_id == i].iloc[0]
        assert got.v_mean == float(im[0, 0, 0]) and got.v_std == 0.0
    # metadata sniff agrees
    meta = multimodal.attach_metadata(df).toPandas()
    assert (meta.mime == "image/jpeg").all()
