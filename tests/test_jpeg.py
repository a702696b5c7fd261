"""Baseline JPEG codec (functions/jpeg): lossy round-trip quality bars,
4:2:0 behavior, structural exactness, rejection of unsupported variants."""

import numpy as np
import pytest

from cdm_data_loader_utils_ray.functions.jpeg import (
    _rgb_to_ycbcr,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h, w):
    return (
        np.linspace(0, 255, w)[None, :, None] * np.ones((h, 1, 3))
    ).astype(np.uint8)


def test_rgb_roundtrip_quality():
    img = _gradient(40, 56)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert _psnr(img, dec) > 45


def test_grey_and_odd_sizes():
    rng = np.random.default_rng(1)
    g = (np.linspace(0, 255, 31)[None, :] * np.ones((23, 1))).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=90))
    assert dg.shape == g.shape and _psnr(g, dg) > 45
    o = rng.integers(0, 256, (17, 13, 3), dtype=np.uint8)
    do = decode_jpeg(encode_jpeg(o, quality=95))
    assert do.shape == o.shape and _psnr(o, do) > 28


def test_420_subsampling_luma_exactness():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert dec.shape == img.shape
    # luma survives at full resolution; chroma is legitimately half-res
    ya, yb = _rgb_to_ycbcr(img)[:, :, 0], _rgb_to_ycbcr(dec)[:, :, 0]
    assert 10 * np.log10(255.0**2 / np.mean((ya - yb) ** 2)) > 33
    smooth = _gradient(32, 48)
    ds = decode_jpeg(encode_jpeg(smooth, quality=90, subsample=True))
    assert _psnr(smooth, ds) > 45  # smooth chroma: 4:2:0 is near-lossless


def test_quality_monotone():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    lo = _psnr(img, decode_jpeg(encode_jpeg(img, quality=30)))
    hi = _psnr(img, decode_jpeg(encode_jpeg(img, quality=95)))
    assert hi > lo + 5


def test_rejects_progressive_and_garbage():
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img))
    # flip SOF0 (0xFFC0) to SOF2 (0xFFC2): progressive must be rejected
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_decode_image_sniffs_jpeg():
    from cdm_data_loader_utils_ray.functions.codecs import (
        decode_image,
        image_features,
    )

    img = _gradient(24, 32)
    dec = decode_image(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    f = image_features(encode_jpeg(img, quality=90))
    assert f[0] == 24 and f[1] == 32


def test_restart_markers_roundtrip():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
    for ri in (1, 3, 7):
        for ss in (False, True):
            with_rst = decode_jpeg(
                encode_jpeg(img, quality=92, subsample=ss, restart_interval=ri)
            )
            plain = decode_jpeg(encode_jpeg(img, quality=92, subsample=ss))
            assert np.array_equal(with_rst, plain), (ri, ss)


def test_422_subsampling():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (29, 37, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsample="422"))
    assert dec.shape == img.shape
    ya, yb = _rgb_to_ycbcr(img)[:, :, 0], _rgb_to_ycbcr(dec)[:, :, 0]
    assert 10 * np.log10(255.0**2 / np.mean((ya - yb) ** 2)) > 33
    # restart markers on the 4:2:2 MCU layout too
    d2 = decode_jpeg(
        encode_jpeg(img, quality=95, subsample="422", restart_interval=2)
    )
    assert np.array_equal(dec, d2)
    smooth = _gradient(29, 37)
    ds = decode_jpeg(encode_jpeg(smooth, quality=90, subsample="422"))
    assert _psnr(smooth, ds) > 45
