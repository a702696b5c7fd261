"""Real pure-stdlib/numpy media codecs (WAV-PCM, PPM/PGM) and the 'real'
extractor mode through the actor pool."""

import numpy as np
import pytest
import ray.data as rd


def test_wav_roundtrip_and_analytic_rms():
    from cdm_data_loader_utils_ray.functions.codecs import (
        decode_wav,
        encode_wav,
        wav_features,
    )

    t = np.arange(16000) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    for sw in (1, 2, 4):
        payload = encode_wav(x, 16000, sampwidth=sw)
        y, rate = decode_wav(payload)
        assert rate == 16000 and len(y) == len(x)
        tol = {1: 1e-2, 2: 1e-4, 4: 1e-8}[sw]
        np.testing.assert_allclose(y, x, atol=tol)
    f = wav_features(encode_wav(x, 16000))
    assert f[0] == pytest.approx(1.0)                      # duration s
    assert f[1] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)  # sine RMS
    assert f[2] == pytest.approx(2 * 440 / 16000, rel=0.02)   # ZCR
    assert f[3] == pytest.approx(0.5, rel=1e-3)               # peak
    assert len(f) == 12 and np.allclose(f[4:], f[4], rtol=0.05)


def test_ppm_roundtrip_comments_and_features():
    from cdm_data_loader_utils_ray.functions.codecs import (
        decode_ppm,
        encode_ppm,
        image_features,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    gray = rng.integers(0, 256, size=(5, 4), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(gray)) == gray).all()
    # spec: comments and arbitrary whitespace in the header
    body = encode_ppm(img)
    hacked = b"P6\n# a comment\n 7\t9 \n255\n" + body.split(b"255\n", 1)[1]
    assert (decode_ppm(hacked) == img).all()
    f = image_features(encode_ppm(img))
    assert f[0] == 9 and f[1] == 7
    np.testing.assert_allclose(f[2:5], img.reshape(-1, 3).mean(axis=0), rtol=1e-5)
    assert f[8:].sum() == pytest.approx(1.0)  # histogram normalized


def test_resize_nearest_gather():
    from cdm_data_loader_utils_ray.functions.codecs import resize_nearest

    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    up = resize_nearest(img, 12, 8)
    assert up.shape == (12, 8, 3)
    assert (up[::2, ::2] == img).all()  # 2x upscale repeats each pixel
    down = resize_nearest(img, 3, 2)
    assert down.shape == (3, 2, 3)
    assert (down == img[::2, ::2]).all()


def test_real_extractor_mode_through_actor_pool():
    from cdm_data_loader_utils_ray.functions.multimodal import (
        extract_features,
        synth_real_media,
    )

    tbl = synth_real_media(n=8)
    out = extract_features(
        rd.from_arrow(tbl), dim=16, concurrency=2, batch_size=4, mode="real"
    ).to_pandas().set_index("media_id")
    assert len(out) == 8 and (out["feature_dim"] == 16).all()
    # audio rows: duration 0.25 s and sine RMS in the leading features
    a = np.array(out.loc["r0000", "feature"])
    assert a[0] == pytest.approx(0.25) and a[1] == pytest.approx(0.35, abs=0.02)
    # image rows: [h, w, ...] and gradient means equal across channels
    i = np.array(out.loc["r0001", "feature"])
    assert i[0] > 0 and i[1] > 0 and i[2] == pytest.approx(i[3], rel=1e-5)


def test_real_mode_rejects_unsupported_mimes():
    from cdm_data_loader_utils_ray.functions.multimodal import MediaFeatureExtractor

    ex = MediaFeatureExtractor(dim=8, mode="real")
    with pytest.raises(NotImplementedError, match="codec libraries"):
        ex.decode(b"....ftypmp4", "video", "video/mp4")
    # jpeg is REAL now: garbage jpeg bytes fail as malformed, not as stub
    with pytest.raises(ValueError):
        ex.decode(b"\xff\xd8\xff\xe0garbage", "image", "image/jpeg")


def test_png_roundtrip_and_filters():
    import struct
    import zlib

    from cdm_data_loader_utils_ray.functions.codecs import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(3)
    for shape in [(13, 17), (13, 17, 3), (9, 5, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)

    # a PNG using ALL five scanline filters (reference-filtered by hand)
    h, w, ch = 6, 7, 3
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    rows, prev = [], np.zeros(w * ch, np.int32)
    flat = img.reshape(h, w * ch).astype(np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4, 1]):
        cur = flat[y]
        if f == 0:
            filt = cur
        elif f == 2:
            filt = (cur - prev) & 0xFF
        else:
            filt = np.zeros(w * ch, np.int32)
            for i in range(w * ch):
                left = cur[i - ch] if i >= ch else 0
                up, ul = prev[i], (prev[i - ch] if i >= ch else 0)
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa_ <= pb and pa_ <= pc_) else (
                        up if pb <= pc_ else ul
                    )
                filt[i] = (cur[i] - pred) & 0xFF
        rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)

    # CRC corruption is caught, truncated/unsupported rejected
    bad = bytearray(encode_png(img))
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope")


def test_decode_image_sniffs_png_and_ppm():
    from cdm_data_loader_utils_ray.functions.codecs import (
        decode_image,
        encode_png,
        encode_ppm,
        image_features,
    )

    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    fp, fm = image_features(encode_png(img)), image_features(encode_ppm(img))
    assert np.allclose(fp, fm)  # identical pixels -> identical features


def test_gif_roundtrip_and_interlace():
    import struct

    from cdm_data_loader_utils_ray.functions.codecs import (
        decode_gif,
        decode_image,
        encode_gif,
    )

    rng = np.random.default_rng(0)
    for h, w, ncol in [(1, 1, 1), (7, 5, 3), (40, 61, 200), (64, 64, 256)]:
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, (h, w))]
        assert np.array_equal(decode_gif(encode_gif(img)), img)
    # dictionary overflow + clear-code path (forces width up to 12 bits)
    big = rng.integers(0, 256, (150, 200), dtype=np.uint8)
    big3 = np.stack([big] * 3, axis=2)
    assert np.array_equal(decode_gif(encode_gif(big3)), big3)
    assert np.array_equal(decode_image(encode_gif(big3)), big3)

    # interlaced frame: store the 4-pass row order, set the interlace bit
    h, w = 23, 9
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 16, (h, w))]
    order = np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
    payload = bytearray(encode_gif(img[order]))
    # image descriptor starts after header(13) + GCT; flags byte is at +9
    depth = (payload[10] & 0x07) + 1
    desc = 13 + 3 * (2 ** depth)
    assert payload[desc] == 0x2C
    payload[desc + 9] |= 0x40
    assert np.array_equal(decode_gif(bytes(payload)), img)

    with pytest.raises(ValueError, match="256 colors"):
        grad = np.arange(300, dtype=np.int64) % 256
        many = np.stack([grad, grad // 2, grad // 3], axis=1).astype(np.uint8)
        encode_gif(np.tile(many[None, :, :], (2, 1, 1))
                   + np.arange(2, dtype=np.uint8)[:, None, None])
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"GIF10abcdef")


def test_bmp_roundtrip_and_variants():
    import struct

    from cdm_data_loader_utils_ray.functions.codecs import (
        decode_bmp,
        decode_image,
        encode_bmp,
    )

    rng = np.random.default_rng(6)
    for h, w in [(1, 1), (7, 5), (13, 3), (9, 8)]:  # odd widths hit padding
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
        assert np.array_equal(decode_image(encode_bmp(img)), img)
    # top-down variant: negate the height field
    img = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_bmp(img))
    (hh,) = struct.unpack_from("<i", payload, 22)
    struct.pack_into("<i", payload, 22, -hh)
    # rows were written bottom-up; flagging top-down flips the result
    assert np.array_equal(decode_bmp(bytes(payload)), img[::-1])
    with pytest.raises(ValueError, match="signature"):
        decode_bmp(b"nope")
