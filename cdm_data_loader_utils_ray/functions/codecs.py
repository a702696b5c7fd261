"""REAL media codecs for self-describing uncompressed formats — pure
stdlib + numpy, no external media libraries.

The container has no image/audio libs, so compressed formats (png/jpeg/
mp3/mp4) stay behind the documented stub in ``functions/multimodal.py``
(`mode='strict'` raises).  But WAV-PCM and PPM/PGM need nothing beyond
``wave``/``struct``/numpy, so for those the decode → feature → resize path
is fully real and tested:

  WAV  stdlib ``wave`` framing + numpy ``frombuffer`` sample decode
       (8/16/32-bit PCM), vectorized RMS / zero-crossing features
  PPM  P6 binary RGB / P5 binary grayscale header parse + frombuffer,
       per-channel stats + luminance-histogram features, nearest-neighbor
       resize as one numpy gather

Encoders exist so tests and the catalog can synthesize deterministic
payloads without fixtures.
"""

from __future__ import annotations

import io
import wave

import numpy as np

# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------

_PCM_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def encode_wav(samples: np.ndarray, sample_rate: int = 16000,
               sampwidth: int = 2) -> bytes:
    """float samples in [-1, 1] -> mono PCM WAV bytes."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if sampwidth == 1:
        raw = ((x * 127.0) + 128.0).astype(np.uint8).tobytes()
    elif sampwidth == 2:
        raw = (x * 32767.0).astype("<i2").tobytes()
    elif sampwidth == 4:
        raw = (x * 2147483647.0).astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported sampwidth {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(raw)
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples in [-1, 1] shaped (n,) mono or
    (n, channels), sample_rate).  PCM 8/16/32-bit only — that is what the
    stdlib ``wave`` module itself supports."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        sw, nch, rate = w.getsampwidth(), w.getnchannels(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw not in _PCM_DTYPES:
        raise ValueError(f"unsupported PCM sample width {sw}")
    x = np.frombuffer(raw, dtype=_PCM_DTYPES[sw]).astype(np.float32)
    if sw == 1:
        x = (x - 128.0) / 127.0
    elif sw == 2:
        x = x / 32767.0
    else:
        x = x / 2147483647.0
    if nch > 1:
        x = x.reshape(-1, nch)
    return x, rate


def wav_features(payload: bytes, n_bands: int = 8) -> np.ndarray:
    """Real audio features, all vectorized: [duration_s, rms, zero-crossing
    rate, peak] + per-band RMS over ``n_bands`` equal time slices.
    float32, length ``4 + n_bands``."""
    x, rate = decode_wav(payload)
    if x.ndim > 1:
        x = x.mean(axis=1)
    n = len(x)
    if n == 0:
        return np.zeros(4 + n_bands, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    peak = float(np.abs(x).max())
    edges = np.linspace(0, n, n_bands + 1).astype(np.int64)
    bands = [
        float(np.sqrt(np.mean(x[a:b] * x[a:b]))) if b > a else 0.0
        for a, b in zip(edges[:-1], edges[1:])
    ]
    return np.array([n / rate, rms, zcr, peak] + bands, dtype=np.float32)


# ---------------------------------------------------------------------------
# PPM / PGM (netpbm binary)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> binary P6 PPM; (h, w) -> binary P5 PGM."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (h,w,3) or (h,w), got {img.shape}")
    h, w = img.shape[:2]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + img.tobytes()


def _parse_pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, data_offset) — tolerates comments and
    any whitespace run, per the netpbm spec."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM payload")
    magic = payload[:2]
    vals: list[int] = []
    i = 2
    n = len(payload)
    while len(vals) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":  # comment to end of line
            while i < n and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(payload[i:j]))
        i = j
    return magic, vals[0], vals[1], vals[2], i + 1  # one whitespace after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> uint8 (h, w, 3); binary PGM (P5) -> uint8 (h, w)."""
    magic, w, h, maxval, off = _parse_pnm_header(payload)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, 3) if ch == 3 else data.reshape(h, w)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize as ONE numpy gather (rows then cols) — the
    real resize kernel, no loops, no libs."""
    h, w = img.shape[:2]
    ri = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    ci = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ri][:, ci]


def image_features(payload: bytes, hist_bins: int = 8) -> np.ndarray:
    """Real image features: [h, w, mean R/G/B, std R/G/B] + luminance
    histogram (``hist_bins`` normalized bins).  Grayscale payloads are
    treated as R=G=B.  float32, length ``8 + hist_bins``."""
    img = decode_ppm(payload)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    f = img.astype(np.float32)
    lum = 0.2126 * f[:, :, 0] + 0.7152 * f[:, :, 1] + 0.0722 * f[:, :, 2]
    hist, _ = np.histogram(lum, bins=hist_bins, range=(0.0, 255.0))
    hist = hist.astype(np.float32) / max(lum.size, 1)
    head = np.array(
        [img.shape[0], img.shape[1], *f.mean(axis=(0, 1)), *f.std(axis=(0, 1))],
        dtype=np.float32,
    )
    return np.concatenate([head, hist])
