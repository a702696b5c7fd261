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

# module level, not lazy: decode_image runs inside worker tasks, where a
# lazy intra-package import would re-import the package without an import
# path (the by-value serialization contract — see CLAUDE.md)
from cdm_data_loader_utils_ray.functions.jpeg import decode_jpeg

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


# ---------------------------------------------------------------------------
# PNG — REAL decode/encode with stdlib zlib (RFC 2083): chunk framing +
# CRC, DEFLATE via zlib, and the five scanline filters.  Supported: 8-bit
# greyscale (color type 0), RGB (2) and RGBA (6), non-interlaced — the
# overwhelming majority of real-world PNGs outside palette images.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) / (h, w, 3) / (h, w, 4) -> PNG bytes (filter 0,
    stdlib zlib DEFLATE)."""
    import struct
    import zlib

    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = a.shape[:2]
    # filter byte 0 (None) per scanline, vectorized prepend
    rows = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    rows[:, 1:] = a.reshape(h, w * ch)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(rows.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) for greyscale, (h, w, 3|4) for
    RGB/RGBA.  Validates chunk CRCs; all five scanline filters (None,
    Sub, Up, Average, Paeth) are undone — Sub/Average/Paeth carry a
    within-row dependency, so those rows reconstruct with a per-pixel
    walk over numpy rows (Up/None stay fully vectorized)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = []
    h = bit_depth = color = interlace = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, bit_depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color={color}, "
            f"interlace={interlace}): 8-bit grey/RGB/RGBA non-interlaced only"
        )
    ch = _PNG_CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * ch
    if len(raw) != h * stride:
        raise ValueError("PNG IDAT size mismatch")
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = np.zeros((h, w * ch), dtype=np.uint8)
    for y in range(h):
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(w * ch, np.int32)
        f = filters[y]
        if f == 0:  # None
            rec = cur
        elif f == 2:  # Up — vectorized
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-dependency walk
            rec = np.zeros(w * ch, dtype=np.int32)
            for i in range(w * ch):
                left = rec[i - ch] if i >= ch else 0
                up = prev[i]
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    ul = (prev[i - ch] if i >= ch else 0)
                    p = left + up - ul
                    pa, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc_) else (
                        up if pb <= pc_ else ul
                    )
                rec[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize as ONE numpy gather (rows then cols) — the
    real resize kernel, no loops, no libs."""
    h, w = img.shape[:2]
    ri = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    ci = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ri][:, ci]


# ---------------------------------------------------------------------------
# BMP — REAL decode/encode (Windows BITMAPINFOHEADER, uncompressed
# BI_RGB): 24-bit BGR and 32-bit BGRA, bottom-up or top-down rows,
# 4-byte row padding.
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> 24-bit bottom-up BMP bytes."""
    import struct

    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return hdr + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> uint8 (h, w, 3) RGB (alpha dropped)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    (_sig, _size, _r1, _r2, off) = struct.unpack("<2sIHHI", payload[:14])
    (hsz, w, h, _planes, bpp, comp) = struct.unpack("<IiiHHI", payload[14:34])
    if hsz < 40 or comp != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (header={hsz}, bpp={bpp}, compression={comp}): "
            "uncompressed 24/32-bit only"
        )
    topdown = h < 0
    h = abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    raw = np.frombuffer(payload, np.uint8, stride * h, off).reshape(h, stride)
    px = raw[:, : w * ch].reshape(h, w, ch)
    if not topdown:
        px = px[::-1]
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) -> RGB


# ---------------------------------------------------------------------------
# GIF — REAL first-frame decode/encode (GIF87a/89a): LZW with variable
# code width, global/local color tables, interlace; extensions skipped.
# ---------------------------------------------------------------------------


def _gif_lzw_decode(min_code: int, data: bytes, expect: int) -> np.ndarray:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = np.empty(expect, dtype=np.uint8)
    n_out = 0
    # dictionary as (prefix_code, last_byte); roots are -1-prefixed
    prefix = np.full(4096, -1, dtype=np.int32)
    last = np.zeros(4096, dtype=np.uint8)
    for c in range(clear):
        last[c] = c

    def emit(code: int) -> int:
        # walk the chain, write reversed
        nonlocal n_out
        chain = []
        c = code
        while c >= 0:
            chain.append(last[c])
            c = prefix[c]
        ln = len(chain)
        if n_out + ln > expect:
            raise ValueError("GIF LZW output overflow")
        out[n_out:n_out + ln] = chain[::-1]
        n_out += ln
        return chain[-1]  # first byte of the expansion

    next_code = eoi + 1
    width = min_code + 1
    acc = bit = 0
    prev = -1
    for byte in data:
        acc |= byte << bit
        bit += 8
        while bit >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bit -= width
            if code == clear:
                next_code, width, prev = eoi + 1, min_code + 1, -1
                continue
            if code == eoi:
                return out[:n_out]
            if prev < 0:
                emit(code)
                prev = code
                continue
            if code < next_code:
                first = emit(code)
            elif code == next_code:
                # KwKwK case: chain = prev expansion + its first byte
                c = prev
                while prefix[c] >= 0:
                    c = prefix[c]
                first = last[c]
                if next_code < 4096:
                    prefix[next_code] = prev
                    last[next_code] = first
                emit(code)
                prev = code
                if next_code < 4095:
                    next_code += 1
                    if next_code == (1 << width) and width < 12:
                        width += 1
                continue
            else:
                raise ValueError("corrupt GIF LZW stream")
            if next_code < 4096:
                prefix[next_code] = prev
                last[next_code] = first
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = code
    return out[:n_out]


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a -> uint8 (h, w, 3) via the color
    table; interlaced frames are deinterlaced."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF (bad signature)")
    import struct

    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: introducer, label, sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack("<HHHHB", payload[pos + 1:pos + 10])
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(min_code, b"".join(chunks), w * h)
            if len(idx) < w * h:
                raise ValueError("GIF frame truncated")
            grid = idx[:w * h].reshape(h, w)
            if iflags & 0x40:  # interlaced: rows in 4 passes
                order = np.concatenate([
                    np.arange(0, h, 8), np.arange(4, h, 8),
                    np.arange(2, h, 4), np.arange(1, h, 2),
                ])
                de = np.empty_like(grid)
                de[order] = grid
                grid = de
            return ct[grid]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    raise ValueError("GIF contains no image frame")


def encode_gif(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) with <= 256 distinct colors -> single-frame GIF89a
    (real LZW compression)."""
    import struct

    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) RGB")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF needs <= 256 colors, got {len(colors)}")
    depth = max(1, int(len(colors) - 1).bit_length())
    table = np.zeros((2 ** depth, 3), dtype=np.uint8)
    table[:len(colors)] = colors
    min_code = max(2, depth)
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    codes: list[tuple[int, int]] = [(clear, min_code + 1)]
    dic = {}
    next_code = eoi + 1
    width = min_code + 1
    cur = int(idx[0])
    for px in idx[1:]:
        px = int(px)
        key = (cur, px)
        if key in dic:
            cur = dic[key]
            continue
        codes.append((cur, width))
        if next_code < 4096:
            dic[key] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            codes.append((clear, width))
            dic.clear()
            next_code = eoi + 1
            width = min_code + 1
        cur = px
    codes.append((cur, width))
    codes.append((eoi, width))
    acc = bit = 0
    raw = bytearray()
    for code, wd in codes:
        acc |= code << bit
        bit += wd
        while bit >= 8:
            raw.append(acc & 0xFF)
            acc >>= 8
            bit -= 8
    if bit:
        raw.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(min_code)
    for i in range(0, len(raw), 255):
        chunk = raw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff-and-decode: PNG (signature), baseline JPEG (SOI) or PPM/PGM
    (magic) -> uint8 array.  The one entry point the feature extractors
    use."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:4] == b"GIF8":
        return decode_gif(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    return decode_ppm(payload)


def image_features(payload: bytes, hist_bins: int = 8) -> np.ndarray:
    """Real image features: [h, w, mean R/G/B, std R/G/B] + luminance
    histogram (``hist_bins`` normalized bins).  Grayscale payloads are
    treated as R=G=B; RGBA drops alpha.  float32, length
    ``8 + hist_bins``."""
    img = decode_image(payload)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    elif img.shape[2] == 4:
        img = img[:, :, :3]
    f = img.astype(np.float32)
    lum = 0.2126 * f[:, :, 0] + 0.7152 * f[:, :, 1] + 0.0722 * f[:, :, 2]
    hist, _ = np.histogram(lum, bins=hist_bins, range=(0.0, 255.0))
    hist = hist.astype(np.float32) / max(lum.size, 1)
    head = np.array(
        [img.shape[0], img.shape[1], *f.mean(axis=(0, 1)), *f.std(axis=(0, 1))],
        dtype=np.float32,
    )
    return np.concatenate([head, hist])
