"""REAL baseline JPEG codec — pure stdlib + numpy (ITU T.81 baseline
sequential DCT, JFIF framing).

Scope (the formats real crawls overwhelmingly contain):

* decode: baseline SOF0, 8-bit, 1 or 3 components, chroma sampling
  4:4:4 / 4:2:2 / 4:2:0 (h,v factors in {1,2}), restart intervals
  (DRI/RSTn); progressive (SOF2) and arithmetic coding are rejected
  with a clear error.
* encode: baseline, 4:4:4, Annex-K quantization tables scaled by
  ``quality``, Annex-K standard Huffman tables.

JPEG is lossy: tests pin round-trip PSNR and structural exactness
(dimensions, channel count), not byte equality.  The DCT is an exact
8x8 matrix product (numpy), entropy coding is a plain Python bit
walk — correctness-first, speed-second (the actor-pool batches are
small by design for media payloads)."""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag order, Annex-K tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman specs: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# exact 8x8 DCT-II orthonormal matrix
_k = np.arange(8)
_D = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0)
_D[0, :] = np.sqrt(1.0 / 8.0)


def _huff_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} per T.81 C.2."""
    out, code = {}, 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decode_table(bits, values):
    """(bits, values) -> {(length, code): symbol} for the bit walk."""
    table, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _quality_tables(quality: int):
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_Q_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((_Q_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int64), qc.astype(np.int64)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-bits padding per spec

    def restart(self, i: int):
        """Byte-align and emit RSTn (n = i mod 8) — unstuffed marker."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (i % 8)])


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per T.81 F.1.2.1 (one's-complement negatives)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = int(a).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _pad_plane(p: np.ndarray, H: int, W: int) -> np.ndarray:
    h, w = p.shape
    pp = np.empty((H, W))
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1:h, :w]
    pp[:, w:] = pp[:, w - 1:w]
    return pp


def _encode_block(bw, block, qt, dc_tab, ac_tab, prev_dc: int) -> int:
    coef = _D @ block @ _D.T
    q = np.rint(coef / qt).astype(np.int64).reshape(-1)[ZIGZAG]
    dc_diff = int(q[0]) - prev_dc
    size, bits = _magnitude(dc_diff)
    code, ln = dc_tab[size]
    bw.put(code, ln)
    if size:
        bw.put(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.put(code, ln)
        bw.put(bits, size)
        run = 0
    if run:
        code, ln = ac_tab[0x00]  # EOB
        bw.put(code, ln)
    return int(q[0])


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: "bool | str" = False,
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w) greyscale or (h, w, 3) RGB -> baseline JFIF bytes
    (Annex-K Huffman tables).  ``subsample``: False = 4:4:4,
    True / ``'420'`` = 4:2:0 chroma (2x2-mean downsample, interleaved
    4Y+Cb+Cr MCUs — the layout most real-world JPEGs use),
    ``'422'`` = 4:2:2 (horizontal-only 2x1 mean, 2Y+Cb+Cr MCUs).
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers every
    N MCUs (error-resilience framing real encoders emit; also exercises
    the decoder's resync)."""
    a = np.asarray(img, dtype=np.uint8)
    grey = a.ndim == 2
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    mode = {False: None, True: "420", "420": "420", "422": "422"}[subsample]
    ql, qc = _quality_tables(quality)
    dc_tabs = [_huff_codes(*_DC_LUMA), _huff_codes(*_DC_CHROMA)]
    ac_tabs = [_huff_codes(*_AC_LUMA), _huff_codes(*_AC_CHROMA)]
    bw = _BitWriter()

    if not grey and mode == "422":
        ncomp = 3
        samp = [0x21, 0x11, 0x11]
        ycc = _rgb_to_ycbcr(a)
        H, W = (h + 7) // 8 * 8, (w + 15) // 16 * 16
        y = _pad_plane(ycc[:, :, 0] - 128.0, H, W)
        cb_full = _pad_plane(ycc[:, :, 1] - 128.0, H, W)
        cr_full = _pad_plane(ycc[:, :, 2] - 128.0, H, W)
        cb = cb_full.reshape(H, W // 2, 2).mean(axis=2)
        cr = cr_full.reshape(H, W // 2, 2).mean(axis=2)
        prev = {"y": 0, "cb": 0, "cr": 0}
        n_mcu = 0
        for my in range(H // 8):
            for mx in range(W // 16):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    bw.restart(n_mcu // restart_interval - 1)
                    prev = {"y": 0, "cb": 0, "cr": 0}
                n_mcu += 1
                by = my * 8
                for hh in range(2):
                    bx = mx * 16 + hh * 8
                    prev["y"] = _encode_block(
                        bw, y[by:by + 8, bx:bx + 8], ql,
                        dc_tabs[0], ac_tabs[0], prev["y"],
                    )
                cx = mx * 8
                prev["cb"] = _encode_block(
                    bw, cb[by:by + 8, cx:cx + 8], qc,
                    dc_tabs[1], ac_tabs[1], prev["cb"],
                )
                prev["cr"] = _encode_block(
                    bw, cr[by:by + 8, cx:cx + 8], qc,
                    dc_tabs[1], ac_tabs[1], prev["cr"],
                )
    elif grey or mode is None:
        if grey:
            planes = [a.astype(np.float64) - 128.0]
            qts, ncomp = [ql], 1
        else:
            ycc = _rgb_to_ycbcr(a)
            planes = [ycc[:, :, i] - 128.0 for i in range(3)]
            qts, ncomp = [ql, qc, qc], 3
        samp = [0x11] * ncomp
        H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        padded = [_pad_plane(p, H, W) for p in planes]
        prev_dc = [0] * ncomp
        n_mcu = 0
        for by in range(0, H, 8):
            for bx in range(0, W, 8):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    bw.restart(n_mcu // restart_interval - 1)
                    prev_dc = [0] * ncomp
                n_mcu += 1
                for ci in range(ncomp):
                    t = 0 if ci == 0 else 1
                    prev_dc[ci] = _encode_block(
                        bw, padded[ci][by:by + 8, bx:bx + 8], qts[ci],
                        dc_tabs[t], ac_tabs[t], prev_dc[ci],
                    )
    else:
        ncomp = 3
        samp = [0x22, 0x11, 0x11]
        ycc = _rgb_to_ycbcr(a)
        H, W = (h + 15) // 16 * 16, (w + 15) // 16 * 16
        y = _pad_plane(ycc[:, :, 0] - 128.0, H, W)
        cb_full = _pad_plane(ycc[:, :, 1] - 128.0, H, W)
        cr_full = _pad_plane(ycc[:, :, 2] - 128.0, H, W)
        # 2x2 mean downsample
        cb = cb_full.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        cr = cr_full.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        prev = {"y": 0, "cb": 0, "cr": 0}
        n_mcu = 0
        for my in range(H // 16):
            for mx in range(W // 16):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    bw.restart(n_mcu // restart_interval - 1)
                    prev = {"y": 0, "cb": 0, "cr": 0}
                n_mcu += 1
                for v in range(2):
                    for hh in range(2):
                        by, bx = my * 16 + v * 8, mx * 16 + hh * 8
                        prev["y"] = _encode_block(
                            bw, y[by:by + 8, bx:bx + 8], ql,
                            dc_tabs[0], ac_tabs[0], prev["y"],
                        )
                cy, cx = my * 8, mx * 8
                prev["cb"] = _encode_block(
                    bw, cb[cy:cy + 8, cx:cx + 8], qc,
                    dc_tabs[1], ac_tabs[1], prev["cb"],
                )
                prev["cr"] = _encode_block(
                    bw, cr[cy:cy + 8, cx:cx + 8], qc,
                    dc_tabs[1], ac_tabs[1], prev["cr"],
                )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = ql.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    out += seg(0xFFDB, b"\x00" + zz_l)
    if not grey:
        zz_c = qc.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xFFDB, b"\x01" + zz_c)
    comp = b""
    for ci in range(ncomp):
        comp += bytes([ci + 1, samp[ci], 0 if ci == 0 else 1])
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + comp)
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)
    ):
        if grey and tid == 1:
            continue
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Bit walk over an entropy-coded segment; un-stuffs 0xFF00 and stops
    cleanly at markers (RSTn handled by the caller via resync)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            if self.pos >= len(self.d):
                self.acc = (self.acc << 8) | 0
                self.n += 8
                continue
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
                # a real marker: feed zeros (decode must finish first)
                self.acc = (self.acc << 8) | 0
                self.n += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        # truncate consumed high bits: without this the accumulator grows
        # as an unbounded Python bigint over long streams (every shift
        # gets slower as the image gets bigger)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def resync(self):
        """Skip to just past the next RSTn marker, resetting bit state."""
        self.acc = 0
        self.n = 0
        d, i = self.d, self.pos
        while i + 1 < len(d):
            if d[i] == 0xFF and 0xD0 <= d[i + 1] <= 0xD7:
                self.pos = i + 2
                return
            i += 1
        self.pos = len(d)


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h, w) or (h, w, 3)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                tab = _huff_decode_table(bits, vals)
                (dc_tables if cls == 0 else ac_tables)[tid] = tab
                i += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG SOF marker 0xFF{marker:02X} "
                "(baseline sequential SOF0 only)"
            )
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            sel = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                sel.append((cs, tt >> 4, tt & 0xF))
            scan = (sel, pos + 2 + ln)
            break
        pos += 2 + ln
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    sel, data_start = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2 unsupported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux = (w + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h
    planes = {}
    for cid, ch, cv, tq in comps:
        planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
    br = _BitReader(payload[data_start:])
    prev_dc = {cid: 0 for cid, *_ in comps}
    order = {cid: (dct, act) for cid, dct, act in sel}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                br.resync()
                for cid in prev_dc:
                    prev_dc[cid] = 0
            n_mcu += 1
            for cid, ch, cv, tq in comps:
                dct, act = order[cid]
                for v in range(cv):
                    for hh in range(ch):
                        size = br.huff(dc_tables[dct])
                        diff = _extend(br.bits(size), size)
                        dc = prev_dc[cid] + diff
                        prev_dc[cid] = dc
                        q = np.zeros(64, dtype=np.int64)
                        q[0] = dc
                        k = 1
                        while k < 64:
                            rs = br.huff(ac_tables[act])
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            q[k] = _extend(br.bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = q
                        coef = blk.reshape(8, 8) * qt[tq]
                        pix = _D.T @ coef @ _D + 128.0
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch + hh) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = pix
    # upsample each component to full resolution and crop
    full = []
    for cid, ch, cv, tq in comps:
        p = planes[cid]
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(full[0], full[1], full[2])
