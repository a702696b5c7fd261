"""Content hashing — the per-row invariant of the engine.

Reference semantics: ``text_sha256`` / ``_hash_string`` (``refseq_io.py:216-221``,
``utils/calculate_hash.py:10-11``), ``normalize_multiline_text``
(``refseq_io.py:71-75``), and the order-independent set hash ``HashSeqList``
(``utils/calculate_hash.py:33-45``).  sha256 has no Arrow kernel, so the hash
loop is per-row Python calling OpenSSL's C sha256 — wrapped in a vectorized
``map_batches`` stage so everything around it stays zero-copy Arrow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.core.schemas import SHA_COLUMN


def sha256_hex(text: str) -> str:
    """sha256 hex digest of a string (reference ``_hash_string``)."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def normalize_multiline_text(text: str) -> str:
    """Strip trailing whitespace per line before hashing
    (reference ``refseq_io.py:71-75``)."""
    return "\n".join(line.rstrip() for line in text.splitlines())


def sha256_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """sha256 hex of every element of a string array; null -> null.

    Operates directly on the Arrow utf8 data buffer via memoryview slices —
    no Python ``str`` objects are materialized (the digest runs in C over
    the raw bytes, which are already utf-8)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    _sha = hashlib.sha256
    n = len(arr)
    out = np.empty(n, dtype=object)
    if n == 0:
        return pa.array(out, type=pa.string())
    off0 = arr.offset
    buffers = arr.buffers()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(buffers[1], dtype=odt, count=n + 1 + off0)[off0:]
    data = memoryview(buffers[2])
    if arr.null_count:
        valid = ~np.asarray(arr.is_null())
        for i in range(n):
            if valid[i]:
                out[i] = _sha(data[offsets[i] : offsets[i + 1]]).hexdigest()
    else:
        for i in range(n):
            out[i] = _sha(data[offsets[i] : offsets[i + 1]]).hexdigest()
    return pa.array(out, type=pa.string())


def add_content_sha256(
    batch: pa.Table, column: str = "content", out_column: str = SHA_COLUMN
) -> pa.Table:
    """``map_batches(batch_format="pyarrow")`` stage: append sha256(content).

    Reference parity: ``text_sha256`` applied to each entry's content
    (``refseq_io.py:216-221``); this is the row invariant checked against the
    oracle materialization (BASELINE.json input_hint).
    """
    hashes = sha256_array(batch[column])
    if out_column in batch.column_names:
        batch = batch.drop_columns([out_column])
    return batch.append_column(out_column, hashes)


def set_hash(hashes: list[str] | pa.Array) -> str:
    """Order-independent fingerprint of a set of row hashes: sha256 of the
    sorted, concatenated member hashes (reference ``HashSeqList.hash_value``,
    ``utils/calculate_hash.py:33-45``).
    """
    if isinstance(hashes, (pa.Array, pa.ChunkedArray)):
        hashes = hashes.to_pylist()
    joined = "".join(sorted(h for h in hashes if h is not None))
    return hashlib.sha256(joined.encode("utf-8")).hexdigest()


def table_fingerprint(table: pa.Table, column: str = SHA_COLUMN) -> str:
    """Whole-table set hash over a hash column — used to verify final-state
    convergence independently of row order (FIXTURES.md §6)."""
    return set_hash(table[column])


def rolling_fingerprint(text: str, window: int = 64, base: int = 257, mod: int = (1 << 61) - 1) -> int:
    """Deterministic rolling-hash document fingerprint (Rabin-Karp style):
    min rolling hash over ``window``-byte windows.  Used by
    ``functions/textstats.py`` for document fingerprinting."""
    data = text.encode("utf-8")
    if len(data) <= window:
        h = 0
        for b in data:
            h = (h * base + b) % mod
        return h
    pw = pow(base, window - 1, mod)
    h = 0
    for b in data[:window]:
        h = (h * base + b) % mod
    best = h
    for i in range(window, len(data)):
        h = ((h - data[i - window] * pw) * base + data[i]) % mod
        if h < best:
            best = h
    return best


# ---------------------------------------------------------------------------
# Vectorized rolling fingerprint — bit-identical to `rolling_fingerprint`
# above (golden-tested), but computed over a whole Arrow string array with
# numpy mod-(2^61-1) limb arithmetic instead of a per-row Python byte loop.
#
# Math: the window hash H(i) = sum_j b[i+j] * B^(w-1-j)  (mod p) factors as
#   H(i) = B^(w-1+i) * (P[i+w] - P[i])   where P[k] = sum_{t<k} b[t]*Binv^t,
# so ONE prefix sum over the batch's concatenated utf-8 bytes yields every
# window hash of every row with pure array ops (row boundaries only select
# which windows are taken).  p = 2^61-1 keeps every product under 2^63 after
# a 31-bit limb split, so the whole thing runs in native uint64.
# ---------------------------------------------------------------------------
_FP_P_INT = (1 << 61) - 1
_FP_P = np.uint64(_FP_P_INT)


_LO31 = np.uint64(0x7FFFFFFF)
_LO30 = np.uint64(0x3FFFFFFF)
_U1, _U30, _U31, _U61 = np.uint64(1), np.uint64(30), np.uint64(31), np.uint64(61)


def _mod_p61_ip(x: np.ndarray, t: np.ndarray) -> np.ndarray:
    """In-place x mod (2^61-1); ``t`` is a same-length uint64 scratch.
    Every op writes into an existing buffer — this VM pays heavily for
    fresh large allocations (lazy page faults), so the whole p61 kernel
    family works in a caller-provided arena."""
    np.right_shift(x, _U61, out=t)
    x &= _FP_P
    x += t
    np.right_shift(x, _U61, out=t)
    x &= _FP_P
    x += t
    np.subtract(x, _FP_P, out=x, where=x >= _FP_P)
    return x


def _mulmod_p61_into(a: np.ndarray, b, out: np.ndarray, t1: np.ndarray,
                     t2: np.ndarray, t3: np.ndarray) -> np.ndarray:
    """(a * b) mod (2^61-1) into ``out`` (a, b < p; b array or Python int).
    31-bit limb split: a*b = a1*b1*2^62 + m*2^31 + a0*b0 with
    m = a1*b0 + a0*b1 < 2^62; 2^61 == 1 (mod p) so 2^62 == 2 and
    m*2^31 == (m >> 30) + (m & (2^30-1)) << 31.  Peak partial < 2^63.2,
    native uint64 throughout."""
    np.right_shift(a, _U31, out=t1)        # t1 = a1 (< 2^30)
    np.bitwise_and(a, _LO31, out=t2)       # t2 = a0
    if isinstance(b, np.ndarray):
        b1 = b >> _U31  # noqa — small, reused twice; kept simple
        np.bitwise_and(b, _LO31, out=t3)   # t3 = b0
        np.multiply(t1, t3, out=out)       # a1*b0
        np.multiply(t2, t3, out=t3)        # a0*b0
        t2 *= b1                           # a0*b1
        out += t2                          # m
        t1 *= b1                           # a1*b1
    else:
        s1, s0 = np.uint64(int(b) >> 31), np.uint64(int(b) & 0x7FFFFFFF)
        np.multiply(t1, s0, out=out)       # a1*b0
        np.multiply(t2, s0, out=t3)        # a0*b0
        t2 *= s1                           # a0*b1
        out += t2                          # m
        t1 *= s1                           # a1*b1
    t1 <<= _U1                             # 2*a1*b1
    np.right_shift(out, _U30, out=t2)      # m >> 30
    out &= _LO30
    out <<= _U31                           # (m & lo30) << 31
    out += t2
    out += t1
    out += t3                              # + a0*b0
    return _mod_p61_ip(out, t1)


def _pow_table_p61(base: int, n: int, out: np.ndarray | None = None) -> np.ndarray:
    """[base^0, ..., base^(n-1)] mod 2^61-1, log-doubling inside one buffer."""
    if out is None:
        out = np.empty(n, dtype=np.uint64)
    t = np.empty((3, n), dtype=np.uint64)
    out[:1] = 1
    k = 1
    while k < n:
        m = min(k, n - k)
        step = pow(base, k, _FP_P_INT)
        _mulmod_p61_into(out[:m], step, out[k : k + m], t[0, :m], t[1, :m], t[2, :m])
        k += m
    return out


def _mulmod_p61(a, b) -> np.ndarray:
    """Convenience wrapper (allocates); hot paths use the ``_into`` form."""
    a = np.asarray(a, dtype=np.uint64)
    n = len(a)
    t = np.empty((4, n), dtype=np.uint64)
    b_arr = b if isinstance(b, np.ndarray) else int(b)
    return _mulmod_p61_into(a, b_arr, t[0], t[1], t[2], t[3]).copy()


def rolling_fingerprint_batch(
    arr: pa.Array | pa.ChunkedArray, window: int = 64, base: int = 257
) -> pa.Array:
    """Vectorized `rolling_fingerprint` over an Arrow string array
    (null -> fingerprint of "", i.e. 0 — matching the callers' ``t or ''``).
    Bit-identical to the scalar version; see the block comment above."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.uint64())
    arr = pc.fill_null(arr, "")
    off0 = arr.offset
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt, count=n + 1 + off0)[off0:]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
    offs = (offs - offs[0]).astype(np.int64)
    total = len(data)

    binv = pow(base, _FP_P_INT - 2, _FP_P_INT)
    lens = np.diff(offs)
    # Row-LOCAL powers: the prefix below is global, but every window span
    # P[g+w]-P[g] stays inside one row, so other rows' terms cancel and the
    # power tables only need max_row_len + window entries (cache-resident
    # gathers instead of two total_bytes-long table builds).
    tbl_n = int(lens.max() if n else 0) + window + 1
    pow_b = _pow_table_p61(base, tbl_n)
    pow_binv = _pow_table_p61(binv, tbl_n)
    arena = np.empty((5, max(total, 1)), dtype=np.uint64)
    w0, w1, w2, w3, w4 = arena
    pos_local = np.arange(total, dtype=np.int64)
    pos_local -= np.repeat(offs[:-1], lens)
    v = w0[:total]
    v[:] = pow_binv[pos_local]
    _mulmod_p61_into(data.astype(np.uint64), v, v, w1[:total], w2[:total], w3[:total])
    # P[k] = sum_{t<k} b[t]*Binv^t mod p, via 32-bit-limb cumsums (the raw
    # terms are 61-bit so a direct uint64 cumsum would overflow).
    np.bitwise_and(v, np.uint64(0xFFFFFFFF), out=w1[:total])
    cs_lo = np.cumsum(w1[:total], out=w1[:total])
    np.right_shift(v, np.uint64(32), out=w2[:total])
    cs_hi = np.cumsum(w2[:total], out=w2[:total])
    _mod_p61_ip(cs_hi, w3[:total])
    _mod_p61_ip(cs_lo, w3[:total])
    prefix = np.zeros(total + 1, dtype=np.uint64)
    _mulmod_p61_into(cs_hi, (1 << 32) % _FP_P_INT, prefix[1:],
                     w3[:total], w4[:total], v)
    prefix[1:] += cs_lo
    _mod_p61_ip(prefix[1:], w3[:total])

    def _window_hash(g: np.ndarray, w, local) -> np.ndarray:
        """Hash of the w-byte window at global start g, row-local index
        ``local`` (g - row_start): H = B^(local+w-1) * (P[g+w] - P[g])."""
        span = prefix[g + w]
        span += _FP_P
        span -= prefix[g]
        m = len(span)
        _mod_p61_ip(span, arena[0, :m])
        return _mulmod_p61_into(pow_b[local + w - 1], span, span,
                                arena[1, :m], arena[2, :m], arena[3, :m])

    out = np.zeros(n, dtype=np.uint64)
    short = (lens > 0) & (lens <= window)
    if short.any():
        out[short] = _window_hash(offs[:-1][short], lens[short], np.int64(0))
    long_rows = np.where(lens > window)[0]
    if len(long_rows):
        nw = lens[long_rows] - window + 1
        seg = np.zeros(len(nw) + 1, dtype=np.int64)
        np.cumsum(nw, out=seg[1:])
        idx = np.arange(seg[-1], dtype=np.int64)
        local = idx - np.repeat(seg[:-1], nw)
        g = np.repeat(offs[long_rows], nw) + local
        hashes = _window_hash(g, window, local)
        out[long_rows] = np.minimum.reduceat(hashes, seg[:-1])
    return pa.array(out, type=pa.uint64())


def char_window_hashes(
    arr: pa.Array | pa.ChunkedArray, k: int, base: int = 257
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Polynomial hash of EVERY ``k``-byte window of every row — the
    position-preserving sibling of :func:`rolling_fingerprint_batch`
    (same prefix-sum construction, same per-window H as
    ``rolling_fingerprint`` over a ``k``-byte string, golden-tested
    against it), feeding substring-level duplicate detection
    (``functions/substrings.py``).

    Returns ``(row_of, pos, hash)`` — parallel arrays with one entry per
    window: the row index within ``arr``, the 0-based BYTE offset of the
    window start (== character offset for ASCII text), and the uint64
    hash mod 2^61-1.  Rows shorter than ``k`` bytes (and nulls) emit
    nothing, matching a SQL twin's ``WHERE length(text) >= k``."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.uint64))
    if n == 0:
        return empty
    arr = pc.fill_null(arr, "")
    off0 = arr.offset
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt, count=n + 1 + off0)[off0:]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
    offs = (offs - offs[0]).astype(np.int64)
    total = len(data)
    lens = np.diff(offs)
    rows = np.where(lens >= k)[0]
    if len(rows) == 0 or total == 0:
        return empty

    binv = pow(base, _FP_P_INT - 2, _FP_P_INT)
    tbl_n = int(lens.max()) + k + 1
    pow_b = _pow_table_p61(base, tbl_n)
    pow_binv = _pow_table_p61(binv, tbl_n)
    arena = np.empty((5, max(total, 1)), dtype=np.uint64)
    w1, w2, w3, w4 = arena[1], arena[2], arena[3], arena[4]
    pos_local_all = np.arange(total, dtype=np.int64)
    pos_local_all -= np.repeat(offs[:-1], lens)
    v = arena[0, :total]
    v[:] = pow_binv[pos_local_all]
    _mulmod_p61_into(data.astype(np.uint64), v, v, w1[:total], w2[:total], w3[:total])
    np.bitwise_and(v, np.uint64(0xFFFFFFFF), out=w1[:total])
    cs_lo = np.cumsum(w1[:total], out=w1[:total])
    np.right_shift(v, np.uint64(32), out=w2[:total])
    cs_hi = np.cumsum(w2[:total], out=w2[:total])
    _mod_p61_ip(cs_hi, w3[:total])
    _mod_p61_ip(cs_lo, w3[:total])
    prefix = np.zeros(total + 1, dtype=np.uint64)
    _mulmod_p61_into(cs_hi, (1 << 32) % _FP_P_INT, prefix[1:],
                     w3[:total], w4[:total], v)
    prefix[1:] += cs_lo
    _mod_p61_ip(prefix[1:], w3[:total])

    nw = lens[rows] - k + 1
    seg = np.zeros(len(nw) + 1, dtype=np.int64)
    np.cumsum(nw, out=seg[1:])
    idx = np.arange(seg[-1], dtype=np.int64)
    local = idx - np.repeat(seg[:-1], nw)
    g = np.repeat(offs[rows], nw) + local
    span = prefix[g + k]
    span += _FP_P
    span -= prefix[g]
    m = len(span)
    _mod_p61_ip(span, arena[0, :m] if m <= total else np.empty(m, np.uint64))
    scratch = np.empty((3, m), dtype=np.uint64)
    hashes = _mulmod_p61_into(pow_b[local + k - 1], span, span,
                              scratch[0], scratch[1], scratch[2])
    row_of = np.repeat(rows, nw)
    return row_of, local, hashes.copy()


def non_null_count(batch: pa.Table, column: str) -> int:
    """Vectorized non-null count helper (``pc.count``)."""
    return pc.count(batch[column], mode="only_valid").as_py()
