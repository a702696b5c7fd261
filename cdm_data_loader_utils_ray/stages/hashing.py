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


def non_null_count(batch: pa.Table, column: str) -> int:
    """Vectorized non-null count helper (``pc.count``)."""
    return pc.count(batch[column], mode="only_valid").as_py()
