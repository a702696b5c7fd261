"""Explicit key partitioning with hot-key salting.

All events for an upsert key ``(repo, path)`` must meet the same state shard
(SURVEY §7.4).  Ray Data's ``groupby`` hash-partitions for us, but the engine
computes its own stable partition id so that (a) lake partition layout is
deterministic across runs/processes (resume!), and (b) hot keys can be salted
into sub-partitions explicitly (north_rule: "explicit salted-key
repartitioning to defuse hot-repo skew").

The hash must be stable across Python processes — ``hash()`` is salted by
PYTHONHASHSEED, so we use a deterministic CRC32 (zlib polynomial) of the
raw key bytes, computed VECTORIZED across the batch (table-driven CRC over
the Arrow offsets/data buffers in numpy), then spread to 64 bits.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.core.schemas import KEY_COLUMNS, PARTITION_COLUMN


def _crc32_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Slicing-by-4 tables for the standard reflected CRC-32 (zlib/IEEE,
    poly 0xEDB88320)."""
    t0 = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t0 = np.where(t0 & 1, (t0 >> 1) ^ np.uint32(0xEDB88320), t0 >> 1)
    ts = [t0]
    for _ in range(3):
        p = ts[-1]
        ts.append((p >> np.uint32(8)) ^ t0[p & np.uint32(0xFF)])
    return ts[0], ts[1], ts[2], ts[3]


_T0, _T1, _T2, _T3 = _crc32_tables()
# strings longer than this fall back to zlib's C loop (vectorizing across
# rows pays off only when many rows share each byte position)
_LONG_KEY = 256


def _crc32_rows(data: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """zlib.crc32 of ``data[starts[i] : starts[i]+lengths[i]]`` for every row,
    VECTORIZED across rows (slicing-by-4): word position w is processed for
    all still-active rows at once — rows sorted by length descending so the
    active set is a shrinking prefix — with 4 message bytes consumed per
    round via an overlapping little-endian uint32 view of the data buffer.
    Rows longer than ``_LONG_KEY`` use zlib's C loop (few rows share those
    byte positions).  Byte-identical to per-row ``zlib.crc32``."""
    from zlib import crc32

    n = len(starts)
    out = np.empty(n, dtype=np.uint32)
    if n == 0:
        return out
    order = np.argsort(lengths, kind="stable")[::-1]
    st = starts[order].astype(np.int64)
    ln = lengths[order].astype(np.int64)
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    k = int(np.searchsorted(-ln, -_LONG_KEY))  # rows with len > _LONG_KEY
    mv = data.data
    for i in range(k):
        crc[i] = np.uint32(crc32(mv[st[i] : st[i] + ln[i]])) ^ np.uint32(0xFFFFFFFF)
    if k < n:
        stv, lnv = st[k:], ln[k:]
        nv = n - k
        cv = crc[k:]
        idx = stv.copy()
        nwords = lnv >> 2
        maxw = int(nwords[0]) if nv else 0
        if maxw and len(data) >= 4:
            # overlapping unaligned uint32 window at every byte offset
            dword = np.ndarray(
                buffer=data, shape=(len(data) - 3,), dtype=np.uint32, strides=(1,)
            )
            asc_w = nwords[::-1]
            for w in range(maxw):
                m = nv - int(np.searchsorted(asc_w, w, side="right"))
                if m == 0:
                    break
                c = cv[:m]
                c ^= dword[idx[:m]]
                cv[:m] = (
                    _T3[c & np.uint32(0xFF)]
                    ^ _T2[(c >> np.uint32(8)) & np.uint32(0xFF)]
                    ^ _T1[(c >> np.uint32(16)) & np.uint32(0xFF)]
                    ^ _T0[c >> np.uint32(24)]
                )
                idx[:m] += 4
        rem = lnv & 3
        for t in range(3):
            sel = np.flatnonzero(rem > t)
            if len(sel) == 0:
                break
            b = data[idx[sel] + t]
            c = cv[sel]
            cv[sel] = _T0[(c ^ b) & np.uint32(0xFF)] ^ (c >> np.uint32(8))
    crc ^= np.uint32(0xFFFFFFFF)
    res = np.empty(n, dtype=np.uint32)
    res[order] = crc
    return res


def stable_key_hash(batch: pa.Table, key_columns: Sequence[str]) -> np.ndarray:
    """uint64 deterministic hash of the composite key.

    CRC32 over the raw Arrow utf8 buffers (no Python string objects),
    vectorized across the batch (``_crc32_rows``), mixed into 64 bits.
    Must stay STABLE across releases: the lake's partition layout depends
    on it (a change would orphan committed partition files on resume) —
    ``tests/test_stages.py`` pins golden values."""
    key = batch.column(key_columns[0])
    if len(key_columns) > 1:
        # binary_join_element_wise treats its LAST argument as the separator:
        # the parts come first, then ONE '\x1f' scalar (r2 fix: r1 passed the
        # separator interleaved, which made the last part the separator and
        # concatenated keys without a delimiter — ('ab','c') == ('a','bc')).
        # Hash frozen again as of r2.
        parts = [batch.column(c).cast(pa.string()) for c in key_columns]
        key = pc.binary_join_element_wise(*parts, pa.scalar("\x1f"))
    else:
        key = key.cast(pa.string())
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    n = len(key)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    # CDC batches repeat keys heavily (hot repos, LWW streams): hash each
    # DISTINCT key once and gather — dictionary_encode is an Arrow C++
    # hash-table build, far cheaper than redundant CRC work
    dict_arr = pc.dictionary_encode(key)
    vals = dict_arr.dictionary
    if len(vals) == 0:  # all-null key column
        out[:] = 0
        return out
    codes = dict_arr.indices.fill_null(0).to_numpy(zero_copy_only=False)
    off0 = vals.offset
    buffers = vals.buffers()
    odt = np.int64 if pa.types.is_large_string(vals.type) else np.int32
    offsets = np.frombuffer(buffers[1], dtype=odt, count=len(vals) + 1 + off0)[off0:]
    data = np.frombuffer(buffers[2], dtype=np.uint8)
    starts = offsets[:-1]
    lengths = offsets[1:] - starts
    uniq = _crc32_rows(data, starts, lengths).astype(np.uint64)
    if key.null_count:
        null_mask = np.asarray(key.is_null())
        out[~null_mask] = uniq[codes[~null_mask]]
        out[null_mask] = 0
    else:
        out[:] = uniq[codes]
    # spread the 32-bit crc across 64 bits (splitmix-style) so modulo by any
    # partition count stays well distributed
    out ^= out << np.uint64(21)
    out *= np.uint64(0x9E3779B97F4A7C15)
    return out


def add_partition_column(
    batch: pa.Table,
    num_partitions: int,
    key_columns: Sequence[str] = KEY_COLUMNS,
    out_column: str = PARTITION_COLUMN,
) -> pa.Table:
    """``map_batches`` stage: append ``_pid = stable_hash(key) % P``."""
    pid = (stable_key_hash(batch, key_columns) % np.uint64(num_partitions)).astype(np.int32)
    if out_column in batch.column_names:
        batch = batch.drop_columns([out_column])
    return batch.append_column(out_column, pa.array(pid, type=pa.int32()))


def add_salted_partition_column(
    batch: pa.Table,
    num_partitions: int,
    hot_keys: dict[str, int],
    key_columns: Sequence[str] = KEY_COLUMNS,
    salt_column: str = "_salt",
    out_column: str = PARTITION_COLUMN,
) -> pa.Table:
    """Two-phase skew handling, pass 1: events of a hot key are fanned out to
    ``hot_keys[key]`` sub-partitions (salt = seq % fanout appended to the
    hash), pre-reduced per sub-partition, then merged per key in pass 2.

    ``hot_keys`` maps ``repo`` -> fanout (hot *repos* dominate in the Zipf
    fixture).  Non-hot rows get salt 0, i.e. the plain partitioning.
    """
    h = stable_key_hash(batch, key_columns)
    repos = batch.column("repo").to_pandas()
    fanout = repos.map(hot_keys).fillna(1).to_numpy(dtype=np.uint64)
    seq = batch.column("seq").to_numpy(zero_copy_only=False).astype(np.uint64)
    salt = np.where(fanout > 1, seq % fanout, 0).astype(np.uint64)
    pid = ((h ^ (salt * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(num_partitions)).astype(
        np.int32
    )
    out = batch
    for c in (salt_column, out_column):
        if c in out.column_names:
            out = out.drop_columns([c])
    out = out.append_column(salt_column, pa.array(salt.astype(np.int32), type=pa.int32()))
    return out.append_column(out_column, pa.array(pid, type=pa.int32()))


def detect_hot_keys(
    sample: pa.Table,
    key_column: str = "repo",
    hot_fraction: float = 0.05,
    max_fanout: int = 8,
) -> dict[str, int]:
    """Driver-side hot-key detection over a sample: any key owning more than
    ``hot_fraction`` of sampled rows gets a proportional fanout (capped).
    Reference has no analogue (single-node); required at 100 TB (SURVEY §4).
    """
    counts = sample.column(key_column).to_pandas().value_counts(normalize=True)
    hot = counts[counts > hot_fraction]
    return {
        str(k): int(min(max_fanout, max(2, round(frac / hot_fraction))))
        for k, frac in hot.items()
    }


def partition_counts(batch: pa.Table, pid_column: str = PARTITION_COLUMN) -> pd.DataFrame:
    """Per-batch partial count by partition (combiner for metrics)."""
    vc = batch.column(pid_column).to_pandas().value_counts()
    return pd.DataFrame({"pid": vc.index.to_numpy(), "n": vc.to_numpy()})


def _spread_bits16(v: np.ndarray, stride: int) -> np.ndarray:
    """Scatter each of the 16 bits of ``v`` to positions ``b * stride``
    (uint64) — the Morton-code building block, vectorized over rows."""
    v = v.astype(np.uint64)
    out = np.zeros_like(v)
    for b in range(16):
        out |= ((v >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * stride)
    return out


def zorder_key(table: pa.Table, columns: Sequence[str]) -> np.ndarray:
    """Z-order (Morton) sort key over 2-4 NUMERIC/TIMESTAMP columns: each
    column is affinely scaled to 16-bit space over ITS range within the
    table, then the bits interleave.  Sorting a file by this key makes
    every row group's min/max TIGHT on all interleaved columns at once —
    multi-column data skipping from one physical order (Delta
    ``OPTIMIZE ZORDER BY`` analogue).

    Per-table scaling is sound because the z-key never leaves this call:
    pruning reads the real column statistics, the key only decides row
    placement.  Nulls/NaNs scale to 0 (cluster first, never dropped)."""
    if not 2 <= len(columns) <= 4:
        raise ValueError("zorder_key wants 2-4 columns")
    k = len(columns)
    z = np.zeros(len(table), dtype=np.uint64)
    for i, c in enumerate(columns):
        col = table[c]
        if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
            col = col.cast(pa.int64())
        if not (pa.types.is_integer(col.type) or pa.types.is_floating(col.type)):
            raise ValueError(f"zorder column {c!r} must be numeric/temporal")
        x = col.to_numpy(zero_copy_only=False).astype(np.float64)
        finite = np.isfinite(x)
        if not finite.any():
            continue
        mn, mx = x[finite].min(), x[finite].max()
        scaled = (
            np.clip((x - mn) / (mx - mn) * 65535.0, 0.0, 65535.0)
            if mx > mn
            else np.zeros_like(x)
        )
        scaled = np.where(finite, scaled, 0.0).astype(np.uint64)
        z |= _spread_bits16(scaled, k) << np.uint64(i)
    return z
