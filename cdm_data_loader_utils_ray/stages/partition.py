"""Explicit key partitioning with hot-key salting.

All events for an upsert key ``(repo, path)`` must meet the same state shard
(SURVEY §7.4).  Ray Data's ``groupby`` hash-partitions for us, but the engine
computes its own stable partition id so that (a) lake partition layout is
deterministic across runs/processes (resume!), and (b) hot keys can be salted
into sub-partitions explicitly (north_rule: "explicit salted-key
repartitioning to defuse hot-repo skew").

The hash must be stable across Python processes — ``hash()`` is salted by
PYTHONHASHSEED, so we use pandas' deterministic ``hash_pandas_object``
(vectorized SipHash with a fixed key) over the concatenated key columns.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.core.schemas import KEY_COLUMNS, PARTITION_COLUMN


def stable_key_hash(batch: pa.Table, key_columns: Sequence[str]) -> np.ndarray:
    """uint64 deterministic hash of the composite key.

    CRC32-chained over the raw Arrow utf8 buffers (no Python string
    objects), mixed into 64 bits.  Must stay STABLE across releases: the
    lake's partition layout depends on it (a change would orphan committed
    partition files on resume)."""
    from zlib import crc32

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
    off0 = key.offset
    buffers = key.buffers()
    odt = np.int64 if pa.types.is_large_string(key.type) else np.int32
    offsets = np.frombuffer(buffers[1], dtype=odt, count=n + 1 + off0)[off0:]
    data = memoryview(buffers[2])
    if key.null_count:
        valid = ~np.asarray(key.is_null())
        for i in range(n):
            out[i] = crc32(data[offsets[i] : offsets[i + 1]]) if valid[i] else 0
    else:
        for i in range(n):
            out[i] = crc32(data[offsets[i] : offsets[i + 1]])
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
