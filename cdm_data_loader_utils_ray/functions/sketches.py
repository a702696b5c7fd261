"""Mergeable sketches — the 100-TB path for corpus-wide aggregates.

Exact distributed operators in this repo (``dedup_exact``,
``grouped_quantiles``, ``distinct_values``) ship rows through a keyed
shuffle; corpus-GLOBAL cardinality or quantiles over 100 TB should not.
Both sketches here follow the combiner discipline used everywhere else:
``map_batches`` produces one tiny partial per batch (a fixed-size numpy
state), and the driver folds the partials — bytes moved are
O(batches x sketch_size), independent of row count.

* :func:`approx_distinct` — HyperLogLog (Flajolet et al. 2007, public
  algorithm) with the standard bias corrections; register array of
  ``2^p`` bytes per partial (16 KiB at p=14, ~0.8% relative error).
* :func:`approx_quantiles` — weighted-sample compression: each partial is
  the batch's equally-spaced order statistics with equal weights; merge
  concatenates and recompresses.  Not a formal KLL bound, but at the
  default k=4096 anchors the observed error on heavy-tailed inputs is
  well under 1% (pytest-asserted) and every step is vectorized.

These return driver-side scalars/dicts by design (a sketch IS a
reduction); there is no oracle_sql() entry because an approximation has
no exact SQL twin — accuracy is asserted in pytest against exact answers.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------
def _hash64(values: pd.Series) -> np.ndarray:
    """Stable-within-run vectorized 64-bit hash of an arbitrary column
    (pandas' cityhash-style object hasher; a sketch needs uniformity, not
    cross-engine stability)."""
    return pd.util.hash_pandas_object(values, index=False).to_numpy(dtype=np.uint64)


def _hll_partial(values: pd.Series, p: int) -> np.ndarray:
    """One batch's HLL register array: registers[i] = max rank of the
    leading-zero count (+1) among hashes routed to register i."""
    m = 1 << p
    h = _hash64(values.dropna())
    regs = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = position of the first 1 bit in `rest` (1-based), capped
    nz = rest != 0
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    # count leading zeros of the 64-bit value via float64 exponent trick is
    # lossy; use log2 on the high 53 bits safely by splitting
    r = rest[nz]
    lz = np.zeros(len(r), dtype=np.uint8)
    cur = r.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += np.uint8(shift)
        cur[mask] = cur[mask] << np.uint64(shift)
    rank[nz] = lz + 1
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def approx_distinct(ds, column: str, p: int = 14, batch_size: int = 65536) -> int:
    """Approximate COUNT(DISTINCT column) via HyperLogLog.  One streaming
    pass; each batch contributes a 2^p-byte register partial; the driver
    folds them with elementwise max (the HLL union — also how per-node
    sketches would merge on a cluster)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = _hll_partial(df[column], p)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in parts.iter_batches(batch_format="pandas"):
        for blob in b["regs"]:
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    return int(round(_hll_estimate(merged)))


# ---------------------------------------------------------------------------
# Quantile sketch
# ---------------------------------------------------------------------------
def _compress(values: np.ndarray, weights: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Reduce a weighted sample to <= k anchors: sort, then take the values
    at k equally spaced cumulative-weight positions, each carrying 1/k of
    the total weight."""
    order = np.argsort(values, kind="stable")
    v, w = values[order], weights[order]
    cw = np.cumsum(w)
    total = cw[-1]
    targets = (np.arange(k) + 0.5) * (total / k)
    idx = np.searchsorted(cw, targets, side="left").clip(0, len(v) - 1)
    return v[idx], np.full(k, total / k)


def approx_quantiles(
    ds,
    column: str,
    quantiles: Sequence[float],
    k: int = 4096,
    batch_size: int = 65536,
) -> dict[float, float]:
    """Approximate global quantiles in one streaming pass.  Each batch
    emits <= k (value, weight) anchors; the driver concatenates and
    recompresses once, then reads quantiles off the cumulative weights.
    Partial size is fixed (k anchors) regardless of batch or corpus size."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[column].dropna().to_numpy(dtype=np.float64)
        if len(x) == 0:
            return pd.DataFrame({"v": [], "w": []})
        if len(x) <= k:
            return pd.DataFrame({"v": x, "w": np.ones(len(x))})
        v, w = _compress(x, np.ones(len(x)), k)
        return pd.DataFrame({"v": v, "w": w})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size).to_pandas()
    if "v" not in parts.columns or len(parts) == 0:
        return {float(q): float("nan") for q in quantiles}
    v = parts["v"].to_numpy(dtype=np.float64)
    w = parts["w"].to_numpy(dtype=np.float64)
    if len(v) == 0:
        return {float(q): float("nan") for q in quantiles}
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    total = cw[-1]
    out: dict[float, float] = {}
    for q in quantiles:
        pos = float(q) * total
        i = int(np.searchsorted(cw, pos, side="left").clip(0, len(v) - 1))
        out[float(q)] = float(v[i])
    return out
