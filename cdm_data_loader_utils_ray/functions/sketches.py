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
    cross-engine stability).

    ``hash_pandas_object`` is dtype-sensitive, so numeric WIDTHS are
    normalized first (int32 → int64, float32 → float64): a sketch built
    over an int64 column must answer probes that arrive as int32 after a
    join or cast.  Logical-type mismatches (int vs float vs string) still
    hash apart — build and query with the same logical type."""
    dt = values.dtype
    if pd.api.types.is_integer_dtype(dt) and str(dt) != "int64":
        try:
            values = values.astype("int64")
        except (TypeError, ValueError):
            pass  # nullable ints holding NA: consistent as long as both sides are
    elif pd.api.types.is_float_dtype(dt) and str(dt) != "float64":
        values = values.astype("float64")
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


# ---------------------------------------------------------------------------
# Heavy hitters (Misra-Gries / frequent-items) — mergeable
# ---------------------------------------------------------------------------
def _mg_compress(counts: pd.Series, k: int) -> pd.Series:
    """Keep <= k counters the Misra-Gries way: subtract the (k+1)-largest
    count from everything and drop the non-positive — the classic summary
    whose per-key undercount is bounded by n/(k+1)."""
    if len(counts) <= k:
        return counts
    kth = counts.nlargest(k + 1).iloc[-1]
    out = counts - kth
    return out[out > 0]


def heavy_hitters(ds, column: str, k: int = 64, batch_size: int = 65536) -> pd.DataFrame:
    """Approximate top frequent values of ``column`` in ONE streaming pass.

    Each batch emits its Misra-Gries summary (<= k rows); the driver sums
    summaries (MG summaries merge by adding counters then re-compressing)
    and re-compresses once.  Guarantees, with n = total rows:

    * every value with true frequency > n/(k+1) appears in the result;
    * each reported count undercounts by at most n/(k+1).

    The n/(k+1) bound holds for the WHOLE two-level pipeline, not per
    level (mergeable-summaries argument, Agarwal et al. PODS'12): every
    compress with decrement d removes >= (k+1)*d of counter mass (the
    k+1 largest counters each lose exactly d, smaller ones lose <= d),
    counter mass is only created by row inserts (n total) and merging
    sums it unchanged, so sum(d) over ALL compresses — per-batch and
    final alike — is <= n/(k+1); any key's total undercount is <= sum(d).
    ``tests/test_sketches.py`` checks this exact envelope, including an
    adversarial batch layout built to maximize two-level decrements.

    Returns (value, count_lower_bound) sorted by count desc — the exact
    top-N should be confirmed with one grouped count over the candidate
    set when exactness matters (the candidates are guaranteed complete at
    the n/(k+1) threshold).
    """

    def part(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[column].value_counts()
        mg = _mg_compress(vc, k)
        return pd.DataFrame({column: mg.index, "c": mg.to_numpy()})

    parts = ds.map_batches(part, batch_format="pandas", batch_size=batch_size).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({column: pd.Series([], dtype="object"),
                             "count_lb": pd.Series([], dtype="int64")})
    merged = parts.groupby(column, sort=False)["c"].sum()
    merged = _mg_compress(merged, k).sort_values(ascending=False)
    return pd.DataFrame(
        {column: merged.index, "count_lb": merged.to_numpy().astype("int64")}
    )


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable point-frequency estimates
# ---------------------------------------------------------------------------
_CM_SALTS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _cm_positions(hashes: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(n, depth) column indices; row d uses an independent salt-mix."""
    h = hashes[:, None] * _CM_SALTS[None, :depth]
    h ^= h >> np.uint64(29)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(32)
    return (h % np.uint64(width)).astype(np.int64)


def count_min_build(ds, column: str, width: int = 2048, depth: int = 4,
                    batch_size: int = 65536) -> np.ndarray:
    """(depth, width) int64 count-min table for ``column`` — per-batch
    partial tables summed driver-side (counts are linear, so partials
    merge by addition).  Point estimate overcounts by <= 2n/width with
    probability 1 - 2^-depth, never undercounts.  ``depth`` is capped by
    the number of independent salts available."""
    if depth > len(_CM_SALTS):
        raise ValueError(f"depth must be <= {len(_CM_SALTS)} (got {depth})")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        tbl = np.zeros((depth, width), dtype=np.int64)
        if len(df):
            vc = df[column].value_counts()
            pos = _cm_positions(_hash64(pd.Series(vc.index)), width, depth)
            w = vc.to_numpy()
            for d in range(depth):
                np.add.at(tbl[d], pos[:, d], w)
        return pd.DataFrame({"t": [tbl.tobytes()]})

    acc = np.zeros((depth, width), dtype=np.int64)
    for batch in ds.map_batches(part, batch_format="pandas", batch_size=batch_size) \
                   .iter_batches(batch_format="pandas"):
        for raw in batch["t"]:
            acc += np.frombuffer(raw, dtype=np.int64).reshape(depth, width)
    return acc


def count_min_query(table: np.ndarray, values: pd.Series) -> np.ndarray:
    """Estimated frequency per value: min over the depth rows."""
    depth, width = table.shape
    if not len(values):
        return np.zeros(0, dtype=np.int64)
    pos = _cm_positions(_hash64(values), width, depth)
    ests = np.stack([table[d][pos[:, d]] for d in range(depth)], axis=1)
    return ests.min(axis=1)
