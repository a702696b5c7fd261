"""Distributed k-means (Lloyd's) over an embedding column — the iterative
building block behind IVF indexing (:mod:`functions.similarity` trains its
coarse quantizer on a driver-side sample; this is the full-data version a
100-TB corpus needs) and embedding-space corpus analysis (clustering for
diversity sampling / topic buckets).

Each iteration is ONE streaming pass: centroids go out by value inside the
batch closure (broadcast once per iteration via Ray's closure capture —
k x d floats), and each batch emits per-cluster partial (sum, count)
rows; the driver folds k partials and updates centroids.  Bytes moved per
iteration: O(batches x k x d), independent of row count.  No shuffle.

Determinism: k-means++-style seeding from a fixed-seed driver sample, and
ties in assignment break to the lowest cluster id (argmin) — reruns are
bit-identical, which the pytest asserts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float32 matrix (zero-copy where Arrow
    allows).  Null or ragged entries are rejected explicitly: silently
    reshaping a short values buffer would either raise a cryptic error or
    (when sizes happen to divide) misalign every following row."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n and col.null_count:
        raise ValueError(
            f"null embedding vector(s) in batch ({col.null_count} of {n}) — "
            "filter or impute them before kmeans/assign_clusters"
        )
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    if n and len(flat) % n != 0:
        raise ValueError("ragged embedding vectors: all rows must share one dim")
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c ||x - c||^2 via the expanded form (one matmul)."""
    d2 = (x * x).sum(1, keepdims=True) - 2.0 * (x @ cents.T) + (cents * cents).sum(1)
    return np.argmin(d2, axis=1)


def kmeans(
    ds,
    vector_column: str = "vec",
    k: int = 8,
    iters: int = 10,
    seed: int = 42,
    sample_size: int = 4096,
    batch_size: int = 8192,
) -> np.ndarray:
    """Train k-means centroids over ``vector_column``; returns (k, d)
    float32 centroids.  Empty clusters keep their previous centroid."""
    import ray.data  # noqa: F401  (caller owns the session)

    # seeding: k-means++ on a deterministic driver sample (sample_size x d
    # floats — tiny), the standard scalable recipe
    sample = _sample_matrix(ds, vector_column, sample_size)
    rng = np.random.default_rng(seed)
    cents = _kmeanspp(sample, k, rng)

    for _ in range(iters):
        c = cents  # captured by value in the closure -> shipped once/iter

        def partial(batch: pa.Table) -> pa.Table:
            x = _to_matrix(batch[vector_column])
            if x.size == 0:
                return pa.table({"cid": pa.array([], type=pa.int32()),
                                 "cnt": pa.array([], type=pa.int64()),
                                 "vsum": pa.array([], type=pa.list_(pa.float64()))})
            a = _assign(x, c)
            cnts = np.bincount(a, minlength=len(c))
            acc = np.zeros((len(c), x.shape[1]), dtype=np.float64)
            np.add.at(acc, a, x)
            nz = np.flatnonzero(cnts)
            return pa.table({
                "cid": pa.array(nz.astype(np.int32)),
                "cnt": pa.array(cnts[nz].astype(np.int64)),
                "vsum": pa.array([row.tolist() for row in acc[nz]],
                                 type=pa.list_(pa.float64())),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=batch_size).to_pandas()
        # deterministic fold order: block ARRIVAL order varies run to run,
        # and float64 addition is not associative — an unsorted fold made
        # same-seed runs differ in the last ulp, occasionally flipping a
        # boundary point's assignment (flaky determinism test)
        parts = parts.assign(__key__=parts["vsum"].map(tuple)).sort_values(
            ["cid", "cnt", "__key__"], kind="mergesort"
        )
        new = cents.astype(np.float64).copy()
        cnt = np.zeros(k)
        acc = np.zeros_like(new)
        for _, r in parts.iterrows():
            acc[int(r["cid"])] += np.asarray(r["vsum"])
            cnt[int(r["cid"])] += r["cnt"]
        nz = cnt > 0
        new[nz] = acc[nz] / cnt[nz, None]
        cents = new.astype(np.float32)
    return cents


def assign_clusters(ds, centroids: np.ndarray, vector_column: str = "vec",
                    out_column: str = "cluster", batch_size: int = 8192):
    """Add the nearest-centroid id per row (one streaming pass)."""
    c = centroids.astype(np.float32)

    def tag(batch: pa.Table) -> pa.Table:
        x = _to_matrix(batch[vector_column])
        a = _assign(x, c) if x.size else np.array([], dtype=np.int64)
        return batch.append_column(out_column, pa.array(a.astype(np.int32)))

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)


def _sample_matrix(ds, vector_column: str, n: int, per_block: int = 64) -> np.ndarray:
    """Seed sample spread ACROSS blocks: the head of every block, capped at
    ``n`` total.  ``limit(n)`` alone reads only the first block(s), which
    biases k-means++ badly on inputs written clustered/sorted — every seed
    would come from one region.

    The returned rows are in CANONICAL (lexicographic) order: the limit
    concatenates blocks in arrival order, which varies run to run, and
    k-means++ seeding is order-sensitive — an unsorted sample made
    same-seed kmeans/fit_pq/IVF trainings differ across calls."""

    def head(batch: pa.Table) -> pa.Table:
        return batch.select([vector_column]).slice(0, per_block)

    t = pa.Table.from_pandas(
        ds.map_batches(head, batch_format="pyarrow", batch_size=None)
        .limit(n)
        .to_pandas(),
        preserve_index=False,
    )
    col = t[vector_column]
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type) or \
            pa.types.is_fixed_size_list(col.type):
        m = _to_matrix(col)
    else:
        # pandas round-trip may yield object arrays of lists
        m = np.asarray([np.asarray(v, dtype=np.float32) for v in col.to_pylist()],
                       dtype=np.float32)
    if len(m):
        m = m[np.lexsort(m.T[::-1])]
    return m


def _kmeanspp(x: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """Deterministic k-means++ seeding on the sample."""
    n = len(x)
    if n == 0:
        raise ValueError("empty sample for kmeans seeding")
    idx = [int(rng.integers(n))]
    d2 = ((x - x[idx[0]]) ** 2).sum(1)
    for _ in range(1, min(k, n)):
        p = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        idx.append(int(rng.choice(n, p=p)))
        d2 = np.minimum(d2, ((x - x[idx[-1]]) ** 2).sum(1))
    cents = x[idx].astype(np.float32)
    if len(cents) < k:  # fewer points than clusters: pad by cycling
        reps = -(-k // len(cents))
        cents = np.vstack([cents] * reps)[:k]
    return cents
