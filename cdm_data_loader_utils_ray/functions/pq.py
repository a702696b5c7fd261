"""Product quantization (PQ) for embedding columns — the missing half of
the IVF-PQ pairing that makes billion-vector ANN feasible: each d-dim
float32 vector compresses to ``m`` uint8 codes (e.g. 64 dims x 4 B ->
8 B, 32x), and search scans CODES with an asymmetric-distance LUT
(ADC, Jegou et al. 2011) instead of floats.

Scale shape for 100 TB:
  fit     driver-local lloyd per subspace over a block-spread SAMPLE
          (``kmeans._sample_matrix``) — codebooks are (m, 256, d/m),
          kilobytes, broadcast once
  encode  embarrassingly parallel map_batches: per subspace one
          (batch x 256) distance matmul + argmin -> fixed_size_binary(m)
          column (zero-copy byte layout, no per-row Python)
  search  ADC: per query an (m x 256) LUT, per batch one gather+sum over
          the code bytes, per-batch partial top-k (only k rows per batch
          reach the driver — the ``brute_force_topk`` merge shape)

Pairs with the materialized IVF index (``functions/ann_index.py``): store
``pq_code`` next to the cell id and the probe-bucket scan never touches
the float vectors except for an optional exact re-rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.functions.kmeans import _sample_matrix, _to_matrix


def _lloyd(x: np.ndarray, k: int, iters: int, rng: np.random.Generator) -> np.ndarray:
    """Deterministic driver-local k-means over a sample (float64 accum).
    Plain lloyd with distinct-row seeding; empty clusters re-seed from the
    farthest points — sufficient for PQ codebooks (the standard practice)."""
    n = len(x)
    k = min(k, n)
    seeds = rng.permutation(n)[:k]
    c = x[seeds].astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        far = np.argsort(-d2[np.arange(n), a])  # refill donors
        fi = 0
        for j in range(len(c)):
            sel = a == j
            if sel.any():
                c[j] = x[sel].mean(0)
            else:
                c[j] = x[far[fi]]
                fi += 1
    return c.astype(np.float32)


def fit_pq(
    ds,
    column: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    sample_size: int = 20000,
    iters: int = 15,
    seed: int = 42,
) -> np.ndarray:
    """Train PQ codebooks: returns ``(m, n_codes, d/m)`` float32.  The
    embedding width must divide evenly by ``m``."""
    x = _sample_matrix(ds, column, sample_size).astype(np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    return np.stack(
        [_lloyd(x[:, i * sub : (i + 1) * sub], n_codes, iters, rng) for i in range(m)]
    )


def encode_matrix(x: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, d) float -> (n, m) uint8 PQ codes: one argmin matmul per
    subspace (shared by :func:`encode_pq` and the ANN index's tag stage)."""
    m, n_codes, sub = codebooks.shape
    x = np.asarray(x, dtype=np.float32)
    codes = np.empty((len(x), m), dtype=np.uint8)
    for i in range(m):
        xs = x[:, i * sub : (i + 1) * sub]
        c = codebooks[i]
        d2 = (c * c).sum(1)[None, :] - 2.0 * (xs @ c.T)
        codes[:, i] = d2.argmin(1).astype(np.uint8)
    return codes


def codes_to_arrow(codes: np.ndarray) -> pa.Array:
    """(n, m) uint8 -> fixed_size_binary(m) with zero per-row Python."""
    n, m = codes.shape
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(m), n, [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())]
    )


def adc_lut(query: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(m, n_codes) float64 table of squared subspace distances for ADC."""
    m, n_codes, sub = codebooks.shape
    q = np.asarray(query, dtype=np.float32).reshape(m, sub)
    return ((codebooks - q[:, None, :]) ** 2).sum(-1).astype(np.float64)


def codes_from_column(col, m: int, n: int) -> np.ndarray:
    """fixed_size_binary(m) column -> (n, m) uint8 view (zero copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.frombuffer(col.buffers()[1], dtype=np.uint8)[
        col.offset * m : (col.offset + n) * m
    ].reshape(n, m)


def encode_pq(
    ds,
    codebooks: np.ndarray,
    column: str = "embedding",
    id_column: str = "vec_id",
    code_column: str = "pq_code",
    batch_size: int = 4096,
):
    """ids + ``fixed_size_binary(m)`` PQ codes, one argmin matmul per
    subspace per batch.  The codebooks broadcast once via ``ray.put``."""
    import ray

    cb_ref = ray.put(np.ascontiguousarray(codebooks, dtype=np.float32))
    m, n_codes, sub = codebooks.shape

    def encode(batch: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref)
        if len(batch) == 0:
            return pa.table(
                {
                    id_column: batch[id_column],
                    code_column: pa.array([], type=pa.binary(m)),
                }
            )
        x = _to_matrix(batch[column])
        return pa.table(
            {
                id_column: batch[id_column],
                code_column: codes_to_arrow(encode_matrix(x, cb)),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=batch_size)


def pq_topk(
    codes_ds,
    query: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    code_column: str = "pq_code",
) -> pd.DataFrame:
    """Asymmetric-distance top-k over PQ codes: one (m x 256) LUT for the
    query, per batch a gather+sum over the code bytes, per-batch partial
    top-k, driver merge — approximate L2, deterministic tie order
    (distance asc, id asc)."""
    import ray

    m, n_codes, sub = codebooks.shape
    lut_ref = ray.put(adc_lut(query, codebooks))

    def partial(batch: pa.Table) -> pa.Table:
        t = ray.get(lut_ref)
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    id_column: pa.array([], type=batch[id_column].type),
                    "adc_dist": pa.array([], type=pa.float64()),
                }
            )
        codes = codes_from_column(batch[code_column], m, n)
        dist = t[np.arange(m)[None, :], codes].sum(1)
        kk = min(k, n)
        # tie-inclusive cut: identical PQ codes (near-dup rows) give
        # bit-identical ADC sums; a fixed-size slice could drop a boundary
        # tie the (dist, id) order ranks higher
        kth = np.partition(dist, kk - 1)[kk - 1]
        cand = np.flatnonzero(dist <= kth)
        ids = batch[id_column].take(pa.array(cand, type=pa.int64()))
        df = pd.DataFrame(
            {id_column: ids.to_pandas(), "adc_dist": dist[cand]}
        ).sort_values(["adc_dist", id_column], kind="stable").head(kk)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = codes_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        parts.sort_values(["adc_dist", id_column], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
