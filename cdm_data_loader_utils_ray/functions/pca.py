"""Distributed PCA / whitening over an embedding column (`list<float>`).

The curriculum/semantic-dedup preprocessing step (SemDeDup-style pipelines
whiten embeddings before clustering): fit on one streaming pass, project
statelessly.

Scale shape for 100 TB:
  fit      ONE pass — each batch contributes (n, sum(x), X^T X), a
           (d^2 + d + 1)-sized partial; the driver folds k partials and
           eigendecomposes the d x d covariance (d is the embedding width,
           64-4096 — driver-trivial).  The corpus never gathers.
  project  embarrassingly parallel map_batches matmul against the
           broadcast (d x k) component matrix.

Library + pytest only (like ``functions/sketches``): the fit is float64
and iterative-free but its fold order follows block arrival, so results
are deterministic only up to float addition order — no bit-exact SQL twin
is possible, and the catalog stays all-oracle-checked without it.

No reference counterpart (the reference has no embedding ops); the
combiner shape follows ``functions/kmeans.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.functions.kmeans import _to_matrix


def fit_pca(
    ds,
    embedding_column: str = "embedding",
    n_components: int | None = None,
    whiten: bool = False,
    eps: float = 1e-8,
    batch_size: int = 4096,
):
    """One-pass PCA fit: returns ``(mean (d,), components (k, d),
    explained_variance (k,))`` with components sign-normalized (largest
    |loading| positive) so reruns agree up to fold-order float noise.

    ``whiten=True`` scales components by ``1/sqrt(var + eps)`` so the
    projected coordinates have ~unit variance.
    """

    def partial(batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"n": [], "s": [], "g": []})
        x = _to_matrix(batch[embedding_column]).astype(np.float64)
        return pd.DataFrame(
            {
                "n": [len(x)],
                "s": [x.sum(axis=0).tobytes()],
                "g": [(x.T @ x).ravel().tobytes()],
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # distributed pre-fold: the driver sees fold-batches, not blocks
        if len(df) == 0:
            return df
        return pd.DataFrame(
            {
                "n": [int(df["n"].sum())],
                "s": [np.sum([np.frombuffer(b, dtype=np.float64)
                              for b in df["s"]], axis=0).tobytes()],
                "g": [np.sum([np.frombuffer(b, dtype=np.float64)
                              for b in df["g"]], axis=0).tobytes()],
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .map_batches(fold, batch_format="pandas", batch_size=256)
        .take_all()
    )
    if not parts:
        raise ValueError("fit_pca: empty dataset")
    # deterministic fold order (same reason as kmeans): float addition is
    # order-sensitive and take_all order follows block arrival
    parts = sorted(parts, key=lambda r: (int(r["n"]), r["s"], r["g"]))
    n = 0
    s = None
    g = None
    for r in parts:
        n += int(r["n"])
        sv = np.frombuffer(r["s"], dtype=np.float64)
        gv = np.frombuffer(r["g"], dtype=np.float64)
        s = sv if s is None else s + sv
        g = gv if g is None else g + gv
    d = s.shape[0]
    mean = s / n
    # covariance from the raw Gram: E[xx^T] - mean mean^T (population).
    # NOTE the one-pass form loses precision when |mean| >> sd (the zscore
    # two-pass fix, r3); embeddings are near-zero-mean so it holds here —
    # for wildly off-center data, center first and pass the residuals.
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    k = d if n_components is None else min(n_components, d)
    var = np.maximum(evals[order][:k], 0.0)
    comp = evecs[:, order][:, :k].T  # (k, d)
    # sign convention: the largest-|loading| coordinate of each component
    # is positive (numpy eigenvector signs are arbitrary)
    flip = np.sign(comp[np.arange(k), np.abs(comp).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comp = comp * flip[:, None]
    if whiten:
        comp = comp / np.sqrt(var + eps)[:, None]
    return mean, comp, var


def project_pca(
    ds,
    mean: np.ndarray,
    components: np.ndarray,
    embedding_column: str = "embedding",
    output_column: str = "pca",
    batch_size: int = 4096,
):
    """Stateless projection: ``(x - mean) @ components.T`` per batch, the
    (k, d) matrix broadcast once via ``ray.put`` (read per task, never
    re-shipped per batch)."""
    import ray

    ref = ray.put((np.asarray(mean, dtype=np.float64),
                   np.asarray(components, dtype=np.float64)))

    def proj(batch: pa.Table) -> pa.Table:
        m, c = ray.get(ref)
        if len(batch) == 0:
            out = pa.array([], type=pa.list_(pa.float64()))
            return batch.append_column(output_column, out)
        x = _to_matrix(batch[embedding_column]).astype(np.float64)
        p = (x - m) @ c.T
        k = p.shape[1]
        out = pa.LargeListArray.from_arrays(
            pa.array(np.arange(0, (len(p) + 1) * k, k, dtype=np.int64)),
            pa.array(p.ravel()),
        )
        return batch.append_column(output_column, out.cast(pa.list_(pa.float64())))

    return ds.map_batches(proj, batch_format="pyarrow", batch_size=batch_size)


def quantized_dim_sums(
    ds, embedding_column: str = "embedding", scale: int = 10_000,
    batch_size: int = 8192,
):
    """Exact per-dimension INTEGER sums of the quantized embeddings:
    ``(n, sum_i round(x_i * scale))`` — the order-free building block the
    oracle-checked projection needs (integer addition commutes; a float
    mean does not).  One streaming pass, (d+1)-sized partials."""
    from cdm_data_loader_utils_ray.core.rounding import round_half_away

    def partial(batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"n": [], "s": []})
        x = _to_matrix(batch[embedding_column]).astype(np.float64)
        q = round_half_away(x * float(scale), 0).astype(np.int64)
        return pd.DataFrame({"n": [len(q)], "s": [q.sum(axis=0).tobytes()]})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    ).take_all()
    n = 0
    s = None
    for r in parts:
        if r["n"] == []:
            continue
        n += int(r["n"])
        sv = np.frombuffer(r["s"], dtype=np.int64)
        s = sv.copy() if s is None else s + sv
    if s is None:
        raise ValueError("quantized_dim_sums: empty dataset")
    return n, s


def project_pca_quantized(
    ds,
    qsum: np.ndarray,
    n: int,
    qcomponents: np.ndarray,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    out_prefix: str = "y",
    scale: int = 10_000,
    batch_size: int = 8192,
):
    """EXACT integer mean-centered projection — the SQL-twinnable variant
    of :func:`project_pca` (same map_batches matmul shape, no float fold
    anywhere): ``y = (n * qx - qsum) @ qc.T`` computes the centered
    projection in NUMERATOR space (multiply by n instead of dividing by
    it), so both engines sum identical int64 terms in any order.
    ``qcomponents`` is any (k, d) int matrix — projection needs no
    orthogonality, so oracle entries can draw it from data rows.

    int64 headroom: |term| <= (n*max|qx| + |qsum|) * max|qc|, summed over
    d — guarded below per batch (repo convention: grouped_exact_sums)."""
    qs = np.asarray(qsum, dtype=np.int64)
    qc = np.asarray(qcomponents, dtype=np.int64)
    d = qs.shape[0]
    from cdm_data_loader_utils_ray.core.rounding import round_half_away

    def proj(batch: pa.Table) -> pa.Table:
        cols = {id_column: pa.array([], pa.int64())} if len(batch) == 0 else {}
        if len(batch) == 0:
            for j in range(qc.shape[0]):
                cols[f"{out_prefix}{j}"] = pa.array([], pa.int64())
            return pa.table(cols)
        x = _to_matrix(batch[embedding_column]).astype(np.float64)
        qx = round_half_away(x * float(scale), 0).astype(np.int64)
        # headroom guard BEFORE the multiply, in Python ints (n * qx can
        # itself wrap int64; a post-multiply check would read the wrapped
        # values and pass — review r5):
        #   |num| <= n*max|qx| + max|qs|;  |y| <= |num| * max|qc| * d
        max_qx = int(np.abs(qx).max(initial=0))
        max_qs = int(np.abs(qs).max(initial=0))
        max_qc = int(np.abs(qc).max(initial=0))
        if (int(n) * max_qx + max_qs) * max(max_qc, 1) * d > (1 << 62):
            raise ValueError(
                "project_pca_quantized: int64 headroom exceeded — lower "
                "scale or center first"
            )
        num = n * qx - qs
        y = num @ qc.T
        cols = {id_column: batch[id_column].cast(pa.int64())}
        for j in range(qc.shape[0]):
            cols[f"{out_prefix}{j}"] = pa.array(y[:, j], pa.int64())
        return pa.table(cols)

    return ds.map_batches(proj, batch_format="pyarrow", batch_size=batch_size)
