"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — a numpy matmul per Arrow batch against
a small broadcast query matrix (``ray.put`` once, read per task), followed by
per-batch partial top-k and a tiny final sort.  Scale path: LSH-bucketed
search (`lsh_topk`) — random-hyperplane signatures bucket the corpus with a
``groupby``, and only the query's bucket (plus optional neighbor probes) is
scanned.  No network, no external index: everything is Dataset-native.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


# shared oracle rounding convention (core/rounding.py — r3 review: inline
# copies drift)
from cdm_data_loader_utils_ray.core.rounding import round_half_away as _round_away


def _topk_frame(df: pd.DataFrame, k: int, id_column: str,
                tie_ndigits: int | None) -> pd.DataFrame:
    """Top-k under the TOTAL order (cos desc, id asc) — with ``tie_ndigits``
    set, cos is compared at that (half-away-rounded) precision, so selection
    is invariant to sub-round float noise.  Float32 matmul results for the
    SAME row vary at ~1e-8 with the batch SHAPE (blocked BLAS kernels), so
    exact-duplicate rows land in different batches with different unrounded
    scores; an unrounded sort would tie-break on that noise instead of on
    ``id`` and diverge from a float64 oracle.  Used for BOTH the per-batch
    partial top-k and the final merge so the partial can never evict a row
    the final order ranks higher."""
    if tie_ndigits is not None:
        key = _round_away(df["cos_sim"], tie_ndigits)
    else:
        key = df["cos_sim"]
    order = df.assign(__key=key).sort_values(
        ["__key", id_column], ascending=[False, True], kind="mergesort"
    )
    return order.head(k).drop(columns="__key")


def _batch_matrix(batch: pa.Table, column: str) -> np.ndarray:
    """(n, d) float32 matrix from a list<float> column, zero-copy-ish via
    the flattened values buffer.  Null/ragged entries are rejected: flatten
    drops null slots, so a recomputed 'dimension' would silently misalign
    every following row (same guard as kmeans._to_matrix)."""
    arr = batch.column(column)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float32)
    if arr.null_count:
        raise ValueError(
            f"null embedding vector(s) in batch ({arr.null_count} of {n}) — "
            "filter or impute them before similarity search"
        )
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    if len(flat) % n != 0:
        raise ValueError("ragged embedding vectors: all rows must share one dim")
    return flat.reshape(n, len(flat) // n)


def cosine_scores_stage(query: np.ndarray, column: str = "embedding",
                        id_column: str = "vec_id", out_column: str = "cos_sim",
                        ndigits: int | None = None):
    """``map_batches`` fn: score every row against ONE query vector.
    The query is tiny; for many queries use :class:`BruteForceTopK`."""
    q = query.astype(np.float32)
    qn = q / np.linalg.norm(q)

    def score(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, column)
        if m.size == 0:  # empty block: (0,0) @ (d,) would raise
            return pa.table({id_column: batch[id_column],
                             out_column: pa.array([], type=pa.float64())})
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cos = (m @ qn) / norms
        if ndigits is not None:
            cos = np.round(cos.astype(np.float64), ndigits)
        return pa.table({id_column: batch[id_column], out_column: pa.array(cos, type=pa.float64())})

    return score


def brute_force_topk(ds, query: np.ndarray, k: int = 10, column: str = "embedding",
                     id_column: str = "vec_id", ndigits: int | None = None,
                     tie_ndigits: int | None = None) -> pd.DataFrame:
    """Exact cosine top-k: per-batch scoring + per-batch partial top-k (only
    k rows per batch survive to the driver), final merge driver-side."""
    score = cosine_scores_stage(query, column, id_column, ndigits=ndigits)

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = _topk_frame(score(batch).to_pandas(), k, id_column, tie_ndigits)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    return _topk_frame(parts, k, id_column, tie_ndigits).reset_index(drop=True)


class BruteForceTopK:
    """Actor-pool stage for scoring against a broadcast query MATRIX
    (many queries at once): put the matrix in the object store once
    (``ray.put``), each actor fetches it in ``__init__`` — never re-shipped
    per batch (SURVEY §4 broadcast pattern)."""

    def __init__(self, queries_ref, k: int, column: str = "embedding",
                 id_column: str = "vec_id", tie_ndigits: int | None = None):
        import ray

        q = ray.get(queries_ref).astype(np.float32)  # (m, d)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.k, self.column, self.id_column = k, column, id_column
        self.tie_ndigits = tie_ndigits

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.column)
        if m.size == 0:  # empty block: (0,0) matmul would raise
            return pa.table(
                {
                    "query_idx": pa.array([], type=pa.int32()),
                    self.id_column: pa.array([], type=batch[self.id_column].type),
                    "cos_sim": pa.array([], type=pa.float64()),
                }
            )
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cos = (m / norms) @ self.qn.T  # (n, m)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        out = {"query_idx": [], self.id_column: [], "cos_sim": []}
        k = min(self.k, len(ids))
        for qi in range(cos.shape[1]):
            # tie-INCLUSIVE candidate cut under the SAME (rounded) key the
            # final merge orders by: every row whose key ties the k-th
            # best is a candidate, so the partial can never evict a row
            # the final (key desc, id asc) order ranks higher — a
            # fixed-size argpartition slice could cut a boundary tie group
            if not k:
                continue
            if self.tie_ndigits is not None:
                key = np.asarray(_round_away(cos[:, qi], self.tie_ndigits))
            else:
                key = cos[:, qi]
            kth = np.partition(-key, k - 1)[k - 1]
            cand = np.flatnonzero(-key <= kth)
            df = _topk_frame(
                pd.DataFrame({self.id_column: ids[cand], "cos_sim": cos[cand, qi]}),
                k, self.id_column, self.tie_ndigits,
            )
            out["query_idx"].extend([qi] * len(df))
            out[self.id_column].extend(df[self.id_column])
            out["cos_sim"].extend(df["cos_sim"])
        return pa.table(
            {
                "query_idx": pa.array(out["query_idx"], type=pa.int32()),
                self.id_column: pa.array(out[self.id_column]),
                "cos_sim": pa.array(out["cos_sim"], type=pa.float64()),
            }
        )


def train_ivf_centroids(ds, n_cells: int = 16, sample_frac: float = 0.25,
                        iters: int = 8, seed: int = 42,
                        column: str = "embedding") -> np.ndarray:
    """Driver-side k-means over a SAMPLE of the corpus (the IVF coarse
    quantizer).  Sampling keeps the training read tiny at 100 TB; the
    centroid matrix is small and broadcasts."""
    sample = ds.random_sample(sample_frac, seed=seed)
    parts = [
        _batch_matrix(b, column)
        for b in sample.iter_batches(batch_size=65536, batch_format="pyarrow")
        if len(b)
    ]
    x = np.concatenate(parts) if parts else np.empty((0, 2), np.float32)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)  # cosine on normalized vecs
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                mu = members.mean(axis=0)
                cent[c] = mu / max(np.linalg.norm(mu), 1e-12)
    return cent


def ivf_topk(ds, query: np.ndarray, centroids: np.ndarray, k: int = 10,
             n_probe: int = 2, column: str = "embedding",
             id_column: str = "vec_id", tie_ndigits: int | None = None) -> pd.DataFrame:
    """IVF search over an UNINDEXED corpus: every batch is still READ and
    its cell assignments recomputed — only the exact-cosine *scoring* is
    pruned to the query's ``n_probe`` closest cells.  Right for one-off
    searches; for repeated queries at scale use
    ``functions/ann_index.build_ann_index`` + ``AnnIndex.search``, which
    materializes the assignment once and prunes the READ itself to the
    probe cells' files.  Centroids are data-adaptive, so cells balance
    better than random hyperplanes on clustered corpora."""
    q = query.astype(np.float32)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = set(np.argsort(-(centroids @ qn))[:n_probe].tolist())
    score = cosine_scores_stage(query, column, id_column)

    def filter_and_score(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, column)
        if m.size == 0:
            return pa.table({id_column: pa.array([], type=batch[id_column].type),
                             "cos_sim": pa.array([], type=pa.float64())})
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cells = (mn @ centroids.T).argmax(axis=1)
        mask = np.isin(cells, list(probe))
        cand = batch.filter(pa.array(mask))
        if len(cand) == 0:
            return pa.table({id_column: pa.array([], type=batch[id_column].type),
                             "cos_sim": pa.array([], type=pa.float64())})
        df = _topk_frame(score(cand).to_pandas(), k, id_column, tie_ndigits)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(filter_and_score, batch_format="pyarrow").to_pandas()
    return _topk_frame(parts, k, id_column, tie_ndigits).reset_index(drop=True)


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def lsh_signature(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """uint64 bucket id per row: sign pattern against random hyperplanes."""
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1)


def lsh_bucketed_topk(ds, query: np.ndarray, k: int = 10, n_planes: int = 12,
                      seed: int = 42, column: str = "embedding",
                      id_column: str = "vec_id", probe_hamming: int = 1,
                      tie_ndigits: int | None = None) -> pd.DataFrame:
    """Approximate cosine top-k over an UNINDEXED corpus: every batch is
    still READ and signatures recomputed — only exact scoring is pruned to
    rows whose LSH bucket is within ``probe_hamming`` bit-flips of the
    query's.  The targeted-READ variant (~(1 + n_planes) / 2^n_planes of
    the corpus actually read) is ``functions/ann_index`` with
    ``kind="lsh"``, which materializes signatures as a partition column
    once and reads only the probe buckets' files."""
    planes = random_hyperplanes(len(query), n_planes, seed)
    qsig = int(lsh_signature(query.reshape(1, -1).astype(np.float32), planes)[0])
    # every signature within Hamming distance <= probe_hamming (same
    # expansion as ann_index.probe_cells — the 1-bit-only version silently
    # capped probe_hamming at 1); C(n_planes, d) buckets per distance d
    from itertools import combinations

    probe = {qsig}
    for d in range(1, min(probe_hamming, n_planes) + 1):
        for bits in combinations(range(n_planes), d):
            flip = 0
            for b in bits:
                flip |= 1 << b
            probe.add(qsig ^ flip)
    score = cosine_scores_stage(query, column, id_column)

    def filter_and_score(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, column)
        if m.size == 0:
            return pa.table({id_column: pa.array([], type=batch[id_column].type),
                             "cos_sim": pa.array([], type=pa.float64())})
        sig = lsh_signature(m, planes)
        mask = np.isin(sig, list(probe))
        cand = batch.filter(pa.array(mask))
        if len(cand) == 0:
            return pa.table({id_column: pa.array([], type=batch[id_column].type),
                             "cos_sim": pa.array([], type=pa.float64())})
        df = _topk_frame(score(cand).to_pandas(), k, id_column, tie_ndigits)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(filter_and_score, batch_format="pyarrow").to_pandas()
    return _topk_frame(parts, k, id_column, tie_ndigits).reset_index(drop=True)


def sq8_topk(ds, query: np.ndarray, k: int = 10, rescore: int = 64,
             column: str = "embedding", id_column: str = "vec_id",
             tie_ndigits: int | None = None) -> pd.DataFrame:
    """Scalar-quantized (int8) cosine top-k — the memory-4x path for
    brute-force scans over corpora whose float32 embeddings don't fit:
    per batch, vectors quantize to symmetric int8 (per-batch scale — only
    WITHIN-batch candidate ranking uses the quantized score, so scales
    need not be global), the int32 accumulated dot picks ``rescore``
    candidates, and ONLY those rows are rescored with the exact float
    cosine.  The final merge ranks by exact scores, so accuracy equals
    brute force whenever the true top-k survives the candidate cut
    (recall asserted in pytest; exact-copy fixtures guarantee it by
    construction).  The precomputed-int8 path exists for real:
    ``functions/ann_index.build_ann_index(store_sq8=True)`` materializes
    the quantized column once (per-row scales) and
    ``AnnIndex.search(use_sq8=True)`` scans it in place of the float
    column; here quantization is fused into the scan to keep one
    dataset."""
    qf = query.astype(np.float32)
    qn = qf / (np.linalg.norm(qf) or 1.0)
    qs = float(np.abs(qf).max()) or 1.0
    q8 = np.clip(np.rint(qf / qs * 127.0), -127, 127).astype(np.int32)

    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, column)
        if m.size == 0:
            return pa.table({id_column: pa.array([], type=batch[id_column].type),
                             "cos_sim": pa.array([], type=pa.float64())})
        # L2-normalize BEFORE quantizing: the int8 dot then approximates
        # COSINE, not raw dot — otherwise large-norm vectors crowd the
        # candidate set and recall collapses on mixed-norm corpora
        row_norms = np.linalg.norm(m, axis=1, keepdims=True)
        row_norms[row_norms == 0] = 1.0
        mn = m / row_norms
        s = float(np.abs(mn).max()) or 1.0
        m8 = np.clip(np.rint(mn / s * 127.0), -127, 127).astype(np.int8)
        approx = m8.astype(np.int32) @ q8
        # tie-inclusive pre-rank cut: int32 dot products tie exactly for
        # near-identical rows; a fixed-size slice would keep an arbitrary
        # subset of a boundary tie group (nondeterministic recall)
        r = min(rescore, len(approx))
        rth = np.partition(-approx, r - 1)[r - 1]
        cand = np.flatnonzero(-approx <= rth)
        sub = m[cand]
        norms = np.linalg.norm(sub, axis=1)
        norms[norms == 0] = 1.0
        cos = (sub @ qn) / norms
        ids = batch[id_column].take(pa.array(cand)).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({id_column: ids, "cos_sim": cos.astype(np.float64)})
        df = _topk_frame(df, k, id_column, tie_ndigits)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return _topk_frame(parts, k, id_column, tie_ndigits).reset_index(drop=True)
