"""Materialized ANN index: the 100-TB path for similarity search.

``functions/similarity.py``'s IVF/LSH searches prune COMPUTE only — every
query still reads the whole corpus and recomputes cell assignments per
batch.  This module materializes the assignment ONCE: a single streaming
pass tags each row with its coarse cell (IVF nearest-centroid or LSH
hyperplane signature) and writes the corpus Hive-partitioned by cell id
(one directory per cell, many files per directory at scale).  A search
then maps the query to its probe cells and READS ONLY THOSE DIRECTORIES —
at 100 TB the object-store read itself is pruned by ~n_cells/n_probe
(resp. 2^n_planes/(1+n_planes)), which is the difference between an index
and a filter.

Layout under ``index_dir``::

    index.json            # kind, params, column names, dim
    centroids.npy         # IVF only: (n_cells, d) float32, L2-normalized
    data/<cell_col>=<c>/  # Hive-partitioned corpus (+ optional SQ8 column)

The optional SQ8 sidecar (``store_sq8=True``) precomputes the symmetric
int8 quantization ``similarity.sq8_topk`` otherwise fuses into every scan:
searches with ``use_sq8=True`` rank candidates on the int8 dot product and
rescore only the survivors against the float column.

Candidate scoring reuses the exact-cosine kernels and the rounded total
order from ``functions/similarity.py``, so a search over an index returns
byte-identical results to the scan-based variant whenever the probe set
covers the true top-k (the planted-copy oracle fixtures guarantee that by
construction; recall on organic data is asserted in pytest).

Reference parity: the reference has no ANN at all — this family is part of
the beyond-reference training-data toolkit (builder brief).  Scale notes:
the build is one ``map_batches`` pass + a partitioned write (no shuffle);
the per-cell directories give resumability (a failed build can re-run
per-cell) and let the lake's footer-skipping style of pruning work at the
directory level with zero per-file stats.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.functions.similarity import (
    _batch_matrix,
    _topk_frame,
    cosine_scores_stage,
    lsh_signature,
    random_hyperplanes,
    train_ivf_centroids,
)

from cdm_data_loader_utils_ray.functions.pq import (
    adc_lut,
    codes_from_column,
    codes_to_arrow,
    encode_matrix,
)

_CELL_COL = "__ann_cell"
_PQ_COL = "__ann_pq"
_Q8_COL = "__ann_q8"
_Q8_SCALE_COL = "__ann_q8_scale"


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _cells_for(m: np.ndarray, kind: str, centroids: np.ndarray | None,
               planes: np.ndarray | None) -> np.ndarray:
    if m.size == 0:
        return np.array([], dtype=np.int64)
    if kind == "ivf":
        return (_normalize(m) @ centroids.T).argmax(axis=1).astype(np.int64)
    return lsh_signature(m, planes).astype(np.int64)


def _sq8_columns(m: np.ndarray) -> tuple[pa.Array, pa.Array]:
    """Per-ROW symmetric int8 quantization of the L2-normalized vectors.
    Per-row scales (not per-batch) so the quantized column is independent
    of how the build pass happened to batch the corpus."""
    mn = _normalize(m)
    scale = np.abs(mn).max(axis=1)
    scale[scale == 0] = 1.0
    q8 = np.clip(np.rint(mn / scale[:, None] * 127.0), -127, 127).astype(np.int8)
    dim = m.shape[1]
    flat = pa.array(q8.reshape(-1), type=pa.int8())
    return (
        pa.FixedSizeListArray.from_arrays(flat, dim),
        pa.array(scale.astype(np.float32)),
    )


def build_ann_index(
    ds,
    index_dir: str,
    kind: str = "ivf",
    column: str = "embedding",
    id_column: str = "vec_id",
    n_cells: int = 16,
    n_probe_default: int = 2,
    n_planes: int = 8,
    probe_hamming_default: int = 1,
    sample_frac: float = 0.25,
    seed: int = 42,
    store_sq8: bool = False,
    store_pq: bool = False,
    pq_m: int = 8,
    pq_codes: int = 256,
    pq_sample: int = 20000,
    overwrite: bool = False,
) -> "AnnIndex":
    """ONE streaming pass over ``ds``: tag every row with its coarse cell
    and write the corpus partitioned by cell under ``index_dir/data``.
    IVF trains the coarse quantizer on a sample first (small driver-side
    k-means — the centroid matrix broadcasts; the corpus itself streams).

    A non-empty ``index_dir/data`` is refused unless ``overwrite=True``
    (which clears it first): ``write_parquet`` appends uniquely-named
    files, so rebuilding in place would mix stale cell files from the
    previous corpus into every probe read."""
    import shutil

    data_dir = os.path.join(index_dir, "data")
    if os.path.isdir(data_dir) and os.listdir(data_dir):
        if not overwrite:
            raise ValueError(
                f"{data_dir} already holds an index; pass overwrite=True to rebuild"
            )
        shutil.rmtree(data_dir)
        for f in ("index.json", "centroids.npy", "pq_codebooks.npy"):
            p = os.path.join(index_dir, f)
            if os.path.exists(p):
                os.remove(p)

    centroids = planes = None
    dim = None
    if kind == "ivf":
        centroids = train_ivf_centroids(
            ds, n_cells=n_cells, sample_frac=sample_frac, seed=seed, column=column
        )
        dim = centroids.shape[1]
    elif kind == "lsh":
        first = ds.take(1)
        if not first:
            raise ValueError(
                "cannot build an LSH ANN index over an empty corpus "
                "(embedding dimension unknown)"
            )
        dim = len(first[0][column])
        planes = random_hyperplanes(dim, n_planes, seed)
    else:
        raise ValueError(f"unknown ANN index kind: {kind!r}")

    codebooks = None
    if store_pq:
        from cdm_data_loader_utils_ray.functions.pq import fit_pq

        codebooks = fit_pq(ds, column=column, m=pq_m, n_codes=pq_codes,
                           sample_size=pq_sample, seed=seed)

    def tag(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, column)
        cells = _cells_for(m, kind, centroids, planes)
        out = batch.append_column(_CELL_COL, pa.array(cells, type=pa.int64()))
        if store_pq:
            if m.size:
                pq_col = codes_to_arrow(encode_matrix(m, codebooks))
            else:
                pq_col = pa.array([], type=pa.binary(pq_m))
            out = out.append_column(_PQ_COL, pq_col)
        if store_sq8:
            if m.size:
                q8, sc = _sq8_columns(m)
            else:
                # empty blocks must still carry the sq8 columns or the
                # written files have heterogeneous schemas and a
                # use_sq8=True search fails on the missing column
                q8 = pa.FixedSizeListArray.from_arrays(
                    pa.array([], type=pa.int8()), int(dim)
                )
                sc = pa.array([], type=pa.float32())
            out = out.append_column(_Q8_COL, q8).append_column(_Q8_SCALE_COL, sc)
        return out

    os.makedirs(data_dir, exist_ok=True)
    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        data_dir, partition_cols=[_CELL_COL]
    )
    id_dtype = "int64"
    try:
        base = getattr(ds.schema(), "base_schema", None)
        if isinstance(base, pa.Schema):
            id_dtype = str(pd.Series([], dtype=base.field(id_column).type.to_pandas_dtype()).dtype)
    except Exception:
        pass  # metadata nicety only; empty-result dtype falls back to int64
    meta = {
        "kind": kind,
        "column": column,
        "id_column": id_column,
        "id_dtype": id_dtype,
        "dim": int(dim),
        "n_cells": int(n_cells),
        "n_probe_default": int(n_probe_default),
        "n_planes": int(n_planes),
        "probe_hamming_default": int(probe_hamming_default),
        "seed": int(seed),
        "store_sq8": bool(store_sq8),
        "store_pq": bool(store_pq),
        "pq_m": int(pq_m),
        "pq_codes": int(pq_codes),
    }
    if centroids is not None:
        np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    if codebooks is not None:
        np.save(os.path.join(index_dir, "pq_codebooks.npy"), codebooks)
    with open(os.path.join(index_dir, "index.json"), "w") as f:
        json.dump(meta, f)
    return AnnIndex(index_dir, meta, centroids, planes, codebooks)


class AnnIndex:
    """Handle over a built index directory; ``load`` reads only the tiny
    metadata (centroids / params), never the corpus."""

    def __init__(self, index_dir: str, meta: dict,
                 centroids: np.ndarray | None, planes: np.ndarray | None,
                 codebooks: np.ndarray | None = None):
        self.index_dir = index_dir
        self.meta = meta
        self.centroids = centroids
        self.planes = planes
        self.codebooks = codebooks

    @classmethod
    def load(cls, index_dir: str) -> "AnnIndex":
        with open(os.path.join(index_dir, "index.json")) as f:
            meta = json.load(f)
        centroids = planes = codebooks = None
        if meta["kind"] == "ivf":
            centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        else:
            planes = random_hyperplanes(meta["dim"], meta["n_planes"], meta["seed"])
        if meta.get("store_pq"):
            codebooks = np.load(os.path.join(index_dir, "pq_codebooks.npy"))
        return cls(index_dir, meta, centroids, planes, codebooks)

    # -- probe planning -----------------------------------------------------
    def probe_cells(self, query: np.ndarray, n_probe: int | None = None,
                    probe_hamming: int | None = None) -> list[int]:
        q = query.astype(np.float32)
        if self.meta["kind"] == "ivf":
            n_probe = self.meta["n_probe_default"] if n_probe is None else n_probe
            qn = q / max(np.linalg.norm(q), 1e-12)
            return np.argsort(-(self.centroids @ qn))[:n_probe].tolist()
        ph = (self.meta["probe_hamming_default"] if probe_hamming is None
              else probe_hamming)
        sig = int(lsh_signature(q.reshape(1, -1), self.planes)[0])
        # every signature within Hamming distance <= ph of the query's —
        # C(n_planes, d) cells per distance d, so keep ph small
        from itertools import combinations

        nb = self.meta["n_planes"]
        cells = {sig}
        for d in range(1, min(ph, nb) + 1):
            for bits in combinations(range(nb), d):
                m = 0
                for b in bits:
                    m |= 1 << b
                cells.add(sig ^ m)
        return sorted(cells)

    def _cell_dir(self, cell: int) -> str:
        return os.path.join(self.index_dir, "data", f"{_CELL_COL}={cell}")

    def probe_files(self, cells: list[int]) -> list[str]:
        """Parquet files the search will read — ONLY the probe cells'
        directories.  The pruning test asserts this is a strict subset of
        :meth:`all_files`."""
        out = []
        for c in cells:
            d = self._cell_dir(c)
            if os.path.isdir(d):
                out.extend(
                    os.path.join(d, f) for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
        return out

    def all_files(self) -> list[str]:
        data_dir = os.path.join(self.index_dir, "data")
        out = []
        for root, _dirs, files in os.walk(data_dir):
            out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
        return sorted(out)

    # -- search ---------------------------------------------------------------
    def search(self, query: np.ndarray, k: int = 10, n_probe: int | None = None,
               probe_hamming: int | None = None, use_sq8: bool = False,
               use_pq: bool = False, rescore: int = 64,
               tie_ndigits: int | None = None) -> pd.DataFrame:
        """Top-k by exact cosine over the probe cells only.  The read is
        pruned at the FILE level (``read_parquet`` over the probe
        directories); with ``use_sq8`` (int8 dot) or ``use_pq`` (PQ/ADC
        LUT over the 8-byte codes — the IVF-PQ pairing) candidates within
        each batch are pre-ranked on the compressed column and only
        ``rescore`` rows per batch take the float path."""
        import ray.data as rd

        id_column = self.meta["id_column"]
        column = self.meta["column"]
        files = self.probe_files(self.probe_cells(query, n_probe, probe_hamming))
        empty = pd.DataFrame({id_column: pd.Series([], dtype=self.meta.get("id_dtype", "int64")),
                              "cos_sim": pd.Series([], dtype="float64")})
        if not files:
            return empty
        use_pq = use_pq and self.meta.get("store_pq", False)
        cols = [id_column, column] + (
            [_Q8_COL, _Q8_SCALE_COL] if use_sq8 and self.meta["store_sq8"] else []
        ) + ([_PQ_COL] if use_pq else [])
        lut = adc_lut(query, self.codebooks) if use_pq else None
        pq_m = self.meta.get("pq_m", 0)
        ds = rd.read_parquet(files, columns=cols)
        score = cosine_scores_stage(query, column, id_column)
        q = query.astype(np.float32)
        qs = float(np.abs(q).max()) or 1.0
        q8 = np.clip(np.rint(q / qs * 127.0), -127, 127).astype(np.int32)

        def partial(batch: pa.Table) -> pa.Table:
            cand = batch
            if use_pq and len(batch):
                codes = codes_from_column(batch[_PQ_COL], pq_m, len(batch))
                # ADC distance ASCENDS with dissimilarity: keep the closest
                dist = lut[np.arange(pq_m)[None, :], codes].sum(1)
                # tie-inclusive: identical PQ codes tie exactly — keep the
                # whole boundary tie group so the rescore set is
                # deterministic (flatnonzero is already index-sorted)
                r = min(rescore, len(dist))
                rth = np.partition(dist, r - 1)[r - 1]
                cand = batch.take(pa.array(np.flatnonzero(dist <= rth)))
            elif use_sq8 and self.meta["store_sq8"] and len(batch):
                q8col = batch[_Q8_COL]
                if isinstance(q8col, pa.ChunkedArray):
                    q8col = q8col.combine_chunks()
                m8 = np.asarray(q8col.values).reshape(len(batch), -1)
                # m8 = row/scale*127, so the int8 dot must be scaled BACK
                # per row to rank proportionally to cosine — without it a
                # flat vector (scale ~ 1/sqrt(d)) outranks an exact copy
                scale = batch[_Q8_SCALE_COL].to_numpy(zero_copy_only=False)
                approx = (m8.astype(np.int32) @ q8) * scale.astype(np.float64)
                r = min(rescore, len(approx))
                rth = np.partition(-approx, r - 1)[r - 1]
                cand = batch.take(pa.array(np.flatnonzero(-approx <= rth)))
            df = _topk_frame(score(cand).to_pandas(), k, id_column, tie_ndigits)
            return pa.Table.from_pandas(df, preserve_index=False)

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        if parts.empty:
            return empty
        return _topk_frame(parts, k, id_column, tie_ndigits).reset_index(drop=True)
