"""Edit-distance (Levenshtein) fuzzy near-duplicate pairs with blocking —
the curation step that catches typo-level duplicates exact-hash and
shingle dedup both miss (OCR noise, single-character mutations, trailing
whitespace variants).

Shape (one shuffle, the dedup-family pattern):

1. ``map_batches``: compute a BLOCK key per doc (default: the last 16
   characters of the text — suffix blocking, robust to head-of-document
   noise and cheap to express in SQL as ``right(text, 16)``), then append
   the engine-wide frozen key-hash bucket;
2. ONE ``groupby(bucket).map_groups``: every doc of a block lands in one
   bucket; blocks with >= 2 docs generate candidate pairs (vectorized
   run-size grouping), each pruned by the length-difference lower bound
   (``|len(a) - len(b)| > max_dist`` can never pass) before the DP;
3. the DP itself is the classic rolling-row Levenshtein with the inner
   row fully vectorized in numpy (substitution/insertion elementwise,
   the deletion cascade via the prefix-min identity
   ``min_i<=j (cur_i + (j-i)) = j + cummin(cur_i - i)``) — O(len(s))
   Python iterations per pair, never O(len(s) * len(t)).

Candidate volume is bounded by the blocking selectivity, the same
contract as the LSH dedup family; pairs within a block are inherently
quadratic (documented).  Blocking is part of the operator's semantics:
two docs in different blocks are never compared — the SQL oracle twin
applies the identical block key, so results match exactly.

Early-out band: rows whose running minimum exceeds ``max_dist`` abort the
DP (the distance can only grow), so non-duplicate candidate pairs cost
~``max_dist`` rows, not ``len(s)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.stages.keyed import _BUCKET, _add_bucket


def levenshtein(s: str, t: str, max_dist: int | None = None) -> int:
    """Unit-cost edit distance; with ``max_dist``, may short-circuit once
    the distance provably exceeds it — the return value is then SOME value
    ``> max_dist`` (``max_dist + 1`` on early exit, the exact distance
    otherwise).  Exact whenever the result is ``<= max_dist``, which is
    the only property pair filters rely on."""
    if s == t:
        return 0
    m, n = len(s), len(t)
    if m == 0 or n == 0:
        return max(m, n)
    if max_dist is not None and abs(m - n) > max_dist:
        return max_dist + 1
    ta = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    ar = np.arange(n + 1, dtype=np.int64)
    prev = ar.copy()
    cur = np.empty(n + 1, dtype=np.int64)
    for i, ch in enumerate(s):
        cost = (ta != ord(ch)).astype(np.int64)
        cur[0] = i + 1
        cur[1:] = np.minimum(prev[:-1] + cost, prev[1:] + 1)
        # deletion cascade: cur[j] = min(cur[j], cur[j-1] + 1, cur[j-2] + 2, ...)
        np.add(np.minimum.accumulate(cur - ar), ar, out=cur)
        if max_dist is not None and cur.min() > max_dist:
            return max_dist + 1
        prev, cur = cur, prev
    return int(prev[n])


def _suffix_block(texts: pa.ChunkedArray | pa.Array, width: int) -> pa.Array:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    filled = pc.fill_null(texts, "")
    return pc.utf8_slice_codeunits(filled, start=-width)


def fuzzy_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    max_dist: int = 2,
    block_width: int = 16,
    num_buckets: int = 64,
    batch_size: int = 4096,
):
    """All (id_a, id_b, dist) with ``id_a < id_b``, both docs sharing the
    same ``block_width``-character text suffix, and edit distance
    ``<= max_dist``.  Null texts compare as ``''``."""

    def tag(batch: pa.Table) -> pa.Table:
        texts = batch[text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        t = pa.table(
            {
                "id": batch[id_column],
                "text": pc.fill_null(texts, ""),
                "blk": _suffix_block(texts, block_width),
            }
        )
        return _add_bucket(t, ["blk"], num_buckets)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_a, ids_b, dists = [], [], []
        df = df.sort_values(["blk", "id"], kind="mergesort")
        blk = df["blk"].to_numpy()
        ids = df["id"].to_numpy()
        txt = df["text"].to_numpy()
        # run boundaries over the sorted block column
        new = np.empty(len(df), dtype=bool)
        if len(df):
            new[0] = True
            new[1:] = blk[1:] != blk[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(df))
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            for i in range(s, e):
                for j in range(i + 1, e):
                    d = levenshtein(txt[i], txt[j], max_dist=max_dist)
                    if d <= max_dist:
                        ids_a.append(ids[i])
                        ids_b.append(ids[j])
                        dists.append(d)
        # preserve the input id dtype (string doc ids are first-class in
        # the dedup family — int64 coercion would crash the worker); an
        # empty group still carries its dtype, keeping bucket schemas equal
        id_dtype = df["id"].dtype
        if pd.api.types.is_integer_dtype(id_dtype):
            id_dtype = "int64"
        return pd.DataFrame(
            {
                "id_a": pd.Series(ids_a, dtype=id_dtype),
                "id_b": pd.Series(ids_b, dtype=id_dtype),
                "dist": pd.Series(dists, dtype="int64"),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
        .groupby(_BUCKET)
        .map_groups(bucket_pairs, batch_format="pandas")
    )


def fuzzy_dedup_clusters(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    max_dist: int = 2,
    block_width: int = 16,
    num_buckets: int = 64,
    max_driver_pairs: int = 5_000_000,
):
    """Blocked-Levenshtein pair graph collapsed to connected components
    (min-id canonical label).  The pair Dataset is materialized once
    (blocking-bounded); below ``max_driver_pairs`` the driver union-find
    runs, above it the distributed label-propagation path engages — the
    same auto-switch contract as the minhash family."""
    from cdm_data_loader_utils_ray.functions.dedup import (
        connected_components,
        connected_components_distributed,
    )

    pairs = fuzzy_pairs(
        ds, id_column=id_column, text_column=text_column, max_dist=max_dist,
        block_width=block_width, num_buckets=num_buckets,
    ).materialize()
    n = pairs.count()
    if n == 0:
        # a pair-less corpus has only singleton clusters (omitted, like
        # every dedup-family cluster output); an all-empty Dataset loses
        # its schema on to_pandas, so build the typed empty here
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "cluster": pd.Series([], dtype="int64")})
    if n > max_driver_pairs:
        return connected_components_distributed(pairs).to_pandas()
    return connected_components(pairs.to_pandas())
