"""Corpus vocabulary statistics: global top-k word n-grams.

The standard first look at a training corpus (boilerplate detection,
tokenizer budgeting).  Shape:

1. ``map_batches``: ONE vectorized tokenize per batch (shared
   :mod:`textstats` flat-token kernel), n-gram strings built by shifted
   pandas concat over the flat token array (no per-gram Python), then a
   per-batch partial count — the combiner, so the shuffle moves one row
   per (gram, batch).
2. one hash-bucket groupby summing partials: a gram lives in exactly one
   bucket, so bucket sums are exact totals.
3. per-bucket top-k (count desc, gram asc): the global top-k is contained
   in the union of per-bucket top-ks; the final merge handles
   ``num_buckets x k`` tiny rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.functions.textstats import (
    _flat_tokens,
    _lower_exact,
    shifted_word_ngrams,
)
from cdm_data_loader_utils_ray.stages.keyed import _add_bucket


def _batch_grams(texts: pa.Array, n: int) -> pd.Series:
    """All word n-grams of a batch (one Series entry per gram occurrence),
    built vectorized: flat tokens + (n-1) shifted string concats, masked to
    positions whose whole window stays inside one row."""
    flat, off, _len, valid = _flat_tokens(_lower_exact(pc.fill_null(texts, "")))
    toks = flat.to_pandas().reset_index(drop=True)
    nflat = len(toks)
    if nflat == 0:
        return pd.Series([], dtype=object)
    # valid-token positions only, preserving order (findall semantics)
    keep = np.flatnonzero(valid)
    toks = toks.iloc[keep].reset_index(drop=True)
    # row id per kept token, then window validity = same row at i and i+n-1
    row_of = np.repeat(np.arange(len(off) - 1), np.diff(off))[keep]
    if len(toks) < n:
        return pd.Series([], dtype=object)
    g, sel = shifted_word_ngrams(toks, row_of, n)
    return g[sel]


def top_ngrams(ds, text_column: str = "text", n: int = 2, k: int = 20,
               num_buckets: int = 64, batch_size: int = 4096):
    """Global top-``k`` word ``n``-grams by occurrence count (ties broken
    by gram ascending).  Returns a driver-side DataFrame of ``(gram, cnt)``
    — k rows, already a reduction."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        grams = _batch_grams(texts, n)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64()),
                             "__bucket__": pa.array([], type=pa.int32())})
        agg = grams.value_counts(sort=False).rename_axis("gram").rename("cnt").reset_index()
        t = pa.Table.from_pandas(agg, preserve_index=False)
        return _add_bucket(t, ["gram"], num_buckets)

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("gram", sort=False)["cnt"].sum().reset_index()
        g = g.sort_values(["cnt", "gram"], ascending=[False, True], kind="stable")
        return g.head(k)

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__bucket__")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()  # num_buckets x k tiny rows
    )
    out = parts.sort_values(["cnt", "gram"], ascending=[False, True], kind="stable")
    return out.head(k).reset_index(drop=True)
