"""Aggregation with a within-batch combiner.

Reference A1 (``audit/metrics.py:60-65``) computes global counts via Spark's
partial+final aggregation; Ray Data's bare ``groupby().aggregate`` shuffles
every row, so for scale we pre-aggregate per batch in ``map_batches`` (one
row per (key, batch)) and run the shuffle over the tiny partials — the
standard combiner pattern for 100-TB groupbys with low-cardinality keys.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.stages.keyed import _add_bucket


def grouped_partial_sums(
    ds,
    keys: Sequence[str],
    sum_exprs: Mapping[str, str],
    count_alias: str = "n",
    batch_size: int = 65536,
):
    """Distributed ``GROUP BY keys`` with sums and a count.

    ``sum_exprs`` maps output column -> pandas expression over the batch
    (e.g. ``{"sum_disc_price": "l_extendedprice * (1 - l_discount)"}``).
    Returns a Dataset with one row per key combination: keys..., sums...,
    ``count_alias``.  Two stages: per-batch pandas groupby (combiner) ->
    one small shuffle over partials.
    """
    keys = list(keys)
    out_cols = list(sum_exprs)

    # Shuffle by a BUCKET of the key hash, not the raw key: ``map_groups``
    # fires once per group, so high-cardinality keys would mean one Python
    # call per key.  One bucket handles thousands of keys with a single
    # vectorized pandas groupby.
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        for out, expr in sum_exprs.items():
            df[out] = df.eval(expr)
        g = df.groupby(keys, sort=False, dropna=False)
        agg = g[out_cols].sum()
        agg[count_alias] = g.size()
        agg = agg.reset_index()
        t = pa.Table.from_pandas(agg, preserve_index=False)
        return _add_bucket(t, keys, 64).to_pandas()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["__bucket__"])
        g = df.groupby(keys, sort=False, dropna=False)[out_cols + [count_alias]].sum()
        return g.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    return partials.groupby("__bucket__").map_groups(final, batch_format="pandas")


def global_counts(ds, predicates: Mapping[str, str], batch_size: int = 65536) -> pd.DataFrame:
    """Global ``count(*)`` + conditional counts in ONE streaming pass
    (reference metrics: records_read / valid / invalid).  ``predicates``
    maps output column -> pandas boolean expression; returns a one-row
    DataFrame with ``records_read`` plus one column per predicate."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        row = {"records_read": [len(df)]}
        for out, expr in predicates.items():
            row[out] = [int(df.eval(expr).sum())]
        return pd.DataFrame(row)

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size).to_pandas()
    return parts.sum().to_frame().T.astype("int64")
