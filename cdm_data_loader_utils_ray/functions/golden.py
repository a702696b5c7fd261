"""Field-level survivorship merge ("golden record" consolidation).

Row-level LWW (``stages/keyed.lww_latest``) keeps whole rows: if the latest
row for a key carries a null in some field, the earlier non-null value is
lost.  Entity consolidation (the D3 "dedup with preference" family taken to
its CDC conclusion — reference parity: the per-attribute merge the loader's
audit upsert performs one table at a time, ``audit/tables.py`` /
``refseq_pipeline/core/spark_delta.py:130-139`` dedup-ranking) instead
resolves EACH FIELD independently to its value in the latest row (by the
order columns) where that field is non-null.

Scalable shape (same as ``lww_latest``): a within-batch combiner keeps, per
key, only the rows that can still win — for each requested field the latest
non-null row, plus the latest row overall (so keys whose fields are all
null still appear) — i.e. at most ``len(fields)+1`` rows per key per batch,
then ONE key-bucket shuffle whose per-bucket kernel is a single vectorized
``sort + groupby.last()`` (pandas ``last`` is last-NON-NULL per column,
exactly survivorship).  Order ties break by input order (stable sorts), the
same contract as ``lww_latest``.

Null keys group together (SQL GROUP BY semantics, ``dropna=False`` — the
r4 review-batch-9 invariant)."""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.stages.keyed import _BUCKET, _add_bucket


def _survivor_indices(
    batch: pa.Table,
    keys: list[str],
    order_columns: list[str],
    fields: list[str],
) -> np.ndarray:
    """Indices of rows that can still win a per-field last-non-null merge:
    for each key, each field's latest non-null row, plus the latest row
    overall.  Only key/order columns round-trip through pandas (grouping
    and the stable sort); field VALUES never leave Arrow, so exotic or
    >2^53-int payloads stay exact."""
    ko = batch.select(keys + order_columns).to_pandas()
    order = ko.sort_values(order_columns, kind="stable").index.to_numpy()
    codes = (
        ko.iloc[order]
        .groupby(keys, sort=False, dropna=False)
        .ngroup()
        .to_numpy()
    )
    pos = np.arange(len(order), dtype=np.int64)
    keep = np.zeros(len(order), dtype=bool)
    for f in fields:
        valid = np.asarray(pc.is_valid(batch[f]).combine_chunks())[order]
        cand = np.where(valid, pos, np.int64(-1))
        last_valid = pd.Series(cand).groupby(codes).transform("max").to_numpy()
        keep |= (pos == last_valid) & valid
    # the latest row per key, valid fields or not: keys whose field is all
    # null must still produce a (null) golden row
    last_any = pd.Series(pos).groupby(codes).transform("max").to_numpy()
    keep |= pos == last_any
    return order[np.flatnonzero(keep)]


def _golden_rows(
    df: pd.DataFrame,
    keys: list[str],
    order_columns: list[str],
    fields: list[str],
) -> pd.DataFrame:
    d = df.sort_values(order_columns, kind="stable")
    g = d.groupby(keys, sort=False, dropna=False, as_index=False)
    return g[fields].last()  # last() = last NON-NULL per column


def survivorship_merge(
    ds,
    key_columns: Sequence[str],
    order_columns: Sequence[str],
    fields: Sequence[str],
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """Golden-record merge: one row per key whose every ``fields`` column is
    the value from the latest (by ``order_columns``) row where that column
    is non-null.  Returns a Dataset with ``key_columns + fields``.

    Input must carry ``key_columns + order_columns + fields``; other
    columns are dropped (they have no defined survivorship)."""
    keys = list(key_columns)
    order_cols = list(order_columns)
    flds = list(fields)
    carry = keys + order_cols + flds

    def combine(batch: pa.Table) -> pa.Table:
        batch = batch.select(carry)
        if len(batch) == 0:
            return _add_bucket(batch, keys, num_buckets)
        idx = _survivor_indices(batch, keys, order_cols, flds)
        return _add_bucket(batch.take(idx), keys, num_buckets)

    def reduce_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return _golden_rows(
            group.drop(columns=[_BUCKET]), keys, order_cols, flds
        )

    return (
        ds.map_batches(combine, batch_format="pyarrow", batch_size=batch_size)
        .groupby(_BUCKET)
        .map_groups(reduce_bucket, batch_format="pandas")
    )
