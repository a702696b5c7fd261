"""SCD Type 2 history build: collapse a per-key ORDERED change log into
versioned dimension rows with ``[valid_from, valid_to)`` ranges and an
``is_current`` flag — the slowly-changing-dimension shape every CDC
consumer eventually materializes (beyond reference; the reference's Delta
pipelines stop at LWW latest-state, ``SURVEY §2.10``).

Semantics (Kimball SCD2, run-length collapsed):

* rows are ordered per key by ``order_column`` (must be a TOTAL order
  within the key — a unique sequence/event id);
* a NEW VERSION starts at the first row of the key and whenever ANY
  tracked attribute differs from the previous row of the same key
  (consecutive duplicates collapse into one version — re-asserting the
  same value does not create history);
* ``valid_from`` = the order value of the version's first row;
  ``valid_to`` = the next version's ``valid_from`` (exclusive), NULL for
  the key's current version; ``is_current`` marks that open version.

Shape (one shuffle, Ray-Data-native, same machinery as
:func:`stages.windows.lag_shift`): tag each row with the frozen key-hash
bucket, ONE ``groupby(bucket).map_groups``, and a fully vectorized
sort + shift-compare inside the bucket.  Every key lands in exactly one
bucket, so version boundaries are exact.  Partitioning assumption: a
key's full history fits in one bucket's memory (size ``num_buckets`` so
the largest bucket fits a worker heap).

Null attribute values compare EQUAL to null (a null->null transition is
not a change), matching SQL's ``IS DISTINCT FROM``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from cdm_data_loader_utils_ray.stages.windows import _bucketed_ordered


def _same_as_shifted(frame: pd.DataFrame, periods: int) -> np.ndarray:
    """Row-wise ALL-columns equality with the frame shifted by ``periods``,
    null==null counted equal; boundary rows (no neighbor) forced False."""
    shifted = frame.shift(periods)
    eq = (frame.eq(shifted) | (frame.isna() & shifted.isna())).all(axis=1).to_numpy()
    if len(eq):
        if periods > 0:
            eq[:periods] = False
        elif periods < 0:
            eq[periods:] = False
    return eq


def scd2_history(
    ds,
    key_columns: Sequence[str],
    order_column: str,
    attr_columns: Sequence[str],
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """SCD Type 2 over a change log: one output row per (key, version run)
    with columns ``key_columns + attr_columns + [valid_from, valid_to,
    is_current]``.  ``valid_to`` is null (open) on each key's current
    version — callers coalesce to their sentinel; ``is_current`` is bool.
    """
    keys, attrs = list(key_columns), list(attr_columns)
    cols_out = keys + attrs + ["valid_from", "valid_to", "is_current"]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(columns=cols_out)
        df = df.sort_values(keys + [order_column], kind="mergesort").reset_index(drop=True)
        same_key = _same_as_shifted(df[keys], 1)
        same_attrs = _same_as_shifted(df[attrs], 1)
        starts = ~(same_key & same_attrs)  # first row of key, or any attr changed
        kept = df.loc[starts, keys + attrs + [order_column]].reset_index(drop=True)
        kept = kept.rename(columns={order_column: "valid_from"})
        next_same_key = _same_as_shifted(kept[keys], -1)
        kept["valid_to"] = kept["valid_from"].shift(-1).where(next_same_key)
        kept["is_current"] = ~next_same_key
        return kept[cols_out]

    return _bucketed_ordered(ds, keys, num_buckets, batch_size, per_bucket)
