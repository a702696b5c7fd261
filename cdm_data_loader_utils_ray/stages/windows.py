"""Per-key ORDERED window functions: running (prefix) aggregates and
lag/lead shifts — the ``sum(x) OVER (PARTITION BY k ORDER BY o ROWS
UNBOUNDED PRECEDING)`` / ``lag(x) OVER (...)`` family the reference's
Spark pipelines get from ``pyspark.sql.window`` (SURVEY §2.8; e.g. the
ranking-window dedup in the loader utilities).

Shape (one shuffle, Ray-Data-native):

1. ``map_batches``: append a key-hash bucket column (``stable_key_hash %
   num_buckets`` — the engine-wide frozen partitioner);
2. ONE ``groupby(bucket).map_groups``: every row of a key lands in exactly
   one bucket, so a vectorized ``sort_values`` + pandas ``groupby``
   cumsum/cumcount/shift inside the bucket is exact.

Partitioning assumption (documented per the custom-operator rule): a KEY
must fit in one bucket's memory.  Buckets hold ``n_keys / num_buckets``
keys each — size ``num_buckets`` so the largest bucket fits a worker
heap; hot single keys can't be split (window semantics are inherently
per-key-ordered), they are the same limit every engine has.

Unlike sliding/tumbling windows (:mod:`stages.temporal`), these are ROW
windows: no pre-aggregation is possible because every input row produces
an output row carrying its own prefix state.  The shuffle therefore moves
only the needed columns — project upstream (``columns=[...]`` at the
read) so the exchange carries keys + order + value columns, nothing else.

Determinism: callers must pass ``order_columns`` forming a TOTAL order
within each key (e.g. a unique sequence/line number, or a timestamp plus
a unique id as tiebreak); otherwise prefix sums are layout-dependent.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.stages.keyed import _BUCKET, _add_bucket


def _bucketed_ordered(ds, key_columns: Sequence[str], num_buckets: int,
                      batch_size: int, per_bucket):
    keys = list(key_columns)

    def tag(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, keys, num_buckets)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return per_bucket(df.drop(columns=[_BUCKET]))

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
        .groupby(_BUCKET)
        .map_groups(run, batch_format="pandas")
    )


def running_totals(
    ds,
    key_columns: Sequence[str],
    order_columns: Sequence[str],
    sum_columns: Mapping[str, str],
    row_number_alias: str | None = "row_n",
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """Prefix aggregates per key in ``order_columns`` order: appends
    ``row_number()`` (1-based, as ``row_number_alias``) and, for each
    ``{source: alias}`` in ``sum_columns``, the running ``sum(source)``
    over ``ROWS UNBOUNDED PRECEDING``.

    Sums accumulate strictly left-to-right per key (pandas ``cumsum`` over
    the sorted frame), matching SQL streaming running totals; on
    integer(-valued) columns the result is exact, on floats it is the
    sequential IEEE sum in key order."""
    keys, order = list(key_columns), list(order_columns)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order, kind="mergesort").reset_index(drop=True)
        g = df.groupby(keys, sort=False)
        if row_number_alias is not None:
            df[row_number_alias] = (g.cumcount() + 1).astype("int64")
            g = df.groupby(keys, sort=False)  # re-bind after column insert
        for src, alias in sum_columns.items():
            df[alias] = g[src].cumsum()
        return df

    return _bucketed_ordered(ds, keys, num_buckets, batch_size, per_bucket)


def rolling_frame(
    ds,
    key_columns: Sequence[str],
    order_columns: Sequence[str],
    window: int,
    agg_columns: Mapping[str, tuple[str, str]],
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """Fixed ROW-frame rolling aggregates per key in ``order_columns``
    order — SQL's ``agg(x) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)``.  ``agg_columns`` maps output
    alias -> (source column, how) with how in sum/mean/min/max/count;
    frames shorter than ``window`` (the first rows of each key) aggregate
    what exists (``min_periods=1``), matching the SQL frame semantics.

    Same one-shuffle shape as the other row windows here; a ROW frame
    cannot be pre-aggregated (every output row carries its own frame
    state), so only project the needed columns upstream.  Sums over
    floats are pandas' rolling kernel — pass integer(-quantized) sources
    when cross-engine exactness matters (see the catalog's cents trick).
    Null keys form one partition (SQL PARTITION BY semantics)."""
    keys, order = list(key_columns), list(order_columns)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order, kind="mergesort").reset_index(drop=True)
        g = df.groupby(keys, sort=False, dropna=False)
        for alias, (src, how) in agg_columns.items():
            res = getattr(g[src].rolling(window, min_periods=1), how)()
            # groupby.rolling indexes by (keys..., original row position);
            # drop the key levels and align on the position index — exact
            # regardless of group iteration order
            df[alias] = res.droplevel(list(range(len(keys))))
        return df

    return _bucketed_ordered(ds, keys, num_buckets, batch_size, per_bucket)


def rolling_time_frame(
    ds,
    key_columns: Sequence[str],
    ts_column: str,
    interval: str,
    sum_columns: Mapping[str, str],
    count_alias: str | None = "win_n",
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """Time-based RANGE-frame rolling aggregates per key — SQL's
    ``sum(x) OVER (PARTITION BY k ORDER BY ts RANGE BETWEEN INTERVAL
    interval PRECEDING AND CURRENT ROW)``: for each row, sum/count over
    the key's rows with ``ts in [row.ts - interval, row.ts]``.

    RANGE semantics are BY VALUE, not position: rows tying the current
    row's timestamp (peers) are included even when a positional tiebreak
    would order them later, so — unlike the ROW-frame functions here —
    the result needs no total order within a key and is independent of
    tie layout, exactly like SQL.

    Vectorized per bucket with zero per-group loops: one sort, group ids,
    per-group-banded shifted timestamps (disjoint int64 bands sized
    span+interval) so a single global ``searchsorted`` pair yields every
    row's [lo, hi] window, then prefix-sum differences.  Sums use the
    prefix-difference trick: EXACT for integer(-quantized) sources (the
    catalog's cents convention); float sources accumulate cumsum error —
    quantize first when cross-engine exactness matters.  min/max need no
    prefix structure SQL lacks too — use :func:`rolling_frame` (ROW
    frames) or a self-range-join for those."""
    keys = list(key_columns)
    # everything in NANOSECONDS: pandas timestamp columns arrive as
    # datetime64[ns] or [us] depending on the source — normalizing both the
    # column and the interval to one unit keeps the compare unit-safe
    delta = int(pd.Timedelta(interval).value)
    if delta < 0:
        raise ValueError("interval must be non-negative")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + [ts_column], kind="mergesort").reset_index(
            drop=True
        )
        n = len(df)
        if n == 0:
            out = df.copy()
            for alias in sum_columns.values():
                out[alias] = pd.Series([], dtype="float64")
            if count_alias:
                out[count_alias] = pd.Series([], dtype="int64")
            return out
        if df[ts_column].isna().any():
            raise ValueError(
                "rolling_time_frame: null timestamps have no RANGE-frame "
                "value semantics — filter or impute them first"
            )
        gid = df.groupby(keys, sort=False, dropna=False).ngroup().to_numpy()
        t = df[ts_column].to_numpy(dtype="datetime64[ns]").astype("int64")
        t0 = t - t.min()
        band = int(t0.max()) + delta + 2
        if band * (int(gid.max()) + 1) >= 2**62:
            raise ValueError(
                "rolling_time_frame: ts span * group count overflows the "
                "banded int64 search — reduce the bucket key cardinality "
                "(raise num_buckets) or narrow the interval"
            )
        shifted = t0 + gid * band
        lo = np.searchsorted(shifted, shifted - delta, side="left")
        hi = np.searchsorted(shifted, shifted, side="right") - 1
        for src, alias in sum_columns.items():
            csum = df[src].to_numpy().cumsum()
            win = csum[hi] - np.where(lo > 0, csum[lo - 1], 0)
            df[alias] = win
        if count_alias:
            df[count_alias] = (hi - lo + 1).astype("int64")
        return df

    return _bucketed_ordered(ds, keys, num_buckets, batch_size, per_bucket)


def lag_shift(
    ds,
    key_columns: Sequence[str],
    order_columns: Sequence[str],
    shift_columns: Mapping[str, str],
    periods: int = 1,
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """``lag(source, periods)`` per key in ``order_columns`` order: for
    each ``{source: alias}`` appends the value ``periods`` rows earlier
    within the key (null on the first ``periods`` rows — callers coalesce
    to their sentinel).  ``periods < 0`` gives ``lead``."""
    keys, order = list(key_columns), list(order_columns)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order, kind="mergesort").reset_index(drop=True)
        g = df.groupby(keys, sort=False)
        for src, alias in shift_columns.items():
            df[alias] = g[src].shift(periods)
        return df

    return _bucketed_ordered(ds, keys, num_buckets, batch_size, per_bucket)
