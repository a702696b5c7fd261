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


def grouped_partial_minmax(
    ds,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    batch_size: int = 65536,
):
    """Distributed ``GROUP BY keys`` with min/max aggregates (same combiner
    shape as :func:`grouped_partial_sums` — min/max are idempotent folds, so
    per-batch partials then one bucket shuffle give the exact result).

    ``aggs`` maps output column -> (input column, 'min' | 'max').
    """
    keys = list(keys)
    out_cols = list(aggs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        parts = {}
        for out, (col, how) in aggs.items():
            parts[out] = g[col].max() if how == "max" else g[col].min()
        agg = pd.DataFrame(parts).reset_index()
        t = pa.Table.from_pandas(agg, preserve_index=False)
        return _add_bucket(t, keys, 64).to_pandas()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["__bucket__"])
        g = df.groupby(keys, sort=False, dropna=False)
        folded = {}
        for out, (_col, how) in aggs.items():
            folded[out] = g[out].max() if how == "max" else g[out].min()
        return pd.DataFrame(folded).reset_index()

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


def grouped_quantiles(
    ds,
    keys: Sequence[str],
    value_column: str,
    quantiles: Mapping[str, float],
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """Exact ``GROUP BY keys`` quantiles with linear interpolation — the
    convention of SQL ``quantile_cont`` / ``percentile_cont`` (and numpy's
    default), so a DuckDB twin reproduces the values bit-for-bit.

    ``quantiles`` maps output column -> fraction (e.g. ``{"p50": 0.5}``).

    Scale shape: exact quantiles need every value of a group in one place,
    so this ships the PRUNED (keys, value) pairs through one hash-bucket
    shuffle and computes all groups of a bucket with a single vectorized
    pandas ``groupby().quantile()``.  Right for group-level quantiles where
    the biggest single group fits a worker (the reference's analytics
    shapes); for corpus-wide quantiles over 100 TB use a mergeable sketch
    instead — exactness and single-pass-distribution can't both hold.
    """
    keys = list(keys)
    qcols = list(quantiles)

    def bucketed(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch.select(keys + [value_column]), keys, num_buckets)

    def q_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop(columns=["__bucket__"]).groupby(keys, sort=False, dropna=False)[
            value_column
        ]
        series = [
            g.quantile(q, interpolation="linear").rename(name)
            for name, q in quantiles.items()
        ]
        return pd.concat(series, axis=1).reset_index()[keys + qcols]

    return (
        ds.map_batches(bucketed, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__bucket__")
        .map_groups(q_bucket, batch_format="pandas")
    )


def pivot_counts(
    ds,
    keys: Sequence[str],
    pivot_column: str,
    categories: Sequence[str],
    batch_size: int = 65536,
    num_buckets: int = 64,
):
    """Pivoted conditional counts: ``GROUP BY keys`` with one ``n_<cat>``
    column per category of ``pivot_column`` (SQL ``count(*) FILTER``).

    Same combiner shape as :func:`grouped_partial_sums`: the pivot happens
    INSIDE the per-batch partial (one indicator sum per category), so the
    shuffle moves one partial row per (key, batch) — never the raw rows.
    Categories must be the known closed set (pass the distinct values; an
    unexpected category — including NULL — is counted by ``n_other``; a
    SQL twin must spell that as ``x IS NULL OR x NOT IN (...)``, since
    bare ``NOT IN`` silently drops nulls).
    """
    keys = list(keys)
    cats = list(categories)
    out_cols = [f"n_{c}" for c in cats] + ["n_other"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pv = df[pivot_column]
        for c, out in zip(cats, out_cols):
            df[out] = (pv == c).astype("int64")
        df["n_other"] = (~pv.isin(cats)).astype("int64")
        agg = df.groupby(keys, sort=False, dropna=False)[out_cols].sum().reset_index()
        t = pa.Table.from_pandas(agg, preserve_index=False)
        return _add_bucket(t, keys, num_buckets).to_pandas()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop(columns=["__bucket__"]).groupby(keys, sort=False, dropna=False)[
            out_cols
        ].sum()
        return g.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    return partials.groupby("__bucket__").map_groups(final, batch_format="pandas")


def top_n_per_group(
    ds,
    keys: Sequence[str],
    order_column: str,
    n: int,
    tiebreak: Sequence[str] = (),
    ascending: bool = False,
    rank_column: str = "rnk",
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """Ranking-window top-N per group: SQL ``row_number() OVER (PARTITION BY
    keys ORDER BY order_column [DESC], tiebreak...) <= n`` with the rank
    exposed as ``rank_column``.

    Distributed with a true combiner: a group's global top-N is contained in
    the union of its per-batch top-Ns, so each map batch keeps at most N
    rows per key before the single hash-bucket shuffle — on skewed 100-TB
    groups the exchange carries O(groups x N), not the raw rows.

    ``tiebreak`` columns (ascending) must make the order total, or ranks
    are nondeterministic across runs (same caveat as SQL row_number).
    """
    keys = list(keys)
    sort_cols = [order_column] + list(tiebreak)
    asc = [ascending] + [True] * len(tiebreak)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(sort_cols, ascending=asc, kind="stable")
        d = d.groupby(keys, sort=False, dropna=False).head(n)
        t = pa.Table.from_pandas(d, preserve_index=False)
        return _add_bucket(t, keys, num_buckets).to_pandas()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=["__bucket__"]).sort_values(
            sort_cols, ascending=asc, kind="stable"
        )
        d = d.groupby(keys, sort=False, dropna=False).head(n).copy()
        d[rank_column] = d.groupby(keys, sort=False, dropna=False).cumcount() + 1
        return d

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .groupby("__bucket__")
        .map_groups(final, batch_format="pandas")
    )


def grouped_exact_sums(
    ds,
    key: str,
    prepare,
    moment_columns: Sequence[str],
    batch_size: int = 16384,
    fold_batch: int = 65536,
):
    """Exact integer GROUP BY sums whose TOTALS may exceed int64 (moment
    tables for correlation/variance over quantized values, money sums at
    corpus scale, ...).  Three levels, none of which ever rounds:

    1. per-batch int64 partials — ``prepare(df) -> DataFrame`` must return
       ``key`` + int64 moment columns per row, and the caller sizes
       ``batch_size`` so one batch's column sum stays inside int64;
    2. one distributed fold over the partial stream with PYTHON-INT
       accumulation (pandas object dtype adds arbitrary-precision ints),
       emitted as decimal strings — this bounds what reaches the driver by
       ``#fold-batches x k``, not ``#blocks x k``, so a 100-TB scan's
       partial stream never lands on the driver;
    3. a driver fold of the string partials with Python ints.

    Returns ``{key_value: (n, *moment sums)}`` with exact ``int`` values —
    the same numbers a DuckDB ``sum(BIGINT) -> HUGEINT`` twin produces.
    """
    cols = list(moment_columns)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = prepare(df)
        g = d.groupby(key, sort=False, dropna=False)
        out = g[cols].sum()
        out.insert(0, "__n__", g.size())
        return out.reset_index()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # object dtype FORCED via an explicit object Series: pandas re-infers
        # int64 from .map(int)/astype(object) chains, silently wrapping sums
        # past 2^63 — the explicit dtype makes groupby.sum add Python ints
        for c in ["__n__"] + cols:
            df[c] = pd.Series([int(v) for v in df[c]], dtype=object,
                              index=df.index)
        g = df.groupby(key, sort=False, dropna=False)[["__n__"] + cols].sum()
        out = g.reset_index()
        for c in ["__n__"] + cols:
            out[c] = out[c].map(str)  # decimal strings survive Arrow exactly
        return out

    folded = (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .map_batches(fold, batch_format="pandas", batch_size=fold_batch)
        .take_all()
    )
    acc: dict = {}
    for r in folded:
        k = r[key]
        # float-typed keys surface NaN (not Arrow null) through take_all,
        # and NaN objects from different fold batches are neither identical
        # nor equal — normalize every null-like key to None so the group
        # dropna=False preserved doesn't fragment in the dict fold
        if k is not None and pd.isna(k):
            k = None
        a = acc.setdefault(k, [0] * (1 + len(cols)))
        a[0] += int(r["__n__"])
        for i, c in enumerate(cols):
            a[i + 1] += int(r[c])
    return {k: tuple(v) for k, v in acc.items()}
