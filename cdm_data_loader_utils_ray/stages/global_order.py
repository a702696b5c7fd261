"""Global ordered prefix sums without a global sort — the scale shape for
"take documents in quality order until a token budget is exhausted"
(training-corpus selection) and any other ORDER BY ... ROWS UNBOUNDED
PRECEDING window over the WHOLE dataset.

A naive implementation sorts the corpus globally and runs a driver-side
cumulative scan.  Here the total order is decomposed into order-monotone
range buckets instead:

1. boundary pass — a fixed-size quantile sketch of the order column
   (:func:`functions.sketches.approx_quantiles`) picks ``num_buckets``
   range boundaries; approximation only affects bucket BALANCE, never
   correctness, because bucket assignment is a deterministic monotone
   function of the order key;
2. offset pass — one streaming scan emits per-batch (bucket, sum, count)
   partials; the driver folds them into exact per-bucket totals and
   cumulative offsets (#buckets rows — tiny).  Buckets whose offset
   already exceeds the budget are pruned wholesale (values must be
   non-negative, which token/char counts are);
3. prefix pass — ONE keyed shuffle of only the surviving buckets; inside
   each bucket the rows sort locally, prefix-sum, add the bucket offset,
   and cut at the budget.

Bytes shuffled are O(selected + one bucket), not O(corpus); driver state
is O(num_buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.functions.sketches import approx_quantiles


def _bucket_of(scores: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Order-monotone bucket id: bucket 0 holds the HIGHEST scores.
    Equal scores always map to the same bucket (searchsorted is
    deterministic), so ties never straddle a boundary.  NaN scores get the
    bucket PAST the lowest (DESC NULLS LAST, matching the SQL twin) —
    searchsorted would otherwise place them in bucket 0, spending the
    budget on null-score rows first."""
    b = (len(bounds) - np.searchsorted(bounds, scores, side="left")).astype(np.int64)
    nan = np.isnan(scores)
    if nan.any():
        b[nan] = len(bounds) + 1
    return b


def _empty_proto(ds, cum_alias: str):
    """Zero-row Dataset carrying the input schema + the ``cum_alias``
    float64 column — unioned onto the result so an all-filtered run still
    has a stable schema (a zero-block ``map_groups`` output loses its
    schema entirely otherwise).  Caveat: a nullable-int passthrough column
    that HOLDS nulls in surviving rows round-trips through the pandas
    group kernels as float64 and then disagrees with this proto's int
    declaration — pre-cast such columns to float64 (or fill them) before
    calling the prefix/rank helpers."""
    import ray.data as rd

    base = getattr(ds.schema(), "base_schema", None)
    if isinstance(base, pa.Schema):
        tbl = base.empty_table().append_column(
            cum_alias, pa.array([], type=pa.float64())
        )
        return rd.from_arrow(tbl)
    if base is None:  # schema-less lineage: nothing to type the proto from
        raise TypeError("prefix/rank helpers need a dataset with a schema")
    # pandas-block lineage: PandasBlockSchema carries numpy dtypes, which
    # pd.Series(dtype=...) accepts directly
    df = pd.DataFrame(
        {n: pd.Series([], dtype=t) for n, t in zip(base.names, base.types)}
    )
    df[cum_alias] = pd.Series([], dtype="float64")
    return rd.from_pandas(df)


def _boundary_input(ds, sample_rows: int | None):
    """Optionally cap the boundary pass at a row-limit prefix: boundaries
    steer BALANCE only (bucket assignment stays a deterministic monotone
    function of the key), so a prefix sample is safe whenever the input's
    physical order is uncorrelated with the order column — the caller's
    call to make, hence opt-in."""
    return ds if sample_rows is None else ds.limit(sample_rows)


def prefix_budget_select(
    ds_factory,
    score_column: str,
    id_column: str,
    value_column: str,
    budget: float,
    num_buckets: int = 32,
    cum_alias: str = "cum_value",
    boundary_sample_rows: int | None = None,
):
    """Rows of the dataset, ordered by (``score_column`` DESC,
    ``id_column`` ASC), kept while the running total of ``value_column``
    (inclusive) stays ``<= budget``; the running total is emitted as
    ``cum_alias``.  ``value_column`` must be non-negative.
    ``ds_factory`` is a zero-arg callable returning a fresh Dataset (one
    streaming scan per pass)."""

    proto_ds = ds_factory()  # reused for schema proto AND boundary pass
    qs = [i / num_buckets for i in range(1, num_buckets)]
    qmap = approx_quantiles(
        _boundary_input(proto_ds, boundary_sample_rows), score_column, qs
    )
    bounds = np.unique(
        np.array([v for v in qmap.values() if not np.isnan(v)], dtype=np.float64)
    )

    def tag(batch: pa.Table) -> pa.Table:
        scores = batch[score_column].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column(
            "__obucket__", pa.array(_bucket_of(scores, bounds), type=pa.int64())
        )

    # offset pass: per-batch (bucket, sum) partials -> exact driver fold
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("__obucket__", sort=False)[value_column].sum()
        return pd.DataFrame({"__obucket__": g.index.to_numpy(), "s": g.to_numpy()})

    parts = (
        ds_factory()
        .map_batches(tag, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return _empty_proto(proto_ds, cum_alias)
    totals = parts.groupby("__obucket__", sort=True)["s"].sum()
    offsets = totals.cumsum().shift(fill_value=0.0)
    # prune buckets that start past the budget (values are non-negative,
    # so no row inside can come back under it)
    alive = offsets[offsets <= budget]
    offset_map = {int(b): float(o) for b, o in alive.items()}
    alive_ids = set(offset_map)

    def keep_alive(batch: pa.Table) -> pa.Table:
        b = batch["__obucket__"].to_numpy(zero_copy_only=False)
        mask = np.isin(b, np.fromiter(alive_ids, dtype=np.int64, count=len(alive_ids)))
        return batch.filter(pa.array(mask))

    def bucket_prefix(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.drop(columns=["__obucket__"]).assign(
                **{cum_alias: pd.Series([], dtype="float64")}
            )
        off = offset_map[int(df["__obucket__"].iloc[0])]
        df = df.sort_values(
            [score_column, id_column], ascending=[False, True], kind="mergesort"
        )
        cum = df[value_column].to_numpy(dtype=np.float64).cumsum() + off
        df = df.assign(**{cum_alias: cum})
        df = df[df[cum_alias] <= budget]
        return df.drop(columns=["__obucket__"])

    selected = (
        ds_factory()
        .map_batches(tag, batch_format="pyarrow")
        .map_batches(keep_alive, batch_format="pyarrow")
        .groupby("__obucket__")
        .map_groups(bucket_prefix, batch_format="pandas")
    )
    return _empty_proto(proto_ds, cum_alias).union(selected)


def grouped_percent_rank(
    ds_factory,
    group_column: str,
    value_column: str,
    out_alias: str = "pr",
    num_buckets: int = 32,
    boundary_sample_rows: int | None = None,
):
    """``percent_rank() OVER (PARTITION BY group ORDER BY value)`` for
    LOW-cardinality groups whose members are far too many to collect —
    the complement of the per-key window family (which buckets by key and
    assumes each key's rows fit one group call).

    Same two-pass range-bucket decomposition as
    :func:`prefix_budget_select`, with COUNTS instead of sums:

    1. global value-quantile boundaries (balance only, never correctness —
       ties always co-locate because bucketing is a deterministic function
       of the value);
    2. one scan -> per-(group, bucket) counts; the driver folds them into
       per-group bucket offsets and totals (#groups x #buckets — tiny by
       the low-cardinality contract);
    3. one bucket shuffle; within a bucket each group's rows rank
       against their own values (sort + searchsorted = count of strictly
       smaller), plus the group's offset for earlier buckets.

    percent_rank = rank / (n_group - 1), 0 for singleton groups (SQL
    convention).  Appends ``out_alias`` (float64), preserves all columns.
    """
    import ray

    proto_ds = ds_factory()  # reused for schema proto AND boundary pass
    qs = [i / num_buckets for i in range(1, num_buckets)]
    qmap = approx_quantiles(
        _boundary_input(proto_ds, boundary_sample_rows), value_column, qs
    )
    bounds = np.unique(
        np.array([v for v in qmap.values() if not np.isnan(v)], dtype=np.float64)
    )

    def tag(batch: pa.Table) -> pa.Table:
        v = batch[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
        # ASCENDING buckets (unlike _bucket_of): a bucket's offset must
        # count rows with SMALLER values, i.e. numerically earlier buckets
        b = np.searchsorted(bounds, v, side="left").astype(np.int64)
        return batch.append_column("__obucket__", pa.array(b, type=pa.int64()))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL PARTITION BY groups null keys together — they
        # must rank, not fall out of the count pass
        g = df.groupby([group_column, "__obucket__"], sort=False, dropna=False).size()
        out = g.reset_index()
        out.columns = [group_column, "__obucket__", "c"]
        return out

    parts = (
        ds_factory()
        .map_batches(tag, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return _empty_proto(proto_ds, out_alias)
    counts = (
        parts.groupby([group_column, "__obucket__"], sort=True, dropna=False)["c"]
        .sum()
        .reset_index()
    )
    counts["offset"] = (
        counts.groupby(group_column, sort=False, dropna=False)["c"].cumsum()
        - counts["c"]
    )
    totals = counts.groupby(group_column, sort=False, dropna=False)["c"].sum()

    def _gkey(g):
        # normalize every null flavor (None / NaN / NaT) to one dict key —
        # NaN != NaN would otherwise miss on lookup
        return None if pd.isna(g) else g

    offset_map = {
        (_gkey(g), int(b)): int(o)
        for g, b, o in zip(counts[group_column], counts["__obucket__"], counts["offset"])
    }
    total_map = {_gkey(g): int(n) for g, n in totals.items()}
    maps_ref = ray.put((offset_map, total_map))

    def bucket_rank(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.drop(columns=["__obucket__"]).assign(
                **{out_alias: pd.Series([], dtype="float64")}
            )
        offsets, tot = ray.get(maps_ref)
        b = int(df["__obucket__"].iloc[0])
        df = df.reset_index(drop=True)
        pr = np.zeros(len(df), dtype=np.float64)
        # dropna=False: null group keys rank too; positional writes come
        # from the groupby's own indices (one pass, no per-group scan)
        for g, sub in df.groupby(group_column, sort=False, dropna=False):
            v = sub[value_column].to_numpy(dtype=np.float64)
            sv = np.sort(v)
            rank = np.searchsorted(sv, v, side="left") + offsets[(_gkey(g), b)]
            n = tot[_gkey(g)]
            pr[sub.index.to_numpy()] = rank / max(n - 1, 1)
        df = df.drop(columns=["__obucket__"])
        return df.assign(**{out_alias: pr})

    ranked = (
        ds_factory()
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__obucket__")
        .map_groups(bucket_rank, batch_format="pandas")
    )
    return _empty_proto(proto_ds, out_alias).union(ranked)
