"""Temporal operators Ray Data lacks natively: as-of join, range join and
tumbling-window aggregation.

All share the engine's single-shuffle shape: bucket by key (stable hash) ->
``groupby(bucket).map_groups`` with a vectorized pandas kernel per bucket
(``merge_asof`` / interval join / resample-style groupby).  Partitioning
assumption: all rows of one join key fit one bucket task — bound bucket
count so the largest key group fits worker memory; salt hot keys upstream
if a single key's history is huge.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.stages.keyed import _BUCKET, _add_bucket


def asof_join(
    left_ds,
    right_ds,
    on: str,
    by: Sequence[str],
    num_buckets: int = 64,
    direction: str = "backward",
    suffix: str = "_right",
    right_dedup: tuple[Sequence[str], str] | None = None,
):
    """As-of join: for each left row, the latest right row with
    ``right[on] <= left[on]`` within the same ``by`` key (direction
    'backward'; 'forward' mirrors).  One shuffle; per-bucket
    ``pd.merge_asof`` over key-sorted frames.

    ``right_dedup=(subset_cols, pref_col)`` keeps only the max-``pref_col``
    right row per ``subset_cols`` — applied INSIDE the bucket, where all
    rows of a key are co-located, so it is exact without a separate keyed
    reduce (fuses the dedup shuffle into the join shuffle).
    """
    keys = list(by)
    # explicit side columns: an all-null-within-bucket column must survive
    left_cols = list(left_ds.schema().names)
    right_cols = list(right_ds.schema().names)
    # merge_asof's output columns: left's, then right's minus on/by (suffix
    # on collision).  Empty-side buckets must emit this SAME schema, or the
    # Dataset's blocks disagree (and left rows would lose their null right
    # columns entirely).
    out_cols = left_cols + [
        (c + suffix if c in left_cols else c)
        for c in right_cols
        if c != on and c not in keys
    ]

    def tag(side: str):
        def _t(batch: pa.Table) -> pa.Table:
            b = batch.append_column("__side__", pa.array([side] * len(batch)))
            return _add_bucket(b, keys, num_buckets)

        return _t

    tagged = left_ds.map_batches(tag("l"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r"), batch_format="pyarrow")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # reindex: a group made of one side's blocks lacks the other
        # side's columns entirely; reindex creates them as nulls
        l = df[df["__side__"] == "l"].reindex(columns=left_cols)
        r = df[df["__side__"] == "r"].reindex(columns=right_cols)
        l = l.sort_values(on, kind="stable")
        if l.empty or r.empty:
            return l.reindex(columns=out_cols)
        if right_dedup is not None:
            subset, pref = right_dedup
            r = r.sort_values([*subset, pref], kind="stable")
            r = r.drop_duplicates(subset=list(subset), keep="last")
        r = r.sort_values(on, kind="stable")
        out = pd.merge_asof(
            l, r, on=on, by=keys, direction=direction, suffixes=("", suffix)
        )
        return out

    return tagged.groupby(_BUCKET).map_groups(join_bucket, batch_format="pandas")


def range_join(
    left_ds,
    right_ds,
    left_point: str,
    right_start: str,
    right_end: str,
    by: Sequence[str],
    num_buckets: int = 64,
):
    """Range join: left rows matched to right intervals containing their
    point value, equi-keyed on ``by``.  Per bucket: sort + searchsorted
    interval probe (no cartesian blowup for non-overlapping intervals;
    overlapping intervals fall back to a per-key merge)."""
    keys = list(by)
    left_cols = list(left_ds.schema().names)
    right_cols = list(right_ds.schema().names)

    def tag(side: str):
        def _t(batch: pa.Table) -> pa.Table:
            b = batch.append_column("__side__", pa.array([side] * len(batch)))
            return _add_bucket(b, keys, num_buckets)

        return _t

    tagged = left_ds.map_batches(tag("l"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r"), batch_format="pyarrow")
    )

    def _cartesian(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        merged = l.merge(r, on=keys, how="inner")
        hit = (merged[left_point] >= merged[right_start]) & (
            merged[left_point] < merged[right_end]
        )
        return merged[hit]

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # reindex: a group made of one side's blocks lacks the other
        # side's columns entirely; reindex creates them as nulls
        l = df[df["__side__"] == "l"].reindex(columns=left_cols)
        r = df[df["__side__"] == "r"].reindex(columns=right_cols)
        # even when one side is empty, return the properly-columned empty
        # merge — a column-less DataFrame would give this bucket's block a
        # different schema from the others
        if l.empty or r.empty:
            return _cartesian(l, r)
        # fast path: when no key's intervals overlap, the containing
        # interval (if any) is exactly the last one starting <= point, so
        # one backward merge_asof on the start column (searchsorted under
        # the hood) finds it with no |l|x|r| intermediate
        rs = r.sort_values(keys + [right_start], kind="stable")
        same_key = (rs[keys] == rs[keys].shift()).all(axis=1)
        prev_end = (
            rs.groupby(keys, sort=False, dropna=False)[right_end].cummax().shift()
        )
        overlapping = bool((same_key & (prev_end > rs[right_start])).any())
        if (
            not overlapping
            and not l[left_point].isna().any()
            and not rs[right_start].isna().any()
        ):
            cand = pd.merge_asof(
                l.sort_values(left_point, kind="stable"),
                rs.sort_values(right_start, kind="stable"),
                left_on=left_point,
                right_on=right_start,
                by=keys,
                direction="backward",
            )
            return cand[cand[right_end] > cand[left_point]]
        # overlapping intervals: per-key cartesian merge + containment
        # filter (output size is the true match count; the intermediate is
        # bounded by the overlapping key groups in this bucket)
        return _cartesian(l, r)

    return tagged.groupby(_BUCKET).map_groups(join_bucket, batch_format="pandas")


def _interval_us(values) -> np.ndarray:
    """Normalize a timestamp/integer series to int64 microseconds."""
    arr = np.asarray(values)
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[us]").astype(np.int64)
    return arr.astype(np.int64)


def interval_join(
    left_ds,
    right_ds,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: Sequence[str],
    tile_width_us: int,
    num_buckets: int = 64,
):
    """Interval-OVERLAP join (half-open: ``l_start < r_end AND r_start <
    l_end``), equi-keyed on ``by`` — the two-interval-set sibling of
    :func:`range_join` (which matches points to intervals).

    Scale shape: the time axis is cut into tiles of ``tile_width_us``; each
    row replicates to every tile its interval touches, the shuffle runs over
    ``hash(by, tile)``, and each overlapping pair is emitted EXACTLY ONCE —
    in the tile containing ``max(l_start, r_start)`` (which both intervals
    provably touch) — so no dedup pass is needed.  Replication factor is
    ``interval_len / tile_width`` per row: pick the tile near the typical
    interval length; long-tailed intervals are the knob to watch at 100 TB.

    Timestamps (any datetime64 unit) and plain int64 columns are accepted;
    comparisons run in exact int64 microseconds.

    Semantics are the raw PREDICATE (SQL-twin parity): empty (``s == e``)
    and inverted (``e < s``) intervals can still match a partner whose
    span straddles their start — exactly what ``ls < re AND rs < le``
    evaluates to in SQL.  The tiling clamp (``e' = max(e, s)``) only
    bounds replication; a degenerate row that satisfies the predicate is
    provably co-located with its partner in the attribution tile
    (``max(ls, rs)`` lies in both rows' clamped spans).
    """
    keys = list(by)
    left_cols = list(left_ds.schema().names)
    right_cols = list(right_ds.schema().names)
    shared = set(left_cols) & set(right_cols) - set(keys)
    if shared:
        raise ValueError(f"non-key column collision: {sorted(shared)}")
    W = int(tile_width_us)

    def replicate(side: str):
        s_col, e_col = (left_start, left_end) if side == "l" else (right_start, right_end)

        def _r(df: pd.DataFrame) -> pd.DataFrame:
            # null boundaries never satisfy the SQL predicate (NULL
            # comparisons are false); NaT would otherwise alias to
            # int64-min and match spuriously
            df = df[df[s_col].notna() & df[e_col].notna()]
            s = _interval_us(df[s_col].to_numpy())
            e = _interval_us(df[e_col].to_numpy())
            e = np.maximum(e, s)  # defensive: empty/negative intervals match nothing
            first = s // W
            last = np.where(e > s, (e - 1) // W, first)
            reps = (last - first + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(df)), reps)
            out = df.iloc[idx].reset_index(drop=True)
            # tile index within each row's span: cumulative offset trick
            offsets = np.arange(len(idx)) - np.repeat(
                np.concatenate(([0], np.cumsum(reps)[:-1])), reps
            )
            out["__tile__"] = np.repeat(first, reps) + offsets
            out["__side__"] = side
            t = pa.Table.from_pandas(out, preserve_index=False)
            return _add_bucket(t, keys + ["__tile__"], num_buckets).to_pandas()

        return _r

    tagged = left_ds.map_batches(replicate("l"), batch_format="pandas").union(
        right_ds.map_batches(replicate("r"), batch_format="pandas")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side__"] == "l"].reindex(columns=left_cols + ["__tile__"])
        r = df[df["__side__"] == "r"].reindex(columns=right_cols + ["__tile__"])
        merged = l.merge(r, on=keys + ["__tile__"], how="inner")
        out_cols = left_cols + [c for c in right_cols if c not in keys]
        if merged.empty:
            return merged.reindex(columns=out_cols)
        ls = _interval_us(merged[left_start].to_numpy())
        le = _interval_us(merged[left_end].to_numpy())
        rs = _interval_us(merged[right_start].to_numpy())
        re_ = _interval_us(merged[right_end].to_numpy())
        overlap = (ls < re_) & (rs < le)
        # exactly-once attribution: emit only in max(l_start, r_start)'s tile
        owner = np.maximum(ls, rs) // W == merged["__tile__"].to_numpy(np.int64)
        return merged.loc[overlap & owner, out_cols]

    return tagged.groupby(_BUCKET).map_groups(join_bucket, batch_format="pandas")


def band_neighbor_counts(
    ds,
    by: Sequence[str],
    value_col: str,
    radius: int,
    num_buckets: int = 64,
    out_col: str = "n_neighbors",
    batch_size: int = 65536,
):
    """Symmetric band self-join collapsed to counts: for each row, how many
    OTHER rows share its ``by`` key with integer ``value_col`` within
    ``+-radius``.  Materializing the pairs would be quadratic on dense keys
    (the near-dup lesson); counts need only two ``searchsorted`` probes per
    row.  One key-bucket shuffle; per bucket a single vectorized probe over
    a composite ``(key_code, value)`` monotone encoding — the +-radius
    offsets cannot cross a key boundary because each key's value range is
    padded by ``2*radius + 2`` in the encoding, so there is no per-key
    Python loop.

    ``value_col`` must be non-null integer (convert timestamps to the unit
    the band is defined in first: days, seconds, ...).  Raises if
    ``n_keys * value_span`` cannot fit the int64 composite — rescale the
    unit, not the radius, when that trips."""
    keys = list(by)

    def tag(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, keys, num_buckets)

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if _BUCKET in df.columns:
            df = df.drop(columns=[_BUCKET])
        if len(df) == 0:
            df[out_col] = pd.Series([], dtype="int64")
            return df
        d = df.sort_values(keys + [value_col], kind="stable").reset_index(drop=True)
        codes = d.groupby(keys, sort=False, dropna=False).ngroup().to_numpy(np.int64)
        v = d[value_col].to_numpy(np.int64)
        r = np.int64(radius)
        span = np.int64(v.max() - v.min()) + 2 * r + 2
        if int(codes[-1]) * int(span) > 2**62:
            raise ValueError(
                "band_neighbor_counts: key count x value span exceeds the "
                "int64 composite range — rescale value_col to coarser units"
            )
        comp = codes * span + (v - v.min()) + r + 1
        lo = np.searchsorted(comp, comp - r, side="left")
        hi = np.searchsorted(comp, comp + r, side="right")
        d[out_col] = (hi - lo - 1).astype("int64")
        return d

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
        .groupby(_BUCKET)
        .map_groups(count_bucket, batch_format="pandas")
    )


def tumbling_window(
    ds,
    ts_column: str,
    window: str,
    by: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_buckets: int = 64,
):
    """Tumbling-window aggregate: ``aggs`` maps output column ->
    (source column, pandas agg name).  Windows are aligned to the epoch
    (``floor(ts / window)``); output carries ``window_start``.

    Two-level: per-batch partial aggregation (combiner) -> one shuffle of
    partials -> final combine per (key, window).  Partials are exact for
    sum/count/min/max; mean is decomposed into sum+count automatically.
    """
    keys = list(by)
    win = pd.Timedelta(window)

    # decompose mean into sum + count for exact two-level aggregation
    plan: dict[str, tuple[str, str]] = {}
    means: dict[str, tuple[str, str]] = {}
    for out, (src, how) in aggs.items():
        if how == "mean":
            plan[f"__{out}_sum"] = (src, "sum")
            plan[f"__{out}_cnt"] = (src, "count")
            means[out] = (f"__{out}_sum", f"__{out}_cnt")
        else:
            plan[out] = (src, how)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["window_start"] = df[ts_column].dt.floor(win)
        g = df.groupby(keys + ["window_start"], sort=False)
        out = pd.DataFrame(
            {o: g[src].agg(how) for o, (src, how) in plan.items()}
        ).reset_index()
        t = pa.Table.from_pandas(out, preserve_index=False)
        return _add_bucket(t, keys, num_buckets).to_pandas()

    _RECOMBINE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys + ["window_start"], sort=False)
        out = pd.DataFrame(
            {o: g[o].agg(_RECOMBINE[how]) for o, (_src, how) in plan.items()}
        ).reset_index()
        for out_col, (s, c) in means.items():
            out[out_col] = out[s] / out[c]
            out = out.drop(columns=[s, c])
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(_BUCKET).map_groups(
        lambda df: final(df.drop(columns=[_BUCKET])), batch_format="pandas"
    )


def sliding_window(
    ds,
    ts_column: str,
    window: str,
    slide: str,
    by: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_buckets: int = 64,
):
    """Sliding (hopping) window aggregate: every row contributes to the
    ``window/slide`` overlapping windows covering its timestamp, windows
    aligned to the epoch on the ``slide`` grid.  Expressed as a vectorized
    per-batch EXPLODE to (row x window_start) + the tumbling two-level
    partial/final combine — one shuffle of partials, never of raw rows.
    The fan-out factor is window/slide: keep it small at scale (it
    multiplies partial-row volume, not raw-data volume)."""
    win = pd.Timedelta(window)
    sl = pd.Timedelta(slide)
    if win % sl != pd.Timedelta(0):
        raise ValueError("window must be a multiple of slide")
    fanout = win // sl

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        # window starts covering ts: floor(ts/slide)*slide - k*slide,
        # k = 0..fanout-1  (vectorized repeat + tile)
        base = df[ts_column].dt.floor(sl)
        n = len(df)
        rep = df.loc[df.index.repeat(fanout)].reset_index(drop=True)
        offsets = pd.TimedeltaIndex(
            np.tile(np.arange(fanout), n) * sl
        )
        rep["__wstart__"] = (
            base.repeat(fanout).reset_index(drop=True) - offsets
        )
        return rep

    exploded = ds.map_batches(explode, batch_format="pandas")
    out = tumbling_window(
        exploded.map_batches(
            lambda df: df.rename(columns={"__wstart__": "__sw__"}),
            batch_format="pandas",
        ),
        "__sw__",
        slide,  # __sw__ is already on the slide grid; floor is identity
        by,
        aggs,
        num_buckets=num_buckets,
    )
    return out


def session_window(
    ds,
    ts_column: str,
    by: Sequence[str],
    gap: str,
    aggs: dict[str, tuple[str, str]],
    num_buckets: int = 64,
):
    """Session-window aggregate: per key, consecutive events closer than
    ``gap`` belong to one session; a longer quiet period starts a new one.

    Sessions are NOT decomposable into per-batch partials (a session can
    span any number of blocks), so the shape is: project (keys, ts, agg
    sources) -> ONE ``groupby(bucket)`` shuffle co-locating each key ->
    vectorized session assignment inside the bucket (sort + diff > gap ->
    cumsum) -> groupby aggregate.  Only the projected columns shuffle.
    Output carries ``session_start`` / ``session_end`` / per-agg columns.
    """
    keys = list(by)
    g = pd.Timedelta(gap)
    src_cols = sorted({src for (src, _how) in aggs.values()})

    def project(batch: pa.Table) -> pa.Table:
        t = batch.select([c for c in keys + [ts_column] + src_cols])
        return _add_bucket(t, keys, num_buckets)

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + [ts_column], kind="stable")
        new_key = (df[keys] != df[keys].shift()).any(axis=1)
        gap_break = df[ts_column].diff() > g
        df["__sid__"] = (new_key | gap_break).cumsum()
        grp = df.groupby("__sid__", sort=False)
        out = grp.agg(
            **{k: (k, "first") for k in keys},
            session_start=(ts_column, "min"),
            session_end=(ts_column, "max"),
            **{o: (src, how) for o, (src, how) in aggs.items()},
        ).reset_index(drop=True)
        return out

    projected = ds.map_batches(project, batch_format="pyarrow")
    return projected.groupby(_BUCKET).map_groups(
        lambda df: sessions(df.drop(columns=[_BUCKET])), batch_format="pandas"
    )


def sequence_pattern_counts(
    ds,
    by: Sequence[str],
    order: Sequence[str],
    col: str,
    pattern: Sequence[str],
    wildcard: str = "*",
    num_buckets: int = 32,
    out_col: str = "n_hits",
    max_span: int | None = None,
    span_col: str | None = None,
):
    """MATCH_RECOGNIZE-lite: count OVERLAPPING occurrences of a fixed
    symbol ``pattern`` in each key's ``order``-sorted ``col`` sequence.

    ``pattern`` is a list of symbols; ``wildcard`` entries match ANY row
    (including a null ``col``) — they only require a row to exist at that
    offset within the same key.  Overlapping counting keeps the semantics
    a pure function of the sorted sequence (non-overlapping would need a
    greedy scan no SQL twin can express); a window of length L starting at
    i matches when every non-wildcard position equals its symbol and row
    i+L-1 still belongs to row i's key.

    ``max_span`` (with ``span_col``, an integer column — convert
    timestamps to the unit the window is defined in first) additionally
    requires ``span_col[i + L - 1] - span_col[i] <= max_span``: the whole
    occurrence must fit a time window (funnel-with-conversion-window
    semantics).  The test is one more vectorized comparison.

    One key-bucket shuffle, then a single vectorized shifted-equality AND
    per bucket — no per-row loop, no pair materialization.  Partitioning
    assumption: one key's whole sequence fits its bucket task (same as
    the as-of / session kernels).  Returns ``by`` + ``out_col`` for keys
    with at least one hit.
    """
    keys = list(by)
    L = len(pattern)
    if L == 0:
        raise ValueError("pattern must be non-empty")
    if (max_span is None) != (span_col is None):
        raise ValueError("max_span and span_col come together")

    def tag(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, keys, num_buckets)

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                **{k: pd.Series(dtype=df[k].dtype) if k in df.columns
                   else pd.Series(dtype="object") for k in keys},
                out_col: pd.Series(dtype="int64"),
            }
        )
        if len(df) < L or col not in df.columns:
            return empty
        d = df.sort_values(keys + list(order), kind="mergesort").reset_index(drop=True)
        kid = d.groupby(keys, sort=False, dropna=False).ngroup().to_numpy(np.int64)
        vals = d[col].to_numpy()
        n = len(d)
        m = n - L + 1
        match = kid[:m] == kid[L - 1:]  # window stays inside one key
        for j, sym in enumerate(pattern):
            if sym != wildcard:
                match = match & (vals[j:m + j] == sym)
        if max_span is not None:
            sv = d[span_col].to_numpy(np.int64)
            match = match & ((sv[L - 1:] - sv[:m]) <= max_span)
        starts = np.flatnonzero(match)
        if len(starts) == 0:
            return empty
        hit_kid = kid[starts]
        uniq, counts = np.unique(hit_kid, return_counts=True)
        first_row = np.searchsorted(kid, uniq)  # kid is sorted ascending
        out = d.iloc[first_row][keys].reset_index(drop=True)
        out[out_col] = counts.astype("int64")
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(count_bucket, batch_format="pandas")
    )
