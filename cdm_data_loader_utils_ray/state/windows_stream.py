"""Streaming tumbling-window aggregation with event-time watermarks —
the streaming-window member of the §2.11 family (the reference has no
windows; this is the engine-native extension the prompt's custom-operator
list calls for).

Shape mirrors :mod:`state.streaming`: a pool of window-shard ACTORS, each
owning the partial aggregates of the windows hashed to it, fed by
vectorized pushes from the driver's routing pass.  Event time never needs
to be globally ordered:

* every micro-batch is grouped in-batch (pandas combiner) and each
  (window, key) partial is pushed to the shard owning that window —
  per-push payload is aggregate-sized, not row-sized;
* the WATERMARK is ``max event time seen - allowed_lateness``; windows
  whose END is at or below it are closed: emitted once and dropped from
  shard memory, so resident state is O(open windows), not O(stream);
* rows arriving for an already-closed window are COUNTED (``late_dropped``)
  but not applied — at-most-once emission, the documented trade of a
  tumbling watermark design.  With ``allowed_lateness=None`` nothing
  closes until :meth:`close`, making the final emission EXACT (equal to
  the batch SQL aggregate) for any arrival order.

Aggregates per (window_start, key): count and sum of the value column —
the same shape as the batch ``window_daily`` entry, so one SQL twin
checks both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_INT_TO_NULLABLE = {
    pa.int8(): pd.Int64Dtype(),
    pa.int16(): pd.Int64Dtype(),
    pa.int32(): pd.Int64Dtype(),
    pa.int64(): pd.Int64Dtype(),
    pa.uint8(): pd.Int64Dtype(),
    pa.uint16(): pd.Int64Dtype(),
    pa.uint32(): pd.Int64Dtype(),
    # uint64 can't widen into Int64 — use the unsigned extension dtype
    # (same null-proof property; omitting it reintroduced the flip for
    # uint64 keys, review r5)
    pa.uint64(): pd.UInt64Dtype(),
}


def _stable_pandas(tbl: pa.Table) -> pd.DataFrame:
    """Arrow -> pandas with NULL-PROOF integer dtypes.

    Default ``to_pandas`` turns an int column into int64 for null-free
    batches but float64 for batches containing nulls, so the SAME key
    hashes (and therefore routes) differently across batches — fragments
    of one key land on different shards, never merge, and close() emits
    overlapping duplicate sessions (r4 advice).  Nullable ``Int64`` is
    identical either way, for both driver routing and the shard-side
    concat/groupby merges."""
    return tbl.to_pandas(types_mapper=_INT_TO_NULLABLE.get)


@ray.remote(num_cpus=0.25)
class WindowShard:
    """Partial aggregates for the windows routed to this shard, held as a
    (window_start_us, key)-indexed frame so pushes merge with ONE aligned
    add instead of a Python loop per row (r3 review residual)."""

    def __init__(self):
        self.acc: pd.DataFrame | None = None  # index (window_start_us, key)
        self.closed_below: int = -(2**63)  # window_start threshold already emitted
        self.late_dropped = 0

    def apply(self, partials: pa.Table) -> int:
        """Merge a batch's (window_start_us, key, n, s) combiner rows."""
        df = _stable_pandas(partials)
        late_mask = df["window_start_us"].to_numpy() < self.closed_below
        late = int(df.loc[late_mask, "n"].sum())
        self.late_dropped += late
        df = df[~late_mask]
        if len(df):
            # dropna=False mirrors the driver combiner: null keys are a
            # real group (NaN index entries align across adds)
            inc = df.groupby(
                ["window_start_us", "key"], sort=False, dropna=False
            )[["n", "s"]].sum()
            self.acc = inc if self.acc is None else self.acc.add(inc, fill_value=0)
        return late

    def emit_below(self, window_start_threshold: int) -> pa.Table:
        """Close (emit + drop) every window with start < threshold."""
        self.closed_below = max(self.closed_below, window_start_threshold)
        empty = pa.table(
            {
                "window_start_us": pa.array([], type=pa.int64()),
                "key": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.float64()),
            }
        )
        if self.acc is None or not len(self.acc):
            return empty
        ws = self.acc.index.get_level_values(0).to_numpy()
        mask = ws < window_start_threshold
        if not mask.any():
            return empty
        out = self.acc[mask].reset_index()
        self.acc = self.acc[~mask]
        return pa.table(
            {
                "window_start_us": pa.array(
                    out["window_start_us"].to_numpy().astype("int64"), type=pa.int64()
                ),
                # explicit type: an all-null-key emission would otherwise
                # infer type null and break close()'s concat_tables
                "key": pa.array(
                    [None if pd.isna(k) else str(k) for k in out["key"]],
                    type=pa.string(),
                ),
                "n": pa.array(out["n"].to_numpy().astype("int64"), type=pa.int64()),
                "s": pa.array(out["s"].to_numpy(dtype="float64"), type=pa.float64()),
            }
        )

    def stats(self) -> dict:
        n_open = 0 if self.acc is None else int(len(self.acc))
        return {"open_windows": n_open, "late_dropped": self.late_dropped}


class StreamingWindowAggregator:
    """Driver-side coordinator: route, watermark, emit.

    ``allowed_lateness_us=None`` disables in-stream closing (exact final
    result on :meth:`close` regardless of disorder)."""

    def __init__(
        self,
        key_column: str,
        value_column: str,
        ts_column: str = "ts",
        window_us: int = 86_400_000_000,
        allowed_lateness_us: int | None = None,
        num_shards: int = 4,
    ):
        self.key_column = key_column
        self.value_column = value_column
        self.ts_column = ts_column
        self.window_us = int(window_us)
        self.lateness = allowed_lateness_us
        self.shards = [WindowShard.remote() for _ in range(num_shards)]
        self.max_ts = -(2**63)
        self.emitted: list[pa.Table] = []
        self.null_ts_dropped = 0  # events with no event time (NaT/null ts)

    def _combine(self, df: pd.DataFrame) -> pd.DataFrame:
        ts = df[self.ts_column]
        # null/NaT timestamps have no window: NaT casts to int64-min, whose
        # window arithmetic WRAPS to a phantom far-future window no
        # watermark ever closes (permanent shard-state leak).  Drop and
        # count them — there is no event time to assign.
        na = ts.isna()
        if na.any():
            self.null_ts_dropped += int(na.sum())
            df = df[~na]
            ts = df[self.ts_column]
        if pd.api.types.is_datetime64_any_dtype(ts):
            # normalize EVERY datetime64 unit (ns/us/ms/s — pandas 2.x keeps
            # the source parquet's unit) to microseconds before the integer
            # window arithmetic; assuming "non-ns means us" mis-scales
            # timestamp[ms] sources 1000x
            ts_us = pd.Series(ts.to_numpy().astype("datetime64[us]").astype("int64"),
                              index=ts.index)
        else:
            ts_us = ts.astype("int64")
        win = (ts_us // self.window_us) * self.window_us
        # dropna=False: SQL GROUP BY keeps null keys as their own group —
        # rows with a null key must aggregate, not silently vanish.
        # n = count of NON-NULL values ('count', not 'size'), matching the
        # batch twin's count(value).
        g = (
            df.assign(window_start_us=win)
            .groupby(["window_start_us", self.key_column], sort=False, dropna=False)[
                self.value_column
            ]
            .agg(["count", "sum"])
            .reset_index()
        )
        g.columns = ["window_start_us", "key", "n", "s"]
        g["n"] = g["n"].astype("int64")
        self.max_ts = max(self.max_ts, int(ts_us.max()) if len(ts_us) else self.max_ts)
        return g

    def feed(self, events_ds, batch_size: int = 65536) -> None:
        """One pass over a micro-batch Dataset: in-batch combine, push each
        shard its windows' partials, then advance the watermark."""
        P = len(self.shards)
        for raw in events_ds.iter_batches(
            batch_format="pyarrow", batch_size=batch_size
        ):
            if not raw.num_rows:
                continue
            g = self._combine(_stable_pandas(raw))
            shard_of = (g["window_start_us"] // self.window_us) % P
            pushes = []
            for sid in shard_of.unique():
                sub = g[shard_of == sid]
                pushes.append(
                    self.shards[int(sid)].apply.remote(
                        pa.Table.from_pandas(sub, preserve_index=False)
                    )
                )
            ray.get(pushes)  # backpressure: next batch waits on these
        self.advance()

    def advance(self) -> None:
        if self.lateness is None:
            return
        watermark = self.max_ts - self.lateness
        # a window [w, w + window_us) is closed once its END <= watermark
        threshold = ((watermark - self.window_us) // self.window_us + 1) * self.window_us
        got = ray.get([s.emit_below.remote(threshold) for s in self.shards])
        self.emitted.extend(t for t in got if t.num_rows)

    def close(self) -> pa.Table:
        """Emit everything still open and return ALL emitted aggregates."""
        got = ray.get([s.emit_below.remote(2**63 - 1) for s in self.shards])
        self.emitted.extend(t for t in got if t.num_rows)
        if not self.emitted:
            return pa.table(
                {
                    "window_start_us": pa.array([], type=pa.int64()),
                    "key": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.float64()),
                }
            )
        return pa.concat_tables(self.emitted)

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


# ---------------------------------------------------------------------------
# Streaming SESSION windows — gap-based, per-key, watermark-closed
# ---------------------------------------------------------------------------
def _merge_session_fragments(df: pd.DataFrame, gap: int) -> pd.DataFrame:
    """ONE vectorized gaps-and-islands pass (sort + per-key cummax +
    cumsum) merging session fragments whose gap-padded intervals touch —
    interval union with gap tolerance is associative and commutative, so
    the merged set is independent of arrival order."""
    d = df.sort_values(["key", "start_us"], kind="mergesort").reset_index(drop=True)
    grp = d.groupby("key", sort=False, dropna=False)
    prev_end = grp["end_us"].cummax().groupby(d["key"], sort=False, dropna=False).shift()
    new_session = prev_end.isna() | (d["start_us"] > prev_end + gap)
    sid = new_session.cumsum()
    out = d.groupby(sid, sort=False).agg(
        key=("key", "first"),
        start_us=("start_us", "min"),
        end_us=("end_us", "max"),
        n=("n", "sum"),
        s=("s", "sum"),
    )
    return out.reset_index(drop=True)


@ray.remote(num_cpus=0.25)
class SessionShard:
    """Open sessions for the KEYS routed to this shard, as a frame of
    (key, start_us, end_us, n, s) intervals.  Each push concatenates the
    incoming batch fragments with the open set and re-merges via
    :func:`_merge_session_fragments`."""

    def __init__(self, gap_us: int):
        self.gap = int(gap_us)
        self.open: pd.DataFrame | None = None
        self.closed_end_below: int = -(2**63)
        self.late_dropped = 0

    def apply(self, fragments: pa.Table) -> int:
        df = _stable_pandas(fragments)
        # a fragment wholly below the close line would re-open (and
        # re-emit) territory already emitted: at-most-once means drop it.
        # Straddling fragments are kept (same trade as the tumbling shard).
        late_mask = df["end_us"].to_numpy() < self.closed_end_below
        late = int(df.loc[late_mask, "n"].sum())
        self.late_dropped += late
        df = df[~late_mask]
        if len(df):
            both = df if self.open is None else pd.concat(
                [self.open, df], ignore_index=True
            )
            self.open = _merge_session_fragments(both, self.gap)
        return late

    def emit_end_below(self, end_threshold_us: int) -> pa.Table:
        """Close (emit + drop) sessions whose end < threshold — no future
        event at or above the watermark can extend them (it would need
        ts <= end + gap, and threshold = watermark - gap)."""
        self.closed_end_below = max(self.closed_end_below, end_threshold_us)
        empty = pa.table(
            {
                "key": pa.array([], type=pa.string()),
                "session_start_us": pa.array([], type=pa.int64()),
                "session_end_us": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.float64()),
            }
        )
        if self.open is None or not len(self.open):
            return empty
        mask = self.open["end_us"].to_numpy() < end_threshold_us
        if not mask.any():
            return empty
        out = self.open[mask]
        self.open = self.open[~mask]
        return pa.table(
            {
                "key": pa.array(
                    [None if pd.isna(k) else str(k) for k in out["key"]],
                    type=pa.string(),
                ),
                "session_start_us": pa.array(
                    out["start_us"].to_numpy().astype("int64"), type=pa.int64()
                ),
                "session_end_us": pa.array(
                    out["end_us"].to_numpy().astype("int64"), type=pa.int64()
                ),
                "n": pa.array(out["n"].to_numpy().astype("int64"), type=pa.int64()),
                "s": pa.array(out["s"].to_numpy(dtype="float64"), type=pa.float64()),
            }
        )

    def stats(self) -> dict:
        n_open = 0 if self.open is None else int(len(self.open))
        return {"open_sessions": n_open, "late_dropped": self.late_dropped}


class StreamingSessionAggregator:
    """Watermarked streaming session windows (gap-based), the session
    member of the §2.11 streaming family next to
    :class:`StreamingWindowAggregator`.

    Per micro-batch the driver combiner reduces rows to per-key session
    FRAGMENTS (the batch's own gap-merged intervals carrying count + sum),
    so the per-push payload is fragment-sized.  Fragments route to shards
    by KEY hash (a session lives wholly on one shard; tumbling routes by
    window instead).  The watermark is ``max event time - lateness``; a
    session closes when ``end < watermark - gap`` — no in-order future
    event can extend it.  ``allowed_lateness_us=None`` disables in-stream
    closing, making :meth:`close` EXACT for any arrival order (interval
    union is order-independent; counts/sums are associative).

    Late fragments wholly below the close line are counted
    (``late_dropped``) and not applied — at-most-once emission, same trade
    as the tumbling design."""

    def __init__(
        self,
        key_column: str,
        value_column: str,
        ts_column: str = "ts",
        gap_us: int = 1_800_000_000,
        allowed_lateness_us: int | None = None,
        num_shards: int = 4,
    ):
        self.key_column = key_column
        self.value_column = value_column
        self.ts_column = ts_column
        self.gap = int(gap_us)
        self.lateness = allowed_lateness_us
        self.shards = [SessionShard.remote(self.gap) for _ in range(num_shards)]
        self.max_ts = -(2**63)
        self.emitted: list[pa.Table] = []
        self.null_ts_dropped = 0

    def _combine(self, df: pd.DataFrame) -> pd.DataFrame:
        ts = df[self.ts_column]
        na = ts.isna()
        if na.any():
            self.null_ts_dropped += int(na.sum())
            df = df[~na]
            ts = df[self.ts_column]
        if not len(df):
            return pd.DataFrame(
                {"key": [], "start_us": [], "end_us": [], "n": [], "s": []}
            )
        if pd.api.types.is_datetime64_any_dtype(ts):
            ts_us = pd.Series(
                ts.to_numpy().astype("datetime64[us]").astype("int64"), index=ts.index
            )
        else:
            ts_us = ts.astype("int64")
        d = pd.DataFrame(
            {
                "key": df[self.key_column],
                "start_us": ts_us,
                "end_us": ts_us,
                "n": df[self.value_column].notna().astype("int64"),
                "s": df[self.value_column].fillna(0.0).astype("float64"),
            }
        )
        self.max_ts = max(self.max_ts, int(ts_us.max()))
        return _merge_session_fragments(d, self.gap)

    def feed(self, events_ds, batch_size: int = 65536) -> None:
        P = len(self.shards)
        for raw in events_ds.iter_batches(
            batch_format="pyarrow", batch_size=batch_size
        ):
            if not raw.num_rows:
                continue
            g = self._combine(_stable_pandas(raw))
            if not len(g):
                continue
            shard_of = (
                pd.util.hash_pandas_object(g["key"], index=False).to_numpy() % P
            )
            pushes = []
            for sid in np.unique(shard_of):
                sub = g[shard_of == sid]
                pushes.append(
                    self.shards[int(sid)].apply.remote(
                        pa.Table.from_pandas(sub, preserve_index=False)
                    )
                )
            ray.get(pushes)  # backpressure
        self.advance()

    def advance(self) -> None:
        if self.lateness is None:
            return
        watermark = self.max_ts - self.lateness
        got = ray.get(
            [s.emit_end_below.remote(watermark - self.gap) for s in self.shards]
        )
        self.emitted.extend(t for t in got if t.num_rows)

    def close(self) -> pa.Table:
        got = ray.get([s.emit_end_below.remote(2**63 - 1) for s in self.shards])
        self.emitted.extend(t for t in got if t.num_rows)
        if not self.emitted:
            return pa.table(
                {
                    "key": pa.array([], type=pa.string()),
                    "session_start_us": pa.array([], type=pa.int64()),
                    "session_end_us": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.float64()),
                }
            )
        return pa.concat_tables(self.emitted)

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
