"""Incremental view maintenance (IVM): a materialized GROUP-BY aggregate
over a lake table, kept current from the Change Data Feed instead of
recomputed by rescanning.

Reference parity: the reference refreshes its summary/metrics tables by
re-running full aggregation jobs over the base table after each load
(SURVEY §2.7/§2.10 — e.g. the validation-metrics and audit rollups).  At
100 TB a rescan per refresh is the scale-killer; here the refresh cost is
O(churn):

* the CDF window (``LakeTable._change_windows``) names exactly the
  partitions — and under granularity, the keys — whose winner changed;
* POST-images are the CDF upserts themselves;
* PRE-images come from a TIME-TRAVEL read of the *previous* refresh epoch
  restricted to the changed partitions (``read_state(pids=...)`` — only
  those partitions are opened at all), semi-joined to the changed keys
  (one bucket shuffle over churn-sized inputs);
* the new aggregate is ONE distributed fold over
  ``old_agg ∪ derive(post, +1) ∪ derive(pre, −1)`` — three churn-sized
  inputs plus the (group-cardinality-sized) old aggregate, never the table.

Exactness contract: ``derive`` must emit INTEGER value columns (the same
int64-units discipline as the exact-cents revenue entries) so the
add/subtract fold is associative — a float sum would drift between a
rescan and an incremental history.  Counts are int64.

Crash safety mirrors the lake's two-phase commit: the new aggregate is
written to a fresh ``agg-{epoch}`` directory first, then ``STATE.json``
swaps atomically (``_atomic_write``); a crash mid-refresh leaves an
unreferenced directory the next refresh overwrites.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from cdm_data_loader_utils_ray.functions.aggregates import grouped_partial_sums
from cdm_data_loader_utils_ray.sinks.lake import LakeTable, _atomic_write
from cdm_data_loader_utils_ray.stages.keyed import semi_join_keys

STATE_FILE = "STATE.json"


class MaterializedAggregate:
    """A GROUP-BY ``count + integer sums`` view over a :class:`LakeTable`,
    refreshed incrementally from the table's Change Data Feed.

    * ``key_columns`` — the lake table's primary key (e.g. ``repo, path``).
    * ``derive`` — ``pa.Table`` (state rows) -> ``pa.Table`` with exactly
      ``group_columns + value_columns`` (int64 values).  Must be a pure,
      batch-wise projection; it runs on workers, so any intra-package
      imports it needs must be at module level (worker-import contract).
    * ``count_column`` — live-key count per group, maintained as ±1 deltas.
    """

    def __init__(
        self,
        lake_dir: str,
        out_dir: str,
        key_columns: Sequence[str],
        group_columns: Sequence[str],
        value_columns: Sequence[str],
        derive: Callable[[pa.Table], pa.Table],
        count_column: str = "n_keys",
    ):
        self.lake_dir = lake_dir
        self.out_dir = out_dir
        self.key_columns = list(key_columns)
        self.group_columns = list(group_columns)
        self.value_columns = list(value_columns)
        self.derive = derive
        self.count_column = count_column
        os.makedirs(out_dir, exist_ok=True)

    # -- state ---------------------------------------------------------------
    def _state(self) -> dict | None:
        p = os.path.join(self.out_dir, STATE_FILE)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _agg_dir(self, epoch: int) -> str:
        return os.path.join(self.out_dir, f"agg-{epoch:08d}")

    def read(self) -> pa.Table:
        """The materialized aggregate as of the last refresh."""
        st = self._state()
        if st is None:
            raise ValueError("aggregate never refreshed")
        d = self._agg_dir(st["epoch"])
        files = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
        return pa.concat_tables(pq.read_table(f) for f in files)

    # -- refresh ---------------------------------------------------------------
    def _signed(self, sign: int):
        derive = self.derive
        groups, values, cnt = self.group_columns, self.value_columns, self.count_column

        def _s(batch: pa.Table) -> pa.Table:
            d = derive(batch)
            out = {g: d[g] for g in groups}
            for v in values:
                col = d[v].cast(pa.int64())
                out[v] = pc.multiply(col, pa.scalar(-1, pa.int64())) if sign < 0 else col
            out[cnt] = pa.array([sign] * len(d), pa.int64())
            return pa.table(out)

        return _s

    def refresh(self) -> dict:
        """Bring the aggregate up to the lake's latest committed epoch.
        Returns ``{"from_epoch", "to_epoch", "refreshed"}``; a no-op when
        already current."""
        import ray.data as rd

        lake = LakeTable(self.lake_dir)
        cur = lake.latest_epoch()
        if cur is None:
            raise ValueError("lake has no committed manifest")
        st = self._state()
        last = st["epoch"] if st else None
        if last == cur:
            return {"from_epoch": last, "to_epoch": cur, "refreshed": False}

        changes = lake.read_changes(from_epoch=last, to_epoch=cur)

        def post_only(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(batch["change_type"], "upsert")
            ).drop_columns(["change_type"])

        parts = [
            changes.map_batches(post_only, batch_format="pyarrow").map_batches(
                self._signed(+1), batch_format="pyarrow"
            )
        ]
        if last is not None:
            # pre-images: time-travel read of ONLY the changed partitions,
            # narrowed to the changed keys (semi-join over churn-sized sides)
            windows, _ = lake._change_windows(last, cur)
            prev_m = lake.read_manifest(last)
            pre_state = lake.read_state(manifest=prev_m, pids=sorted(windows))
            pre = semi_join_keys(pre_state, changes, self.key_columns)
            parts.append(pre.map_batches(self._signed(-1), batch_format="pyarrow"))
            old_dir = self._agg_dir(last)
            parts.append(rd.read_parquet(old_dir))

        union = parts[0]
        for p in parts[1:]:
            union = union.union(p)
        sums = {v: v for v in self.value_columns}
        sums[self.count_column] = self.count_column
        folded = grouped_partial_sums(union, self.group_columns, sums, count_alias="__c")

        cnt = self.count_column
        keep_cols = self.group_columns + self.value_columns + [cnt]

        def finish(batch: pa.Table) -> pa.Table:
            t = batch.select(keep_cols)
            # a group whose last live key left keeps a zero-count row only
            # in the fold input — drop it from the view
            return t.filter(pc.greater(t[cnt], pa.scalar(0, pa.int64())))

        new_dir = self._agg_dir(cur)
        if os.path.isdir(new_dir):
            shutil.rmtree(new_dir)  # crashed previous attempt
        result = folded.map_batches(finish, batch_format="pyarrow")
        result.write_parquet(new_dir)
        if not any(f.endswith(".parquet") for f in os.listdir(new_dir)):
            # fully-empty view: write a typed zero-row file so read() works
            proto = self._signed(+1)(
                lake.read_manifest(cur).schema.empty_table()
            )
            pq.write_table(proto, os.path.join(new_dir, "empty.parquet"))

        _atomic_write(
            os.path.join(self.out_dir, STATE_FILE),
            json.dumps({"epoch": cur, "dir": os.path.basename(new_dir)}),
        )
        # retention: keep the new and the immediately-previous snapshot
        for name in os.listdir(self.out_dir):
            if (
                name.startswith("agg-")
                and name not in (os.path.basename(new_dir),)
                and (last is None or name != os.path.basename(self._agg_dir(last)))
            ):
                shutil.rmtree(os.path.join(self.out_dir, name), ignore_errors=True)
        return {"from_epoch": last, "to_epoch": cur, "refreshed": True}
