"""Continuous-tailing mode: a pool of shard ACTORS each owning one
partition's key→(seq, commit, sha) state in memory — the north_star's
"hash-partitioned upsert/merge stage (actor pool holding per-partition
RocksDB-style state for idempotent last-writer-wins apply)".

Versus the epoch-batch path (``pipelines/cdc.apply_epoch``), shards keep
state RESIDENT between micro-batches, so a long-running tailer doesn't
re-read prior state every epoch.  Durability is by state snapshot: each
``commit`` writes every dirty shard's state as the partition file of a new
manifest epoch — the same exactly-once layout, so a killed tailer resumes
from the last committed manifest.

Routing: map tasks split prepped batches by ``_pid`` and push sub-tables to
the owning shard; the per-batch ``ray.get`` barrier on those pushes is the
backpressure (a task can't prep batch N+1 until shard writes for batch N
landed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from cdm_data_loader_utils_ray.audit.tables import PipelineRun
from cdm_data_loader_utils_ray.core.schemas import (
    ERRORS_COLUMN,
    EVENT_SCHEMA,
    PARTITION_COLUMN,
    state_schema as make_state_schema,
)
from cdm_data_loader_utils_ray.sinks.lake import LakeTable, Manifest, PartitionEntry
from cdm_data_loader_utils_ray.stages.validate import split_valid
from cdm_data_loader_utils_ray.state.upsert import events_to_state, merge_states


@ray.remote(num_cpus=0.25)
class UpsertShard:
    """One partition's in-memory LWW state (reference T7, SURVEY §2.4).

    Incoming deltas are BUFFERED and merged into the resident state only
    when the buffer grows past a fraction of the state (or at snapshot) —
    a per-micro-batch ``merge_states`` would re-sort the shard's ENTIRE
    state every batch, O(S log S) per batch over a long-running tailer.
    LWW is order-independent, so deferring the merge is semantics-free."""

    def __init__(self, table_dir: str, pid: int, prior_chain: list[str] | None,
                 state_schema_bytes: bytes):
        self.lake = LakeTable(table_dir)
        self.pid = pid
        self.schema = pa.ipc.read_schema(pa.BufferReader(state_schema_bytes))
        self.state: pa.Table | None = None
        if prior_chain:
            chain = pa.concat_tables(
                [pq.read_table(self.lake.abspath(f)) for f in prior_chain],
                promote_options="permissive",
            )
            self.state = merge_states(None, chain, self.schema)
        self.dirty = False
        self.applied = 0
        self.pending: list[pa.Table] = []
        self.pending_rows = 0
        self.merges = 0  # full-state merges performed (observability)

    def _flush(self) -> None:
        if not self.pending:
            return
        delta = pa.concat_tables(self.pending, promote_options="permissive")
        self.state = merge_states(self.state, delta, self.schema)
        self.pending, self.pending_rows = [], 0
        self.merges += 1

    def apply(self, delta: pa.Table) -> int:
        """Idempotent LWW merge of prepped state rows into shard state
        (buffered; merged when the buffer reaches ~1/4 of resident state)."""
        self.pending.append(delta)
        self.pending_rows += len(delta)
        self.dirty = True
        self.applied += len(delta)
        state_rows = len(self.state) if self.state is not None else 0
        if self.pending_rows >= max(4096, state_rows // 4):
            self._flush()
        return len(delta)

    def snapshot(self, epoch: int) -> dict:
        """Write the shard's state as this epoch's partition file."""
        self._flush()
        state = self.state if self.state is not None else self.schema.empty_table()
        entry = self.lake.write_partition(state, self.pid, epoch)
        self.dirty = False
        return {
            "pid": entry.pid, "file": entry.file, "rows": entry.rows,
            "hwm_seq": entry.hwm_seq, "live_keys": entry.live_keys,
            "bytes": entry.bytes, "applied": self.applied, "dirty_was": True,
        }

    def stats(self) -> dict:
        self._flush()
        return {
            "pid": self.pid,
            "rows": len(self.state) if self.state is not None else 0,
            "applied": self.applied,
            "dirty": self.dirty,
            "merges": self.merges,
        }


class StreamingUpserter:
    """Driver-side controller for the shard pool."""

    def __init__(self, table_dir: str, num_partitions: int | None = None,
                 event_schema: pa.Schema = EVENT_SCHEMA):
        self.table = LakeTable(table_dir)
        prior = self.table.latest_manifest()
        if prior is not None:
            self.P = prior.num_partitions
            self.state_schema = prior.schema
            self.epoch = prior.epoch
            prior_files = {p.pid: list(p.files) for p in prior.partitions.values()}
            self.rename_history = prior.rename_history
        else:
            self.P = num_partitions or 32
            self.state_schema = make_state_schema(event_schema)
            self.epoch = 0
            prior_files = {}
            self.rename_history = {}
        self.event_schema = event_schema
        schema_bytes = self.state_schema.serialize().to_pybytes()
        # Actor-headroom invariant (CLAUDE.md / functions.dedup._pool_size):
        # the shard pool's total CPU reservation must stay well below the
        # cluster's CPU count or feed()'s map_batches tasks get no slots and
        # the pipeline deadlocks (P=32 × 0.25 = 8 CPUs starves an 8-CPU
        # cluster).  Cap the pool at half the cluster, scaling the per-shard
        # reservation down as P grows; shards are mostly-idle receivers, so
        # fractional CPUs are accurate, not a dodge.
        try:
            cluster_cpus = float(ray.cluster_resources().get("CPU", 4))
        except Exception:
            cluster_cpus = 4.0
        cpu_per_shard = min(0.25, max(0.01, (cluster_cpus / 2.0) / self.P))
        self.shards = [
            UpsertShard.options(num_cpus=cpu_per_shard).remote(
                table_dir, pid, prior_files.get(pid), schema_bytes
            )
            for pid in range(self.P)
        ]

    # -- feeding ------------------------------------------------------------
    def feed(self, events_ds, batch_size: int = 32768) -> int:
        """Stream a Dataset of raw events through prep into the shards.
        Returns number of applied (post-prereduce) event rows."""
        from cdm_data_loader_utils_ray.pipelines.cdc import EventPrep

        prep = EventPrep(self.event_schema, self.P, {})
        shards = self.shards
        state_sch = self.state_schema

        def route(batch: pa.Table) -> pa.Table:
            prepped = prep(batch)
            if len(prepped) == 0:
                return pa.table({"applied": pa.array([0], type=pa.int64())})
            # streaming mode drops rejects after counting (full quarantine
            # capture is the batch path's job; a tailer alerts on the count)
            b, rejects = split_valid(prepped)
            if len(b) == 0:
                return pa.table({"applied": pa.array([0], type=pa.int64())})
            pids = b[PARTITION_COLUMN].to_numpy(zero_copy_only=False)
            order = np.argsort(pids, kind="stable")
            b = b.take(pa.array(order))
            pids = pids[order]
            bounds = np.flatnonzero(np.diff(pids)) + 1
            starts = np.concatenate([[0], bounds])
            ends = np.concatenate([bounds, [len(pids)]])
            refs = []
            for s, e in zip(starts, ends):
                pid = int(pids[s])
                delta = events_to_state(
                    b.slice(s, e - s).drop_columns([PARTITION_COLUMN]), state_sch
                )
                refs.append(shards[pid].apply.remote(delta))
            applied = sum(ray.get(refs))  # barrier = backpressure
            return pa.table({"applied": pa.array([applied], type=pa.int64())})

        out = events_ds.map_batches(
            route, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        ).take_all()
        return int(sum(r["applied"] for r in out))

    # -- committing ---------------------------------------------------------
    def commit(self, run: PipelineRun | None = None) -> Manifest:
        """Snapshot every shard and atomically commit the next epoch."""
        run = run or PipelineRun.new("cdc_stream", "stream")
        epoch = self.epoch + 1
        entries = ray.get([s.snapshot.remote(epoch) for s in self.shards])
        partitions = {
            e["pid"]: PartitionEntry(
                pid=e["pid"], files=[e["file"]], rows=e["rows"],
                hwm_seq=e["hwm_seq"], live_keys=e["live_keys"], bytes=e["bytes"],
            )
            for e in entries
        }
        manifest = Manifest(
            epoch=epoch,
            num_partitions=self.P,
            schema=self.state_schema,
            partitions=partitions,
            parent_epoch=self.epoch if self.epoch else None,
            run_id=run.run_id,
            metrics={"mode": "streaming",
                     "applied_total": sum(e["applied"] for e in entries)},
            rename_history=self.rename_history,
        )
        self.table.commit(manifest)
        self.epoch = epoch
        return manifest

    def shard_stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
