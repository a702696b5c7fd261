"""Continuous-tailing mode: a pool of shard ACTORS each owning one
partition's key→(seq, commit, sha) state in memory — the north_star's
"hash-partitioned upsert/merge stage (actor pool holding per-partition
RocksDB-style state for idempotent last-writer-wins apply)".

Versus the epoch-batch path (``pipelines/cdc.apply_epoch``), shards keep
state RESIDENT between micro-batches, so a long-running tailer doesn't
re-read prior state every epoch.  Durability is by CHURN-PROPORTIONAL
delta snapshot (r2 verdict #3 — a full-state snapshot per commit made
every streaming epoch O(table)): each ``commit`` writes only the rows
dirtied since the last snapshot as a new file on the partition's
delta-file chain — the same manifest chain layout as the batch path, so a
killed tailer resumes from the last committed manifest and readers
LWW-merge the chain.  Untouched shards carry their chain forward with no
write at all.  When a shard's chain exceeds ``max_chain_len`` the shard
folds it by writing its (already-resident) full state as a single base
file — amortized O(table) like the batch path's ``fold_long_chains``.

Routing: map tasks split prepped batches by ``_pid`` and push sub-tables to
the owning shard; the per-batch ``ray.get`` barrier on those pushes is the
backpressure (a task can't prep batch N+1 until shard writes for batch N
landed).
"""

from __future__ import annotations

import math

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
from cdm_data_loader_utils_ray.sinks.lake import (
    LakeTable,
    Manifest,
    PartitionEntry,
    dv_delete_mask,
)
from cdm_data_loader_utils_ray.stages.schema_align import align_to_schema, rename_columns
from cdm_data_loader_utils_ray.stages.validate import split_valid
from cdm_data_loader_utils_ray.state.upsert import events_to_state, merge_states


def shard_cpu_reservation(cluster_cpus: float, num_partitions: int) -> float:
    """Per-shard CPU reservation: at most 0.25 each and at most half the
    cluster in total, quantized DOWN to Ray's 1e-4 resource granularity so
    ``P × per-shard`` can never exceed the half-cluster cap (a 0.01 floor at
    P=1024 on an 8-CPU cluster reserved 10.24 CPUs: part of the pool never
    scheduled and feed()'s ray.get barrier hung forever).  Below the
    granularity the reservation is 0 — shards are mostly-idle receivers and
    a 0-CPU actor always schedules."""
    return math.floor(
        min(0.25, (cluster_cpus / 2.0) / max(1, num_partitions)) * 10000
    ) / 10000


@ray.remote(num_cpus=0.25)
class UpsertShard:
    """One partition's in-memory LWW state (reference T7, SURVEY §2.4).

    Incoming deltas are BUFFERED and merged into the resident state only
    when the buffer grows past a fraction of the state (or at snapshot) —
    a per-micro-batch ``merge_states`` would re-sort the shard's ENTIRE
    state every batch, O(S log S) per batch over a long-running tailer.
    LWW is order-independent, so deferring the merge is semantics-free."""

    def __init__(self, table_dir: str, pid: int, prior_entry: dict | None,
                 state_schema_bytes: bytes, max_chain_len: int = 16,
                 rename_history: dict[str, str] | None = None):
        self.lake = LakeTable(table_dir)
        self.pid = pid
        self.schema = pa.ipc.read_schema(pa.BufferReader(state_schema_bytes))
        self.max_chain_len = max_chain_len
        self.state: pa.Table | None = None
        # chain metadata carried from the prior manifest entry (same
        # conventions as the batch path, pipelines/cdc.py:1045-1056)
        self.chain: list[str] = list(prior_entry["files"]) if prior_entry else []
        self.chain_rows = int(prior_entry["rows"]) if prior_entry else 0
        self.chain_bytes = int(prior_entry.get("bytes", 0)) if prior_entry else 0
        self.hwm = int(prior_entry["hwm_seq"]) if prior_entry else -1
        self.live_keys = (
            int(prior_entry["live_keys"]) if prior_entry else 0
        )  # exact only for single-file chains (else -1), as in the manifest
        self.delete_files: list[str] = (
            list(prior_entry.get("delete_files", [])) if prior_entry else []
        )
        if self.chain:
            # rename BEFORE align, per file, exactly like the batch readers
            # (lake.merge_chain_files): chain files written before a column
            # rename would otherwise silently align their old-named values
            # to null — and the next chain fold would persist that loss.
            chain = pa.concat_tables(
                [
                    align_to_schema(
                        rename_columns(
                            pq.read_table(self.lake.abspath(f)), rename_history
                        ),
                        self.schema,
                    )
                    for f in self.chain
                ],
                promote_options="permissive",
            )
            self.state = merge_states(None, chain, self.schema)
            # equality-delete vectors hit resident state once at bootstrap;
            # the chain FILES still hold the rows, so delete_files must ride
            # along in every snapshot until a fold materializes the drop
            mask = dv_delete_mask(self.lake.dir, self.delete_files, self.state)
            if mask is not None and mask.any():
                self.state = self.state.filter(pa.array(~mask))
        self.dirty = False
        self.applied = 0
        self.pending: list[pa.Table] = []
        self.pending_rows = 0
        self.merges = 0  # full-state merges performed (observability)
        self.since: list[pa.Table] = []  # deltas applied since last snapshot

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
        self.since.append(delta)
        self.pending_rows += len(delta)
        self.dirty = True
        self.applied += len(delta)
        state_rows = len(self.state) if self.state is not None else 0
        if self.pending_rows >= max(4096, state_rows // 4):
            self._flush()
        return len(delta)

    def snapshot(self, epoch: int) -> dict:
        """Durability point for this epoch: write ONLY the rows dirtied
        since the last snapshot as a new chain delta file (bytes ∝ churn,
        not table size); fold the chain from resident state when it grows
        past ``max_chain_len``; write nothing for a clean shard."""
        self._flush()
        wrote_bytes = 0
        if self.since:
            # LWW winners among the new rows only — a row that loses to
            # resident state is harmless in the file (readers LWW-merge
            # the whole chain; ties are exact re-deliveries)
            delta = merge_states(
                None,
                pa.concat_tables(self.since, promote_options="permissive"),
                self.schema,
            )
            self.since = []
            if self.chain and len(self.chain) < self.max_chain_len:
                entry = self.lake.write_partition(delta, self.pid, epoch)
                self.chain.append(entry.file)
                self.chain_rows += entry.rows
                self.chain_bytes += entry.bytes
                self.hwm = max(self.hwm, entry.hwm_seq)
                self.live_keys = -1  # unknown without a merge (chain > 1)
                wrote_bytes = entry.bytes
            else:
                # first snapshot, or chain at the fold bound: write the
                # resident full state as a single base file
                state = self.state if self.state is not None else self.schema.empty_table()
                entry = self.lake.write_partition(state, self.pid, epoch)
                self.chain = [entry.file]
                self.chain_rows = entry.rows
                self.chain_bytes = entry.bytes
                self.hwm = max(self.hwm, entry.hwm_seq)
                self.live_keys = entry.live_keys
                wrote_bytes = entry.bytes
                # fold materialized the DV drops (resident state had them
                # applied at bootstrap): the vectors are spent
                self.delete_files = []
        elif not self.chain:
            # brand-new empty shard: commit an empty base so the manifest
            # has a file for every partition
            entry = self.lake.write_partition(self.schema.empty_table(), self.pid, epoch)
            self.chain = [entry.file]
            self.chain_rows = 0
            self.chain_bytes = entry.bytes
            self.live_keys = 0
            wrote_bytes = entry.bytes
        was_dirty = self.dirty
        self.dirty = False
        return {
            "pid": self.pid, "files": list(self.chain), "rows": self.chain_rows,
            "hwm_seq": self.hwm, "live_keys": self.live_keys,
            "bytes": self.chain_bytes, "applied": self.applied,
            "dirty_was": was_dirty, "wrote_bytes": wrote_bytes,
            "delete_files": list(self.delete_files),
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
                 event_schema: pa.Schema | None = None,
                 max_chain_len: int = 16):
        from cdm_data_loader_utils_ray.pipelines.cdc import event_schema_of

        self.table = LakeTable(table_dir)
        prior = self.table.latest_manifest()
        if prior is not None:
            self.P = prior.num_partitions
            self.state_schema = prior.schema
            self.epoch = prior.epoch
            prior_entries = {p.pid: p.to_json() for p in prior.partitions.values()}
            self.rename_history = prior.rename_history
            # resume must prep events against the table's EVOLVED schema —
            # aligning to the default EVENT_SCHEMA would silently null any
            # evolved column on every updated key (row-level LWW replaces
            # the whole prior row)
            if event_schema is None:
                event_schema = event_schema_of(prior.schema)
        else:
            if event_schema is None:
                event_schema = EVENT_SCHEMA
            self.P = num_partitions or 32
            self.state_schema = make_state_schema(event_schema)
            self.epoch = 0
            prior_entries = {}
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
        cpu_per_shard = shard_cpu_reservation(cluster_cpus, self.P)
        self.shards = [
            UpsertShard.options(num_cpus=cpu_per_shard).remote(
                table_dir, pid, prior_entries.get(pid), schema_bytes,
                max_chain_len=max_chain_len,
                rename_history=self.rename_history,
            )
            for pid in range(self.P)
        ]
        self.rejected = 0  # cumulative invalid events dropped by feed()

    # -- feeding ------------------------------------------------------------
    def feed(self, events_ds, batch_size: int = 32768) -> int:
        """Stream a Dataset of raw events through prep into the shards.
        Returns number of applied (post-prereduce) event rows."""
        from cdm_data_loader_utils_ray.pipelines.cdc import EventPrep
        from cdm_data_loader_utils_ray.stages.constraints import (
            table_constraint_validators,
        )

        # persisted CHECK constraints bind on the streaming path too
        # (rejects are counted, not quarantined — streaming contract)
        prep = EventPrep(
            self.event_schema, self.P, {},
            extra_validators=tuple(table_constraint_validators(self.table)),
        )
        shards = self.shards
        state_sch = self.state_schema

        def _out(applied: int, rejected: int) -> pa.Table:
            return pa.table({
                "applied": pa.array([applied], type=pa.int64()),
                "rejected": pa.array([rejected], type=pa.int64()),
            })

        def route(batch: pa.Table) -> pa.Table:
            prepped = prep(batch)
            if len(prepped) == 0:
                return _out(0, 0)
            # streaming mode drops rejects after counting (full quarantine
            # capture is the batch path's job; a tailer alerts on the count,
            # surfaced via the cumulative ``rejected`` attribute and the
            # commit metrics' ``rejected_total``)
            b, rejects = split_valid(prepped)
            n_rej = len(rejects)
            if len(b) == 0:
                return _out(0, n_rej)
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
            return _out(applied, n_rej)

        out = events_ds.map_batches(
            route, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        ).take_all()
        self.rejected += int(sum(r["rejected"] for r in out))
        return int(sum(r["applied"] for r in out))

    # -- committing ---------------------------------------------------------
    def commit(self, run: PipelineRun | None = None) -> Manifest:
        """Snapshot every shard and atomically commit the next epoch."""
        run = run or PipelineRun.new("cdc_stream", "stream")
        epoch = self.epoch + 1
        entries = ray.get([s.snapshot.remote(epoch) for s in self.shards])
        partitions = {
            e["pid"]: PartitionEntry(
                pid=e["pid"], files=e["files"], rows=e["rows"],
                hwm_seq=e["hwm_seq"], live_keys=e["live_keys"], bytes=e["bytes"],
                delete_files=list(e.get("delete_files", [])),
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
                     "applied_total": sum(e["applied"] for e in entries),
                     "rejected_total": self.rejected,
                     "snapshot_bytes": sum(e["wrote_bytes"] for e in entries),
                     "dirty_shards": sum(1 for e in entries if e["dirty_was"])},
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
