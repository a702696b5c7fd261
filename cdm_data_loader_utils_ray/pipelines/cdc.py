"""The flagship CDC replay pipeline (BASELINE.json north_star).

    read_parquet(event log)
      → map_batches (pyarrow, zero-copy): schema-align (drift) + validate +
        sha256(content) + stable hash-partition + hwm skip + within-batch
        LWW pre-reduce (combiner)
      → groupby(_pid).map_groups: per-partition merge with prior state,
        reject capture, phase-1 partition-file write
      → driver: atomic manifest commit + audit (run/checkpoint/metrics)

One all-to-all exchange total (the ``groupby``), fed by pre-reduced batches.
Everything else streams.  Killed runs resume from the last committed
manifest: per-partition hwm skips applied events fast, and the LWW merge is
idempotent so even re-applied events cannot corrupt state.
"""

from __future__ import annotations

import inspect
import json
import os
import time
from collections.abc import Mapping

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from cdm_data_loader_utils_ray.audit.tables import AuditLog, PipelineRun
from cdm_data_loader_utils_ray.core.schemas import (
    DELETED_COLUMN,
    ERRORS_COLUMN,
    EVENT_SCHEMA,
    KEY_COLUMNS,
    PARTITION_COLUMN,
    SHA_COLUMN,
    state_schema as make_state_schema,
)
from cdm_data_loader_utils_ray.sinks.lake import (
    LakeTable,
    Manifest,
    PartitionEntry,
    merge_chain_files,
)
from cdm_data_loader_utils_ray.stages.constraints import table_constraint_validators
from cdm_data_loader_utils_ray.stages.hashing import add_content_sha256, sha256_array
from cdm_data_loader_utils_ray.stages.partition import add_partition_column
from cdm_data_loader_utils_ray.stages.schema_align import (
    SchemaAligner,
    align_to_schema,
    evolve_schema,
)
from cdm_data_loader_utils_ray.stages.validate import (
    EventValidator,
    error_mask,
    has_any_errors,
)
from cdm_data_loader_utils_ray.state.upsert import (
    events_to_state,
    merge_states,
    prereduce_batch,
)

DEFAULT_PARTITIONS = 32

_MERGE_RESULT_SCHEMA = pa.schema(
    [
        pa.field("pid", pa.int32()),
        pa.field("file", pa.string()),
        pa.field("rows", pa.int64()),
        pa.field("hwm_seq", pa.int64()),
        pa.field("live_keys", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("n_events", pa.int64()),
        pa.field("n_rejects", pa.int64()),
        pa.field("distinct_errors", pa.string()),
    ]
)


def event_schema_of(state_sch: pa.Schema) -> pa.Schema:
    """Recover the event schema from a state schema (drop engine columns,
    re-insert ``op`` after ``seq``)."""
    fields = []
    for f in state_sch:
        if f.name in (SHA_COLUMN, DELETED_COLUMN):
            continue
        fields.append(f)
        if f.name == "seq":
            fields.append(pa.field("op", pa.string(), nullable=False))
    return pa.schema(fields)


def _staging_group_size(num_partitions: int) -> int:
    """Partitions per staging GROUP.  A map task writing one slice file per
    touched pid is a small-file storm at cluster partition counts (P=64k x
    thousands of tasks); grouping G consecutive pids into one staging dir
    caps file count at tasks x P/G while one reduce task handles the whole
    group (slices keep the ``_pid`` column, the reducer splits in memory).
    G adapts so reduce parallelism still covers the cluster (~4 group
    tasks per CPU).  ``CDM_RAY_STAGING_GROUP_SIZE`` pins it — the scaling
    benchmark sets it so the job is IDENTICAL at every CPU level."""
    pinned = os.environ.get("CDM_RAY_STAGING_GROUP_SIZE")
    if pinned:
        return max(1, int(pinned))
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(1, num_partitions // max(1, 4 * cpus))


class PrepAndRoute:
    """Fused map-side stage of the explicit two-stage shuffle: prep the
    batch (validate/sha/partition/pre-reduce via :class:`EventPrep`), then
    WRITE each partition-GROUP's slice straight to the epoch staging
    directory (``_staging/epoch-E/pg=G/``) instead of feeding an
    all-to-all sort.

    This is a file-based hash shuffle (Spark-shuffle-file shaped): on a
    cluster the staging dir lives on shared storage and each reduce task
    reads only its group's slices.  Deterministic slice file names
    (seq range + row count) make task retries overwrite, not duplicate.
    Returns one tiny count row per (batch, pid) for lineage.
    """

    def __init__(self, prep: "EventPrep", staging_dir: str, drop: tuple[str, ...] = (),
                 group_size: int = 1):
        self.prep = prep
        self.staging_dir = staging_dir
        self.drop = drop
        self.group_size = max(1, group_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = self.prep(batch)
        if self.drop:
            b = b.drop_columns([c for c in self.drop if c in b.column_names])
        n = len(b)
        out_pids: list[int] = []
        out_rows: list[int] = []
        if n:
            idx = pc.sort_indices(b[PARTITION_COLUMN])
            b = b.take(idx)
            pids = b[PARTITION_COLUMN].to_numpy(zero_copy_only=False)
            # per-pid lineage counts (cheap, from the sorted array)
            pbounds = np.flatnonzero(np.diff(pids)) + 1
            for s, e in zip(np.concatenate([[0], pbounds]),
                            np.concatenate([pbounds, [n]])):
                out_pids.append(int(pids[s]))
                out_rows.append(int(e - s))
            gids = pids // self.group_size
            bounds = np.flatnonzero(np.diff(gids)) + 1
            starts = np.concatenate([[0], bounds])
            ends = np.concatenate([bounds, [n]])
            seqs = b["seq"].to_numpy(zero_copy_only=False)
            for s, e in zip(starts, ends):
                gid = int(gids[s])
                part = b.slice(s, e - s)
                d = os.path.join(self.staging_dir, f"pg={gid:05d}")
                os.makedirs(d, exist_ok=True)
                lo, hi = int(seqs[s:e].min()), int(seqs[s:e].max())
                fname = f"slice-{lo:012d}-{hi:012d}-{e - s}.parquet"
                pq.write_table(part, os.path.join(d, fname), compression="lz4")
        return pa.table(
            {
                "pid": pa.array(out_pids, type=pa.int32()),
                "rows": pa.array(out_rows, type=pa.int64()),
            }
        )


class EventPrep:
    """Stateless fused prep stage (one ``map_batches`` pass, Arrow in/out):
    rename+align -> validate -> sha256 -> partition -> hwm skip ->
    pre-reduce valid rows (rejects always survive to be recorded)."""

    def __init__(
        self,
        event_sch: pa.Schema,
        num_partitions: int,
        hwm: Mapping[int, int],
        rename_map: Mapping[str, str] | None = None,
        compute_sha: bool = True,
        extra_validators=(),
    ):
        self.aligner = SchemaAligner(event_sch, rename_map)
        self.validator = EventValidator(event_sch, extra=extra_validators)
        self.num_partitions = num_partitions
        self.hwm = dict(hwm)
        # late mode defers sha256 to the assemble stage: only WINNING rows
        # get hashed (~#keys instead of #events — 10-20x less crypto +
        # no per-event hex-string allocations)
        self.compute_sha = compute_sha

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = self.aligner(batch)
        b = self.validator(b)
        if self.compute_sha:
            b = add_content_sha256(b)
        b = add_partition_column(b, self.num_partitions)
        if self.hwm:
            pid = b[PARTITION_COLUMN].to_pandas()
            hwm_of = pid.map(self.hwm).fillna(-1).to_numpy(dtype=np.int64)
            seq = b["seq"].to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(seq > hwm_of))
        if not has_any_errors(b):
            return prereduce_batch(b)
        mask = error_mask(b)
        rejects = b.filter(mask)
        valid = prereduce_batch(b.filter(pc.invert(mask)))
        if len(rejects) == 0:
            return valid
        return pa.concat_tables([valid, rejects])


def _merge_partition_core(
    lake: LakeTable,
    pid: int,
    group: pa.Table,
    prior_files: dict[int, str],
    state_sch: pa.Schema,
    epoch: int,
    run: PipelineRun,
    commit_ts_us: int,
) -> dict:
    """Reduce one partition's prepped events (errors column still attached)
    to this epoch's per-key winners and write them as the partition's DELTA
    file; rejects quarantined alongside (deterministic paths ⇒ safe under
    task retries).  No prior-state read: recency is resolved at read /
    compaction time by the LWW chain merge — epoch cost ∝ churn."""
    if has_any_errors(group):
        mask = error_mask(group)
        rejects = group.filter(mask)
        events = group.filter(pc.invert(mask)).drop_columns([ERRORS_COLUMN])
    else:
        rejects = group.slice(0, 0)
        events = group.drop_columns([ERRORS_COLUMN])
    # capture rejects (reference audit/rejects.py) — deterministic path,
    # single kernel shared with the late-shuffle mode
    distinct_errors: list[str] = []
    if len(rejects):
        distinct_errors = _write_rejects_file(
            lake, pid, rejects, epoch, run, commit_ts_us
        )
    # this epoch's winners only (cross-batch LWW reduce of the group)
    delta = merge_states(None, events_to_state(events, state_sch), state_sch)
    entry = lake.write_partition(delta, pid, epoch)
    return {
        "pid": entry.pid,
        "file": entry.file,
        "rows": entry.rows,
        "hwm_seq": entry.hwm_seq,
        "live_keys": entry.live_keys,
        "bytes": entry.bytes,
        "n_events": len(events),
        "n_rejects": len(rejects),
        "distinct_errors": json.dumps(distinct_errors),
    }


def _make_merge_fn(
    table_dir: str,
    prior_files: dict[int, str],
    state_sch: pa.Schema,
    epoch: int,
    run: PipelineRun,
    commit_ts_us: int,
):
    """groupby-shuffle reduce fn: one call per ``_pid`` group."""

    def merge_group(group: pa.Table) -> pa.Table:
        lake = LakeTable(table_dir)
        pid = int(group[PARTITION_COLUMN][0].as_py())
        row = _merge_partition_core(
            lake,
            pid,
            group.drop_columns([PARTITION_COLUMN]),
            prior_files,
            state_sch,
            epoch,
            run,
            commit_ts_us,
        )
        return pa.Table.from_pylist([row], schema=_MERGE_RESULT_SCHEMA)

    return merge_group


def _read_staging_group(staging_dir: str, gid: int) -> pa.Table:
    d = os.path.join(staging_dir, f"pg={gid:05d}")
    return pa.concat_tables(
        [pq.read_table(os.path.join(d, f)) for f in sorted(os.listdir(d))],
        promote_options="permissive",
    )


def _split_by_pid(group: pa.Table):
    """Yield (pid, sub_table_without_pid_column) for a staged group table."""
    pids = group[PARTITION_COLUMN].to_numpy(zero_copy_only=False)
    order = np.argsort(pids, kind="stable")
    g = group.take(pa.array(order))
    pids = pids[order]
    bounds = np.flatnonzero(np.diff(pids)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(pids)]])
    for s, e in zip(starts, ends):
        yield int(pids[s]), g.slice(s, e - s).drop_columns([PARTITION_COLUMN])


def _make_staging_merge_fn(
    table_dir: str,
    staging_dir: str,
    prior_files: dict[int, str],
    state_sch: pa.Schema,
    epoch: int,
    run: PipelineRun,
    commit_ts_us: int,
):
    """file-shuffle reduce fn over ``from_items(gids)``: each call reads one
    staging GROUP's slices, splits by ``_pid`` in memory and merges each
    partition."""

    def merge_gid(batch: dict) -> pa.Table:
        rows = []
        for gid in batch["item"]:
            lake = LakeTable(table_dir)
            group = _read_staging_group(staging_dir, int(gid))
            for pid, sub in _split_by_pid(group):
                rows.append(
                    _merge_partition_core(
                        lake, pid, sub, prior_files, state_sch, epoch, run,
                        commit_ts_us,
                    )
                )
        return pa.Table.from_pylist(rows, schema=_MERGE_RESULT_SCHEMA)

    return merge_gid


# ---------------------------------------------------------------------------
# Late materialization ("late" shuffle mode): the shuffle carries METADATA
# only (key, seq, op, commit, sha — ~50 B/row); winners are decided per
# partition on metadata, then a second column-pruned scan fetches ``content``
# for WINNING rows only.  On an update-heavy stream this cuts exchanged
# bytes ~10x — at 100 TB the difference between shuffling the corpus and
# shuffling a manifest of it.  Requires globally-unique ``seq`` (the event
# log's contract) and a re-readable source (a Parquet path, not an
# arbitrary Dataset).
# ---------------------------------------------------------------------------

_SRC_COLUMN = "_src"  # 1 = this epoch's events, 0 = carried from prior state

_WINNER_RESULT_SCHEMA = pa.schema(
    [
        pa.field("pid", pa.int32()),
        pa.field("n_events", pa.int64()),
        pa.field("n_rejects", pa.int64()),
        pa.field("distinct_errors", pa.string()),
    ]
)


def _meta_schema(state_sch: pa.Schema) -> pa.Schema:
    # no content (late-fetched) and no sha (computed on winners at assemble)
    return pa.schema([f for f in state_sch if f.name not in ("content", SHA_COLUMN)])


def _write_rejects_file(
    lake: LakeTable, pid: int, rejects: pa.Table, epoch: int, run: PipelineRun,
    commit_ts_us: int,
) -> list[str]:
    distinct_errors = sorted(
        {e for lst in rejects[ERRORS_COLUMN].to_pylist() for e in (lst or [])}
    )
    rej_dir = os.path.join(lake.audit_dir, "rejects")
    os.makedirs(rej_dir, exist_ok=True)
    errs = rejects[ERRORS_COLUMN]
    plain = rejects.drop_columns([ERRORS_COLUMN])
    raw = [json.dumps(r, default=str, sort_keys=True) for r in plain.to_pylist()]
    ts = pa.array([commit_ts_us] * len(rejects), type=pa.timestamp("us"))
    rej_table = pa.table(
        {
            "run_id": pa.array([run.run_id] * len(rejects)),
            "pipeline": pa.array([run.pipeline] * len(rejects)),
            "source_path": pa.array([run.source_path] * len(rejects)),
            "raw_record": pa.array(raw),
            "parsed_record": pa.array(raw),
            ERRORS_COLUMN: errs,
            "timestamp": ts,
        }
    )
    pq.write_table(
        rej_table, os.path.join(rej_dir, f"rejects-{pid:05d}-epoch-{epoch:08d}.parquet")
    )
    return distinct_errors


def _make_winner_fn(
    table_dir: str,
    staging_dir: str,
    prior_files: dict[int, str],
    state_sch: pa.Schema,
    epoch: int,
    run: PipelineRun,
    commit_ts_us: int,
):
    """Phase-A reduce: LWW over THIS EPOCH'S metadata, emit winners file +
    content-fetch seq list per partition (reduce granularity = staging
    GROUP; split by ``_pid`` in memory).  Prior state never read: the
    epoch's winners become a delta file; recency across epochs resolves at
    read/compaction time."""
    meta_sch = _meta_schema(state_sch)

    def winners_gid(batch: dict) -> pa.Table:
        rows = []
        for gid in batch["item"]:
            lake = LakeTable(table_dir)
            whole = _read_staging_group(staging_dir, int(gid))
            fm_seqs: list[np.ndarray] = []
            fm_pids: list[np.ndarray] = []
            for pid, group in _split_by_pid(whole):
                if has_any_errors(group):
                    mask = error_mask(group)
                    rejects = group.filter(mask)
                    events = group.filter(pc.invert(mask)).drop_columns([ERRORS_COLUMN])
                    distinct_errors = _write_rejects_file(
                        lake, pid, rejects, epoch, run, commit_ts_us
                    )
                else:
                    rejects = group.slice(0, 0)
                    events = group.drop_columns([ERRORS_COLUMN])
                    distinct_errors = []
                merged = merge_states(None, events_to_state(events, meta_sch), meta_sch)
                need = pc.equal(merged[DELETED_COLUMN], False)
                fseq = merged.filter(need)["seq"].to_numpy(zero_copy_only=False)
                fm_seqs.append(fseq.astype(np.int64, copy=False))
                fm_pids.append(np.full(len(fseq), pid, dtype=np.int32))
                wdir = os.path.join(staging_dir, "winners")
                os.makedirs(wdir, exist_ok=True)
                pq.write_table(merged, os.path.join(wdir, f"pid={pid:05d}.parquet"))
                rows.append(
                    {
                        "pid": pid,
                        "n_events": len(events),
                        "n_rejects": len(rejects),
                        "distinct_errors": json.dumps(distinct_errors),
                    }
                )
            # compact columnar (seq, pid) fetch map per group — the driver
            # reads these files instead of marshalling per-pid Python lists
            # through take_all (at 10^9 winners that was the bottleneck)
            fmdir = os.path.join(staging_dir, "fetchmap")
            os.makedirs(fmdir, exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "seq": pa.array(
                            np.concatenate(fm_seqs) if fm_seqs else np.array([], np.int64)
                        ),
                        "pid": pa.array(
                            np.concatenate(fm_pids) if fm_pids else np.array([], np.int32)
                        ),
                    }
                ),
                os.path.join(fmdir, f"pg={int(gid):05d}.parquet"),
                compression="lz4",
            )
        return pa.Table.from_pylist(rows, schema=_WINNER_RESULT_SCHEMA)

    return winners_gid


def _fetchmap_metadata(fmdir: str) -> tuple[list[str], int, int | None, int | None]:
    """Parquet-METADATA-only scan of the phase-A fetchmap files: paths,
    total winner count and global seq min/max.  O(#files) driver memory —
    the driver never touches winner row data."""
    files = sorted(os.listdir(fmdir)) if os.path.isdir(fmdir) else []
    paths = [os.path.join(fmdir, f) for f in files if f.endswith(".parquet")]
    total, gmin, gmax = 0, None, None
    for p in paths:
        md = pq.read_metadata(p)
        total += md.num_rows
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                col = rgm.column(ci)
                if col.path_in_schema != "seq":
                    continue
                st = col.statistics
                if st is not None and st.has_min_max:
                    gmin = st.min if gmin is None else min(gmin, st.min)
                    gmax = st.max if gmax is None else max(gmax, st.max)
    return paths, total, gmin, gmax


def _reshard_fetchmap_task(paths: list, edges_bytes: bytes, out_dir: str, tid: int) -> int:
    """Round-1 reshard (runs on a WORKER): bucket one file-group's
    (seq, pid) rows by uniform seq range and write one piece file per
    touched bucket.  Deterministic names ⇒ retry-safe."""
    edges = np.frombuffer(edges_bytes, dtype=np.int64)
    t = pa.concat_tables([pq.read_table(p) for p in paths])
    seqs = t["seq"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    pids = t["pid"].to_numpy(zero_copy_only=False)
    if len(seqs) == 0:
        return 0
    b = np.clip(np.searchsorted(edges, seqs, side="right") - 1, 0, len(edges) - 2)
    order = np.argsort(b, kind="stable")
    bs, ss, ps = b[order], seqs[order], pids[order]
    cut = np.flatnonzero(np.diff(bs)) + 1
    for s, e in zip(np.concatenate([[0], cut]), np.concatenate([cut, [len(bs)]])):
        d = os.path.join(out_dir, f"bkt={int(bs[s]):05d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({"seq": pa.array(ss[s:e]), "pid": pa.array(ps[s:e])}),
            os.path.join(d, f"piece-{tid:05d}.parquet"),
            compression="lz4",
        )
    return len(seqs)


def _sort_bucket_task(bucket_dir: str, out_dir: str, chunk_rows: int) -> list:
    """Round-2 (runs on a WORKER): concat+sort one bucket's pieces by seq
    and emit seq-ordered chunk files of <= chunk_rows rows.  Returns tiny
    (first_seq, last_seq, rows, filename) tuples only."""
    files = sorted(f for f in os.listdir(bucket_dir) if f.endswith(".parquet"))
    t = pa.concat_tables([pq.read_table(os.path.join(bucket_dir, f)) for f in files])
    seqs = t["seq"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    pids = t["pid"].to_numpy(zero_copy_only=False)
    order = np.argsort(seqs, kind="stable")
    seqs, pids = seqs[order], pids[order]
    out = []
    for a in range(0, len(seqs), chunk_rows):
        e = min(len(seqs), a + chunk_rows)
        fname = f"chunk-{int(seqs[a]):012d}-{int(seqs[e - 1]):012d}-{e - a}.parquet"
        pq.write_table(
            pa.table({"seq": pa.array(seqs[a:e]), "pid": pa.array(pids[a:e])}),
            os.path.join(out_dir, fname),
            compression="lz4",
        )
        out.append((int(seqs[a]), int(seqs[e - 1]), int(e - a), fname))
    return out


def _build_winner_shards(
    staging_dir: str, chunk_rows: int = 1 << 22
) -> tuple[list[str], np.ndarray]:
    """Build the seq-range-sharded winner seq->pid map ON WORKERS, directly
    from the phase-A ``fetchmap/`` files (VERDICT r2 #1): the driver reads
    only Parquet metadata and tiny (bounds, filename) tuples — never the
    O(#winners) arrays (~12 GB at 10^9 winners in the r2 design).

    Two task rounds: (1) reshard each file-group into uniform seq-range
    bucket pieces (4x oversampled buckets to tolerate winner-seq skew),
    (2) sort each bucket and emit <=chunk_rows seq-ordered chunk FILES under
    ``fetchshard/``.  Phase-B route tasks read only the chunks overlapping
    their batch's seq range, through a per-worker LRU (files live on shared
    storage on a cluster; locally the page cache serves repeats).

    Returns (chunk_paths, bounds) where chunk i covers seqs in
    [bounds[i], bounds[i+1])."""
    import ray

    fmdir = os.path.join(staging_dir, "fetchmap")
    paths, total, gmin, gmax = _fetchmap_metadata(fmdir)
    if total == 0:
        return [], np.zeros(1, dtype=np.int64)
    if gmin is None:  # stats missing (shouldn't happen: we write them)
        gmin, gmax = 0, np.iinfo(np.int64).max // 2
    n_buckets = int(min(4096, max(1, -(-total // chunk_rows) * 4)))
    edges = np.linspace(gmin, gmax + 1, n_buckets + 1).astype(np.int64)
    edges[0], edges[-1] = gmin, gmax + 1
    piece_dir = os.path.join(staging_dir, "fetchshard_pieces")
    shard_dir = os.path.join(staging_dir, "fetchshard")
    os.makedirs(piece_dir, exist_ok=True)
    os.makedirs(shard_dir, exist_ok=True)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n_tasks = min(len(paths), max(1, 2 * cpus))
    groups = [paths[i::n_tasks] for i in range(n_tasks)]
    reshard = ray.remote(_reshard_fetchmap_task)
    ray.get([
        reshard.remote(g, edges.tobytes(), piece_dir, i)
        for i, g in enumerate(groups)
    ])
    buckets = sorted(d for d in os.listdir(piece_dir) if d.startswith("bkt="))
    sortb = ray.remote(_sort_bucket_task)
    results = ray.get([
        sortb.remote(os.path.join(piece_dir, d), shard_dir, chunk_rows)
        for d in buckets
    ])
    chunk_paths, bounds, last = [], [], None
    for lst in results:
        for first, lastseq, _n, fname in lst:
            chunk_paths.append(os.path.join(shard_dir, fname))
            bounds.append(first)
            last = lastseq
    bounds.append((last if last is not None else 0) + 1)
    return chunk_paths, np.asarray(bounds, dtype=np.int64)


# per-WORKER-process cache of winner-shard chunks (path -> (seqs, pids)):
# consecutive batches of a phase-B route task hit the same 1-2 chunks
_SHARD_CACHE: dict = {}
_SHARD_CACHE_CAP = 4


def _load_shard(path: str) -> tuple[np.ndarray, np.ndarray]:
    hit = _SHARD_CACHE.pop(path, None)
    if hit is None:
        t = pq.read_table(path)
        hit = (
            t["seq"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False),
            t["pid"].to_numpy(zero_copy_only=False),
        )
    _SHARD_CACHE[path] = hit  # re-insert = move to MRU end (dicts are ordered)
    while len(_SHARD_CACHE) > _SHARD_CACHE_CAP:
        _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))
    return hit


def _make_content_route_fn(
    staging_dir: str, chunk_paths: list, chunk_bounds: np.ndarray, seq_col: str,
    content_col: str, group_size: int = 1,
):
    """Phase-B map: column-pruned scan routes (seq, content, pid) of WINNING
    rows to their partition-GROUP's content staging dir.  The winner
    seq->pid map is seq-range-sharded into FILES (``_build_winner_shards``);
    a task loads only the chunks overlapping its batch's seq range, via a
    per-worker LRU."""

    def route(batch: pa.Table) -> pa.Table:
        s = batch[seq_col].to_numpy(zero_copy_only=False)
        hit = np.zeros(len(s), dtype=bool)
        sub_pids_all = np.empty(len(s), dtype=np.int32)
        if len(s):
            c0 = max(0, int(np.searchsorted(chunk_bounds, s.min(), "right")) - 1)
            c1 = min(len(chunk_paths) - 1,
                     max(0, int(np.searchsorted(chunk_bounds, s.max(), "right")) - 1))
            for ci in range(c0, c1 + 1):
                seqs, pids = _load_shard(chunk_paths[ci])
                if len(seqs) == 0:
                    continue
                pos = np.searchsorted(seqs, s)
                pos_c = np.clip(pos, 0, len(seqs) - 1)
                h = seqs[pos_c] == s
                if np.any(h):
                    sub_pids_all[h] = pids[pos_c[h]]
                    hit |= h
        if not np.any(hit):
            return pa.table({"pid": pa.array([], type=pa.int32()),
                             "rows": pa.array([], type=pa.int64())})
        sub = batch.filter(pa.array(hit)).select([seq_col, content_col])
        sub_pids = sub_pids_all[hit]
        order = np.argsort(sub_pids, kind="stable")
        sub = sub.take(pa.array(order))
        sub_pids = sub_pids[order]
        gids = sub_pids // np.int32(group_size)
        bounds = np.flatnonzero(np.diff(gids)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(sub_pids)]])
        ss = sub[seq_col].to_numpy(zero_copy_only=False)
        out_pids, out_rows = [], []
        for a, b in zip(starts, ends):
            gid = int(gids[a])
            d = os.path.join(staging_dir, "content", f"pg={gid:05d}")
            os.makedirs(d, exist_ok=True)
            lo, hi = int(ss[a:b].min()), int(ss[a:b].max())
            part = sub.slice(a, b - a).rename_columns(["seq", "content"])
            part = part.append_column(
                "pid", pa.array(sub_pids[a:b], type=pa.int32())
            )
            pq.write_table(
                part,
                os.path.join(d, f"slice-{lo:012d}-{hi:012d}-{b - a}.parquet"),
                compression="lz4",
            )
            out_pids.append(gid)
            out_rows.append(b - a)
        return pa.table(
            {"pid": pa.array(out_pids, type=pa.int32()),
             "rows": pa.array(out_rows, type=pa.int64())}
        )

    return route


def _make_assemble_fn(
    table_dir: str,
    staging_dir: str,
    prior_files: dict[int, str],
    state_sch: pa.Schema,
    epoch: int,
    gid_pids: dict[int, list[int]],
):
    """Phase-B reduce over staging GROUPS: join each partition's winner
    metadata with the group's fetched content and write the partition's
    DELTA file (no prior state involved)."""

    def assemble(batch: dict) -> pa.Table:
        rows = []
        for gid in batch["item"]:
            gid = int(gid)
            lake = LakeTable(table_dir)
            # the group's fetched content, split once by pid
            cdir = os.path.join(staging_dir, "content", f"pg={gid:05d}")
            content_by_pid: dict[int, pa.Table] = {}
            if os.path.isdir(cdir):
                fetched_all = pa.concat_tables(
                    [pq.read_table(os.path.join(cdir, f)) for f in sorted(os.listdir(cdir))]
                )
                cp = fetched_all["pid"].to_numpy(zero_copy_only=False)
                order = np.argsort(cp, kind="stable")
                fetched_all = fetched_all.take(pa.array(order))
                cp = cp[order]
                cb = np.flatnonzero(np.diff(cp)) + 1
                for s, e in zip(np.concatenate([[0], cb]),
                                np.concatenate([cb, [len(cp)]])):
                    content_by_pid[int(cp[s])] = fetched_all.slice(s, e - s)
            for pid in gid_pids.get(gid, []):
                rows.append(
                    _assemble_one(lake, staging_dir, state_sch, epoch, pid,
                                  content_by_pid.get(pid))
                )
        return pa.Table.from_pylist(rows, schema=_MERGE_RESULT_SCHEMA)

    return assemble


def _assemble_one(lake, staging_dir, state_sch, epoch, pid, fetched):
    """Join one partition's winner metadata with its fetched content —
    Arrow-native (sort + ``searchsorted`` -> ``take`` with a null mask;
    r2's per-row Python content list was the phase-B reduce hot spot)."""
    winners = pq.read_table(
        os.path.join(staging_dir, "winners", f"pid={pid:05d}.parquet")
    )
    wseq = winners["seq"].to_numpy(zero_copy_only=False)
    deleted = winners[DELETED_COLUMN].to_numpy(zero_copy_only=False)
    n = len(winners)
    indices = np.full(n, -1, dtype=np.int64)
    if fetched is not None and len(fetched):
        fs = fetched["seq"].to_numpy(zero_copy_only=False)
        order = np.argsort(fs, kind="stable")
        fs_sorted = fs[order]
        # dedup re-delivered seqs (identical payloads): first occurrence
        uniq = np.concatenate([[True], np.diff(fs_sorted) != 0])
        sel = order[uniq]           # indices into `fetched`, one per seq
        fs_u = fs_sorted[uniq]
        pos = np.searchsorted(fs_u, wseq)
        pos_c = np.clip(pos, 0, len(fs_u) - 1)
        hit = (fs_u[pos_c] == wseq) & ~deleted
        indices[hit] = sel[pos_c[hit]]
        content_arr = fetched["content"].take(
            pa.array(indices, mask=indices < 0)
        )
        if isinstance(content_arr, pa.ChunkedArray):
            content_arr = content_arr.combine_chunks()
    else:
        content_arr = pa.nulls(n, type=pa.string())
    # late content-null validation: a non-delete winner with no
    # content (invalid event: content must be null iff delete) is
    # excluded from state here — losers with invalid content are
    # dropped unrecorded in late mode (documented divergence)
    bad = ~deleted & (indices < 0)
    n_late_rejects = int(bad.sum())
    final = winners.append_column("content", content_arr)
    if n_late_rejects:
        final = final.filter(pa.array(~bad))
    # sha256 deferred from the map phase: hash winners only
    if SHA_COLUMN in final.column_names:
        final = final.drop_columns([SHA_COLUMN])
    final = final.append_column(SHA_COLUMN, sha256_array(final["content"]))
    final = align_to_schema(final, state_sch)
    entry = lake.write_partition(final, pid, epoch)
    return {
        "pid": entry.pid,
        "file": entry.file,
        "rows": entry.rows,
        "hwm_seq": entry.hwm_seq,
        "live_keys": entry.live_keys,
        "bytes": entry.bytes,
        "n_events": 0,
        "n_rejects": n_late_rejects,
        "distinct_errors": "[]",
    }


def apply_epoch(
    table: LakeTable,
    events_ds,
    *,
    num_partitions: int | None = None,
    rename_map: Mapping[str, str] | None = None,
    run: PipelineRun | None = None,
    batch_size: int = 32768,
    audit: bool = True,
    records_read: int | None = None,
    shuffle_mode: str = "staging",
    phase_b_reader=None,
    extra_validators=(),
    max_chain_len: int = 16,
) -> Manifest:
    """Apply one epoch (micro-batch) of change events to the lake table and
    commit a new manifest.  Returns the committed manifest.

    ``records_read`` is an optional exact input-row count (e.g. from Parquet
    metadata); when omitted it is computed with an extra counting pass only
    if auditing is on — the data plane itself never re-scans the input."""
    # persisted CHECK constraints bind automatically on EVERY batch apply
    # (run_replay, merge_into, direct callers — stages/constraints.py):
    # violations quarantine to audit rejects
    extra_validators = tuple(extra_validators) + tuple(
        table_constraint_validators(table)
    )
    prior = table.latest_manifest()
    if prior is not None:
        P = prior.num_partitions
        prior_state_sch = prior.schema
    else:
        P = num_partitions or DEFAULT_PARTITIONS
        prior_state_sch = None
    run = run or PipelineRun.new("cdc_replay", "events")
    epoch = (prior.epoch if prior else 0) + 1
    commit_ts_us = int(time.time() * 1e6)

    # Schema evolution: union prior event schema with (renamed) incoming.
    incoming = events_ds.schema().base_schema
    if rename_map:
        incoming = pa.schema(
            [pa.field(rename_map.get(f.name, f.name), f.type, f.nullable) for f in incoming]
        )
    # columns dropped by ALTER TABLE stay dropped: exclude them from
    # evolution or any feed still carrying the field would silently
    # resurrect it on the next replay (tests/test_alter_schema.py)
    dropped = set(table.get_properties().get("dropped_columns", []))
    if dropped:
        incoming = pa.schema([f for f in incoming if f.name not in dropped])
    if prior_state_sch is not None:
        event_sch = evolve_schema(event_schema_of(prior_state_sch), incoming)
    else:
        event_sch = evolve_schema(EVENT_SCHEMA, incoming)
    state_sch = make_state_schema(event_sch)

    hwm = prior.hwm if prior else {}
    # delta-chain model: nothing reads prior state during apply (kept as a
    # param for the merge fns' signature; always empty)
    prior_files: dict[int, str] = {}
    prior_entries = dict(prior.partitions) if prior else {}

    prep = EventPrep(event_sch, P, hwm, rename_map, extra_validators=extra_validators)

    if audit:
        log = AuditLog(table.audit_dir)
        log.start_run(run)

    if records_read is None and audit:
        records_read = events_ds.count()

    staging = None
    if shuffle_mode == "late":
        # metadata-only shuffle + winner-content fetch (see section comment
        # above).  Needs a re-readable source for the phase-B column-pruned
        # scan; ``phase_b_reader(columns) -> Dataset`` is supplied by
        # run_replay.
        import shutil

        import ray
        import ray.data as rd

        if phase_b_reader is None:
            raise ValueError("shuffle_mode='late' requires phase_b_reader")
        timing = os.environ.get("CDM_RAY_PHASE_TIMING")
        _t = time.perf_counter
        t0 = _t()
        # RUN-UNIQUE staging dir: two concurrent writers racing the same
        # epoch used to share (and rmtree!) one path — the winner's
        # cleanup yanked slice files from under the loser's merge, turning
        # the clean commit-guard rejection into a mid-pipeline
        # FileNotFoundError (reproduced by the two-process oscommit race
        # test).  Unique dirs mean losers always reach the guard; crashed
        # runs' litter is swept by vacuum (epoch <= LATEST).
        staging = os.path.join(
            table.dir, "_staging", f"epoch-{epoch:08d}-{run.run_id[:8]}"
        )
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging, exist_ok=True)
        # Phase A never needs the content bytes: sha is deferred to
        # assemble, and the content-null-iff-delete check runs on winners
        # at assemble (losers with invalid content are dropped unrecorded —
        # documented divergence of late mode).  With a column-pruned reader
        # phase A decodes ~10% of the input bytes.
        meta_event_sch = pa.schema([f for f in event_sch if f.name != "content"])
        prep_late = EventPrep(
            meta_event_sch, P, hwm, rename_map, compute_sha=False,
            extra_validators=extra_validators,
        )
        group_size = _staging_group_size(P)
        router = PrepAndRoute(prep_late, staging, drop=("content",),
                              group_size=group_size)
        rev_a = {v: k for k, v in (rename_map or {}).items()}
        # only columns that actually exist in THIS epoch's files (the
        # evolved schema may carry columns older/newer epochs don't have;
        # the aligner null-fills the rest)
        present = set(events_ds.schema().names)
        a_cols = [
            c for c in (rev_a.get(f.name, f.name) for f in meta_event_sch) if c in present
        ]
        def _call_reader(columns, **kw):
            """Tolerate legacy reader signatures (``(columns, min_seq=None)``)
            at EVERY call site, not just phase A — a reader written to the
            documented minimal contract must not crash mid-epoch.  Tolerance
            is decided by SIGNATURE, never by catching TypeError from the
            reader's execution: a genuine bug inside the reader must
            propagate, not re-invoke it (side effects) or silently degrade
            phase A to an unpruned full-column scan."""
            try:
                params = inspect.signature(phase_b_reader).parameters
            except (TypeError, ValueError):
                return phase_b_reader(columns, **kw)  # uninspectable: modern
            if not any(
                p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
            ):
                kw = {k: v for k, v in kw.items() if k in params}
            return phase_b_reader(columns, **kw)

        a_ds = _call_reader(a_cols, seq_col=rev_a.get("seq", "seq"))
        a_mapped = a_ds.map_batches(
            router, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        )
        a_mapped.take_all()
        if timing:
            import sys as _sys

            print(f"[phase] A-map {_t() - t0:.2f}s", file=_sys.stderr)
            if timing == "stats":
                # per-operator Ray Data stats (wall, cpu, output bytes) —
                # the "read ds.stats() and iterate" loop
                print(a_mapped.stats(), file=_sys.stderr)
            t0 = _t()
        gids = sorted(
            int(d.split("=")[1]) for d in os.listdir(staging) if d.startswith("pg=")
        )
        rows = []
        if gids:
            winner_fn = _make_winner_fn(
                table.dir, staging, prior_files, state_sch, epoch, run, commit_ts_us
            )
            wrows = (
                rd.from_items(gids, override_num_blocks=len(gids))
                .map_batches(winner_fn, batch_size=1)
                .take_all()
            )
            if timing:
                print(f"[phase] A-reduce {_t() - t0:.2f}s", file=__import__('sys').stderr)
                t0 = _t()
            # seq-range-sharded winner seq -> pid map for the content scan,
            # built ON WORKERS from the per-group fetchmap files — the
            # driver holds only chunk filenames + int64 bounds
            chunk_paths, chunk_bounds = _build_winner_shards(staging)
            # raw column names in the source (reverse of the rename map)
            rev = {v: k for k, v in (rename_map or {}).items()}
            seq_col, content_col = rev.get("seq", "seq"), rev.get("content", "content")
            if chunk_paths:
                route = _make_content_route_fn(
                    staging, chunk_paths, chunk_bounds, seq_col, content_col,
                    group_size=group_size,
                )
                # winners skew to high seqs (LWW): a row-group range filter
                # on min(winner seq) prunes early row groups at the scan
                min_fetch = int(chunk_bounds[0])
                b_mapped = _call_reader(
                    [seq_col, content_col], min_seq=min_fetch, seq_col=seq_col
                ).map_batches(
                    route, batch_format="pyarrow", batch_size=batch_size,
                    zero_copy_batch=True,
                )
                b_mapped.take_all()
                if timing == "stats":
                    print(b_mapped.stats(), file=__import__('sys').stderr)
            if timing:
                print(f"[phase] B-map {_t() - t0:.2f}s", file=__import__('sys').stderr)
                t0 = _t()
            gid_pids: dict[int, list[int]] = {}
            for w in wrows:
                gid_pids.setdefault(int(w["pid"]) // group_size, []).append(int(w["pid"]))
            assemble = _make_assemble_fn(
                table.dir, staging, prior_files, state_sch, epoch, gid_pids
            )
            arows = (
                rd.from_items(gids, override_num_blocks=len(gids))
                .map_batches(assemble, batch_size=1)
                .take_all()
            )
            if timing:
                print(f"[phase] B-reduce {_t() - t0:.2f}s", file=__import__('sys').stderr)
            stats = {w["pid"]: w for w in wrows}
            for r in arows:
                w = stats.get(r["pid"], {})
                rows.append(
                    {
                        **r,
                        "n_events": w.get("n_events", 0),
                        "n_rejects": w.get("n_rejects", 0) + r["n_rejects"],
                        "distinct_errors": w.get("distinct_errors", "[]"),
                    }
                )
    elif shuffle_mode == "staging":
        # explicit two-stage file shuffle: map tasks write per-partition
        # slices; one reduce task per touched partition.  No all-to-all
        # sort; staging lives beside the table (shared storage on a cluster)
        import shutil

        import ray.data as rd

        # RUN-UNIQUE staging dir: two concurrent writers racing the same
        # epoch used to share (and rmtree!) one path — the winner's
        # cleanup yanked slice files from under the loser's merge, turning
        # the clean commit-guard rejection into a mid-pipeline
        # FileNotFoundError (reproduced by the two-process oscommit race
        # test).  Unique dirs mean losers always reach the guard; crashed
        # runs' litter is swept by vacuum (epoch <= LATEST).
        staging = os.path.join(
            table.dir, "_staging", f"epoch-{epoch:08d}-{run.run_id[:8]}"
        )
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging, exist_ok=True)
        router = PrepAndRoute(prep, staging, group_size=_staging_group_size(P))
        events_ds.map_batches(
            router, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        ).take_all()  # tiny (pid, rows) lineage rows; drives execution
        gids = sorted(
            int(d.split("=")[1]) for d in os.listdir(staging) if d.startswith("pg=")
        )
        if gids:
            merge_fn = _make_staging_merge_fn(
                table.dir, staging, prior_files, state_sch, epoch, run, commit_ts_us
            )
            rows = (
                rd.from_items(gids, override_num_blocks=len(gids))
                .map_batches(merge_fn, batch_size=1)
                .take_all()
            )
        else:
            rows = []
    else:
        merge_fn = _make_merge_fn(table.dir, prior_files, state_sch, epoch, run, commit_ts_us)
        prepped = events_ds.map_batches(
            prep, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        )
        results = prepped.groupby(PARTITION_COLUMN).map_groups(
            merge_fn, batch_format="pyarrow"
        )
        rows = results.take_all()  # ≤ P tiny manifest rows

    partitions: dict[int, PartitionEntry] = {}
    if prior:
        partitions.update(prior.partitions)  # carry forward untouched pids
    n_events = n_rejects = 0
    all_errors: set[str] = set()
    touched_records: dict[int, int] = {}
    for r in rows:
        # chain the new delta file after the partition's existing chain
        prev = prior_entries.get(r["pid"])
        chain = (list(prev.files) if prev else []) + [r["file"]]
        partitions[r["pid"]] = PartitionEntry(
            pid=r["pid"],
            files=chain,
            rows=r["rows"] + (prev.rows if prev else 0),
            hwm_seq=max(r["hwm_seq"], prev.hwm_seq if prev else -1),
            live_keys=r["live_keys"] if len(chain) == 1 else -1,
            bytes=r["bytes"] + (prev.bytes if prev else 0),
            # equality-delete vectors still cover the carried chain files;
            # new delta rows have seq above every DV watermark, so carrying
            # them forward cannot delete fresh writes
            delete_files=list(prev.delete_files) if prev else [],
        )
        n_events += r["n_events"]
        n_rejects += r["n_rejects"]
        touched_records[r["pid"]] = r["n_events"]
        all_errors.update(json.loads(r["distinct_errors"]))

    manifest = Manifest(
        epoch=epoch,
        num_partitions=P,
        schema=state_sch,
        partitions=partitions,
        parent_epoch=prior.epoch if prior else None,
        run_id=run.run_id,
        metrics={
            "records_read": records_read,
            "events_applied": n_events,
            "records_invalid": n_rejects,
            "touched_partitions": len(rows),
            "commit_ts_us": commit_ts_us,
        },
        rename_history={**(prior.rename_history if prior else {}), **(rename_map or {})},
    )
    table.commit(manifest)
    if staging is not None:
        # staging holds thousands of slice files at large inputs; deleting
        # them synchronously adds seconds of driver tail after the commit.
        # RENAME to a unique trash path first (atomic, instant) so a later
        # re-creation of the SAME epoch path (e.g. the lake dir wiped and
        # replayed in-process) can never race the background walker.
        import shutil
        import threading
        import uuid

        trash = f"{staging}.trash-{uuid.uuid4().hex[:8]}"
        try:
            os.replace(staging, trash)
        except OSError:
            trash = staging  # rename failed: fall back to in-place delete
        threading.Thread(
            target=shutil.rmtree, args=(trash,), kwargs={"ignore_errors": True},
            daemon=True,
        ).start()

    if max_chain_len and any(len(p.files) > max_chain_len for p in partitions.values()):
        from cdm_data_loader_utils_ray.pipelines.maintenance import fold_long_chains

        folded = fold_long_chains(table, max_len=max_chain_len, run_id=run.run_id)
        if folded is not None:
            manifest = folded

    if audit:
        log.upsert_checkpoints(run, manifest.hwm, touched_records)
        log.write_metrics(
            run,
            records_read=records_read,
            records_valid=records_read - n_rejects,
            records_invalid=n_rejects,
            validation_errors=sorted(all_errors),
        )
        log.complete_run(run, records_read)
    return manifest


def _merge_chain_table(
    lake: LakeTable, entry: PartitionEntry, m: Manifest, live_only: bool
) -> pa.Table:
    """LWW-merge one partition's delta chain, schema-aligned across epochs
    (older files may predate a schema evolution / rename).  Delegates to
    ``sinks.lake.merge_chain_files`` — the single copy of the
    rename→align→LWW kernel — plus the live-row filter."""
    t = merge_chain_files(lake.dir, entry.files, m, delete_files=entry.delete_files)
    if live_only and DELETED_COLUMN in t.column_names:
        t = t.filter(pc.equal(t[DELETED_COLUMN], False)).drop_columns([DELETED_COLUMN])
    return t


def read_final_state(table: LakeTable, live_only: bool = True):
    """Committed final state as a streaming Dataset: one task per
    partition LWW-merges its delta chain."""
    import ray.data as rd

    m = table.latest_manifest()
    if m is None or not m.partitions:
        sch = m.schema if m else pa.schema([])
        if m is not None and live_only and DELETED_COLUMN in sch.names:
            # match the populated path: merge_one drops is_deleted
            sch = pa.schema([f for f in sch if f.name != DELETED_COLUMN])
        return rd.from_arrow(sch.empty_table())
    table_dir = table.dir
    entries = dict(m.partitions)
    pids = sorted(entries)

    def merge_one(batch: dict) -> pa.Table:
        lake = LakeTable(table_dir)
        out = [
            _merge_chain_table(lake, entries[int(pid)], m, live_only)
            for pid in batch["item"]
        ]
        return pa.concat_tables(out)

    return rd.from_items(pids, override_num_blocks=len(pids)).map_batches(
        merge_one, batch_size=1
    )


def read_final_state_arrow(table: LakeTable, live_only: bool = True) -> pa.Table:
    """Driver-side final state (tests / small tables)."""
    m = table.latest_manifest()
    if m is None:
        return pa.schema([]).empty_table()
    parts = [
        _merge_chain_table(table, e, m, live_only)
        for e in sorted(m.partitions.values(), key=lambda p: p.pid)
    ]
    t = pa.concat_tables(parts) if parts else m.schema.empty_table()
    if live_only and DELETED_COLUMN in t.column_names:
        t = t.filter(pc.equal(t[DELETED_COLUMN], False)).drop_columns([DELETED_COLUMN])
    df = t.to_pandas().sort_values(list(KEY_COLUMNS), kind="stable").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def export_state(table: LakeTable, out_dir: str, live_only: bool = True,
                 partition_by: "list[str] | None" = None) -> str:
    """Materialize committed final state to a plain Parquet directory via a
    streaming write (consumers that don't speak the manifest format).
    ``partition_by`` writes a Hive-partitioned layout
    (``col=value/`` directories — Spark/Trino/DuckDB-readable); pick
    low-cardinality columns, every distinct combination becomes a
    directory."""
    ds = read_final_state(table, live_only=live_only)
    if partition_by:
        ds.write_parquet(out_dir, partition_cols=list(partition_by))
    else:
        ds.write_parquet(out_dir)
    return out_dir


def run_replay(
    events_path: str,
    table_dir: str,
    *,
    num_partitions: int = DEFAULT_PARTITIONS,
    epochs: int = 1,
    rename_map: Mapping[str, str] | None = None,
    max_seq: int | None = None,
    batch_size: int = 32768,
    audit: bool = True,
    shuffle_mode: str = "staging",
    extra_validators=(),
) -> Manifest:
    """Replay an event-log Parquet path into a lake table in ``epochs``
    micro-batches split by ``seq`` range (range filters push down to the
    Parquet scan).  Resume = call again: committed epochs' events are skipped
    by per-partition hwm and the merge is idempotent regardless."""
    import ray.data as rd

    table = LakeTable(table_dir)
    full_range = max_seq is None
    if max_seq is None:
        if epochs == 1:
            max_seq = 0  # unused: single full-range epoch reads everything
        elif os.path.isfile(events_path):
            max_seq = int(pq.read_table(events_path, columns=["seq"])["seq"].to_pandas().max())
        else:
            max_seq = int(rd.read_parquet(events_path).max("seq"))
    min_seq = 0
    bounds = np.linspace(min_seq - 1, max_seq, epochs + 1, dtype=np.int64)
    manifest = None
    for i in range(epochs):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        records_read = None
        if epochs == 1 and full_range:
            # full-range single epoch: exact count from Parquet metadata,
            # and no row filter (avoids forcing a filtered scan)
            if os.path.isfile(events_path):
                records_read = pq.read_metadata(events_path).num_rows
            elif os.path.isdir(events_path):
                records_read = sum(
                    pq.read_metadata(os.path.join(events_path, f)).num_rows
                    for f in os.listdir(events_path)
                    if f.endswith(".parquet")
                )
            ds = rd.read_parquet(events_path)

            # ``seq_col`` is passed EXPLICITLY by apply_epoch (the raw name
            # of the seq column in the source files) — never inferred from
            # column-list position, which silently breaks once the evolved
            # schema doesn't lead with seq.
            def phase_b_reader(columns, min_seq=None, seq_col="seq", _p=events_path):
                if min_seq is not None:
                    return rd.read_parquet(
                        _p, columns=columns, filter=pc.field(seq_col) >= min_seq
                    )
                return rd.read_parquet(_p, columns=columns)

        else:
            ds = rd.read_parquet(
                events_path, filter=(pc.field("seq") > lo) & (pc.field("seq") <= hi)
            )

            def phase_b_reader(columns, min_seq=None, seq_col="seq",
                               _p=events_path, _lo=lo, _hi=hi):
                lo_eff = max(_lo, (min_seq - 1) if min_seq is not None else _lo)
                return rd.read_parquet(
                    _p,
                    columns=columns,
                    filter=(pc.field(seq_col) > lo_eff) & (pc.field(seq_col) <= _hi),
                )

        run = PipelineRun.new("cdc_replay", events_path)
        manifest = apply_epoch(
            table,
            ds,
            num_partitions=num_partitions,
            rename_map=rename_map,
            run=run,
            batch_size=batch_size,
            audit=audit,
            records_read=records_read,
            shuffle_mode=shuffle_mode,
            phase_b_reader=phase_b_reader,
            extra_validators=extra_validators,
        )
    return manifest
