"""Lake maintenance: compaction, conditional update, retention.

Reference parity:
* ``cleanup_after_write`` / OPTIMIZE (``refseq_pipeline/core/spark_delta.py:
  95-157``) — rewrite keeping the best row per key, then compact + retain;
* ``DeltaTable.update(cond, set)`` with updated-row-count verification
  (``audit/run.py:64-83``, ``audit/checkpoint.py:74-91``).

Both are expressed as per-partition rewrite tasks over the manifest-listed
files (only touched partitions are rewritten; the manifest swap is atomic).
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from cdm_data_loader_utils_ray.core.schemas import DELETED_COLUMN
from cdm_data_loader_utils_ray.sinks.lake import (
    BLOOM_SIDECAR_SUFFIX,
    LakeTable,
    Manifest,
    PartitionEntry,
)
from cdm_data_loader_utils_ray.stages.partition import zorder_key


def _rewrite_partitions(
    table: LakeTable,
    rewrite: Callable[[pa.Table, int], tuple[pa.Table | None, int]],
    run_id: str,
    metrics_key: str,
    column_range: dict | None = None,
    state_preserving: bool = False,
    row_group_size: int | None = None,
) -> Manifest:
    """Rewrite each partition with ``rewrite(table, pid)`` (None = keep
    as-is) via one Ray task per partition, then commit epoch+1.

    ``column_range`` (col -> (lo, hi)) is a data-skipping HINT: a
    partition whose chain footers prove no row in range is carried
    forward untouched without reading any data (sound only when the
    rewrite is a no-op outside the range, which the caller asserts by
    passing the hint)."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.sinks.lake import (
        chain_may_match,
        merge_chain_files,
    )

    m = table.latest_manifest()
    if m is None:
        raise ValueError("no committed manifest to rewrite")
    epoch = m.epoch + 1
    chains = {p.pid: list(p.files) for p in m.partitions.values()}
    dvs = {p.pid: list(p.delete_files) for p in m.partitions.values()}
    table_dir = table.dir
    ranges = dict(column_range or {})
    # run-unique file suffix: two concurrent maintenance ops at the same
    # epoch may produce DIFFERENT content — deterministic paths would let
    # the commit-rejected loser's rename swap the winner's committed file
    sfx = uuid.uuid4().hex[:8]

    def one(batch: dict) -> pa.Table:
        rows = []
        for pid in batch["item"]:
            pid = int(pid)
            lake = LakeTable(table_dir)
            chain = chains[pid]
            if ranges and any(
                not chain_may_match(table_dir, chain, c, lo, hi)
                for c, (lo, hi) in ranges.items()
            ):
                # footer-proven out of range: no data IO, chain kept as-is
                rows.append({"pid": pid, "changed": False, "file": chain[-1],
                             "rows": -1, "hwm_seq": -1, "live_keys": -1,
                             "bytes": -1, "touched_rows": 0})
                continue
            # merge_chain_files applies rename_history PER FILE before
            # alignment — reading raw and aligning to m.schema would null
            # out pre-rename files' renamed columns (latent until
            # alter_rename_column made old-named files routine)
            t = merge_chain_files(table_dir, chain, m, delete_files=dvs[pid])
            new, touched = rewrite(t, pid)
            if new is None and len(chain) > 1:
                new = t  # fold the chain even when the rewrite is a no-op
            if new is None and dvs[pid]:
                new = t  # rewrite materializes the delete vectors too
            if new is None:
                rows.append({"pid": pid, "changed": False, "file": chain[-1],
                             "rows": len(t), "hwm_seq": -1, "live_keys": -1,
                             "bytes": -1, "touched_rows": touched})
                continue
            entry = lake.write_partition(
                new, pid, epoch, row_group_size=row_group_size, suffix=sfx
            )
            rows.append({"pid": pid, "changed": True, "file": entry.file,
                         "rows": entry.rows, "hwm_seq": entry.hwm_seq,
                         "live_keys": entry.live_keys, "bytes": entry.bytes,
                         "touched_rows": touched})
        return pa.Table.from_pylist(rows)

    pids = sorted(chains)
    results = (
        rd.from_items(pids, override_num_blocks=len(pids))
        .map_batches(one, batch_size=1)
        .take_all()
    )
    partitions: dict[int, PartitionEntry] = {}
    changed = 0
    touched_rows = 0
    for r in results:
        touched_rows += r["touched_rows"]
        if r["changed"]:
            changed += 1
            # carry the prior hwm forward: the rewritten file's max(seq) can
            # be LOWER than the partition's applied high-water mark (e.g.
            # the dropped tombstone held the max seq).  Recomputing hwm from
            # surviving rows would let a partial redelivery in
            # (new_hwm, old_hwm] resurrect a compacted delete.
            prev_hwm = m.partitions[r["pid"]].hwm_seq
            partitions[r["pid"]] = PartitionEntry(
                pid=r["pid"], files=[r["file"]], rows=r["rows"],
                hwm_seq=max(r["hwm_seq"], prev_hwm), live_keys=r["live_keys"],
                bytes=r["bytes"],
            )
        else:
            partitions[r["pid"]] = m.partitions[r["pid"]]
    new_m = Manifest(
        epoch=epoch,
        num_partitions=m.num_partitions,
        schema=m.schema,
        partitions=partitions,
        parent_epoch=m.epoch,
        run_id=run_id,
        metrics={
            metrics_key: changed,
            "touched_rows": touched_rows,
            # read_changes skips state-preserving rewrite epochs (compact,
            # chain-fold) when reconstructing per-epoch CDF windows — a
            # state-CHANGING rewrite (update_where) forces the full-state
            # fallback for its rewritten partitions instead
            "state_preserving_rewrite": state_preserving,
        },
        rename_history=m.rename_history,
    )
    table.commit(new_m)
    return new_m


def compact(table: LakeTable, drop_tombstones: bool = True,
            run_id: str = "compaction", sort_by: str | None = None,
            zorder_by: Sequence[str] | None = None,
            row_group_size: int | None = None) -> Manifest:
    """OPTIMIZE analogue: rewrite partitions dropping tombstones.

    Dropping a tombstone forgets the delete's ``seq``; safe once no events
    at or below the partition hwm can still arrive (the replay contract —
    same reasoning as Delta VACUUM retention).  Untouched partitions keep
    their files; pair with ``table.vacuum()`` to remove orphans.

    ``sort_by``: physically order each folded partition file by a column
    (1-D OPTIMIZE analogue) — the rewritten file's row-group and footer
    min/max stats become TIGHT ranges, so subsequent
    ``read_state(column_range=...)`` / ``update_where`` data skipping
    prunes precisely instead of conservatively.  Forces a rewrite of
    every partition (a sort IS a rewrite).

    ``zorder_by``: 2-4 numeric/temporal columns — physically order by the
    Morton interleave of their bits (Delta ``OPTIMIZE ZORDER BY``
    analogue, ``stages/partition.zorder_key``), so row-group stats tighten
    on ALL the columns at once and a post-compaction
    ``read_state(column_range=...)`` prunes row groups within the single
    chain file (``merge_chain_files`` single-file pruning) on any of them.
    Pair with ``row_group_size`` (rows per parquet row group) to pick the
    skipping granularity; mutually exclusive with ``sort_by``."""
    if sort_by is not None and zorder_by is not None:
        raise ValueError("pass sort_by or zorder_by, not both")

    def rewrite(t: pa.Table, pid: int) -> tuple[pa.Table | None, int]:
        dropped = 0
        changed = False
        if drop_tombstones and DELETED_COLUMN in t.column_names:
            mask = pc.equal(t[DELETED_COLUMN], False)
            n_live = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            if n_live != len(t):
                dropped = len(t) - n_live
                t = t.filter(mask)
                changed = True
        if sort_by is not None:
            t = t.sort_by([(sort_by, "ascending")])
            changed = True
        if zorder_by is not None:
            z = zorder_key(t, list(zorder_by))
            t = t.take(pa.array(np.argsort(z, kind="stable")))
            changed = True
        return (t, dropped) if changed else (None, 0)

    return _rewrite_partitions(table, rewrite, run_id, "compacted_partitions",
                               state_preserving=True,
                               row_group_size=row_group_size)


def fold_long_chains(
    table: LakeTable, max_len: int = 16, run_id: str = "chain-fold"
) -> Manifest | None:
    """Bound read amplification: fold (only) the partitions whose delta
    chain exceeds ``max_len`` into single files; short chains carry forward
    untouched.  Returns the new manifest, or None if nothing needed.
    Called automatically by ``apply_epoch`` (``max_chain_len``)."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.sinks.lake import merge_chain_files

    m = table.latest_manifest()
    if m is None:
        return None
    long_pids = sorted(p.pid for p in m.partitions.values() if len(p.files) > max_len)
    if not long_pids:
        return None
    epoch = m.epoch + 1
    chains = {p.pid: list(p.files) for p in m.partitions.values()}
    dvs = {p.pid: list(p.delete_files) for p in m.partitions.values()}
    table_dir = table.dir
    sfx = uuid.uuid4().hex[:8]  # run-unique path (racing-maintenance rule)

    def fold(batch: dict) -> pa.Table:
        rows = []
        for pid in batch["item"]:
            pid = int(pid)
            lake = LakeTable(table_dir)
            # merge_chain_files, not a raw read: it applies rename_history
            # per file (pre-rename chain files would otherwise fold their
            # old-named values to null) and the delete vectors (folding
            # without them would persist the resurrected rows)
            t = merge_chain_files(table_dir, chains[pid], m, delete_files=dvs[pid])
            entry = lake.write_partition(t, pid, epoch, suffix=sfx)
            rows.append({"pid": entry.pid, "file": entry.file, "rows": entry.rows,
                         "hwm_seq": entry.hwm_seq, "live_keys": entry.live_keys,
                         "bytes": entry.bytes})
        return pa.Table.from_pylist(rows)

    results = (
        rd.from_items(long_pids, override_num_blocks=len(long_pids))
        .map_batches(fold, batch_size=1)
        .take_all()
    )
    partitions = dict(m.partitions)
    for r in results:
        prev_hwm = m.partitions[r["pid"]].hwm_seq
        partitions[r["pid"]] = PartitionEntry(
            pid=r["pid"], files=[r["file"]], rows=r["rows"],
            hwm_seq=max(r["hwm_seq"], prev_hwm), live_keys=r["live_keys"],
            bytes=r["bytes"],
        )
    new_m = Manifest(
        epoch=epoch, num_partitions=m.num_partitions, schema=m.schema,
        partitions=partitions, parent_epoch=m.epoch, run_id=run_id,
        metrics={"folded_partitions": len(long_pids),
                 "state_preserving_rewrite": True},
        rename_history=m.rename_history,
    )
    table.commit(new_m)
    return new_m


def migrate_partitions(
    table: LakeTable, new_num_partitions: int, run_id: str = "migrate"
) -> Manifest:
    """Re-hash the whole table to a new partition count (grow/shrink when
    live state outgrows partitions — the `num_partitions` migration the
    README scale notes describe).  One full rewrite shaped like an epoch:
    read committed state, re-bucket by the stable key hash mod new P, write
    one file per new partition, commit.  Every new partition's hwm is the
    MAX over all old partitions' hwm: routing changed, so any new partition
    may own keys from any old one — recomputing hwm from surviving rows
    would re-open the gate for already-applied (e.g. compacted-delete)
    seqs and resurrect deleted keys on replay."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.core.schemas import KEY_COLUMNS, PARTITION_COLUMN
    from cdm_data_loader_utils_ray.sinks.lake import merge_chain_files
    from cdm_data_loader_utils_ray.stages.partition import add_partition_column
    from cdm_data_loader_utils_ray.state.upsert import merge_states as _ms

    m = table.latest_manifest()
    if m is None:
        raise ValueError("no committed manifest to migrate")
    epoch = m.epoch + 1
    table_dir = table.dir
    state_schema = m.schema

    mig_sfx = uuid.uuid4().hex[:8]  # run-unique paths (racing-maintenance rule)
    # stage by NEW pid (reuse the epoch staging layout), then one write per
    # new partition
    staging = os.path.join(table_dir, "_staging", f"migrate-{epoch:08d}")
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)

    def route(batch: pa.Table) -> pa.Table:
        import numpy as np

        if len(batch) == 0:  # empty old partition: nothing to route
            return pa.table({"pid": pa.array([], type=pa.int32())})
        b = add_partition_column(batch, new_num_partitions, KEY_COLUMNS)
        pids = b[PARTITION_COLUMN].to_numpy(zero_copy_only=False)
        order = np.argsort(pids, kind="stable")
        b = b.take(pa.array(order))
        pids = pids[order]
        bounds = np.flatnonzero(np.diff(pids)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(pids)]])
        seqs = b["seq"].to_numpy(zero_copy_only=False)
        out = []
        for s, e in zip(starts, ends):
            pid = int(pids[s])
            d = os.path.join(staging, f"pid={pid:05d}")
            os.makedirs(d, exist_ok=True)
            lo, hi = int(seqs[s:e].min()), int(seqs[s:e].max())
            # a per-task unique suffix keeps two batches' slices for the
            # same pid from colliding (seq ranges are NOT unique — e.g.
            # after merge_into every row carries the same seq).  A retried
            # task may leave an extra copy of its rows; exact duplicates
            # collapse in the LWW merge below, loss would not.
            tag = uuid.uuid4().hex[:8]
            pq.write_table(
                b.slice(s, e - s).drop_columns([PARTITION_COLUMN]),
                os.path.join(d, f"slice-{lo:012d}-{hi:012d}-{e - s}-{tag}.parquet"),
                compression="lz4",
            )
            out.append(pid)
        return pa.table({"pid": pa.array(out, type=pa.int32())})

    # Read per OLD partition through merge_chain_files — NOT a raw scan of
    # the chain files: raw reads drop pre-rename files' renamed column
    # values (the same hole the r4 fix closed in _rewrite_partitions) and
    # would resurrect equality-delete-vector'd rows.  The LWW merge per
    # old partition is also strictly less data to route (losers die early).
    old_chains = {
        p.pid: (list(p.files), list(p.delete_files))
        for p in m.partitions.values()
    }

    def read_old(batch: dict) -> pa.Table:
        out = []
        for pid in batch["item"]:
            files, dvs = old_chains[int(pid)]
            out.append(merge_chain_files(table_dir, files, m, delete_files=dvs))
        return pa.concat_tables(out) if out else state_schema.empty_table()

    (
        rd.from_items(sorted(old_chains), override_num_blocks=max(1, len(old_chains)))
        .map_batches(read_old, batch_size=1)
        .map_batches(route, batch_format="pyarrow")
        .take_all()
    )
    # EVERY new pid gets an entry (empty base file if no keys routed there):
    # a missing entry would leave that partition's hwm at -1 and re-open
    # the idempotence gate for its keys
    pids = list(range(new_num_partitions))

    def write_one(batch: dict) -> pa.Table:
        rows = []
        for pid in batch["item"]:
            pid = int(pid)
            lake = LakeTable(table_dir)
            d = os.path.join(staging, f"pid={pid:05d}")
            slices = sorted(os.listdir(d)) if os.path.isdir(d) else []
            t = _ms(
                None,
                pa.concat_tables(
                    [pq.read_table(os.path.join(d, f)) for f in slices],
                    promote_options="permissive",
                )
                if slices
                else state_schema.empty_table(),
                state_schema,
            )
            entry = lake.write_partition(t, pid, epoch, suffix=mig_sfx)
            rows.append({"pid": entry.pid, "file": entry.file, "rows": entry.rows,
                         "hwm_seq": entry.hwm_seq, "live_keys": entry.live_keys,
                         "bytes": entry.bytes})
        return pa.Table.from_pylist(rows)

    results = (
        rd.from_items(pids, override_num_blocks=max(1, len(pids)))
        .map_batches(write_one, batch_size=1)
        .take_all()
    )
    prev_hwm_global = max((p.hwm_seq for p in m.partitions.values()), default=-1)
    partitions = {
        r["pid"]: PartitionEntry(
            pid=r["pid"], files=[r["file"]], rows=r["rows"],
            hwm_seq=max(int(r["hwm_seq"]), prev_hwm_global),
            live_keys=r["live_keys"], bytes=r["bytes"],
        )
        for r in results
    }
    new_m = Manifest(
        epoch=epoch,
        num_partitions=new_num_partitions,
        schema=state_schema,
        partitions=partitions,
        parent_epoch=m.epoch,
        run_id=run_id,
        metrics={"migrated_from": m.num_partitions, "migrated_to": new_num_partitions},
        rename_history=m.rename_history,
    )
    table.commit(new_m)
    shutil.rmtree(staging, ignore_errors=True)
    return new_m


def expire_snapshots(table: LakeTable, keep_epochs: int = 10) -> list[int]:
    """Iceberg ``expire_snapshots`` analogue: delete MANIFEST files older
    than the last ``keep_epochs`` committed epochs.  Complements
    :meth:`LakeTable.vacuum` (which reclaims DATA files): every manifest
    is self-contained (full partition state, ~100 B per partition), so at
    P=32k a long-lived table accrues megabytes of manifest JSON per epoch
    forever without this.

    Kept regardless of age: the newest ``keep_epochs`` manifests, every
    TAGGED epoch (tags are retention leases, same as vacuum), and any
    manifest above the committed LATEST (phase-1 of an in-flight commit).
    After expiry: time travel / restore / CDF reads below the kept window
    raise FileNotFoundError — the documented retention trade (identical to
    Delta/Iceberg).  Returns the expired epoch numbers."""
    if keep_epochs < 1:
        raise ValueError("expire_snapshots: keep_epochs must be >= 1")
    latest = table.latest_epoch()
    if latest is None:
        return []
    epochs = sorted(
        int(f[len("manifest-"):-len(".json")])
        for f in os.listdir(table.manifest_dir)
        if f.startswith("manifest-") and f.endswith(".json")
    )
    committed = [e for e in epochs if e <= latest]
    keep = set(committed[-keep_epochs:]) | set(table.tags().values())
    keep.update(e for e in epochs if e > latest)  # in-flight staging
    expired = []
    for e in epochs:
        if e in keep:
            continue
        if table._oslog is not None:
            from cdm_data_loader_utils_ray.sinks.oscommit import final_key

            table._oslog.store.delete(final_key(e))
        else:
            try:
                os.unlink(
                    os.path.join(table.manifest_dir, f"manifest-{e:08d}.json")
                )
            except FileNotFoundError:
                pass
        expired.append(e)
    return expired


def restore(table: LakeTable, epoch: int) -> Manifest:
    """Delta ``RESTORE TABLE ... TO VERSION`` analogue: re-commit the table
    state of an earlier epoch as a NEW epoch.  Metadata-only — no data file
    is read or rewritten; the new manifest simply references the target
    epoch's chains, so the rollback costs O(partitions) regardless of table
    size.

    Semantics:
    * history is preserved — the rollback is itself a visible commit
      (``metrics.restored_from``), and time-travel reads of the epochs
      between target and rollback still work until vacuum reclaims them;
    * the per-partition high-water marks roll back with the chains, so
      re-running the event log RE-APPLIES everything after the restored
      epoch (the replay contract keeps the rollback convergent);
    * ``vacuum`` keeps the restored files alive because the new LATEST
      manifest references them;
    * raises if any target file was already vacuumed (same failure mode as
      Delta RESTORE past the retention window).
    """
    cur = table.latest_manifest()
    if cur is None:
        raise ValueError("no committed manifest to restore from")
    if epoch == cur.epoch:
        return cur
    target = table.read_manifest(epoch)
    missing = [
        f
        for p in target.partitions.values()
        for f in list(p.files) + list(p.delete_files)
        if not os.path.exists(table.abspath(f))
    ]
    if missing:
        raise ValueError(
            f"restore to epoch {epoch} impossible: {len(missing)} data file(s) "
            f"already vacuumed (first: {missing[0]}) — restore only reaches "
            "epochs inside the vacuum retention window"
        )
    m = Manifest(
        epoch=cur.epoch + 1,
        num_partitions=target.num_partitions,
        schema=target.schema,
        partitions={
            pid: PartitionEntry.from_json(p.to_json())  # deep copy
            for pid, p in target.partitions.items()
        },
        parent_epoch=cur.epoch,
        run_id=f"restore-{uuid.uuid4().hex[:8]}",
        metrics={"restored_from": epoch},
        rename_history=dict(target.rename_history),
    )
    table.commit(m)
    return m


def clone_table(src: LakeTable, dst_dir: str, epoch: int | None = None) -> Manifest:
    """Zero-copy table CLONE (Delta ``CREATE TABLE ... CLONE`` analogue):
    materialize the source state at ``epoch`` (default: latest) as a new
    independent table under ``dst_dir`` by HARDLINKING the source's live
    data files — no data is copied, the clone is O(partitions).

    Isolation: parquet files are immutable in this engine (every change
    writes a new file), so the shared inodes can never observe each
    other's writes; each side's ``vacuum``/``compact`` only unlinks its
    own directory entry and the inode survives until both drop it.  The
    clone keeps the source's per-partition high-water marks, so replaying
    the same event log onto the clone resumes exactly where the source
    stood.  Falls back to a file copy when hardlinks cross filesystems.
    (On an object store, substitute a server-side copy for the link.)
    """
    m = src.latest_manifest() if epoch is None else src.read_manifest(epoch)
    if m is None:
        raise ValueError("clone_table: source has no committed manifest")
    dst = LakeTable(dst_dir)
    if dst.latest_epoch() is not None:
        raise ValueError(f"clone_table: {dst_dir} already has commits")
    for p in m.partitions.values():
        for f in list(p.files) + list(p.delete_files):
            # bloom sidecars ride along (immutable like their data file;
            # advisory, so a missing one is fine); delete-vector files are
            # referenced state — the clone's reads need them
            rels = [f] + (
                [f + BLOOM_SIDECAR_SUFFIX]
                if os.path.exists(src.abspath(f + BLOOM_SIDECAR_SUFFIX))
                else []
            )
            for rel in rels:
                s, d = src.abspath(rel), dst.abspath(rel)
                os.makedirs(os.path.dirname(d), exist_ok=True)
                try:
                    os.link(s, d)
                except OSError:
                    import shutil

                    shutil.copy2(s, d)
    # keep the SOURCE epoch number: data-file names embed their epoch, and
    # vacuum treats names above LATEST as in-flight writes it must keep —
    # restarting at epoch 1 would make every cloned file look in-flight
    out = Manifest(
        epoch=m.epoch,
        num_partitions=m.num_partitions,
        schema=m.schema,
        partitions={
            pid: PartitionEntry.from_json(p.to_json())
            for pid, p in m.partitions.items()
        },
        parent_epoch=None,
        run_id=f"clone-{uuid.uuid4().hex[:8]}",
        metrics={"cloned_from": src.dir, "source_epoch": m.epoch},
        rename_history=dict(m.rename_history),
    )
    dst.commit(out)
    # table properties (constraints, bloom_index config) travel with the
    # clone — Delta CLONE semantics; epoch-independent, so a plain copy
    props = src.get_properties()
    if props:
        dst.set_properties(props)
    return out


def update_where(
    table: LakeTable,
    predicate: Callable[[pa.Table], pa.Array],
    setter: Callable[[pa.Table], pa.Table],
    run_id: str = "update",
    column_range: dict | None = None,
) -> tuple[Manifest, int]:
    """``DeltaTable.update(cond, set)`` analogue with effect verification:
    returns (manifest, updated_row_count); rows matching ``predicate`` are
    replaced by ``setter(matching_rows)``, everything else kept byte-equal.

    ``column_range`` (col -> (lo, hi)): optional data-skipping hint — the
    caller asserts the predicate can only match rows inside the ranges,
    and partitions whose parquet footers prove no such rows are skipped
    without any data IO (Delta-style file skipping on update).
    """
    def rewrite(t: pa.Table, pid: int) -> tuple[pa.Table | None, int]:
        mask = pc.fill_null(predicate(t), False)
        n = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        if n == 0:
            return None, 0
        updated = setter(t.filter(mask))
        kept = t.filter(pc.invert(mask))
        return pa.concat_tables([kept, updated], promote_options="permissive"), n

    m = _rewrite_partitions(table, rewrite, run_id, "updated_partitions",
                            column_range=column_range)
    # effect verification (reference checks Delta history numUpdatedRows)
    return m, int(m.metrics.get("touched_rows", 0))


def analyze_table(table: LakeTable, columns=None) -> dict:
    """``ANALYZE TABLE`` (Delta ``ANALYZE ... COMPUTE STATISTICS FOR
    COLUMNS`` analogue): EXACT per-column statistics over the committed
    LIVE state — row count, null count, distinct count, min/max — via the
    shuffle-light profile kernels (min/max/count pass never shuffles; the
    exact-distinct pass is one (column, value) bucket shuffle).  Persisted
    under the ``stats`` table property, stamped with the analyzed epoch so
    staleness is visible; CLI ``describe`` surfaces them.

    Statistics never affect correctness (reads prune from parquet footers
    and Bloom sidecars, not from these) — they are the catalog-facing
    summary a warehouse user expects from DESCRIBE."""
    from cdm_data_loader_utils_ray.functions.profile import profile

    m = table.latest_manifest()
    if m is None:
        raise ValueError("analyze_table: no committed manifest")
    live_cols = [f.name for f in m.schema if f.name != DELETED_COLUMN]
    cols = list(columns) if columns is not None else live_cols
    for c in cols:
        if c not in live_cols:
            raise ValueError(f"analyze_table: column {c!r} not in table schema")
    df = profile(table.read_state(), cols)
    def _pick(num, s):
        # pandas renders absent numerics as NaN — NaN is not valid JSON
        if num is None or (isinstance(num, float) and num != num):
            return None if (isinstance(s, float) and s != s) else s
        return num

    col_stats = {}
    for r in df.to_dict("records"):
        col_stats[r["column"]] = {
            "n_rows": int(r["n_rows"]),
            "n_nulls": int(r["n_nulls"]),
            "n_distinct": int(r["n_distinct"]),
            "min": _pick(r.get("min_num"), r.get("min_str")),
            "max": _pick(r.get("max_num"), r.get("max_str")),
        }
    stats = {"epoch": m.epoch, "columns": col_stats}
    props = table.get_properties()
    props["stats"] = stats
    table.set_properties(props)
    return stats


def delete_where(
    table: LakeTable,
    predicate: Callable[[pa.Table], pa.Array],
    run_id: str = "delete",
    mode: str = "dv",
    column_range: dict | None = None,
    predicate_columns=None,
) -> tuple[Manifest, int]:
    """``DELETE FROM ... WHERE`` analogue.  Two execution modes:

    * ``mode='rewrite'`` — rewrite matching partitions immediately
      (Delta's copy-on-write delete); IO is O(touched partitions' data).
    * ``mode='dv'`` (default) — write equality-delete vectors
      (Iceberg-style merge-on-read): per touched partition one tiny
      key-list sidecar; NO data file is rewritten, reads apply the
      vectors, and the next ``compact``/chain fold materializes them.
      The 100-TB path for small deletes (GDPR erasure, bad-batch
      retraction) — IO ∝ deleted keys, not table size.

    Returns ``(manifest, deleted_row_count)``.  A key re-inserted by a
    LATER CDC epoch outlives the delete (the vector's watermark is the
    partition hwm at delete time).  ``column_range`` is the same
    footer-skipping hint as :func:`update_where`.  ``predicate_columns``
    (dv mode): the caller asserts the predicate reads only these columns —
    the chain merge then projects to them (+ keys/seq), so a wide table's
    payload never leaves storage for a narrow delete.
    """
    if mode == "rewrite":

        def rewrite(t: pa.Table, pid: int) -> tuple[pa.Table | None, int]:
            mask = pc.fill_null(predicate(t), False)
            n = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            if n == 0:
                return None, 0
            return t.filter(pc.invert(mask)), n

        m = _rewrite_partitions(table, rewrite, run_id, "deleted_partitions",
                                column_range=column_range)
        return m, int(m.metrics.get("touched_rows", 0))
    if mode != "dv":
        raise ValueError(f"delete_where: unknown mode {mode!r}")

    import ray.data as rd

    from cdm_data_loader_utils_ray.core.schemas import KEY_COLUMNS
    from cdm_data_loader_utils_ray.sinks.lake import (
        chain_may_match,
        merge_chain_files,
    )

    m = table.latest_manifest()
    if m is None:
        raise ValueError("no committed manifest to delete from")
    epoch = m.epoch + 1
    chains = {p.pid: list(p.files) for p in m.partitions.values()}
    dvs = {p.pid: list(p.delete_files) for p in m.partitions.values()}
    hwms = {p.pid: p.hwm_seq for p in m.partitions.values()}
    table_dir = table.dir
    ranges = dict(column_range or {})
    dv_sfx = uuid.uuid4().hex[:8]  # run-unique paths (racing-maintenance rule)
    pred_cols = list(predicate_columns) if predicate_columns is not None else None

    def one(batch: dict) -> pa.Table:
        rows = []
        for pid in batch["item"]:
            pid = int(pid)
            lake = LakeTable(table_dir)
            chain = chains[pid]
            if ranges and any(
                not chain_may_match(table_dir, chain, c, lo, hi)
                for c, (lo, hi) in ranges.items()
            ):
                rows.append({"pid": pid, "dv": "", "n": 0})
                continue
            t = merge_chain_files(
                table_dir, chain, m, delete_files=dvs[pid],
                columns=pred_cols,
            )
            mask = pc.fill_null(predicate(t), False)
            n = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            if n == 0:
                rows.append({"pid": pid, "dv": "", "n": 0})
                continue
            keys = t.filter(mask).select(list(KEY_COLUMNS))
            rel = lake.write_delete_vector(keys, pid, epoch, hwms[pid], suffix=dv_sfx)
            rows.append({"pid": pid, "dv": rel, "n": int(n)})
        return pa.Table.from_pylist(rows)

    pids = sorted(chains)
    results = (
        rd.from_items(pids, override_num_blocks=len(pids))
        .map_batches(one, batch_size=1)
        .take_all()
    )
    partitions: dict[int, PartitionEntry] = {}
    touched = deleted = 0
    for r in results:
        prev = m.partitions[r["pid"]]
        if not r["dv"]:
            partitions[r["pid"]] = prev
            continue
        touched += 1
        deleted += r["n"]
        partitions[r["pid"]] = PartitionEntry(
            pid=prev.pid, files=list(prev.files), rows=prev.rows,
            hwm_seq=prev.hwm_seq, live_keys=-1, bytes=prev.bytes,
            delete_files=list(prev.delete_files) + [r["dv"]],
        )
    new_m = Manifest(
        epoch=epoch, num_partitions=m.num_partitions, schema=m.schema,
        partitions=partitions, parent_epoch=m.epoch, run_id=run_id,
        metrics={"dv_partitions": touched, "touched_rows": deleted},
        rename_history=m.rename_history,
    )
    table.commit(new_m)
    return new_m, deleted


def _reduce_source_by_key(source_ds, on_duplicate: str, num_buckets: int = 64):
    """One row per (repo, path) for a MERGE source.

    ``on_duplicate='error'`` (default, Delta-style MERGE semantics): raise a
    clear ValueError if any key appears more than once. ``'reduce'``: keep a
    deterministic winner per key — the lexicographically greatest
    (commit, content) row — documented, order-independent tiebreak.
    Single bucket shuffle either way; the dup check rides the same pass.
    """
    from cdm_data_loader_utils_ray.stages.keyed import _BUCKET, _add_bucket

    def bucket(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, ["repo", "path"], num_buckets)

    def reduce_group(df):
        order_cols = [c for c in ("commit", "content") if c in df.columns]
        df = df.sort_values(["repo", "path", *order_cols], kind="mergesort")
        dup = df.duplicated(subset=["repo", "path"], keep=False)
        if dup.any():
            if on_duplicate == "error":
                k = df.loc[dup, ["repo", "path"]].iloc[0]
                raise ValueError(
                    "merge_into: source has multiple rows for key "
                    f"({k['repo']!r}, {k['path']!r}); MERGE requires at most "
                    "one source row per key — pre-aggregate the source or "
                    "pass on_duplicate='reduce'"
                )
            df = df.drop_duplicates(subset=["repo", "path"], keep="last")
        return df.drop(columns=[_BUCKET])

    return (
        source_ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(reduce_group, batch_format="pandas")
    )


def merge_into(
    table: LakeTable,
    source_ds,
    when_matched: str = "update",
    when_not_matched: str | None = "insert",
    run_id: str = "merge",
    on_duplicate: str = "error",
    when_not_matched_by_source: str | None = None,
) -> Manifest:
    """Delta ``MERGE INTO`` analogue on the CDC key (reference
    ``spark_delta.py`` merge semantics): each source row either updates /
    deletes its matching key or inserts a new one.

    Composed from the engine's existing primitives rather than a second
    write path: source rows become synthetic change events with
    ``seq = global hwm + 1`` (every row exceeds all applied seqs, so LWW
    applies them; one row per key keeps per-key seqs unique) and run
    through :func:`pipelines.cdc.apply_epoch` — partition routing,
    validation, churn-proportional delta write, atomic manifest commit
    and idempotent resume come for free.

    * ``when_matched``: 'update' | 'delete' — op for rows whose key exists.
    * ``when_not_matched``: 'insert' keeps unmatched source rows (an
      upsert applies them identically); ``None`` drops them first via a
      keyed semi join against the current state's keys.
    * ``on_duplicate``: 'error' (default — Delta MERGE raises on multiple
      source rows per target key) | 'reduce' (keep one deterministic
      winner per key: lexicographically greatest (commit, content)).
    * ``when_not_matched_by_source``: ``None`` (default) leaves table keys
      absent from the source untouched; ``'delete'`` removes them (Delta's
      WHEN NOT MATCHED BY SOURCE THEN DELETE) — with the defaults for the
      other two clauses this makes MERGE a full sync: the table converges
      to exactly the source.  The stale keys come from one exact keyed
      anti join of the state's keys against the source's keys; all three
      branches produce DISJOINT key sets, so the shared seq stays unique
      per key.

    With ``when_matched='delete'`` and ``when_not_matched='insert'`` the
    source is split by key existence (semi/anti join vs current state):
    matched rows delete, unmatched rows insert — a uniform op stamp would
    wrongly delete nonexistent keys (r3 ADVICE fix).
    """
    from cdm_data_loader_utils_ray.pipelines.cdc import apply_epoch
    from cdm_data_loader_utils_ray.stages.keyed import anti_join_keys, semi_join_keys

    if when_matched not in ("update", "delete"):
        raise ValueError("when_matched must be 'update' or 'delete'")
    if when_not_matched not in ("insert", None):
        raise ValueError("when_not_matched must be 'insert' or None")
    if on_duplicate not in ("error", "reduce"):
        raise ValueError("on_duplicate must be 'error' or 'reduce'")
    if when_not_matched_by_source not in ("delete", None):
        raise ValueError("when_not_matched_by_source must be 'delete' or None")
    m = table.latest_manifest()
    if m is None:
        raise ValueError("merge_into requires a committed table")
    new_seq = max((p.hwm_seq for p in m.partitions.values()), default=0) + 1

    src = _reduce_source_by_key(source_ds, on_duplicate)

    def _state_keys():
        return table.read_state().map_batches(
            lambda b: b.select(["repo", "path"]), batch_format="pyarrow"
        )

    def to_events(op: str):
        def _f(batch: pa.Table) -> pa.Table:
            n = len(batch)

            def col(name, default=None):
                if name in batch.column_names:
                    c = batch[name]
                    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                return pa.array([default] * n, type=pa.string())

            return pa.table(
                {
                    "seq": pa.array([new_seq] * n, type=pa.int64()),
                    "op": pa.array([op] * n, type=pa.string()),
                    "repo": col("repo"),
                    "path": col("path"),
                    "commit": col("commit", "merge"),
                    "lang": col("lang"),
                    "content": col("content"),
                }
            )

        return _f

    keys = None
    if when_not_matched_by_source == "delete" or (
        when_matched == "delete" and when_not_matched == "insert"
    ):
        # branches share the source dedup shuffle and the lake key scan —
        # materialize both once (same convention as dedup_incremental)
        src = src.materialize()
        keys = _state_keys().materialize()

    if when_matched == "delete" and when_not_matched == "insert":
        # split: matched keys delete, unmatched keys insert (as upserts) —
        # a uniform op stamp would wrongly delete nonexistent keys
        matched = semi_join_keys(src, keys, ["repo", "path"])
        unmatched = anti_join_keys(src, keys, ["repo", "path"])
        events = matched.map_batches(to_events("delete"), batch_format="pyarrow").union(
            unmatched.map_batches(to_events("update"), batch_format="pyarrow")
        )
    else:
        if when_not_matched is None:
            # keep only matched keys: exact keyed semi join vs state keys
            src = semi_join_keys(src, keys if keys is not None else _state_keys(),
                                 ["repo", "path"])
        events = src.map_batches(to_events(when_matched), batch_format="pyarrow")

    if when_not_matched_by_source == "delete":
        src_keys = src.map_batches(
            lambda b: b.select(["repo", "path"]), batch_format="pyarrow"
        )
        stale = anti_join_keys(keys, src_keys, ["repo", "path"])
        events = events.union(
            stale.map_batches(to_events("delete"), batch_format="pyarrow")
        )
    return apply_epoch(table, events, run=None, audit=False)


_PROTECTED_COLUMNS = ("repo", "path", "seq", DELETED_COLUMN)


def alter_drop_column(table: LakeTable, column: str, run_id: str = "alter") -> Manifest:
    """``ALTER TABLE ... DROP COLUMN`` — METADATA-ONLY: the new manifest's
    schema simply omits the column; no data file is touched.  Readers
    project through the manifest schema (``align_to_schema`` drops columns
    the schema lacks), so the column disappears from every read while
    time-travel to pre-drop epochs still shows it.  Subsequent replays
    align incoming events to the narrowed schema (the dropped field is
    discarded on write).  Key/sequencing columns are protected.

    The column is also recorded in the ``dropped_columns`` table property:
    replays exclude it from schema evolution, so a feed still carrying the
    field cannot silently resurrect it (delete the property entry to
    re-admit the column as new data)."""
    if column in _PROTECTED_COLUMNS:
        raise ValueError(f"cannot drop engine column {column!r}")
    m = table.latest_manifest()
    if m is None:
        raise ValueError("no committed manifest to alter")
    if column not in m.schema.names:
        raise ValueError(f"column {column!r} not in table schema")
    schema = m.schema.remove(m.schema.get_field_index(column))
    out = Manifest(
        epoch=m.epoch + 1,
        num_partitions=m.num_partitions,
        schema=schema,
        partitions={
            pid: PartitionEntry.from_json(p.to_json())
            for pid, p in m.partitions.items()
        },
        parent_epoch=m.epoch,
        run_id=f"{run_id}-{uuid.uuid4().hex[:8]}",
        metrics={"dropped_column": column, "state_preserving_rewrite": True},
        # the dropped column's rename history entries are kept: a pre-rename
        # file's physical name must still resolve (to a now-absent logical
        # name, which align_to_schema then drops)
        rename_history=dict(m.rename_history),
    )
    # property BEFORE the commit: a crash in between leaves a listed-but-
    # still-present column (benign — replays keep it until a later drop
    # completes); the reverse order would leave a dropped column that the
    # next replay's schema evolution silently resurrects (reviewed bug)
    props = table.get_properties()
    dropped = list(props.get("dropped_columns", []))
    if column not in dropped:
        dropped.append(column)
    props["dropped_columns"] = dropped
    table.set_properties(props)
    table.commit(out)
    return out


def alter_rename_column(
    table: LakeTable, old: str, new: str, run_id: str = "alter"
) -> Manifest:
    """``ALTER TABLE ... RENAME COLUMN`` — METADATA-ONLY (Delta
    column-mapping analogue): the manifest schema carries the new name and
    ``rename_history[old] = new`` teaches every reader to rename the old
    physical name per file before alignment — existing data files are
    never rewritten.  Chained renames compose: an earlier ``a -> old``
    entry is rewritten to ``a -> new`` so files from BEFORE the first
    rename still resolve in one hop."""
    if not old or not new:
        raise ValueError("alter_rename_column: empty column name")
    if old in _PROTECTED_COLUMNS or new in _PROTECTED_COLUMNS:
        raise ValueError("cannot rename engine columns")
    m = table.latest_manifest()
    if m is None:
        raise ValueError("no committed manifest to alter")
    if old not in m.schema.names:
        raise ValueError(f"column {old!r} not in table schema")
    if new in m.schema.names:
        raise ValueError(f"column {new!r} already exists")
    if new in m.rename_history:
        # 'new' is a RETIRED physical name: files written after this
        # rename would store a physical column the per-file map remaps
        # AGAIN (a -> b applied to a post-rename file's own 'a'), yielding
        # duplicate columns and a failed read (reviewed bug)
        raise ValueError(
            f"column name {new!r} was previously renamed away and its "
            "physical name is still mapped — pick a fresh name"
        )
    if new in set(m.rename_history.values()):
        # 'new' is a retired logical TARGET (e.g. a->b then DROP b leaves
        # the a->b mapping so pre-rename files still resolve): admitting
        # c->b would make TWO physical names (a and c) map to one logical
        # name, and any file carrying both renames to duplicate columns —
        # merge_chain_files then crashes on every read/compact (r4 advice)
        raise ValueError(
            f"column name {new!r} is still a rename target of an older "
            "physical column — pick a fresh name"
        )
    i = m.schema.get_field_index(old)
    f = m.schema.field(i)
    schema = m.schema.set(i, pa.field(new, f.type, f.nullable))
    hist = {
        phys: (new if logical == old else logical)
        for phys, logical in m.rename_history.items()
    }
    hist[old] = new
    out = Manifest(
        epoch=m.epoch + 1,
        num_partitions=m.num_partitions,
        schema=schema,
        partitions={
            pid: PartitionEntry.from_json(p.to_json())
            for pid, p in m.partitions.items()
        },
        parent_epoch=m.epoch,
        run_id=f"{run_id}-{uuid.uuid4().hex[:8]}",
        metrics={"renamed_column": [old, new], "state_preserving_rewrite": True},
        rename_history=hist,
    )
    table.commit(out)
    return out
