"""Multi-table ATOMIC transactions: one journaled commit spanning several
lake tables (a capability neither Delta nor Iceberg ships per-table logs
for — their transaction scope ends at the table boundary; the reference's
Spark jobs commit tables independently, ``utils/spark_delta.py``).

Protocol (roll-forward, journal-gated):

1. **Stage** every table's manifest (``LakeTable.stage_manifest`` — the
   durable manifest file exists, LATEST still points at the old epoch;
   nothing is visible).
2. **Journal**: atomically write ``txn-<id>.json`` listing every
   (table_dir, epoch) pair.  The journal is the commit point: it is
   written only after ALL manifests are durably staged, so its existence
   proves the whole flip set is executable.
3. **Publish** each table's LATEST (atomic pointer rename each,
   idempotent via ``publish_epoch``).
4. **Delete** the journal.

Crash semantics:

* before the journal exists → nothing published; staged manifests are
  harmless orphans (the next commit of that epoch overwrites them; LATEST
  never pointed at them).  The transaction simply did not happen.
* after the journal exists → :func:`recover_transactions` (call it on
  process start, or lazily before reads that need cross-table
  consistency) re-publishes every listed epoch — idempotent, so a crash
  mid-recovery just retries — then removes the journal.  The transaction
  always completes.

What this gives: ATOMICITY + DURABILITY across tables (all-or-nothing
modulo roll-forward).  A bare racing reader can still observe table A's
new epoch next to table B's old one mid-publish (each table's own read
stays consistent — single-pointer resolution); readers that need a
transactionally consistent CUT across tables use :func:`snapshot_view`,
which validates a quiet window (no journal + unchanged pointers on
re-read) and retries through racing commits.
"""

from __future__ import annotations

import json
import os
import uuid

from cdm_data_loader_utils_ray.sinks.lake import LakeTable, Manifest, _atomic_write


def commit_transaction(
    commits: list[tuple[LakeTable, "Manifest"]], txn_dir: str
) -> str:
    """Atomically commit every (table, manifest) pair; returns the txn id.

    ``txn_dir`` is the journal directory (e.g. ``<catalog>/_txn``) — it
    must live on the same durable storage as the tables.  Duplicate tables
    in one transaction are rejected (two epochs for one pointer cannot be
    atomic)."""
    dirs = [os.path.abspath(t.dir) for t, _ in commits]
    if len(set(dirs)) != len(dirs):
        raise ValueError("commit_transaction: duplicate table in transaction")
    if not commits:
        raise ValueError("commit_transaction: empty transaction")
    os.makedirs(txn_dir, exist_ok=True)

    staged: list[tuple[LakeTable, int]] = []
    for table, manifest in commits:
        table.stage_manifest(manifest)  # replay no-op still publishes below
        staged.append((table, manifest.epoch))

    txn_id = uuid.uuid4().hex[:12]
    journal = os.path.join(txn_dir, f"txn-{txn_id}.json")
    _atomic_write(
        journal,
        json.dumps(
            {
                "id": txn_id,
                "tables": [
                    {"dir": os.path.abspath(t.dir), "epoch": e} for t, e in staged
                ],
            },
            indent=1,
        ),
    )
    for table, epoch in staged:
        table.publish_epoch(epoch)
    try:
        os.unlink(journal)
    except FileNotFoundError:
        # a concurrent recover_transactions (e.g. a snapshot_view reader)
        # rolled our journal forward and cleaned it first — the publishes
        # above were idempotent no-ops; the transaction still committed
        # exactly once
        pass
    return txn_id


def recover_transactions(txn_dir: str) -> list[str]:
    """Roll forward every journaled transaction (publish all listed
    epochs, then drop the journal).  Idempotent — publish_epoch ignores
    pointers already at/past the target — so call it freely on startup.
    Returns the recovered txn ids."""
    if not os.path.isdir(txn_dir):
        return []
    done = []
    for f in sorted(os.listdir(txn_dir)):
        if not (f.startswith("txn-") and f.endswith(".json")):
            continue
        path = os.path.join(txn_dir, f)
        try:
            with open(path) as fh:
                j = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue  # unreadable journal: skip, never brick the catalog
        # validate the SHAPE before touching any table: a journal that
        # parses as JSON but is not {id, tables: [{dir, epoch}, ...]}
        # would raise KeyError/TypeError out of Catalog.__init__ —
        # recreating the brick-on-open failure (r4 advice).  Malformed
        # journals stay on disk as evidence, like unreadable ones.
        if not (
            isinstance(j, dict)
            and isinstance(j.get("id"), str)
            and isinstance(j.get("tables"), list)
            and all(
                isinstance(e, dict) and "dir" in e and "epoch" in e
                for e in j["tables"]
            )
        ):
            continue
        try:
            for entry in j["tables"]:
                LakeTable(entry["dir"]).publish_epoch(int(entry["epoch"]))
        except (TypeError, ValueError, OSError):
            # a participating table's manifest is gone (table deleted /
            # moved): roll-forward impossible — leave the journal on disk
            # as evidence and keep the catalog usable (reviewed: raising
            # here made Catalog.__init__ permanently un-openable)
            continue
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass  # concurrent recovery already cleaned it
        done.append(j["id"])
    return done


def _journals_present(txn_dir: str) -> bool:
    if not os.path.isdir(txn_dir):
        return False
    return any(
        f.startswith("txn-") and f.endswith(".json") for f in os.listdir(txn_dir)
    )


def snapshot_view(
    table_dirs: list[str], txn_dir: str, max_retries: int = 25
) -> dict[str, "Manifest"]:
    """Cross-table SNAPSHOT-ISOLATED read: a ``{table_dir: Manifest}`` cut
    that no committed transaction straddles — closing the read-side half
    of the documented pointer-per-table trade (writers already get
    atomicity from the journal protocol; this gives readers a consistent
    view without any new write-path state).

    Optimistic validation: roll pending journals forward, read every
    LATEST, then confirm (a) no journal exists and (b) a second read of
    every LATEST is unchanged.  Each LATEST read is atomic, so a
    transaction completing anywhere inside the window moves some pointer
    (caught by the re-read) or leaves its journal (caught by the journal
    check); a writer that has only STAGED is invisible by design.
    Retries until a quiet window; raises after ``max_retries`` (a
    pathological steady stream of commits — back off at the caller).
    """
    tables = [LakeTable(d) for d in table_dirs]
    for _ in range(max_retries):
        recover_transactions(txn_dir)
        first = [t.latest_epoch() for t in tables]
        if _journals_present(txn_dir):
            continue  # a commit point landed mid-read: retry
        second = [t.latest_epoch() for t in tables]
        if first != second or _journals_present(txn_dir):
            continue
        return {
            t.dir: t.read_manifest(e)
            for t, e in zip(tables, second)
            if e is not None
        }
    raise RuntimeError(
        f"snapshot_view: no quiet window in {max_retries} attempts "
        "(continuous concurrent commits)"
    )
