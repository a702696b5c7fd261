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
modulo roll-forward).  What it does NOT give: cross-table snapshot
ISOLATION — a reader racing the publish loop can observe table A's new
epoch next to table B's old one until recovery/publish finishes; each
table's own read remains consistent (single-pointer resolution).  This is
the documented trade of pointer-per-table layouts.
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
    os.unlink(journal)
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
