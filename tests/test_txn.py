"""Multi-table atomic transactions: stage -> journal -> publish -> clean,
with roll-forward recovery from every crash point."""

import json
import os
import uuid

import pytest

from cdm_data_loader_utils_ray.pipelines.txn import (
    commit_transaction,
    recover_transactions,
)
from cdm_data_loader_utils_ray.sinks.lake import (
    LakeTable,
    Manifest,
    PartitionEntry,
    _atomic_write,
)


def _next_manifest(table: LakeTable, run_id: str | None = None) -> Manifest:
    """Metadata-only next-epoch manifest (same file set — the restore()
    pattern), enough to exercise the commit protocol."""
    m = table.latest_manifest()
    return Manifest(
        epoch=m.epoch + 1,
        num_partitions=m.num_partitions,
        schema=m.schema,
        partitions={
            pid: PartitionEntry.from_json(p.to_json())
            for pid, p in m.partitions.items()
        },
        parent_epoch=m.epoch,
        run_id=run_id or f"txn-test-{uuid.uuid4().hex[:6]}",
        metrics={},
        rename_history=dict(m.rename_history),
    )


@pytest.fixture()
def two_lakes(ray_session, tmp_path):
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    tables = []
    for i in (1, 2):
        ev = os.path.join(str(tmp_path), f"ev{i}.parquet")
        lake = os.path.join(str(tmp_path), f"lake{i}")
        write_events(ev, make_events(num_keys=30, num_events=200, seed=i))
        run_replay(ev, lake, num_partitions=2)
        tables.append(LakeTable(lake))
    return tables, os.path.join(str(tmp_path), "_txn")


def test_happy_path_commits_both(two_lakes):
    (a, b), txn_dir = two_lakes
    ea, eb = a.latest_epoch(), b.latest_epoch()
    commit_transaction([(a, _next_manifest(a)), (b, _next_manifest(b))], txn_dir)
    assert a.latest_epoch() == ea + 1
    assert b.latest_epoch() == eb + 1
    assert [f for f in os.listdir(txn_dir) if f.startswith("txn-")] == []


def test_crash_between_publishes_rolls_forward(two_lakes):
    (a, b), txn_dir = two_lakes
    ea, eb = a.latest_epoch(), b.latest_epoch()
    ma, mb = _next_manifest(a), _next_manifest(b)
    # replicate the protocol up to the crash: stage both, journal, publish
    # only table a, then "crash"
    a.stage_manifest(ma)
    b.stage_manifest(mb)
    os.makedirs(txn_dir, exist_ok=True)
    _atomic_write(
        os.path.join(txn_dir, "txn-deadbeef.json"),
        json.dumps(
            {
                "id": "deadbeef",
                "tables": [
                    {"dir": os.path.abspath(a.dir), "epoch": ma.epoch},
                    {"dir": os.path.abspath(b.dir), "epoch": mb.epoch},
                ],
            }
        ),
    )
    a.publish_epoch(ma.epoch)
    assert a.latest_epoch() == ea + 1
    assert b.latest_epoch() == eb  # not yet visible

    recovered = recover_transactions(txn_dir)
    assert recovered == ["deadbeef"]
    assert b.latest_epoch() == eb + 1
    assert a.latest_epoch() == ea + 1  # idempotent re-publish
    # second recovery is a no-op
    assert recover_transactions(txn_dir) == []


def test_crash_before_journal_never_happened(two_lakes):
    (a, b), txn_dir = two_lakes
    ea = a.latest_epoch()
    ma = _next_manifest(a)
    a.stage_manifest(ma)  # staged orphan; no journal; "crash"
    assert recover_transactions(txn_dir) == []
    assert a.latest_epoch() == ea  # nothing visible
    # a later NORMAL commit of the same epoch number overwrites the orphan
    m2 = _next_manifest(a, run_id="fresh-run")
    assert m2.epoch == ma.epoch
    a.commit(m2)
    assert a.latest_epoch() == ea + 1
    assert a.latest_manifest().run_id == "fresh-run"


def test_validation_and_unstaged_publish(two_lakes):
    (a, b), txn_dir = two_lakes
    with pytest.raises(ValueError):
        commit_transaction([], txn_dir)
    with pytest.raises(ValueError):
        commit_transaction([(a, _next_manifest(a)), (a, _next_manifest(a))], txn_dir)
    with pytest.raises(ValueError):
        a.publish_epoch(a.latest_epoch() + 17)


def test_catalog_transaction_and_recovery_on_open(two_lakes, tmp_path):
    """Catalog wires the protocol: transaction() journals under
    <root>/_txn, and opening a Catalog rolls crashed transactions
    forward."""
    from cdm_data_loader_utils_ray.sinks.lake import Catalog

    (a, b), _ = two_lakes
    root = os.path.join(str(tmp_path), "cat")
    cat = Catalog(root)
    ea, eb = a.latest_epoch(), b.latest_epoch()
    cat.transaction([(a, _next_manifest(a)), (b, _next_manifest(b))])
    assert (a.latest_epoch(), b.latest_epoch()) == (ea + 1, eb + 1)

    # crashed txn: stage + journal only; a fresh Catalog open recovers it
    ma, mb = _next_manifest(a), _next_manifest(b)
    a.stage_manifest(ma)
    b.stage_manifest(mb)
    _atomic_write(
        os.path.join(cat.txn_dir, "txn-cafe.json"),
        json.dumps({"id": "cafe", "tables": [
            {"dir": os.path.abspath(a.dir), "epoch": ma.epoch},
            {"dir": os.path.abspath(b.dir), "epoch": mb.epoch},
        ]}),
    )
    Catalog(root)  # open -> recover
    assert (a.latest_epoch(), b.latest_epoch()) == (ea + 2, eb + 2)
    assert [f for f in os.listdir(cat.txn_dir) if f.startswith("txn-")] == []


def test_malformed_journal_shapes_never_raise(tmp_path):
    """r4 advice: a journal that PARSES as JSON but has the wrong shape
    (non-dict, missing keys, non-dict entries) used to raise KeyError/
    TypeError out of recovery — bricking Catalog open.  Malformed journals
    must be skipped, left on disk as evidence."""
    import json as _json

    from cdm_data_loader_utils_ray.pipelines.txn import recover_transactions

    d = str(tmp_path)
    shapes = [
        [1, 2, 3],                       # non-dict
        {"id": "x"},                     # missing tables
        {"tables": []},                  # missing id
        {"id": "x", "tables": "nope"},   # tables not a list
        {"id": "x", "tables": [42]},     # entry not a dict
        {"id": "x", "tables": [{"dir": "/nowhere"}]},  # entry missing epoch
        {"id": 7, "tables": []},         # id wrong type
    ]
    for i, j in enumerate(shapes):
        with open(os.path.join(d, f"txn-{i}.json"), "w") as f:
            _json.dump(j, f)
    assert recover_transactions(d) == []
    # evidence retained
    assert len([f for f in os.listdir(d) if f.startswith("txn-")]) == len(shapes)


def test_snapshot_view_consistent_under_hammer(two_lakes):
    """A writer thread streams lockstep transactions (both tables stamp
    the same version); every snapshot_view cut must show EQUAL versions —
    a mixed cut is the isolation hole the validation loop closes."""
    import threading

    from cdm_data_loader_utils_ray.pipelines.txn import snapshot_view

    (a, b), txn_dir = two_lakes
    stop = threading.Event()
    errs = []

    def writer():
        v = 0
        try:
            while not stop.is_set():
                v += 1
                ma, mb = _next_manifest(a), _next_manifest(b)
                ma.metrics["v"] = v
                mb.metrics["v"] = v
                commit_transaction([(a, ma), (b, mb)], txn_dir)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t = threading.Thread(target=writer)
    t.start()
    try:
        mixed = 0
        for _ in range(60):
            cut = snapshot_view([a.dir, b.dir], txn_dir, max_retries=200)
            va = cut[a.dir].metrics.get("v", 0)
            vb = cut[b.dir].metrics.get("v", 0)
            if va != vb:
                mixed += 1
    finally:
        stop.set()
        t.join(timeout=30)
    assert not errs
    assert mixed == 0


def test_snapshot_view_rolls_forward_stalled_txn(two_lakes):
    """A journaled-but-unpublished (crashed) transaction: snapshot_view
    completes the roll-forward itself and returns the POST-txn cut."""
    from cdm_data_loader_utils_ray.pipelines.txn import snapshot_view

    (a, b), txn_dir = two_lakes
    ma, mb = _next_manifest(a), _next_manifest(b)
    ma.metrics["v"] = 7
    mb.metrics["v"] = 7
    a.stage_manifest(ma)
    b.stage_manifest(mb)
    os.makedirs(txn_dir, exist_ok=True)
    _atomic_write(
        os.path.join(txn_dir, "txn-stall.json"),
        json.dumps({
            "id": "stall",
            "tables": [{"dir": a.dir, "epoch": ma.epoch},
                       {"dir": b.dir, "epoch": mb.epoch}],
        }),
    )
    cut = snapshot_view([a.dir, b.dir], txn_dir)
    assert cut[a.dir].metrics["v"] == 7 and cut[b.dir].metrics["v"] == 7
    assert not [f for f in os.listdir(txn_dir) if f.startswith("txn-")]
