"""expire_snapshots: manifest-log retention (Iceberg analogue) — keeps
the newest window + tagged epochs + in-flight staging, drops the rest;
reads inside the window and vacuum stay correct, reads below it raise."""

import os

import pytest

from cdm_data_loader_utils_ray.pipelines.maintenance import (
    expire_snapshots,
    restore,
)
from cdm_data_loader_utils_ray.sinks.lake import LakeTable


@pytest.fixture()
def multi_epoch_lake(ray_session, tmp_path):
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "ev.parquet")
    d = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=80, num_events=900, seed=13))
    run_replay(ev, d, num_partitions=4, epochs=6)
    return LakeTable(d), ev


def _epochs_on_disk(table):
    return sorted(
        int(f[len("manifest-"):-len(".json")])
        for f in os.listdir(table.manifest_dir)
        if f.startswith("manifest-")
    )


def test_expire_keeps_window_and_tags(multi_epoch_lake):
    table, _ = multi_epoch_lake
    all_epochs = _epochs_on_disk(table)
    assert len(all_epochs) >= 6
    table.set_tag("pinned", all_epochs[0])  # tag the OLDEST epoch

    expired = expire_snapshots(table, keep_epochs=2)
    left = _epochs_on_disk(table)
    assert left == sorted(set(all_epochs[-2:]) | {all_epochs[0]})
    assert sorted(expired) == sorted(set(all_epochs) - set(left))

    # reads at LATEST and at the tagged epoch still work
    assert table.read_state().count() > 0
    old = table.read_state(manifest=table.read_manifest(all_epochs[0]))
    assert old.count() >= 0
    # time travel to an expired epoch raises (documented retention trade)
    with pytest.raises(FileNotFoundError):
        table.read_manifest(expired[0])
    # restore to an expired epoch fails, to a kept one succeeds
    with pytest.raises((FileNotFoundError, ValueError)):
        restore(table, expired[0])
    restore(table, all_epochs[0])
    assert table.read_state().count() >= 0
    # vacuum still runs clean after expiry
    table.vacuum(keep_epochs=2)
    assert table.read_state().count() > 0


def test_expire_validates_and_noop_on_empty(tmp_path):
    t = LakeTable(os.path.join(str(tmp_path), "empty"))
    assert expire_snapshots(t, keep_epochs=3) == []
    with pytest.raises(ValueError):
        expire_snapshots(t, keep_epochs=0)


def test_expire_object_store_backend(ray_session, tmp_path):
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "ev.parquet")
    d = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=40, num_events=400, seed=5))
    LakeTable.create_object_store(d)
    run_replay(ev, d, num_partitions=2, epochs=4)
    table = LakeTable(d)
    before = _epochs_on_disk(table)
    expired = expire_snapshots(table, keep_epochs=1)
    assert expired and table.latest_epoch() == max(before)
    assert table.read_state().count() > 0
