"""Snapshot tags (sinks/lake.py): named epoch refs that lease vacuum
retention — the tagged epoch stays readable across vacuum(keep_epochs=1),
and dropping the tag releases the files."""

import pyarrow.parquet as pq
import pytest

from cdm_data_loader_utils_ray.pipelines.cdc import read_final_state_arrow, run_replay
from cdm_data_loader_utils_ray.sinks.lake import LakeTable
from cdm_data_loader_utils_ray.synth import make_events


def _lake(tmp_path):
    ev = make_events(num_keys=120, num_events=1200, seed=29)
    ev_path = str(tmp_path / "ev.parquet")
    pq.write_table(ev, ev_path)
    lake_dir = str(tmp_path / "lake")
    run_replay(ev_path, lake_dir, num_partitions=4, max_seq=600)
    return ev_path, LakeTable(lake_dir)


def test_tagged_epoch_survives_vacuum(ray_session, tmp_path):
    ev_path, t = _lake(tmp_path)
    e1 = t.latest_epoch()
    snap = read_final_state_arrow(t)
    assert t.set_tag("baseline") == e1
    assert t.tags() == {"baseline": e1}

    run_replay(ev_path, t.dir, num_partitions=4)  # later epochs
    assert t.latest_epoch() > e1
    # a rewrite makes e1's chain files unreferenced by LATEST — only the
    # tag lease keeps them
    from cdm_data_loader_utils_ray.pipelines.maintenance import compact

    compact(t)
    t.vacuum(keep_epochs=1)  # may reclaim untagged intermediates only

    # tagged snapshot still fully readable and byte-identical
    e = t.resolve_tag("baseline")
    m = t.read_manifest(e)
    again = t.read_state_arrow(manifest=m)
    key = [("repo", "ascending"), ("path", "ascending")]
    # the two read paths differ only in nullability annotation — cast
    assert again.sort_by(key).cast(snap.schema).equals(snap.sort_by(key))

    # dropping the tag releases the lease: vacuum now reclaims e1's files
    t.delete_tag("baseline")
    removed = t.vacuum(keep_epochs=1)
    assert removed, "expected the untagged old epoch's files to be reclaimed"
    with pytest.raises(Exception):
        t.read_state_arrow(manifest=m)  # files gone


def test_tag_validation(ray_session, tmp_path):
    _, t = _lake(tmp_path)
    latest = t.latest_epoch()
    with pytest.raises(ValueError):
        t.set_tag("future", latest + 5)
    with pytest.raises(KeyError):
        t.resolve_tag("nope")
    t.delete_tag("nope")  # missing delete is a no-op
    empty = LakeTable(str(tmp_path / "empty"))
    with pytest.raises(ValueError):
        empty.set_tag("x")
