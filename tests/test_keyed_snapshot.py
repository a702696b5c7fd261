"""Distributed keyed ops (LWW reduce, outer diff, anti join) vs pandas/duckdb."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.pipelines.snapshot import (
    diff_snapshots,
    new_keys,
    removed_keys,
    snapshot_hashes,
)
from cdm_data_loader_utils_ray.stages.keyed import anti_join_keys, lww_latest, outer_diff
from cdm_data_loader_utils_ray.synth import make_events, make_repo_files


@pytest.fixture(scope="module")
def events():
    return make_events(num_keys=200, num_events=2000, seed=13)


def test_lww_latest_matches_pandas(events):
    ds = rd.from_arrow(events)
    got = (
        lww_latest(ds, ["repo", "path"], "seq", num_buckets=16)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    exp = (
        events.to_pandas()
        .sort_values("seq", kind="stable")
        .drop_duplicates(subset=["repo", "path"], keep="last")
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert list(got["seq"]) == list(exp["seq"])
    assert list(got["commit"]) == list(exp["commit"])


def test_outer_diff_classification():
    old = pa.table({"k": ["a", "b", "c"], "h": ["1", "2", "3"]})
    new = pa.table({"k": ["b", "c", "d"], "h": ["2", "9", "4"]})
    out = (
        outer_diff(rd.from_arrow(old), rd.from_arrow(new), ["k"], "h", num_buckets=4)
        .to_pandas()
        .set_index("k")["change_type"]
        .to_dict()
    )
    assert out == {"a": "deleted", "b": "unchanged", "c": "updated", "d": "new"}


def test_anti_join(events):
    df = events.to_pandas()
    left = pa.table({"k": ["a", "b", "c"], "v": [1, 2, 3]})
    right = pa.table({"k": ["b"]})
    out = anti_join_keys(rd.from_arrow(left), rd.from_arrow(right), ["k"]).to_pandas()
    assert sorted(out["k"]) == ["a", "c"]


def test_snapshot_diff_roundtrip():
    """Evolve a base table, diff the snapshots, check the change counts
    against a direct pandas comparison."""
    base = make_repo_files(num_keys=150, seed=21).to_pandas()
    evolved = base.copy()
    evolved = evolved.iloc[5:]  # 5 deletions
    evolved.loc[evolved.index[:10], "content"] = "CHANGED " + evolved.iloc[:10]["content"]
    extra = base.iloc[:3].copy()
    extra["repo"] = "org-new/repo-new"
    evolved = pd.concat([evolved, extra])
    old_ds = snapshot_hashes(rd.from_arrow(pa.Table.from_pandas(base, preserve_index=False)), tag="t0")
    new_ds = snapshot_hashes(rd.from_arrow(pa.Table.from_pandas(evolved, preserve_index=False)), tag="t1")
    diff = diff_snapshots(old_ds, new_ds).to_pandas()
    counts = diff["change_type"].value_counts().to_dict()
    assert counts["deleted"] == 5
    assert counts["updated"] == 10
    assert counts["new"] == 3
    assert counts["unchanged"] == len(base) - 15
    nk = new_keys(old_ds, new_ds).to_pandas()
    rk = removed_keys(old_ds, new_ds).to_pandas()
    assert len(nk) == 3 and len(rk) == 5
