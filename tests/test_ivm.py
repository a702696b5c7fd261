"""Incremental view maintenance (pipelines/ivm.py): the materialized
aggregate must equal a full recompute of the same GROUP BY over the lake's
current state after ANY history — inserts, updates that MOVE a row between
groups, deletes, compaction between refreshes, and no-op refreshes."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
from cdm_data_loader_utils_ray.pipelines.ivm import MaterializedAggregate
from cdm_data_loader_utils_ray.sinks.lake import LakeTable
from cdm_data_loader_utils_ray.synth import make_events, write_events


def _make_derive():
    # nested so cloudpickle ships it BY VALUE (test modules aren't
    # importable on workers — same worker-import contract as the package)
    def derive(batch: pa.Table) -> pa.Table:
        # group = content length mod 4 (moves when content changes)
        return pa.table(
            {
                "grp": pc.cast(
                    pc.bit_wise_and(pc.utf8_length(batch["content"]), 3), pa.int64()
                ),
                "sum_seq": batch["seq"].cast(pa.int64()),
            }
        )

    return derive


_derive = _make_derive()


def _full_recompute(lake: LakeTable) -> pd.DataFrame:
    state = lake.read_state_arrow()
    d = _derive(state).to_pandas()
    out = d.groupby("grp", as_index=False).agg(
        sum_seq=("sum_seq", "sum"), n_keys=("sum_seq", "size")
    )
    return out.sort_values("grp").reset_index(drop=True)


def _read_agg(magg: MaterializedAggregate) -> pd.DataFrame:
    t = magg.read().to_pandas()
    return (
        t[["grp", "sum_seq", "n_keys"]]
        .astype({"grp": "int64", "sum_seq": "int64", "n_keys": "int64"})
        .sort_values("grp")
        .reset_index(drop=True)
    )


def _magg(tmp, lake_dir) -> MaterializedAggregate:
    return MaterializedAggregate(
        lake_dir,
        os.path.join(tmp, "agg"),
        key_columns=["repo", "path"],
        group_columns=["grp"],
        value_columns=["sum_seq"],
        derive=_derive,
    )


@pytest.fixture()
def split_events(tmp_path):
    ev = make_events(num_keys=400, num_events=4000, seed=7)
    seqs = ev["seq"].to_numpy()
    mid = int(seqs.max() * 2 // 3)
    early = ev.filter(pc.less_equal(ev["seq"], mid))
    late = ev.filter(pc.greater(ev["seq"], mid))
    p_early = str(tmp_path / "early.parquet")
    p_late = str(tmp_path / "late.parquet")
    write_events(p_early, early)
    write_events(p_late, late)
    return str(tmp_path), p_early, p_late


def test_incremental_equals_recompute(ray_session, split_events):
    tmp, early, late = split_events
    lake_dir = os.path.join(tmp, "lake")
    run_replay(early, lake_dir, num_partitions=8)
    magg = _magg(tmp, lake_dir)
    m1 = magg.refresh()
    assert m1["refreshed"] and m1["from_epoch"] is None
    pd.testing.assert_frame_equal(_read_agg(magg), _full_recompute(LakeTable(lake_dir)))

    run_replay(late, lake_dir, num_partitions=8)
    m2 = magg.refresh()
    assert m2["refreshed"] and m2["from_epoch"] == m1["to_epoch"]
    pd.testing.assert_frame_equal(_read_agg(magg), _full_recompute(LakeTable(lake_dir)))

    # no-op when current
    m3 = magg.refresh()
    assert not m3["refreshed"]


def test_survives_compaction_between_refreshes(ray_session, split_events):
    tmp, early, late = split_events
    lake_dir = os.path.join(tmp, "lake")
    run_replay(early, lake_dir, num_partitions=8)
    magg = _magg(tmp, lake_dir)
    magg.refresh()

    run_replay(late, lake_dir, num_partitions=8)
    from cdm_data_loader_utils_ray.pipelines.maintenance import compact

    compact(LakeTable(lake_dir))
    m = magg.refresh()
    assert m["refreshed"]
    pd.testing.assert_frame_equal(_read_agg(magg), _full_recompute(LakeTable(lake_dir)))

    # compaction-only epoch afterwards: state unchanged, refresh is a pure
    # epoch catch-up whose fold reproduces the same view
    compact(LakeTable(lake_dir))
    magg.refresh()
    pd.testing.assert_frame_equal(_read_agg(magg), _full_recompute(LakeTable(lake_dir)))


def test_deletes_and_group_moves(ray_session, tmp_path):
    """Hand-built histories: an update that moves a key between groups must
    subtract from the old group and add to the new one; a delete must
    decrement; a group whose last key leaves must vanish from the view."""
    sha = "a" * 40
    rows1 = pa.table(
        {
            "seq": pa.array([1, 2, 3], pa.int64()),
            "op": ["insert", "insert", "insert"],
            "repo": ["r", "r", "r"],
            "path": ["a", "b", "c"],
            "commit": [sha, sha, sha],
            "lang": ["x", "x", "x"],
            "content": ["1", "22", "333"],  # groups 1, 2, 3
        }
    )
    rows2 = pa.table(
        {
            "seq": pa.array([4, 5], pa.int64()),
            "op": ["update", "delete"],
            "repo": ["r", "r"],
            "path": ["a", "c"],
            "commit": [sha, sha],
            "lang": ["x", "x"],
            "content": ["4444", None],  # 'a' moves group 1 -> 0; 'c' deleted
        }
    )
    import pyarrow.parquet as pq

    p1, p2 = str(tmp_path / "e1.parquet"), str(tmp_path / "e2.parquet")
    pq.write_table(rows1, p1)
    pq.write_table(rows2, p2)
    lake_dir = str(tmp_path / "lake")
    run_replay(p1, lake_dir, num_partitions=4)
    magg = _magg(str(tmp_path), lake_dir)
    magg.refresh()
    got1 = _read_agg(magg)
    assert got1.to_dict("list") == {
        "grp": [1, 2, 3], "sum_seq": [1, 2, 3], "n_keys": [1, 1, 1]
    }

    run_replay(p2, lake_dir, num_partitions=4)
    magg.refresh()
    got2 = _read_agg(magg)
    # 'a': group 0 with seq 4; 'b': unchanged; 'c': gone (group 3 vanishes)
    assert got2.to_dict("list") == {
        "grp": [0, 2], "sum_seq": [4, 2], "n_keys": [1, 1]
    }
    pd.testing.assert_frame_equal(got2, _full_recompute(LakeTable(lake_dir)))
