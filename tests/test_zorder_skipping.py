"""Z-order compaction + single-file row-group data skipping:

* ``stages/partition.zorder_key`` clusters 2-D locality (the point of the
  Morton curve);
* ``compact(zorder_by=..., row_group_size=...)`` tightens row-group stats
  so a post-compaction ``read_state(column_range=...)`` prunes row groups
  on BOTH columns (``sinks/lake.select_row_groups``);
* pruning must stay disabled on multi-file chains — dropping an
  out-of-range WINNER there would resurrect an in-range loser."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from cdm_data_loader_utils_ray.pipelines.maintenance import compact
from cdm_data_loader_utils_ray.sinks.lake import (
    LakeTable,
    Manifest,
    PartitionEntry,
    select_row_groups,
)
from cdm_data_loader_utils_ray.stages.partition import zorder_key


def _grid_table(n=4096, seed=3) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "repo": pa.array(["r"] * n),
            "path": pa.array([f"p{i:05d}" for i in range(n)]),
            "seq": pa.array(np.arange(1, n + 1), pa.int64()),
            "x": pa.array(rng.integers(0, 100, n), pa.int64()),
            "y": pa.array(rng.integers(0, 100, n), pa.int64()),
        }
    )


def _mini_lake(tmp_path, t: pa.Table) -> LakeTable:
    lake = LakeTable(str(tmp_path / "zlake"))
    entry = lake.write_partition(t, 0, 1)
    lake.commit(
        Manifest(
            epoch=1,
            num_partitions=1,
            schema=t.schema,
            run_id="z",
            partitions={0: entry},
        )
    )
    return lake


def _chunk_area(x: np.ndarray, y: np.ndarray, chunks: int = 16) -> float:
    """Sum of bounding-box areas over contiguous chunks — small when the
    physical order clusters 2-D locality."""
    total = 0.0
    for c in np.array_split(np.arange(len(x)), chunks):
        total += float((x[c].max() - x[c].min()) * (y[c].max() - y[c].min()))
    return total


def test_zorder_key_clusters_locality():
    t = _grid_table()
    z = zorder_key(t, ["x", "y"])
    order = np.argsort(z, kind="stable")
    x = t["x"].to_numpy()
    y = t["y"].to_numpy()
    clustered = _chunk_area(x[order], y[order])
    unsorted = _chunk_area(x, y)
    assert clustered < unsorted / 4  # dramatic, not marginal


def test_zorder_compact_prunes_both_columns(ray_session, tmp_path):
    t = _grid_table()
    lake = _mini_lake(tmp_path, t)
    compact(lake, zorder_by=["x", "y"], row_group_size=256)

    m = lake.latest_manifest()
    chain = next(iter(m.partitions.values())).files
    assert len(chain) == 1
    md = pq.ParquetFile(lake.abspath(chain[0])).metadata
    assert md.num_row_groups >= 8

    ranges = {"x": (10, 20), "y": (30, 40)}
    keep = select_row_groups(md, ranges)
    # a ~1% box must not touch most groups once z-ordered
    assert len(keep) < md.num_row_groups / 2

    got = (
        lake.read_state(column_range=ranges)
        .to_pandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    exp = (
        t.to_pandas()
        .query("10 <= x <= 20 and 30 <= y <= 40")
        .sort_values("path")
        .reset_index(drop=True)
    )
    assert got[["path", "x", "y"]].equals(exp[["path", "x", "y"]])

    # versus a 1-D sort on x: the y-range prunes (almost) nothing
    lake2 = _mini_lake(tmp_path / "b", t)
    compact(lake2, sort_by="x", row_group_size=256)
    md2 = pq.ParquetFile(
        lake2.abspath(next(iter(lake2.latest_manifest().partitions.values())).files[0])
    ).metadata
    keep_y_zorder = select_row_groups(md, {"y": (30, 40)})
    keep_y_sorted_x = select_row_groups(md2, {"y": (30, 40)})
    assert len(keep_y_zorder) < len(keep_y_sorted_x)


def test_multi_file_chain_never_rowgroup_prunes(ray_session, tmp_path):
    """Key p1's WINNER (epoch 2) is out of range; its loser (epoch 1) is in
    range.  A row-group prune of the chain would resurrect the loser —
    the guard reads multi-file chains fully, so p1 must be absent."""
    lake = LakeTable(str(tmp_path / "chain"))
    f1 = pa.table(
        {
            "repo": ["r"], "path": ["p1"],
            "seq": pa.array([1], pa.int64()),
            "x": pa.array([15], pa.int64()),
            "y": pa.array([35], pa.int64()),
        }
    )
    f2 = pa.table(
        {
            "repo": ["r"], "path": ["p1"],
            "seq": pa.array([2], pa.int64()),
            "x": pa.array([999], pa.int64()),
            "y": pa.array([999], pa.int64()),
        }
    )
    e1 = lake.write_partition(f1, 0, 1)
    e2 = lake.write_partition(f2, 0, 2)
    chain = PartitionEntry(
        pid=0,
        files=e1.files + e2.files,
        rows=2,
        hwm_seq=2,
        live_keys=1,
        bytes=e1.bytes + e2.bytes,
    )
    lake.commit(
        Manifest(
            epoch=1,
            num_partitions=1,
            schema=f1.schema,
            run_id="c",
            partitions={0: chain},
        )
    )
    got = lake.read_state(column_range={"x": (10, 20)}).to_pandas()
    assert len(got) == 0
