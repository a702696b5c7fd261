"""Ninth review batch: state/lake edge cases found by inspection.

* ``_lww_take_indices`` treated every null key as its own group (Kleene
  ``not_equal`` yields null for null-vs-null, which was filled to True =
  boundary), so LWW merges never deduplicated null-keyed rows — contrary
  to the SQL GROUP BY semantics every oracle twin uses.
* ``LakeTable.commit`` of a stale epoch whose manifest file is missing
  raised ``FileNotFoundError`` instead of the documented ``ValueError``.
"""

import pyarrow as pa
import pytest

from cdm_data_loader_utils_ray.sinks.lake import LakeTable, Manifest
from cdm_data_loader_utils_ray.state.upsert import (
    _lww_take_indices,
    merge_states,
    prereduce_batch,
)


def test_lww_null_keys_group_together():
    t = pa.table(
        {
            "k": pa.array([None, None, "a", None, "a"], type=pa.string()),
            "seq": pa.array([1, 5, 3, 2, 4], type=pa.int64()),
        }
    )
    out = t.take(_lww_take_indices(t, ["k"], "seq"))
    # one winner per key INCLUDING the null key (max seq wins)
    assert len(out) == 2
    rows = {k: s for k, s in zip(out["k"].to_pylist(), out["seq"].to_pylist())}
    assert rows == {"a": 4, None: 5}


def test_lww_null_vs_value_still_boundary():
    # a null key adjacent to a real value must NOT merge into its group
    t = pa.table(
        {
            "k": pa.array(["a", None], type=pa.string()),
            "seq": pa.array([1, 2], type=pa.int64()),
        }
    )
    out = t.take(_lww_take_indices(t, ["k"], "seq"))
    assert len(out) == 2


def test_lww_composite_key_nulls():
    # composite keys: (null, x) groups with (null, x), not with (null, y)
    t = pa.table(
        {
            "k1": pa.array([None, None, None], type=pa.string()),
            "k2": pa.array(["x", "x", "y"], type=pa.string()),
            "seq": pa.array([1, 2, 3], type=pa.int64()),
        }
    )
    out = t.take(_lww_take_indices(t, ["k1", "k2"], "seq"))
    got = sorted(zip(out["k2"].to_pylist(), out["seq"].to_pylist()))
    assert got == [("x", 2), ("y", 3)]


def test_prereduce_and_merge_states_null_keys():
    schema = pa.schema(
        [
            pa.field("repo", pa.string()),
            pa.field("path", pa.string()),
            pa.field("seq", pa.int64()),
        ]
    )
    batch = pa.table(
        {
            "repo": pa.array(["r", "r", None, None], type=pa.string()),
            "path": pa.array(["p", "p", "p", "p"], type=pa.string()),
            "seq": pa.array([1, 2, 3, 4], type=pa.int64()),
        }
    )
    red = prereduce_batch(batch, ["repo", "path"])
    assert len(red) == 2  # (r,p) and (null,p)
    merged = merge_states(None, batch, schema, ["repo", "path"])
    assert len(merged) == 2
    assert set(merged["seq"].to_pylist()) == {2, 4}


def test_commit_stale_epoch_missing_manifest_raises_value_error(tmp_path):
    lake = LakeTable(str(tmp_path / "t"))
    schema = pa.schema([pa.field("k", pa.string()), pa.field("seq", pa.int64())])
    m1 = Manifest(epoch=1, num_partitions=1, schema=schema, run_id="r1")
    lake.commit(m1)
    m2 = Manifest(epoch=2, num_partitions=1, schema=schema, run_id="r2")
    lake.commit(m2)
    # remove epoch-1's manifest file, then replay a commit for epoch 1:
    # must be the documented ValueError, not FileNotFoundError
    import os

    os.remove(os.path.join(lake.manifest_dir, "manifest-00000001.json"))
    stale = Manifest(epoch=1, num_partitions=1, schema=schema, run_id="r1")
    with pytest.raises(ValueError, match="committed epoch"):
        lake.commit(stale)
