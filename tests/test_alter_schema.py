"""Metadata-only ALTER TABLE: drop and rename columns without touching a
single data file; time travel, replays and compaction stay correct."""

import os

import pytest

from cdm_data_loader_utils_ray.pipelines.maintenance import (
    alter_drop_column,
    alter_rename_column,
    compact,
)
from cdm_data_loader_utils_ray.sinks.lake import LakeTable


@pytest.fixture()
def lake(ray_session, tmp_path):
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "ev.parquet")
    d = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=60, num_events=500, seed=29))
    run_replay(ev, d, num_partitions=4)
    return LakeTable(d), ev


def test_drop_column_metadata_only(lake):
    table, ev = lake
    files_before = sorted(table.live_files())
    pre_epoch = table.latest_epoch()
    before = table.read_state().to_pandas()
    assert "lang" in before.columns

    alter_drop_column(table, "lang")
    assert sorted(table.live_files()) == files_before  # no data rewritten
    after = table.read_state().to_pandas()
    assert "lang" not in after.columns
    assert sorted(after["content_sha256"]) == sorted(before["content_sha256"])
    # time travel to the pre-drop epoch still shows the column
    old = table.read_state(manifest=table.read_manifest(pre_epoch)).to_pandas()
    assert "lang" in old.columns

    # replay after the drop: incoming events still carry lang; it must be
    # discarded on write and the state stays lang-free and convergent
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay

    run_replay(ev, table.dir, num_partitions=4)
    again = table.read_state().to_pandas()
    assert "lang" not in again.columns
    assert sorted(again["content_sha256"]) == sorted(before["content_sha256"])

    with pytest.raises(ValueError):
        alter_drop_column(table, "seq")
    with pytest.raises(ValueError):
        alter_drop_column(table, "nope")


def test_rename_column_metadata_only(lake):
    table, ev = lake
    files_before = sorted(table.live_files())
    before = table.read_state().to_pandas()

    alter_rename_column(table, "lang", "language")
    assert sorted(table.live_files()) == files_before
    after = table.read_state().to_pandas()
    assert "language" in after.columns and "lang" not in after.columns
    a = after.sort_values(["repo", "path"]).reset_index(drop=True)
    b = before.sort_values(["repo", "path"]).reset_index(drop=True)
    assert a["language"].tolist() == b["lang"].tolist()  # values survive

    # projection pushdown resolves the OLD physical name in old files
    proj = table.read_state(columns=["repo", "path", "language"]).to_pandas()
    assert sorted(proj.columns) == ["language", "path", "repo"]
    assert sorted(proj["language"].fillna("~")) == sorted(b["lang"].fillna("~"))

    # compaction must carry renamed values (the rename-aware rewrite):
    compact(table)
    post = table.read_state().to_pandas().sort_values(["repo", "path"])
    assert post["language"].tolist() == b["lang"].tolist()

    # chained rename composes: files from before the FIRST rename resolve
    alter_rename_column(table, "language", "tongue")
    t2 = table.read_state().to_pandas().sort_values(["repo", "path"])
    assert t2["tongue"].tolist() == b["lang"].tolist()

    with pytest.raises(ValueError):
        alter_rename_column(table, "tongue", "commit")  # exists
    with pytest.raises(ValueError):
        alter_rename_column(table, "path", "route")  # protected


def test_compact_preserves_pre_rename_files(lake):
    """The _rewrite_partitions fix: a compact over a chain holding
    PRE-rename files must rename per file, not null the column."""
    table, ev = lake
    before = table.read_state().to_pandas().sort_values(["repo", "path"])
    alter_rename_column(table, "commit", "revision")
    compact(table)  # every live file predates the rename
    after = table.read_state().to_pandas().sort_values(["repo", "path"])
    assert after["revision"].notna().sum() == before["commit"].notna().sum()
    assert after["revision"].tolist() == before["commit"].tolist()


def test_rename_to_retired_physical_name_rejected(lake):
    """Reviewed bug: rename a->b then c->a would make every post-rename
    file carry a physical 'a' that the per-file map remaps AGAIN,
    yielding duplicate columns and a failed read."""
    table, _ = lake
    alter_rename_column(table, "lang", "language")
    with pytest.raises(ValueError, match="previously renamed away"):
        alter_rename_column(table, "commit", "lang")
    with pytest.raises(ValueError):
        alter_rename_column(table, "commit", "")


def test_rename_to_retired_logical_target_rejected(lake):
    """r4 advice (high): rename lang->lang2 then DROP lang2 keeps the
    lang->lang2 mapping (pre-rename files must still resolve), so lang2 is
    no longer in the schema OR the history KEYS — renaming commit->lang2
    used to be accepted, committing a manifest where two physical names
    map to one logical name; every subsequent read crashed on duplicate
    columns in merge_chain_files."""
    table, _ = lake
    alter_rename_column(table, "lang", "lang2")
    alter_drop_column(table, "lang2")
    with pytest.raises(ValueError, match="rename target"):
        alter_rename_column(table, "commit", "lang2")
    # the table is still fully readable (the bad manifest never committed)
    state = table.read_state().to_pandas()
    assert "lang2" not in state.columns
    assert len(state) > 0


def test_migrate_preserves_pre_rename_files(lake):
    """migrate_partitions must read chains through the rename-aware
    merge_chain_files — a raw file scan nulls the renamed column for
    every pre-rename file (same hole the r4 fix closed in
    _rewrite_partitions; migrate was missed)."""
    from cdm_data_loader_utils_ray.pipelines.maintenance import migrate_partitions

    table, ev = lake
    before = table.read_state().to_pandas().sort_values(["repo", "path"])
    alter_rename_column(table, "commit", "revision")
    m = migrate_partitions(table, 7)  # every live file predates the rename
    assert m.num_partitions == 7
    after = table.read_state().to_pandas().sort_values(["repo", "path"])
    assert after["revision"].notna().sum() == before["commit"].notna().sum()
    assert after["revision"].tolist() == before["commit"].tolist()
