"""Equality-delete vectors (Iceberg-style merge-on-read DELETE).

delete_where(mode='dv') writes key-list sidecars instead of rewriting
data; every read path must apply them, CDC re-inserts must outlive them,
compaction must materialize them, and CDF must surface them as deletes.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from cdm_data_loader_utils_ray.pipelines.cdc import (
    read_final_state_arrow,
    run_replay,
)
from cdm_data_loader_utils_ray.pipelines.maintenance import (
    clone_table,
    compact,
    delete_where,
)
from cdm_data_loader_utils_ray.sinks.lake import LakeTable
from cdm_data_loader_utils_ray.synth import make_events, write_events


# a lambda (not a module-level def): cloudpickle ships it by VALUE, so
# Ray workers never try to import this test module
_pred = lambda t: pc.equal(t["lang"], "py")  # noqa: E731


@pytest.fixture()
def lake(tmp_path):
    ev = str(tmp_path / "ev.parquet")
    write_events(ev, make_events(num_keys=120, num_events=1200, seed=23))
    lake_dir = str(tmp_path / "lake")
    run_replay(ev, lake_dir, num_partitions=4)
    return LakeTable(lake_dir), ev, tmp_path


def test_dv_matches_rewrite_mode(lake):
    table, _, tmp = lake
    twin = clone_table(table, str(tmp / "twin"))
    twin_table = LakeTable(str(tmp / "twin"))

    files_before = {
        f: os.path.getmtime(table.abspath(f))
        for p in table.latest_manifest().partitions.values()
        for f in p.files
    }
    m_dv, n_dv = delete_where(table, _pred, mode="dv")
    m_rw, n_rw = delete_where(twin_table, _pred, mode="rewrite")
    assert n_dv == n_rw > 0
    # dv mode rewrote NO data file
    for f, mt in files_before.items():
        assert os.path.getmtime(table.abspath(f)) == mt
    assert any(p.delete_files for p in m_dv.partitions.values())
    assert not any(p.delete_files for p in m_rw.partitions.values())
    a = read_final_state_arrow(table)
    b = read_final_state_arrow(twin_table)
    assert a.num_rows == b.num_rows
    assert a.sort_by([("repo", "ascending"), ("path", "ascending")]).equals(
        b.sort_by([("repo", "ascending"), ("path", "ascending")])
    )
    assert len(a.filter(pc.equal(a["lang"], "py"))) == 0


def test_dv_respected_by_read_state_and_lookup(lake):
    table, _, _ = lake
    before = read_final_state_arrow(table)
    victims = before.filter(pc.equal(before["lang"], "py"))
    assert victims.num_rows > 0
    delete_where(table, _pred, mode="dv")
    # streaming read path
    got = (
        table.read_state()
        .to_pandas()
    )
    assert (got["lang"] != "py").all()
    # point-lookup path opens only owning partitions — deleted keys vanish
    keys = list(
        zip(victims["repo"].to_pylist()[:5], victims["path"].to_pylist()[:5])
    )
    assert table.lookup(keys).num_rows == 0
    # surviving key still resolves
    alive = before.filter(pc.not_equal(before["lang"], "py"))
    k = (alive["repo"][0].as_py(), alive["path"][0].as_py())
    assert table.lookup([k]).num_rows == 1


def test_reinsert_after_dv_resurrects(lake):
    table, ev, tmp = lake
    before = read_final_state_arrow(table)
    victims = before.filter(pc.equal(before["lang"], "py"))
    delete_where(table, _pred, mode="dv")
    # new CDC epoch re-inserts one deleted key with a fresh seq
    key = (victims["repo"][0].as_py(), victims["path"][0].as_py())
    max_seq = int(pc.max(before["seq"]).as_py())
    ev2 = str(tmp / "ev2.parquet")
    base = pa.parquet.read_table(ev)
    row = base.slice(0, 1).to_pydict()
    row["repo"], row["path"], row["seq"] = [key[0]], [key[1]], [max_seq + 1]
    row["op"], row["lang"] = ["update"], ["py"]
    pa.parquet.write_table(pa.Table.from_pydict(row, schema=base.schema), ev2)
    run_replay(ev2, table.dir, num_partitions=4)
    got = table.lookup([key])
    assert got.num_rows == 1 and got["lang"][0].as_py() == "py"
    # the OTHER deleted keys stay gone
    others = list(
        zip(victims["repo"].to_pylist()[1:6], victims["path"].to_pylist()[1:6])
    )
    assert table.lookup(others).num_rows == 0


def test_compact_materializes_and_vacuum_sweeps(lake):
    table, _, _ = lake
    delete_where(table, _pred, mode="dv")
    state_dv = read_final_state_arrow(table)
    dv_files = [
        f for p in table.latest_manifest().partitions.values()
        for f in p.delete_files
    ]
    assert dv_files
    m = compact(table)
    assert not any(p.delete_files for p in m.partitions.values())
    state_after = read_final_state_arrow(table)
    assert state_dv.sort_by([("repo", "ascending"), ("path", "ascending")]).equals(
        state_after.sort_by([("repo", "ascending"), ("path", "ascending")])
    )
    # vacuum with retention 1: the unreferenced dv sidecars are swept
    table.vacuum(keep_epochs=1)
    for f in dv_files:
        assert not os.path.exists(table.abspath(f))


def test_cdf_surfaces_dv_deletes(lake):
    table, _, _ = lake
    e0 = table.latest_epoch()
    before = read_final_state_arrow(table)
    victims = before.filter(pc.equal(before["lang"], "py"))
    vkeys = set(zip(victims["repo"].to_pylist(), victims["path"].to_pylist()))
    delete_where(table, _pred, mode="dv")
    ch = table.read_changes(e0).to_pandas()
    dels = ch[ch["change_type"] == "delete"]
    got_deleted = set(zip(dels["repo"], dels["path"]))
    # every DV-deleted live key surfaces as a delete (fallback may add
    # tombstone rows of the same partition; those are also 'delete')
    assert vkeys <= got_deleted


def test_clone_carries_dvs(lake):
    table, _, tmp = lake
    delete_where(table, _pred, mode="dv")
    clone_table(table, str(tmp / "c2"))
    c = LakeTable(str(tmp / "c2"))
    a = read_final_state_arrow(table)
    b = read_final_state_arrow(c)
    assert a.sort_by([("repo", "ascending"), ("path", "ascending")]).equals(
        b.sort_by([("repo", "ascending"), ("path", "ascending")])
    )
    assert len(b.filter(pc.equal(b["lang"], "py"))) == 0


def test_dv_streaming_bootstrap(lake):
    table, ev, tmp = lake
    from cdm_data_loader_utils_ray.state.streaming import StreamingUpserter

    before = read_final_state_arrow(table)
    victims = before.filter(pc.equal(before["lang"], "py"))
    delete_where(table, _pred, mode="dv")
    expect = read_final_state_arrow(table)
    up = StreamingUpserter(table.dir)
    try:
        # commit an epoch with no new events: the bootstrapped shards must
        # carry the delete vectors through their snapshot
        up.commit()
    finally:
        up.shutdown()
    after = read_final_state_arrow(table)
    assert expect.sort_by([("repo", "ascending"), ("path", "ascending")]).equals(
        after.sort_by([("repo", "ascending"), ("path", "ascending")])
    )
    k = (victims["repo"][0].as_py(), victims["path"][0].as_py())
    assert table.lookup([k]).num_rows == 0


def test_migrate_respects_dvs(lake):
    from cdm_data_loader_utils_ray.pipelines.maintenance import migrate_partitions

    table, _, _ = lake
    delete_where(table, _pred, mode="dv")
    expect = read_final_state_arrow(table)
    m = migrate_partitions(table, 7)
    assert m.num_partitions == 7
    assert not any(p.delete_files for p in m.partitions.values())
    got = read_final_state_arrow(table)
    key = [("repo", "ascending"), ("path", "ascending")]
    assert expect.sort_by(key).equals(got.sort_by(key))
    assert len(got.filter(pc.equal(got["lang"], "py"))) == 0


def test_analyze_table_reflects_live_state(lake):
    import duckdb

    from cdm_data_loader_utils_ray.pipelines.maintenance import analyze_table

    table, ev, _ = lake
    delete_where(table, _pred, mode="dv")  # stats must see DVs applied
    stats = analyze_table(table, columns=["lang", "seq", "repo"])
    assert stats["epoch"] == table.latest_epoch()
    live = read_final_state_arrow(table)  # live view: tombstones + DVs out
    con = duckdb.connect()
    con.register("live", live)
    exp = con.execute(
        "SELECT count(*), count(*) - count(lang), count(DISTINCT lang), "
        "min(seq), max(seq) FROM live"
    ).fetchone()
    s = stats["columns"]
    assert s["lang"]["n_rows"] == exp[0]
    assert s["lang"]["n_nulls"] == exp[1]
    assert s["lang"]["n_distinct"] == exp[2]
    assert s["seq"]["min"] == float(exp[3]) and s["seq"]["max"] == float(exp[4])
    # persisted + surfaced through properties
    assert table.get_properties()["stats"]["columns"]["repo"]["n_rows"] == exp[0]
    with pytest.raises(ValueError):
        analyze_table(table, columns=["nope"])


def test_dv_predicate_column_projection(lake):
    table, _, tmp = lake
    twin = clone_table(table, str(tmp / "proj"))
    tw = LakeTable(str(tmp / "proj"))
    m1, n1 = delete_where(table, _pred, mode="dv")
    m2, n2 = delete_where(tw, _pred, mode="dv", predicate_columns=["lang"])
    assert n1 == n2 > 0
    a = read_final_state_arrow(table)
    b = read_final_state_arrow(tw)
    key = [("repo", "ascending"), ("path", "ascending")]
    assert a.sort_by(key).equals(b.sort_by(key))
