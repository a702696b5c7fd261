"""Bloom-sidecar equality data skipping: per-file bitsets written by
write_partition when the ``bloom_index`` table property is set, consulted
by read_state(column_equals=...) to skip chains that provably lack the
probed value.  Footer min/max cannot prune these columns (every file's
path range spans everything), so the poisoned-file test proves the bloom
path is what skips the IO."""

import json
import os

import pytest

from cdm_data_loader_utils_ray.sinks.lake import (
    BLOOM_SIDECAR_SUFFIX,
    LakeTable,
    chain_may_contain,
)

BLOOM_PROPS = {"bloom_index": {"columns": ["path", "content_sha256"]}}


@pytest.fixture(scope="module")
def bloom_lake(ray_session, tmp_path_factory):
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    root = str(tmp_path_factory.mktemp("bloomlake"))
    ev = os.path.join(root, "events.parquet")
    lake = os.path.join(root, "lake")
    write_events(ev, make_events(num_keys=300, num_events=3000, seed=11))
    table = LakeTable(lake)
    table.set_properties(BLOOM_PROPS)  # BEFORE replay: sidecars on epoch 1+
    run_replay(ev, lake, num_partitions=8)
    return table


def test_sidecars_written_for_every_data_file(bloom_lake):
    m = bloom_lake.latest_manifest()
    files = [f for p in m.partitions.values() for f in p.files]
    assert files
    for f in files:
        sc = bloom_lake.abspath(f) + BLOOM_SIDECAR_SUFFIX
        assert os.path.exists(sc), f
        import numpy as np

        with np.load(sc) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode())
        assert set(meta["columns"]) == {"path", "content_sha256"}


def test_equality_read_exact_and_pruned(bloom_lake):
    import pyarrow as pa

    table = bloom_lake
    full = table.read_state().to_pandas()
    target = sorted(full["path"].unique())[len(full["path"].unique()) // 2]
    exp = full[full["path"] == target]
    assert len(exp) == 1

    # bloom must prove absence for at least one chain (footer min/max on
    # an interleaved path column cannot)
    m = table.latest_manifest()
    probe = pa.array([target], type=m.schema.field("path").type).to_pandas()
    chains = {p.pid: list(p.files) for p in m.partitions.values()}
    skipped = [
        pid for pid, files in chains.items()
        if not chain_may_contain(table.dir, files, "path", probe)
    ]
    assert skipped, "bloom never pruned a chain"

    # poison every provably-absent chain's data files: a read that opens
    # them would crash, so a correct result proves the IO never happened
    for pid in skipped:
        for f in chains[pid]:
            with open(table.abspath(f), "wb") as fh:
                fh.write(b"not a parquet file")
    try:
        got = table.read_state(column_equals={"path": target}).to_pandas()
    finally:
        pass
    assert got["seq"].tolist() == exp["seq"].tolist()
    assert got["content_sha256"].tolist() == exp["content_sha256"].tolist()


def test_missing_sidecar_is_conservative(ray_session, tmp_path):
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "events.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=100, num_events=800, seed=3))
    table = LakeTable(lake)
    table.set_properties(BLOOM_PROPS)
    run_replay(ev, lake, num_partitions=4)

    # strip ALL sidecars: equality reads must still be exact (full scan)
    for f in os.listdir(table.data_dir):
        if f.endswith(BLOOM_SIDECAR_SUFFIX):
            os.unlink(os.path.join(table.data_dir, f))
    full = table.read_state().to_pandas()
    target = full["path"].iloc[0]
    got = table.read_state(column_equals={"path": target}).to_pandas()
    assert got["seq"].tolist() == full[full["path"] == target]["seq"].tolist()


def test_equals_validation(bloom_lake):
    with pytest.raises(ValueError):
        bloom_lake.read_state(column_equals={"nope": "x"})
    with pytest.raises(ValueError):
        bloom_lake.read_state(column_equals={"path": None})
    with pytest.raises(ValueError):
        bloom_lake.read_state(
            column_range={"path": ("a", "b")}, column_equals={"path": "a"}
        )


def test_vacuum_removes_sidecars_and_orphans(ray_session, tmp_path):
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev_all = make_events(num_keys=50, num_events=800, seed=5)
    cut = len(ev_all) // 2
    ev = os.path.join(str(tmp_path), "ev1.parquet")
    ev2 = os.path.join(str(tmp_path), "ev2.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    write_events(ev, ev_all.slice(0, cut))
    write_events(ev2, ev_all.slice(cut))
    table = LakeTable(lake)
    table.set_properties(BLOOM_PROPS)
    run_replay(ev, lake, num_partitions=4)
    run_replay(ev2, lake, num_partitions=4)
    from cdm_data_loader_utils_ray.pipelines.maintenance import compact

    compact(table)  # rewrite: epoch 1-2 delta files become unreferenced
    # orphan: a sidecar with no data file
    orphan = os.path.join(table.data_dir, "part-00000-epoch-00000001.parquet")
    open(orphan + BLOOM_SIDECAR_SUFFIX + ".fake", "wb").close()  # foreign: kept
    removed = table.vacuum(keep_epochs=1)
    assert removed
    for path in removed:
        assert not os.path.exists(path + BLOOM_SIDECAR_SUFFIX)
    leftover = [
        f for f in os.listdir(table.data_dir)
        if f.endswith(BLOOM_SIDECAR_SUFFIX)
        and not os.path.exists(
            os.path.join(table.data_dir, f[: -len(BLOOM_SIDECAR_SUFFIX)])
        )
    ]
    assert leftover == []


def test_clone_carries_sidecars_and_properties(ray_session, tmp_path):
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.pipelines.maintenance import clone_table
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "events.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    dst = os.path.join(str(tmp_path), "clone")
    write_events(ev, make_events(num_keys=60, num_events=500, seed=9))
    table = LakeTable(lake)
    table.set_properties(BLOOM_PROPS)
    run_replay(ev, lake, num_partitions=4)
    clone_table(table, dst)
    cl = LakeTable(dst)
    assert cl.get_properties() == BLOOM_PROPS
    m = cl.latest_manifest()
    for p in m.partitions.values():
        for f in p.files:
            assert os.path.exists(cl.abspath(f) + BLOOM_SIDECAR_SUFFIX)


def test_compact_rewrites_sidecars(ray_session, tmp_path):
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.pipelines.maintenance import compact
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "events.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=80, num_events=600, seed=13))
    table = LakeTable(lake)
    table.set_properties(BLOOM_PROPS)
    run_replay(ev, lake, num_partitions=4)
    compact(table)
    m = table.latest_manifest()
    for p in m.partitions.values():
        for f in p.files:
            assert os.path.exists(table.abspath(f) + BLOOM_SIDECAR_SUFFIX)
    # and the equality read still works post-compaction
    full = table.read_state().to_pandas()
    target = full["path"].iloc[3]
    got = table.read_state(column_equals={"path": target}).to_pandas()
    assert len(got) == 1 and got["path"].iloc[0] == target


def test_nullable_int_column_bloom_is_sound(ray_session, tmp_path):
    """Reviewed bug: building the sidecar from pandas-after-dropna turned
    an int64-with-nulls column into float64 hashes, so the int64 probe
    missed (Bloom false NEGATIVE = silent row loss).  The build must drop
    nulls in Arrow so the dtype matches the probe's."""
    import pyarrow as pa

    from cdm_data_loader_utils_ray.sinks.lake import write_bloom_sidecar

    t = pa.table({"x": pa.array([5, None, 9], type=pa.int64())})
    data = os.path.join(str(tmp_path), "f.parquet")
    open(data, "wb").close()  # sidecar path anchor; data content unused
    write_bloom_sidecar(data, t, ["x"])
    probe = pa.array([5], type=pa.int64()).to_pandas()
    assert chain_may_contain(str(tmp_path), ["f.parquet"], "x", probe)
    probe9 = pa.array([9], type=pa.int64()).to_pandas()
    assert chain_may_contain(str(tmp_path), ["f.parquet"], "x", probe9)


def test_hash_scheme_mismatch_is_conservative(tmp_path):
    """r4 advice: sidecars persist pd.util.hash_pandas_object bit positions
    whose only contract is stable-within-run.  A sidecar recorded under a
    DIFFERENT pandas hash scheme (e.g. written before an upgrade) must be
    treated as unreadable — conservative True — never trusted, or a hash
    change turns pruning into silent false negatives."""
    import json

    import numpy as np
    import pyarrow as pa

    from cdm_data_loader_utils_ray.sinks.lake import (
        BLOOM_SIDECAR_SUFFIX,
        write_bloom_sidecar,
    )

    t = pa.table({"x": pa.array([5, 9], type=pa.int64())})
    data = os.path.join(str(tmp_path), "f.parquet")
    open(data, "wb").close()
    write_bloom_sidecar(data, t, ["x"])
    sc = data + BLOOM_SIDECAR_SUFFIX

    # current-scheme sidecar proves absence of an unseen value
    probe = pa.array([12345], type=pa.int64()).to_pandas()
    assert not chain_may_contain(str(tmp_path), ["f.parquet"], "x", probe)

    # rewrite the sidecar with a foreign scheme marker: same bits, but the
    # reader may no longer trust them
    with np.load(sc) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        arrays = {k: z[k] for k in z.files if k != "meta"}
    meta["hash_scheme"] = "pandas-0.0.0-v1"
    with open(sc, "wb") as f:
        np.savez(
            f,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            **arrays,
        )
    assert chain_may_contain(str(tmp_path), ["f.parquet"], "x", probe)

    # legacy sidecar with NO marker at all is equally untrusted
    del meta["hash_scheme"]
    with open(sc, "wb") as f:
        np.savez(
            f,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            **arrays,
        )
    assert chain_may_contain(str(tmp_path), ["f.parquet"], "x", probe)
