"""Compaction, conditional update, streaming shard-actor upserter, ids."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.pipelines.cdc import read_final_state_arrow, run_replay
from cdm_data_loader_utils_ray.pipelines.maintenance import compact, update_where
from cdm_data_loader_utils_ray.sinks.lake import LakeTable
from cdm_data_loader_utils_ray.stages.ids import add_cdm_id_column, generate_cdm_id
from cdm_data_loader_utils_ray.state.streaming import StreamingUpserter
from cdm_data_loader_utils_ray.synth import make_events, write_events


@pytest.fixture()
def lake_with_data(tmp_path):
    ev = str(tmp_path / "ev.parquet")
    write_events(ev, make_events(num_keys=100, num_events=1000, seed=17))
    lake_dir = str(tmp_path / "lake")
    run_replay(ev, lake_dir, num_partitions=4)
    return LakeTable(lake_dir), ev


def test_compact_drops_tombstones(lake_with_data):
    table, _ = lake_with_data
    m0 = table.latest_manifest()
    total_rows = sum(p.rows for p in m0.partitions.values())
    live = sum(p.live_keys for p in m0.partitions.values())
    assert total_rows > live  # deletes exist in the fixture
    live_before = read_final_state_arrow(table)
    m1 = compact(table)
    assert m1.epoch == m0.epoch + 1
    total_after = sum(p.rows for p in m1.partitions.values())
    assert total_after == live
    # live view unchanged by compaction
    live_after = read_final_state_arrow(table)
    assert live_before.equals(live_after)


def test_update_where_with_effect_count(lake_with_data):
    table, _ = lake_with_data
    before = read_final_state_arrow(table)
    n_py = len(before.filter(pc.equal(before["lang"], "py")))

    def pred(t):
        return pc.equal(t["lang"], "py")

    def setter(t):
        return t.set_column(
            t.schema.get_field_index("lang"), "lang",
            pa.array(["python"] * len(t), type=pa.string()),
        )

    m, n_updated = update_where(table, pred, setter)
    after = read_final_state_arrow(table)
    assert len(after.filter(pc.equal(after["lang"], "python"))) == n_py
    assert n_updated >= n_py  # tombstones with lang=py may also be touched
    assert len(after) == len(before)


def test_streaming_upserter_matches_batch_engine(tmp_path):
    ev_path = str(tmp_path / "ev.parquet")
    write_events(ev_path, make_events(num_keys=120, num_events=1500, seed=23))
    # batch engine
    run_replay(ev_path, str(tmp_path / "batch"), num_partitions=4)
    batch_state = read_final_state_arrow(LakeTable(str(tmp_path / "batch")))
    # streaming engine: two feeds + commits, then resume-from-manifest
    s = StreamingUpserter(str(tmp_path / "stream"), num_partitions=4)
    ds = rd.read_parquet(ev_path, filter=pc.field("seq") <= 700)
    s.feed(ds)
    s.commit()
    s.shutdown()
    # new controller resumes from the committed manifest (durability)
    s2 = StreamingUpserter(str(tmp_path / "stream"))
    s2.feed(rd.read_parquet(ev_path, filter=pc.field("seq") > 700))
    s2.commit()
    stream_state = read_final_state_arrow(LakeTable(str(tmp_path / "stream")))
    s2.shutdown()
    assert batch_state.num_rows == stream_state.num_rows
    b = batch_state.sort_by([("repo", "ascending"), ("path", "ascending")])
    t = stream_state.sort_by([("repo", "ascending"), ("path", "ascending")])
    assert b["content_sha256"].to_pylist() == t["content_sha256"].to_pylist()
    assert b["seq"].to_pylist() == t["seq"].to_pylist()


def test_cdm_ids_deterministic():
    assert generate_cdm_id("entity", "a", "b") == generate_cdm_id("entity", "a", "b")
    assert generate_cdm_id("entity", "a") != generate_cdm_id("name", "a")
    t = pa.table({"repo": ["r1", "r2"], "path": ["p", "p"]})
    out = add_cdm_id_column(t, "file", ["repo", "path"])
    assert out["cdm_id"][0].as_py() != out["cdm_id"][1].as_py()
    out2 = add_cdm_id_column(t, "file", ["repo", "path"])
    assert out["cdm_id"].to_pylist() == out2["cdm_id"].to_pylist()


def test_migrate_partitions_then_continue(tmp_path):
    """Grow the partition count mid-stream: state preserved, later epochs
    apply against the new layout, final state converges."""
    import duckdb

    from cdm_data_loader_utils_ray.pipelines.maintenance import migrate_partitions

    ev = make_events(num_keys=120, num_events=1200, seed=83)
    ev_path = str(tmp_path / "ev.parquet")
    import pyarrow.parquet as pq

    pq.write_table(ev, ev_path)
    lake_dir = str(tmp_path / "lake")
    run_replay(ev_path, lake_dir, num_partitions=4, max_seq=600)
    t = LakeTable(lake_dir)
    before = read_final_state_arrow(t)
    m = migrate_partitions(t, 8)
    assert m.num_partitions == 8
    mid = read_final_state_arrow(t)
    assert before.equals(mid)  # migration is state-neutral
    run_replay(ev_path, lake_dir, num_partitions=8)  # rest of the log
    state = read_final_state_arrow(t)
    con = duckdb.connect()
    oracle = con.sql(
        f"""WITH r AS (SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) rn
            FROM read_parquet('{ev_path}'))
            SELECT count(*) n FROM r WHERE rn=1 AND op<>'delete'"""
    ).fetchone()[0]
    assert len(state) == oracle


def test_chain_length_bounded_by_auto_fold(tmp_path):
    """Many small epochs must not grow unbounded read chains: apply_epoch
    auto-folds chains past max_chain_len."""
    import pyarrow.parquet as pq

    ev = make_events(num_keys=60, num_events=900, seed=91)
    ev_path = str(tmp_path / "ev.parquet")
    pq.write_table(ev, ev_path)
    lake_dir = str(tmp_path / "lake")
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay as rr

    rr(ev_path, lake_dir, num_partitions=2, epochs=9)
    t = LakeTable(lake_dir)
    m = t.latest_manifest()
    assert max(len(p.files) for p in m.partitions.values()) <= 16
    # state still converges across the folds
    import duckdb

    con = duckdb.connect()
    n = con.sql(
        f"""WITH r AS (SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) rn
        FROM read_parquet('{ev_path}')) SELECT count(*) FROM r WHERE rn=1 AND op<>'delete'"""
    ).fetchone()[0]
    assert read_final_state_arrow(t).num_rows == n
    # force a tiny bound to see folding happen
    rr(ev_path, str(tmp_path / "lake2"), num_partitions=2, epochs=9)
    from cdm_data_loader_utils_ray.pipelines.maintenance import fold_long_chains

    t2 = LakeTable(str(tmp_path / "lake2"))
    folded = fold_long_chains(t2, max_len=2)
    if folded is not None:
        assert max(len(p.files) for p in folded.partitions.values()) <= 2
    assert read_final_state_arrow(t2).num_rows == n


def test_streaming_snapshots_are_churn_proportional(tmp_path):
    """r2 verdict #3: a commit must write only rows dirtied since the last
    snapshot (delta chain), not each shard's full resident state — and a
    commit with no new data writes nothing at all."""
    import pyarrow.parquet as pq

    # churn profile: 3000 keys, tail of ~450 events → ~400 dirty keys
    ev = make_events(num_keys=3000, num_events=12000, seed=47)
    ev_path = str(tmp_path / "ev.parquet")
    pq.write_table(ev, ev_path)
    s = StreamingUpserter(str(tmp_path / "stream"), num_partitions=4)
    # epoch 1: bulk load (base files)
    s.feed(rd.read_parquet(ev_path, filter=pc.field("seq") <= 11000))
    m1 = s.commit()
    bulk_bytes = m1.metrics["snapshot_bytes"]
    assert bulk_bytes > 0
    # epoch 2: small tail => delta files a fraction of the base write
    s.feed(rd.read_parquet(ev_path, filter=pc.field("seq") > 11000))
    m2 = s.commit()
    assert 0 < m2.metrics["snapshot_bytes"] < bulk_bytes / 3
    assert any(len(p.files) == 2 for p in m2.partitions.values())  # chained
    # epoch 3: nothing fed => zero bytes written, chains carried forward
    m3 = s.commit()
    assert m3.metrics["snapshot_bytes"] == 0
    assert m3.metrics["dirty_shards"] == 0
    assert {p.pid: p.files for p in m3.partitions.values()} == {
        p.pid: p.files for p in m2.partitions.values()
    }
    s.shutdown()
    # converged state matches the batch engine across the chain
    run_replay(ev_path, str(tmp_path / "batch"), num_partitions=4)
    b = read_final_state_arrow(LakeTable(str(tmp_path / "batch"))).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    t = read_final_state_arrow(LakeTable(str(tmp_path / "stream"))).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    assert b["seq"].to_pylist() == t["seq"].to_pylist()
    assert b["content_sha256"].to_pylist() == t["content_sha256"].to_pylist()
    # a resumed controller over the chained manifest also converges
    s2 = StreamingUpserter(str(tmp_path / "stream"))
    assert read_final_state_arrow(LakeTable(str(tmp_path / "stream"))).num_rows == len(b)
    s2.shutdown()


def test_streaming_chain_folds_at_bound(tmp_path):
    """Many tiny commits keep chains bounded: shards fold from resident
    state once a chain reaches max_chain_len."""
    import pyarrow.parquet as pq

    ev = make_events(num_keys=50, num_events=1200, seed=53)
    ev_path = str(tmp_path / "ev.parquet")
    pq.write_table(ev, ev_path)
    s = StreamingUpserter(str(tmp_path / "stream"), num_partitions=2, max_chain_len=4)
    for lo in range(0, 1200, 100):
        s.feed(rd.read_parquet(
            ev_path, filter=(pc.field("seq") > lo) & (pc.field("seq") <= lo + 100)
        ))
        m = s.commit()
        assert max(len(p.files) for p in m.partitions.values()) <= 4
    s.shutdown()
    run_replay(ev_path, str(tmp_path / "batch"), num_partitions=2)
    b = read_final_state_arrow(LakeTable(str(tmp_path / "batch"))).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    t = read_final_state_arrow(LakeTable(str(tmp_path / "stream"))).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    assert b["seq"].to_pylist() == t["seq"].to_pylist()
    assert b["content_sha256"].to_pylist() == t["content_sha256"].to_pylist()


def test_streaming_shard_buffers_deltas(tmp_path):
    """Buffered apply (r2): many micro-batches trigger far fewer full-state
    merges than batches, and the converged state is identical to a full
    replay through the batch engine."""
    ev_path = str(tmp_path / "ev.parquet")
    write_events(ev_path, make_events(num_keys=80, num_events=2000, seed=31))
    run_replay(ev_path, str(tmp_path / "batch"), num_partitions=2)
    batch_state = read_final_state_arrow(LakeTable(str(tmp_path / "batch")))

    s = StreamingUpserter(str(tmp_path / "stream"), num_partitions=2)
    # tiny micro-batches => many apply() calls per shard
    s.feed(rd.read_parquet(ev_path), batch_size=64)
    stats = s.shard_stats()  # flushes pending buffers
    n_batches_lower_bound = 2000 // 64
    for st in stats:
        assert st["merges"] < n_batches_lower_bound / 2, st
    s.commit()
    stream_state = read_final_state_arrow(LakeTable(str(tmp_path / "stream")))
    s.shutdown()
    b = batch_state.sort_by([("repo", "ascending"), ("path", "ascending")])
    t = stream_state.sort_by([("repo", "ascending"), ("path", "ascending")])
    assert b["seq"].to_pylist() == t["seq"].to_pylist()
    assert b["content_sha256"].to_pylist() == t["content_sha256"].to_pylist()


def test_merge_into_upsert_and_matched_only(lake_with_data):
    import ray.data as rd

    from cdm_data_loader_utils_ray.pipelines.maintenance import merge_into

    table, _ = lake_with_data
    before = read_final_state_arrow(table)
    existing = before.to_pandas().iloc[0]
    src = pd.DataFrame(
        {
            "repo": [existing["repo"], "brand/new"],
            "path": [existing["path"], "brand/new.txt"],
            "commit": ["m1", "m2"],
            "lang": ["py", "py"],
            "content": ["merged content", "fresh content"],
        }
    )
    # upsert: update the existing key, insert the new one
    merge_into(table, rd.from_pandas(src))
    after = read_final_state_arrow(table).to_pandas().set_index(["repo", "path"])
    assert after.loc[(existing["repo"], existing["path"]), "content"] == "merged content"
    assert after.loc[("brand/new", "brand/new.txt"), "content"] == "fresh content"
    assert len(after) == len(before) + 1

    # matched-only delete: the unmatched source row must NOT create a key
    src2 = pd.DataFrame(
        {
            "repo": ["brand/new", "never/seen"],
            "path": ["brand/new.txt", "never.txt"],
            "commit": ["m3", "m4"],
            "lang": ["py", "py"],
            "content": [None, None],
        }
    )
    merge_into(table, rd.from_pandas(src2), when_matched="delete",
               when_not_matched=None)
    final = read_final_state_arrow(table).to_pandas()
    keys = set(zip(final["repo"], final["path"]))
    assert ("brand/new", "brand/new.txt") not in keys
    assert ("never/seen", "never.txt") not in keys
    assert len(final) == len(before)


def test_merge_into_delete_plus_insert_splits_by_match(lake_with_data):
    """when_matched='delete' + when_not_matched='insert' (r3 ADVICE):
    matched source rows delete their key; UNMATCHED rows must be INSERTED,
    not emitted as deletes of nonexistent keys."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.pipelines.maintenance import merge_into

    table, _ = lake_with_data
    before = read_final_state_arrow(table)
    existing = before.to_pandas().iloc[0]
    src = pd.DataFrame(
        {
            "repo": [existing["repo"], "split/new"],
            "path": [existing["path"], "split/new.txt"],
            "commit": ["d1", "i1"],
            "lang": ["py", "py"],
            "content": [None, "inserted via merge"],
        }
    )
    merge_into(table, rd.from_pandas(src), when_matched="delete",
               when_not_matched="insert")
    after = read_final_state_arrow(table).to_pandas()
    keys = set(zip(after["repo"], after["path"]))
    assert (existing["repo"], existing["path"]) not in keys  # matched -> deleted
    assert ("split/new", "split/new.txt") in keys  # unmatched -> inserted
    row = after.set_index(["repo", "path"]).loc[("split/new", "split/new.txt")]
    assert row["content"] == "inserted via merge"
    assert len(after) == len(before)  # -1 delete +1 insert


def test_merge_into_duplicate_source_keys(lake_with_data):
    """Duplicate (repo, path) in the source: default raises a clear error
    (Delta MERGE semantics); on_duplicate='reduce' keeps the deterministic
    lexicographically-greatest (commit, content) winner."""
    import pytest as _pytest
    import ray.data as rd

    from cdm_data_loader_utils_ray.pipelines.maintenance import merge_into

    table, _ = lake_with_data
    src = pd.DataFrame(
        {
            "repo": ["dup/r", "dup/r"],
            "path": ["a.txt", "a.txt"],
            "commit": ["c1", "c2"],
            "lang": ["py", "py"],
            "content": ["first", "second"],
        }
    )
    with _pytest.raises(Exception, match="multiple rows for key"):
        merge_into(table, rd.from_pandas(src))

    merge_into(table, rd.from_pandas(src), on_duplicate="reduce")
    after = read_final_state_arrow(table).to_pandas().set_index(["repo", "path"])
    # winner = greatest (commit, content) = ('c2', 'second')
    assert after.loc[("dup/r", "a.txt"), "content"] == "second"


def _canon(t):
    t = t.sort_by([("repo", "ascending"), ("path", "ascending")])
    # strip nullability flags: read_state_arrow(manifest=...) and the final-
    # state reader agree on data but not on not-null field metadata
    return t.cast(pa.schema([pa.field(f.name, f.type) for f in t.schema]))


def _sorted_state(table):
    return _canon(read_final_state_arrow(table))


def test_restore_rolls_back_then_replay_reapplies(tmp_path):
    from cdm_data_loader_utils_ray.pipelines.maintenance import restore

    ev = str(tmp_path / "ev.parquet")
    write_events(ev, make_events(num_keys=100, num_events=2000, seed=31))
    lake_dir = str(tmp_path / "lake")
    run_replay(ev, lake_dir, num_partitions=4, epochs=4)
    table = LakeTable(lake_dir)
    latest = table.latest_epoch()
    final_state = _sorted_state(table)

    target = latest - 2
    mid_state = _canon(table.read_state_arrow(manifest=table.read_manifest(target)))

    m = restore(table, target)
    assert m.epoch == latest + 1
    assert m.metrics["restored_from"] == target
    # metadata-only rollback: live view == the target epoch's view
    assert _sorted_state(table).equals(mid_state)
    # restore to the current epoch is a no-op (returns the live manifest)
    assert restore(table, m.epoch).epoch == m.epoch

    # hwm rolled back with the chains: a full re-replay re-applies the
    # post-target events and reconverges on the original final state
    run_replay(ev, lake_dir, num_partitions=4)
    assert _sorted_state(table).equals(final_state)


def test_restore_survives_vacuum_and_fails_past_retention(tmp_path):
    from cdm_data_loader_utils_ray.pipelines.maintenance import compact, restore

    ev = str(tmp_path / "ev.parquet")
    write_events(ev, make_events(num_keys=80, num_events=1200, seed=33))
    lake_dir = str(tmp_path / "lake")
    run_replay(ev, lake_dir, num_partitions=4, epochs=3)
    table = LakeTable(lake_dir)
    latest = table.latest_epoch()

    m = restore(table, latest - 1)
    view = _sorted_state(table)
    # the new LATEST references the restored (old) files -> vacuum keeps them
    table.vacuum(keep_epochs=1)
    assert _sorted_state(table).equals(view)

    # rewrite everything, then reclaim: epoch-1 files are gone and restore
    # past the retention window must fail loudly, not half-restore
    compact(table)
    table.vacuum(keep_epochs=1)
    with pytest.raises(ValueError, match="already vacuumed"):
        restore(table, 1)


def test_clone_is_isolated_from_source(tmp_path):
    from cdm_data_loader_utils_ray.pipelines.maintenance import clone_table

    ev = str(tmp_path / "ev.parquet")
    write_events(ev, make_events(num_keys=80, num_events=1600, seed=37))
    src_dir = str(tmp_path / "src")
    # apply only a PREFIX of the log, so the source can diverge later
    run_replay(ev, src_dir, num_partitions=4, max_seq=800)
    src = LakeTable(src_dir)
    mid_view = _sorted_state(src)

    dst = LakeTable(str(tmp_path / "clone"))
    m = clone_table(src, dst.dir)
    assert m.epoch == src.latest_epoch()
    assert _sorted_state(dst).equals(mid_view)
    # cloning onto a table with commits must refuse
    with pytest.raises(ValueError, match="already has commits"):
        clone_table(src, dst.dir)

    # diverge the SOURCE (finish the replay, then rewrite + reclaim its
    # files): the clone's hardlinked inodes must keep serving the old view
    run_replay(ev, src_dir, num_partitions=4)
    compact(src)
    src.vacuum(keep_epochs=1)
    assert not _sorted_state(src).equals(mid_view)  # source moved on
    assert _sorted_state(dst).equals(mid_view)      # clone frozen

    # the clone is a real table: replaying the log onto it resumes from
    # the cloned hwm and converges on the source's final state
    run_replay(ev, dst.dir, num_partitions=4)
    assert _sorted_state(dst).equals(_sorted_state(src))


def test_lookup_point_reads_prune_partitions(tmp_path):
    """LakeTable.lookup reads ONLY the partitions owning the requested
    keys: results match a filtered full read, and lookups still succeed
    after every OTHER partition's files are made unreadable (proof the
    pruning never opens them)."""
    import os

    import numpy as np

    from cdm_data_loader_utils_ray.core.schemas import KEY_COLUMNS
    from cdm_data_loader_utils_ray.stages.partition import stable_key_hash

    ev = str(tmp_path / "ev.parquet")
    write_events(ev, make_events(num_keys=200, num_events=2500, seed=41))
    lake_dir = str(tmp_path / "lake")
    run_replay(ev, lake_dir, num_partitions=8)
    table = LakeTable(lake_dir)
    full = read_final_state_arrow(table)

    want = sorted(
        zip(full["repo"].to_pylist(), full["path"].to_pylist())
    )[:5] + [("ghost/repo", "nope.txt")]
    got = table.lookup(want)
    exp = full.filter(
        pa.compute.is_in(
            pa.compute.binary_join_element_wise(
                full["repo"].combine_chunks(), full["path"].combine_chunks(),
                pa.scalar("\x1f"),
            ),
            value_set=pa.array([f"{r}\x1f{p}" for r, p in want]),
        )
    )
    assert got.num_rows == exp.num_rows == 5
    assert sorted(got["content_sha256"].to_pylist()) == sorted(
        exp["content_sha256"].to_pylist()
    )

    # break every partition the lookup does NOT need: pruning proof
    m = table.latest_manifest()
    kt = pa.table({
        KEY_COLUMNS[0]: pa.array([k[0] for k in want]),
        KEY_COLUMNS[1]: pa.array([k[1] for k in want]),
    })
    needed = set(
        (stable_key_hash(kt, list(KEY_COLUMNS)) % np.uint64(m.num_partitions))
        .astype(np.int64).tolist()
    )
    for p in m.partitions.values():
        if p.pid not in needed:
            for f in p.files:
                os.rename(table.abspath(f), table.abspath(f) + ".hidden")
    got2 = table.lookup(want)
    assert sorted(got2["content_sha256"].to_pylist()) == sorted(
        exp["content_sha256"].to_pylist()
    )


def test_merge_into_not_matched_by_source_full_sync(lake_with_data):
    """when_not_matched_by_source='delete' (Delta WHEN NOT MATCHED BY
    SOURCE): with the default update+insert clauses, MERGE becomes a full
    sync — the table converges to exactly the source."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.pipelines.maintenance import merge_into

    table, _ = lake_with_data
    before = read_final_state_arrow(table).to_pandas()
    assert len(before) > 3
    # source: two existing keys (one updated) + one brand-new key
    src = pd.DataFrame(
        {
            "repo": [before["repo"].iloc[0], before["repo"].iloc[1], "sync/new"],
            "path": [before["path"].iloc[0], before["path"].iloc[1], "n.txt"],
            "commit": ["s1", "s2", "s3"],
            "lang": ["py", "py", "py"],
            "content": ["synced-0", before["content"].iloc[1], "synced-new"],
        }
    )
    merge_into(table, rd.from_pandas(src), when_not_matched_by_source="delete")
    after = read_final_state_arrow(table).to_pandas()
    keys = set(zip(after["repo"], after["path"]))
    assert keys == set(zip(src["repo"], src["path"]))  # exactly the source
    got = after.set_index(["repo", "path"])["content"]
    assert got[(before["repo"].iloc[0], before["path"].iloc[0])] == "synced-0"
    assert got[("sync/new", "n.txt")] == "synced-new"


def test_merge_into_by_source_with_matched_only_update(lake_with_data):
    """update + no-insert + delete-by-source: table converges to
    (table ∩ source) with matched rows updated; unmatched source rows
    neither insert nor block the stale delete."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.pipelines.maintenance import merge_into

    table, _ = lake_with_data
    before = read_final_state_arrow(table).to_pandas()
    src = pd.DataFrame(
        {
            "repo": [before["repo"].iloc[2], "never/seen"],
            "path": [before["path"].iloc[2], "x.txt"],
            "commit": ["k1", "k2"],
            "lang": ["py", "py"],
            "content": ["kept-and-updated", "ignored"],
        }
    )
    merge_into(
        table, rd.from_pandas(src),
        when_not_matched=None, when_not_matched_by_source="delete",
    )
    after = read_final_state_arrow(table).to_pandas()
    assert len(after) == 1
    assert after["content"].iloc[0] == "kept-and-updated"


def test_merge_into_by_source_validation(lake_with_data):
    import ray.data as rd

    from cdm_data_loader_utils_ray.pipelines.maintenance import merge_into

    table, _ = lake_with_data
    src = pd.DataFrame(
        {"repo": ["r"], "path": ["p"], "commit": ["c"], "lang": ["py"],
         "content": ["x"]}
    )
    with pytest.raises(ValueError):
        merge_into(table, rd.from_pandas(src), when_not_matched_by_source="upsert")
