"""Footer-statistics data skipping on the lake read path."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdm_data_loader_utils_ray.sinks.lake import (
    LakeTable,
    Manifest,
    chain_may_match,
)


def _write(dirpath, name, seqs):
    t = pa.table({"seq": pa.array(seqs, type=pa.int64()),
                  "repo": ["r"] * len(seqs),
                  "path": [f"p{s}" for s in seqs],
                  "content": ["x"] * len(seqs)})
    pq.write_table(t, os.path.join(dirpath, name))
    return t


def test_chain_may_match_footer_pruning(tmp_path):
    d = str(tmp_path)
    _write(d, "a.parquet", [10, 20, 30])
    _write(d, "b.parquet", [100, 110])

    files = ["a.parquet", "b.parquet"]
    assert chain_may_match(d, files, "seq", 25, 28)        # inside a's range
    assert chain_may_match(d, files, "seq", 105, 105)      # inside b's range
    assert not chain_may_match(d, files, "seq", 31, 99)    # gap between files
    assert not chain_may_match(d, files, "seq", 200, None) # above all
    assert not chain_may_match(d, files, "seq", None, 5)   # below all
    assert chain_may_match(d, files, "seq", None, None)    # unbounded
    assert chain_may_match(d, files, "missing_col", 0, 1)  # conservative
    # string column stats work too
    assert chain_may_match(d, files, "path", "p10", "p10")
    assert not chain_may_match(d, files, "path", "q", "z")


def test_read_state_column_range(ray_session, tmp_path):
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "events.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=200, num_events=2000, seed=7))
    run_replay(ev, lake, num_partitions=8)

    table = LakeTable(lake)
    full = table.read_state().to_pandas()
    # LWW winner seqs cluster near the log end — pick a range guaranteed
    # non-empty (the interquartile band of the actual winner seqs)
    lo, hi = int(full["seq"].quantile(0.25)), int(full["seq"].quantile(0.75))
    exp = full[(full["seq"] >= lo) & (full["seq"] <= hi)]
    assert len(exp) > 0
    got = table.read_state(column_range={"seq": (lo, hi)}).to_pandas()
    assert sorted(got["seq"].tolist()) == sorted(exp["seq"].tolist())
    assert sorted(got.columns) == sorted(full.columns)
    # a provably-empty range returns zero rows without error
    assert len(table.read_state(column_range={"seq": (10**12, None)}).to_pandas()) == 0


def test_update_where_column_range_hint(ray_session, tmp_path):
    import pyarrow.compute as pc

    from cdm_data_loader_utils_ray.pipelines.cdc import (
        read_final_state_arrow,
        run_replay,
    )
    from cdm_data_loader_utils_ray.pipelines.maintenance import update_where
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "events.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=150, num_events=1500, seed=13))
    run_replay(ev, lake, num_partitions=6)
    table = LakeTable(lake)
    before = read_final_state_arrow(table)
    lo = int(pc.approximate_median(before["seq"]).as_py())

    def pred(t):
        return pc.greater_equal(t["seq"], lo)

    def setter(t):
        return t.set_column(
            t.schema.get_field_index("lang"), "lang",
            pa.array(["late"] * len(t), type=pa.string()),
        )

    m, n = update_where(table, pred, setter, column_range={"seq": (lo, None)})
    after = read_final_state_arrow(table)
    n_expected = len(before.filter(pc.greater_equal(before["seq"], lo)))
    assert len(after.filter(pc.equal(after["lang"], "late"))) >= n_expected
    assert len(after) == len(before)
    assert n >= n_expected
    # a hint that provably excludes every chain rewrites nothing
    m2, n2 = update_where(
        table, lambda t: pc.greater_equal(t["seq"], 10**12),
        setter, column_range={"seq": (10**12, None)},
    )
    assert n2 == 0 and m2.metrics["updated_partitions"] == 0
    # and the chains were carried forward untouched (same files)
    for pid, entry in m2.partitions.items():
        assert entry.files == m.partitions[pid].files


def test_read_changes_cdf(ray_session, tmp_path):
    import pyarrow.compute as pc

    from cdm_data_loader_utils_ray.pipelines.cdc import apply_epoch, run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev_all = make_events(num_keys=80, num_events=1200, seed=31)
    lake = os.path.join(str(tmp_path), "lake")
    # epoch 1: first 60% of the log; epoch 2: the rest
    cut = int(len(ev_all) * 0.6)
    p1 = os.path.join(str(tmp_path), "e1.parquet")
    p2 = os.path.join(str(tmp_path), "e2.parquet")
    write_events(p1, ev_all.slice(0, cut))
    write_events(p2, ev_all.slice(cut))
    run_replay(p1, lake, num_partitions=4)
    table = LakeTable(lake)
    e1 = table.latest_epoch()
    run_replay(p2, lake, num_partitions=4)
    e2 = table.latest_epoch()
    assert e2 > e1

    cdf = table.read_changes(from_epoch=e1, to_epoch=e2).to_pandas()
    assert set(cdf["change_type"]) <= {"upsert", "delete"}
    # CDF keys: at most the keys the second feed touched (a delete of a
    # never-existing key writes no delta row), at least every key whose
    # state actually differs between the two epochs; one row per key
    seqs2 = ev_all.slice(cut)
    touched = {(r, p) for r, p in zip(seqs2["repo"].to_pylist(), seqs2["path"].to_pylist())}
    got_keys = set(zip(cdf["repo"], cdf["path"]))
    assert got_keys <= touched
    assert len(cdf) == len(got_keys)

    def _state_map(manifest):
        df = table.read_state(manifest=manifest, live_only=True).to_pandas()
        return {
            (r, p): s
            for r, p, s in zip(df["repo"], df["path"], df["content_sha256"])
        }

    s1 = _state_map(table.read_manifest(e1))
    s2 = _state_map(table.read_manifest(e2))
    changed = {k for k in set(s1) | set(s2) if s1.get(k) != s2.get(k)}
    assert changed <= got_keys
    # net value parity: an upserted key's sha equals the final state's
    state = table.read_state().to_pandas().set_index(["repo", "path"])
    ups = cdf[cdf["change_type"] == "upsert"].set_index(["repo", "path"])
    joined = ups.join(state, how="inner", rsuffix="_state")
    assert (joined["content_sha256"] == joined["content_sha256_state"]).all()
    # from_epoch=None emits the full net state-change set (all live + deletes)
    full_cdf = table.read_changes(from_epoch=None).to_pandas()
    assert len(full_cdf) >= len(state)


def test_compact_sort_by_tightens_stats(ray_session, tmp_path):
    from cdm_data_loader_utils_ray.pipelines.cdc import (
        read_final_state_arrow,
        run_replay,
    )
    from cdm_data_loader_utils_ray.pipelines.maintenance import compact
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "events.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=120, num_events=1500, seed=17))
    run_replay(ev, lake, num_partitions=4)
    table = LakeTable(lake)
    before = read_final_state_arrow(table)
    compact(table, sort_by="seq")
    after = read_final_state_arrow(table)
    # compaction is state-preserving
    assert before.sort_by([("repo", "ascending"), ("path", "ascending")]).equals(
        after.sort_by([("repo", "ascending"), ("path", "ascending")])
    )
    # every rewritten file is physically ordered by seq
    m = table.latest_manifest()
    for p in m.partitions.values():
        assert len(p.files) == 1
        seqs = pq.read_table(table.abspath(p.files[0]), columns=["seq"])["seq"].to_pylist()
        assert seqs == sorted(seqs)


def test_read_changes_compaction_only_window_is_empty(ray_session, tmp_path):
    """A window containing ONLY a compaction has no logical changes: the
    manifest walk skips the state-preserving rewrite instead of emitting
    the whole table (r3 verdict #3)."""
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.pipelines.maintenance import compact
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "events.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=60, num_events=600, seed=41))
    run_replay(ev, lake, num_partitions=4)
    table = LakeTable(lake)
    e1 = table.latest_epoch()
    compact(table, sort_by="seq")  # rewrites every chain, preserves state
    e2 = table.latest_epoch()

    cdf = table.read_changes(from_epoch=e1, to_epoch=e2).to_pandas()
    assert len(cdf) == 0


def test_read_changes_granularity_survives_compaction(ray_session, tmp_path):
    """epoch1 -> epoch2 -> COMPACT -> epoch3: read_changes(from=e1) must
    return exactly the epoch2+epoch3 churn (O(churn)), not the full table,
    because the pre-compaction delta files are still retained."""
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.pipelines.maintenance import compact
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    # wide key universe, small churn window: epochs 2+3 hold only the last
    # 15% of events so the touched-key set is much smaller than the table
    ev_all = make_events(num_keys=600, num_events=3000, seed=57)
    lake = os.path.join(str(tmp_path), "lake")
    c1, c2 = int(len(ev_all) * 0.85), int(len(ev_all) * 0.925)
    paths = []
    for i, sl in enumerate(
        [ev_all.slice(0, c1), ev_all.slice(c1, c2 - c1), ev_all.slice(c2)]
    ):
        p = os.path.join(str(tmp_path), f"e{i}.parquet")
        write_events(p, sl)
        paths.append(p)
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay

    run_replay(paths[0], lake, num_partitions=4)
    table = LakeTable(lake)
    e1 = table.latest_epoch()
    run_replay(paths[1], lake, num_partitions=4)
    compact(table)
    run_replay(paths[2], lake, num_partitions=4)
    e_final = table.latest_epoch()

    cdf = table.read_changes(from_epoch=e1, to_epoch=e_final).to_pandas()
    # keys limited to what epochs 2+3 touched — NOT the whole table
    import pyarrow as pa

    later = pa.concat_tables([ev_all.slice(c1, c2 - c1), ev_all.slice(c2)])
    touched = set(zip(later["repo"].to_pylist(), later["path"].to_pylist()))
    got_keys = set(zip(cdf["repo"], cdf["path"]))
    assert got_keys <= touched
    assert len(cdf) == len(got_keys)  # one net row per key
    state = table.read_state().to_pandas()
    assert len(cdf) < len(state)  # O(churn), not O(table)
    # every key whose state differs e1 -> final is present
    def smap(epoch):
        df = table.read_state(manifest=table.read_manifest(epoch)).to_pandas()
        return {(r, p): s for r, p, s in
                zip(df["repo"], df["path"], df["content_sha256"])}

    s1, s2 = smap(e1), smap(e_final)
    changed = {k for k in set(s1) | set(s2) if s1.get(k) != s2.get(k)}
    assert changed <= got_keys
    # upsert rows carry the FINAL value
    idx = state.set_index(["repo", "path"])
    ups = cdf[cdf["change_type"] == "upsert"].set_index(["repo", "path"])
    j = ups.join(idx, how="inner", rsuffix="_st")
    assert (j["content_sha256"] == j["content_sha256_st"]).all()
    assert len(j) == len(ups)  # every upserted key exists in final state

    # once vacuum reclaims the pre-compaction deltas, the read degrades to
    # the documented full-state fallback instead of crashing
    table.vacuum(keep_epochs=1)
    cdf2 = table.read_changes(from_epoch=e1, to_epoch=e_final).to_pandas()
    # full current state as upserts (+ tombstones still in the post-compact
    # chain for keys whose final op was a delete)
    ups2 = cdf2[cdf2["change_type"] == "upsert"]
    assert len(ups2) == len(state)
    assert set(cdf2["change_type"]) <= {"upsert", "delete"}


def test_read_changes_update_where_still_falls_back(ray_session, tmp_path):
    """A state-CHANGING rewrite (update_where) in the window must still
    emit full state for the rewritten partitions — skipping it would lose
    its changes."""
    import pyarrow.compute as pc

    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.pipelines.maintenance import update_where
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "events.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=50, num_events=400, seed=7))
    run_replay(ev, lake, num_partitions=2)
    table = LakeTable(lake)
    e1 = table.latest_epoch()

    def setter(t):
        return t.set_column(
            t.column_names.index("lang"), "lang",
            pa.array(["xx"] * len(t), type=pa.string()),
        )

    _, n = update_where(table, lambda t: pc.is_valid(t["repo"]), setter)
    assert n > 0
    e2 = table.latest_epoch()
    cdf = table.read_changes(from_epoch=e1, to_epoch=e2).to_pandas()
    # the update touched every partition -> full-state emission, and the
    # updated column value is visible
    state = table.read_state().to_pandas()
    assert len(cdf) >= len(state)
    assert set(cdf[cdf["change_type"] == "upsert"]["lang"]) == {"xx"}


def test_chain_may_match_type_mismatch_is_conservative(tmp_path):
    """An int bound against a string column's stats must not raise — it
    falls back to True (cannot prove disjoint), r3 ADVICE fix."""
    d = str(tmp_path)
    _write(d, "a.parquet", [10, 20, 30])
    assert chain_may_match(d, ["a.parquet"], "path", 100, 200)


def test_read_state_types_range_bounds_from_schema(tmp_path, ray_session):
    """read_state(column_range=...) casts bounds to the column's schema
    type: int bounds on the string `path` column become string bounds
    (lexicographic range) instead of crashing in chain_may_match or the
    row filter; an uncastable bound raises a clear ValueError."""
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = str(tmp_path / "ev.parquet")
    write_events(ev, make_events(num_keys=30, num_events=200, seed=5))
    lake = str(tmp_path / "lake")
    run_replay(ev, lake, num_partitions=2)
    table = LakeTable(lake)
    full = table.read_state().to_pandas()

    # int bounds on a string column: typed to "100".."200", must not raise
    got = table.read_state(column_range={"path": (100, 200)}).to_pandas()
    want = full[(full["path"] >= "100") & (full["path"] <= "200")]
    assert len(got) == len(want)

    # int bounds on the int seq column still behave as ints
    lo, hi = int(full["seq"].min()), int(full["seq"].median())
    got2 = table.read_state(column_range={"seq": (lo, hi)}).to_pandas()
    assert len(got2) == int((full["seq"] >= lo).mul(full["seq"] <= hi).sum())

    with pytest.raises(ValueError, match="does not cast"):
        table.read_state(column_range={"seq": ("not-a-number", None)}).to_pandas()
    with pytest.raises(ValueError, match="not in table schema"):
        table.read_state(column_range={"nope": (1, 2)}).to_pandas()


def test_read_state_column_projection(ray_session, tmp_path):
    """columns= is a projection PUSHDOWN: result matches the full read's
    projection, predicates on non-requested columns still apply, and
    validation rejects unknown / contradictory requests."""
    import pytest

    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "events.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=120, num_events=900, seed=19))
    run_replay(ev, lake, num_partitions=4)
    table = LakeTable(lake)

    full = table.read_state().to_pandas().sort_values(["repo", "path"])
    got = table.read_state(columns=["repo", "path", "content_sha256"]).to_pandas()
    assert sorted(got.columns) == ["content_sha256", "path", "repo"]
    got = got.sort_values(["repo", "path"])
    assert got["content_sha256"].tolist() == full["content_sha256"].tolist()

    # range predicate on a column NOT in the projection still filters
    lo = int(full["seq"].quantile(0.5))
    exp = full[full["seq"] >= lo]
    got2 = table.read_state(
        columns=["repo", "path"], column_range={"seq": (lo, None)}
    ).to_pandas().sort_values(["repo", "path"])
    assert "seq" not in got2.columns
    assert got2["path"].tolist() == exp.sort_values(["repo", "path"])["path"].tolist()

    with pytest.raises(ValueError):
        table.read_state(columns=["nope"])
    with pytest.raises(ValueError):
        table.read_state(columns=["repo", "is_deleted"])  # live_only drops it
    # tombstone flag IS readable with live_only=False
    t3 = table.read_state(columns=["repo", "is_deleted"], live_only=False).to_pandas()
    assert set(t3.columns) == {"repo", "is_deleted"}
    assert t3["is_deleted"].any()  # fixture contains deletes


def test_lookup_column_projection(ray_session, tmp_path):
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "events.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=50, num_events=400, seed=41))
    run_replay(ev, lake, num_partitions=4)
    table = LakeTable(lake)
    full = table.read_state().to_pandas()
    want = [tuple(r) for r in full[["repo", "path"]].iloc[:3].itertuples(index=False)]
    t = table.lookup(want, columns=["repo", "path", "content_sha256"])
    assert sorted(t.column_names) == ["content_sha256", "path", "repo"]
    exp = full.set_index(["repo", "path"]).loc[list(want), "content_sha256"]
    assert sorted(t["content_sha256"].to_pylist()) == sorted(exp.tolist())
    # full-schema lookup unchanged
    t2 = table.lookup(want)
    assert set(t2.column_names) == set(full.columns)
