"""Cross-cutting robustness: late-mode schema drift, compaction vs replay,
hot-key skew bounding, and property-based engine-vs-oracle convergence."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdm_data_loader_utils_ray.core.schemas import EVENT_SCHEMA
from cdm_data_loader_utils_ray.pipelines.cdc import (
    EventPrep,
    read_final_state_arrow,
    run_replay,
)
from cdm_data_loader_utils_ray.pipelines.maintenance import compact
from cdm_data_loader_utils_ray.sinks.lake import LakeTable
from cdm_data_loader_utils_ray.state.upsert import oracle_materialize
from cdm_data_loader_utils_ray.synth import add_drift_v2, make_events, rename_drift_v3


def _converged(lake_dir: str, events_paths: list[str]) -> None:
    state = read_final_state_arrow(LakeTable(lake_dir))
    con = duckdb.connect()
    files = ", ".join(f"'{p}'" for p in events_paths)
    oracle = con.sql(
        f"""
        WITH r AS (SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) rn
                   FROM read_parquet([{files}], union_by_name=true))
        SELECT repo, path, seq, sha256(content) AS content_sha256
        FROM r WHERE rn=1 AND op<>'delete' ORDER BY repo, path
        """
    ).arrow()
    s = state.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    o = oracle.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(s) == len(o)
    assert list(s["seq"]) == list(o["seq"])
    assert list(s["content_sha256"]) == list(o["content_sha256"])


def test_late_mode_added_column_drift(tmp_path):
    ev = make_events(num_keys=60, num_events=500, seed=31)
    v2 = add_drift_v2(ev, from_seq=251)
    df = v2.to_pandas()
    p1, p2 = str(tmp_path / "e1.parquet"), str(tmp_path / "e2.parquet")
    pq.write_table(
        pa.Table.from_pandas(df[df.seq <= 250].drop(columns=["size_bytes"]), preserve_index=False), p1
    )
    pq.write_table(pa.Table.from_pandas(df[df.seq > 250], preserve_index=False), p2)
    lake = str(tmp_path / "lake")
    run_replay(p1, lake, num_partitions=4, shuffle_mode="late")
    run_replay(p2, lake, num_partitions=4, shuffle_mode="late")
    state = read_final_state_arrow(LakeTable(lake))
    assert "size_bytes" in state.column_names
    s = state.to_pandas()
    assert s.loc[s.seq <= 250, "size_bytes"].isna().all()
    assert s.loc[s.seq > 250, "size_bytes"].notna().all()
    _converged(lake, [p1, p2])


def test_late_mode_renamed_column_drift(tmp_path):
    ev = make_events(num_keys=50, num_events=400, seed=33)
    df = ev.to_pandas()
    p1, p2 = str(tmp_path / "e1.parquet"), str(tmp_path / "e2.parquet")
    pq.write_table(pa.Table.from_pandas(df[df.seq <= 200], preserve_index=False), p1)
    renamed, rename_map = rename_drift_v3(
        pa.Table.from_pandas(df[df.seq > 200], preserve_index=False)
    )
    pq.write_table(renamed, p2)
    lake = str(tmp_path / "lake")
    run_replay(p1, lake, num_partitions=4, shuffle_mode="late")
    run_replay(p2, lake, num_partitions=4, rename_map=rename_map, shuffle_mode="late")
    state = read_final_state_arrow(LakeTable(lake))
    assert "lang" in state.column_names and "language" not in state.column_names
    # rename map must not affect key/content columns
    pq.write_table(ev, str(tmp_path / "all.parquet"))
    _converged(lake, [str(tmp_path / "all.parquet")])


def test_compact_then_duplicate_replay_is_noop(tmp_path):
    """Tombstone compaction must not let already-applied duplicate events
    resurrect deleted keys: hwm skip + retention contract."""
    ev_path = str(tmp_path / "ev.parquet")
    pq.write_table(make_events(num_keys=80, num_events=800, seed=37), ev_path)
    lake = str(tmp_path / "lake")
    run_replay(ev_path, lake, num_partitions=4)
    t = LakeTable(lake)
    before = read_final_state_arrow(t)
    compact(t)
    # replay the SAME log again (pure duplicate delivery)
    run_replay(ev_path, lake, num_partitions=4)
    after = read_final_state_arrow(t)
    assert before.num_rows == after.num_rows
    b = before.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    a = after.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(b["content_sha256"]) == list(a["content_sha256"])


def test_hot_key_volume_bounded_by_prereduce(tmp_path):
    """A single key owning 50% of all events must reach its partition as at
    most one row per map batch (the within-batch LWW combiner defuses
    hot-key shuffle volume without salting)."""
    base = make_events(num_keys=50, num_events=500, seed=41).to_pandas()
    hot = base.iloc[:1][["repo", "path", "lang"]]
    n_hot = 500
    hot_events = pd.DataFrame(
        {
            "seq": np.arange(10_000, 10_000 + n_hot, dtype=np.int64),
            "op": "update",
            "repo": hot["repo"].iloc[0],
            "path": hot["path"].iloc[0],
            "commit": [f"{i:040x}" for i in range(n_hot)],
            "lang": hot["lang"].iloc[0],
            "content": [f"content v{i}" for i in range(n_hot)],
        }
    )
    df = pd.concat([base, hot_events], ignore_index=True)
    events = pa.Table.from_pandas(df, schema=EVENT_SCHEMA, preserve_index=False)
    prep = EventPrep(EVENT_SCHEMA, 8, {})
    out = prep(events)  # ONE batch -> hot key must collapse to 1 row
    hot_rows = out.to_pandas()
    hot_count = len(
        hot_rows[(hot_rows.repo == hot["repo"].iloc[0]) & (hot_rows.path == hot["path"].iloc[0])]
    )
    assert hot_count == 1
    # winning version survives
    assert hot_rows.loc[
        (hot_rows.repo == hot["repo"].iloc[0]) & (hot_rows.path == hot["path"].iloc[0]), "seq"
    ].iloc[0] == 10_000 + n_hot - 1


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(0, 10_000),
    num_keys=st.integers(5, 60),
    num_events=st.integers(20, 400),
    epochs=st.integers(1, 3),
    mode=st.sampled_from(["staging", "late"]),
)
def test_property_engine_matches_oracle(tmp_path_factory, seed, num_keys, num_events, epochs, mode):
    """Random logs, random epoch splits, both shuffle modes: engine final
    state always equals the pandas oracle materialization."""
    work = tmp_path_factory.mktemp("prop")
    ev = make_events(num_keys=num_keys, num_events=num_events, seed=seed)
    ev_path = str(work / "ev.parquet")
    pq.write_table(ev, ev_path)
    lake = str(work / "lake")
    run_replay(ev_path, lake, num_partitions=4, epochs=epochs, shuffle_mode=mode, audit=False)
    state = read_final_state_arrow(LakeTable(lake)).to_pandas()
    oracle = oracle_materialize(ev)
    assert len(state) == len(oracle)
    s = state.sort_values(["repo", "path"]).reset_index(drop=True)
    o = oracle.sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(s["seq"]) == list(o["seq"])
    assert list(s["commit"]) == list(o["commit"])


def test_custom_validator_plugin(tmp_path):
    """User-supplied predicate validator routes rows to rejects like
    built-ins (reference Validator callback surface)."""
    import pyarrow.compute as pc

    from cdm_data_loader_utils_ray.audit.tables import AuditLog
    from cdm_data_loader_utils_ray.stages.validate import predicate_validator

    ev_path = str(tmp_path / "ev.parquet")
    pq.write_table(make_events(num_keys=40, num_events=300, seed=51), ev_path)
    lake = str(tmp_path / "lake")
    # reject every event for files with lang == 'md'
    v = predicate_validator(lambda t: pc.equal(t["lang"], "md"), "custom: markdown_blocked")
    run_replay(ev_path, lake, num_partitions=4, extra_validators=[v])
    t = LakeTable(lake)
    state = read_final_state_arrow(t)
    assert "md" not in set(state["lang"].to_pylist())
    rejects = AuditLog(t.audit_dir).read("rejects")
    errs = {e for lst in rejects["errors_in_record"].to_pylist() for e in lst}
    assert "custom: markdown_blocked" in errs


def test_out_of_order_delivery_converges(tmp_path):
    """Arrival order is irrelevant: a fully shuffled event log must produce
    the same final state as the ordered one (LWW by seq, not arrival)."""
    ev = make_events(num_keys=60, num_events=600, seed=77)
    df = ev.to_pandas().sample(frac=1.0, random_state=5).reset_index(drop=True)
    shuffled = pa.Table.from_pandas(df, schema=ev.schema, preserve_index=False)
    p_ord, p_shuf = str(tmp_path / "ord.parquet"), str(tmp_path / "shuf.parquet")
    pq.write_table(ev, p_ord)
    pq.write_table(shuffled, p_shuf)
    for mode in ("staging", "late"):
        run_replay(p_ord, str(tmp_path / f"l1-{mode}"), num_partitions=4, shuffle_mode=mode)
        run_replay(p_shuf, str(tmp_path / f"l2-{mode}"), num_partitions=4, shuffle_mode=mode)
        a = read_final_state_arrow(LakeTable(str(tmp_path / f"l1-{mode}")))
        b = read_final_state_arrow(LakeTable(str(tmp_path / f"l2-{mode}")))
        assert a.equals(b), mode


def test_table_constraints_enforced_on_replay(tmp_path):
    """Persisted CHECK constraints (stages/constraints.py) bind on the
    batch replay path automatically: violating events quarantine to the
    audit rejects, the committed state never contains them, and NULL
    cells satisfy value rules (SQL CHECK semantics)."""
    import pyarrow.compute as pc

    from cdm_data_loader_utils_ray.audit.tables import AuditLog
    from cdm_data_loader_utils_ray.pipelines.cdc import read_final_state_arrow, run_replay
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable
    from cdm_data_loader_utils_ray.stages.constraints import compile_constraints
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = make_events(num_keys=80, num_events=1000, seed=19)
    langs = sorted({v for v in ev["lang"].to_pylist() if v is not None})
    assert len(langs) >= 2
    banned, allowed = langs[0], langs[1:]
    ev_path = str(tmp_path / "ev.parquet")
    write_events(ev_path, ev)

    lake_dir = str(tmp_path / "lake")
    t = LakeTable(lake_dir)
    t.set_properties({"constraints": {"lang": {"allowed": allowed}}})
    run_replay(ev_path, lake_dir, num_partitions=4)

    state = read_final_state_arrow(t)
    assert banned not in set(state["lang"].to_pylist())
    # NULL lang rows satisfy the allowed-rule (no not_null declared)
    assert None in set(state["lang"].to_pylist())
    rejects = AuditLog(t.audit_dir).read("rejects")
    errs = {e for lst in rejects["errors_in_record"].to_pylist() for e in lst}
    assert "constraint:lang:allowed" in errs
    # deletes are exempt from payload rules (constraints govern WRITTEN
    # data), so exactly the banned NON-delete events are quarantined
    n_banned = len(
        ev.filter(
            pc.and_(pc.equal(ev["lang"], banned),
                    pc.not_equal(ev["op"], "delete"))
        )
    )
    n_tagged = sum(
        "constraint:lang:allowed" in lst
        for lst in rejects["errors_in_record"].to_pylist()
    )
    assert n_tagged == n_banned  # every banned upsert quarantined exactly once

    # deletes carry null payloads BY DESIGN: a not_null payload rule must
    # never quarantine them (Delta CHECK governs written data only)
    lake2 = str(tmp_path / "lake2")
    t2 = LakeTable(lake2)
    t2.set_properties({"constraints": {"content": {"not_null": True}}})
    run_replay(ev_path, lake2, num_partitions=4)
    unconstrained = str(tmp_path / "lake3")
    run_replay(ev_path, unconstrained, num_partitions=4)
    s2 = read_final_state_arrow(t2)
    s3 = read_final_state_arrow(LakeTable(unconstrained))
    # upsert contents are non-null in synth, so the constrained table must
    # converge IDENTICALLY — deletes included
    assert s2.sort_by([("repo", "ascending"), ("path", "ascending")]).equals(
        s3.sort_by([("repo", "ascending"), ("path", "ascending")])
    )

    # streaming path: the same persisted constraints bind in feed() —
    # violations are counted and dropped (streaming contract)
    import ray.data as rd

    from cdm_data_loader_utils_ray.state.streaming import StreamingUpserter

    su = StreamingUpserter(str(tmp_path / "stream"), num_partitions=2)
    LakeTable(su.table.dir).set_properties(
        {"constraints": {"lang": {"allowed": allowed}}}
    )
    su.feed(rd.read_parquet(ev_path))
    su.commit()
    stream_state = read_final_state_arrow(su.table)
    su.shutdown()
    assert banned not in set(stream_state["lang"].to_pylist())
    assert su.rejected > 0

    # a typo'd rule kind must fail at DECLARATION time
    with pytest.raises(ValueError, match="unknown constraint rule"):
        compile_constraints({"lang": {"betweenish": 1}})
    # constraints on absent columns don't fire (schema-evolution friendly)
    assert compile_constraints({"ghost": {"min": 3}})[0](ev) == []
