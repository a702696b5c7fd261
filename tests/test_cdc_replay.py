"""End-to-end CDC replay: engine final state must converge to the oracle
materialization, row-by-row sha256-verified (BASELINE.json correctness gate),
including dedup, upsert-over-delete, schema-drift and resume cases."""

import hashlib
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdm_data_loader_utils_ray.audit.tables import AuditLog
from cdm_data_loader_utils_ray.pipelines.cdc import (
    apply_epoch,
    read_final_state,
    read_final_state_arrow,
    run_replay,
)
from cdm_data_loader_utils_ray.sinks.lake import LakeTable
from cdm_data_loader_utils_ray.stages.hashing import table_fingerprint
from cdm_data_loader_utils_ray.synth import (
    add_drift_v2,
    corrupt_events,
    make_events,
    rename_drift_v3,
    write_events,
)

NUM_KEYS, NUM_EVENTS, P = 300, 3000, 8


def _oracle_duckdb(events_path: str, extra_cols: str = "") -> "pa.Table":
    """Reference-style materialization in SQL: max-seq row per key, final
    deletes dropped, content sha256 computed by DuckDB."""
    con = duckdb.connect()
    q = f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
          FROM read_parquet('{events_path}')
        )
        SELECT repo, path, "commit", lang, content, seq,
               sha256(content) AS content_sha256 {extra_cols}
        FROM ranked WHERE rn = 1 AND op <> 'delete'
        ORDER BY repo, path
    """
    return con.sql(q).arrow()


def _check_convergence(state: pa.Table, oracle: pa.Table):
    assert len(state) == len(oracle)
    s = state.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    o = oracle.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(s["repo"]) == list(o["repo"])
    assert list(s["path"]) == list(o["path"])
    assert list(s["content_sha256"]) == list(o["content_sha256"])  # row invariant
    assert list(s["seq"]) == list(o["seq"])
    # whole-table order-independent fingerprint
    assert table_fingerprint(state) == table_fingerprint(oracle)


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ev") / "events.parquet")
    write_events(p, make_events(num_keys=NUM_KEYS, num_events=NUM_EVENTS, seed=42))
    return p


@pytest.mark.parametrize("mode", ["staging", "late"])
def test_replay_converges_single_epoch(events_path, tmp_path, mode):
    run_replay(events_path, str(tmp_path / "lake"), num_partitions=P, shuffle_mode=mode)
    state = read_final_state_arrow(LakeTable(str(tmp_path / "lake")))
    _check_convergence(state, _oracle_duckdb(events_path))


@pytest.mark.parametrize("mode", ["staging", "late"])
def test_replay_converges_multi_epoch_same_as_single(events_path, tmp_path, mode):
    run_replay(events_path, str(tmp_path / "multi"), num_partitions=P, epochs=3, shuffle_mode=mode)
    multi = read_final_state_arrow(LakeTable(str(tmp_path / "multi")))
    _check_convergence(multi, _oracle_duckdb(events_path))


@pytest.mark.parametrize("mode", ["late"])
def test_late_mode_resume_and_drift(events_path, tmp_path, mode):
    """Late shuffle: partial replay then full replay converges; corrupt
    events still quarantine (metadata-only reject records)."""
    lake_dir = str(tmp_path / "lake")
    run_replay(events_path, lake_dir, num_partitions=P, max_seq=NUM_EVENTS // 2,
               shuffle_mode=mode)
    run_replay(events_path, lake_dir, num_partitions=P, shuffle_mode=mode)
    state = read_final_state_arrow(LakeTable(lake_dir))
    _check_convergence(state, _oracle_duckdb(events_path))


def test_resume_after_partial_run(events_path, tmp_path):
    """FIXTURES §7: apply seq <= K, commit, then replay the FULL log — final
    state identical to one full run, no dupes, no gaps."""
    lake_dir = str(tmp_path / "lake")
    run_replay(events_path, lake_dir, num_partitions=P, max_seq=NUM_EVENTS // 2, epochs=1)
    t = LakeTable(lake_dir)
    m1 = t.latest_manifest()
    assert m1.epoch == 1
    run_replay(events_path, lake_dir, num_partitions=P)
    state = read_final_state_arrow(t)
    _check_convergence(state, _oracle_duckdb(events_path))
    # hwm advanced monotonically
    m2 = t.latest_manifest()
    for pid, e in m2.partitions.items():
        if pid in m1.partitions:
            assert e.hwm_seq >= m1.partitions[pid].hwm_seq


def test_duplicate_events_are_nilpotent(events_path, tmp_path):
    """Replaying the whole log twice == replaying once (at-least-once input,
    exactly-once state)."""
    lake_dir = str(tmp_path / "lake")
    run_replay(events_path, lake_dir, num_partitions=P)
    once = read_final_state_arrow(LakeTable(lake_dir))
    run_replay(events_path, lake_dir, num_partitions=P)
    twice = read_final_state_arrow(LakeTable(lake_dir))
    assert once.equals(twice)


def test_schema_drift_added_column(tmp_path):
    """events_v2: later epoch adds size_bytes; final table carries it with
    nulls for pre-drift rows (mergeSchema analogue)."""
    ev = make_events(num_keys=80, num_events=600, seed=5)
    v2 = add_drift_v2(ev, from_seq=301)
    df = v2.to_pandas()
    p1 = str(tmp_path / "e1.parquet")
    p2 = str(tmp_path / "e2.parquet")
    pa_t1 = pa.Table.from_pandas(df[df.seq <= 300].drop(columns=["size_bytes"]), preserve_index=False)
    pa_t2 = pa.Table.from_pandas(df[df.seq > 300], preserve_index=False)
    pq.write_table(pa_t1, p1)
    pq.write_table(pa_t2, p2)
    lake_dir = str(tmp_path / "lake")
    run_replay(p1, lake_dir, num_partitions=4)
    run_replay(p2, lake_dir, num_partitions=4)
    state = read_final_state_arrow(LakeTable(lake_dir))
    assert "size_bytes" in state.column_names
    oracle = _oracle_duckdb(str(tmp_path / "e*.parquet"))
    _check_convergence(state, oracle)
    # rows whose winning version predates the drift have null size_bytes
    s = state.to_pandas()
    assert s.loc[s.seq <= 300, "size_bytes"].isna().all()
    assert s.loc[s.seq > 300, "size_bytes"].notna().all()


def test_schema_drift_renamed_column(tmp_path):
    """events_v3: incoming column `language` mapped back to `lang` via the
    supplied rename map; old-epoch values preserved."""
    ev = make_events(num_keys=60, num_events=400, seed=9)
    df = ev.to_pandas()
    p1 = str(tmp_path / "e1.parquet")
    p2 = str(tmp_path / "e2.parquet")
    pq.write_table(pa.Table.from_pandas(df[df.seq <= 200], preserve_index=False), p1)
    renamed, rename_map = rename_drift_v3(
        pa.Table.from_pandas(df[df.seq > 200], preserve_index=False)
    )
    pq.write_table(renamed, p2)
    lake_dir = str(tmp_path / "lake")
    run_replay(p1, lake_dir, num_partitions=4)
    run_replay(p2, lake_dir, num_partitions=4, rename_map=rename_map)
    state = read_final_state_arrow(LakeTable(lake_dir))
    assert "lang" in state.column_names and "language" not in state.column_names
    con = duckdb.connect()
    oracle = con.sql(
        f"""
        WITH unioned AS (
          SELECT seq, op, repo, path, "commit", lang, content FROM read_parquet('{p1}')
          UNION ALL
          SELECT seq, op, repo, path, "commit", language AS lang, content FROM read_parquet('{p2}')
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) rn FROM unioned
        )
        SELECT repo, path, "commit", lang, content, seq, sha256(content) AS content_sha256
        FROM ranked WHERE rn = 1 AND op <> 'delete' ORDER BY repo, path
        """
    ).arrow()
    _check_convergence(state, oracle)


def test_rejects_and_metrics(tmp_path):
    """Corrupt events are quarantined with the reference error taxonomy and
    never reach the final state; metrics add up."""
    ev = corrupt_events(make_events(num_keys=50, num_events=500, seed=3))
    p = str(tmp_path / "ev.parquet")
    pq.write_table(ev, p)
    lake_dir = str(tmp_path / "lake")
    run_replay(p, lake_dir, num_partitions=4)
    t = LakeTable(lake_dir)
    log = AuditLog(t.audit_dir)
    rejects = log.read("rejects")
    metrics = log.read("metrics").to_pylist()[-1]
    assert len(rejects) > 0
    assert metrics["records_invalid"] == len(rejects)
    assert metrics["records_read"] == len(ev)
    errs = {e for lst in rejects["errors_in_record"].to_pylist() for e in lst}
    assert "parse_error" in errs
    assert any(e.startswith("missing_required:") for e in errs)
    # corrupt keys with null repo never reached the state
    state = read_final_state_arrow(t)
    assert state["repo"].null_count == 0
    # valid subset converges: oracle over rows that pass validation
    con = duckdb.connect()
    oracle = con.sql(
        f"""
        WITH clean AS (
          SELECT * FROM read_parquet('{p}')
          WHERE repo IS NOT NULL AND "commit" IS NOT NULL
            AND op IN ('insert','update','delete')
            AND (op = 'delete' OR content IS NOT NULL)
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) rn
          FROM clean
        )
        SELECT repo, path, "commit", lang, content, seq, sha256(content) AS content_sha256
        FROM ranked WHERE rn = 1 AND op <> 'delete' ORDER BY repo, path
        """
    ).arrow()
    _check_convergence(state, oracle)


def test_checkpoint_audit_rows(events_path, tmp_path):
    lake_dir = str(tmp_path / "lake")
    m = run_replay(events_path, lake_dir, num_partitions=P)
    log = AuditLog(LakeTable(lake_dir).audit_dir)
    cps = log.read("checkpoint").to_pandas()
    assert set(cps["partition_id"]) == set(m.hwm.keys())
    got = dict(zip(cps["partition_id"], cps["hwm_seq"]))
    assert got == m.hwm
    runs = log.read("run").to_pandas()
    assert list(runs["status"])[-1] == "SUCCESS"


def test_vacuum_and_preview(events_path, tmp_path):
    lake_dir = str(tmp_path / "lake")
    run_replay(events_path, lake_dir, num_partitions=P, epochs=3)
    t = LakeTable(lake_dir)
    before = len(os.listdir(t.data_dir))
    removed = t.vacuum(keep_epochs=1)
    assert len(os.listdir(t.data_dir)) == before - len(removed)
    # state still readable post-vacuum
    state = read_final_state_arrow(t)
    _check_convergence(state, _oracle_duckdb(events_path))
    prev = t.preview(5)
    assert len(prev) == 5


def test_read_final_state_streaming(events_path, tmp_path):
    """The Dataset-based reader (streaming path) agrees with the arrow one."""
    lake_dir = str(tmp_path / "lake")
    run_replay(events_path, lake_dir, num_partitions=P)
    t = LakeTable(lake_dir)
    ds = read_final_state(t)
    via_ds = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert via_ds.num_rows == read_final_state_arrow(t).num_rows


def test_replay_with_grouped_staging(tmp_path):
    """P large relative to CPUs engages pid-GROUP staging (group_size > 1):
    both shuffle modes must converge identically to the keyed oracle."""
    from cdm_data_loader_utils_ray.pipelines.cdc import _staging_group_size
    from cdm_data_loader_utils_ray.state.upsert import oracle_materialize

    assert _staging_group_size(256) > 1  # 4-CPU test session
    ev = str(tmp_path / "ev.parquet")
    events = make_events(num_keys=300, num_events=4000, seed=77)
    write_events(ev, events)
    import pyarrow.parquet as pq

    expected = oracle_materialize(pq.read_table(ev))
    for mode in ("staging", "late"):
        lake_dir = str(tmp_path / f"lake_{mode}")
        run_replay(ev, lake_dir, num_partitions=256, shuffle_mode=mode)
        state = read_final_state_arrow(LakeTable(lake_dir))
        assert state.num_rows == len(expected)
        got = state.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
        assert list(got["seq"]) == list(expected["seq"])
        assert list(got["content"]) == list(expected["content"])
