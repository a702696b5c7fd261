"""Regression tests for the round-4 review of the exactly-once CDC core:
streaming-resume rename/schema handling, shard-pool CPU reservation,
vacuum vs in-flight phase-1 writes, reject accounting, and late-mode
reader signature tolerance."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.core.schemas import state_schema as make_state_schema
from cdm_data_loader_utils_ray.pipelines.cdc import (
    apply_epoch,
    read_final_state,
    read_final_state_arrow,
    run_replay,
)
from cdm_data_loader_utils_ray.sinks.lake import LakeTable, Manifest
from cdm_data_loader_utils_ray.state.streaming import (
    StreamingUpserter,
    shard_cpu_reservation,
)
from cdm_data_loader_utils_ray.synth import corrupt_events, make_events, write_events


def test_streaming_resume_applies_rename_history(tmp_path):
    """Chain files written before a column rename must rehydrate through
    rename_history: pre-fix, UpsertShard aligned the old-named column to
    null and the next chain fold persisted the loss."""
    table = LakeTable(str(tmp_path / "t"))
    old = pa.table(
        {
            "seq": pa.array([1, 2], pa.int64()),
            "repo": ["r", "r"],
            "path": ["a", "b"],
            "commit": ["c1", "c2"],
            "language": ["py", "go"],  # pre-rename column name
            "content": ["x", "y"],
            "content_sha256": ["h1", "h2"],
            "is_deleted": pa.array([False, False]),
        }
    )
    entry = table.write_partition(old, 0, 1)
    table.commit(
        Manifest(
            epoch=1,
            num_partitions=1,
            schema=make_state_schema(),  # canonical: `lang`
            partitions={0: entry},
            rename_history={"language": "lang"},
            run_id="seed",
        )
    )
    # max_chain_len=1 forces the next snapshot to fold resident state into
    # a new base file — the write that would persist the corruption
    s = StreamingUpserter(table.dir, max_chain_len=1)
    ev = pa.table(
        {
            "seq": pa.array([3], pa.int64()),
            "op": ["update"],
            "repo": ["r"],
            "path": ["a"],
            "commit": ["c3"],
            "lang": ["py"],
            "content": ["z"],
        }
    )
    s.feed(rd.from_arrow(ev))
    s.commit()
    s.shutdown()
    state = read_final_state_arrow(table)
    langs = {(r["repo"], r["path"]): r["lang"] for r in state.to_pylist()}
    assert langs[("r", "b")] == "go"  # untouched key keeps its renamed value
    assert langs[("r", "a")] == "py"


def test_shard_cpu_reservation_caps_pool():
    """P x per-shard must never exceed half the cluster (the old 0.01 floor
    reserved 10.24 CPUs for P=1024 on 8 CPUs and deadlocked feed())."""
    for cpus, p in [(8, 1024), (4, 257), (32, 1024), (4, 64), (32, 4)]:
        per = shard_cpu_reservation(cpus, p)
        assert per * p <= cpus / 2.0 + 1e-9
        assert per >= 0.0
        assert round(per * 10000) == pytest.approx(per * 10000)  # 1e-4 grid
    assert shard_cpu_reservation(32, 4) == 0.25  # small pools keep the cap


def test_streaming_resume_uses_evolved_event_schema(tmp_path):
    """Resume over a table with an evolved column must prep events against
    the evolved schema — pre-fix the default EVENT_SCHEMA dropped the
    column and LWW nulled it on every updated key."""
    ev = make_events(num_keys=40, num_events=200, seed=5).to_pandas()
    ev["size_bytes"] = np.arange(len(ev), dtype="int64") + 10
    p1 = str(tmp_path / "e1.parquet")
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False), p1)
    lake_dir = str(tmp_path / "lake")
    run_replay(p1, lake_dir, num_partitions=2)
    state0 = read_final_state_arrow(LakeTable(lake_dir))
    assert "size_bytes" in state0.column_names

    s = StreamingUpserter(lake_dir)
    assert "size_bytes" in s.event_schema.names
    row = state0.to_pylist()[0]
    upd = pa.table(
        {
            "seq": pa.array([int(ev["seq"].max()) + 1], pa.int64()),
            "op": ["update"],
            "repo": [row["repo"]],
            "path": [row["path"]],
            "commit": ["c-new"],
            "lang": [row["lang"]],
            "content": ["updated"],
            "size_bytes": pa.array([123], pa.int64()),
        }
    )
    s.feed(rd.from_arrow(upd))
    s.commit()
    s.shutdown()
    state = read_final_state_arrow(LakeTable(lake_dir))
    got = [
        r
        for r in state.to_pylist()
        if r["repo"] == row["repo"] and r["path"] == row["path"]
    ]
    assert got[0]["size_bytes"] == 123


def test_vacuum_keeps_inflight_phase1_files(tmp_path):
    """vacuum must not delete phase-1 files of an epoch above the committed
    LATEST (an in-flight apply), but still reclaims old unreferenced ones."""
    ev = str(tmp_path / "ev.parquet")
    write_events(ev, make_events(num_keys=30, num_events=200, seed=11))
    lake_dir = str(tmp_path / "lake")
    run_replay(ev, lake_dir, num_partitions=2)
    table = LakeTable(lake_dir)
    latest = table.latest_epoch()

    small = make_state_schema().empty_table()
    inflight = table.abspath(table.partition_file(0, latest + 1))
    table.write_partition(small, 0, latest + 1)  # phase-1, uncommitted
    orphan = table.abspath(table.partition_file(9, 0))
    pq.write_table(small, orphan)  # stale unreferenced file

    import os

    removed = table.vacuum(keep_epochs=1)
    assert os.path.exists(inflight)
    assert not os.path.exists(orphan)
    assert orphan in removed


def test_read_final_state_empty_partitions_schema(tmp_path):
    """The empty-partitions branch must present the same live schema as the
    populated path (no is_deleted when live_only=True)."""
    table = LakeTable(str(tmp_path / "t"))
    table.commit(
        Manifest(
            epoch=1,
            num_partitions=2,
            schema=make_state_schema(),
            partitions={},
            run_id="seed",
        )
    )
    assert "is_deleted" not in read_final_state(table, live_only=True).schema().names
    assert "is_deleted" in read_final_state(table, live_only=False).schema().names


def test_feed_counts_rejects(tmp_path):
    """Streaming feed drops invalid events but must surface the count (the
    documented tailer-alert contract)."""
    ev = corrupt_events(make_events(num_keys=30, num_events=300, seed=3))
    s = StreamingUpserter(str(tmp_path / "s"), num_partitions=2)
    s.feed(rd.from_arrow(ev))
    assert s.rejected > 0
    m = s.commit()
    assert m.metrics["rejected_total"] == s.rejected
    s.shutdown()


def _write_small_events(tmp_path):
    p = str(tmp_path / "ev.parquet")
    write_events(p, make_events(num_keys=30, num_events=250, seed=13))
    return p


def test_late_reader_internal_type_error_propagates(tmp_path):
    """A TypeError raised INSIDE the reader body is a bug, not a legacy
    signature: it must propagate (pre-fix it silently re-invoked the reader
    and then degraded phase A to an unpruned scan)."""
    p = _write_small_events(tmp_path)
    table = LakeTable(str(tmp_path / "lake"))

    def bad_reader(columns, min_seq=None, seq_col="seq"):
        raise TypeError("boom inside reader")

    with pytest.raises(TypeError, match="boom inside reader"):
        apply_epoch(
            table,
            rd.read_parquet(p),
            num_partitions=2,
            shuffle_mode="late",
            phase_b_reader=bad_reader,
            audit=False,
        )


def test_late_reader_legacy_signature_still_supported(tmp_path):
    """A reader written to the minimal documented contract
    ``(columns, min_seq=None)`` completes the late-mode epoch."""
    p = _write_small_events(tmp_path)
    lake_dir = str(tmp_path / "lake")
    table = LakeTable(lake_dir)

    def legacy_reader(columns, min_seq=None):
        return rd.read_parquet(p, columns=list(columns))

    apply_epoch(
        table,
        rd.read_parquet(p),
        num_partitions=2,
        shuffle_mode="late",
        phase_b_reader=legacy_reader,
        audit=False,
    )
    # oracle: the batch staging engine over the same events
    run_replay(p, str(tmp_path / "batch"), num_partitions=2)
    want = read_final_state_arrow(LakeTable(str(tmp_path / "batch")))
    got = read_final_state_arrow(table)
    assert want.num_rows == got.num_rows
    w = want.sort_by([("repo", "ascending"), ("path", "ascending")])
    g = got.sort_by([("repo", "ascending"), ("path", "ascending")])
    assert w["content_sha256"].to_pylist() == g["content_sha256"].to_pylist()
