"""Exactly-once under task re-execution: retried tasks must overwrite, not
duplicate — deterministic staging slice names + deterministic partition
files + idempotent merge."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from cdm_data_loader_utils_ray.audit.tables import PipelineRun
from cdm_data_loader_utils_ray.core.schemas import EVENT_SCHEMA, state_schema
from cdm_data_loader_utils_ray.pipelines.cdc import (
    EventPrep,
    PrepAndRoute,
    _make_staging_merge_fn,
)
from cdm_data_loader_utils_ray.sinks.lake import LakeTable
from cdm_data_loader_utils_ray.synth import make_events


def test_map_task_retry_overwrites_staging(tmp_path):
    ev = make_events(num_keys=50, num_events=400, seed=61)
    staging = str(tmp_path / "staging")
    prep = EventPrep(EVENT_SCHEMA, 8, {})
    router = PrepAndRoute(prep, staging)
    router(ev)  # original execution
    files1 = {
        (d, f): os.path.getsize(os.path.join(staging, d, f))
        for d in os.listdir(staging)
        for f in os.listdir(os.path.join(staging, d))
    }
    router(ev)  # simulated Ray task retry on the identical block
    files2 = {
        (d, f): os.path.getsize(os.path.join(staging, d, f))
        for d in os.listdir(staging)
        for f in os.listdir(os.path.join(staging, d))
    }
    assert files1 == files2  # same names, same sizes — no duplicates


def test_reduce_task_retry_same_partition_file(tmp_path):
    ev = make_events(num_keys=50, num_events=400, seed=61)
    staging = str(tmp_path / "staging")
    lake_dir = str(tmp_path / "lake")
    prep = EventPrep(EVENT_SCHEMA, 4, {})
    PrepAndRoute(prep, staging)(ev)
    merge = _make_staging_merge_fn(
        lake_dir, staging, {}, state_schema(EVENT_SCHEMA), 1,
        PipelineRun("fixed-run", "p", "s"), 0,
    )
    pids = sorted(int(d.split("=")[1]) for d in os.listdir(staging))
    import numpy as np

    batch = {"item": np.array(pids[:1])}
    r1 = merge(batch).to_pylist()[0]
    state1 = pq.read_table(os.path.join(lake_dir, r1["file"]))
    r2 = merge(batch).to_pylist()[0]  # retry
    state2 = pq.read_table(os.path.join(lake_dir, r2["file"]))
    assert r1["file"] == r2["file"]
    assert state1.equals(state2)


def test_export_state(tmp_path):
    import pyarrow.parquet as pq

    from cdm_data_loader_utils_ray.pipelines.cdc import (
        export_state,
        read_final_state_arrow,
        run_replay,
    )

    ev_path = str(tmp_path / "ev.parquet")
    pq.write_table(make_events(num_keys=30, num_events=200, seed=71), ev_path)
    lake = str(tmp_path / "lake")
    run_replay(ev_path, lake, num_partitions=4)
    t = LakeTable(lake)
    out = export_state(t, str(tmp_path / "export"))
    import ray.data as rd

    exported = rd.read_parquet(out).to_pandas()
    assert len(exported) == read_final_state_arrow(t).num_rows


def test_export_state_hive_partitioned(tmp_path):
    import os

    import pyarrow.parquet as pq

    from cdm_data_loader_utils_ray.pipelines.cdc import (
        export_state,
        read_final_state_arrow,
        run_replay,
    )

    ev_path = str(tmp_path / "ev.parquet")
    pq.write_table(make_events(num_keys=30, num_events=200, seed=72), ev_path)
    lake = str(tmp_path / "lake")
    run_replay(ev_path, lake, num_partitions=4)
    t = LakeTable(lake)
    out = export_state(t, str(tmp_path / "hive"), partition_by=["lang"])
    # Hive layout: one lang=<value>/ directory per distinct value
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert dirs
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/*/*.parquet', "
        "hive_partitioning=1)"
    ).fetchone()[0]
    assert n == read_final_state_arrow(t).num_rows
