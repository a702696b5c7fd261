"""Object-store manifest commit (sinks/oscommit.py): conditional-put
commit point, concurrent-writer arbitration, crash-window recovery, and
end-to-end CDC parity with the POSIX rename path.

Reference parity: the reference's MinIO helpers (utils/minio.py:14-211)
give it object-store residency; this protocol is the from-scratch
Ray-side equivalent of the atomic-visibility concern (S16)."""

import json
import os
from concurrent.futures import ThreadPoolExecutor

import pytest

from cdm_data_loader_utils_ray.sinks.lake import LakeTable
from cdm_data_loader_utils_ray.sinks.oscommit import (
    LATEST_HINT,
    DirObjectStore,
    ObjectStoreManifestLog,
    final_key,
    staged_key,
)


def _payload(epoch, run):
    # minimal manifest-shaped JSON (run_id is all the log reads)
    return json.dumps({"epoch": epoch, "run_id": run})


def test_put_if_absent_single_winner_under_contention(tmp_path):
    store = DirObjectStore(str(tmp_path))

    def try_put(i):
        return store.put_if_absent("k", f"writer-{i}".encode())

    with ThreadPoolExecutor(max_workers=16) as ex:
        wins = list(ex.map(try_put, range(64)))
    assert sum(wins) == 1
    # the winner's payload is intact (no torn/partial object visible)
    assert store.get("k").decode().startswith("writer-")


def test_commit_point_is_final_object_not_hint(tmp_path):
    """Crash between final put and hint put loses nothing: the listing is
    the source of truth."""
    store = DirObjectStore(str(tmp_path))
    log = ObjectStoreManifestLog(store)
    log.stage(1, _payload(1, "r1"), "r1")
    # simulate crash-after-commit-point: final object placed, hint never
    # written, staging litter left behind
    assert store.put_if_absent(final_key(1), _payload(1, "r1").encode())
    assert store.get(LATEST_HINT) is None
    assert log.latest_epoch() == 1
    assert json.loads(log.read(1))["run_id"] == "r1"
    # litter is GC-able once committed
    assert log.gc_staged() == [staged_key(1, "r1")]


def test_concurrent_epoch_race_one_winner(tmp_path):
    """Two writers staging the same epoch: exactly one publish succeeds,
    the loser raises — never a silent overwrite."""
    store = DirObjectStore(str(tmp_path))
    log = ObjectStoreManifestLog(store)
    log.stage(5, _payload(5, "A"), "A")
    log.stage(5, _payload(5, "B"), "B")
    assert log.publish(5, "A") is True
    with pytest.raises(ValueError, match="different run"):
        log.publish(5, "B")
    assert json.loads(log.read(5))["run_id"] == "A"


def test_publish_idempotent_for_same_run(tmp_path):
    store = DirObjectStore(str(tmp_path))
    log = ObjectStoreManifestLog(store)
    log.stage(2, _payload(2, "r"), "r")
    assert log.publish(2, "r") is True
    # crash-retry: staged key already cleaned, final already ours
    assert log.publish(2, "r") is False
    # re-stage + publish again (full replay): still a no-op, same content
    log.stage(2, _payload(2, "r"), "r")
    assert log.publish(2, "r") is False
    assert log.latest_epoch() == 2


def test_hint_is_advisory_floor(tmp_path):
    """A stale (lagging) hint never hides newer commits; a garbage hint
    falls back to the listing."""
    store = DirObjectStore(str(tmp_path))
    log = ObjectStoreManifestLog(store)
    for e in (1, 2, 3):
        log.stage(e, _payload(e, f"r{e}"), f"r{e}")
        log.publish(e, f"r{e}")
    store.put(LATEST_HINT, b"1")  # regressed hint
    assert log.latest_epoch() == 3
    store.put(LATEST_HINT, b"garbage")
    assert log.latest_epoch() == 3


def test_unstaged_publish_raises(tmp_path):
    log = ObjectStoreManifestLog(DirObjectStore(str(tmp_path)))
    with pytest.raises(ValueError, match="never staged"):
        log.publish(9, "r")


def test_lake_table_object_store_replay_parity(ray_session, tmp_path):
    """Full CDC replay onto an object-store-commit table converges to the
    SAME state as the rename-path table, survives re-replay (idempotent),
    and reopening via plain LakeTable(dir) (as cdc.py does internally)
    keeps the backend via the COMMIT_BACKEND marker."""
    from cdm_data_loader_utils_ray.pipelines.cdc import (
        read_final_state_arrow,
        run_replay,
    )
    from cdm_data_loader_utils_ray.stages.hashing import table_fingerprint
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "ev.parquet")
    write_events(ev, make_events(num_keys=300, num_events=3000, seed=7))

    posix_dir = os.path.join(str(tmp_path), "posix")
    os_dir = os.path.join(str(tmp_path), "oscommit")
    run_replay(ev, posix_dir, num_partitions=4)
    LakeTable.create_object_store(os_dir)
    run_replay(ev, os_dir, num_partitions=4, epochs=3)

    t_os = LakeTable(os_dir)  # plain reopen — marker must engage
    assert t_os._oslog is not None
    a = read_final_state_arrow(LakeTable(posix_dir)).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    b = read_final_state_arrow(t_os).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    assert table_fingerprint(a) == table_fingerprint(b)

    # no LATEST pointer file in the object-store table — the final
    # manifest objects ARE the commit
    assert not os.path.exists(os.path.join(t_os.manifest_dir, "LATEST"))
    e1 = t_os.latest_epoch()
    assert e1 is not None and e1 >= 3

    # idempotent re-replay
    run_replay(ev, os_dir, num_partitions=4, epochs=3)
    b2 = read_final_state_arrow(LakeTable(os_dir)).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    assert table_fingerprint(b) == table_fingerprint(b2)


def test_lake_table_object_store_crash_window(ray_session, tmp_path):
    """Staged-but-unpublished epoch is INVISIBLE (readers list final
    manifests only); publish_epoch rolls it forward — the txn recovery
    path — and a second publish is a no-op."""
    import pyarrow as pa

    from cdm_data_loader_utils_ray.sinks.lake import Manifest

    t = LakeTable.create_object_store(os.path.join(str(tmp_path), "t"))
    schema = pa.schema([("k", pa.int64())])
    m1 = Manifest(
        epoch=1, num_partitions=1, schema=schema, partitions={},
        parent_epoch=None, run_id="r-1", metrics={},
    )
    assert t.stage_manifest(m1)
    assert t.latest_epoch() is None  # staged != committed
    t.publish_epoch(1)
    assert t.latest_epoch() == 1
    t.publish_epoch(1)  # idempotent
    assert t.latest_epoch() == 1
    # vacuum GC's staging litter for committed epochs
    m2 = Manifest(
        epoch=2, num_partitions=1, schema=schema, partitions={},
        parent_epoch=1, run_id="r-2", metrics={},
    )
    assert t.stage_manifest(m2)
    t.publish_epoch(2)
    assert t.latest_epoch() == 2


def test_injected_store_reaches_internal_constructions(ray_session, tmp_path):
    """Review r5 split-brain: a custom store passed to
    create_object_store must also be used by LakeTable(dir) instances the
    PIPELINE constructs internally — otherwise the user's handle and
    run_replay write divergent manifest logs with no error."""
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    calls = {"put_if_absent": 0}

    class SpyStore(DirObjectStore):
        def put_if_absent(self, key, data):
            calls["put_if_absent"] += 1
            return super().put_if_absent(key, data)

    d = os.path.join(str(tmp_path), "t")
    t = LakeTable.create_object_store(d, store=SpyStore(os.path.join(d, "_manifest")))
    ev = os.path.join(str(tmp_path), "ev.parquet")
    write_events(ev, make_events(num_keys=50, num_events=400, seed=3))
    run_replay(ev, d, num_partitions=2)  # constructs LakeTable(d) internally
    assert calls["put_if_absent"] >= 1  # commit went through the injected store
    assert t.latest_epoch() is not None  # and the user's handle sees it


def test_wide_epoch_numbers_stay_visible(tmp_path):
    """Review r5: {:08d} grows to 9+ digits past epoch 99,999,999; the
    listing regex must keep matching or committed epochs disappear."""
    store = DirObjectStore(str(tmp_path))
    log = ObjectStoreManifestLog(store)
    big = 123_456_789  # 9 digits
    log.stage(big, _payload(big, "r"), "r")
    assert log.publish(big, "r") is True
    assert log.latest_epoch() == big


def test_two_process_concurrent_replay_race(tmp_path):
    """TWO separate processes replay the same events into the same
    object-store table SIMULTANEOUSLY.  The conditional put arbitrates:
    any epoch is committed by exactly one writer; the loser either skips
    idempotently or fails with the concurrent-writer error — and the
    final state always converges to the LWW oracle, never a torn mix."""
    import subprocess
    import sys

    d = str(tmp_path)
    script = r"""
import os, sys
os.environ.setdefault("RAY_ADDRESS", "local")
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR", ignore_reinit_error=True)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
try:
    run_replay(sys.argv[1], sys.argv[2], num_partitions=2, epochs=3)
    print("REPLAY_OK")
except ValueError as e:
    if "different run" in str(e) or "committed epoch" in str(e):
        print("REPLAY_LOST_RACE")
    else:
        raise
ray.shutdown()
"""
    ev = os.path.join(d, "ev.parquet")
    lake = os.path.join(d, "lake")
    gen = (
        "import sys; sys.path.insert(0, '/root/repo'); "
        "from cdm_data_loader_utils_ray.synth import make_events, write_events; "
        f"write_events({ev!r}, make_events(num_keys=60, num_events=600, seed=21)); "
        "from cdm_data_loader_utils_ray.sinks.lake import LakeTable; "
        f"LakeTable.create_object_store({lake!r})"
    )
    subprocess.run([sys.executable, "-c", gen], check=True, timeout=120)
    sc = os.path.join(d, "race.py")
    with open(sc, "w") as f:
        f.write(script)
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    procs = [
        subprocess.Popen(
            [sys.executable, sc, ev, lake],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
        )
        for _ in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert sum("REPLAY_OK" in o for o in outs) >= 1, outs

    # converged, uncorrupted final state == LWW oracle (fresh process)
    check = (
        "import sys; sys.path.insert(0, '/root/repo'); import os; "
        "os.environ.setdefault('RAY_ADDRESS','local'); import ray; "
        "ray.init(address='local', num_cpus=2, include_dashboard=False, "
        "logging_level='ERROR'); "
        "from cdm_data_loader_utils_ray.pipelines.cdc import "
        "read_final_state_arrow, run_replay; "
        "from cdm_data_loader_utils_ray.sinks.lake import LakeTable; "
        f"run_replay({ev!r}, {lake!r}, num_partitions=2, epochs=3); "
        f"st = read_final_state_arrow(LakeTable({lake!r})); "
        "import duckdb; con = duckdb.connect(); "
        "o = con.sql(\"\"\"WITH r AS (SELECT *, row_number() OVER "
        "(PARTITION BY repo, path ORDER BY seq DESC) rn "
        f"FROM read_parquet('{ev}')) "
        "SELECT count(*) n FROM r WHERE rn=1 AND op<>'delete'\"\"\").fetchone()[0]; "
        "assert st.num_rows == o, (st.num_rows, o); print('CONVERGED'); "
        "ray.shutdown()"
    )
    out = subprocess.run(
        [sys.executable, "-c", check], capture_output=True, text=True,
        timeout=300, env=env,
    )
    assert "CONVERGED" in out.stdout, out.stdout + out.stderr
