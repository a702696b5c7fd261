"""Concurrent-maintenance content-swap race (review batch 17).

Two processes run update_where with DIFFERENT setters against the same
base epoch.  The commit guard admits exactly one; with run-unique file
suffixes the loser's phase-1 writes can no longer overwrite the winner's
committed files — the surviving state must be PURELY the winner's setter,
never a mix."""

import os
import subprocess
import sys


def test_concurrent_update_where_no_content_swap(tmp_path):
    d = str(tmp_path)
    ev = os.path.join(d, "ev.parquet")
    lake = os.path.join(d, "lake")
    gen = (
        "import sys; sys.path.insert(0, '/root/repo'); import os; "
        "os.environ.setdefault('RAY_ADDRESS','local'); import ray; "
        "ray.init(address='local', num_cpus=2, include_dashboard=False, "
        "logging_level='ERROR'); "
        "from ray.data import DataContext; "
        "DataContext.get_current().enable_progress_bars = False; "
        "from cdm_data_loader_utils_ray.synth import make_events, write_events; "
        f"write_events({ev!r}, make_events(num_keys=80, num_events=600, seed=31)); "
        "from cdm_data_loader_utils_ray.pipelines.cdc import run_replay; "
        f"run_replay({ev!r}, {lake!r}, num_partitions=4); ray.shutdown()"
    )
    subprocess.run([sys.executable, "-c", gen], check=True, timeout=300)

    script = r"""
import os, sys
os.environ.setdefault("RAY_ADDRESS", "local")
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR", ignore_reinit_error=True)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow as pa
import pyarrow.compute as pc
from cdm_data_loader_utils_ray.pipelines.maintenance import update_where
from cdm_data_loader_utils_ray.sinks.lake import LakeTable

marker = sys.argv[2]

def setter(t):
    return t.set_column(
        t.schema.get_field_index("lang"), "lang",
        pa.array([marker] * len(t), type=pa.string()),
    )

try:
    update_where(LakeTable(sys.argv[1]),
                 lambda t: pc.is_valid(t["lang"]), setter)
    print("WON:" + marker)
except ValueError as e:
    if "committed epoch" in str(e) or "different run" in str(e):
        print("LOST:" + marker)
    else:
        raise
ray.shutdown()
"""
    sc = os.path.join(d, "race.py")
    with open(sc, "w") as f:
        f.write(script)
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    procs = [
        subprocess.Popen(
            [sys.executable, sc, lake, marker],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
        )
        for marker in ("AAA", "BBB")
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    winners = [o.strip().split("WON:")[-1] for o in outs if "WON:" in o]
    assert len(winners) >= 1, outs  # both can win only on disjoint epochs

    check = (
        "import sys; sys.path.insert(0, '/root/repo'); import os; "
        "os.environ.setdefault('RAY_ADDRESS','local'); import ray; "
        "ray.init(address='local', num_cpus=2, include_dashboard=False, "
        "logging_level='ERROR'); "
        "from cdm_data_loader_utils_ray.pipelines.cdc import read_final_state_arrow; "
        "from cdm_data_loader_utils_ray.sinks.lake import LakeTable; "
        f"st = read_final_state_arrow(LakeTable({lake!r})); "
        "langs = set(x for x in st['lang'].to_pylist() if x is not None); "
        "print('LANGS=' + ','.join(sorted(langs))); ray.shutdown()"
    )
    out = subprocess.run(
        [sys.executable, "-c", check], capture_output=True, text=True,
        timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    langs = out.stdout.strip().split("LANGS=")[-1].split(",")
    # PURE outcome: every non-null lang is ONE marker.  A mixed set means
    # the loser's phase-1 files leaked into the committed state (the
    # pre-fix content swap).  Sequential non-racing runs also end pure
    # (the second update overwrites everything).
    assert len(langs) == 1 and langs[0] in ("AAA", "BBB"), (langs, winners)
    if len(winners) == 1:
        # a true race: the committed state must be the WINNER's content
        assert langs == [winners[0]], (langs, winners)
