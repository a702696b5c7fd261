#!/usr/bin/env python
"""Cluster-knob soak: full CDC replay at cluster-like partition counts.

Exercises the 100-TB configuration on the single-node sandbox: P=1024
partitions (64 is the bench default), ADAPTIVE staging group size
(``CDM_RAY_STAGING_GROUP_SIZE`` unset, so ``_staging_group_size`` sizes
reduce parallelism to ~4 group tasks per CPU), 40M+ events.  Verifies:

* throughput does not fall off a cliff vs the P=64 bench configuration;
* staging/lake file counts stay sane (group adaptation caps the
  per-map-task slice fan-out at P/G, not P);
* the result converges EXACTLY to a DuckDB LWW oracle over the same log
  (live-key count, seq sum, distinct-commit count) — verified
  distributedly, the driver never materializes the state.

Usage:
  python soak.py [--events 40000000] [--keys 2000000] [--partitions 1024]

Owns its Ray session (the library never calls ray.init).  Prints one JSON
line; record the numbers in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

CACHE = "/tmp/cdm_bench_cache"


def _gen_log(keys: int, events: int) -> str:
    from cdm_data_loader_utils_ray.synth import make_events_distributed

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"events-{keys}-{events}")
    if os.path.isdir(path) and os.listdir(path):
        return path
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    make_events_distributed(
        tmp, num_keys=keys, num_events=events, seed=42,
        shards=min(256, max(8, events // 160_000)), row_group_size=16384,
    )
    os.replace(tmp, path)
    return path


def _warm(path: str) -> None:
    for f in os.listdir(path):
        with open(os.path.join(path, f), "rb") as fh:
            while fh.read(1 << 22):
                pass


def _tree_file_stats(root: str) -> tuple[int, int]:
    """(total files, max files in any one directory) under root."""
    total, worst = 0, 0
    for _dir, _sub, files in os.walk(root):
        total += len(files)
        worst = max(worst, len(files))
    return total, worst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=40_000_000)
    ap.add_argument("--keys", type=int, default=2_000_000)
    ap.add_argument("--partitions", type=int, default=1024)
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from cdm_data_loader_utils_ray.pipelines.cdc import read_final_state, run_replay

    ev = _gen_log(args.keys, args.events)
    _warm(ev)

    # untimed warm-up on a slice (first-touch page faults dominate cold runs
    # on this host; see BASELINE.md)
    warm_dir = os.path.join(CACHE, f"soak-warm-{time.time_ns()}")
    run_replay(ev, warm_dir, num_partitions=args.partitions, audit=False,
               batch_size=131072, shuffle_mode="late",
               max_seq=max(1, args.events // 8))
    shutil.rmtree(warm_dir, ignore_errors=True)

    lake_dir = os.path.join(CACHE, f"soak-lake-{time.time_ns()}")
    t0 = time.perf_counter()
    manifest = run_replay(
        ev, lake_dir, num_partitions=args.partitions, audit=False,
        batch_size=131072, shuffle_mode="late",
    )
    wall = time.perf_counter() - t0
    applied = manifest.metrics["records_read"]

    data_files, worst_dir = _tree_file_stats(os.path.join(lake_dir, "data"))
    staging_files, _ = _tree_file_stats(os.path.join(lake_dir, "_staging"))

    out = {
        "metric": "soak_cdc_replay_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "events": applied,
        "events_per_sec": round(applied / wall),
        "partitions": args.partitions,
        "group_size_env": os.environ.get("CDM_RAY_STAGING_GROUP_SIZE", "(adaptive)"),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        "lake_data_files": data_files,
        "worst_dir_files": worst_dir,
        "staging_files_left": staging_files,
    }

    if not args.skip_verify:
        # Distributed engine-side aggregates over the committed state …
        from cdm_data_loader_utils_ray.sinks.lake import LakeTable

        from ray.data.aggregate import Count, Sum

        state = read_final_state(LakeTable(lake_dir))
        agg = state.aggregate(Count(), Sum("seq"))
        got_rows, got_seqsum = int(agg["count()"]), int(agg["sum(seq)"])
        # … vs a DuckDB LWW oracle over the raw log (argmax seq per key,
        # final deletes drop the key)
        import duckdb

        exp = duckdb.sql(
            f"""
            WITH r AS (
              SELECT repo, path, seq, op,
                     row_number() OVER (PARTITION BY repo, path
                                        ORDER BY seq DESC) AS rn
              FROM read_parquet('{ev}/*.parquet')
            )
            SELECT count(*) AS n, sum(seq) AS s
            FROM r WHERE rn = 1 AND op <> 'delete'
            """
        ).fetchone()
        out["verify"] = {
            "rows": got_rows,
            "rows_expected": int(exp[0]),
            "seq_sum_ok": got_seqsum == int(exp[1]),
            "ok": got_rows == int(exp[0]) and got_seqsum == int(exp[1]),
        }

    shutil.rmtree(lake_dir, ignore_errors=True)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
