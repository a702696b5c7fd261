"""CLI describe: metadata-only summary straight from the manifest."""

import json
import os


def test_describe_summarizes_manifest(ray_session, tmp_path, capsys):
    from cdm_data_loader_utils_ray.cli import cmd_describe
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable
    from cdm_data_loader_utils_ray.synth import make_events, write_events

    ev = os.path.join(str(tmp_path), "events.parquet")
    lake = os.path.join(str(tmp_path), "lake")
    write_events(ev, make_events(num_keys=40, num_events=300, seed=23))
    run_replay(ev, lake, num_partitions=4)
    LakeTable(lake).set_tag("v1")

    class A:
        pass

    a = A()
    a.lake = lake
    assert cmd_describe(a) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["epoch"] == 1 and out["num_partitions"] == 4
    assert out["files"] == 4 and out["max_chain_len"] == 1
    assert out["tags"] == {"v1": 1}
    assert ["seq", "int64"] in out["columns"]
    assert out["rows"] >= out["live_keys"] > 0

    # uncommitted lake: graceful
    a2 = A()
    a2.lake = os.path.join(str(tmp_path), "nolake")
    assert cmd_describe(a2) == 0
    assert json.loads(capsys.readouterr().out)["committed"] is False
