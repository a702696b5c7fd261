"""pareto_frontier (functions/skyline.py) vs brute-force dominance, incl.
duplicate points (survive/fall together) and batching invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.functions.skyline import pareto_frontier


def _brute(df: pd.DataFrame) -> set:
    out = set()
    rows = df.to_dict("records")
    for a in rows:
        dominated = any(
            b["g"] == a["g"]
            and b["x"] >= a["x"]
            and b["y"] >= a["y"]
            and (b["x"] > a["x"] or b["y"] > a["y"])
            for b in rows
        )
        if not dominated:
            out.add((a["g"], a["x"], a["y"], a["rid"]))
    return out


def test_skyline_matches_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame(
        {
            "rid": np.arange(n),
            "g": rng.integers(0, 3, n),
            # small value domain -> many exact duplicates and x-ties
            "x": rng.integers(0, 12, n),
            "y": rng.integers(0, 12, n),
        }
    )
    want = _brute(df)
    for bs in (64, 600):
        got = pareto_frontier(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            "x", "y", by=["g"], batch_size=bs,
        )
        assert set(zip(got["g"], got["x"], got["y"], got["rid"])) == want


def test_global_frontier_no_groups(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"rid": [0, 1, 2, 3], "x": [1, 2, 2, 0], "y": [5, 1, 1, 9]}
    )
    got = pareto_frontier(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)), "x", "y"
    )
    # (2,1) twice (duplicates survive together), (1,5), (0,9)
    assert sorted(got["rid"]) == [0, 1, 2, 3]
    got2 = pareto_frontier(
        rd.from_arrow(
            pa.Table.from_pandas(
                pd.DataFrame({"rid": [0, 1], "x": [1, 2], "y": [5, 5]}),
                preserve_index=False,
            )
        ),
        "x", "y",
    )
    assert sorted(got2["rid"]) == [1]  # same y, larger x dominates
