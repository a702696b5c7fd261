"""band_neighbor_counts (stages/temporal.py) vs a brute-force pair count —
adjacent key codes must never bleed probes across the group boundary even
when one key's max value and the next key's min value are within radius."""

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.stages.temporal import band_neighbor_counts


def _brute(df: pd.DataFrame, radius: int) -> dict:
    out = {}
    for i, row in df.iterrows():
        n = (
            (df["k"] == row["k"])
            & (df["v"] >= row["v"] - radius)
            & (df["v"] <= row["v"] + radius)
        ).sum() - 1
        out[int(row["rid"])] = int(n)
    return out


def test_band_counts_match_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 800
    df = pd.DataFrame(
        {
            "rid": np.arange(n),
            "k": rng.integers(0, 40, n),
            # dense values so adjacent keys' ranges abut within the radius
            "v": rng.integers(0, 25, n),
        }
    )
    got = (
        band_neighbor_counts(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            ["k"], "v", radius=3, num_buckets=4, batch_size=100,
        )
        .to_pandas()
        .set_index("rid")["n_neighbors"]
        .to_dict()
    )
    assert got == _brute(df, 3)
