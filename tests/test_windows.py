"""Per-key ordered window primitives (stages/windows.py): running prefix
aggregates and lag/lead shifts, including keys scattered across blocks."""

import numpy as np
import pandas as pd
import ray.data as rd


def _ds(df: pd.DataFrame, blocks: int = 4):
    return rd.from_pandas(df).repartition(blocks)


def test_running_totals_matches_pandas_reference():
    from cdm_data_loader_utils_ray.stages.windows import running_totals

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 23, n),
            "o": rng.permutation(n),
            "x": rng.integers(0, 100, n).astype("int64"),
        }
    )
    out = (
        running_totals(_ds(df, blocks=5), ["k"], ["o"], {"x": "run_x"},
                       row_number_alias="rn", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "o"]).reset_index(drop=True)
    g = ref.groupby("k", sort=False)
    assert (out["run_x"].to_numpy() == g["x"].cumsum().to_numpy()).all()
    assert (out["rn"].to_numpy() == (g.cumcount() + 1).to_numpy()).all()


def test_running_totals_single_row_keys_and_empty_sum_spec():
    from cdm_data_loader_utils_ray.stages.windows import running_totals

    df = pd.DataFrame({"k": [1, 2, 3], "o": [0, 0, 0], "x": [5, 6, 7]})
    out = running_totals(_ds(df, blocks=2), ["k"], ["o"], {}, num_buckets=2).to_pandas()
    assert sorted(out["row_n"]) == [1, 1, 1]


def test_lag_shift_lag_and_lead():
    from cdm_data_loader_utils_ray.stages.windows import lag_shift

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b"],
            "o": [1, 2, 3, 1, 2],
            "v": [10.0, 20.0, 30.0, 1.0, 2.0],
        }
    )
    lag = (
        lag_shift(_ds(df, blocks=3), ["k"], ["o"], {"v": "prev_v"}, num_buckets=2)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    assert lag["prev_v"].tolist()[0] != lag["prev_v"].tolist()[0] or pd.isna(
        lag["prev_v"].iloc[0]
    )
    assert lag["prev_v"].iloc[1:3].tolist() == [10.0, 20.0]
    assert pd.isna(lag["prev_v"].iloc[3]) and lag["prev_v"].iloc[4] == 1.0

    lead = (
        lag_shift(_ds(df, blocks=3), ["k"], ["o"], {"v": "next_v"},
                  periods=-1, num_buckets=2)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    assert lead["next_v"].iloc[0:2].tolist() == [20.0, 30.0]
    assert pd.isna(lead["next_v"].iloc[2])
    assert lead["next_v"].iloc[3] == 2.0 and pd.isna(lead["next_v"].iloc[4])


def test_lag_shift_periods_two():
    from cdm_data_loader_utils_ray.stages.windows import lag_shift

    df = pd.DataFrame({"k": [1] * 4, "o": [1, 2, 3, 4], "v": [1, 2, 3, 4]})
    out = (
        lag_shift(_ds(df, blocks=2), ["k"], ["o"], {"v": "p2"}, periods=2,
                  num_buckets=2)
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    assert pd.isna(out["p2"].iloc[0]) and pd.isna(out["p2"].iloc[1])
    assert out["p2"].iloc[2:].tolist() == [1.0, 2.0]
