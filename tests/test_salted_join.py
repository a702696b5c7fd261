"""Skew-salted hash join: identical results to the unsalted join on a
90%-one-key fixture; hot-key detection finds the heavy hitter."""

import numpy as np
import pandas as pd
import pytest

from cdm_data_loader_utils_ray.stages.keyed import (
    hash_join,
    hash_join_salted,
    hot_keys,
)


def _fixture():
    rng = np.random.default_rng(5)
    n = 20000
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 500, n))
    left = pd.DataFrame({"k": keys.astype("int64"), "v": rng.random(n)})
    right = pd.DataFrame(
        {"k": np.arange(0, 500, 2, dtype="int64"), "name": [f"n{i}" for i in range(250)]}
    )
    return left, right


def test_hot_keys_detects_heavy_hitter(ray_session):
    import ray.data as rd

    left, _ = _fixture()
    hot = hot_keys(rd.from_pandas(left), "k", hot_frac=0.05)
    assert list(hot) == [7]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_matches_unsalted(ray_session, how):
    import ray.data as rd

    left, right = _fixture()
    a = hash_join_salted(
        rd.from_pandas(left), rd.from_pandas(right), on="k", how=how,
        num_salts=4, hot_frac=0.05, num_buckets=8,
    ).to_pandas()
    b = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on=["k"], how=how, num_buckets=8
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(a[sorted(a.columns)]), _canon(b[sorted(b.columns)]))


def test_salted_rejects_outer(ray_session):
    import ray.data as rd

    left, right = _fixture()
    with pytest.raises(ValueError):
        hash_join_salted(rd.from_pandas(left), rd.from_pandas(right), on="k", how="outer")


def test_semi_join_keys(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.stages.keyed import semi_join_keys

    left = pd.DataFrame({"k": [1, 2, 3, 4, 2], "v": [10, 20, 30, 40, 21]})
    right = pd.DataFrame({"k": [2, 4, 4, 9]})
    out = semi_join_keys(
        rd.from_pandas(left), rd.from_pandas(right), ["k"], num_buckets=4
    ).to_pandas()
    assert sorted(out["v"].tolist()) == [20, 21, 40]


def test_broadcast_hash_join_matches_shuffle_join(ray_session):
    """broadcast_hash_join must be row-identical to hash_join for
    inner/left — the broadcast is purely a physical-plan choice."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.stages.keyed import broadcast_hash_join, hash_join

    rng = np.random.default_rng(21)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 2000),
            "v": rng.random(2000),
            "name": rng.choice(["x", "y"], 2000),  # collides with right
        }
    )
    right = pd.DataFrame(
        {
            "k": np.arange(0, 40),  # keys 40..49 unmatched on the left
            "name": [f"n{i}" for i in range(40)],
        }
    )
    for how in ("inner", "left"):
        a = (
            broadcast_hash_join(
                rd.from_pandas(left), rd.from_pandas(right), "k", how=how
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        b = (
            hash_join(
                rd.from_pandas(left), rd.from_pandas(right), ["k"],
                how=how, num_buckets=8,
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
        exp = left.merge(right, on="k", how=how, suffixes=("", "_right"))
        assert len(a) == len(exp)


def test_broadcast_hash_join_accepts_arrow_table(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cdm_data_loader_utils_ray.stages.keyed import broadcast_hash_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, 40.0]})
    right = pa.table({"k": [2, 4], "tag": ["a", "b"]})
    out = (
        broadcast_hash_join(rd.from_pandas(left), right, "k", how="left")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["tag"].tolist() == [None, "a", None, "b"]
