"""Survivorship merge (functions/golden.py): field-level last-non-null.

The distinguishing case vs row-level LWW: the LATEST row nulls a field an
EARLIER row had — the golden record must keep the earlier non-null value
while other fields still come from the latest row."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cdm_data_loader_utils_ray.functions.golden import survivorship_merge


def _merge(df: pd.DataFrame, **kw) -> pd.DataFrame:
    import ray.data as rd

    out = survivorship_merge(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        ["k"], ["o"], ["a", "b"], **kw,
    ).to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def _oracle(df: pd.DataFrame) -> pd.DataFrame:
    d = df.sort_values("o", kind="stable")
    g = d.groupby("k", sort=True, dropna=False, as_index=False)
    return g[["a", "b"]].last()


def test_latest_row_nulls_field_earlier_value_survives(ray_session):
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "o": [1, 2, 3, 1, 2],
            "a": [10.0, 20.0, np.nan, np.nan, 5.0],
            "b": ["x", None, "z", "p", None],
        }
    )
    out = _merge(df, num_buckets=4)
    # k=1: a from o=2 (latest non-null; o=3 is null), b from o=3
    # k=2: a from o=2, b from o=1 (latest row nulls b)
    assert out["a"].tolist() == [20.0, 5.0]
    assert out["b"].tolist() == ["z", "p"]


def test_all_null_field_key_still_emitted(ray_session):
    df = pd.DataFrame(
        {"k": [7, 7], "o": [1, 2], "a": [np.nan, np.nan], "b": [None, "q"]}
    )
    out = _merge(df, num_buckets=2)
    assert len(out) == 1
    assert np.isnan(out["a"].iloc[0]) and out["b"].iloc[0] == "q"


def test_combiner_matches_single_pass_and_batching_invariant(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 200, n),
            "o": rng.permutation(n),
            "a": np.where(rng.random(n) < 0.4, np.nan, rng.random(n)),
            "b": pd.Series(
                np.where(rng.random(n) < 0.4, None, rng.integers(0, 9, n).astype(str))
            ),
        }
    )
    want = _oracle(df)
    for bs in (128, 5000):
        got = _merge(df, num_buckets=8, batch_size=bs)
        pd.testing.assert_frame_equal(
            got[["k", "a", "b"]], want[["k", "a", "b"]], check_dtype=False
        )


def test_null_keys_group_together(ray_session):
    df = pd.DataFrame(
        {
            "k": [None, None, 3.0],
            "o": [1, 2, 1],
            "a": [1.0, np.nan, 9.0],
            "b": ["u", "v", None],
        }
    )
    out = _merge(df, num_buckets=2)
    assert len(out) == 2  # the two null-keyed rows merged into one group
    row = out[out["k"].isna()].iloc[0]
    assert row["a"] == 1.0 and row["b"] == "v"
