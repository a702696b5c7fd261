"""Global ordered prefix-sum selection (stages/global_order)."""

import numpy as np
import pandas as pd
import pytest

from cdm_data_loader_utils_ray.stages.global_order import (
    _bucket_of,
    prefix_budget_select,
)


def test_bucket_monotone_and_tie_stable():
    bounds = np.array([10.0, 20.0])
    s = np.array([25.0, 20.0, 20.0, 15.0, 10.0, 5.0])
    b = _bucket_of(s, bounds)
    # higher score -> numerically smaller (earlier) bucket; ties agree
    assert list(b) == [0, 1, 1, 1, 2, 2]
    assert (np.diff(b) >= 0).all()


def _oracle(df: pd.DataFrame, budget: float) -> pd.DataFrame:
    o = df.sort_values(["score", "id"], ascending=[False, True], kind="mergesort")
    o = o.assign(cum_value=o["val"].cumsum().astype(float))
    return o[o["cum_value"] <= budget].reset_index(drop=True)


@pytest.mark.parametrize("budget", [0.0, 37.0, 1e9])
def test_prefix_budget_select_matches_window(ray_session, budget):
    import ray.data as rd

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "id": np.arange(2000),
            # heavy ties to stress tie ordering across bucket boundaries
            "score": rng.integers(0, 20, 2000).astype(float),
            "val": rng.integers(0, 5, 2000).astype(float),
        }
    )
    out = prefix_budget_select(
        lambda: rd.from_pandas(df), "score", "id", "val", budget, num_buckets=8
    ).to_pandas()
    exp = _oracle(df, budget)
    if exp.empty:
        # Ray drops the schema of an all-empty dataset on to_pandas();
        # emptiness itself is the contract here
        assert len(out) == 0
        return
    out = out.sort_values(["score", "id"], ascending=[False, True]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        out[["id", "score", "val", "cum_value"]].reset_index(drop=True),
        exp[["id", "score", "val", "cum_value"]],
    )


def test_empty_input(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                       "score": pd.Series([], dtype="float64"),
                       "val": pd.Series([], dtype="float64")})
    out = prefix_budget_select(
        lambda: rd.from_pandas(df), "score", "id", "val", 100.0, num_buckets=4
    ).to_pandas()
    assert len(out) == 0


def test_grouped_percent_rank_matches_window(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.stages.global_order import grouped_percent_rank

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "id": np.arange(3000),
            "g": rng.choice(["a", "b", "c"], 3000),
            # integer values -> heavy ties, including across bucket bounds
            "v": rng.integers(0, 40, 3000).astype(float),
        }
    )
    # one singleton group for the n=1 -> 0 convention
    df = pd.concat(
        [df, pd.DataFrame({"id": [99999], "g": ["solo"], "v": [1.0]})],
        ignore_index=True,
    )
    out = grouped_percent_rank(
        lambda: rd.from_pandas(df), "g", "v", out_alias="pr", num_buckets=8
    ).to_pandas()

    def oracle(sub):
        n = len(sub)
        rank = sub["v"].rank(method="min").to_numpy() - 1
        return pd.Series(rank / max(n - 1, 1), index=sub.index)

    exp = df.assign(pr=df.groupby("g", group_keys=False).apply(oracle))
    merged = out.merge(exp, on="id", suffixes=("", "_exp"))
    assert len(merged) == len(df)
    np.testing.assert_allclose(merged["pr"], merged["pr_exp"], rtol=0, atol=1e-12)


def test_percent_rank_null_group_keys(ray_session):
    """Null group keys are one SQL partition: they must rank against each
    other (r4 review: the null group previously kept uninitialized memory
    as its pr values)."""
    import duckdb
    import ray.data as rd

    from cdm_data_loader_utils_ray.stages.global_order import grouped_percent_rank

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "rid": np.arange(300, dtype=np.int64),
            "grp": [None if i % 3 == 0 else f"g{i % 2}" for i in range(300)],
            "v": rng.random(300),
        }
    )
    out = grouped_percent_rank(
        lambda: rd.from_pandas(df), "grp", "v", out_alias="pr", num_buckets=4
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.sql(
        "SELECT rid, percent_rank() OVER (PARTITION BY grp ORDER BY v) AS pr FROM t"
    ).df()
    merged = out.merge(exp, on="rid", suffixes=("", "_exp"))
    assert len(merged) == 300
    np.testing.assert_allclose(
        merged["pr"].to_numpy(), merged["pr_exp"].to_numpy(), atol=1e-12
    )
