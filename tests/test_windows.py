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


def test_rolling_frame_matches_pandas_reference():
    from cdm_data_loader_utils_ray.stages.windows import rolling_frame

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 17, n),
            "o": rng.permutation(n),
            "x": rng.integers(-50, 100, n).astype("int64"),
        }
    )
    out = (
        rolling_frame(
            _ds(df, blocks=5), ["k"], ["o"], 3,
            {"s3": ("x", "sum"), "m3": ("x", "min"), "n3": ("x", "count"),
             "mx3": ("x", "max"), "a3": ("x", "mean")},
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "o"]).reset_index(drop=True)
    r = ref.groupby("k", sort=False)["x"].rolling(3, min_periods=1)
    assert np.array_equal(out["s3"].to_numpy(), r.sum().droplevel(0).to_numpy())
    assert np.array_equal(out["m3"].to_numpy(), r.min().droplevel(0).to_numpy())
    assert np.array_equal(out["n3"].to_numpy(), r.count().droplevel(0).to_numpy())
    assert np.array_equal(out["mx3"].to_numpy(), r.max().droplevel(0).to_numpy())
    assert np.allclose(out["a3"].to_numpy(), r.mean().droplevel(0).to_numpy())


def test_rolling_frame_window_one_and_null_keys():
    from cdm_data_loader_utils_ray.stages.windows import rolling_frame

    df = pd.DataFrame(
        {
            "k": pd.array([1, 1, None, None, 2], dtype="Int64"),
            "o": [1, 2, 1, 2, 1],
            "x": [10.0, 20.0, 5.0, 7.0, 1.0],
        }
    )
    out = (
        rolling_frame(_ds(df, blocks=2), ["k"], ["o"], 1,
                      {"s": ("x", "sum")}, num_buckets=2)
        .to_pandas()
    )
    # window=1: rolling sum is the value itself for every row
    assert sorted(out["s"].tolist()) == sorted(df["x"].tolist())
    # null keys: one partition (SQL semantics) — check via window=2 sum
    out2 = (
        rolling_frame(_ds(df, blocks=2), ["k"], ["o"], 2,
                      {"s": ("x", "sum")}, num_buckets=2)
        .to_pandas()
    )
    nulls = out2[out2["k"].isna()].sort_values("o")
    assert nulls["s"].tolist() == [5.0, 12.0]


def test_fixed_size_sample_exact_k_deterministic_and_null_safe():
    import pyarrow as pa
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.sampling import (
        fixed_size_sample,
        portable_uniform,
    )

    ids = list(range(1000)) + [None] * 7
    ds = rd.from_arrow(pa.table({"id": pa.array(ids, type=pa.int64())})).repartition(6)
    a = fixed_size_sample(ds, "id", 50)
    b = fixed_size_sample(ds, "id", 50)
    assert len(a) == 50 and a["id"].notna().all()
    assert a["id"].tolist() == b["id"].tolist()  # rerun-stable
    # exactness: equals the brute-force bottom-k over the portable uniform
    u, valid, _ = portable_uniform(pa.array(ids, type=pa.int64()))
    ref = (
        pd.DataFrame({"id": pd.array(ids, dtype="Int64"), "u": u})[valid]
        .sort_values(["u", "id"], kind="mergesort")
        .head(50)
    )
    assert a["id"].tolist() == ref["id"].astype("int64").tolist()
    # k > n: returns all valid rows, never a null id
    allrows = fixed_size_sample(ds, "id", 5000)
    assert len(allrows) == 1000


def test_rolling_time_frame_matches_bruteforce_with_ties():
    from cdm_data_loader_utils_ray.stages.windows import rolling_time_frame

    rng = np.random.default_rng(23)
    n = 300
    # coarse timestamps force plenty of exact ties (peer rows)
    ts = pd.to_datetime(rng.integers(0, 40, n) * 1_000_000, unit="us")
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n),
            "ts": ts,
            "x": rng.integers(-5, 50, n).astype("int64"),
            "rid": np.arange(n),
        }
    )
    out = (
        rolling_time_frame(_ds(df, blocks=4), ["k"], "ts", "10s",
                           {"x": "s"}, count_alias="c", num_buckets=3)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    # brute force: BY VALUE window [ts - 10s, ts] within the key,
    # INCLUDING peers — independent of any tie order
    lo = df["ts"] - pd.Timedelta("10s")
    for i in range(n):
        m = (df["k"] == df.loc[i, "k"]) & (df["ts"] >= lo[i]) & (
            df["ts"] <= df.loc[i, "ts"]
        )
        row = out[out["rid"] == df.loc[i, "rid"]].iloc[0]
        assert row["c"] == int(m.sum()), i
        assert row["s"] == int(df.loc[m, "x"].sum()), i


def test_rolling_time_frame_null_ts_raises_and_empty_interval():
    import pytest

    from cdm_data_loader_utils_ray.stages.windows import rolling_time_frame

    df = pd.DataFrame(
        {"k": [1, 1], "ts": pd.to_datetime([1_000_000, None], unit="us"),
         "x": [1, 2]}
    )
    with pytest.raises(Exception, match="null timestamps"):
        rolling_time_frame(_ds(df, blocks=1), ["k"], "ts", "1s",
                           {"x": "s"}, num_buckets=1).to_pandas()
    # zero interval: the frame is exactly the peer set
    df2 = pd.DataFrame(
        {"k": [1, 1, 1], "ts": pd.to_datetime([5, 5, 9], unit="s"),
         "x": [1, 2, 4]}
    )
    out = (
        rolling_time_frame(_ds(df2, blocks=1), ["k"], "ts", "0s",
                           {"x": "s"}, count_alias="c", num_buckets=1)
        .to_pandas()
        .sort_values(["ts", "x"])
        .reset_index(drop=True)
    )
    assert out["s"].tolist() == [3, 3, 4]
    assert out["c"].tolist() == [2, 2, 1]


def test_scd2_history_collapses_runs_and_nulls():
    from cdm_data_loader_utils_ray.stages.scd import scd2_history

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "a", "b", "b", "c"],
            "seq": [1, 2, 3, 4, 5, 1, 2, 1],
            # a: x,x,(null),(null),y -> versions x@1, null@3, y@5
            # b: x,x -> one open version; c: single null version
            "attr": ["x", "x", None, None, "y", "x", "x", None],
        }
    )
    out = (
        scd2_history(rd.from_pandas(df), ["k"], "seq", ["attr"], num_buckets=4)
        .to_pandas()
        .sort_values(["k", "valid_from"])
        .reset_index(drop=True)
    )
    assert list(out["k"]) == ["a", "a", "a", "b", "c"]
    assert list(out["valid_from"]) == [1, 3, 5, 1, 1]
    assert list(out["valid_to"].fillna(-1).astype(int)) == [3, 5, -1, -1, -1]
    assert list(out["is_current"]) == [False, False, True, True, True]
    assert [None if pd.isna(v) else v for v in out["attr"]] == ["x", None, "y", "x", None]


def test_scd2_history_multi_attr_and_key():
    from cdm_data_loader_utils_ray.stages.scd import scd2_history

    df = pd.DataFrame(
        {
            "k1": [1, 1, 1],
            "k2": ["p", "p", "p"],
            "seq": [10, 20, 30],
            "a": [1, 1, 2],
            "b": ["u", "v", "v"],  # change at 20 (b), change at 30 (a)
        }
    )
    out = (
        scd2_history(rd.from_pandas(df), ["k1", "k2"], "seq", ["a", "b"], num_buckets=2)
        .to_pandas()
        .sort_values("valid_from")
        .reset_index(drop=True)
    )
    assert list(out["valid_from"]) == [10, 20, 30]
    assert list(out["valid_to"].fillna(-1).astype(int)) == [20, 30, -1]
    assert list(out["is_current"]) == [False, False, True]


def test_fixed_size_sample_per_group_quota_and_small_groups():
    """Per-group bottom-k: exact k per large group, whole group when
    smaller than k, identical across batch sizes (combiner losslessness)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.sampling import (
        fixed_size_sample_per_group,
        portable_uniform,
    )

    df = pd.DataFrame(
        {
            "g": ["a"] * 100 + ["b"] * 3 + ["c"] * 40,
            "id": list(range(100)) + [500, 501, 502] + list(range(700, 740)),
        }
    )
    want_u, _, _ = portable_uniform(pa.array(df["id"], pa.int64()))
    df["u_ref"] = want_u
    expect = {
        g: set(
            sub.sort_values(["u_ref", "id"]).head(10)["id"]
        )
        for g, sub in df.groupby("g")
    }
    for bs in (16, 1000):
        ds = rd.from_arrow(
            pa.Table.from_pandas(df[["g", "id"]], preserve_index=False)
        )
        out = fixed_size_sample_per_group(
            ds, ["g"], "id", k=10, num_buckets=4, batch_size=bs
        ).to_pandas()
        got = {g: set(sub["id"]) for g, sub in out.groupby("g")}
        assert got == expect
        assert len(out[out["g"] == "b"]) == 3  # group smaller than k kept whole


def test_weighted_sample_bias_and_determinism(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.sampling import weighted_sample

    n = 4000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            # first half heavy (w=50), second half light (w=1)
            "wt": np.where(np.arange(n) < n // 2, 50, 1).astype(np.int64),
        }
    )
    s1 = weighted_sample(rd.from_pandas(df), "doc_id", "wt", k=400)
    s2 = weighted_sample(
        rd.from_pandas(df.sample(frac=1.0, random_state=7)), "doc_id", "wt", k=400
    )
    # deterministic + arrival-order independent
    assert s1["doc_id"].tolist() == s2["doc_id"].tolist()
    heavy = (s1["doc_id"] < n // 2).sum()
    # E[heavy] ≈ 400 * 50/51-ish under A-ES; anything below 70% would be broken
    assert heavy > 300
    # zero/negative weights are excluded
    df.loc[0, "wt"] = 0
    s3 = weighted_sample(rd.from_pandas(df), "doc_id", "wt", k=n)
    assert 0 not in set(s3["doc_id"]) and len(s3) == n - 1
