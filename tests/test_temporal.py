"""Temporal operators: as-of join, range join, tumbling windows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cdm_data_loader_utils_ray.stages.keyed import hash_join
from cdm_data_loader_utils_ray.stages.temporal import asof_join, range_join, tumbling_window


def test_asof_join_backward():
    left = pa.table(
        {"k": ["a", "a", "b"], "t": [5, 10, 7], "x": [1, 2, 3]}
    )
    right = pa.table({"k": ["a", "a", "b"], "t": [4, 9, 8], "y": [10, 20, 30]})
    out = (
        asof_join(rd.from_arrow(left), rd.from_arrow(right), on="t", by=["k"], num_buckets=4)
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    # a@5 -> right a@4 (y=10); a@10 -> a@9 (20); b@7 -> none (b@8 is later)
    assert out.loc[(out.k == "a") & (out.t == 5), "y"].iloc[0] == 10
    assert out.loc[(out.k == "a") & (out.t == 10), "y"].iloc[0] == 20
    assert pd.isna(out.loc[(out.k == "b"), "y"]).all()


def test_range_join():
    left = pa.table({"k": ["a", "a"], "p": [5, 15], "x": [1, 2]})
    right = pa.table({"k": ["a", "a"], "s": [0, 10], "e": [10, 20], "label": ["lo", "hi"]})
    out = (
        range_join(rd.from_arrow(left), rd.from_arrow(right), "p", "s", "e", ["k"], num_buckets=2)
        .to_pandas()
        .sort_values("p")
    )
    assert list(out["label"]) == ["lo", "hi"]


def test_tumbling_window_matches_pandas():
    rng = np.random.default_rng(5)
    n = 5000
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.integers(0, 86400 * 10, n), unit="s")
    df = pd.DataFrame({"k": rng.integers(0, 7, n), "ts": ts, "v": rng.random(n)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        tumbling_window(ds, "ts", "1D", ["k"], {
            "n": ("v", "count"), "sv": ("v", "sum"), "mx": ("v", "max"), "avg_v": ("v", "mean"),
        }, num_buckets=8)
        .to_pandas()
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    exp = (
        df.assign(window_start=df["ts"].dt.floor("1D"))
        .groupby(["k", "window_start"])
        .agg(n=("v", "count"), sv=("v", "sum"), mx=("v", "max"), avg_v=("v", "mean"))
        .reset_index()
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert np.allclose(got["sv"], exp["sv"])
    assert np.allclose(got["avg_v"], exp["avg_v"])
    assert np.allclose(got["mx"], exp["mx"])


def test_hash_join_matches_pandas():
    l = pa.table({"k": [1, 2, 2, 3], "x": ["a", "b", "c", "d"]})
    r = pa.table({"k": [2, 3, 4], "y": [20, 30, 40]})
    out = (
        hash_join(rd.from_arrow(l), rd.from_arrow(r), on=["k"], num_buckets=4)
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    assert list(out["k"]) == [2, 2, 3]
    assert list(out["y"]) == [20, 20, 30]


def test_session_window_gap_split():
    from cdm_data_loader_utils_ray.stages.temporal import session_window

    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00",
         "2024-01-01 02:30", "2024-01-01 00:05"]
    )
    t = pa.table({"k": ["a", "a", "a", "a", "b"],
                  "ts": pa.array(ts),
                  "v": [1.0, 2.0, 3.0, 4.0, 9.0]})
    out = (
        session_window(rd.from_arrow(t), "ts", ["k"], "1h",
                       {"n": ("v", "count"), "s": ("v", "sum")}, num_buckets=4)
        .to_pandas()
        .sort_values(["k", "session_start"])
        .reset_index(drop=True)
    )
    # key a: two sessions (00:00-00:10, 02:00-02:30); key b: one
    assert len(out) == 3
    a = out[out["k"] == "a"]
    assert list(a["n"]) == [2, 2]
    assert list(a["s"]) == [3.0, 7.0]
    assert str(a["session_end"].iloc[0]) == "2024-01-01 00:10:00"


def test_sliding_window_fanout():
    from cdm_data_loader_utils_ray.stages.temporal import sliding_window

    ts = pd.to_datetime(["2024-01-02 12:00", "2024-01-03 01:00"])
    t = pa.table({"k": ["a", "a"], "ts": pa.array(ts), "v": [1.0, 10.0]})
    out = (
        sliding_window(rd.from_arrow(t), "ts", "2D", "1D", ["k"],
                       {"s": ("v", "sum")}, num_buckets=4)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # event 1 in windows [01-01, 01-02]; event 2 in [01-02, 01-03]
    assert list(out["window_start"].dt.strftime("%Y-%m-%d")) == [
        "2024-01-01", "2024-01-02", "2024-01-03"]
    assert list(out["s"]) == [1.0, 11.0, 10.0]


def test_hash_join_pandas_extension_dtype_key():
    """A pandas-backed dataset with a nullable Int64 join key must declare
    the real int64 Arrow schema, not a bogus timestamp fallback (r3 ADVICE:
    _arrow_schema mapped any from_numpy_dtype-rejected dtype to timestamp)."""
    left = pd.DataFrame({"k": pd.array([1, 2, 3, 4], dtype="Int64"),
                         "lv": ["a", "b", "c", "d"]})
    right = pd.DataFrame({"k": pd.array([2, 4], dtype="Int64"),
                          "rv": [20, 40]})
    out = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on=["k"],
                  num_buckets=2)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [2, 4]
    assert out["lv"].tolist() == ["b", "d"]
    assert out["rv"].tolist() == [20, 40]
