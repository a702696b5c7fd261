"""Streaming tumbling-window aggregator: exactness with unlimited
lateness, watermark closing, and late-drop accounting."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cdm_data_loader_utils_ray.state.windows_stream import StreamingWindowAggregator

DAY = 86_400_000_000


def _events(n=5000, days=10, seed=3):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, days * DAY, n)
    return pd.DataFrame(
        {
            "ts": ts.astype("int64"),
            "key": rng.choice(["a", "b", "c"], n),
            "v": rng.random(n),
        }
    )


def _oracle(df):
    g = (
        df.assign(w=(df["ts"] // DAY) * DAY)
        .groupby(["w", "key"])["v"]
        .agg(["size", "sum"])
        .reset_index()
    )
    g.columns = ["window_start_us", "key", "n", "s"]
    return g.sort_values(["window_start_us", "key"]).reset_index(drop=True)


def _run(df, lateness, feeds=4, num_shards=3):
    import ray.data as rd

    agg = StreamingWindowAggregator(
        "key", "v", ts_column="ts", window_us=DAY,
        allowed_lateness_us=lateness, num_shards=num_shards,
    )
    try:
        chunk = len(df) // feeds + 1
        for i in range(feeds):
            part = df.iloc[i * chunk : (i + 1) * chunk]
            if len(part):
                agg.feed(rd.from_pandas(part.reset_index(drop=True)))
        out = agg.close().to_pandas()
        stats = agg.stats()
    finally:
        agg.shutdown()
    return out.sort_values(["window_start_us", "key"]).reset_index(drop=True), stats


def test_exact_with_unlimited_lateness_any_order(ray_session):
    df = _events()
    shuffled = df.sample(frac=1.0, random_state=9).reset_index(drop=True)
    out, stats = _run(shuffled, lateness=None)
    exp = _oracle(df)
    pd.testing.assert_frame_equal(out, exp, check_exact=False, rtol=1e-12)
    assert sum(s["late_dropped"] for s in stats) == 0


def test_watermark_closes_windows_in_order(ray_session):
    # time-ordered feeds: watermark closes old windows, nothing is late
    df = _events().sort_values("ts").reset_index(drop=True)
    out, stats = _run(df, lateness=DAY)
    exp = _oracle(df)
    pd.testing.assert_frame_equal(out, exp, check_exact=False, rtol=1e-12)
    assert sum(s["late_dropped"] for s in stats) == 0
    # resident state was bounded: everything beyond the lateness horizon
    # was emitted before close
    assert sum(s["open_windows"] for s in stats) == 0


def test_late_rows_dropped_and_counted(ray_session):
    import ray.data as rd

    agg = StreamingWindowAggregator(
        "key", "v", ts_column="ts", window_us=DAY,
        allowed_lateness_us=0, num_shards=2,
    )
    try:
        now = pd.DataFrame({"ts": [5 * DAY + 1], "key": ["a"], "v": [1.0]})
        agg.feed(rd.from_pandas(now))  # watermark -> 5*DAY+1, days <5 closed
        late = pd.DataFrame({"ts": [2 * DAY], "key": ["a"], "v": [9.0]})
        agg.feed(rd.from_pandas(late))
        out = agg.close().to_pandas()
        stats = agg.stats()
    finally:
        agg.shutdown()
    assert sum(s["late_dropped"] for s in stats) == 1
    # the late row's window was already closed empty; only the live row shows
    assert out["s"].sum() == pytest.approx(1.0)


def test_streaming_window_millisecond_timestamps(ray_session):
    """datetime64[ms] inputs (pandas 2.x keeps parquet's timestamp[ms]
    unit) must window identically to the same instants in [us]."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.state.windows_stream import (
        StreamingWindowAggregator,
    )

    ts = pd.to_datetime(
        ["2024-01-01 01:00", "2024-01-01 23:00", "2024-01-02 01:00", "2024-01-03 05:00"]
    )
    frames = {}
    for unit in ("ms", "us"):
        df = pd.DataFrame(
            {"k": ["a", "a", "a", "b"], "ts": ts.astype(f"datetime64[{unit}]"),
             "v": [1.0, 2.0, 3.0, 4.0]}
        )
        agg = StreamingWindowAggregator(
            "k", "v", ts_column="ts", window_us=86_400_000_000, num_shards=2
        )
        try:
            agg.feed(rd.from_pandas(df), batch_size=2)
            frames[unit] = (
                agg.close().to_pandas().sort_values(["window_start_us", "key"])
                .reset_index(drop=True)
            )
        finally:
            agg.shutdown()
    pd.testing.assert_frame_equal(frames["ms"], frames["us"])
    # three distinct daily windows, not everything collapsed into one
    assert frames["ms"]["window_start_us"].nunique() == 3


def test_streaming_window_null_values_and_keys(ray_session):
    """n counts NON-NULL values (count(value) twin) and null keys form a
    real group instead of silently vanishing."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.state.windows_stream import (
        StreamingWindowAggregator,
    )

    df = pd.DataFrame(
        {
            "k": ["a", "a", None, None],
            "ts": pd.to_datetime(["2024-01-01"] * 4).astype("datetime64[us]"),
            "v": [1.0, None, 5.0, 7.0],
        }
    )
    agg = StreamingWindowAggregator(
        "k", "v", ts_column="ts", window_us=86_400_000_000, num_shards=2
    )
    try:
        agg.feed(rd.from_pandas(df), batch_size=2)
        out = agg.close().to_pandas()
    finally:
        agg.shutdown()
    a = out[out["key"] == "a"].iloc[0]
    assert a["n"] == 1 and a["s"] == 1.0  # count(value) skips the null value
    nul = out[out["key"].isna()]
    assert len(nul) == 1 and nul["n"].iloc[0] == 2 and nul["s"].iloc[0] == 12.0
