"""Regression tests for the round-4 review of queries/windows/global-order:
NaT event times, all-null-key window emissions, NaN-score budget selection."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cdm_data_loader_utils_ray.stages.global_order import prefix_budget_select
from cdm_data_loader_utils_ray.state.windows_stream import StreamingWindowAggregator

DAY_US = 86_400_000_000


def test_streaming_window_drops_nat_timestamps():
    """A NaT ts must not wrap into a phantom far-future window that leaks
    shard state forever; it is dropped and counted."""
    df = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", None, "2024-01-01 11:00"]
            ),
            "v": [1.0, 2.0, 3.0],
        }
    )
    agg = StreamingWindowAggregator("k", "v", ts_column="ts", window_us=DAY_US,
                                    num_shards=2)
    try:
        agg.feed(rd.from_pandas(df))
        out = agg.close().to_pandas()
    finally:
        agg.shutdown()
    assert agg.null_ts_dropped == 1
    assert len(out) == 2  # one window per key, no phantom rows
    assert (out["window_start_us"] >= 0).all()
    assert out.set_index("key")["s"].to_dict() == {"a": 1.0, "b": 3.0}


def test_streaming_window_all_null_key_emission():
    """A watermark emission consisting ONLY of null-keyed windows must not
    infer a null-typed key column (close()'s concat would crash)."""
    early = pd.DataFrame(
        {
            "k": pd.Series([None, None], dtype="object"),
            "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00"]),
            "v": [1.0, 2.0],
        }
    )
    late = pd.DataFrame(
        {
            "k": ["z"],
            "ts": pd.to_datetime(["2024-03-01 00:00"]),
            "v": [9.0],
        }
    )
    agg = StreamingWindowAggregator(
        "k", "v", ts_column="ts", window_us=DAY_US,
        allowed_lateness_us=DAY_US, num_shards=1,
    )
    try:
        agg.feed(rd.from_pandas(early))
        agg.feed(rd.from_pandas(late))  # watermark closes the null-key window
        out = agg.close().to_pandas()
    finally:
        agg.shutdown()
    assert len(out) == 2
    nullrow = out[out["key"].isna()]
    assert len(nullrow) == 1 and nullrow.iloc[0]["s"] == 3.0


def test_prefix_budget_select_nan_scores_last():
    """Null scores must order LAST (DESC NULLS LAST like the SQL twin),
    not consume the budget first via bucket 0."""
    df = pd.DataFrame(
        {
            "id": range(8),
            "score": [np.nan, np.nan, 9.0, 8.0, 7.0, 6.0, 5.0, 4.0],
            "w": [10.0] * 8,
        }
    )
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    out = (
        prefix_budget_select(
            lambda: rd.from_arrow(tbl), "score", "id", "w",
            budget=40.0, num_buckets=4,
        )
        .to_pandas()
        .sort_values("cum_value")
    )
    # budget of 40 takes the four best REAL scores; NaN rows never selected
    assert out["id"].tolist() == [2, 3, 4, 5]
    assert not out["score"].isna().any()


def test_fsspec_http_probe_is_thread_safe():
    """Ray's read path probes `from fsspec.implementations.http import
    HTTPFileSystem` per Dataset construction; with aiohttp absent the
    failed import is never cached and concurrent probes race (bare
    ImportError from a partially-initialized module).  The package
    __init__ installs a deterministic stub, so the probe must now succeed
    from many threads at once — and the stub must refuse actual use."""
    from concurrent.futures import ThreadPoolExecutor

    import cdm_data_loader_utils_ray  # noqa: F401  (installs the stub)

    def probe(_):
        from fsspec.implementations.http import HTTPFileSystem
        return HTTPFileSystem

    with ThreadPoolExecutor(max_workers=16) as ex:
        classes = list(ex.map(probe, range(64)))
    assert len({id(c) for c in classes}) == 1
    cls = classes[0]
    # real aiohttp present -> real class is fine; stub -> must raise on use
    if cls.__module__ != "fsspec.implementations.http":
        import pytest as _pytest

        with _pytest.raises(ImportError):
            cls()


def test_q5_join_fallback_matches_broadcast(ray_session):
    """r4 verdict item 5: the supplier dim collect is gated behind a
    broadcast threshold; at a forced tiny limit q5 takes the partitioned
    hash-join fallback and must produce identical rows."""
    from cdm_data_loader_utils_ray.queries import q5_region_revenue

    sf = "/root/testdata/sf0.001"
    a = q5_region_revenue(sf)
    b = q5_region_revenue(sf, broadcast_limit=0)
    assert a.equals(b)
