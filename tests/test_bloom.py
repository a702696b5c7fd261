"""Bloom bitset kernels + the prefiltered exact anti-join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cdm_data_loader_utils_ray.functions.bloom import (
    _probe_positions,
    anti_join_bloom_agg,
    bloom_contains,
    build_bloom,
)
from cdm_data_loader_utils_ray.functions.sketches import _hash64


def _insert(values: pd.Series, num_bits=1 << 16, num_hashes=5) -> np.ndarray:
    words = np.zeros(num_bits // 64, dtype=np.uint64)
    pos = _probe_positions(_hash64(values), num_bits, num_hashes)
    np.bitwise_or.at(
        words, pos.ravel() >> 6, np.uint64(1) << (pos.ravel() & 63).astype(np.uint64)
    )
    return words


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=200))
def test_no_false_negatives_ints(vals):
    s = pd.Series(vals, dtype="int64")
    words = _insert(s)
    assert bloom_contains(words, s).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=12), max_size=100))
def test_no_false_negatives_strings(vals):
    s = pd.Series(vals, dtype="object")
    words = _insert(s)
    assert bloom_contains(words, s).all()


def test_false_positive_rate_sane():
    rng = np.random.default_rng(7)
    members = pd.Series(rng.integers(0, 2**62, 5000), dtype="int64")
    others = pd.Series(rng.integers(-(2**62), -1, 20000), dtype="int64")
    words = _insert(members, num_bits=1 << 17, num_hashes=5)  # ~2.6 bits/key... m/n≈26
    fp = bloom_contains(words, others).mean()
    assert fp < 0.01, fp


def test_anti_join_bloom_exact(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 300, 5000),
            "grp": rng.choice(["a", "b"], 5000),
            "v": rng.random(5000),
        }
    )
    right = pd.DataFrame({"k": np.arange(0, 300, 3)})  # every third key

    def partial(df):
        if df.empty:
            return pd.DataFrame(
                {"grp": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64"),
                 "s": pd.Series([], dtype="float64")}
            )
        g = df.groupby("grp", sort=False).agg(n=("v", "size"), s=("v", "sum"))
        return g.reset_index()

    def final(parts):
        g = parts.groupby("grp", sort=False).agg(n=("n", "sum"), s=("s", "sum")).reset_index()
        g["n"] = g["n"].astype("int64")
        return g.sort_values("grp").reset_index(drop=True)

    # tiny filter => real false positives => exercises the exact fallback
    # (small_right_limit=0 forces the Bloom path past the broadcast switch)
    got = anti_join_bloom_agg(
        lambda: rd.from_pandas(left),
        rd.from_pandas(right),
        "k",
        partial,
        final,
        num_bits=1 << 10,
        num_hashes=3,
        num_buckets=8,
        small_right_limit=0,
    )
    keep = ~left["k"].isin(right["k"])
    exp = final(partial(left[keep]))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_exact=False, rtol=1e-12
    )


def test_dedup_incremental(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.dedup import dedup_incremental

    seen = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha", "beta"]})
    new = pd.DataFrame(
        {
            "doc_id": [10, 11, 12, 13, 14],
            "text": ["alpha", "gamma", "gamma", "delta", "beta"],
        }
    )
    for limit in (0, 1000):  # 0 forces the Bloom path, 1000 the broadcast one
        out = dedup_incremental(
            rd.from_pandas(new), rd.from_pandas(seen), bloom_bits=1 << 10,
            small_seen_limit=limit,
        ).to_pandas()
        # alpha/beta already seen; gamma self-dedups to first id; delta new
        assert sorted(out["doc_id"].tolist()) == [11, 13]
        assert set(out.columns) >= {"doc_id", "text", "content_sha256"}


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=65, max_value=4096), st.integers(min_value=1, max_value=6))
def test_bloom_bit_alignment_any_num_bits(num_bits, num_hashes):
    """Word-rounding keeps build and probe moduli in agreement for ANY
    requested num_bits (the r3 review found a ragged-bits desync)."""
    s = pd.Series(range(50), dtype="int64")
    import ray.data  # noqa: F401  (not needed; build path is pure numpy here)

    from cdm_data_loader_utils_ray.functions.bloom import _probe_positions

    num_words = (num_bits + 63) // 64
    eff_bits = num_words * 64
    words = np.zeros(num_words, dtype=np.uint64)
    pos = _probe_positions(_hash64(s), eff_bits, num_hashes)
    np.bitwise_or.at(
        words, pos.ravel() >> 6, np.uint64(1) << (pos.ravel() & 63).astype(np.uint64)
    )
    assert bloom_contains(words, s, num_hashes).all()


def test_probe_strides_are_odd():
    h = _hash64(pd.Series(range(1000)))
    h2 = h ^ (h >> np.uint64(33))
    h2 = (h2 * np.uint64(0xFF51AFD7ED558CCD)) | np.uint64(1)
    assert (h2 % 2 == 1).all()


def test_sharded_bloom_no_false_negatives(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.bloom import build_bloom_sharded

    rng = np.random.default_rng(5)
    keys = pd.Series(rng.integers(-(2**60), 2**60, 20000), dtype="int64")
    filt = build_bloom_sharded(
        rd.from_pandas(pd.DataFrame({"k": keys})), "k",
        num_shards=8, bits_per_shard=1 << 14,
    )
    assert filt.contains(keys).all()  # per-shard no-false-negative guarantee
    # FP rate on a disjoint universe stays sane for ~20k keys in 8x16k bits
    probe = pd.Series(rng.integers(2**61, 2**62, 20000), dtype="int64")
    assert filt.contains(probe).mean() < 0.2


def test_sharded_bloom_strings_and_shard_spread(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.bloom import (
        _shard_ids,
        build_bloom_sharded,
    )

    vals = pd.Series([f"key-{i}" for i in range(5000)], dtype="object")
    sh = _shard_ids(_hash64(vals), 16)
    counts = np.bincount(sh.astype(np.int64), minlength=16)
    assert counts.min() > 0.5 * counts.mean()  # shards reasonably balanced
    filt = build_bloom_sharded(
        rd.from_pandas(pd.DataFrame({"k": vals})), "k",
        num_shards=16, bits_per_shard=1 << 13,
    )
    assert filt.contains(vals).all()


def test_anti_join_bloom_sharded_matches_single(ray_session):
    """num_shards>1 must produce the IDENTICAL exact result — the sharded
    filter only changes routing, never membership decisions."""
    import ray.data as rd

    rng = np.random.default_rng(9)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 500, 8000),
            "grp": rng.choice(["a", "b", "c"], 8000),
            "v": rng.random(8000),
        }
    )
    right = pd.DataFrame({"k": np.arange(0, 500, 4)})

    def partial(df):
        if df.empty:
            return pd.DataFrame(
                {"grp": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64"),
                 "s": pd.Series([], dtype="float64")}
            )
        g = df.groupby("grp", sort=False).agg(n=("v", "size"), s=("v", "sum"))
        return g.reset_index()

    def final(parts):
        g = (parts.groupby("grp", sort=False)
             .agg(n=("n", "sum"), s=("s", "sum")).reset_index())
        g["n"] = g["n"].astype("int64")
        return g.sort_values("grp").reset_index(drop=True)

    kw = dict(num_bits=1 << 12, num_hashes=3, num_buckets=8, small_right_limit=0)
    single = anti_join_bloom_agg(
        lambda: rd.from_pandas(left), rd.from_pandas(right), "k",
        partial, final, **kw,
    )
    sharded = anti_join_bloom_agg(
        lambda: rd.from_pandas(left), rd.from_pandas(right), "k",
        partial, final, num_shards=8, **kw,
    )
    keep = ~left["k"].isin(right["k"])
    exp = final(partial(left[keep]))
    for got in (single, sharded):
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp, check_exact=False, rtol=1e-12
        )


def test_build_bloom_and_keys_collects_and_overflows(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.bloom import build_bloom_and_keys

    vals = pd.DataFrame({"k": np.repeat(np.arange(1000, dtype=np.int64), 3)})
    ds = rd.from_pandas(vals)
    words, keys = build_bloom_and_keys(ds, "k", num_bits=1 << 12, collect_limit=5000)
    assert keys is not None and sorted(keys.tolist()) == list(range(1000))
    assert bloom_contains(words, pd.Series(np.arange(1000), dtype="int64"), 5).all()
    # limit below the distinct count -> keys dropped, bitset identical
    words2, keys2 = build_bloom_and_keys(ds, "k", num_bits=1 << 12, collect_limit=999)
    assert keys2 is None
    assert np.array_equal(words, words2)
    # limit 0 -> never collect
    _, keys3 = build_bloom_and_keys(ds, "k", num_bits=1 << 12, collect_limit=0)
    assert keys3 is None


def _agg_pf():
    def partial(df):
        if df.empty:
            return pd.DataFrame(
                {"grp": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64"),
                 "s": pd.Series([], dtype="float64")}
            )
        g = df.groupby("grp", sort=False).agg(n=("v", "size"), s=("v", "sum"))
        return g.reset_index()

    def final(parts):
        g = (parts.groupby("grp", sort=False)
             .agg(n=("n", "sum"), s=("s", "sum")).reset_index())
        g["n"] = g["n"].astype("int64")
        return g.sort_values("grp").reset_index(drop=True)

    return partial, final


def test_anti_join_broadcast_path_matches_bloom_path(ray_session):
    """Under small_right_limit the exact broadcast path must be
    row-identical to the Bloom two-branch path — the switch is purely a
    physical-plan choice."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {"k": rng.integers(0, 400, 6000),
         "grp": rng.choice(["a", "b", "c"], 6000),
         "v": rng.random(6000)}
    )
    right = pd.DataFrame({"k": np.arange(0, 400, 5)})
    partial, final = _agg_pf()
    kw = dict(num_bits=1 << 12, num_hashes=3, num_buckets=8)
    broadcast = anti_join_bloom_agg(
        lambda: rd.from_pandas(left), rd.from_pandas(right), "k",
        partial, final, small_right_limit=10_000, **kw,
    )
    bloom = anti_join_bloom_agg(
        lambda: rd.from_pandas(left), rd.from_pandas(right), "k",
        partial, final, small_right_limit=0, **kw,
    )
    keep = ~left["k"].isin(right["k"])
    exp = final(partial(left[keep]))
    for got in (broadcast, bloom):
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp, check_exact=False, rtol=1e-12
        )


def test_semi_join_bloom_agg_both_paths(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.bloom import semi_join_bloom_agg

    rng = np.random.default_rng(13)
    left = pd.DataFrame(
        {"k": rng.integers(0, 400, 6000),
         "grp": rng.choice(["a", "b"], 6000),
         "v": rng.random(6000)}
    )
    right = pd.DataFrame({"k": np.arange(0, 400, 7)})
    partial, final = _agg_pf()
    kw = dict(num_bits=1 << 12, num_hashes=3, num_buckets=8)
    broadcast = semi_join_bloom_agg(
        rd.from_pandas(left), rd.from_pandas(right), "k",
        partial, final, small_right_limit=10_000, **kw,
    )
    bloom = semi_join_bloom_agg(
        rd.from_pandas(left), rd.from_pandas(right), "k",
        partial, final, small_right_limit=0, **kw,
    )
    keep = left["k"].isin(right["k"])
    exp = final(partial(left[keep]))
    for got in (broadcast, bloom):
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp, check_exact=False, rtol=1e-12
        )


def test_adaptive_buckets_bounds(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.bloom import _adaptive_buckets

    small = rd.from_pandas(pd.DataFrame({"x": np.arange(10)}))
    _, b = _adaptive_buckets(small)
    assert b == 4  # floor
    _, b2 = _adaptive_buckets(small, rows_per_bucket=2)
    assert b2 == 5  # ceil(10/2)
