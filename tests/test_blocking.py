"""Sorted-neighborhood blocking vs brute-force windowed self-join."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.functions.blocking import sorted_neighborhood_pairs


def _brute(df, key, idc, w):
    s = df.sort_values([key, idc], kind="mergesort").reset_index(drop=True)
    s["rn"] = np.arange(1, len(s) + 1)
    out = set()
    for i in range(len(s)):
        for j in range(i + 1, min(i + w + 1, len(s))):
            out.add((s[idc][i], s[idc][j], i + 1, j + 1))
    return out


@pytest.mark.parametrize("seed,w,tile", [(3, 4, 64), (4, 1, 1024), (5, 9, 16)])
def test_matches_brute_force(ray_session, seed, w, tile):
    rng = np.random.default_rng(seed)
    n = 500
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            # duplicate-heavy keys: ties broken by id must stay exact
            "k": [f"key-{v:03d}" for v in rng.integers(0, 60, n)],
        }
    )
    got = sorted_neighborhood_pairs(
        rd.from_pandas(df), "k", "rid", window=w, num_buckets=8, tile_rows=tile
    ).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"], got["rn_a"], got["rn_b"]))
    assert len(got) == len(pairs), "duplicate pair emitted"
    assert pairs == _brute(df, "k", "rid", w)
    # SNM guarantee: candidate count bounded by n * window
    assert len(got) <= n * w


def test_window_larger_than_corpus(ray_session):
    df = pd.DataFrame({"rid": [3, 1, 2], "k": ["b", "a", "c"]})
    got = sorted_neighborhood_pairs(
        rd.from_pandas(df), "k", "rid", window=10, num_buckets=4
    ).to_pandas()
    # all 3 pairs, ranks by (key, id): a->1, b->2, c->3
    assert set(zip(got["id_a"], got["id_b"])) == {(1, 3), (1, 2), (3, 2)}


def test_constant_key_degenerate(ray_session):
    # every key equal: ONE order bucket holds everything; ranks fall back
    # to pure id order and the window is still exact
    n = 120
    df = pd.DataFrame({"rid": np.arange(n, dtype=np.int64)[::-1], "k": ["x"] * n})
    got = sorted_neighborhood_pairs(
        rd.from_pandas(df), "k", "rid", window=3, num_buckets=8, tile_rows=16
    ).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"], got["rn_a"], got["rn_b"]))
    assert len(got) == len(pairs)
    assert pairs == _brute(df, "k", "rid", 3)


def test_more_buckets_than_keys(ray_session):
    df = pd.DataFrame({"rid": np.arange(10, dtype=np.int64),
                       "k": [f"k{i%2}" for i in range(10)]})
    got = sorted_neighborhood_pairs(
        rd.from_pandas(df), "k", "rid", window=2, num_buckets=64
    ).to_pandas()
    assert set(zip(got["id_a"], got["id_b"], got["rn_a"], got["rn_b"])) == _brute(
        df, "k", "rid", 2
    )
