"""Banded vectorized Levenshtein kernel + the blocked fuzzy-pair operator."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cdm_data_loader_utils_ray.functions.fuzzy import fuzzy_pairs, levenshtein


def _reference_lev(s: str, t: str) -> int:
    # classic O(mn) DP, no shortcuts — the oracle for the vectorized kernel
    m, n = len(s), len(t)
    prev = list(range(n + 1))
    for i, cs in enumerate(s, 1):
        cur = [i] + [0] * n
        for j, ct in enumerate(t, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct))
        prev = cur
    return prev[n]


@pytest.mark.parametrize(
    "s,t,d",
    [
        ("", "", 0),
        ("", "abc", 3),
        ("kitten", "sitting", 3),
        ("flaw", "lawn", 2),
        ("abc", "abc", 0),
        ("abc", "axc", 1),
        ("abcdef", "abdef", 1),
        ("a" * 50, "a" * 49 + "b", 1),
    ],
)
def test_levenshtein_known(s, t, d):
    assert levenshtein(s, t) == d
    assert levenshtein(t, s) == d


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abxy é", max_size=24),
    st.text(alphabet="abxy é", max_size=24),
)
def test_levenshtein_matches_reference(s, t):
    assert levenshtein(s, t) == _reference_lev(s, t)


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="abxy", max_size=30),
    st.text(alphabet="abxy", max_size=30),
    st.integers(min_value=0, max_value=4),
)
def test_levenshtein_banded_contract(s, t, k):
    """With max_dist=k the result is exact when <= k, and > k iff the true
    distance is > k — the only property the pair filter relies on."""
    true = _reference_lev(s, t)
    got = levenshtein(s, t, max_dist=k)
    if true <= k:
        assert got == true
    else:
        assert got > k


def test_fuzzy_pairs_blocked(ray_session):
    import ray.data as rd

    suffix = "the quick brown fox jumps over it"  # > block_width, shared tail
    rows = [
        {"doc_id": 1, "text": "hello " + suffix},
        {"doc_id": 2, "text": "hellp " + suffix},   # dist 1 from doc 1
        {"doc_id": 3, "text": "HELLO " + suffix},   # dist 5 from doc 1 (case)
        {"doc_id": 4, "text": "unrelated entirely different ending"},
        {"doc_id": 5, "text": None},                # null -> ''
        {"doc_id": 6, "text": ""},                  # pairs with doc 5 at dist 0
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = fuzzy_pairs(ds, max_dist=2, block_width=16, num_buckets=4).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b", "dist"]].itertuples(index=False)))
    assert got == {(1, 2, 1), (5, 6, 0)}


def test_fuzzy_dedup_clusters(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.fuzzy import fuzzy_dedup_clusters

    tail = " shared ending that makes one block here"
    rows = [
        {"doc_id": 1, "text": "aaaa" + tail},
        {"doc_id": 2, "text": "aaab" + tail},   # d1 from 1
        {"doc_id": 3, "text": "aabb" + tail},   # d1 from 2, d2 from 1
        {"doc_id": 4, "text": "zzzz" + tail},   # same block, far away
        {"doc_id": 5, "text": "totally different text with other suffix"},
    ]
    out = fuzzy_dedup_clusters(
        rd.from_arrow(__import__("pyarrow").Table.from_pylist(rows)),
        max_dist=2, block_width=16, num_buckets=4,
    )
    lut = dict(zip(out["doc_id"], out["cluster"]))
    assert lut[1] == lut[2] == lut[3] == 1
    assert 4 not in lut and 5 not in lut  # singletons have no pairs


def test_fuzzy_pairs_string_ids(ray_session):
    """String doc ids are first-class across the dedup family — the pair
    generator must not coerce them to int64 (r4 review)."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.fuzzy import fuzzy_pairs

    # typo in the FIRST character: suffix blocking requires the pair to
    # share the trailing block_width characters
    df = pd.DataFrame(
        {
            "doc_id": ["alpha", "beta", "gamma"],
            "text": ["the quick brown fox", "xhe quick brown fox", "unrelated words"],
        }
    )
    out = fuzzy_pairs(
        rd.from_pandas(df), id_column="doc_id", text_column="text",
        max_dist=2, block_width=8, num_buckets=2,
    ).to_pandas()
    assert {"alpha", "beta"} == set(out["id_a"]) | set(out["id_b"])
    assert out["dist"].tolist() == [1]
