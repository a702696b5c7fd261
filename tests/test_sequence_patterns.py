"""Brute-force pinning of stages/temporal.sequence_pattern_counts: the
vectorized shifted-equality kernel vs a per-key Python scan, across key
boundaries, wildcards, null symbols and patterns longer than a key's
sequence."""

import numpy as np
import pandas as pd
import ray.data as rd

from cdm_data_loader_utils_ray.stages.temporal import sequence_pattern_counts


def _brute(df, keys, order, col, pattern, wildcard="*"):
    out = {}
    for k, g in df.groupby(keys, dropna=False):
        if isinstance(k, tuple) and len(keys) == 1:
            k = k[0]
        seq = g.sort_values(order, kind="mergesort")[col].tolist()
        L = len(pattern)
        hits = 0
        for i in range(len(seq) - L + 1):
            ok = True
            for j, sym in enumerate(pattern):
                if sym != wildcard and seq[i + j] != sym:
                    ok = False
                    break
            hits += ok
        if hits:
            out[k] = hits
    return out


def _run(df, pattern, keys=("user",), order=("t",)):
    res = sequence_pattern_counts(
        rd.from_pandas(df), list(keys), list(order), "sym", pattern, num_buckets=4
    ).to_pandas()
    got = {}
    for _, row in res.iterrows():
        k = tuple(row[k] for k in keys)
        got[k if len(keys) > 1 else k[0]] = int(row["n_hits"])
    return got


def test_matches_brute_force_random():
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 40, n),
            "t": rng.permutation(n),
            "sym": rng.choice(list("abc"), n),
        }
    )
    for pattern in (["a", "b"], ["a", "*", "a"], ["c"], ["a", "a", "b", "c"]):
        assert _run(df, pattern) == _brute(df, ["user"], ["t"], "sym", pattern)


def test_overlapping_occurrences_counted():
    # 'aaaa' contains three overlapping 'aa'
    df = pd.DataFrame({"user": [1] * 4, "t": range(4), "sym": list("aaaa")})
    assert _run(df, ["a", "a"]) == {1: 3}


def test_window_never_crosses_key_boundary():
    # user 1 ends with 'a', user 2 starts with 'b' — no cross-key 'ab'
    df = pd.DataFrame(
        {"user": [1, 1, 2, 2], "t": [0, 1, 0, 1], "sym": list("xab y".replace(" ", ""))}
    )
    df["sym"] = ["x", "a", "b", "y"]
    assert _run(df, ["a", "b"]) == {}


def test_wildcard_matches_null_symbol():
    df = pd.DataFrame(
        {"user": [1] * 3, "t": [0, 1, 2], "sym": ["a", None, "b"]}
    )
    assert _run(df, ["a", "*", "b"]) == {1: 1}
    # but a literal position does NOT match null
    assert _run(df, ["a", "c", "b"]) == {}


def test_pattern_longer_than_sequence():
    df = pd.DataFrame({"user": [1, 2, 2], "t": [0, 0, 1], "sym": ["a", "a", "b"]})
    assert _run(df, ["a", "b", "a"]) == {}
    assert _run(df, ["a", "b"]) == {2: 1}


def test_max_span_window():
    df = pd.DataFrame(
        {
            "user": [1] * 4,
            "t": [0, 10, 200, 205],
            "sym": ["a", "b", "a", "b"],
        }
    )
    df["span"] = df["t"]

    def run(max_span):
        res = sequence_pattern_counts(
            rd.from_pandas(df), ["user"], ["t"], "sym", ["a", "b"],
            num_buckets=2, max_span=max_span, span_col="span",
        ).to_pandas()
        return int(res["n_hits"].sum()) if len(res) else 0

    assert run(1000) == 2   # both occurrences fit
    assert run(15) == 2     # gaps 10 and 5 both fit
    assert run(7) == 1      # only the 205-200=5 one
    assert run(1) == 0

    import pytest as _pt
    with _pt.raises(ValueError):
        sequence_pattern_counts(
            rd.from_pandas(df), ["user"], ["t"], "sym", ["a"], max_span=5,
        )
