"""interval_join: tile-replicated interval-overlap join vs brute force."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.stages.temporal import interval_join


def _mk(rng, n, prefix, keys=40, span=10_000_000, max_len=500_000):
    s = rng.integers(0, span, n)
    ln = rng.integers(1, max_len, n)
    return pd.DataFrame(
        {
            "k": rng.integers(0, keys, n),
            f"{prefix}id": np.arange(n, dtype=np.int64),
            f"{prefix}s": s,
            f"{prefix}e": s + ln,
        }
    )


def _brute(L, R):
    m = L.merge(R, on="k")
    hit = m[(m["ls"] < m["re"]) & (m["rs"] < m["le"])]
    return set(zip(hit["lid"], hit["rid"]))


@pytest.mark.parametrize("seed,tile", [(7, 250_000), (8, 1_000_000), (9, 37)])
def test_matches_brute_force(ray_session, seed, tile):
    rng = np.random.default_rng(seed)
    L, R = _mk(rng, 800, "l"), _mk(rng, 800, "r")
    got = interval_join(
        rd.from_pandas(L), rd.from_pandas(R), "ls", "le", "rs", "re", ["k"],
        tile_width_us=tile, num_buckets=16,
    ).to_pandas()
    pairs = set(zip(got["lid"], got["rid"]))
    assert len(got) == len(pairs), "duplicate pair emitted"
    assert pairs == _brute(L, R)


def test_half_open_boundaries_and_degenerate_intervals(ray_session):
    # touching intervals ([0,10) vs [10,20)) must NOT match.  Empty
    # ([100,100)) and inverted ([200,190)) intervals follow PREDICATE
    # semantics (ls < re AND rs < le) — exactly what the SQL range join
    # computes — and the tile attribution must still emit them once.
    L = pd.DataFrame({"k": [1, 1, 1], "lid": [0, 1, 2],
                      "ls": [0, 100, 200], "le": [10, 100, 190]})
    R = pd.DataFrame({"k": [1, 1, 1], "rid": [0, 1, 2],
                      "rs": [10, 90, 150], "re": [20, 110, 260]})
    got = interval_join(
        rd.from_pandas(L), rd.from_pandas(R), "ls", "le", "rs", "re", ["k"],
        tile_width_us=64, num_buckets=4,
    ).to_pandas()
    pairs = set(zip(got["lid"], got["rid"]))
    assert len(got) == len(pairs), "duplicate pair emitted"
    assert pairs == _brute(L, R)
    assert (0, 0) not in pairs  # touching endpoints, half-open: no match
    # the degenerate rows DO satisfy the predicate against these partners
    assert (1, 1) in pairs and (2, 2) in pairs


def test_timestamp_columns(ray_session):
    rng = np.random.default_rng(11)
    L, R = _mk(rng, 300, "l"), _mk(rng, 300, "r")
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    Lt = L.assign(ls=pd.to_datetime((L["ls"] + base), unit="us"),
                  le=pd.to_datetime((L["le"] + base), unit="us"))
    Rt = R.assign(rs=pd.to_datetime((R["rs"] + base), unit="us"),
                  re=pd.to_datetime((R["re"] + base), unit="us"))
    got = interval_join(
        rd.from_pandas(Lt), rd.from_pandas(Rt), "ls", "le", "rs", "re", ["k"],
        tile_width_us=250_000, num_buckets=8,
    ).to_pandas()
    assert set(zip(got["lid"], got["rid"])) == _brute(L, R)


def test_null_boundaries_never_match(ray_session):
    # SQL semantics: a NULL start/end fails every comparison — the NaT
    # int64-min aliasing must not leak matches
    L = pd.DataFrame(
        {"k": [1, 1], "lid": [0, 1],
         "ls": pd.to_datetime([None, "2024-01-01"]),
         "le": pd.to_datetime(["2024-01-02", "2024-01-02"])}
    )
    R = pd.DataFrame(
        {"k": [1, 1], "rid": [0, 1],
         "rs": pd.to_datetime(["2024-01-01", "2024-01-01"]),
         "re": pd.to_datetime(["2024-01-03", None])}
    )
    got = interval_join(
        rd.from_pandas(L), rd.from_pandas(R), "ls", "le", "rs", "re", ["k"],
        tile_width_us=86_400_000_000, num_buckets=2,
    ).to_pandas()
    assert set(zip(got["lid"], got["rid"])) == {(1, 0)}
