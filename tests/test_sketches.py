"""Accuracy and mergeability of the streaming sketches (no SQL oracle by
nature — asserted against exact answers)."""

import numpy as np
import pandas as pd
import ray.data as rd


def test_hll_accuracy_and_insensitivity_to_duplication():
    from cdm_data_loader_utils_ray.functions.sketches import approx_distinct

    rng = np.random.default_rng(11)
    uniq = rng.integers(0, 1 << 60, 200_000)
    # duplicate heavily: 600k rows, 200k distinct
    vals = np.concatenate([uniq, rng.choice(uniq, 400_000)])
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
    est = approx_distinct(ds, "x", p=14)
    assert abs(est - 200_000) / 200_000 < 0.03


def test_hll_strings_and_small_range_linear_counting():
    from cdm_data_loader_utils_ray.functions.sketches import approx_distinct

    df = pd.DataFrame({"s": [f"key-{i % 50}" for i in range(5000)]})
    est = approx_distinct(rd.from_pandas(df).repartition(4), "s", p=12)
    assert est == 50  # linear-counting regime is exact this small


def test_hll_partials_merge_like_union():
    from cdm_data_loader_utils_ray.functions.sketches import (
        _hll_estimate,
        _hll_partial,
    )

    a = pd.Series(np.arange(0, 60_000))
    b = pd.Series(np.arange(30_000, 90_000))  # overlap -> union = 90k
    merged = np.maximum(_hll_partial(a, 14), _hll_partial(b, 14))
    assert abs(_hll_estimate(merged) - 90_000) / 90_000 < 0.03


def test_approx_quantiles_heavy_tail():
    from cdm_data_loader_utils_ray.functions.sketches import approx_quantiles

    rng = np.random.default_rng(5)
    x = rng.lognormal(mean=1.0, sigma=2.0, size=500_000)
    ds = rd.from_pandas(pd.DataFrame({"v": x})).repartition(8)
    got = approx_quantiles(ds, "v", [0.5, 0.95, 0.99], k=4096)
    for q in (0.5, 0.95, 0.99):
        exact = float(np.quantile(x, q))
        assert abs(got[q] - exact) / exact < 0.01, (q, got[q], exact)


def test_approx_quantiles_empty_and_nulls():
    from cdm_data_loader_utils_ray.functions.sketches import approx_quantiles

    ds = rd.from_pandas(pd.DataFrame({"v": [None, None]}, dtype="float64"))
    out = approx_quantiles(ds, "v", [0.5])
    assert np.isnan(out[0.5])


# ---------------------------------------------------------------------------
# Heavy hitters + count-min
# ---------------------------------------------------------------------------
def test_heavy_hitters_guarantee(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.sketches import heavy_hitters

    rng = np.random.default_rng(19)
    n = 100000
    # zipf-ish: a few dominant keys over a long uniform tail
    head = rng.choice([0, 1, 2], size=n // 2, p=[0.6, 0.3, 0.1])
    tail = rng.integers(1000, 50000, n // 2)
    vals = pd.Series(np.concatenate([head, tail]))
    vals = vals.sample(frac=1.0, random_state=0).reset_index(drop=True)
    true = vals.value_counts()

    k = 64
    out = heavy_hitters(rd.from_pandas(pd.DataFrame({"x": vals})), "x", k=k)
    got = dict(zip(out["x"], out["count_lb"]))
    thresh = n / (k + 1)
    for v, c in true.items():
        if c > thresh:
            assert v in got, f"missed guaranteed hitter {v} (count {c})"
            # lower bound within the PROVEN MG undercount envelope: the
            # n/(k+1) budget is shared across both compress levels (mass-
            # conservation argument in the heavy_hitters docstring)
            assert got[v] <= c
            assert c - got[v] <= thresh + 1
    # reported counts never exceed the truth
    for v, c in got.items():
        assert c <= true.get(v, 0)


def test_heavy_hitters_adversarial_two_level_bound(ray_session):
    """Batch layout built to maximize decrements at BOTH compress levels:
    every batch is one heavy key twice plus k+1 distinct singletons, so
    each per-batch compress fires with decrement 1 and the merge-level
    compress fires over the surviving tail.  The total undercount must
    still respect the single shared n/(k+1) budget (not 2x it)."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.sketches import heavy_hitters

    k = 16
    n_batches = 400
    rows = []
    t = 0
    for b in range(n_batches):
        rows.extend(["heavy", "heavy"])
        for _ in range(k + 1):
            rows.append(f"tail_{t}")  # all distinct -> max per-batch decrement
            t += 1
    n = len(rows)
    ds = rd.from_pandas(pd.DataFrame({"x": rows}))
    out = heavy_hitters(ds, "x", k=k, batch_size=k + 3)
    got = dict(zip(out["x"], out["count_lb"]))
    true_heavy = 2 * n_batches
    assert true_heavy > n / (k + 1)  # the completeness guarantee applies
    assert "heavy" in got
    assert got["heavy"] <= true_heavy
    assert true_heavy - got["heavy"] <= n / (k + 1) + 1


def test_count_min_bounds(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.sketches import (
        count_min_build,
        count_min_query,
    )

    rng = np.random.default_rng(29)
    n = 60000
    vals = pd.Series(rng.zipf(1.3, n) % 10000)
    true = vals.value_counts()
    tbl = count_min_build(rd.from_pandas(pd.DataFrame({"x": vals})), "x",
                          width=4096, depth=4)
    probe = pd.Series(true.index[:200])
    est = count_min_query(tbl, probe)
    t = true.loc[probe].to_numpy()
    assert (est >= t).all()                      # never undercounts
    assert np.mean(est - t) <= 2 * n / 4096 + 1  # overcount within envelope


def test_count_min_query_int32_probe_matches_build(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.sketches import (
        count_min_build,
        count_min_query,
    )

    vals = np.repeat(np.arange(50, dtype=np.int64), 7)
    ds = rd.from_pandas(pd.DataFrame({"k": vals}))
    tbl = count_min_build(ds, "k", width=4096, depth=4)
    q64 = count_min_query(tbl, pd.Series(np.arange(50, dtype=np.int64)))
    q32 = count_min_query(tbl, pd.Series(np.arange(50, dtype=np.int32)))
    assert (q64 == q32).all()
    assert (q64 >= 7).all()  # never undercounts
