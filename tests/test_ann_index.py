"""Materialized ANN index: the search READS only the probe cells' files
(r3 verdict: index-less ANN was the family's scale-killer — prove the
read itself prunes, not just the scoring)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from cdm_data_loader_utils_ray.functions.ann_index import AnnIndex, build_ann_index
from cdm_data_loader_utils_ray.functions.similarity import brute_force_topk


def _vec_ds(n=400, d=16, seed=11):
    rng = np.random.default_rng(seed)
    # four DIRECTIONALLY separated clusters (distinct signed axes) so
    # cosine cells are meaningful — same-sign radial offsets would all
    # point the same way and cosine could not tell clusters apart
    centers = np.zeros((4, d), dtype=np.float64)
    centers[0, 0], centers[1, 0], centers[2, 1], centers[3, 1] = 8, -8, 8, -8
    parts = [rng.standard_normal((n // 4, d)) + c for c in centers]
    m = np.concatenate(parts).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in m], type=pa.list_(pa.float32())
            ),
        }
    )
    return rd.from_arrow(t).repartition(8), m


def test_ivf_index_prunes_read_and_matches_brute(ray_session, tmp_path):
    ds, m = _vec_ds()
    idx = build_ann_index(
        ds, str(tmp_path / "ivf"), kind="ivf", n_cells=8, sample_frac=0.9, seed=3
    )
    q = m[7]
    cells = idx.probe_cells(q, n_probe=2)
    probe, total = idx.probe_files(cells), idx.all_files()
    assert probe and set(probe) < set(total)  # STRICT subset: read is pruned
    assert len(probe) < len(total)
    got = idx.search(q, k=5, n_probe=2)
    exact = brute_force_topk(ds, q, k=5)
    assert got["vec_id"].iloc[0] == exact["vec_id"].iloc[0]
    assert len(set(got["vec_id"]) & set(exact["vec_id"])) >= 4
    # every returned row really lives in a probe file
    read_ids = set()
    for f in probe:
        read_ids |= set(pq.read_table(f, columns=["vec_id"])["vec_id"].to_pylist())
    assert set(got["vec_id"]) <= read_ids


def test_ivf_index_load_roundtrip(ray_session, tmp_path):
    ds, m = _vec_ds()
    built = build_ann_index(
        ds, str(tmp_path / "ivf"), kind="ivf", n_cells=8, sample_frac=0.9, seed=3
    )
    loaded = AnnIndex.load(str(tmp_path / "ivf"))
    np.testing.assert_allclose(loaded.centroids, built.centroids)
    q = m[123]
    a = built.search(q, k=5, tie_ndigits=4)
    b = loaded.search(q, k=5, tie_ndigits=4)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()


def test_lsh_index_prunes_read(ray_session, tmp_path):
    ds, m = _vec_ds()
    idx = build_ann_index(
        ds, str(tmp_path / "lsh"), kind="lsh", n_planes=6, seed=5
    )
    q = m[41]
    probe = idx.probe_files(idx.probe_cells(q, probe_hamming=1))
    total = idx.all_files()
    assert probe and len(probe) < len(total)
    got = idx.search(q, k=5, probe_hamming=1)
    exact = brute_force_topk(ds, q, k=5)
    assert got["vec_id"].iloc[0] == exact["vec_id"].iloc[0]
    assert len(set(got["vec_id"]) & set(exact["vec_id"])) >= 3


def test_sq8_sidecar_search(ray_session, tmp_path):
    ds, m = _vec_ds()
    idx = build_ann_index(
        ds, str(tmp_path / "ivf8"), kind="ivf", n_cells=8, sample_frac=0.9,
        seed=3, store_sq8=True,
    )
    q = m[7]
    fast = idx.search(q, k=5, n_probe=2, use_sq8=True, rescore=64)
    slow = idx.search(q, k=5, n_probe=2, use_sq8=False)
    # rescore covers the candidate set -> identical exact-scored top-k
    assert fast["vec_id"].tolist() == slow["vec_id"].tolist()
    np.testing.assert_allclose(fast["cos_sim"], slow["cos_sim"], rtol=1e-6)
    # the quantized column really is persisted (not recomputed per scan)
    f = idx.all_files()[0]
    names = pq.read_schema(f).names
    assert "__ann_q8" in names and "__ann_q8_scale" in names


def test_empty_probe_returns_empty(ray_session, tmp_path):
    ds, m = _vec_ds(n=80)
    idx = build_ann_index(
        ds, str(tmp_path / "lsh"), kind="lsh", n_planes=10, seed=5
    )
    # a far-off query whose bucket (and neighbors) may be unpopulated:
    # search must not crash and returns <=k rows
    q = np.full(16, 100.0, dtype=np.float32)
    out = idx.search(q, k=5, probe_hamming=0)
    assert len(out) <= 5

def test_sq8_ranking_scales_back_per_row(ray_session, tmp_path):
    """Mixed peaky/flat corpus with rescore smaller than the cell: the int8
    pre-rank must multiply the per-row scale back, or a flat vector
    (scale ~ 1/sqrt(d)) saturates to the same int8 pattern as an exact
    copy of the query and can push it out of the rescore window."""
    d = 16
    q = np.zeros(d, dtype=np.float32)
    q[0] = 1.0
    rng = np.random.default_rng(9)
    rows = [q.copy()]                      # vec 0: exact copy, cos = 1.0
    for _ in range(199):                   # flat-ish vectors, cos < 0.9
        v = np.abs(rng.standard_normal(d)).astype(np.float32) + 0.5
        v[0] += 1.0
        rows.append(v / np.linalg.norm(v))
    m = np.stack(rows)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(rows)), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in m], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = rd.from_arrow(t)
    idx = build_ann_index(
        ds, str(tmp_path / "sq8rank"), kind="ivf", n_cells=1, sample_frac=1.0,
        seed=3, store_sq8=True,
    )
    out = idx.search(q, k=1, n_probe=1, use_sq8=True, rescore=4)
    assert out["vec_id"].iloc[0] == 0, out
    assert out["cos_sim"].iloc[0] > 0.999


def test_build_refuses_stale_dir_unless_overwrite(ray_session, tmp_path):
    import pytest

    ds, m = _vec_ds(n=80)
    path = str(tmp_path / "reuse")
    build_ann_index(ds, path, kind="ivf", n_cells=4, sample_frac=0.9, seed=3)
    n_files = len(AnnIndex.load(path).all_files())
    with pytest.raises(ValueError, match="overwrite"):
        build_ann_index(ds, path, kind="ivf", n_cells=4, sample_frac=0.9, seed=3)
    rebuilt = build_ann_index(
        ds, path, kind="ivf", n_cells=4, sample_frac=0.9, seed=3, overwrite=True
    )
    # a rebuild REPLACES the data files; appending would double them
    assert len(rebuilt.all_files()) == n_files


def test_lsh_probe_hamming_two_expands(ray_session, tmp_path):
    ds, m = _vec_ds(n=80)
    idx = build_ann_index(ds, str(tmp_path / "lsh2"), kind="lsh", n_planes=6, seed=5)
    q = m[3]
    c0 = set(idx.probe_cells(q, probe_hamming=0))
    c1 = set(idx.probe_cells(q, probe_hamming=1))
    c2 = set(idx.probe_cells(q, probe_hamming=2))
    assert len(c0) == 1 and c0 < c1 < c2
    # exactly C(6,1) + C(6,2) additional signatures
    assert len(c1) == 1 + 6 and len(c2) == 1 + 6 + 15


def test_ivf_pq_index_search_and_pruned_read(tmp_path, ray_session):
    """The IVF-PQ pairing: codes stored next to the cell id; use_pq search
    pre-ranks on ADC and rescores exactly — results match the plain search
    on a corpus with a planted near-duplicate, and the read stays pruned."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.ann_index import AnnIndex, build_ann_index

    rng = np.random.default_rng(4)
    cents = rng.normal(scale=5.0, size=(4, 16))
    x = (cents[np.arange(800) % 4] + rng.normal(scale=0.3, size=(800, 16))).astype(
        np.float32
    )
    x[123] = x[7] + 0.001  # planted near-dup
    df = pd.DataFrame(
        {"vec_id": np.arange(800, dtype=np.int64),
         "embedding": [r.tolist() for r in x]}
    )
    idx = build_ann_index(
        rd.from_pandas(df).repartition(4), str(tmp_path / "ix"), kind="ivf",
        n_cells=4, n_probe_default=2, store_pq=True, pq_m=8, pq_codes=32,
        pq_sample=800,
    )
    q = x[7]
    plain = idx.search(q, k=5)
    pq = idx.search(q, k=5, use_pq=True, rescore=64)
    assert set(pq["vec_id"]) == set(plain["vec_id"])
    assert {7, 123} <= set(pq["vec_id"])
    files = idx.probe_files(idx.probe_cells(q))
    assert 0 < len(files) < len(idx.all_files())
    # load() round-trips the codebooks
    again = AnnIndex.load(str(tmp_path / "ix"))
    pq2 = again.search(q, k=5, use_pq=True, rescore=64)
    assert pq2["vec_id"].tolist() == pq["vec_id"].tolist()
