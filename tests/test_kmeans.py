"""Distributed k-means: recovers planted clusters, deterministic across
reruns, empty-cluster-safe."""

import numpy as np
import pandas as pd
import ray.data as rd


def _blobs(k=4, per=500, d=8, seed=7, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 3
    pts = np.concatenate(
        [centers[i] + rng.normal(scale=spread, size=(per, d)) for i in range(k)]
    )
    labels = np.repeat(np.arange(k), per)
    order = rng.permutation(len(pts))
    return pts[order].astype(np.float32), labels[order], centers


def _ds(pts):
    return rd.from_pandas(pd.DataFrame({"vec": list(map(list, pts))})).repartition(6)


def test_kmeans_recovers_planted_centers():
    from cdm_data_loader_utils_ray.functions.kmeans import assign_clusters, kmeans

    pts, labels, centers = _blobs()
    cents = kmeans(_ds(pts), "vec", k=4, iters=8, seed=3)
    # every learned centroid sits on one true center (within 3x the spread)
    d = np.linalg.norm(cents[:, None, :] - centers[None, :, :], axis=2)
    assert (d.min(axis=1) < 0.15).all()
    # and the assignment reproduces the planted partition (up to relabeling)
    out = assign_clusters(_ds(pts), cents, "vec").to_pandas()
    # order of rows in to_pandas matches input order of the dataset blocks;
    # instead check purity via pandas crosstab on re-assignment
    a = out["cluster"].to_numpy()
    # purity: each learned cluster maps to exactly one true label
    df = pd.DataFrame({"a": a[: len(labels)], "t": labels[: len(a)]})
    purity = df.groupby("a")["t"].agg(lambda s: s.value_counts(normalize=True).iloc[0])
    assert (purity > 0.99).all()


def test_kmeans_deterministic():
    from cdm_data_loader_utils_ray.functions.kmeans import kmeans

    pts, _, _ = _blobs(seed=11)
    c1 = kmeans(_ds(pts), "vec", k=4, iters=4, seed=5)
    c2 = kmeans(_ds(pts), "vec", k=4, iters=4, seed=5)
    assert np.array_equal(c1, c2)


def test_kmeans_more_clusters_than_points():
    from cdm_data_loader_utils_ray.functions.kmeans import kmeans

    pts = np.array([[0.0, 0.0], [1.0, 1.0]], dtype=np.float32)
    cents = kmeans(_ds(pts), "vec", k=5, iters=2, seed=1)
    assert cents.shape == (5, 2)
    assert np.isfinite(cents).all()
