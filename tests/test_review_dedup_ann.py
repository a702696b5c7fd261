"""Regression tests for the round-4 review of the dedup/ANN family:
string-id and null-text exact dedup, probe_hamming expansion in the
unindexed LSH search, empty-block tolerance, LSH band validation, sq8
empty-block index schema."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.functions.dedup import (
    dedup_exact,
    dedup_incremental,
    embedding_near_dups,
    minhash_dedup,
    minhash_lsh_candidates,
)
from cdm_data_loader_utils_ray.functions.similarity import (
    BruteForceTopK,
    brute_force_topk,
    lsh_bucketed_topk,
    lsh_signature,
    random_hyperplanes,
)


def test_dedup_exact_string_ids_and_null_text():
    """String doc ids must work (pre-fix: astype(int64) crashed) and null
    texts must dedup together (pre-fix: null hash keys never deduped)."""
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": ["u-c", "u-a", "u-b", "n2", "n1"],
                "text": ["same", "same", "other", None, None],
            }
        )
    )
    out = dedup_exact(ds).to_pandas().sort_values("doc_id")
    # 'same' keeps min id u-a; nulls dedup to one row keeping n1
    assert out["doc_id"].tolist() == ["n1", "u-a", "u-b"]
    out_max = dedup_exact(ds, keep="max").to_pandas().sort_values("doc_id")
    assert out_max["doc_id"].tolist() == ["n2", "u-b", "u-c"]


def test_dedup_incremental_string_ids():
    new = rd.from_arrow(
        pa.table({"doc_id": ["a", "b", "c"], "text": ["x", "x", "seen-text"]})
    )
    seen = rd.from_arrow(pa.table({"doc_id": ["z"], "text": ["seen-text"]}))
    out = dedup_incremental(new, seen).to_pandas()
    assert sorted(out["doc_id"]) == ["a"]  # b is an intra-batch dup, c is seen


def test_lsh_bucketed_topk_probe_hamming_two():
    """probe_hamming=2 must actually expand to 2-bit flips (pre-fix it
    behaved exactly like 1): plant a neighbor whose signature differs from
    the query's in exactly 2 bits and require it in the results."""
    rng = np.random.default_rng(11)
    n_planes = 8
    dim = 16
    planes = random_hyperplanes(dim, n_planes, seed=42)
    q = rng.standard_normal(dim).astype(np.float32)
    qsig = int(lsh_signature(q.reshape(1, -1), planes)[0])
    # search vectors differing from q's signature by exactly 2 bits
    target = None
    for _ in range(20000):
        v = q + rng.standard_normal(dim).astype(np.float32) * 0.6
        sig = int(lsh_signature(v.reshape(1, -1), planes)[0])
        if bin(sig ^ qsig).count("1") == 2:
            target = v
            break
    assert target is not None
    filler = rng.standard_normal((20, dim)).astype(np.float32)
    vecs = [target] + list(filler)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], type=pa.list_(pa.float32())
                ),
            }
        )
    )
    got2 = lsh_bucketed_topk(
        ds, q, k=25, n_planes=n_planes, seed=42, probe_hamming=2
    )
    assert 0 in set(got2["vec_id"])  # pre-fix: bucket never scanned


def test_similarity_tolerates_empty_blocks():
    data = pa.table(
        {
            "vec_id": pa.array([1, 2], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [0.0, 1.0]], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = rd.from_arrow(data.slice(0, 0)).union(rd.from_arrow(data))
    q = np.array([1.0, 0.0], dtype=np.float32)
    out = brute_force_topk(ds, q, k=1)
    assert out["vec_id"].tolist() == [1]
    # embedding_near_dups: empty first block must not poison the plane cache
    dup = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], type=pa.list_(pa.float32())
            ),
        }
    )
    ds2 = rd.from_arrow(dup.slice(0, 0)).union(rd.from_arrow(dup))
    pairs = embedding_near_dups(ds2, threshold=0.99)
    assert {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])} == {(1, 2)}


def test_similarity_rejects_null_vectors():
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, 2], type=pa.int64()),
                "embedding": pa.array([[1.0, 0.0], None], type=pa.list_(pa.float32())),
            }
        )
    )
    with pytest.raises(Exception, match="null embedding"):
        brute_force_topk(ds, np.array([1.0, 0.0], dtype=np.float32), k=1)


def test_minhash_bands_must_divide_perms():
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["abc def ghi"]}))
    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_candidates(ds, num_perm=100, bands=32)


def test_minhash_dedup_concurrency_uses_actor_verifier():
    """concurrency= is honored (actor-pool verify path) and matches the
    task-form result."""
    texts = ["the quick brown fox jumps over the lazy dog"] * 3 + [
        "completely different words entirely here now"
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(4), type=pa.int64()), "text": texts})
    )
    a = minhash_dedup(ds, threshold=0.8)
    b = minhash_dedup(ds, threshold=0.8, concurrency=2)
    assert a.sort_values("doc_id").values.tolist() == b.sort_values(
        "doc_id"
    ).values.tolist()


def test_ann_index_sq8_survives_empty_blocks(tmp_path):
    from cdm_data_loader_utils_ray.functions.ann_index import build_ann_index

    data = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = rd.from_arrow(data.slice(0, 0)).union(rd.from_arrow(data))
    idx = build_ann_index(
        ds, str(tmp_path / "idx"), kind="lsh", n_planes=4, store_sq8=True
    )
    got = idx.search(np.array([1.0, 0.0], dtype=np.float32), k=2, use_sq8=True)
    assert 1 in set(got["vec_id"])


def test_ann_index_lsh_empty_corpus_clear_error(tmp_path):
    from cdm_data_loader_utils_ray.functions.ann_index import build_ann_index

    empty = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float32())),
            }
        )
    )
    with pytest.raises(ValueError, match="empty corpus"):
        build_ann_index(empty, str(tmp_path / "idx"), kind="lsh")
