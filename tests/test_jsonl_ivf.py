"""JSONL source and IVF similarity."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from cdm_data_loader_utils_ray.core.schemas import INVALID_DATA_COLUMN
from cdm_data_loader_utils_ray.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    train_ivf_centroids,
)
from cdm_data_loader_utils_ray.sources.jsonl import JsonlParser, read_jsonl

SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64(), nullable=False),
        pa.field("name", pa.string(), nullable=True),
        pa.field("score", pa.float64(), nullable=True),
    ]
)


def test_jsonl_valid_invalid_mix(tmp_path):
    payload = (
        b'{"id": 1, "name": "a", "score": 0.5}\n'
        b"this is not json\n"
        b'{"id": 2, "extra": true}\n'
        b'{"id": "notanint", "name": "c"}\n'
        b"[1,2,3]\n"
    )
    out = JsonlParser(SCHEMA).parse_file(payload)
    assert len(out) == 5
    assert out["id"].to_pylist() == [1, None, 2, None, None]
    inv = out[INVALID_DATA_COLUMN].to_pylist()
    assert inv[0] is None
    assert inv[1] is not None  # undecodable
    assert inv[2] is None  # extra key fine
    assert inv[3] is not None  # type mismatch captured
    assert inv[4] is not None  # non-object
    p = tmp_path / "x.jsonl"
    p.write_bytes(payload)
    df = read_jsonl(str(p), SCHEMA).to_pandas()
    assert len(df) == 5


def _vec_ds(n=200, d=16, seed=9):
    rng = np.random.default_rng(seed)
    # two clusters so IVF cells are meaningful
    a = rng.standard_normal((n // 2, d)) + 4
    b = rng.standard_normal((n // 2, d)) - 4
    m = np.concatenate([a, b]).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m], type=pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(t), m


def test_ivf_matches_bruteforce_topk():
    ds, m = _vec_ds()
    cent = train_ivf_centroids(ds, n_cells=4, sample_frac=0.5, seed=3)
    assert cent.shape[1] == 16
    q = m[7]
    exact = brute_force_topk(ds, q, k=5)
    approx = ivf_topk(ds, q, cent, k=5, n_probe=2)
    # query's own cluster is probed: top hit identical, strong overlap
    assert approx["vec_id"].iloc[0] == exact["vec_id"].iloc[0]
    # ANN recall: majority overlap with the exact top-k
    assert len(set(approx["vec_id"]) & set(exact["vec_id"])) >= 3


def test_sq8_recall_vs_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.similarity import (
        brute_force_topk,
        sq8_topk,
    )

    rng = np.random.default_rng(41)
    n, d = 5000, 32
    base = rng.normal(size=(8, d))
    vecs = (base[rng.integers(0, 8, n)] + 0.3 * rng.normal(size=(n, d))).astype(
        np.float32
    )
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [v.tolist() for v in vecs]})
    ds = rd.from_pandas(df)
    q = vecs[7] + 0.05 * rng.normal(size=d).astype(np.float32)
    exact = brute_force_topk(ds, q, k=10, tie_ndigits=6)
    approx = sq8_topk(ds, q, k=10, rescore=128, tie_ndigits=6)
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.9, recall
