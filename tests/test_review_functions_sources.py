"""Regression tests for the round-4 review of corpus functions + file
sources: string-id decontamination, positional-header DSV forcing, GFF3
numeric salvage, packing null semantics, sampling arg validation, kmeans
null-vector rejection, DSV options forwarding."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.functions.decontam import contaminated_docs
from cdm_data_loader_utils_ray.functions.kmeans import _to_matrix
from cdm_data_loader_utils_ray.functions.packing import next_fit_pack
from cdm_data_loader_utils_ray.functions.sampling import hash_sample
from cdm_data_loader_utils_ray.sources.dsv import DsvParser
from cdm_data_loader_utils_ray.sources.gff3 import gff3_lines_to_table

SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64(), nullable=False),
        pa.field("name", pa.string(), nullable=True),
    ]
)


@pytest.mark.parametrize("hashed", [False, True])
def test_contaminated_docs_string_ids(hashed):
    """String doc ids must survive the bench-side union (pre-fix: an int64
    sentinel made the two sides' schemas unmergeable)."""
    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": ["docA", "docB"],
                "text": [
                    "the quick brown fox jumps over the lazy dog today",
                    "completely unrelated words here nothing shared at all ok",
                ],
            }
        )
    )
    bench = rd.from_arrow(
        pa.table(
            {
                "doc_id": ["q1"],
                "text": ["the quick brown fox jumps over the lazy dog today"],
            }
        )
    )
    out = contaminated_docs(
        train, bench, k=8, num_buckets=4, hashed=hashed
    ).to_pandas()
    assert set(out["doc_id"]) == {"docA"}
    assert (out["n_hits"] > 0).all()


def test_dsv_positional_header_numeric_column():
    """A file whose header names differ from the declared schema must still
    read all-string and coerce positionally (pre-fix: pyarrow inferred
    int64 for ID and the string kernels crashed the task)."""
    payload = b"ID,NAME\n1,foo\n2,bar\nx,baz\n"
    out = DsvParser(SCHEMA, delimiter=",", header=True).parse_file(payload)
    assert out["id"].to_pylist() == [1, 2, None]
    assert out["name"].to_pylist() == ["foo", "bar", "baz"]
    # the type-failed row keeps its raw line
    bad = out["__invalid_data__"].to_pylist()
    assert bad[:2] == [None, None] and "x" in bad[2]


def test_dsv_options_forwarded_and_validated():
    payload = b"id;name\n1;'has;semi'\n"
    out = DsvParser(
        SCHEMA, delimiter=";", header=True, options={"quote_char": "'"}
    ).parse_file(payload)
    assert out["name"].to_pylist() == ["has;semi"]
    with pytest.raises(ValueError, match="unsupported DSV options"):
        DsvParser(SCHEMA, options={"bogus": 1}).parse_file(b"id,name\n")


def test_gff3_malformed_numeric_field_becomes_null():
    batch = pa.table(
        {
            "text": [
                "chr1\tsrc\tgene\t10\t100\t0.5\t+\t.\tID=g1",
                "chr1\tsrc\tgene\tabc\t12x\tnan?\t+\t.\tID=g2",
            ]
        }
    )
    out = gff3_lines_to_table(batch)
    assert out["start"].to_pylist() == [10, None]
    assert out["end"].to_pylist() == [100, None]
    assert out["feature_id"].to_pylist() == ["g1", "g2"]


def test_next_fit_pack_null_weight_raises_and_null_groups_pack_together():
    df = pd.DataFrame(
        {
            "g": [1.0, np.nan, np.nan, np.nan],
            "o": [0, 1, 2, 3],
            "w": [5, 5, 5, 5],
        }
    )
    out = (
        next_fit_pack(rd.from_pandas(df), "g", ["o"], "w", budget=10, num_buckets=4)
        .to_pandas()
        .sort_values("o")
    )
    # the three null-keyed rows form ONE group: 5+5 fits, third opens bin 1
    null_bins = out[out["g"].isna()].sort_values("o")["bin_id"].tolist()
    assert null_bins == [0, 0, 1]

    bad = pd.DataFrame({"g": [1, 1], "o": [0, 1], "w": [5.0, np.nan]})
    with pytest.raises(ValueError, match="null values in weight column"):
        next_fit_pack(
            rd.from_pandas(bad), "g", ["o"], "w", budget=10, num_buckets=2
        ).to_pandas()


def test_hash_sample_rates_without_stratum_rejected():
    ds = rd.from_arrow(pa.table({"id": ["a", "b"]}))
    with pytest.raises(ValueError, match="requires stratum_column"):
        hash_sample(ds, "id", rates={"en": 0.5})


def test_kmeans_rejects_null_vectors():
    col = pa.array([[1.0, 2.0], None, [3.0, 4.0]], type=pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="null embedding"):
        _to_matrix(col)
    ok = _to_matrix(pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float32())))
    assert ok.shape == (2, 2)
