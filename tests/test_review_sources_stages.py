"""Regression tests for the round-4 review of sources/ + stages/ +
sinks/routing.py: empty-bucket schemas in the temporal joins, range_join's
non-cartesian fast path, outer_diff presence semantics, XML parse-error
containment and per-file provenance."""

import gzip

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.sources.uniprot import _ensembl_type
from cdm_data_loader_utils_ray.sources.xml_stream import (
    XmlEntryParser,
    stream_xml_bytes,
)
from cdm_data_loader_utils_ray.stages.keyed import lww_latest, outer_diff
from cdm_data_loader_utils_ray.stages.temporal import asof_join, range_join


def test_asof_join_sparse_right_bucket_schema():
    """A bucket whose key has left rows but no right rows must emit the
    same joined schema as other buckets (left rows keep null right cols)."""
    left = rd.from_arrow(
        pa.table(
            {
                "k": ["a", "a", "b", "b"],
                "t": [1, 5, 2, 6],
                "lv": [10, 11, 12, 13],
            }
        )
    )
    right = rd.from_arrow(pa.table({"k": ["a"], "t": [3], "rv": [99]}))
    out = (
        asof_join(left, right, on="t", by=["k"], num_buckets=16)
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["k", "t", "lv", "rv"]
    assert len(out) == 4  # every left row survives
    b = out[out["k"] == "b"]
    assert b["rv"].isna().all()  # sparse key: null right columns, not lost
    a = out[out["k"] == "a"].set_index("t")["rv"]
    assert pd.isna(a.loc[1]) and a.loc[5] == 99


def _range_brute(l, r, keys, point, start, end):
    m = l.merge(r, on=keys, how="inner")
    return m[(m[point] >= m[start]) & (m[point] < m[end])]


@pytest.mark.parametrize("overlapping", [False, True])
def test_range_join_matches_bruteforce(overlapping):
    """Both the non-overlap searchsorted fast path and the overlap
    fallback must match the brute-force containment join."""
    import numpy as np

    rng = np.random.default_rng(3 if overlapping else 4)
    keys = rng.integers(0, 5, 60)
    l = pd.DataFrame({"k": keys, "p": rng.integers(0, 100, 60), "lv": range(60)})
    starts = np.sort(rng.integers(0, 90, 30))
    width = rng.integers(1, 25 if overlapping else 4, 30)
    r = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 30),
            "s": starts,
            "e": starts + width,
            "rv": range(30),
        }
    )
    if not overlapping:
        # force per-key non-overlap: sort per key and clip ends
        r = r.sort_values(["k", "s"]).reset_index(drop=True)
        nxt = r.groupby("k")["s"].shift(-1)
        r["e"] = pd.concat([r["e"], nxt], axis=1).min(axis=1).astype(int)
        r = r[r["e"] > r["s"]]
    got = (
        range_join(
            rd.from_pandas(l),
            rd.from_pandas(r),
            left_point="p",
            right_start="s",
            right_end="e",
            by=["k"],
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "p", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        _range_brute(l, r, ["k"], "p", "s", "e")
        .sort_values(["k", "p", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["k", "p", "lv", "rv"]:
        assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist()


def test_outer_diff_null_compare_values():
    """Presence comes from the merge indicator: null compare values must
    not flip a present row to new/deleted, and null==null is unchanged."""
    old = rd.from_arrow(
        pa.table(
            {
                "id": ["both_null", "old_null", "gone_null", "same"],
                "h": pa.array([None, None, None, "x"], type=pa.string()),
            }
        )
    )
    new = rd.from_arrow(
        pa.table(
            {
                "id": ["both_null", "old_null", "fresh_null", "same"],
                "h": pa.array([None, "v", None, "x"], type=pa.string()),
            }
        )
    )
    out = outer_diff(old, new, ["id"], "h").to_pandas().set_index("id")
    assert out.loc["both_null", "change_type"] == "unchanged"
    assert out.loc["old_null", "change_type"] == "updated"
    assert out.loc["gone_null", "change_type"] == "deleted"
    assert out.loc["fresh_null", "change_type"] == "new"
    assert out.loc["same", "change_type"] == "unchanged"


def test_lww_latest_tolerates_empty_blocks():
    """An empty input block must not produce a bucket-less schema."""
    data = pa.table({"k": ["a", "a", "b"], "seq": [1, 2, 1], "v": [1, 2, 3]})
    empty = data.slice(0, 0)
    ds = rd.from_arrow(empty).union(rd.from_arrow(data))
    out = lww_latest(ds, ["k"], "seq").to_pandas().set_index("k")["v"]
    assert out.to_dict() == {"a": 2, "b": 3}


def test_xml_parse_error_becomes_row_not_crash():
    """Malformed XML mid-file: entries already parsed survive and one
    _parse_error row records the failure; other files are unaffected."""
    good = b"<root><entry id='g1'/><entry id='g2'/></root>"
    bad = b"<root><entry id='b1'/><entry id='b2'"  # truncated
    batch = pa.table({"bytes": [good, bad], "path": ["good.xml", "bad.xml"]})
    out = XmlEntryParser("entry")(batch).to_pandas()
    tables = out["table"].tolist()
    assert tables.count("entries") >= 3  # g1, g2, b1 all parsed
    errs = out[out["table"] == "_parse_error"]
    assert len(errs) == 1
    assert "bad.xml" in errs.iloc[0]["row"]


def test_xml_gzip_and_root_detach_roundtrip():
    """Gzipped payloads still stream, and every entry is yielded despite
    the root-detach memory bound."""
    n = 500
    payload = ("<root>" + "".join(f"<entry id='{i}'/>" for i in range(n)) + "</root>").encode()
    ids = [e.get("id") for e in stream_xml_bytes(gzip.compress(payload))]
    assert ids == [str(i) for i in range(n)]


def test_xml_extract_hook_receives_per_file_path():
    """A two-arg extract hook gets each entry's own source file."""

    def extract(elem, path):
        return {"t": [{"f": path}]}

    batch = pa.table(
        {
            "bytes": [b"<r><entry/></r>", b"<r><entry/></r>"],
            "path": ["a.xml", "b.xml"],
        }
    )
    out = XmlEntryParser("entry", extract)(batch).to_pandas()
    assert sorted(out["row"].tolist()) == ['{"f": "a.xml"}', '{"f": "b.xml"}']
    # single-arg hooks keep working
    out1 = XmlEntryParser("entry", lambda e: {"t": [{}]})(batch)
    assert len(out1) == 2


def test_ensembl_gene_tree_prefix():
    assert _ensembl_type("ENSGT00390000003602") == "gene tree"
    assert _ensembl_type("ENSFM00250000006823") == "protein family"
    assert _ensembl_type("ENSG00000139618") == "gene sequence"
    assert _ensembl_type("ENST00000380152") == "transcript"
