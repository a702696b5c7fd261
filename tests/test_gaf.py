"""GAF normalization pipeline golden tests (reference
``parsers/gene_association_file.py:106-222`` semantics)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.pipelines.gaf import (
    GAF_SCHEMA,
    load_gaf,
    normalize_gaf_dataset,
    parse_eco_mapping,
)

ECO_TXT = """# comment line
IEA\tGO_REF:0000002\tECO:0000256
IEA\tDEFAULT\tECO:0000501
EXP\tDEFAULT\tECO:0000269
"""

HEADER = "DB,DB_Object_ID,Qualifier,GO_ID,DB_Reference,Evidence_Code,With_From,Date,Assigned_By"


def test_parse_eco_mapping():
    exact, fb = parse_eco_mapping(ECO_TXT)
    assert exact == {("IEA", "GO_REF:0000002"): "ECO:0000256"}
    assert fb == {"IEA": "ECO:0000501", "EXP": "ECO:0000269"}


def test_load_gaf_end_to_end(tmp_path):
    p = tmp_path / "annotations.csv"
    p.write_text(
        HEADER + "\n"
        "UniProtKB,A1,NOT|enables,GO:0001,PMID:1|GO_REF:0000002,IEA,,20240115,SrcA\n"
        "UniProtKB,A2,involved_in,GO:0002,pmid:2 ,EXP,UniProtKB:P1|UniProtKB:P2,BADDATE,SrcB\n"
        "MGI,A3,located_in,GO:0003,,IEA,,20231201,SrcC\n"
    )
    out = (
        load_gaf(str(p), ECO_TXT)
        .to_pandas()
        .sort_values(["subject", "publications"])
        .reset_index(drop=True)
    )
    # row 1 explodes to two publications; row 3's empty ref drops the row
    assert len(out) == 3
    a1 = out[out["subject"] == "UniProtKB:A1"]
    assert set(a1["publications"]) == {"PMID:1", "GO_REF:0000002"}
    assert set(a1["negated"]) == {"true"}
    assert set(a1["predicate"]) == {"enables"}  # NOT| stripped
    # two-level ECO: exact match beats fallback
    by_pub = dict(zip(a1["publications"], a1["evidence_type"]))
    assert by_pub["GO_REF:0000002"] == "ECO:0000256"
    assert by_pub["PMID:1"] == "ECO:0000501"
    a2 = out[out["subject"] == "UniProtKB:A2"].iloc[0]
    assert a2["publications"] == "PMID:2"  # upper + trim
    assert a2["evidence_type"] == "ECO:0000269"  # fallback
    assert pd.isna(a2["annotation_date"])  # guarded to_date
    assert a2["supporting_objects"] == "UniProtKB:P1|UniProtKB:P2"
    assert a2["negated"] == "false"
    assert str(a1["annotation_date"].iloc[0]) == "2024-01-15"
    assert set(out["aggregator"]) == {"UniProt"}
    assert out["protocol_id"].isna().all()


def test_gaf_invalid_predicate_raises():
    tbl = pa.table(
        {c: pa.array(["x"], type=pa.string()) for c in GAF_SCHEMA.names}
    )
    ds = rd.from_arrow(tbl)
    with pytest.raises(Exception, match="Invalid predicate"):
        normalize_gaf_dataset(ds, ECO_TXT).to_pandas()
