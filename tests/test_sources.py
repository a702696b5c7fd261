"""Source readers: DSV (PERMISSIVE + __invalid_data__), FASTA, GFF3, XML."""

import gzip

import pyarrow as pa
import pytest

from cdm_data_loader_utils_ray.core.schemas import INVALID_DATA_COLUMN
from cdm_data_loader_utils_ray.sources.dsv import DsvParser, read_tsv
from cdm_data_loader_utils_ray.sources.fasta import FastaParser, read_fasta
from cdm_data_loader_utils_ray.sources.gff3 import gc_content, gff3_lines_to_table, read_gff3
from cdm_data_loader_utils_ray.sources.xml_stream import (
    XmlEntryParser,
    read_xml_entries,
    rows_for_table,
)
from cdm_data_loader_utils_ray.stages.validate import annotate_errors, check_non_nullable, check_parse_errors

DSV_SCHEMA = pa.schema(
    [
        pa.field("col1", pa.string(), nullable=False),
        pa.field("col2", pa.int64(), nullable=True),
        pa.field("col3", pa.float64(), nullable=True),
    ]
)


def test_dsv_valid_and_type_mismatch():
    payload = b"col1,col2,col3\na,1,1.5\nb,notanint,2.5\nc,3,3.5\n"
    out = DsvParser(DSV_SCHEMA).parse_file(payload)
    assert out["col1"].to_pylist() == ["a", "b", "c"]
    assert out["col2"].to_pylist() == [1, None, 3]
    inv = out[INVALID_DATA_COLUMN].to_pylist()
    assert inv[0] is None and inv[2] is None
    assert "notanint" in inv[1]
    # reference taxonomy via the validator stage
    annotated = annotate_errors(out, [check_non_nullable(DSV_SCHEMA), check_parse_errors()])
    errs = annotated["errors_in_record"].to_pylist()
    assert errs[1] == ["parse_error"]


def test_dsv_wrong_column_count_captured():
    payload = b"col1,col2,col3\na,1,1.5\nonly_two,2\nx,1,2,EXTRA\n"
    out = DsvParser(DSV_SCHEMA).parse_file(payload)
    inv = [v for v in out[INVALID_DATA_COLUMN].to_pylist() if v]
    assert len(inv) == 2
    assert any("only_two" in v for v in inv)
    assert any("EXTRA" in v for v in inv)
    good = [v for v in out["col1"].to_pylist() if v]
    assert good == ["a"]


def test_dsv_missing_required_null():
    payload = b"col1,col2,col3\n,1,1.5\n"
    out = DsvParser(DSV_SCHEMA).parse_file(payload)
    annotated = annotate_errors(out, [check_non_nullable(DSV_SCHEMA), check_parse_errors()])
    assert annotated["errors_in_record"].to_pylist()[0] == ["missing_required: col1"]


def test_dsv_ray_read(tmp_path):
    p = tmp_path / "f.tsv"
    p.write_bytes(b"col1\tcol2\tcol3\nx\t7\t0.5\ny\t8\t1.5\n")
    ds = read_tsv(str(p), DSV_SCHEMA)
    df = ds.to_pandas()
    assert list(df["col2"]) == [7, 8]


FASTA = b">seq1 first sequence\nACGT\nACGT\n>seq2\nGGGG\n"


def test_fasta_parse_and_gzip(tmp_path):
    t = FastaParser().parse_bytes(FASTA)
    assert t["id"].to_pylist() == ["seq1", "seq2"]
    assert t["description"].to_pylist() == ["first sequence", None]
    assert t["sequence"].to_pylist() == ["ACGTACGT", "GGGG"]
    assert t["length"].to_pylist() == [8, 4]
    gz = tmp_path / "a.fasta.gz"
    gz.write_bytes(gzip.compress(FASTA))
    df = read_fasta(str(gz)).to_pandas()
    assert list(df["id"]) == ["seq1", "seq2"]


def test_fasta_header_hook():
    t = FastaParser(h_func=lambda h: (h.split("|")[1], None)).parse_bytes(
        b">db|ACC1|rest\nAAAA\n"
    )
    assert t["id"].to_pylist() == ["ACC1"]


GFF = (
    "##gff-version 3\n"
    "chr1\tsrc\tgene\t100\t200\t.\t+\t.\tID=gene1;Name=abc\n"
    "chr1\tsrc\tmRNA\t100\t200\t0.9\t-\t0\tID=rna1;Parent=gene1\n"
    "# comment\n"
    "bad line without tabs\n"
)


def test_gff3_parse(tmp_path):
    t = gff3_lines_to_table(pa.table({"text": GFF.splitlines()}))
    assert len(t) == 2
    assert t["start"].to_pylist() == [100, 100]
    assert t["score"].to_pylist() == [None, 0.9]
    assert t["feature_id"].to_pylist() == ["gene1", "rna1"]
    assert t["parent_id"].to_pylist() == [None, "gene1"]
    p = tmp_path / "x.gff3"
    p.write_text(GFF)
    df = read_gff3(str(p)).to_pandas()
    assert list(df["type"]) == ["gene", "mRNA"]


def test_gc_content():
    t = gc_content(pa.table({"sequence": ["GGCC", "ATAT", "acgt"]}))
    assert t["gc_content"].to_pylist() == [1.0, 0.0, 0.5]


XML = b"""<root xmlns="http://example.org/ns">
<entry id="e1"><name>alpha</name><acc>A1</acc><acc>A2</acc></entry>
<entry id="e2"><name>beta</name></entry>
</root>"""


def test_xml_stream_routing(tmp_path):
    def extract(elem):
        d = {}
        for c in elem:
            tag = c.tag.rsplit("}", 1)[-1]
            d.setdefault(tag, []).append(c.text)
        return {
            "entity": [{"id": elem.get("id"), "name": (d.get("name") or [None])[0]}],
            "identifier": [{"entity_id": elem.get("id"), "acc": a} for a in d.get("acc", [])],
        }

    p = tmp_path / "u.xml.gz"
    p.write_bytes(gzip.compress(XML))
    ds = read_xml_entries(str(p), extract=extract)
    ent_schema = pa.schema([pa.field("id", pa.string()), pa.field("name", pa.string())])
    ids = rows_for_table(ds, "entity", ent_schema).to_pandas()
    assert sorted(ids["id"]) == ["e1", "e2"]
    acc_schema = pa.schema([pa.field("entity_id", pa.string()), pa.field("acc", pa.string())])
    accs = rows_for_table(ds, "identifier", acc_schema).to_pandas()
    assert sorted(accs["acc"]) == ["A1", "A2"]


def test_xml_parse_error_routed_not_raised():
    def extract(elem):
        raise ValueError("boom")

    out = XmlEntryParser(extract=extract)(
        pa.table({"bytes": [XML], "path": ["f.xml"]})
    )
    assert set(out["table"].to_pylist()) == {"_parse_error"}
    assert len(out) == 2
