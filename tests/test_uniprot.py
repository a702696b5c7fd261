"""UniProt KB / UniRef extractor golden tests (reference
``parsers/uniprot/uniprot_kb.py`` / ``uniref.py`` semantics, exercised via
the streaming XML source)."""

import gzip

import pyarrow as pa
import ray.data as rd

from cdm_data_loader_utils_ray.sources.uniprot import (
    parse_uniprot_entry,
    parse_uniref_entry,
    uniprot_extract_hook,
)
from cdm_data_loader_utils_ray.sources.xml_stream import (
    XmlEntryParser,
    rows_for_table,
    stream_xml_bytes,
)

UNIPROT_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<uniprot xmlns="https://uniprot.org/uniprot">
<entry dataset="Swiss-Prot" created="2001-01-10" modified="2020-02-02" version="7">
  <accession>P12345</accession>
  <accession>Q99999</accession>
  <name>TEST_HUMAN</name>
  <protein>
    <recommendedName><fullName>Test protein</fullName><shortName>TP</shortName></recommendedName>
    <alternativeName><fullName>Alt protein</fullName></alternativeName>
  </protein>
  <gene><name type="primary">TST1</name><name type="synonym">TST1B</name></gene>
  <organism>
    <name type="scientific">Homo sapiens</name>
    <dbReference type="NCBI Taxonomy" id="9606"/>
  </organism>
  <reference key="1">
    <citation type="journal article">
      <dbReference type="PubMed" id="123"/>
      <dbReference type="DOI" id="10.1000/test"/>
    </citation>
  </reference>
  <reference key="2">
    <citation type="journal article">
      <dbReference type="PubMed" id="456"/>
    </citation>
  </reference>
  <comment type="function"><text>Does things.</text></comment>
  <dbReference type="GO" id="GO:0005737"/>
  <dbReference type="GeneID" id="2222"/>
  <dbReference type="EMBL" id="AY123456">
    <property type="protein sequence ID" value="AAK54321.1"/>
    <property type="molecule type" value="mRNA"/>
  </dbReference>
  <dbReference type="Ensembl" id="ENST00000380152">
    <molecule id="P12345-1"/>
    <property type="protein sequence ID" value="ENSP00000369497"/>
  </dbReference>
  <dbReference type="RefSeq" id="NP_000050.3">
    <property type="nucleotide sequence ID" value="NM_000059.4"/>
  </dbReference>
  <evidence type="ECO:0000255" key="5"/>
  <proteinExistence type="evidence at protein level"/>
  <sequence length="10" mass="1234" checksum="ABCDEF0123456789" modified="2001-01-10" version="1">MKWVTFISLL</sequence>
</entry>
<entry dataset="TrEMBL" created="2010-05-05" modified="2011-06-06" version="2">
  <name>NOACC_ENTRY</name>
</entry>
</uniprot>
"""

UNIREF_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<UniRef100 xmlns="http://uniprot.org/uniref" releaseDate="2024-01-01">
<entry id="UniRef100_P12345" updated="2024-01-01">
  <name>Cluster: Test protein</name>
  <representativeMember>
    <dbReference type="UniProtKB ID" id="TEST_HUMAN">
      <property type="UniProtKB accession" value="P12345"/>
      <property type="isSeed" value="true"/>
    </dbReference>
  </representativeMember>
  <member>
    <dbReference type="UniParc ID" id="UPI0000000001"/>
  </member>
  <member>
    <dbReference type="UniProtKB ID" id="OTHER_MOUSE"/>
  </member>
</entry>
</UniRef100>
"""


def _parse_all(xml: bytes, fn):
    out = {}
    for elem in stream_xml_bytes(xml, "entry"):
        for table, rows in fn(elem).items():
            out.setdefault(table, []).extend(rows)
    return out


def test_uniprot_entry_tables_golden():
    tables = _parse_all(UNIPROT_XML, lambda e: parse_uniprot_entry(e, "f.xml", updated="T0"))

    ent = tables["entity"]
    assert len(ent) == 1
    assert ent[0]["entity_id"] == "uniprot:P12345"
    assert ent[0]["data_source"] == "UniProt/Swiss-Prot"
    assert ent[0]["data_source_created"] == "2001-01-10"
    assert ent[0]["data_source_entity_version"] == "7"
    assert ent[0]["updated"] == "T0"

    idents = {(r["db"], r["xref"], r.get("description")) for r in tables["identifier"]}
    assert ("UniProt", "P12345", "UniProt accession") in idents
    assert ("UniProt", "Q99999", "UniProt accession") in idents
    assert ("GO", "0005737", None) in idents  # GO: prefix stripped
    assert ("GeneID", "2222", None) in idents  # default parse
    assert ("genbank", "AY123456", "EMBL/GenBank mRNA ID") in idents
    assert ("genbank", "AAK54321.1", "EMBL/GenBank protein sequence ID") in idents
    # molecule suffix + ensembl typing
    assert ("ensembl", "ENST00000380152",
            "Ensembl transcript ID for UniProt:P12345-1") in idents
    assert ("ensembl", "ENSP00000369497",
            "Ensembl protein sequence ID for UniProt:P12345-1") in idents
    assert ("refseq", "NP_000050.3", "RefSeq protein sequence ID") in idents
    assert ("refseq", "NM_000059.4", "RefSeq nucleotide sequence ID") in idents
    taxon = [r for r in tables["identifier"] if r["db"] == "NCBITaxon"]
    assert taxon[0]["xref"] == "9606"
    assert taxon[0]["relationship"] == "RO:0002162: in taxon"

    names = {(r["name"], r["description"]) for r in tables["name"]}
    assert ("TEST_HUMAN", "UniProt entry name") in names
    assert ("Test protein", "UniProt recommended full name") in names
    assert ("TP", "UniProt recommended short name") in names
    assert ("Alt protein", "UniProt alternative full name") in names
    assert ("TST1", "UniProt gene name, primary") in names
    assert ("TST1B", "UniProt gene name, synonym") in names

    prot = tables["protein"][0]
    assert prot["protein_id"] == "uniprot:P12345"
    assert prot["evidence_for_existence"] == "evidence at protein level"
    assert prot["length"] == 10
    assert prot["hash"] == "ABCDEF0123456789"
    assert prot["sequence"] == "MKWVTFISLL"

    # publication priority: DOI beats PubMed for ref 1; ref 2 falls to PMID
    pubs = {r["publication_id"] for r in tables["entity_x_publication"]}
    assert pubs == {"DOI:10.1000/test", "PMID:456"}

    assert len(tables["_comment_xml"]) == 1
    assert "Does things." in tables["_comment_xml"][0]["content"]
    assert "xmlns" not in tables["_comment_xml"][0]["content"]
    assert tables["_evidence_xml"][0]["key"] == "5"
    assert len(tables["_reference_xml"]) == 2

    # entry without accession -> _parse_error row, no exception
    errs = tables["_parse_error"]
    assert len(errs) == 1 and errs[0]["error"] == "No accession found"


def test_uniref_entry_tables_golden():
    tables = _parse_all(
        UNIREF_XML, lambda e: parse_uniref_entry(e, "UniRef100", "u.xml", updated="T0")
    )
    cl = tables["cluster"][0]
    assert cl["cluster_id"] == "uniref:UniRef100_P12345"
    assert cl["name"] == "Cluster: Test protein"
    assert cl["protocol"] == "UniRef100"
    ent = tables["entity"][0]
    assert ent["entity_type"] == "Cluster"
    assert ent["data_source_updated"] == "2024-01-01"
    members = tables["clustermember"]
    assert len(members) == 3
    rep = [m for m in members if m["is_representative"]]
    assert len(rep) == 1
    # accession property resolves to uniprot: CURIE; seed flag honoured
    assert rep[0]["entity_id"] == "uniprot:P12345"
    assert rep[0]["is_seed"] is True
    ids = {m["entity_id"] for m in members}
    assert "uniparc:UPI0000000001" in ids
    assert "uniprot_name:OTHER_MOUSE" in ids  # no accession -> name CURIE


def test_uniprot_through_ray_xml_source(tmp_path):
    """End-to-end through the streaming XML source: gzipped file ->
    read_binary_files batches -> XmlEntryParser(extract=uniprot hook) ->
    routed identifier table."""
    p = tmp_path / "uniprot.xml.gz"
    p.write_bytes(gzip.compress(UNIPROT_XML))
    files = rd.read_binary_files(str(p), include_paths=True)
    parsed = files.map_batches(
        XmlEntryParser("entry", uniprot_extract_hook(updated="T0")),
        batch_format="pyarrow",
    )
    ident_schema = pa.schema(
        [
            pa.field("entity_id", pa.string()),
            pa.field("db", pa.string()),
            pa.field("xref", pa.string()),
            pa.field("description", pa.string()),
            pa.field("relationship", pa.string()),
        ]
    )
    idents = rows_for_table(parsed, "identifier", ident_schema).to_pandas()
    # 2 accessions + GO + GeneID + 2 EMBL + 2 Ensembl + 2 RefSeq + taxon
    assert len(idents) == 11
    assert set(idents["entity_id"]) == {"uniprot:P12345"}
    errors = parsed.to_pandas()
    assert (errors["table"] == "_parse_error").sum() == 1


def test_uniref_parse_failure_becomes_error_row(monkeypatch):
    """Module contract: extractors never raise into the XML source — an
    unexpected failure in UniRef parsing becomes a _parse_error row (the
    KB parser always wrapped; the UniRef wrap was added in r4 review)."""
    import xml.etree.ElementTree as ET

    from cdm_data_loader_utils_ray.sources import uniprot as U

    entry = ET.fromstring('<entry id="UniRef100_P1"><name>n</name></entry>')

    def boom(_entry):
        raise RuntimeError("synthetic parse failure")

    monkeypatch.setattr(U, "_extract_cluster", boom)
    out = U.parse_uniref_entry(entry, file_path="f.xml")
    assert list(out) == ["_parse_error"]
    row = out["_parse_error"][0]
    assert "synthetic parse failure" in row["error"]
    assert row["source_file"] == "f.xml"
