"""UniProt KB / UniRef entry extractors — the reference's flagship XML
corpus parsers, re-expressed as ``extract`` hooks for the streaming XML
source (``sources/xml_stream.XmlEntryParser``).

Parity targets (semantics, not code):
* ``parse_uniprot_entry`` — reference ``parsers/uniprot/uniprot_kb.py:365-433``
  (entity / identifier / name / protein / entity_x_publication /
  entity_x_source_file tables + raw-XML side tables + ``_parse_error`` rows)
* the dbReference special cases — ``uniprot_kb.py:107-234``
  (Ensembl / EMBL / RefSeq / MANE-Select / GO, molecule suffixes)
* ``parse_uniref_entry`` — reference ``parsers/uniprot/uniref.py:128-173``
  (cluster / clustermember / entity tables, representative + seed flags)

Namespace handling is local-name based so the same extractor accepts the
http:// and https:// UniProt namespaces and un-namespaced fixtures.
All errors become ``_parse_error`` rows, never exceptions.
"""

from __future__ import annotations

import re
from typing import Any

ENTITY_ID = "entity_id"

# CURIE prefixes (public BioRegistry-style translation, as in the reference)
PREFIX_TRANSLATION: dict[str, str] = {
    "UniProtKB": "UniProt",
    "UniProtKB/Swiss-Prot": "UniProt",
    "UniProtKB/TrEMBL": "UniProt",
    "NCBI Taxonomy": "NCBITaxon",
    "GeneID": "NCBIGene",
    "pubmed": "PMID",
}

UNIREF_PREFIX_TRANSLATION = {
    "UniProtKB ID": "uniprot_name",
    "UniProtKB accession": "uniprot",
    "UniParc ID": "uniparc",
    "UniRef90 ID": "uniref",
    "UniRef50 ID": "uniref",
    "UniRef100 ID": "uniref",
    "NCBI taxonomy": "NCBITaxon",
}

_ENSEMBL_PREFIXES = {
    "ENST": "transcript",
    "ENSP": "protein sequence",
    "ENSG": "gene sequence",
    "ENSE": "exon",
    "ENSFM": "protein family",
    "ENSGT": "gene tree",
    "ENSR": "regulatory feature",
}

_XMLNS_RE = re.compile(r'\s+xmlns(:\w+)?="[^"]*"')


def _ensembl_type(xref: str) -> str:
    """Likely Ensembl entity type from an ID prefix (reference
    ``utils/helpers.py:4-16``).  Longest prefix wins: ENSGT (gene tree) and
    ENSFM (family) must be tried before their 4-char prefixes match.
    Deliberate divergence: the reference checks the 4-char prefix first,
    which makes its own ENSGT/ENSFM table entries unreachable."""
    return _ENSEMBL_PREFIXES.get(xref[0:5], _ENSEMBL_PREFIXES.get(xref[0:4], "sequence"))


def _local(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def _children(elem, name: str):
    return [c for c in elem if _local(c.tag) == name]


def _find_path(elem, *names):
    """All descendants matched by a local-name path."""
    cur = [elem]
    for name in names:
        cur = [c for e in cur for c in e if _local(c.tag) == name]
    return cur


def _first_text(elem, *names) -> str | None:
    for e in _find_path(elem, *names):
        if e.text and e.text.strip():
            return e.text
    return None


def dump_xml_element(elem) -> str:
    """Element as a string with UniProt xmlns noise stripped (reference
    ``uniprot_kb.py:351-362``).  Works for stdlib ElementTree (which
    serializes with ns0: prefixes) by dropping all namespace decorations."""
    try:
        from lxml.etree import tounicode

        s = tounicode(elem)
    except ImportError:
        import xml.etree.ElementTree as ET

        s = ET.tostring(elem, encoding="unicode")
    s = _XMLNS_RE.sub("", s)
    # stdlib serializes namespaced tags as <ns0:comment>; drop the prefixes
    return re.sub(r"(</?)\w+:", r"\1", s)


# ---------------------------------------------------------------------------
# UniProt KB (reference uniprot_kb.py)
# ---------------------------------------------------------------------------
def parse_identifiers(entry) -> list[dict[str, Any]]:
    """Accessions -> identifier rows (reference ``uniprot_kb.py:61-73``)."""
    return [
        {"db": "UniProt", "xref": acc.text, "description": "UniProt accession"}
        for acc in _children(entry, "accession")
        if acc.text and acc.text.strip()
    ]


def parse_names(entry) -> list[dict[str, str]]:
    """Entry / protein / gene names (reference ``uniprot_kb.py:76-104``)."""
    names = [
        {"name": n.text, "description": "UniProt entry name"}
        for n in _children(entry, "name")
        if n.text and n.text.strip()
    ]
    for name_type in ("recommended", "alternative", "submitted"):
        for name_length in ("full", "short"):
            names.extend(
                {"name": n.text, "description": f"UniProt {name_type} {name_length} name"}
                for n in _find_path(entry, "protein", f"{name_type}Name", f"{name_length}Name")
                if n.text and n.text.strip()
            )
    for n in _find_path(entry, "gene", "name"):
        names.append({"name": n.text, "description": f"UniProt gene name, {n.get('type')}"})
    return names


def _parse_ensembl_dbxref(xref, props, suffix):
    return [
        {"db": "ensembl", "xref": xref,
         "description": f"Ensembl {_ensembl_type(xref)} ID{suffix}"},
        *[{"db": "ensembl", "xref": p["value"],
           "description": f"Ensembl {p['type']}{suffix}"} for p in props],
    ]


def _parse_embl_dbxref(xref, props, suffix):
    mol_types = [p["value"] for p in props if p["type"] == "molecule type"]
    desc = (
        f"EMBL/GenBank {mol_types[0]} ID" if len(mol_types) == 1 else "EMBL/GenBank ID"
    )
    return [
        {"db": "genbank", "xref": xref, "description": f"{desc}{suffix}"},
        *[
            {"db": "genbank", "xref": p["value"],
             "description": f"EMBL/GenBank {p['type']}{suffix}"}
            for p in props
            if p["type"] not in ("molecule type", "status")
        ],
    ]


def _parse_refseq_dbxref(xref, props, suffix):
    return [
        {"db": "refseq", "xref": xref,
         "description": f"RefSeq protein sequence ID{suffix}"},
        *[{"db": "refseq", "xref": p["value"],
           "description": f"RefSeq {p['type']}{suffix}"} for p in props],
    ]


def _parse_mane_dbxref(xref, props, suffix):
    refs = [
        {"db": "ensembl", "xref": xref,
         "description": f"Ensembl {_ensembl_type(xref)} ID{suffix}, via MANE-Select"}
    ]
    for p in props:
        if p["type"].startswith("RefSeq "):
            refs.append({"db": "refseq", "xref": p["value"],
                         "description": f"{p['type']}{suffix}, via MANE-Select"})
        elif p["value"].startswith("ENS"):
            refs.append({"db": "ensembl", "xref": p["value"],
                         "description": f"Ensembl {p['type']}{suffix}, via MANE-Select"})
    return refs


def parse_cross_references(entry) -> list[dict[str, Any]]:
    """dbReference rows with the reference's per-database special cases
    (``uniprot_kb.py:107-169``)."""
    refs: list[dict[str, Any]] = []
    for dbxref in _children(entry, "dbReference"):
        db, xref = dbxref.get("type"), dbxref.get("id")
        if not db or not xref:
            continue
        molecules = [m for m in _children(dbxref, "molecule") if m.get("id")]
        suffix = f" for UniProt:{molecules[0].get('id')}" if molecules else ""
        props = [
            {"type": p.get("type"), "value": p.get("value")}
            for p in _children(dbxref, "property")
        ]
        if props and db in ("Ensembl", "EMBL", "RefSeq", "MANE-Select"):
            if db == "Ensembl":
                refs.extend(_parse_ensembl_dbxref(xref, props, suffix))
            elif db == "EMBL":
                refs.extend(_parse_embl_dbxref(xref, props, suffix))
            elif db == "RefSeq":
                refs.extend(_parse_refseq_dbxref(xref, props, suffix))
            else:
                refs.extend(_parse_mane_dbxref(xref, props, suffix))
            continue
        if db == "GO":
            refs.append({"db": "GO", "xref": xref.removeprefix("GO:")})
            continue
        if suffix:
            refs.append({"db": db, "xref": xref, "description": f"{db} ID{suffix}"})
            continue
        refs.append({"db": db, "xref": xref})
    return refs


def parse_protein_info(entry) -> dict[str, Any]:
    """proteinExistence + sequence metadata (``uniprot_kb.py:237-263``)."""
    protein: dict[str, Any] = {}
    pe = _children(entry, "proteinExistence")
    if pe:
        protein["evidence_for_existence"] = pe[0].get("type")
    seqs = _children(entry, "sequence")
    if seqs:
        protein["length"] = int(seqs[0].get("length") or 0)
        protein["hash"] = seqs[0].get("checksum")
        if seqs[0].text and seqs[0].text.strip():
            protein["sequence"] = seqs[0].text
    return protein


def parse_organism(entry) -> list[dict[str, str]]:
    """in-taxon identifier row (``uniprot_kb.py:266-278``)."""
    for ref in _find_path(entry, "organism", "dbReference"):
        if ref.get("type") == "NCBI Taxonomy" and ref.get("id"):
            return [
                {
                    "db": "NCBITaxon",
                    "xref": ref.get("id"),
                    "description": "UniProt taxon designation",
                    "relationship": "RO:0002162: in taxon",
                }
            ]
    return []


_REF_PRIORITY = ["doi", "pmcid", "pmid", "pubmed", "agricola"]


def parse_references(entry) -> dict[str, list[dict[str, str]]]:
    """Publications: one CURIE per reference by db priority + raw XML rows
    (``uniprot_kb.py:281-319``).  Returned publication rows are sorted for
    deterministic output (the reference iterates a set)."""
    publications: set[str] = set()
    all_xml = []
    for reference in _children(entry, "reference"):
        all_xml.append({"key": reference.get("key"), "content": dump_xml_element(reference)})
        citation_refs = [
            {"db": (ref.get("type") or "").lower(), "xref": ref.get("id")}
            for ref in _find_path(reference, "citation", "dbReference")
        ]
        if not citation_refs:
            continue
        for ref_type in _REF_PRIORITY:
            refs = [r["xref"] for r in citation_refs if r["db"] == ref_type]
            if refs:
                publications.add(
                    f"{PREFIX_TRANSLATION.get(ref_type, ref_type.upper())}:{refs[0]}"
                )
                break
    return {
        "all_xml": all_xml,
        "publication": [{"publication_id": p} for p in sorted(publications)],
    }


def parse_uniprot_entry(entry, file_path: str = "", updated: str | None = None) -> dict[str, list[dict]]:
    """One UniProt <entry> -> {table: rows} (reference
    ``uniprot_kb.py:365-433``).  ``updated`` is an explicit timestamp string
    (the reference stamps wall-clock time; callers here pass a run-level
    constant so output is deterministic)."""
    try:
        first_acc = _first_text(entry, "accession")
        if not first_acc or not first_acc.strip():
            return {
                "_parse_error": [
                    {"xml": dump_xml_element(entry), "error": "No accession found",
                     "source_file": str(file_path)}
                ]
            }
        uniprot_id = f"uniprot:{first_acc.strip()}"
        entity = {
            ENTITY_ID: uniprot_id,
            "entity_type": "protein",
            "data_source_entity_id": first_acc.strip(),
            "data_source_created": entry.get("created"),
            "data_source_modified": entry.get("modified"),
            "data_source_entity_version": entry.get("version"),
            "data_source_id": None,
            "created": None,
            "data_source": f"UniProt/{entry.get('dataset')}",
            "updated": updated,
        }
        ref_data = parse_references(entry)
        return {
            "entity": [entity],
            "identifier": [
                {ENTITY_ID: uniprot_id, **e}
                for e in [
                    *parse_identifiers(entry),
                    *parse_cross_references(entry),
                    *parse_organism(entry),
                ]
            ],
            "name": [{ENTITY_ID: uniprot_id, **e} for e in parse_names(entry)],
            "protein": [{"protein_id": uniprot_id, **parse_protein_info(entry)}],
            "entity_x_publication": [
                {ENTITY_ID: uniprot_id, **e} for e in ref_data["publication"]
            ],
            "entity_x_source_file": [
                {ENTITY_ID: uniprot_id, "data_source": entity["data_source"],
                 "source_file": str(file_path)}
            ],
            "_evidence_xml": [
                {ENTITY_ID: uniprot_id, "key": ev.get("key"),
                 "content": dump_xml_element(ev)}
                for ev in _children(entry, "evidence")
            ],
            "_comment_xml": [
                {ENTITY_ID: uniprot_id, "content": dump_xml_element(c)}
                for c in _children(entry, "comment")
            ],
            "_reference_xml": [
                {ENTITY_ID: uniprot_id, **r} for r in ref_data["all_xml"]
            ],
        }
    except Exception as exc:  # errors -> rows, never raises
        return {
            "_parse_error": [
                {"xml": dump_xml_element(entry), "error": str(exc),
                 "source_file": str(file_path)}
            ]
        }


# ---------------------------------------------------------------------------
# UniRef (reference uniref.py)
# ---------------------------------------------------------------------------
def _generate_dbxref(db: str, acc: str) -> str:
    return f"{UNIREF_PREFIX_TRANSLATION.get(db, db)}:{acc}"


def _extract_cluster(entry) -> tuple[dict, dict]:
    entry_id = entry.get("id")
    if not entry_id:
        return ({}, {})
    cluster_id = f"uniref:{entry_id}"
    cluster = {
        "cluster_id": cluster_id,
        "name": _first_text(entry, "name"),
        "cluster_type": "Protein",
        "description": None,
    }
    entity = {
        ENTITY_ID: cluster_id,
        "entity_type": "Cluster",
        "data_source": "UniRef",
        "data_source_entity_id": entry_id,
        "data_source_updated": entry.get("updated"),
    }
    return (cluster, entity)


def _extract_cross_refs(dbref, cluster_id: str, is_representative: bool) -> dict:
    entity_db, entity_xref = dbref.get("type"), dbref.get("id")
    if not entity_xref or not entity_db:
        return {}
    entity_id = _generate_dbxref(entity_db, entity_xref)
    if entity_db == "UniProtKB ID":
        acc = next(
            (p.get("value") for p in _children(dbref, "property")
             if p.get("type") == "UniProtKB accession"),
            None,
        )
        if acc:
            entity_id = f"uniprot:{acc}"
    is_seed = any(
        p.get("type") == "isSeed" and p.get("value") == "true"
        for p in _children(dbref, "property")
    )
    return {
        ENTITY_ID: entity_id,
        "cluster_id": cluster_id,
        "is_representative": is_representative,
        "is_seed": is_seed,
    }


def parse_uniref_entry(entry, uniref_variant: str = "UniRef100",
                       file_path: str = "", updated: str | None = None) -> dict:
    """One UniRef <entry> -> {table: rows} (reference ``uniref.py:128-173``).
    Like :func:`parse_uniprot_entry`, any parse failure becomes a
    ``_parse_error`` row — the module contract is that extractors never
    raise into the streaming XML source."""
    try:
        cluster, entity = _extract_cluster(entry)
        cluster_id = cluster.get("cluster_id")
        if not cluster_id:
            return {
                "_parse_error": [
                    {"xml": dump_xml_element(entry),
                     "error": "No cluster ID found in entry",
                     "source_file": str(file_path)}
                ]
            }
        entity["updated"] = updated
        cluster["protocol"] = uniref_variant
        members = []
        repr_refs = _find_path(entry, "representativeMember", "dbReference")
        if repr_refs:
            members.append(_extract_cross_refs(repr_refs[0], cluster_id, True))
        members.extend(
            _extract_cross_refs(m, cluster_id, False)
            for m in _find_path(entry, "member", "dbReference")
        )
        return {
            "entity": [entity],
            "entity_x_source_file": [
                {ENTITY_ID: cluster_id, "data_source": entity.get("data_source"),
                 "source_file": str(file_path)}
            ],
            "cluster": [cluster],
            "clustermember": [m for m in members if m],
        }
    except Exception as exc:  # errors -> rows, never raises
        return {
            "_parse_error": [
                {"xml": dump_xml_element(entry), "error": str(exc),
                 "source_file": str(file_path)}
            ]
        }


def uniprot_extract_hook(file_path: str = "", updated: str | None = None):
    """extract hook for ``XmlEntryParser`` / ``read_xml_entries``.  The
    parser supplies each entry's source file as the second argument, so
    multi-file reads get correct per-file provenance; an explicitly baked
    ``file_path`` still wins."""
    def extract(elem, path: str = ""):
        return parse_uniprot_entry(elem, file_path=file_path or path, updated=updated)

    return extract


def uniref_extract_hook(uniref_variant: str = "UniRef100", file_path: str = "",
                        updated: str | None = None):
    def extract(elem, path: str = ""):
        return parse_uniref_entry(elem, uniref_variant=uniref_variant,
                                  file_path=file_path or path, updated=updated)

    return extract
