"""Streaming XML entry source (reference ``utils/xml_utils.py:129-152``
``stream_xml_file``): incremental iterparse over (gzipped) XML, yielding one
``<entry>`` element at a time with ``elem.clear()`` to bound memory.

Ray-native: ``read_binary_files`` -> ``flat_map``-style ``map_batches``
parser; one file per task, entries fanned out into rows for multiple
destination tables via an extract hook (the reference's
``parse_uniprot_entry`` contract: entry -> {table: [rows]}, errors becoming
``_parse_error`` rows, never exceptions — ``uniprot_kb.py:365-433``).

Uses stdlib ``xml.etree.ElementTree.iterparse`` (lxml-compatible subset;
lxml is used when importable).
"""

from __future__ import annotations

import gzip
import inspect
import io
import json
from collections.abc import Callable, Iterator

import pyarrow as pa

try:  # pragma: no cover - environment probe
    from lxml import etree as _etree

    _HAVE_LXML = True
except ImportError:  # stdlib fallback
    import xml.etree.ElementTree as _etree

    _HAVE_LXML = False


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def stream_xml_bytes(payload: bytes, entry_tag: str = "entry") -> Iterator:
    """Yield each ``<entry_tag>`` element from (gzipped) XML bytes,
    clearing elements as they complete (bounded memory).  ``elem.clear()``
    alone is not enough: the root keeps one (empty) child reference per
    entry, O(#entries) over a multi-million-entry file — completed leading
    children are detached from the root as well."""
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)
    stream = io.BytesIO(payload)
    context = _etree.iterparse(stream, events=("start", "end"))
    root = None
    for event, elem in context:
        if event == "start":
            if root is None:
                root = elem
            continue
        if _local(elem.tag) == entry_tag:
            yield elem
            elem.clear()
            if root is not None and len(root) > 1:
                # only fully-completed earlier siblings are dropped: the
                # currently-open element chain is always the LAST child at
                # each level during parsing
                del root[:-1]


def element_to_dict(elem) -> dict:
    """Generic flatten: attributes + child text (first level), listifying
    repeated children — enough for routing tests; real pipelines pass a
    custom ``extract``."""
    out: dict = dict(elem.attrib)
    for child in elem:
        key = _local(child.tag)
        val = (child.text or "").strip() or dict(child.attrib) or None
        if key in out:
            if not isinstance(out[key], list):
                out[key] = [out[key]]
            out[key].append(val)
        else:
            out[key] = val
    return out


class XmlEntryParser:
    """``map_batches`` callable over ``read_binary_files`` batches.

    ``extract(elem) -> dict[table_name, list[dict]]`` routes each entry's
    rows to destination tables (dlt ``with_table_name`` analogue, reference
    ``pipelines/uniprot_kb_pipeline.py:46-49``).  Output rows carry a
    ``table`` column plus a JSON ``row`` payload; route to real schemas with
    a downstream ``filter + align`` per table, or partition the Parquet sink
    by ``table``.  Extraction errors become ``_parse_error`` rows.
    """

    def __init__(
        self,
        entry_tag: str = "entry",
        extract: Callable[..., dict[str, list[dict]]] | None = None,
    ):
        self.entry_tag = entry_tag
        self.extract = extract or (lambda e: {"entries": [element_to_dict(e)]})
        # hooks may take (elem) or (elem, path): a second positional param
        # receives the entry's source file for correct per-file provenance
        # in multi-file reads
        try:
            params = [
                p
                for p in inspect.signature(self.extract).parameters.values()
                if p.kind
                in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD, p.VAR_POSITIONAL)
            ]
            self._pass_path = len(params) >= 2 or any(
                p.kind is p.VAR_POSITIONAL for p in params
            )
        except (TypeError, ValueError):
            self._pass_path = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables: list[str] = []
        rows: list[str] = []
        paths = batch["path"].to_pylist() if "path" in batch.column_names else [""] * len(batch)
        for payload, path in zip(batch["bytes"].to_pylist(), paths):
            entries = stream_xml_bytes(payload, self.entry_tag)
            while True:
                try:
                    elem = next(entries)
                except StopIteration:
                    break
                except Exception as exc:  # malformed XML mid-file: one
                    # error row; entries already parsed from this file and
                    # the batch's other files survive (never-raise contract)
                    tables.append("_parse_error")
                    rows.append(json.dumps({"file": path, "error": str(exc)}))
                    break
                try:
                    routed = (
                        self.extract(elem, path)
                        if self._pass_path
                        else self.extract(elem)
                    )
                except Exception as exc:  # errors -> rows, never raises
                    tables.append("_parse_error")
                    rows.append(json.dumps({"file": path, "error": str(exc)}))
                    continue
                for tname, trows in routed.items():
                    for r in trows:
                        tables.append(tname)
                        rows.append(json.dumps(r, default=str))
        return pa.table(
            {
                "table": pa.array(tables, type=pa.string()),
                "row": pa.array(rows, type=pa.string()),
            }
        )


def read_xml_entries(paths, entry_tag: str = "entry", extract=None):
    """Streamed XML entries as a (table, row-json) Dataset."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)
    return files.map_batches(XmlEntryParser(entry_tag, extract), batch_format="pyarrow")


def rows_for_table(ds, table: str, schema: pa.Schema):
    """Materialize one routed table with a declared schema (align +
    cast, add-missing-as-null)."""
    import pyarrow.compute as pc

    from cdm_data_loader_utils_ray.stages.schema_align import align_to_schema

    def extract(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.equal(batch["table"], table))
        dicts = [json.loads(r) for r in hit["row"].to_pylist()]
        if not dicts:
            return schema.empty_table()
        # NOTE: pa.Table.from_pylist infers its schema from the FIRST row
        # only — a key missing there (e.g. a sparse 'relationship' column)
        # would be silently dropped.  Build columns over the union of keys.
        keys = list(dict.fromkeys(k for d in dicts for k in d))
        tbl = pa.table({k: pa.array([d.get(k) for d in dicts]) for k in keys})
        return align_to_schema(tbl, schema)

    return ds.map_batches(extract, batch_format="pyarrow")
