"""Defensive coercion + deep extraction over messy nested JSON.

Reference parity:
* ``safe_int`` / ``safe_float`` / ``percent_to_fraction_strict``
  (``refseq_pipeline/core/cdm_parse.py:15-31``) — comma-tolerant numeric
  coercion, None on failure, never raising;
* the deep extractors (``refseq_importer/core/extractors.py:13-312``):
  ``coalesce``, ``deep_find_str``, ``deep_collect_regex`` — recursive search
  of nested dict/list JSON with regex fallback.  CPU-bound stateless Python:
  runs inside ``map_batches`` per row (SURVEY §2.3 M13 — not vectorizable).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterable, Iterator

import pyarrow as pa


def safe_int(value) -> int | None:
    """Int coercion tolerating commas/whitespace; None on failure."""
    if value is None:
        return None
    try:
        if isinstance(value, str):
            value = value.replace(",", "").strip()
            if not value:
                return None
        return int(float(value))
    except (ValueError, TypeError, OverflowError):
        # OverflowError: int(float('inf')) — e.g. '1e400' inputs
        return None


def safe_float(value) -> float | None:
    """Float coercion tolerating commas/whitespace; None on failure."""
    if value is None:
        return None
    try:
        if isinstance(value, str):
            value = value.replace(",", "").strip()
            if not value:
                return None
        return float(value)
    except (ValueError, TypeError):
        return None


def percent_to_fraction_strict(value) -> float | None:
    """'97.5' or '97.5%' -> 0.975; None outside [0, 100] or unparseable."""
    if isinstance(value, str):
        value = value.replace("%", "")
    f = safe_float(value)
    if f is None or not (0.0 <= f <= 100.0):
        return None
    return f / 100.0


def coalesce(*values):
    """First non-None, non-empty value."""
    for v in values:
        if v is not None and v != "" and v != [] and v != {}:
            return v
    return None


def _walk(obj) -> Iterator:
    yield obj
    if isinstance(obj, dict):
        for v in obj.values():
            yield from _walk(v)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            yield from _walk(v)


def deep_find_str(obj, *key_candidates: str) -> str | None:
    """First string value found under any of the candidate keys anywhere in
    the nested structure (snake/camelCase tolerant)."""
    wanted = set()
    for k in key_candidates:
        wanted.add(k)
        wanted.add(k.lower())
        wanted.add(re.sub(r"_(\w)", lambda m: m.group(1).upper(), k))  # camel
        wanted.add(re.sub(r"(?<!^)(?=[A-Z])", "_", k).lower())  # snake
    for node in _walk(obj):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in wanted and isinstance(v, str) and v:
                    return v
    return None


def deep_collect_regex(obj, pattern: str) -> list[str]:
    """All distinct strings anywhere in the structure matching ``pattern``,
    in first-seen order (reference ``_deep_collect_regex``)."""
    rx = re.compile(pattern)
    out: list[str] = []
    seen: set[str] = set()
    for node in _walk(obj):
        if isinstance(node, str):
            for m in rx.findall(node):
                if m not in seen:
                    seen.add(m)
                    out.append(m)
    return out


def extract_accessions(obj) -> list[str]:
    """GCF/GCA-style accession collection (reference
    ``extract_accessions``)."""
    return deep_collect_regex(obj, r"GC[AF]_\d{9}\.\d+")


def extract_taxid(obj) -> int | None:
    return safe_int(
        coalesce(deep_find_str(obj, "tax_id", "taxId", "taxid"), None)
    )


class JsonRowExtractor:
    """``map_batches`` stage: parse a JSON-string column and extract a flat
    row per record with the deep extractors (the reference's
    ``parse_report_to_row`` shape, ``cdm_parse.py:72-93``).

    ``fields`` maps output column -> callable(parsed_json) -> value.
    ``types`` optionally pins an output column's Arrow type — without it,
    a block whose extracted values are ALL None infers a null-typed column
    that breaks cross-block schema unification (same hazard the GAF
    explode documents); declare types for sparse fields.
    """

    def __init__(self, fields: dict, json_column: str = "props",
                 types: dict[str, pa.DataType] | None = None):
        self.fields = fields
        self.json_column = json_column
        self.types = dict(types or {})

    def __call__(self, batch: pa.Table) -> pa.Table:
        parsed = []
        for s in batch[self.json_column].to_pylist():
            try:
                parsed.append(json.loads(s) if s else {})
            except (json.JSONDecodeError, TypeError):
                parsed.append({})
        cols = {}
        for out, fn in self.fields.items():
            cols[out] = pa.array([fn(p) for p in parsed], type=self.types.get(out))
        keep = batch.drop_columns([self.json_column])
        for name, arr in cols.items():
            keep = keep.append_column(name, arr)
        return keep


def parse_taxid_args(taxid_arg: str | None = None, taxid_file: str | None = None) -> list[str]:
    """Collect valid numeric TaxIDs from a comma-separated argument and/or a
    file, digit-stripping each token and de-duplicating while PRESERVING
    first-seen order (reference ``refseq_api_cli.py:28-62``, M20 + D5)."""
    import os
    import re

    taxids: list[str] = []
    if taxid_arg:
        for num in taxid_arg.split(","):
            tid = re.sub(r"\D+", "", num.strip())
            if tid:
                taxids.append(tid)
    if taxid_file:
        if not os.path.exists(taxid_file):
            raise FileNotFoundError(taxid_file)
        with open(taxid_file, encoding="utf-8") as f:
            for line in f:
                tid = re.sub(r"\D+", "", line.strip())
                if tid:
                    taxids.append(tid)
    return ordered_unique(taxids)


def ordered_unique(values) -> list:
    """Order-preserving dedup (reference D5, ``refseq_api_cli.py:54-62``) —
    driver-side helper; for dataset-scale dedup use functions/dedup."""
    seen: set = set()
    out = []
    for v in values:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out
