"""Small-side lookup-table parsers — driver-side reads that become broadcast
dicts inside ``map_batches`` stages (SURVEY §2.5 J5/J6: never a shuffle).

Reference parity:
* ``get_checkm2_data`` (``parsers/checkm2.py:13-48``): quality-report TSV ->
  dict keyed by name, with a required-column check that raises on malformed
  headers;
* ``get_bbmap_stats`` (``parsers/bbmap_stats.py:8-60``): concatenated-JSON
  repair (``}\\n{`` -> ``},{``) + parse -> dict by filename;
* ``get_genome_paths`` (``parsers/genome_paths.py:10-65``): JSON map with
  validation/error accumulation.
"""

from __future__ import annotations

import csv
import io
import json
import re


class MissingColumnsError(ValueError):
    pass


def read_quality_report(
    payload: str | bytes,
    key_column: str,
    required_columns: list[str],
    delimiter: str = "\t",
) -> dict[str, dict]:
    """TSV quality report -> {key -> row dict}; raises
    :class:`MissingColumnsError` listing absent required columns
    (reference checkm2 behaviour)."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8")
    reader = csv.DictReader(io.StringIO(payload), delimiter=delimiter)
    headers = reader.fieldnames or []
    missing = [c for c in [key_column, *required_columns] if c not in headers]
    if missing:
        raise MissingColumnsError(f"missing required columns: {missing}")
    return {row[key_column]: dict(row) for row in reader}


def repair_concatenated_json(payload: str | bytes) -> list[dict]:
    """Concatenated JSON objects (``}{`` / ``}\\n{`` boundaries) -> list of
    dicts (reference bbmap_stats repair)."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8")
    repaired = re.sub(r"\}\s*\{", "},{", payload.strip())
    if not repaired.startswith("["):
        repaired = f"[{repaired}]"
    return json.loads(repaired)


def read_stats_by_filename(payload: str | bytes, filename_key: str = "filename") -> dict:
    """Concatenated-JSON stats -> dict keyed by the per-object filename."""
    out = {}
    for obj in repair_concatenated_json(payload):
        name = obj.get(filename_key)
        if name:
            out[name] = obj
    return out


def read_path_map(
    payload: str | bytes,
    required_keys: tuple[str, ...] = (),
) -> tuple[dict[str, dict], list[str]]:
    """JSON {id -> {kind -> path}} with validation/error ACCUMULATION
    (reference genome_paths: collect errors, never raise mid-parse).
    Returns (valid_entries, errors)."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8")
    errors: list[str] = []
    try:
        data = json.loads(payload)
    except json.JSONDecodeError as exc:
        return {}, [f"invalid json: {exc}"]
    if not isinstance(data, dict):
        return {}, ["top-level structure is not a mapping"]
    valid: dict[str, dict] = {}
    for key, entry in data.items():
        if not isinstance(entry, dict):
            errors.append(f"{key}: entry is not a mapping")
            continue
        missing = [k for k in required_keys if not entry.get(k)]
        if missing:
            errors.append(f"{key}: missing {missing}")
            continue
        valid[key] = entry
    return valid, errors


def broadcast_lookup(lookup: dict):
    """``ray.put`` a small lookup once; returns a ref to fetch inside actor
    ``__init__`` (the broadcast-join primitive, SURVEY §2.5)."""
    import ray

    return ray.put(lookup)
