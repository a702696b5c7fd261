"""Deterministic IDs — reference ``generate_cdm_id`` / ``build_entity_id``
(``refseq_pipeline/core/cdm_parse.py:57-66``,
``refseq_importer/core/cdm_builders.py:51-56``): UUIDv5 of a namespace +
natural key, so re-parsing the same entity yields the same ID — the
idempotency primitive the reference leans on instead of transactions.
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

import pyarrow as pa

CDM_NAMESPACE = uuid.uuid5(uuid.NAMESPACE_DNS, "cdm-data-loader-utils-ray")


def generate_cdm_id(kind: str, *natural_key: str) -> str:
    """Stable UUIDv5 from entity kind + natural key parts."""
    name = kind + "\x1f" + "\x1f".join(natural_key)
    return str(uuid.uuid5(CDM_NAMESPACE, name))


def add_cdm_id_column(
    batch: pa.Table,
    kind: str,
    key_columns: Sequence[str],
    out_column: str = "cdm_id",
) -> pa.Table:
    """``map_batches`` stage: append a deterministic ``cdm_id`` per row."""
    cols = [batch[c].to_pylist() for c in key_columns]
    ids = pa.array(
        [generate_cdm_id(kind, *(str(v) for v in parts)) for parts in zip(*cols)],
        type=pa.string(),
    )
    if out_column in batch.column_names:
        batch = batch.drop_columns([out_column])
    return batch.append_column(out_column, ids)


def build_entity_id(prefix: str, accession: str) -> str:
    """Reference-style prefixed natural-key ID (e.g. ``uniprot:<acc>``)."""
    return f"{prefix}:{accession}"
