"""Last-writer-wins upsert/merge — the CDC core.

Reference semantics reproduced here (SURVEY §2.10, §2.7 O3):

* keyed upsert = ``DeltaTable.merge`` on natural keys
  (``audit/checkpoint.py:54-60``) — here key = ``(repo, path)``, authority =
  ``seq`` (the reference's "latest wins" preference window,
  ``refseq_pipeline/core/spark_delta.py:130-139``);
* upsert-over-delete: an update with a higher ``seq`` than a prior delete
  resurrects the key (``whenNotMatchedInsertAll`` behaviour) — tombstones are
  retained in partition state so the merge is **commutative and idempotent**
  under any replay order and any number of re-deliveries;
* dedup of replayed events: merging an identical ``(key, seq)`` twice is a
  no-op by construction — exactly-once output from at-least-once input
  without coordination (the reference leans on deterministic IDs + dedup
  compaction, ``cdm_parse.py:57-66`` + ``spark_delta.py:95-157``).

Execution shape (Ray-Data-first):

* a **within-batch pre-reduce** (vectorized pandas ``drop_duplicates``)
  combines update-heavy streams *before* the shuffle — the combiner that
  keeps a hot key from shipping its full history across the exchange;
* one ``groupby(_pid).map_groups`` shuffle co-locates each lake partition's
  events with its prior state file; the merge itself is a vectorized
  sort + drop_duplicates over (prior ∪ delta), never a Python row loop.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.core.schemas import (
    DELETED_COLUMN,
    KEY_COLUMNS,
    SHA_COLUMN,
)
from cdm_data_loader_utils_ray.stages.schema_align import align_to_schema

_KEYS = list(KEY_COLUMNS)


def _lww_take_indices(
    table: pa.Table, key_columns: Sequence[str], seq_column: str,
    seq_order: str = "ascending",
) -> pa.Array:
    """Indices of the winning (max-``seq``, ties -> later input order) row
    per key, ascending by key.  Pure Arrow: one multi-key ``sort_indices``
    + vectorized adjacent-row boundary detection; no Python objects, no
    pandas round-trip of the payload strings.  ``seq_order="descending"``
    flips the winner to the MIN-``seq`` row (works for any orderable seq
    type, including strings — no sign trick needed)."""
    sort_keys = [(c, "ascending") for c in key_columns] + [(seq_column, seq_order)]
    idx = pc.sort_indices(table, sort_keys=sort_keys)  # stable sort
    n = len(idx)
    if n == 0:
        return idx
    taken = table.select(list(key_columns)).take(idx)
    # row i is the LAST of its key-group iff any key column differs at i+1.
    # Nulls group TOGETHER (SQL GROUP BY semantics): null-vs-null is NOT a
    # boundary, null-vs-value is — not_equal alone yields null for both
    # cases, so the null geometry is resolved explicitly with is_null.
    last = np.ones(n, dtype=bool)
    boundary = np.zeros(n - 1, dtype=bool)
    for c in key_columns:
        col = taken.column(c).combine_chunks()
        a, b = col.slice(0, n - 1), col.slice(1, n)
        neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(zero_copy_only=False)
        if col.null_count:
            na = pc.is_null(a).to_numpy(zero_copy_only=False)
            nb = pc.is_null(b).to_numpy(zero_copy_only=False)
            neq |= na ^ nb
        boundary |= neq
    last[: n - 1] = boundary
    return idx.filter(pa.array(last))


def prereduce_batch(batch: pa.Table, key_columns: Sequence[str] = KEY_COLUMNS) -> pa.Table:
    """Within-batch LWW combiner: keep only the max-``seq`` row per key.

    Safe because a lower ``seq`` can never win the final merge; on an
    update-heavy stream this collapses most of the shuffle volume.
    """
    if len(batch) == 0:
        return batch
    winners = _lww_take_indices(batch, list(key_columns), "seq")
    return batch.take(winners)


def events_to_state(events: pa.Table, state_schema: pa.Schema) -> pa.Table:
    """Project event rows to state rows: ``op`` -> ``is_deleted`` flag,
    content/sha nulled on deletes, aligned to ``state_schema``."""
    deleted = pc.equal(events["op"], pa.scalar("delete"))
    deleted = pc.fill_null(deleted, False)
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for f in state_schema:
        if f.name == DELETED_COLUMN:
            cols[f.name] = deleted
        elif f.name in events.column_names:
            col = events[f.name]
            if f.name in ("content", SHA_COLUMN):
                col = pc.if_else(deleted, pa.nulls(len(events), f.type), col.cast(f.type))
            elif col.type != f.type:
                col = col.cast(f.type)
            cols[f.name] = col
        else:
            cols[f.name] = pa.nulls(len(events), f.type)
    return pa.Table.from_arrays([cols[f.name] for f in state_schema], schema=state_schema)


def merge_states(
    prior: pa.Table | None,
    delta: pa.Table,
    state_schema: pa.Schema,
    key_columns: Sequence[str] = KEY_COLUMNS,
) -> pa.Table:
    """LWW merge of a partition's prior state with new state rows.

    Vectorized: concat -> stable sort by ``seq`` -> drop_duplicates(keep=last).
    Commutative/idempotent: ties on ``seq`` are exact re-deliveries (same
    deterministic row), so either copy is correct.
    """
    parts = []
    if prior is not None and len(prior):
        parts.append(align_to_schema(prior, state_schema))
    if len(delta):
        parts.append(align_to_schema(delta, state_schema))
    if not parts:
        return state_schema.empty_table()
    merged = pa.concat_tables(parts)
    winners = _lww_take_indices(merged, list(key_columns), "seq")
    # winners are already ascending by key (sort_indices order)
    return merged.take(winners)


def oracle_materialize(
    events: pa.Table,
    key_columns: Sequence[str] = KEY_COLUMNS,
    drop_deleted: bool = True,
) -> pd.DataFrame:
    """Driver-side oracle (FIXTURES.md §6): group events by key, keep the
    max-``seq`` row, drop keys whose final op is delete.  Used only in tests
    to verify the distributed engine's final state."""
    df = events.to_pandas().sort_values("seq", kind="stable")
    df = df.drop_duplicates(subset=list(key_columns), keep="last")
    if drop_deleted:
        df = df[df["op"] != "delete"]
    return df.sort_values(list(key_columns)).reset_index(drop=True)


def unsalt_merge(
    state: pa.Table,
    state_schema: pa.Schema,
    key_columns: Sequence[str] = KEY_COLUMNS,
) -> pa.Table:
    """Phase-2 of salted skew handling: after per-sub-partition pre-reduce,
    merge the per-salt survivors of each hot key (at most ``fanout`` rows per
    key reach this stage)."""
    return merge_states(None, state, state_schema, key_columns)
