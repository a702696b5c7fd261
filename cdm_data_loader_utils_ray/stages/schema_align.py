"""Schema evolution: add-missing-as-null + rename + cast + reorder.

This is the engine's added/renamed-column story, matching the reference's
``cast_df_to_schema`` (``cli/fetch_taxon_reports.py:38-45``),
``unionByName(allowMissingColumns=True)`` (``tables_finalize.py:36-38,51-54``)
and ``mergeSchema`` appends (``utils/spark_delta.py:195-196``) — but expressed
as pure ``pyarrow.Table -> pyarrow.Table`` kernels usable inside
``Dataset.map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

from collections.abc import Mapping

import pyarrow as pa


def rename_columns(table: pa.Table, rename_map: Mapping[str, str] | None) -> pa.Table:
    """Rename columns per ``rename_map`` (old name -> new name).

    Renames the engine is told about (FIXTURES.md §3 `events_v3`): the rename
    map is supplied by the operator, as Delta column-mapping would be.
    """
    if not rename_map:
        return table
    return table.rename_columns([rename_map.get(n, n) for n in table.column_names])


def align_to_schema(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``table`` onto ``schema``: missing columns become typed nulls,
    present columns are cast, order follows ``schema``.  Extra columns not in
    ``schema`` are dropped (callers that want to keep them should unify the
    schema first with :func:`evolve_schema`).
    """
    n = len(table)
    arrays = []
    for field in schema:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def evolve_schema(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Union of two schemas by name (``mergeSchema`` analogue): keeps
    ``current`` order, appends new fields from ``incoming``.  A field that
    exists in both keeps ``current``'s type unless it can be widened by
    ``pa.unify_schemas`` type promotion.
    """
    try:
        merged = pa.unify_schemas([current, incoming], promote_options="permissive")
        # unify_schemas relaxes nullability when either side is nullable;
        # the DECLARED nullability (current) is authoritative — the validator
        # enforces it, the reader does not (reference df_nullable_fields).
        fields = [
            pa.field(f.name, f.type, current.field(f.name).nullable)
            if f.name in current.names
            else f
            for f in merged
        ]
        return pa.schema(fields)
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        # fall back to name-based append without promotion
        fields = list(current)
        names = set(current.names)
        for f in incoming:
            if f.name not in names:
                fields.append(f)
        return pa.schema(fields)


def union_by_name(tables: list[pa.Table]) -> pa.Table:
    """Concatenate tables with differing schemas, name-aligned, missing
    columns null-filled — ``unionByName(allowMissingColumns=True)``.
    """
    if not tables:
        return pa.table({})
    schema = tables[0].schema
    for t in tables[1:]:
        schema = evolve_schema(schema, t.schema)
    return pa.concat_tables([align_to_schema(t, schema) for t in tables])


class SchemaAligner:
    """``map_batches`` callable: rename (drift map) then align to a target
    schema.  Stateless and cheap — used as a plain function stage.
    """

    def __init__(self, schema: pa.Schema, rename_map: Mapping[str, str] | None = None):
        self.schema = schema
        self.rename_map = dict(rename_map or {})

    def __call__(self, batch: pa.Table) -> pa.Table:
        return align_to_schema(rename_columns(batch, self.rename_map), self.schema)
