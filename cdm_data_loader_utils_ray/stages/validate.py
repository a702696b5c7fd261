"""Row validation with reject capture — reference parity for
``validation/df_nullable_fields.py:12-61`` and
``validation/dataframe_validator.py:40-88``.

Error taxonomy (exactly the reference's):
  * ``"missing_required: <col>"`` — null in a non-nullable column;
  * ``"parse_error"`` — corrupt record captured in ``__invalid_data__``
    (PERMISSIVE CSV read) or a value that fails type/domain checks.

Rows are annotated with an ``errors_in_record`` list column; a split stage
routes rows with errors to the rejects table and clean rows onward — errors
never raise inside the pipeline (reference ``uniprot_kb.py:386-390``).

Validators are SPARSE: each returns ``(bool_mask, message)`` pairs, so a
clean batch (the overwhelmingly common case at scale) allocates no per-row
Python lists — the errors column is built from a zero-length ListArray.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.core.schemas import (
    ERRORS_COLUMN,
    INVALID_DATA_COLUMN,
    VALID_OPS,
)

# A validator returns a list of (mask, message): mask[i] == True means row i
# gets `message` appended to its error list.
Validator = Callable[[pa.Table], list[tuple[np.ndarray, str]]]


def _mask(arr) -> np.ndarray:
    return arr.to_numpy(zero_copy_only=False)


def check_non_nullable(schema: pa.Schema) -> Validator:
    """``missing_required: <col>`` for nulls in non-nullable columns.

    Spark silently relaxes nullable=False on read and the reference re-checks
    it manually (``df_nullable_fields.py:20-23``); Arrow behaves the same way,
    hence the same explicit stage.
    """
    required = [f.name for f in schema if not f.nullable]

    def _check(batch: pa.Table) -> list[tuple[np.ndarray, str]]:
        out = []
        n = len(batch)
        for col in required:
            msg = f"missing_required: {col}"
            if col not in batch.column_names:
                out.append((np.ones(n, dtype=bool), msg))
                continue
            if batch[col].null_count:
                out.append((_mask(pc.is_null(batch[col])), msg))
        return out

    return _check


def check_parse_errors(invalid_column: str = INVALID_DATA_COLUMN) -> Validator:
    """``parse_error`` for rows whose corrupt-record column is non-null
    (reference ``df_nullable_fields.py:46-58``)."""

    def _check(batch: pa.Table) -> list[tuple[np.ndarray, str]]:
        if invalid_column in batch.column_names and (
            len(batch) - batch[invalid_column].null_count
        ):
            return [(_mask(pc.is_valid(batch[invalid_column])), "parse_error")]
        return []

    return _check


def check_op_domain(column: str = "op", allowed: Sequence[str] = VALID_OPS) -> Validator:
    """``parse_error`` for op values outside the enum (FIXTURES.md §4
    type_mismatch case; reference predicate-whitelist pattern
    ``gene_association_file.py:135-139`` routed to rejects instead of raise)."""
    value_set = pa.array(list(allowed))

    def _check(batch: pa.Table) -> list[tuple[np.ndarray, str]]:
        if column not in batch.column_names:
            return []
        bad = pc.and_(
            pc.is_valid(batch[column]),
            pc.invert(pc.is_in(batch[column], value_set=value_set)),
        )
        if not pc.any(bad).as_py():
            return []
        return [(_mask(bad), "parse_error")]

    return _check


def check_delete_content(op_column: str = "op", content_column: str = "content") -> Validator:
    """``parse_error`` when content is null on a non-delete op (EVENT_SCHEMA
    invariant: content null iff op == delete)."""

    def _check(batch: pa.Table) -> list[tuple[np.ndarray, str]]:
        if op_column not in batch.column_names or content_column not in batch.column_names:
            return []
        if batch[content_column].null_count == 0:
            return []
        bad = pc.fill_null(
            pc.and_(
                pc.not_equal(batch[op_column], pa.scalar("delete")),
                pc.is_null(batch[content_column]),
            ),
            False,
        )
        if not pc.any(bad).as_py():
            return []
        return [(_mask(bad), "parse_error")]

    return _check


def _empty_errors_column(n: int) -> pa.Array:
    offsets = pa.array(np.zeros(n + 1, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, pa.array([], type=pa.string()))


def annotate_errors(batch: pa.Table, validators: Sequence[Validator]) -> pa.Table:
    """Run validators, append the ``errors_in_record`` list<string> column
    (reference ``DataFrameValidator.validate_dataframe`` annotation step).
    Fast path: a clean batch allocates a single zero-copy empty-list column."""
    n = len(batch)
    hits: list[tuple[np.ndarray, str]] = []
    for v in validators:
        hits.extend(v(batch))
    if batch.schema.get_field_index(ERRORS_COLUMN) != -1:
        batch = batch.drop_columns([ERRORS_COLUMN])
    if not hits:
        return batch.append_column(
            pa.field(ERRORS_COLUMN, pa.list_(pa.string())), _empty_errors_column(n)
        )
    # sparse build: per-row Python lists only for flagged rows
    flagged = np.zeros(n, dtype=bool)
    for mask, _ in hits:
        flagged |= mask
    errs: dict[int, list[str]] = {}
    for mask, msg in hits:
        for i in np.flatnonzero(mask):
            errs.setdefault(int(i), []).append(msg)
    lists = [errs.get(i, []) if flagged[i] else [] for i in range(n)]
    return batch.append_column(
        pa.field(ERRORS_COLUMN, pa.list_(pa.string())),
        pa.array(lists, type=pa.list_(pa.string())),
    )


def error_mask(batch: pa.Table) -> pa.Array:
    """Boolean mask: row has >= 1 validation error (reference
    ``filter(size(ROW_ERRORS) > 0)``, ``audit/metrics.py:54``)."""
    return pc.greater(pc.list_value_length(batch[ERRORS_COLUMN]), 0)


def has_any_errors(batch: pa.Table) -> bool:
    """Cheap batch-level check so downstream stages can skip the reject
    split entirely on clean batches."""
    col = batch[ERRORS_COLUMN]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values if hasattr(col, "values") else col.combine_chunks().values
    return len(values) > 0


def split_valid(batch: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(valid_rows_without_errors_col, reject_rows_with_errors_col)."""
    if not has_any_errors(batch):
        return batch.drop_columns([ERRORS_COLUMN]), batch.slice(0, 0)
    mask = error_mask(batch)
    valid = batch.filter(pc.invert(mask)).drop_columns([ERRORS_COLUMN])
    rejects = batch.filter(mask)
    return valid, rejects


class EventValidator:
    """Standard validator stack for the CDC event schema; a ``map_batches``
    stage that annotates ``errors_in_record``.

    ``extra`` is the user-extension surface (reference
    ``Validator(validation_fn, args)``, ``dataframe_validator.py:21-27``):
    additional callables ``batch -> [(mask, message), ...]`` appended to the
    stack — their errors route rows to rejects exactly like built-ins.
    """

    def __init__(self, schema: pa.Schema, extra: Sequence[Validator] = ()):
        self.validators = [
            check_non_nullable(schema),
            check_parse_errors(),
            check_op_domain(),
            check_delete_content(),
            *extra,
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        return annotate_errors(batch, self.validators)


def predicate_validator(expr: Callable[[pa.Table], pa.Array], message: str) -> Validator:
    """Wrap a vectorized boolean predicate (True = INVALID row) as a
    validator — the simplest custom-validation plug-in."""

    def _check(batch: pa.Table) -> list[tuple[np.ndarray, str]]:
        mask = pc.fill_null(expr(batch), False)
        if not pc.any(mask).as_py():
            return []
        return [(_mask(mask), message)]

    return _check
