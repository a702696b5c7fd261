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
All kernels are vectorized pyarrow.compute; usable in
``map_batches(batch_format="pyarrow")``.
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

# A validator is a callable batch -> list-of-error-lists (len == len(batch)).
Validator = Callable[[pa.Table], list[list[str]]]


def check_non_nullable(schema: pa.Schema) -> Validator:
    """Errors ``missing_required: <col>`` for nulls in non-nullable columns.

    Spark silently relaxes nullable=False on read and the reference re-checks
    it manually (``df_nullable_fields.py:20-23``); Arrow behaves the same way,
    hence the same explicit stage.
    """
    required = [f.name for f in schema if not f.nullable]

    def _check(batch: pa.Table) -> list[list[str]]:
        errs: list[list[str]] = [[] for _ in range(len(batch))]
        for col in required:
            if col not in batch.column_names:
                msg = f"missing_required: {col}"
                for e in errs:
                    e.append(msg)
                continue
            mask = pc.is_null(batch[col]).to_numpy(zero_copy_only=False)
            if mask.any():
                msg = f"missing_required: {col}"
                for i in np.flatnonzero(mask):
                    errs[i].append(msg)
        return errs

    return _check


def check_parse_errors(invalid_column: str = INVALID_DATA_COLUMN) -> Validator:
    """``parse_error`` for rows whose corrupt-record column is non-null
    (reference ``df_nullable_fields.py:46-58``)."""

    def _check(batch: pa.Table) -> list[list[str]]:
        errs: list[list[str]] = [[] for _ in range(len(batch))]
        if invalid_column in batch.column_names:
            mask = pc.is_valid(batch[invalid_column]).to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(mask):
                errs[i].append("parse_error")
        return errs

    return _check


def check_op_domain(column: str = "op", allowed: Sequence[str] = VALID_OPS) -> Validator:
    """``parse_error`` for op values outside the enum (FIXTURES.md §4
    type_mismatch case; reference predicate-whitelist pattern
    ``gene_association_file.py:135-139`` routed to rejects instead of raise)."""

    def _check(batch: pa.Table) -> list[list[str]]:
        errs: list[list[str]] = [[] for _ in range(len(batch))]
        if column in batch.column_names:
            bad = pc.and_(
                pc.is_valid(batch[column]),
                pc.invert(pc.is_in(batch[column], value_set=pa.array(list(allowed)))),
            ).to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(bad):
                errs[i].append("parse_error")
        return errs

    return _check


def check_delete_content(op_column: str = "op", content_column: str = "content") -> Validator:
    """``parse_error`` when content is null on a non-delete op (EVENT_SCHEMA
    invariant: content null iff op == delete)."""

    def _check(batch: pa.Table) -> list[list[str]]:
        errs: list[list[str]] = [[] for _ in range(len(batch))]
        if op_column in batch.column_names and content_column in batch.column_names:
            bad = pc.and_(
                pc.not_equal(batch[op_column], pa.scalar("delete")),
                pc.is_null(batch[content_column]),
            )
            bad = pc.fill_null(bad, False).to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(bad):
                errs[i].append("parse_error")
        return errs

    return _check


def annotate_errors(batch: pa.Table, validators: Sequence[Validator]) -> pa.Table:
    """Run validators, append the ``errors_in_record`` list<string> column
    (reference ``DataFrameValidator.validate_dataframe`` annotation step)."""
    errs: list[list[str]] = [[] for _ in range(len(batch))]
    for v in validators:
        for row_errs, new in zip(errs, v(batch)):
            row_errs.extend(new)
    if ERRORS_COLUMN in batch.column_names:
        batch = batch.drop_columns([ERRORS_COLUMN])
    return batch.append_column(ERRORS_COLUMN, pa.array(errs, type=pa.list_(pa.string())))


def error_mask(batch: pa.Table) -> pa.Array:
    """Boolean mask: row has >= 1 validation error (reference
    ``filter(size(ROW_ERRORS) > 0)``, ``audit/metrics.py:54``)."""
    return pc.greater(pc.list_value_length(batch[ERRORS_COLUMN]), 0)


def split_valid(batch: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(valid_rows_without_errors_col, reject_rows_with_errors_col)."""
    mask = error_mask(batch)
    valid = batch.filter(pc.invert(mask)).drop_columns([ERRORS_COLUMN])
    rejects = batch.filter(mask)
    return valid, rejects


class EventValidator:
    """Standard validator stack for the CDC event schema; a ``map_batches``
    stage that annotates ``errors_in_record``."""

    def __init__(self, schema: pa.Schema):
        self.validators = [
            check_non_nullable(schema),
            check_parse_errors(),
            check_op_domain(),
            check_delete_content(),
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        return annotate_errors(batch, self.validators)
