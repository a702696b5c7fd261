"""Schema-enforced CSV/TSV reader with PERMISSIVE corrupt-row capture.

Reference parity: ``readers/dsv.py:40-131`` — declared schema, PERMISSIVE
mode only, malformed rows captured in the ``__invalid_data__`` column
appended to the schema (``core/constants.py:3``), never raising.  Two
failure classes surface exactly as there:

* wrong column count  -> whole raw line in ``__invalid_data__``, all fields
  null (-> ``parse_error`` from the validator);
* type-cast failure   -> raw line in ``__invalid_data__``, failed field null.

Ray-native shape: ``read_binary_files`` (one file per task) ->
``map_batches`` parser that runs ``pyarrow.csv`` with all-string columns
plus vectorized per-column coercion — wrong-typed values are detected with
Arrow cast kernels, not Python loops.
"""

from __future__ import annotations

import io
from collections.abc import Mapping

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

from cdm_data_loader_utils_ray.core.schemas import INVALID_DATA_COLUMN

# csv tuning a caller may pass via ``options=`` — forwarded verbatim into
# ``pyarrow.csv.ParseOptions`` (anything else raises: a silently-ignored
# option would mean silently-misparsed rows)
_PARSE_OPTION_KEYS = {
    "quote_char",
    "double_quote",
    "escape_char",
    "newlines_in_values",
    "ignore_empty_lines",
}


def _coerce_column(arr: pa.ChunkedArray | pa.Array, typ: pa.DataType) -> tuple[pa.Array, np.ndarray]:
    """Cast a string column to ``typ``; returns (values, failed_mask) where
    failed rows (non-null input that would not cast) become null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type):
        # belt-and-suspenders: the all-string forcing can miss (positional
        # header mapping types columns by inference) — normalize first
        arr = arr.cast(pa.string())
    trimmed = pc.utf8_trim_whitespace(arr)
    empty_as_null = pc.if_else(pc.equal(trimmed, ""), pa.nulls(len(arr), pa.string()), trimmed)
    if pa.types.is_string(typ):
        return empty_as_null, np.zeros(len(arr), dtype=bool)
    if pa.types.is_boolean(typ):
        lowered = pc.utf8_lower(empty_as_null)
        is_true = pc.is_in(lowered, value_set=pa.array(["true", "1", "t", "yes"]))
        is_false = pc.is_in(lowered, value_set=pa.array(["false", "0", "f", "no"]))
        ok = pc.or_(is_true, is_false)
        cast = pc.if_else(pc.fill_null(ok, False), is_true, pa.nulls(len(arr), pa.bool_()))
        failed = pc.and_(pc.is_valid(empty_as_null), pc.invert(pc.fill_null(ok, False)))
        return cast, failed.to_numpy(zero_copy_only=False)
    try:
        cast = empty_as_null.cast(typ, safe=True)
        return cast, np.zeros(len(arr), dtype=bool)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        # per-element salvage: cast what casts, flag the rest (arrow has no
        # "cast with null on error" for all types; emulate with a mask)
        n = len(arr)
        vals = empty_as_null.to_pylist()
        out = []
        failed = np.zeros(n, dtype=bool)
        for i, v in enumerate(vals):
            if v is None:
                out.append(None)
                continue
            try:
                out.append(pa.scalar(v, type=pa.string()).cast(typ).as_py())
            except (pa.ArrowInvalid, ValueError):
                out.append(None)
                failed[i] = True
        return pa.array(out, type=typ), failed


class DsvParser:
    """``map_batches`` callable over ``read_binary_files`` batches
    (columns: ``bytes``, ``path``): parse each file's DSV payload against a
    declared schema; corrupt rows land in ``__invalid_data__``."""

    def __init__(
        self,
        schema: pa.Schema,
        delimiter: str = ",",
        header: bool = True,
        options: Mapping | None = None,
        include_path: bool = False,
    ):
        self.schema = schema
        self.delimiter = delimiter
        self.header = header
        self.include_path = include_path
        self.options = dict(options or {})

    def _out_schema(self) -> pa.Schema:
        fields = list(self.schema) + [pa.field(INVALID_DATA_COLUMN, pa.string())]
        if self.include_path:
            fields.append(pa.field("_source_file", pa.string()))
        return pa.schema(fields)

    def parse_file(self, payload: bytes, path: str = "") -> pa.Table:
        names = [f.name for f in self.schema]
        bad_lines: list[str] = []

        def on_invalid(row) -> str:
            bad_lines.append(row.text)
            return "skip"

        read_opts = pacsv.ReadOptions(
            column_names=None if self.header else names,
            autogenerate_column_names=False,
        )
        unknown = set(self.options) - _PARSE_OPTION_KEYS
        if unknown:
            raise ValueError(f"unsupported DSV options: {sorted(unknown)}")
        parse_opts = pacsv.ParseOptions(
            delimiter=self.delimiter, invalid_row_handler=on_invalid,
            **self.options,
        )
        # force EVERY column to string, including the file's own header
        # names (with header=True the declared names may not match the
        # header, and ConvertOptions is keyed by the names in the file —
        # an inference-typed column would crash the coercion kernels)
        force = {n: pa.string() for n in names}
        if self.header:
            import csv as _csv

            first = (
                payload.split(b"\n", 1)[0]
                .decode("utf-8", errors="replace")
                .lstrip("\ufeff")
            )
            for h in next(_csv.reader([first], delimiter=self.delimiter), []):
                force[h] = pa.string()
        convert_opts = pacsv.ConvertOptions(
            column_types=force,
            strings_can_be_null=False,
        )
        try:
            raw = pacsv.read_csv(
                io.BytesIO(payload),
                read_options=read_opts,
                parse_options=parse_opts,
                convert_options=convert_opts,
            )
        except pa.ArrowInvalid:
            # wholly unparseable file: every line is a corrupt record
            text = payload.decode("utf-8", errors="replace")
            lines = [l for l in text.splitlines() if l]
            if self.header and lines:
                lines = lines[1:]
            n = len(lines)
            cols = {f.name: pa.nulls(n, f.type) for f in self.schema}
            cols[INVALID_DATA_COLUMN] = pa.array(lines, type=pa.string())
            if self.include_path:
                cols["_source_file"] = pa.array([path] * n)
            return pa.Table.from_arrays(list(cols.values()), schema=self._out_schema())

        if self.header:
            # tolerate files whose header names differ in order/case only if
            # they match; otherwise positional mapping (reference reads with
            # a declared schema, names win)
            if set(raw.column_names) >= set(names):
                raw = raw.select(names)
            else:
                take = min(raw.num_columns, len(names))
                raw = raw.select(raw.column_names[:take]).rename_columns(names[:take])
        n = len(raw)
        invalid = np.zeros(n, dtype=bool)
        arrays = []
        for f in self.schema:
            col = raw.column(f.name) if f.name in raw.column_names else pa.nulls(n, pa.string())
            cast, failed = _coerce_column(col, f.type)
            invalid |= failed
            arrays.append(cast)
        # reconstruct raw text for type-failed rows (reference keeps the raw
        # record alongside the parse error)
        raw_lines = pa.nulls(n, pa.string())
        if invalid.any():
            joined = raw.column(raw.column_names[0]).cast(pa.string())
            for c in raw.column_names[1:]:
                joined = pc.binary_join_element_wise(
                    joined, pc.fill_null(raw.column(c).cast(pa.string()), ""), self.delimiter
                )
            raw_lines = pc.if_else(pa.array(invalid), joined, pa.nulls(n, pa.string()))
        cols = arrays + [raw_lines]
        out_schema = self._out_schema()
        if self.include_path:
            cols.append(pa.array([path] * n))
        table = pa.Table.from_arrays(cols, schema=out_schema)
        if bad_lines:
            m = len(bad_lines)
            bad_cols = [pa.nulls(m, f.type) for f in self.schema] + [
                pa.array(bad_lines, type=pa.string())
            ]
            if self.include_path:
                bad_cols.append(pa.array([path] * m))
            table = pa.concat_tables([table, pa.Table.from_arrays(bad_cols, schema=out_schema)])
        return table

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        paths = batch["path"].to_pylist() if "path" in batch.column_names else [""] * len(batch)
        for payload, path in zip(batch["bytes"].to_pylist(), paths):
            tables.append(self.parse_file(payload, path))
        return pa.concat_tables(tables) if tables else self._out_schema().empty_table()


def read_dsv(
    paths,
    schema: pa.Schema,
    delimiter: str = ",",
    header: bool = True,
    include_path: bool = False,
    **kwargs,
):
    """Ray-native ``dsv.read``: one parse task per file, corrupt rows
    captured, declared schema enforced (nullability via the validator
    stage, as in the reference)."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)
    parser = DsvParser(schema, delimiter, header, include_path=include_path, **kwargs)
    return files.map_batches(parser, batch_format="pyarrow")


def read_tsv(paths, schema: pa.Schema, **kwargs):
    """Reference ``dsv.read_tsv`` shortcut."""
    return read_dsv(paths, schema, delimiter="\t", **kwargs)


def read_csv(paths, schema: pa.Schema, **kwargs):
    """Reference ``dsv.read_csv`` shortcut."""
    return read_dsv(paths, schema, delimiter=",", **kwargs)
