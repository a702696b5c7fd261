"""JSON-lines source with PERMISSIVE corrupt-record capture.

Reference parity: the NCBI report JSON ingestion (``cdm_parse.py:72-93``
parse_report_to_row over fetched JSON pages) generalized to JSONL files
with the DSV reader's failure semantics (``readers/dsv.py``): undecodable
lines land whole in ``__invalid_data__``; decodable objects are aligned to
the declared schema (missing keys -> null, extra keys dropped); per-field
type mismatches null the field and capture the raw line.
"""

from __future__ import annotations

import json

import pyarrow as pa

from cdm_data_loader_utils_ray.core.schemas import INVALID_DATA_COLUMN


class JsonlParser:
    """``map_batches`` callable over ``read_binary_files`` batches."""

    def __init__(self, schema: pa.Schema, include_path: bool = False):
        self.schema = schema
        self.include_path = include_path

    def _out_schema(self) -> pa.Schema:
        fields = list(self.schema) + [pa.field(INVALID_DATA_COLUMN, pa.string())]
        if self.include_path:
            fields.append(pa.field("_source_file", pa.string()))
        return pa.schema(fields)

    def parse_file(self, payload: bytes, path: str = "") -> pa.Table:
        text = payload.decode("utf-8", errors="replace")
        rows: list[dict] = []
        invalid: list[str | None] = []
        for line in text.splitlines():
            if not line.strip():
                continue
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("not an object")
                rows.append(obj)
                invalid.append(None)
            except (json.JSONDecodeError, ValueError):
                rows.append({})
                invalid.append(line)
        n = len(rows)
        if n == 0:
            return self._out_schema().empty_table()
        # field-wise extraction with per-value type salvage
        arrays = []
        inv = list(invalid)
        for f in self.schema:
            vals = []
            for i, obj in enumerate(rows):
                v = obj.get(f.name)
                if v is None:
                    vals.append(None)
                    continue
                try:
                    vals.append(pa.scalar(v, type=f.type).as_py())
                except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
                    vals.append(None)
                    if inv[i] is None:
                        inv[i] = json.dumps(obj, sort_keys=True)
            arrays.append(pa.array(vals, type=f.type))
        cols = arrays + [pa.array(inv, type=pa.string())]
        if self.include_path:
            cols.append(pa.array([path] * n))
        return pa.Table.from_arrays(cols, schema=self._out_schema())

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist() if "path" in batch.column_names else [""] * len(batch)
        tables = [self.parse_file(b, p) for b, p in zip(batch["bytes"].to_pylist(), paths)]
        return pa.concat_tables(tables) if tables else self._out_schema().empty_table()


def read_jsonl(paths, schema: pa.Schema, include_path: bool = False):
    """JSONL files as a typed Dataset with corrupt-record capture."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)
    return files.map_batches(JsonlParser(schema, include_path), batch_format="pyarrow")
