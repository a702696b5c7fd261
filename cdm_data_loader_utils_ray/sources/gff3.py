"""GFF3 source (reference ``parsers/genome_loader.py:82-168``): tab-split
9-column lines, typed coordinates, strand/phase, ``attributes`` k=v parsing.

Ray-native: ``read_text`` (lines fan out across tasks) -> ``map_batches``
with vectorized ``pyarrow.compute`` splits; only the attribute-dict parse is
per-row Python (as in the reference).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.sources.dsv import _coerce_column

GFF3_SCHEMA = pa.schema(
    [
        pa.field("seqid", pa.string()),
        pa.field("source", pa.string()),
        pa.field("type", pa.string()),
        pa.field("start", pa.int64()),
        pa.field("end", pa.int64()),
        pa.field("score", pa.float64()),
        pa.field("strand", pa.string()),
        pa.field("phase", pa.string()),
        pa.field("attributes", pa.string()),
        pa.field("feature_id", pa.string()),
        pa.field("parent_id", pa.string()),
        pa.field("name", pa.string()),
    ]
)


def parse_attributes(attrs: str) -> dict[str, str]:
    """Reference attr parse (``genome_loader.py:70-79``): ``k=v;k=v``."""
    out: dict[str, str] = {}
    for kv in attrs.split(";"):
        kv = kv.strip()
        if not kv:
            continue
        if "=" in kv:
            k, v = kv.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def gff3_lines_to_table(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Vectorized line parser: drops comments/pragmas, splits columns with
    Arrow kernels, extracts ID/Parent/Name from attributes."""
    lines = batch[text_column]
    keep = pc.and_(
        pc.invert(pc.starts_with(lines, "#")),
        pc.greater(pc.utf8_length(lines), 0),
    )
    lines = lines.filter(pc.fill_null(keep, False))
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    parts = pc.split_pattern(lines, "\t")
    nine = pc.equal(pc.list_value_length(parts), 9)
    parts = parts.filter(pc.fill_null(nine, False))
    n = len(parts)
    cols = [pc.list_element(parts, i) for i in range(9)]

    def num(arr, typ):
        # '.' is the GFF3 null; anything else unparseable becomes null too
        # (dsv's salvage kernel) instead of ArrowInvalid killing the task
        cleaned = pc.if_else(pc.equal(arr, "."), pa.nulls(len(arr), pa.string()), arr)
        vals, _failed = _coerce_column(cleaned, typ)
        return vals

    start = num(cols[3], pa.int64())
    end = num(cols[4], pa.int64())
    score = num(cols[5], pa.float64())
    attrs = cols[8]
    fid, parent, name = [], [], []
    for a in attrs.to_pylist():
        d = parse_attributes(a or "")
        fid.append(d.get("ID"))
        parent.append(d.get("Parent"))
        name.append(d.get("Name"))
    return pa.Table.from_arrays(
        [
            cols[0], cols[1], cols[2], start, end, score, cols[6], cols[7], attrs,
            pa.array(fid, type=pa.string()),
            pa.array(parent, type=pa.string()),
            pa.array(name, type=pa.string()),
        ],
        schema=GFF3_SCHEMA,
    )


def read_gff3(paths):
    """GFF3 files as a typed Dataset."""
    import ray.data as rd

    return rd.read_text(paths).map_batches(gff3_lines_to_table, batch_format="pyarrow")


def gc_content(batch: pa.Table, seq_column: str = "sequence") -> pa.Table:
    """Per-sequence length + GC fraction (reference
    ``genome_loader.py:180-199``), vectorized via Arrow substring counts."""
    seq = batch[seq_column]
    upper = pc.utf8_upper(seq)
    length = pc.utf8_length(upper)
    g = pc.count_substring(upper, "G")
    c = pc.count_substring(upper, "C")
    gc = pc.divide(
        pc.add(g, c).cast(pa.float64()),
        pc.max_element_wise(length.cast(pa.float64()), 1.0),
    )
    out = batch.append_column("length", length.cast(pa.int64()))
    return out.append_column("gc_content", gc)
