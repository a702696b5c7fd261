"""FASTA source (reference ``parsers/fasta.py:10-44``): optionally gzipped,
one record per ``>`` header, custom header-split hook ``h_func``.

Ray-native: ``read_binary_files`` (one file per task, gzip detected by
magic bytes) -> ``map_batches`` parser emitting Arrow rows
``(id, description, sequence, length, _source_file)``.
"""

from __future__ import annotations

import gzip
from collections.abc import Callable

import pyarrow as pa

FASTA_SCHEMA = pa.schema(
    [
        pa.field("id", pa.string(), nullable=False),
        pa.field("description", pa.string(), nullable=True),
        pa.field("sequence", pa.string(), nullable=False),
        pa.field("length", pa.int64(), nullable=False),
        pa.field("_source_file", pa.string(), nullable=True),
    ]
)


def default_header_split(header: str, split_char: str = " ") -> tuple[str, str | None]:
    """Reference default: id = first token, description = the rest."""
    parts = header.split(split_char, 1)
    return parts[0], (parts[1] if len(parts) > 1 else None)


class FastaParser:
    """``map_batches`` callable over ``read_binary_files`` batches."""

    def __init__(
        self,
        h_func: Callable[[str], tuple[str, str | None]] | None = None,
        split_char: str = " ",
    ):
        self.h_func = h_func or (lambda h: default_header_split(h, split_char))

    def parse_bytes(self, payload: bytes, path: str = "") -> pa.Table:
        if payload[:2] == b"\x1f\x8b":
            payload = gzip.decompress(payload)
        text = payload.decode("utf-8", errors="replace")
        ids, descs, seqs = [], [], []
        header: str | None = None
        chunks: list[str] = []
        for line in text.splitlines():
            if line.startswith(">"):
                if header is not None:
                    i, d = self.h_func(header)
                    ids.append(i)
                    descs.append(d)
                    seqs.append("".join(chunks))
                header = line[1:].strip()
                chunks = []
            elif line:
                chunks.append(line.strip())
        if header is not None:
            i, d = self.h_func(header)
            ids.append(i)
            descs.append(d)
            seqs.append("".join(chunks))
        lengths = [len(s) for s in seqs]
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.string()),
                pa.array(descs, type=pa.string()),
                pa.array(seqs, type=pa.string()),
                pa.array(lengths, type=pa.int64()),
                pa.array([path] * len(ids), type=pa.string()),
            ],
            schema=FASTA_SCHEMA,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist() if "path" in batch.column_names else [""] * len(batch)
        tables = [
            self.parse_bytes(b, p) for b, p in zip(batch["bytes"].to_pylist(), paths)
        ]
        return pa.concat_tables(tables) if tables else FASTA_SCHEMA.empty_table()


def read_fasta(paths, h_func=None, split_char: str = " "):
    """Reference ``read_fasta`` / ``extract_features`` as a Dataset."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)
    return files.map_batches(FastaParser(h_func, split_char), batch_format="pyarrow")
