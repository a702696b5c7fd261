"""Token-window document chunking — the canonical training-data prep step
(context-window packing, embedding-passage extraction).

Each document's whitespace tokens (exact single-space ``split(' ')``
semantics, so any SQL engine's ``string_split(text, ' ')`` reproduces the
token list bit-for-bit) are cut into overlapping windows of ``size``
tokens every ``stride`` tokens.  A window starts at ``i * stride`` for
every ``i`` with ``i * stride < n_tokens`` (so a short doc yields exactly
one chunk, and no chunk is empty); the last window is allowed to be short.

Embarrassingly parallel: one ``flat_map``-shaped ``map_batches`` pass, no
shuffle — at 100 TB this runs at scan speed and the output streams straight
to a partitioned sink.  Output rows: ``(id, chunk_id, n_tokens,
chunk_text)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    size: int = 64,
    stride: int = 48,
    batch_size: int = 4096,
):
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def chunks(batch: pa.Table) -> pa.Table:
        ids_out: list = []
        cid_out: list[int] = []
        ntok_out: list[int] = []
        text_out: list[str] = []
        if len(batch):
            texts = batch[text_column]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            # ONE split kernel per batch; the python loop below only slices
            # and joins the per-doc token list (string assembly is inherent
            # to the output)
            lists = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
            off = lists.offsets.to_numpy().astype(np.int64)
            flat = lists.values.to_pylist()
            ids = batch[id_column].to_pylist()
            for r, doc_id in enumerate(ids):
                toks = flat[off[r]:off[r + 1]]
                n = len(toks)
                # n >= 1 always: ''.split(' ') == [''] in Python, DuckDB
                # string_split and pc.split_pattern agree, so even an
                # empty/null doc yields one (empty) chunk on every engine
                i = 0
                start = 0
                while start < n:
                    piece = toks[start:start + size]
                    ids_out.append(doc_id)
                    cid_out.append(i)
                    ntok_out.append(len(piece))
                    text_out.append(" ".join(piece))
                    i += 1
                    start = i * stride
        return pa.table(
            {
                id_column: pa.array(ids_out, type=batch[id_column].type),
                "chunk_id": pa.array(cid_out, type=pa.int64()),
                "n_tokens": pa.array(ntok_out, type=pa.int64()),
                "chunk_text": pa.array(text_out, type=pa.string()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow", batch_size=batch_size)
