"""Paragraph-level exact dedup (the CCNet / C4 "line dedup" rule): drop
every paragraph whose exact text already occurred earlier in the corpus
(global order: (doc_id, paragraph index)), then reassemble each document
from its surviving paragraphs.  The classic web-corpus cleanup between
document-level exact dedup and substring-level span dedup
(``functions/substrings.py``) in granularity.

Beyond-reference training-data op; follows the substring family's
emit-losers shape: the dedup shuffle ships only (sha, doc_id, idx) — never
the paragraph text — and returns the LOSER coordinates, which subtract from
the paragraph table via the existing keyed anti-join.  All four stages are
vectorized Arrow/numpy; the only per-group work is a C-speed sort.

Scale shape for 100 TB:
  split          embarrassingly parallel, zero exchange
  loser detect   ONE hash-bucket shuffle of (hex sha256, doc_id, idx) rows
                 — ~80 bytes each, never the paragraph text
  subtract       anti_join_keys — one bucket shuffle per side on (doc, idx)
  reassemble     ONE doc-co-locating shuffle; ``pc.binary_join`` builds each
                 doc's text from its paragraph list without a Python loop

Two paragraph definitions:
  mode="newline"      split on a separator pattern (real corpora)
  mode="word_window"  fixed word-count windows — gives a SQL-reproducible
                      definition on corpora without line structure
                      (string_split + list slicing + array_to_string)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.stages.hashing import sha256_array
from cdm_data_loader_utils_ray.stages.keyed import _BUCKET, _add_bucket, anti_join_keys


def _repeat_take(col, counts: np.ndarray):
    """Repeat each element of an Arrow column counts[i] times (type-preserving)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return col.take(pa.array(idx, type=pa.int64()))


def split_paragraphs(
    ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    mode: str = "newline",
    window: int = 20,
    pattern: str = "\n",
    batch_size: int = 4096,
):
    """Docs -> one row per paragraph: (id, ``idx`` position within doc,
    ``ptext``).  Null texts drop (SQL: split(NULL) is NULL -> no rows).

    ``word_window`` reproduces exactly
    ``array_to_string(string_split(text,' ')[(i*W+1):(i*W+W)], ' ')``:
    split on the single-space literal (consecutive spaces yield empty
    words on both engines), slice W-word windows, rejoin with a space.
    The window slicing is pure offset arithmetic over the flattened word
    array — contiguous windows mean the list offsets ARE the window
    starts, and ``pc.binary_join`` emits every window text in one kernel.
    """
    if mode not in ("newline", "word_window"):
        raise ValueError(f"mode must be 'newline' or 'word_window', got {mode!r}")

    def split(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[text_column]))
        txt = pc.cast(batch[text_column], pa.string())
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        if mode == "newline":
            lists = pc.split_pattern(txt, pattern)
            counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
            ptext = pc.list_flatten(lists)
            total = int(counts.sum())
            within = (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts)
            )
        else:
            words = pc.split_pattern(txt, " ")
            nwords = np.asarray(pc.list_value_length(words), dtype=np.int64)
            flat = pc.list_flatten(words)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            counts = -(-nwords // window)  # ceil; nwords >= 1 (split("") == [""])
            total = int(counts.sum())
            within = (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts)
            )
            starts = np.repeat(np.cumsum(nwords) - nwords, counts) + within * window
            offsets = np.concatenate([starts, [int(nwords.sum())]])
            # large_list: int64 offsets never overflow on huge batches, and
            # binary_join(large_list<string>, string) joins in one kernel
            lists = pa.LargeListArray.from_arrays(
                pa.array(offsets, type=pa.int64()), flat
            )
            ptext = pc.binary_join(lists, " ")
        if isinstance(ptext, pa.ChunkedArray):
            ptext = ptext.combine_chunks()
        return pa.table(
            {
                id_column: _repeat_take(batch[id_column], counts),
                "idx": pa.array(within, type=pa.int64()),
                "ptext": ptext,
            }
        )

    return ds.map_batches(split, batch_format="pyarrow", batch_size=batch_size)


def duplicate_paragraph_losers(paras, id_column: str = "doc_id", num_buckets: int = 64):
    """(id, idx) of every paragraph occurrence EXCEPT the global first of
    its exact text — keep-first in (doc_id, idx) order, SQL
    ``row_number() OVER (PARTITION BY ptext ORDER BY doc_id, idx) > 1``.

    One shuffle; the exchange carries the sha256 of the text plus the two
    coordinates, not the text.  All occurrences of a text land in one
    bucket (bucket = hash of sha), so the winner decision is global.
    """

    def key(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                id_column: batch[id_column],
                "idx": batch["idx"],
                "__sha__": sha256_array(batch["ptext"]),
            }
        )
        return _add_bucket(t, ["__sha__"], num_buckets)

    keyed = paras.map_batches(key, batch_format="pyarrow")

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["__sha__", id_column, "idx"], kind="stable")
        lose = d["__sha__"].duplicated(keep="first")
        return d.loc[lose, [id_column, "idx"]]

    return keyed.groupby(_BUCKET).map_groups(losers, batch_format="pandas")


def assemble_paragraphs(
    kept,
    id_column: str = "doc_id",
    sep: str = " ",
    text_column: str = "text_dedup",
    num_buckets: int = 64,
):
    """(id, idx, ptext) -> (id, text) with paragraphs rejoined in idx order.
    One doc-co-locating shuffle; per bucket a C-speed sort builds run
    offsets and ``pc.binary_join`` emits every document text in one kernel.
    Documents with zero surviving paragraphs produce no row (SQL GROUP BY)."""

    def bucket(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch.select([id_column, "idx", "ptext"]),
                           [id_column], num_buckets)

    keyed = kept.map_batches(bucket, batch_format="pyarrow")

    def join(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([id_column, "idx"], kind="stable")
        ids = d[id_column].to_numpy()
        na = pd.isna(ids)
        first = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            # SQL GROUP BY: null ids form ONE document (null-null no boundary)
            first[1:] = (ids[1:] != ids[:-1]) & ~(na[1:] & na[:-1])
        offsets = np.concatenate([np.flatnonzero(first), [len(d)]])
        # large_string child: a doc-bucket can exceed 2 GiB of text at the
        # module's stated scale — 32-bit string offsets would overflow
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(d["ptext"].to_numpy(), type=pa.large_string()),
        )
        # separator width must match the child width for the kernel
        joined = pc.binary_join(lists, pa.scalar(sep, type=pa.large_string()))
        out_ids = pd.Series(ids[first])
        if na.any() and out_ids.dtype.kind == "f":
            # int64-with-nulls arrived as float64+NaN: emit nullable Int64 so
            # null-id buckets don't yield float ids that hash/bucket apart
            # from the int64 ids of null-free buckets (silent join misses)
            out_ids = out_ids.astype("Int64")
        return pd.DataFrame({id_column: out_ids, text_column: joined.to_pandas()})

    return keyed.groupby(_BUCKET).map_groups(join, batch_format="pandas")


def paragraph_dedup(
    docs,
    text_column: str = "text",
    id_column: str = "doc_id",
    mode: str = "newline",
    window: int = 20,
    pattern: str = "\n",
    sep: str | None = None,
    num_buckets: int = 64,
):
    """End-to-end corpus paragraph dedup: split -> detect losers -> subtract
    -> reassemble.  Returns (id, ``text_dedup``) for every document with at
    least one surviving paragraph.

    The paragraph table is built twice (once feeding the loser shuffle,
    once feeding the subtraction) — recomputing the embarrassingly-parallel
    split costs less at 100 TB than materializing the exploded corpus."""
    if sep is None:
        sep = " " if mode == "word_window" else pattern
    kw = dict(text_column=text_column, id_column=id_column, mode=mode,
              window=window, pattern=pattern)
    paras = split_paragraphs(docs, **kw)
    losers = duplicate_paragraph_losers(paras, id_column=id_column,
                                        num_buckets=num_buckets)
    kept = anti_join_keys(split_paragraphs(docs, **kw), losers,
                          [id_column, "idx"], num_buckets=num_buckets)
    return assemble_paragraphs(kept, id_column=id_column, sep=sep,
                               num_buckets=num_buckets)
