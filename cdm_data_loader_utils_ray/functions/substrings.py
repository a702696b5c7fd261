"""Substring-level duplicate detection: maximal duplicated character
k-gram spans across a corpus — the primitive behind substring-granular
training-data dedup (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better", public algorithm: their suffix-array dedup
marks exactly the substrings covered by a duplicated length-k window).

Document-level dedup (``functions/dedup.py``) drops whole near-identical
documents; this finds the duplicated PASSAGES — boilerplate headers,
license blocks, quoted text — inside otherwise-unique documents, as
``(doc_id, span_start, span_end)`` intervals the caller can cut or weigh.

Shape (two bucket shuffles, everything vectorized):

1. ``map_batches``: every k-byte window of every document is hashed by
   the batched Rabin-Karp prefix-sum kernel
   (``stages/hashing.char_window_hashes`` — one pass over the batch's
   concatenated utf-8 bytes, no per-row loop), emitting
   ``(gram_hash, doc_id, pos)`` rows, bucketed by gram hash.
2. per gram-bucket: a vectorized ``groupby(gram).transform('size')``
   keeps occurrences of grams seen ``>= min_count`` times in the corpus
   (a gram lives in exactly one bucket, so bucket counts are exact
   global counts); survivors re-bucket by document.
3. per doc-bucket: sort by (doc, pos); adjacent duplicated windows merge
   into maximal spans (gaps-and-islands — a window starting <= k bytes
   after its predecessor overlaps or abuts it, because all windows have
   length exactly k, so sorted starts give monotone ends and the running
   island test is just ``diff(pos) > k``).

Exactness: hashes are 61-bit polynomial fingerprints mod 2^61-1; two
different grams collide with probability ~n²/2^62 (vanishing for any
bucket's gram population; the same documented trade the hashed decontam
kernel makes).  Positions are 1-based BYTE offsets (== character offsets
for ASCII corpora), chosen so a SQL twin over ``substring(text, pos, k)``
reproduces spans bit-for-bit.

Scale: the stage-1 exchange carries one ~20-byte row per text byte — the
inherent cost of exact substring-level detection (Lee et al. pay the same
via distributed suffix arrays).  At 100 TB, shard the corpus and run
per-shard (duplicates within a shard; cross-shard boilerplate is caught
by any shard that holds two copies), or raise ``min_count`` with a
count-min prefilter.  Reference repo has no analogue (LLM-corpus family,
builder brief).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.functions.sketches import _hash64
from cdm_data_loader_utils_ray.stages.hashing import char_window_hashes

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def duplicate_spans(
    ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 24,
    min_count: int = 2,
    num_buckets: int = 64,
    doc_buckets: int = 64,
    anchor_mod: int = 1,
    merge_gap: int | None = None,
    emit: str = "all",
):
    """Dataset of ``(id_column, span_start, span_end)`` — maximal intervals
    of each document covered by at least one k-byte window that occurs
    ``>= min_count`` times corpus-wide.  ``span_start`` is 1-based,
    ``span_end`` exclusive (``span_end - span_start`` = span bytes).
    Documents shorter than ``k`` bytes (and null texts) emit nothing.

    ``emit`` selects the POLICY the spans encode, at zero extra shuffles
    (each gram's group already holds all its occurrences):

    * ``"all"`` (default) — every occurrence of duplicated content; with
      :func:`remove_spans` this is the aggressive strip-every-copy mode.
    * ``"losers"`` — keep-one-copy (Lee et al. semantics): per duplicated
      gram the globally-first occurrence (min ``(doc_id, pos)``) is
      withheld, so the emitted spans cover every copy EXCEPT the first —
      feed them to :func:`remove_spans` and exactly one copy of each
      duplicated block survives (aligned copies pick one consistent
      winner because every gram of the block ranks the same way; a gram
      shared between two *different* overlapping blocks can cost the
      later block one k-window — the same per-duplicated-substring
      granularity as the suffix-array formulation).

    ``anchor_mod > 1`` is the 100-TB knob: only windows whose hash is
    ``0 mod anchor_mod`` enter the exchange — content-defined anchor
    selection (the 0-mod-p fingerprinting of LBFS/rsync-style CDC, public
    algorithm), cutting stage-1 volume by ~``anchor_mod``x.  The SAME
    duplicated block selects the SAME anchors in every copy (selection is
    a function of content alone), so any shared region of ~``anchor_mod``
    or more windows is still found; detection becomes probabilistic only
    for shared regions shorter than the expected anchor gap, and reported
    spans cover the duplicated anchors rather than the exact extent.
    Pass ``merge_gap`` (default ``k``) >= ``k + anchor_mod`` in anchored
    mode so consecutive anchors of one duplicated block merge into one
    span."""
    import ray.data as rd

    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2 (got {min_count})")
    if anchor_mod < 1:
        raise ValueError(f"anchor_mod must be >= 1 (got {anchor_mod})")
    gap = k if merge_gap is None else int(merge_gap)
    if gap < k:
        raise ValueError(f"merge_gap must be >= k (got {merge_gap} < {k})")
    if emit not in ("all", "losers"):
        raise ValueError(f"emit must be 'all' or 'losers' (got {emit!r})")

    base = getattr(ds.schema(), "base_schema", None)
    if not isinstance(base, pa.Schema):
        raise TypeError("duplicate_spans needs a dataset with an Arrow schema")
    id_type = base.field(id_column).type
    proto = pa.table(
        {
            id_column: pa.array([], type=id_type),
            "span_start": pa.array([], type=pa.int64()),
            "span_end": pa.array([], type=pa.int64()),
        }
    )

    def windows(batch: pa.Table) -> pa.Table:
        texts = batch[text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        row_of, pos, h = char_window_hashes(texts, k)
        if anchor_mod > 1:
            # content-defined selection: mix first so the anchor predicate
            # is independent of the bucket assignment below
            sel = ((h * _GOLD) % np.uint64(anchor_mod)) == 0
            row_of, pos, h = row_of[sel], pos[sel], h[sel]
        # spread the P61 hash before the modulus (its low bits carry the
        # last bytes' contribution; fine, but mixing costs nothing)
        bucket = (((h * _GOLD) >> np.uint64(32)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                id_column: batch[id_column].take(pa.array(row_of)),
                "pos": pa.array(pos + 1, type=pa.int64()),
                "gram": pa.array(h, type=pa.uint64()),
                "__gbucket__": pa.array(bucket, type=pa.int32()),
            }
        )

    # Two NULL-id sentinel rows (their own bucket -1, identical gram so
    # they survive the >= min_count gate) ride the whole pipeline and are
    # filtered at the end.  They guarantee every groupby input is
    # NON-empty: Ray's map_groups over an all-empty upstream (an
    # all-unique corpus) short-circuits the fn and emits a COLUMN-LESS
    # pandas block that poisons the union's schema — and map_batches is
    # skipped on that block, so no downstream stage can repair it.
    sentinels = pa.table(
        {
            id_column: pa.nulls(2, id_type),
            "pos": pa.array([1, 1], type=pa.int64()),
            "gram": pa.array([0, 0], type=pa.uint64()),
            "__gbucket__": pa.array([-1, -1], type=pa.int32()),
        }
    )

    def dup_occurrences(t: pa.Table) -> pa.Table:
        # arrow in/out with index takes: the id column keeps its declared
        # type (a pandas round-trip would promote int64-with-null —
        # the sentinels — to float64 and split the block schemas)
        gram = t["gram"].to_numpy(zero_copy_only=False)
        g = pd.Series(gram)
        cnt = g.groupby(g, sort=False).transform("size").to_numpy()
        mask = cnt >= min_count
        if emit == "losers":
            # withhold each gram's globally-first occurrence: a gram lives
            # in exactly one bucket, so the per-bucket (gram, id, pos)-min
            # IS the global winner
            df = pd.DataFrame(
                {
                    "gram": gram,
                    "id": t[id_column].to_pandas(),
                    "pos": t["pos"].to_numpy(zero_copy_only=False),
                }
            )
            order = df.sort_values(
                ["gram", "id", "pos"], kind="stable"
            ).index.to_numpy()
            first_sorted = ~pd.Series(gram[order]).duplicated(keep="first").to_numpy()
            is_first = np.zeros(len(df), dtype=bool)
            is_first[order] = first_sorted
            mask &= ~is_first
        keep = np.flatnonzero(mask)
        hit = t.select([id_column, "pos"]).take(pa.array(keep))
        dbucket = (
            _hash64(hit[id_column].to_pandas()) % np.uint64(doc_buckets)
        ).astype(np.int32)
        return hit.append_column("__dbucket__", pa.array(dbucket, type=pa.int32()))

    def merge_spans(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "id": t[id_column].to_pandas(),
                "pos": t["pos"].to_numpy(zero_copy_only=False),
            }
        )
        order = df.sort_values(["id", "pos"], kind="stable").index.to_numpy()
        t2 = t.take(pa.array(order))
        ids = df["id"].to_numpy()[order]
        pos = df["pos"].to_numpy()[order]
        # island starts: doc change (nulls never merge — they are the
        # sentinels) or a gap wider than the merge tolerance (= one window
        # length exact; larger under anchor selection)
        change = np.ones(len(pos), dtype=bool)
        if len(pos) > 1:
            same_doc = pd.Series(ids[1:]).eq(pd.Series(ids[:-1])).to_numpy()
            change[1:] = ~same_doc | (pos[1:] - pos[:-1] > gap)
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(pos)) - 1
        return pa.table(
            {
                id_column: t2[id_column].take(pa.array(starts)),
                "span_start": pa.array(pos[starts], type=pa.int64()),
                "span_end": pa.array(pos[ends] + k, type=pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_valid(t[id_column]))

    spans = (
        rd.from_arrow(sentinels)
        .union(ds.map_batches(windows, batch_format="pyarrow"))
        .groupby("__gbucket__")
        .map_groups(
            lambda t: dup_occurrences(t.drop_columns(["__gbucket__"])),
            batch_format="pyarrow",
        )
        .groupby("__dbucket__")
        .map_groups(
            lambda t: merge_spans(t.drop_columns(["__dbucket__"])),
            batch_format="pyarrow",
        )
        .map_batches(finish, batch_format="pyarrow")
    )
    return rd.from_arrow(proto).union(spans)


def remove_spans(
    docs_ds,
    spans_ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    out_column: str | None = None,
    doc_buckets: int = 64,
):
    """Cut the given ``(id, span_start, span_end)`` intervals out of each
    document's text — the ACTION half of substring dedup (the detection
    half is :func:`duplicate_spans`).  Returns the docs dataset with
    ``out_column`` (default: ``<text_column>_dedup``) holding the text
    with every listed span removed; docs with no spans pass through with
    their text unchanged (and null text stays null).

    Removing ALL duplicated spans drops every copy of the duplicated
    bytes — the aggressive boilerplate-stripping mode.  To keep one copy,
    filter ``spans_ds`` first (e.g. anti-join a per-region keep-list);
    the cut itself is policy-free.

    Shape: both sides bucket by document id — one co-locating shuffle;
    inside a bucket the spans (few per doc by construction) sort and cut
    per doc, docs without spans take a vectorized passthrough.  Spans
    must be non-overlapping within a doc (``duplicate_spans`` output is,
    by the maximal-interval merge); overlapping input raises."""
    import ray.data as rd

    base = getattr(docs_ds.schema(), "base_schema", None)
    if not isinstance(base, pa.Schema):
        raise TypeError("remove_spans needs datasets with an Arrow schema")
    out_col = out_column or f"{text_column}_dedup"
    out_schema = base.append(pa.field(out_col, pa.string()))
    proto = out_schema.empty_table()

    # one shared exchange schema for BOTH sides (doc columns + span bounds
    # + routing): heterogeneous block schemas through one shuffle are
    # exactly the trap the proto/sentinel machinery above exists for
    union_schema = base
    for f in (pa.field("span_start", pa.int64()), pa.field("span_end", pa.int64())):
        if f.name not in union_schema.names:
            union_schema = union_schema.append(f)
    union_schema = union_schema.append(pa.field("__side__", pa.string()))

    from cdm_data_loader_utils_ray.stages.schema_align import align_to_schema

    def tag(side):
        def _t(batch: pa.Table) -> pa.Table:
            db = (
                _hash64(batch[id_column].to_pandas()) % np.uint64(doc_buckets)
            ).astype(np.int32)
            b = align_to_schema(batch, union_schema.remove(
                union_schema.get_field_index("__side__")))
            b = b.append_column("__side__", pa.array([side] * len(batch)))
            return b.append_column("__dbucket__", pa.array(db, type=pa.int32()))

        return _t

    doc_cols = list(base.names)

    def cut(t: pa.Table) -> pa.Table:
        side = np.asarray(t["__side__"].to_pandas() == "d")
        docs = t.filter(pa.array(side))
        spans = t.filter(pa.array(~side))
        n = len(docs)
        if n == 0:
            return proto
        text_arr = docs[text_column]
        if isinstance(text_arr, pa.ChunkedArray):
            text_arr = text_arr.combine_chunks()
        if len(spans) == 0:
            return docs.select(doc_cols).append_column(
                out_col, text_arr.cast(pa.string())
            )
        # VECTORIZED byte surgery over the bucket's docs: one keep-mask
        # over the concatenated utf-8 buffer (span coverage via +1/-1
        # deltas + cumsum), then the output string column is rebuilt
        # directly from (masked data, cumsum offsets) — no Python loop
        # over documents or bytes (a dup-saturated corpus cuts something
        # in EVERY doc, so this is a hot path).
        text_filled = pc.fill_null(text_arr.cast(pa.string()), "")
        off0 = text_filled.offset
        odt = np.int64 if pa.types.is_large_string(text_filled.type) else np.int32
        offs = np.frombuffer(
            text_filled.buffers()[1], dtype=odt, count=n + 1 + off0
        )[off0:]
        data = np.frombuffer(text_filled.buffers()[2], dtype=np.uint8)[
            offs[0] : offs[-1]
        ]
        offs = (offs - offs[0]).astype(np.int64)
        lens = np.diff(offs)
        total = len(data)

        # map each span to its doc's row(s) via an inner merge: orphan
        # spans (no such doc in this bucket) drop, and DUPLICATE doc ids
        # each receive the cut (a unique-index Series.map raised on them)
        ids_doc = pd.Series(docs[id_column].to_pandas())
        m = pd.DataFrame(
            {
                "__id__": pd.Series(spans[id_column].to_pandas()),
                "__s__": spans["span_start"].to_numpy(zero_copy_only=False),
                "__e__": spans["span_end"].to_numpy(zero_copy_only=False),
            }
        ).merge(
            pd.DataFrame({"__id__": ids_doc, "__row__": np.arange(n)}),
            on="__id__", how="inner",
        )
        rows = m["__row__"].to_numpy(dtype=np.int64)
        s0 = m["__s__"].to_numpy(dtype=np.int64) - 1
        e0 = m["__e__"].to_numpy(dtype=np.int64) - 1
        # clamp to the row (same as Python slicing) and detect overlap
        s0 = np.minimum(np.maximum(s0, 0), lens[rows])
        e0 = np.minimum(np.maximum(e0, s0), lens[rows])
        order = np.lexsort((s0, rows))
        r_s, s_s, e_s = rows[order], s0[order], e0[order]
        same = r_s[1:] == r_s[:-1]
        if np.any(same & (s_s[1:] < e_s[:-1])):
            bad = r_s[1:][same & (s_s[1:] < e_s[:-1])][0]
            raise ValueError(
                f"overlapping spans for {id_column}={ids_doc.iloc[int(bad)]!r}"
            )
        delta = np.zeros(total + 1, dtype=np.int64)
        np.add.at(delta, offs[rows] + s0, 1)
        np.add.at(delta, offs[rows] + e0, -1)
        covered = np.cumsum(delta[:-1]) > 0
        keep = ~covered
        new_data = data[keep]
        # exact per-row kept-byte counts from ONE cumsum — no reduceat:
        # its index clamp (min(offs, total-1)) truncated the LAST non-empty
        # doc's segment whenever trailing empty docs shared the bucket,
        # silently dropping that doc's final kept byte(s)
        csum = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(keep, out=csum[1:])
        kept_per_row = csum[offs[1:]] - csum[offs[:-1]]
        if len(new_data) >= (1 << 31):
            # the committed output schema is 32-bit string; fail loudly
            # (like the passthrough cast) instead of wrapping offsets —
            # raise doc_buckets so a bucket holds < 2 GiB of text
            raise ValueError(
                "remove_spans: a doc bucket holds >= 2 GiB of kept text; "
                "increase doc_buckets"
            )
        new_offs = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(kept_per_row, out=new_offs[1:])
        nulls = pc.is_null(text_arr)
        new_text = pa.StringArray.from_buffers(
            n,
            pa.py_buffer(new_offs.tobytes()),
            pa.py_buffer(new_data.tobytes()),
        )
        # null texts stay null (the mask was built over fill_null'd data)
        if text_arr.null_count:
            new_text = pc.if_else(nulls, pa.nulls(n, pa.string()), new_text)
        return docs.select(doc_cols).append_column(out_col, new_text)

    tagged = docs_ds.map_batches(tag("d"), batch_format="pyarrow").union(
        spans_ds.map_batches(tag("s"), batch_format="pyarrow")
    )
    cut_ds = tagged.groupby("__dbucket__").map_groups(
        lambda t: cut(t.drop_columns(["__dbucket__"])), batch_format="pyarrow"
    )
    return rd.from_arrow(proto).union(cut_ds)


def span_stats(spans_ds, id_column: str = "doc_id"):
    """Per-document rollup of :func:`duplicate_spans` output: number of
    duplicated spans and total duplicated bytes — the quantity substring-
    aware corpus weighting uses.  One combiner pass + one tiny shuffle."""
    from cdm_data_loader_utils_ray.functions.aggregates import grouped_partial_sums

    return grouped_partial_sums(
        spans_ds,
        [id_column],
        {"dup_bytes": "span_end - span_start"},
        count_alias="n_spans",
    )
