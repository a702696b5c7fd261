"""Benchmark decontamination: flag training documents that share any word
k-gram with a held-out / benchmark set — the standard guard against test
leakage in training corpora.

Shape (all Ray-Data-native, one shuffle):

1. both sides are shingled to DISTINCT string k-grams per document with
   the shared vectorized flat-token kernel (shifted pandas concat; the
   same tokenizer and the same short-doc convention as the minhash family:
   fewer than k tokens -> one whole-doc gram);
2. tagged union, ONE hash-bucket shuffle on the gram: each bucket does a
   vectorized semi-join (train grams ∩ bench grams) and emits per-doc hit
   partials;
3. a tiny second groupby sums partials per doc — exact, because a gram
   lives in exactly one bucket and grams are distinct within a doc.

String grams keep the operator SQL-oracle-checkable bit-for-bit; for a
100-TB corpus pass ``hashed=True`` to swap in the hashed-shingle kernel
from :mod:`functions.dedup` — the identical pipeline shape over 8-byte
uint64 grams instead of strings, so the shuffle carries ~an order of
magnitude fewer bytes per gram.  The hashed path is exact up to 64-bit
hash collisions (same tokenizer, same short-/empty-doc conventions:
whole-doc gram below ``k`` tokens, sentinel gram for zero-token docs);
a pytest asserts row-identical output vs the string path on mixed-length
fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.functions.dedup import _batch_shingles
from cdm_data_loader_utils_ray.functions.textstats import (
    _flat_tokens,
    _lower_exact,
    shifted_word_ngrams,
)
from cdm_data_loader_utils_ray.stages.keyed import _add_bucket


def _doc_grams(ids, texts, k: int) -> pd.DataFrame:
    """(id, gram) rows, grams DISTINCT per doc.  Vectorized: one tokenize
    kernel + (k-1) shifted concats; only the short-doc fallback (< k
    tokens -> whole-doc join) touches a per-row path, on those rows only."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    flat, off, _l, valid = _flat_tokens(_lower_exact(pc.fill_null(texts, "")))
    keep = np.flatnonzero(valid)
    toks = flat.to_pandas().iloc[keep].reset_index(drop=True)
    row_of = np.repeat(np.arange(len(off) - 1), np.diff(off))[keep]
    n_tok = np.bincount(row_of, minlength=len(off) - 1)
    ids_pd = ids.to_pandas()

    frames = []
    long_rows = n_tok >= k
    if long_rows.any() and len(toks) >= k:
        g, sel = shifted_word_ngrams(toks, row_of, k)
        frames.append(
            pd.DataFrame({"__row__": row_of[sel], "gram": g[sel].to_numpy()})
        )
    short = np.flatnonzero(~long_rows)
    if len(short):
        joined = (
            pd.DataFrame({"__row__": row_of, "tok": toks.to_numpy()})
            .loc[np.isin(row_of, short)]
            .groupby("__row__", sort=False)["tok"]
            .agg(" ".join)
        )
        sf = joined.rename("gram").reset_index()
        # rows with zero valid tokens produce the empty gram, matching
        # array_to_string([], ' ') = ''
        empty = np.setdiff1d(short, sf["__row__"].to_numpy())
        frames.append(sf)
        if len(empty):
            frames.append(pd.DataFrame({"__row__": empty, "gram": ""}))
    if not frames:
        return pd.DataFrame({"id": [], "gram": []})
    out = pd.concat(frames, ignore_index=True).drop_duplicates(["__row__", "gram"])
    return pd.DataFrame(
        {"id": ids_pd.iloc[out["__row__"]].to_numpy(), "gram": out["gram"].to_numpy()}
    )


def _doc_gram_hashes(ids, texts, k: int) -> pd.DataFrame:
    """(id, gram) rows with DISTINCT uint64 hashed grams per doc — the
    100-TB variant of :func:`_doc_grams`, built on the dedup family's
    vectorized rolling-FNV shingle kernel.  Same conventions: fewer than
    ``k`` tokens -> one whole-doc gram; zero tokens -> one sentinel gram
    (empty docs match each other, like the ``''`` string gram)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    flat, off = _batch_shingles(texts.to_pylist(), cache={}, k=k)
    row_of = np.repeat(np.arange(len(off) - 1), np.diff(off))
    ids_pd = ids.to_pandas()
    return pd.DataFrame(
        {"id": ids_pd.iloc[row_of].to_numpy(), "gram": flat}
    )


def contaminated_docs(
    train_ds,
    bench_ds,
    k: int = 8,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_buckets: int = 64,
    batch_size: int = 4096,
    hashed: bool = False,
):
    """Training docs sharing >= 1 word-``k``-gram with any benchmark doc.
    Returns a Dataset of ``(id_column, n_hits)`` — n_hits = number of
    distinct contaminated grams in the doc.  ``hashed=True`` selects the
    8-byte-gram scale path (see module docstring)."""

    def grams_of(side: str):
        def f(batch: pa.Table) -> pa.Table:
            if hashed:
                df = _doc_gram_hashes(batch[id_column], batch[text_column], k)
            else:
                df = _doc_grams(batch[id_column], batch[text_column], k)
            if side == "b":
                df = df[["gram"]].drop_duplicates()
                df["__side__"] = side
                # typed nulls matching THIS corpus's id dtype: an int64
                # sentinel here made the union's schemas unmergeable for
                # string doc ids (bench ids never surface either way)
                t = pa.Table.from_pandas(df[["gram", "__side__"]],
                                         preserve_index=False)
                t = t.add_column(
                    0, "id", pa.nulls(len(t), batch[id_column].type)
                )
            else:
                df["__side__"] = side
                t = pa.Table.from_pandas(df[["id", "gram", "__side__"]],
                                         preserve_index=False)
            if hashed:
                # avalanched uint64 grams are already uniform — bucket by
                # modulo instead of re-hashing the key column
                b = (df["gram"].to_numpy() % np.uint64(num_buckets)).astype(
                    np.int32
                )
                return t.append_column("__bucket__", pa.array(b))
            return _add_bucket(t, ["gram"], num_buckets)

        return f

    tagged = train_ds.map_batches(
        grams_of("t"), batch_format="pyarrow", batch_size=batch_size
    ).union(
        bench_ds.map_batches(grams_of("b"), batch_format="pyarrow",
                             batch_size=batch_size)
    )

    def bucket_hits(df: pd.DataFrame) -> pd.DataFrame:
        bench = df.loc[df["__side__"] == "b", ["gram"]].drop_duplicates()
        tr = df[df["__side__"] == "t"]
        m = tr.merge(bench.assign(__hit__=1), on="gram", how="inner")
        if m.empty:
            return pd.DataFrame({"id": pd.Series([], dtype=tr["id"].dtype),
                                 "n_hits": pd.Series([], dtype="int64")})
        out = m.groupby("id", sort=False).size().rename("n_hits").reset_index()
        return out

    partials = tagged.groupby("__bucket__").map_groups(
        bucket_hits, batch_format="pandas"
    )

    def rebucket(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, ["id"], num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop(columns=["__bucket__"]).groupby("id", sort=False)["n_hits"].sum()
        out = g.reset_index().rename(columns={"id": id_column})
        out["n_hits"] = out["n_hits"].astype("int64")
        return out

    return (
        partials.map_batches(rebucket, batch_format="pyarrow")
        .groupby("__bucket__")
        .map_groups(final, batch_format="pandas")
    )


def source_overlap_matrix(
    docs_ds,
    source_col: str = "source",
    text_column: str = "text",
    k: int = 8,
    num_buckets: int = 64,
    batch_size: int = 4096,
    hashed: bool = False,
) -> pd.DataFrame:
    """Pairwise cross-source contamination matrix: for each unordered
    source pair, the number of DISTINCT word ``k``-grams appearing in both
    sources' documents — the corpus-level view of :func:`contaminated_docs`
    (which benchmark leaked into which crawl, pre-mixing).

    Same one-shuffle shape: per-batch distinct (source, gram) via the
    shared shingle kernel, ONE gram-bucket shuffle whose kernel both
    finishes the global distinct (all copies of a gram co-locate) and
    emits the per-gram source pairs (``<= n_sources`` rows per gram, pair
    emission via the ordered run kernel), then an n_sources^2-bounded
    driver fold.  Null sources are dropped (SQL join semantics).
    ``hashed=True`` swaps in the 8-byte-gram kernel for corpus scale."""
    from cdm_data_loader_utils_ray.functions.graph import within_group_pairs

    def grams(batch: pa.Table) -> pa.Table:
        tb = batch.filter(pc.is_valid(batch[source_col]))
        if hashed:
            df = _doc_gram_hashes(tb[source_col], tb[text_column], k)
        else:
            df = _doc_grams(tb[source_col], tb[text_column], k)
        df = df.drop_duplicates(["id", "gram"]).rename(columns={"id": "src"})
        t = pa.Table.from_pandas(df[["src", "gram"]], preserve_index=False)
        if hashed:
            b = (df["gram"].to_numpy() % np.uint64(num_buckets)).astype(np.int32)
            return t.append_column("__bucket__", pa.array(b))
        return _add_bucket(t, ["gram"], num_buckets)

    _empty = pd.DataFrame(
        {
            "source_a": pd.Series(dtype="object"),
            "source_b": pd.Series(dtype="object"),
            "c": pd.Series(dtype="int64"),
        }
    )

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "gram" not in df.columns:
            return _empty.copy()
        d = (
            df.drop_duplicates(["src", "gram"])  # global distinct: gram-local
            .sort_values(["gram", "src"], kind="mergesort")
        )
        src = d["src"].to_numpy()
        a_idx, b_idx = within_group_pairs(src, d["gram"].to_numpy())
        if len(a_idx) == 0:
            return _empty.copy()
        w = pd.DataFrame({"source_a": src[a_idx], "source_b": src[b_idx]})
        return w.groupby(["source_a", "source_b"], sort=False).size().rename(
            "c"
        ).reset_index()

    parts = (
        docs_ds.map_batches(grams, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__bucket__")
        .map_groups(pair_bucket, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame(
            {
                "source_a": pd.Series(dtype="object"),
                "source_b": pd.Series(dtype="object"),
                "n_shared": pd.Series(dtype="int64"),
            }
        )
    out = (
        parts.groupby(["source_a", "source_b"], sort=True)["c"]
        .sum()
        .rename("n_shared")
        .reset_index()
    )
    out["n_shared"] = out["n_shared"].astype("int64")
    return out
