"""Distributed TF-IDF: per-document top-k salient terms.

Training-data curation uses this for keyword extraction, topic-ish
clustering features and boilerplate detection.  Pipeline shape (all
Ray-Data-native, composed from this repo's primitives):

1. ``map_batches``: tokenize every doc (the shared vectorized ASCII-word
   kernel from :mod:`functions.textstats` — ONE regex split per batch) and
   emit exact ``(doc_id, term, tf)`` rows.  A document is one row, so term
   frequencies are complete within the batch — no combiner needed.
2. document frequency: one partial+final bucket groupby over the (doc,term)
   rows (``grouped_partial_sums`` shape) — the shuffle carries one partial
   row per (term, batch).
3. attach df to the term rows with the partitioned ``hash_join`` (both
   sides can be huge; the vocabulary of a 100-TB corpus does not fit a
   broadcast).
4. per-doc top-k: ``top_n_per_group`` ranking window (per-batch top-k
   combiner, one bucket shuffle).

Scoring is the LINEAR-idf variant ``tf * N / df`` (double), NOT
``tf * ln(N/df)``: integer-valued doubles through one IEEE multiply and one
IEEE divide are bit-identical in every engine, so the DuckDB oracle can
hash-match exact scores — libm ``log`` is not correctly rounded and may
differ across builds.  Linear idf is order-equivalent to log idf WITHIN a
term (monotone in tf, df) and a documented, deterministic choice across
terms.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.functions.aggregates import (
    grouped_partial_sums,
    top_n_per_group,
)
from cdm_data_loader_utils_ray.functions.textstats import _flat_tokens, _lower_exact
from cdm_data_loader_utils_ray.stages.keyed import hash_join

# per-call spill subdirs created by tfidf_top_terms; each is corpus-sized,
# so they must not accumulate across calls in a long-lived process — the
# result Dataset is lazy (consumers read the spill at execution time), so
# the earliest safe reclaim without caller cooperation is process exit.
_SPILL_DIRS: list[str] = []


def _cleanup_spill_dirs():
    import shutil

    while _SPILL_DIRS:
        shutil.rmtree(_SPILL_DIRS.pop(), ignore_errors=True)


def cleanup_spills():
    """Reclaim every spill subdirectory this process created.  Callers
    that have fully consumed their tfidf results can invoke this early;
    it also runs automatically at interpreter exit."""
    _cleanup_spill_dirs()


import atexit  # noqa: E402  (registration belongs next to the state it guards)

atexit.register(_cleanup_spill_dirs)


def doc_term_counts(ds, id_column: str = "doc_id", text_column: str = "text",
                    batch_size: int = 4096, include_doc_len: bool = False):
    """Exact ``(doc_id, term, tf)`` rows, one per distinct term per doc.

    ``include_doc_len`` adds a ``dl`` column (the doc's TOTAL token count,
    repeats included) to every row — computed during tokenization, so
    BM25's length normalization needs no second per-doc join."""

    def terms(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            cols = {id_column: batch[id_column],
                    "term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64())}
            if include_doc_len:
                cols["dl"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        texts = batch[text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, off, _tok_len, valid = _flat_tokens(_lower_exact(pc.fill_null(texts, "")))
        row_of_tok = np.repeat(np.arange(len(batch), dtype=np.int64), np.diff(off))
        toks = flat.to_pandas()  # flat token strings
        df = pd.DataFrame({"__row__": row_of_tok[valid], "term": toks[valid]})
        agg = df.groupby(["__row__", "term"], sort=False).size().rename("tf").reset_index()
        ids = batch[id_column].to_pandas()
        cols = {
            id_column: pa.array(ids.iloc[agg["__row__"]].to_numpy()),
            "term": pa.array(agg["term"].to_numpy(), type=pa.string()),
            "tf": pa.array(agg["tf"].to_numpy(), type=pa.int64()),
        }
        if include_doc_len:
            dl = np.bincount(row_of_tok[valid], minlength=len(batch)).astype(np.int64)
            cols["dl"] = pa.array(dl[agg["__row__"].to_numpy()], type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(terms, batch_format="pyarrow", batch_size=batch_size)


def tfidf_top_terms(ds, id_column: str = "doc_id", text_column: str = "text",
                    top_k: int = 3, num_buckets: int = 64,
                    spill_dir: str | None = None,
                    spill_threshold_docs: int = 2_000_000):
    """Top-``top_k`` terms per document by ``score = tf * N / df``.

    Returns a Dataset with columns ``(id, term, tf, df, score, rnk)``;
    ties broken by term ascending (total order -> deterministic ranks).

    The ``(doc, term, tf)`` intermediate has two consumers (the df
    aggregate and the join probe side), so it must be computed once.  For
    small corpora it is pinned in the object store (``materialize()``);
    above ``spill_threshold_docs`` documents — or whenever ``spill_dir`` /
    ``$CDM_TFIDF_SPILL_DIR`` is set — it is written once to Parquet and
    each consumer re-reads it as an independent *streaming* scan, so the
    term table (larger than the corpus itself at 100 TB) is never resident
    in the object store.  The spill directory outlives this call (the
    returned Dataset is lazy and both consumers read it at execution
    time); every per-call subdir is tracked and reclaimed at process
    exit, or earlier via :func:`cleanup_spills` once the result has been
    consumed.
    """
    n_docs = ds.count()
    terms = doc_term_counts(ds, id_column, text_column)
    spill = spill_dir or os.environ.get("CDM_TFIDF_SPILL_DIR")
    if spill is None and n_docs > spill_threshold_docs:
        spill = tempfile.mkdtemp(prefix="cdm_tfidf_terms_")
    if spill is not None:
        import ray.data as rd

        # Spill into a FRESH unique subdirectory per call: write_parquet
        # appends uniquely-named files, so reusing a non-empty directory
        # (e.g. a long-lived $CDM_TFIDF_SPILL_DIR across corpora) would
        # read stale term files from a previous call together with the new
        # spill and corrupt tf/df counts (r3 ADVICE fix).
        os.makedirs(spill, exist_ok=True)
        spill = tempfile.mkdtemp(prefix="terms_", dir=spill)
        _SPILL_DIRS.append(spill)  # reclaimed by cleanup_spills()/atexit
        terms.write_parquet(spill)
        terms = rd.read_parquet(spill)
    else:
        # df per term: (doc,term) rows are distinct per doc, so df = row
        # count.  materialize ONCE — two consumers (aggregate + join)
        # would otherwise recompute the tokenization
        terms = terms.materialize()
    df_ds = grouped_partial_sums(terms, ["term"], {}, count_alias="df")
    # hash_join reads declared Arrow schemas; the pandas-block output of
    # grouped_partial_sums must be coerced to Arrow blocks first
    df_ds = df_ds.map_batches(lambda t: t, batch_format="pyarrow")
    joined = hash_join(terms, df_ds, on=["term"], how="inner",
                       num_buckets=num_buckets)

    def score(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = tf * np.float64(n_docs) / dfv
        return batch.append_column("score", pa.array(s, type=pa.float64()))

    scored = joined.map_batches(score, batch_format="pyarrow")
    return top_n_per_group(
        scored, [id_column], "score", top_k, tiebreak=["term"],
        ascending=False, rank_column="rnk", num_buckets=num_buckets,
    )


def bm25_top_terms(ds, id_column: str = "doc_id", text_column: str = "text",
                   top_k: int = 3, k1: float = 1.2, b: float = 0.75,
                   num_buckets: int = 64,
                   spill_dir: str | None = None,
                   spill_threshold_docs: int = 2_000_000):
    """Top-``top_k`` terms per document by Okapi BM25 (Lucene IDF variant):

        idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
        score = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

    Same spill-or-materialize shape as :func:`tfidf_top_terms` — the
    ``(doc, term, tf, dl)`` intermediate is computed ONCE and read by its
    three consumers (Σdl scalar fold, df aggregate, join probe); ``dl``
    rides along from tokenization so length normalization needs no second
    per-doc join, and df joins DISTRIBUTED (never a vocab-sized driver
    collect).  Every float op is a pinned-expression evaluation over
    exact integer inputs (ln on identical doubles — the surprisal/PMI
    precedent), so the scores are bit-identical to a SQL twin.
    """
    n_docs = ds.count()
    terms = doc_term_counts(ds, id_column, text_column, include_doc_len=True)
    spill = spill_dir or os.environ.get("CDM_TFIDF_SPILL_DIR")
    if spill is None and n_docs > spill_threshold_docs:
        spill = tempfile.mkdtemp(prefix="cdm_bm25_terms_")
    if spill is not None:
        import ray.data as rd

        os.makedirs(spill, exist_ok=True)
        spill = tempfile.mkdtemp(prefix="terms_", dir=spill)
        _SPILL_DIRS.append(spill)
        terms.write_parquet(spill)
        terms = rd.read_parquet(spill)
    else:
        terms = terms.materialize()
    # Σdl (global token count) via one-row scalar partials — never a
    # vocab-sized driver collect (the term dictionary is huge at 100 TB);
    # df stays a Dataset and joins distributed, exactly like tfidf
    totals = terms.map_batches(
        lambda t: pa.table(
            {"s": pa.array([int(np.sum(t["tf"].to_numpy(zero_copy_only=False)))],
                           type=pa.int64())}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    total_tokens = int(totals["s"].sum())
    df_ds = grouped_partial_sums(terms, ["term"], {}, count_alias="df")
    df_ds = df_ds.map_batches(lambda t: t, batch_format="pyarrow")
    joined = hash_join(terms, df_ds, on=["term"], how="inner",
                       num_buckets=num_buckets)
    N = int(n_docs)
    k1f, bf = float(k1), float(b)

    def score(batch: pa.Table) -> pa.Table:
        dfv = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        # expression order pinned to the SQL twin, term by term
        ratio = (dl * N).astype(np.float64) / np.float64(total_tokens)
        denom = tf.astype(np.float64) + k1f * (1.0 - bf + bf * ratio)
        idf = np.log(1.0 + ((N - dfv).astype(np.float64) + 0.5) / (dfv.astype(np.float64) + 0.5))
        s = idf * (tf.astype(np.float64) * (k1f + 1.0)) / denom
        return pa.table(
            {
                id_column: batch[id_column],
                "term": batch["term"],
                "tf": pa.array(tf, type=pa.int64()),
                "df": pa.array(dfv, type=pa.int64()),
                "score": pa.array(s, type=pa.float64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    return top_n_per_group(
        scored, [id_column], "score", top_k, tiebreak=["term"],
        ascending=False, rank_column="rnk", num_buckets=num_buckets,
    )
