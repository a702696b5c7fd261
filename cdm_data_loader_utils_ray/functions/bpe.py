"""Distributed byte-pair-encoding tokenizer training and encoding.

The classic LLM-tokenizer trainer (Sennrich et al. 2016): start from a
word -> symbol-sequence table, repeatedly merge the globally most frequent
adjacent symbol pair.  The scale shape:

* the corpus collapses to a WORD-FREQUENCY table first (one combiner
  fold) — every later round works on distinct words weighted by count,
  never on the corpus;
* each merge round is ONE distributed pass over the word table emitting
  per-batch (pair, weight) partials folded to the global argmax (pair
  space is vocab-sized, partials are batch-distinct — the standard
  combiner);
* the chosen merge applies vectorized per batch; rounds are BOUNDED by
  ``num_merges`` (bounded loops may materialize per round — the repo's
  graph-family rule).

Determinism: ties on pair frequency break lexicographically, so the
merge list is a pure function of the corpus.

``encode`` applies a trained merge list greedily in merge-priority order
— exactly the reference BPE apply — vectorized over the distinct-word
table and joined back to text via the word sequence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.functions.aggregates import grouped_partial_sums
from cdm_data_loader_utils_ray.functions.textstats import _flat_tokens, _lower_exact

END = "</w>"  # end-of-word marker (reference BPE convention)


def word_frequencies(ds, text_column: str = "text", batch_size: int = 4096):
    """Distinct-word -> count Dataset (the trainer's working set)."""

    def words(batch: pa.Table) -> pa.Table:
        texts = batch[text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, _off, _l, valid = _flat_tokens(
            _lower_exact(pc.fill_null(texts.cast(pa.string()), ""))
        )
        toks = flat.to_pandas()[valid]
        g = toks.value_counts()
        return pa.table(
            {
                "word": pa.array(g.index.to_numpy(), type=pa.string()),
                "n": pa.array(g.to_numpy(), type=pa.int64()),
            }
        )

    parts = ds.map_batches(words, batch_format="pyarrow", batch_size=batch_size)
    return grouped_partial_sums(parts, ["word"], {"n": "n"}, count_alias="__b")


def _split_word(w: str) -> list[str]:
    return list(w) + [END]


def _pair_counts(syms: pd.Series, weights: np.ndarray) -> pd.DataFrame:
    """Weighted adjacent-pair counts over a batch of symbol sequences —
    vectorized via one flat explode + shifted join."""
    lens = syms.str.len().to_numpy()
    if len(lens) == 0 or lens.sum() == 0:
        return pd.DataFrame({"a": [], "b": [], "w": []})
    flat = np.concatenate([np.asarray(s, dtype=object) for s in syms])
    row = np.repeat(np.arange(len(syms)), lens)
    # adjacent within the same row: positions i, i+1 with row[i] == row[i+1]
    same = row[:-1] == row[1:]
    a = flat[:-1][same]
    b = flat[1:][same]
    w = np.repeat(weights, lens)[:-1][same]
    df = pd.DataFrame({"a": a, "b": b, "w": w})
    return df.groupby(["a", "b"], sort=False)["w"].sum().reset_index()


def _apply_merge(syms: pd.Series, a: str, b: str) -> pd.Series:
    """Replace every adjacent (a, b) with the merged symbol, left to
    right (non-overlapping), per sequence."""
    ab = a + b

    def one(seq):
        out = []
        i, n = 0, len(seq)
        while i < n:
            if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        return out

    return syms.map(one)


def train_bpe(ds, text_column: str = "text", num_merges: int = 100,
              min_pair_count: int = 2):
    """Learn ``num_merges`` BPE merges over the corpus.  Returns the merge
    list ``[(a, b), ...]`` in priority order.

    Each round: distributed weighted pair-count partials over the
    distinct-word table -> driver argmax (pair space is tiny relative to
    the corpus) -> vectorized merge application -> re-materialize the
    word table.  Stops early when no pair reaches ``min_pair_count``.
    """
    wf = word_frequencies(ds, text_column).to_pandas()
    # driver-resident distinct-word table: the working set is VOCABULARY-
    # sized (not corpus-sized).  For a 100-TB corpus keep it as a Dataset
    # and run the same rounds distributed — the pair-count partials and
    # merge application above are already batch-local; this driver variant
    # is the readable reference the tests pin.
    syms = pd.Series([_split_word(w) for w in wf["word"]], dtype=object)
    weights = wf["n"].to_numpy(np.int64)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc_df = _pair_counts(syms, weights)
        if len(pc_df) == 0:
            break
        pc_df = pc_df.sort_values(
            ["w", "a", "b"], ascending=[False, True, True], kind="mergesort"
        )
        top = pc_df.iloc[0]
        if int(top["w"]) < min_pair_count:
            break
        a, b = str(top["a"]), str(top["b"])
        merges.append((a, b))
        syms = _apply_merge(syms, a, b)
    return merges


def train_bpe_distributed(ds, text_column: str = "text", num_merges: int = 100,
                          min_pair_count: int = 2, batch_size: int = 65536):
    """Same contract as :func:`train_bpe`, but the word table stays a
    Dataset: per round one ``map_batches`` pass emits weighted pair-count
    partials (vocab-sized), the driver folds + argmaxes, and the merge
    applies lazily to the next round's pass.  Rounds are bounded
    (``num_merges``), so the per-round materialize is within the repo's
    bounded-loop rule.  Bit-identical to the driver variant (ties break
    lexicographically on identical integer weights)."""
    import ray.data as rd  # noqa: F401  (Dataset ops only)

    wf = word_frequencies(ds, text_column)

    def to_syms(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "syms": [ _split_word(w) for w in df["word"] ],
                "n": df["n"].to_numpy(np.int64),
            }
        )

    table = wf.map_batches(to_syms, batch_format="pandas",
                           batch_size=batch_size).materialize()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            return _pair_counts(df["syms"], df["n"].to_numpy(np.int64))

        parts = table.map_batches(partial, batch_format="pandas").to_pandas()
        if len(parts) == 0:
            break
        folded = parts.groupby(["a", "b"], sort=False)["w"].sum().reset_index()
        folded = folded.sort_values(
            ["w", "a", "b"], ascending=[False, True, True], kind="mergesort"
        )
        top = folded.iloc[0]
        if int(top["w"]) < min_pair_count:
            break
        a, b = str(top["a"]), str(top["b"])
        merges.append((a, b))

        def apply(df: pd.DataFrame, _a=a, _b=b) -> pd.DataFrame:
            return pd.DataFrame(
                {"syms": _apply_merge(df["syms"], _a, _b),
                 "n": df["n"].to_numpy(np.int64)}
            )

        table = table.map_batches(apply, batch_format="pandas").materialize()
    return merges


def encode_words(words: pd.Series, merges: list[tuple[str, str]]) -> pd.Series:
    """Apply a trained merge list (priority order) to words -> token
    lists.  Greedy lowest-priority-first, the reference BPE apply."""
    rank = {m: i for i, m in enumerate(merges)}
    out = []
    for w in words:
        seq = _split_word(w)
        while len(seq) > 1:
            best, best_rank = None, None
            for i in range(len(seq) - 1):
                r = rank.get((seq[i], seq[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            a, b = seq[best], seq[best + 1]
            seq = _apply_merge(pd.Series([seq], dtype=object), a, b)[0]
        out.append(seq)
    return pd.Series(out, dtype=object)


def encode_dataset(ds, merges: list[tuple[str, str]],
                   text_column: str = "text", id_column: str = "doc_id",
                   batch_size: int = 4096):
    """Token counts per document under a trained BPE: ``(id, n_tokens)``.
    Tokenization + encode runs per batch; only the distinct WORDS of the
    batch are encoded (memoized), then counts map back to documents."""

    def enc(batch: pa.Table) -> pa.Table:
        texts = batch[text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, off, _l, valid = _flat_tokens(
            _lower_exact(pc.fill_null(texts.cast(pa.string()), ""))
        )
        toks = flat.to_pandas()
        row = np.repeat(np.arange(len(batch)), np.diff(off))[valid]
        toks = toks[valid]
        uniq = pd.Series(toks.unique())
        tok_len = encode_words(uniq, merges).map(len)
        lut = dict(zip(uniq, tok_len))
        per_word = toks.map(lut).to_numpy(np.int64)
        n_tok = np.bincount(row, weights=per_word, minlength=len(batch))
        return pa.table(
            {
                id_column: batch[id_column],
                "n_tokens": pa.array(n_tok.astype(np.int64)),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=batch_size)
