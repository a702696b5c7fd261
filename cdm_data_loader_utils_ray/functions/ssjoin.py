"""Exact set-similarity self-join (Jaccard >= t) with PREFIX FILTERING —
the PPJoin-family complement of the MinHash/SimHash near-dup operators:
those are probabilistic candidate generators; this returns EXACTLY the
pairs at or above the threshold, no recall tuning.

Algorithm (one global df fold + one token-bucket shuffle):

1. tokenize to DISTINCT (doc, token); fold global token frequencies and
   broadcast a rarest-first rank per token (the ranks table must be
   broadcastable — hash the tokens to 8-byte ids upstream when a corpus'
   vocabulary is too large, as functions/decontam does);
2. per doc, sort its tokens by rank; the PREFIX is the first
   ``p = n - ceil(t * n) + 1`` tokens.  Pigeonhole guarantee: two sets
   with Jaccard >= t overlap in more than ``n - p`` tokens, so they MUST
   share at least one prefix token — scanning only prefix-token buckets
   loses nothing;
3. bucket by prefix token; within a bucket, verify all doc pairs sharing
   the token with EXACT intersection counts (dense 0/1 matmul over the
   bucket-local vocabulary when it is small, run-batched sorted-array
   intersections otherwise — the simhash pair-loop convention);
4. one pair-bucket fold dedups pairs found via multiple shared prefix
   tokens, then the integer threshold test ``100*i >= t100*(na+nb-i)``
   keeps the exact-Jaccard winners (no float compare — both engines
   agree bit-for-bit).

Scale notes: cost is bounded by candidate pairs per prefix-token bucket.
Rarest-first prefixes keep high-df stopwords OUT of prefixes on natural
corpora; a template-generated tiny-vocabulary corpus (the sf test data)
degenerates toward all-pairs — that is a property of the data, the
operator itself prunes wherever the vocabulary allows.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.functions.aggregates import grouped_partial_sums
from cdm_data_loader_utils_ray.stages.keyed import _BUCKET, _add_bucket

_TOKEN_RE = r"[0-9A-Za-z_]+"


def _doc_tokens(df: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    """DISTINCT (doc, token) rows, lowercase word tokens."""
    s = df[text_col].fillna("").str.lower().str.findall(_TOKEN_RE)
    n = s.str.len().to_numpy()
    out = pd.DataFrame(
        {
            id_col: np.repeat(df[id_col].to_numpy(), n),
            "token": np.concatenate(s.to_numpy()) if n.sum() else np.array([], dtype=object),
        }
    )
    return out.drop_duplicates([id_col, "token"])


def ssjoin_jaccard(
    ds,
    id_col: str,
    text_col: str,
    threshold_pct: int = 90,
    num_buckets: int = 64,
    dense_vocab_limit: int = 8192,
):
    """All doc pairs with token-set Jaccard >= threshold_pct/100, exact.

    Returns a pandas DataFrame (pair results are aggregate-shaped after
    the threshold) with columns (id_a, id_b, inter, uni, jaccard)."""
    import ray

    t100 = int(threshold_pct)

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        return _doc_tokens(df, id_col, text_col)

    tok = ds.map_batches(toks, batch_format="pandas").materialize()

    # global df fold -> rarest-first ranks (broadcast once)
    dfreq = grouped_partial_sums(tok, ["token"], {}, count_alias="df").to_pandas()
    dfreq = dfreq.sort_values(["df", "token"], kind="mergesort").reset_index(drop=True)
    rank_of = dict(zip(dfreq["token"], range(len(dfreq))))
    rank_ref = ray.put(rank_of)

    def prefix_emit(df: pd.DataFrame) -> pd.DataFrame:
        """One row per (prefix-rank, doc): carries the doc's full sorted
        rank array (as a list) and its size.  Tokenizes from the ORIGINAL
        doc rows — one input row is one whole document, so a doc's token
        set can never straddle a batch boundary (the exploded token table
        re-batches at arbitrary row counts and would split docs)."""
        empty = pd.DataFrame(
            {"r": pd.Series(dtype="int64"), "doc": pd.Series(dtype="int64"),
             "ranks": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
        )
        if len(df) == 0:
            return empty
        lut = ray.get(rank_ref)
        toks_per_doc = df[text_col].fillna("").str.lower().str.findall(_TOKEN_RE)
        rows_r, rows_d, rows_l, rows_n = [], [], [], []
        for doc, tokens in zip(df[id_col].to_numpy(), toks_per_doc.to_numpy()):
            if not tokens:
                continue
            ranks = np.unique(np.fromiter((lut[t] for t in tokens), dtype=np.int64))
            n = len(ranks)
            p = n - math.ceil(t100 * n / 100.0) + 1
            for r in ranks[: max(p, 1)]:
                rows_r.append(int(r))
                rows_d.append(doc)
                rows_l.append(ranks)
                rows_n.append(n)
        if not rows_r:
            return empty
        return pd.DataFrame({"r": rows_r, "doc": rows_d, "ranks": rows_l, "n": rows_n})

    def bucket(df: pd.DataFrame) -> pa.Table:
        t = pa.Table.from_pandas(df, preserve_index=False)
        return _add_bucket(t, ["r"], num_buckets)

    emitted = ds.map_batches(prefix_emit, batch_format="pandas").map_batches(
        bucket, batch_format="pandas"
    )

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "i": pd.Series(dtype="int64"), "na": pd.Series(dtype="int64"),
             "nb": pd.Series(dtype="int64")}
        )
        if len(df) < 2:
            return empty
        out = []
        for r, g in df.groupby("r", sort=False):
            g = g.drop_duplicates("doc")
            if len(g) < 2:
                continue
            docs = g["doc"].to_numpy()
            # arrow round-trips the list column as ndarray-or-list objects
            lists = [np.asarray(l, dtype=np.int64) for l in g["ranks"]]
            sizes = g["n"].to_numpy(np.int64)
            local = np.unique(np.concatenate(lists))
            if len(local) <= dense_vocab_limit:
                # dense 0/1 matmul: intersections for ALL pairs at once
                M = np.zeros((len(docs), len(local)), dtype=np.int32)
                for i, l in enumerate(lists):
                    M[i, np.searchsorted(local, l)] = 1
                inter = M @ M.T
                ia, ib = np.triu_indices(len(docs), k=1)
                out.append(pd.DataFrame(
                    {"a": docs[ia], "b": docs[ib], "i": inter[ia, ib],
                     "na": sizes[ia], "nb": sizes[ib]}))
            else:
                # run-batched sorted intersections (rare: huge local vocab)
                for i in range(len(docs)):
                    li = lists[i]
                    for j in range(i + 1, len(docs)):
                        c = np.intersect1d(li, lists[j], assume_unique=True)
                        out.append(pd.DataFrame(
                            {"a": [docs[i]], "b": [docs[j]], "i": [len(c)],
                             "na": [sizes[i]], "nb": [sizes[j]]}))
        if not out:
            return empty
        cand = pd.concat(out, ignore_index=True)
        swap = cand["a"] > cand["b"]
        cand.loc[swap, ["a", "b", "na", "nb"]] = cand.loc[
            swap, ["b", "a", "nb", "na"]
        ].to_numpy()
        # integer threshold test — survivors only; duplicates (pair shares
        # several prefix tokens) collapse in the final fold
        keep = 100 * cand["i"].to_numpy(np.int64) >= t100 * (
            cand["na"].to_numpy(np.int64) + cand["nb"].to_numpy(np.int64)
            - cand["i"].to_numpy(np.int64)
        )
        return cand[keep]

    pairs = (
        emitted.groupby(_BUCKET)
        .map_groups(verify_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        return pd.DataFrame(
            columns=["id_a", "id_b", "inter", "uni", "jaccard"]
        ).astype({"id_a": "int64", "id_b": "int64", "inter": "int64",
                  "uni": "int64", "jaccard": "float64"})
    pairs = pairs.drop_duplicates(["a", "b"]).reset_index(drop=True)
    uni = pairs["na"] + pairs["nb"] - pairs["i"]
    out = pd.DataFrame(
        {
            "id_a": pairs["a"].astype("int64"),
            "id_b": pairs["b"].astype("int64"),
            "inter": pairs["i"].astype("int64"),
            "uni": uni.astype("int64"),
            "jaccard": (pairs["i"].to_numpy(np.float64) / uni.to_numpy(np.float64)),
        }
    )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
