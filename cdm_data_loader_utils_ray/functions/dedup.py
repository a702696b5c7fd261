"""Deduplication operators for large-scale training-data pipelines.

The reference only has exact dedup (seen-sets D2, ranking windows D3); these
extend it with the standard near-dup stack, each expressed Ray-Data-first:

* exact            — hash-partitioned first-per-key (one shuffle of (hash,id))
* MinHash + LSH    — shingle -> minhash -> band rows -> ``groupby(band)``
                     bucket candidates -> verified Jaccard -> connected
                     components via iterative min-label propagation
* SimHash          — 64-bit fingerprints, near-dup = small Hamming distance
                     within LSH-style chunks
* n-gram Jaccard   — exact verification kernel (used by the LSH verify step)
* embedding cosine — near-dup pairs above a cosine threshold via the
                     LSH-bucketed similarity path

Hot paths are vectorized (numpy bit tricks for minhash/simhash); per-row
Python only where a tokenizer inherently is (regex findall), compiled once
per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.stages.hashing import sha256_array

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def dedup_exact(ds, text_column: str = "text", id_column: str = "doc_id",
                num_buckets: int = 64, keep: str = "min"):
    """Exact content dedup: sha256(text) -> hash-partitioned keep-first
    (lowest id) per hash.  The shuffle carries only (hash, id, payload)."""
    from cdm_data_loader_utils_ray.stages.keyed import lww_latest

    def add_hash(batch: pa.Table) -> pa.Table:
        h = sha256_array(batch[text_column])
        out = batch.append_column("_content_hash", h)
        sign = -1 if keep == "min" else 1
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return out.append_column("_pref", pa.array(sign * ids, type=pa.int64()))

    deduped = lww_latest(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        ["_content_hash"],
        "_pref",
        num_buckets=num_buckets,
    )
    return deduped.drop_columns(["_pref", "_content_hash"])


# ---------------------------------------------------------------------------
# shingling + minhash (vectorized)
# ---------------------------------------------------------------------------
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of word k-shingles."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not joined:
        return np.zeros(1, dtype=np.uint64)
    return np.frombuffer(
        b"".join(__import__("hashlib").blake2b(s.encode(), digest_size=8).digest() for s in joined),
        dtype=np.uint64,
    )


class MinHasher:
    """Actor-state minhasher: permutation coefficients generated ONCE per
    actor in ``__init__`` (SURVEY §2.4 stateful-stage pattern)."""

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 42,
                 text_column: str = "text", id_column: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm, self.k = num_perm, k
        self.text_column, self.id_column = text_column, id_column

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.k)  # (s,)
        # (s, p) universal hashing mod Mersenne prime, vectorized
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.stack(
            [self.signature(t or "") for t in batch[self.text_column].to_pylist()]
        )
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1).astype(np.uint64)), self.num_perm
                ),
            }
        )


def _pool_size(requested: int | None) -> int:
    """Actor-pool size with headroom: BELOW the cluster CPU count — a pool
    that reserves every slot starves the downstream groupby's shuffle tasks
    and the pipeline deadlocks (observed on a 4-CPU session with a 4-actor
    pool)."""
    if requested is not None:
        return requested
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, min(8, cpus // 2 - 1 if cpus <= 8 else cpus // 4))


def minhash_lsh_candidates(ds, num_perm: int = 64, bands: int = 16, k: int = 3,
                           seed: int = 42, text_column: str = "text",
                           id_column: str = "doc_id", concurrency: int | None = None):
    concurrency = _pool_size(concurrency)
    """Candidate near-dup pairs: minhash signatures -> band rows ->
    ``groupby(band_id, band_hash)`` buckets -> pairs within bucket.

    ONE shuffle, and only (band_hash, id) rows move — never the text."""
    rows_per_band = num_perm // bands

    hasher_kwargs = dict(num_perm=num_perm, k=k, seed=seed,
                         text_column=text_column, id_column=id_column)

    class BandEmitter(MinHasher):
        def __init__(self):
            super().__init__(**hasher_kwargs)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_column].to_numpy(zero_copy_only=False)
            sigs = np.stack(
                [self.signature(t or "") for t in batch[text_column].to_pylist()]
            )  # (n, p)
            n = len(ids)
            banded = sigs.reshape(n, bands, rows_per_band)
            # hash each band slice to one uint64 (vectorized mix)
            mix = banded.astype(np.uint64)
            bh = np.zeros((n, bands), dtype=np.uint64)
            for r in range(rows_per_band):
                bh ^= mix[:, :, r] * np.uint64(0x9E3779B97F4A7C15)
                bh = (bh << np.uint64(7)) | (bh >> np.uint64(57))
            band_id = np.tile(np.arange(bands, dtype=np.int32), n)
            flat = bh.reshape(-1)
            # coarse shuffle bucket: map_groups fires once per GROUP, so
            # grouping by raw band_hash would mean one Python call per
            # bucket — group by hash%256 and pair-find vectorized inside
            return pa.table(
                {
                    id_column: pa.array(np.repeat(ids, bands)),
                    "band_id": pa.array(band_id),
                    "band_hash": pa.array(flat),
                    "shuffle_bucket": pa.array((flat % np.uint64(256)).astype(np.int32)),
                }
            )

    banded = ds.map_batches(BandEmitter, batch_format="pyarrow", concurrency=concurrency)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        # skip singleton buckets vectorized before the per-bucket loop
        df = df[df.duplicated(["band_id", "band_hash"], keep=False)]
        for (_b, _h), grp in df.groupby(["band_id", "band_hash"], sort=False):
            ids = np.sort(grp[id_column].to_numpy())
            for i in range(len(ids) - 1):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).drop_duplicates()

    # ONE shuffle over coarse buckets; real buckets resolved vectorized inside
    pairs = banded.groupby("shuffle_bucket").map_groups(
        lambda df: bucket_pairs(df.drop(columns=["shuffle_bucket"])),
        batch_format="pandas",
    )
    return pairs


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (verification kernel)."""
    sa, sb = set(shingle_hashes(a, k).tolist()), set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def verify_candidates(candidates_df: pd.DataFrame, texts: dict, threshold: float = 0.8,
                      k: int = 3) -> pd.DataFrame:
    """Verify candidate pairs with exact Jaccard.  ``texts`` is a broadcast
    id->text lookup (``ray.put`` on the driver for big corpora).  Shingle
    sets are computed once per document, not once per pair."""
    shingles: dict = {}

    def sh(i):
        if i not in shingles:
            shingles[i] = set(shingle_hashes(texts.get(i, ""), k).tolist())
        return shingles[i]

    keep_a, keep_b, sims = [], [], []
    for a, b in zip(candidates_df["id_a"], candidates_df["id_b"]):
        sa, sb = sh(a), sh(b)
        union = len(sa | sb)
        j = 1.0 if not union else len(sa & sb) / union
        if j >= threshold:
            keep_a.append(a)
            keep_b.append(b)
            sims.append(j)
    return pd.DataFrame({"id_a": keep_a, "id_b": keep_b, "jaccard": sims})


def connected_components(pairs: pd.DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                         max_iter: int = 50) -> pd.DataFrame:
    """Min-label propagation over the dup graph (driver-side numpy loop —
    the pair set is tiny relative to the corpus; for a huge pair set run the
    same propagation as iterated groupby-min joins)."""
    ids = pd.unique(pd.concat([pairs[id_a], pairs[id_b]]))
    label = {i: i for i in ids}
    for _ in range(max_iter):
        changed = False
        for a, b in zip(pairs[id_a], pairs[id_b]):
            ra, rb = label[a], label[b]
            m = min(ra, rb)
            if ra != m or rb != m:
                label[a] = label[b] = m
                changed = True
        if not changed:
            break
        # path compression
        for i in ids:
            while label[i] != label[label[i]]:
                label[i] = label[label[i]]
    return pd.DataFrame({"doc_id": list(label.keys()), "cluster": list(label.values())})


def minhash_dedup(ds, threshold: float = 0.8, num_perm: int = 64, bands: int = 16,
                  k: int = 3, seed: int = 42, text_column: str = "text",
                  id_column: str = "doc_id") -> pd.DataFrame:
    """Full near-dup pipeline -> cluster assignment DataFrame
    (doc_id, cluster); keep one representative per cluster to dedup."""
    cands = minhash_lsh_candidates(
        ds, num_perm=num_perm, bands=bands, k=k, seed=seed,
        text_column=text_column, id_column=id_column,
    ).to_pandas()
    if cands.empty:
        return pd.DataFrame({"doc_id": [], "cluster": []})
    # fetch texts for candidate ids only (targeted read, not a full collect)
    ids = set(cands["id_a"]) | set(cands["id_b"])

    def grab(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[id_column], value_set=pa.array(list(ids)))
        hit = batch.filter(mask)
        return hit.select([id_column, text_column])

    texts_tbl = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
    texts = dict(zip(texts_tbl[id_column], texts_tbl[text_column]))
    verified = verify_candidates(cands, texts, threshold=threshold, k=k)
    if verified.empty:
        return pd.DataFrame({"doc_id": [], "cluster": []})
    return connected_components(verified)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
class SimHasher:
    """64-bit simhash per document (vectorized bit-count accumulate)."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id"):
        self.text_column, self.id_column = text_column, id_column

    @staticmethod
    def simhash(text: str) -> np.uint64:
        sh = shingle_hashes(text, 1)  # unigram feature hashes
        bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        score = bits.sum(axis=0) * 2 - len(sh)
        out = np.uint64(0)
        for b in np.flatnonzero(score > 0):
            out |= np.uint64(1) << np.uint64(b)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = np.array(
            [self.simhash(t or "") for t in batch[self.text_column].to_pylist()],
            dtype=np.uint64,
        )
        return pa.table({self.id_column: batch[self.id_column], "simhash": pa.array(hashes)})


def simhash_near_dups(ds, max_hamming: int = 3, text_column: str = "text",
                      id_column: str = "doc_id", chunks: int = 4) -> pd.DataFrame:
    """Near-dup pairs by simhash: pigeonhole on ``chunks`` 16-bit chunks
    (a pair within ``max_hamming < chunks`` must share one exact chunk) ->
    groupby chunk value -> verify Hamming distance."""
    sh = ds.map_batches(
        SimHasher(text_column, id_column), batch_format="pyarrow"
    ).to_pandas()
    ids = sh[id_column].to_numpy()
    hs = sh["simhash"].to_numpy().astype(np.uint64)
    width = 64 // chunks
    mask = np.uint64((1 << width) - 1)
    seen_pairs: set[tuple] = set()
    out_a, out_b, dist = [], [], []
    for c in range(chunks):
        key = (hs >> np.uint64(c * width)) & mask
        df = pd.DataFrame({"k": key, "i": np.arange(len(ids))})
        for _k, grp in df.groupby("k", sort=False):
            idx = grp["i"].to_numpy()
            if len(idx) < 2:
                continue
            for x in range(len(idx) - 1):
                for y in range(x + 1, len(idx)):
                    i, j = idx[x], idx[y]
                    pair = (min(ids[i], ids[j]), max(ids[i], ids[j]))
                    if pair in seen_pairs:
                        continue
                    seen_pairs.add(pair)
                    d = bin(int(hs[i] ^ hs[j])).count("1")
                    if d <= max_hamming:
                        out_a.append(pair[0])
                        out_b.append(pair[1])
                        dist.append(d)
    return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": dist})


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------
def embedding_near_dups(ds, threshold: float = 0.95, n_planes: int = 12, seed: int = 42,
                        column: str = "embedding", id_column: str = "vec_id") -> pd.DataFrame:
    """Near-dup pairs by embedding cosine: LSH-bucket by hyperplane signs
    (``groupby`` bucket), exact cosine within buckets only."""
    from cdm_data_loader_utils_ray.functions.similarity import (
        _batch_matrix,
        lsh_signature,
        random_hyperplanes,
    )

    planes_holder = {}

    def add_sig(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, column)
        if "p" not in planes_holder:
            planes_holder["p"] = random_hyperplanes(m.shape[1], n_planes, seed)
        sig = lsh_signature(m, planes_holder["p"])
        return pa.table(
            {id_column: batch[id_column], column: batch[column], "bucket": pa.array(sig)}
        )

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        m = np.stack(df[column].to_numpy()).astype(np.float32)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = m @ m.T
        ids = df[id_column].to_numpy()
        iu, ju = np.triu_indices(len(ids), k=1)
        hits = cos[iu, ju] >= threshold
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[iu[hits]], ids[ju[hits]]),
                "id_b": np.maximum(ids[iu[hits]], ids[ju[hits]]),
                "cos_sim": np.round(cos[iu, ju][hits].astype(np.float64), 6),
            }
        )

    sigged = ds.map_batches(add_sig, batch_format="pyarrow")
    return (
        sigged.groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(subset=["id_a", "id_b"])
        .reset_index(drop=True)
    )
