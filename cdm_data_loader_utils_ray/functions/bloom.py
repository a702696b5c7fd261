"""Bloom-prefiltered anti-join — the 100-TB path for "subtract this
keyset" (reference ``snapshot_utils.py:16-31`` left-anti semantics at a
scale where shuffling the whole left side is the bottleneck).

:func:`stages.keyed.anti_join_keys` is exact but ships EVERY left row
through the keyed shuffle.  Here the right side's keys are folded into a
fixed-size Bloom bitset first (per-batch partial bitsets OR-merged — the
combiner discipline; bytes moved are O(batches x bitset), independent of
row count), the bitset is broadcast once via ``ray.put``, and the left
scan probes it in ``map_batches``:

* definite non-members (any probe bit clear — Bloom has NO false
  negatives) are final output the moment the map stage sees them; they
  never enter a shuffle.  The provided ``partial``/``final`` aggregation
  hooks let them collapse to per-batch partials in the same pass.
* maybe-members (all bits set: true matches + false positives) fall back
  to the exact keyed anti-join, so the END RESULT IS EXACT — the Bloom
  filter only routes, never decides.  Shuffle volume is
  O(matches + eps * |left|) instead of O(|left|).

The composed :func:`anti_join_bloom_agg` reads the left input twice (one
streaming scan per branch) — two column-pruned scans are cheaper at scale
than materializing the probe output or shuffling the full left side.

Small-right fast path: the build pass also collects the right side's
EXACT distinct keys while they fit under ``small_right_limit``; when they
do, the whole join degenerates to one broadcast + one left scan with a
vectorized ``isin`` (zero shuffle, zero extra scan) — the classic
"broadcast the small side" rule.  The Bloom two-branch machinery is the
path for right sides too big to broadcast exactly; it engages
automatically the moment the keyset overflows the limit (and always under
``num_shards > 1``, which declares the keyset huge up front).

Hashing: ``pandas.util.hash_pandas_object`` (deterministic, vectorized,
process-stable) mixed into ``num_hashes`` double-hashing probes — the
same hasher :mod:`functions.sketches` uses; a filter needs uniformity and
build/probe agreement, not cross-engine stability.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.functions.sketches import _hash64


def _probe_positions(hashes: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(n, num_hashes) bit positions via double hashing: h1 + i*h2 mod m."""
    h1 = hashes
    # splitmix-style remix for the stride; forced odd so strides cycle
    h2 = hashes ^ (hashes >> np.uint64(33))
    h2 = (h2 * np.uint64(0xFF51AFD7ED558CCD)) | np.uint64(1)
    i = np.arange(num_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(num_bits)).astype(
        np.int64
    )


def _fold_bits(words_list, num_words: int) -> np.ndarray:
    acc = np.zeros(num_words, dtype=np.uint64)
    for w in words_list:
        np.bitwise_or(acc, w, out=acc)
    return acc


def build_bloom(ds, key_column: str, num_bits: int = 1 << 23, num_hashes: int = 5):
    """uint64 bitset words (``num_bits / 64``) covering every value of
    ``key_column`` in ``ds``.  One streaming pass; each block contributes
    one fixed-size partial row; the driver OR-folds partials incrementally
    (never more than one in flight)."""
    # round UP to a whole word so the build modulus equals the probe's
    # len(words) * 64 reconstruction — a ragged num_bits would otherwise
    # desynchronize them (probe false negatives = silent anti-join misses)
    num_words = (num_bits + 63) // 64
    num_bits = num_words * 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = np.zeros(num_words, dtype=np.uint64)
        if len(df):
            pos = _probe_positions(_hash64(df[key_column]), num_bits, num_hashes)
            np.bitwise_or.at(
                words, pos.ravel() >> 6, np.uint64(1) << (pos.ravel() & 63).astype(np.uint64)
            )
        return pd.DataFrame({"words": [words.tobytes()]})

    acc = np.zeros(num_words, dtype=np.uint64)
    for batch in ds.map_batches(
        partial, batch_format="pandas", batch_size=65536
    ).iter_batches(batch_format="pandas"):
        for raw in batch["words"]:
            np.bitwise_or(acc, np.frombuffer(raw, dtype=np.uint64), out=acc)
    return acc


def bloom_contains(
    words: np.ndarray, values: pd.Series, num_hashes: int = 5
) -> np.ndarray:
    """Boolean maybe-member mask; guaranteed True for every inserted key."""
    num_bits = len(words) * 64
    if not len(values):
        return np.zeros(0, dtype=bool)
    pos = _probe_positions(_hash64(values), num_bits, num_hashes)
    bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return (bits != 0).all(axis=1)


def build_bloom_and_keys(
    ds,
    key_column: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    collect_limit: int = 2_000_000,
):
    """:func:`build_bloom` that ALSO returns the exact distinct keys —
    ``(words, keys | None)`` — as long as they stay under
    ``collect_limit``.  Same single streaming pass: each partial carries
    its batch's unique values next to the bitset; the driver folds bits
    unconditionally and accumulates keys until overflow (compacting with
    ``pd.unique`` so peak driver memory stays ~2x the limit), after which
    ``keys`` is ``None`` and only the filter survives.  Lets join
    compositions pick broadcast-exact vs Bloom-prefilter from ONE pass
    over the right side instead of a separate count.

    Key shipping is BOUNDED for huge right sides: the partial runs in a
    small actor pool and each actor stops attaching keys once it alone
    has shipped more than ``collect_limit`` uniques (the global set must
    then overflow too), so total driver-ward key traffic is capped at
    ~pool_size x collect_limit instead of O(|right distinct|)."""
    if collect_limit <= 0:
        return build_bloom(ds, key_column, num_bits, num_hashes), None
    num_words = (num_bits + 63) // 64
    num_bits = num_words * 64

    class partial_cls:
        def __init__(self):
            self.shipped = 0

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            words = np.zeros(num_words, dtype=np.uint64)
            if len(df):
                pos = _probe_positions(_hash64(df[key_column]), num_bits, num_hashes)
                np.bitwise_or.at(
                    words, pos.ravel() >> 6,
                    np.uint64(1) << (pos.ravel() & 63).astype(np.uint64),
                )
            if self.shipped > collect_limit:
                uniq = None  # this actor alone proves global overflow
            else:
                uniq = np.asarray(df[key_column].unique())
                self.shipped += len(uniq)
            return pd.DataFrame({"words": [words.tobytes()], "keys": [uniq]})

    acc = np.zeros(num_words, dtype=np.uint64)
    chunks: list[np.ndarray] = []
    total = 0
    overflow = False
    for batch in ds.map_batches(
        partial_cls, batch_format="pandas", batch_size=65536, concurrency=(1, 8)
    ).iter_batches(batch_format="pandas"):
        for raw, uniq in zip(batch["words"], batch["keys"]):
            np.bitwise_or(acc, np.frombuffer(raw, dtype=np.uint64), out=acc)
            if overflow:
                continue
            if uniq is None:
                overflow, chunks = True, []
                continue
            chunks.append(np.asarray(uniq))
            total += len(uniq)
            if total > 2 * collect_limit:  # batch uniques overlap; compact
                merged = pd.unique(np.concatenate(chunks))
                chunks, total = [merged], len(merged)
                if total > collect_limit:
                    overflow, chunks = True, []
    if overflow:
        return acc, None
    keys = pd.unique(np.concatenate(chunks)) if chunks else np.array([])
    if len(keys) > collect_limit:
        return acc, None
    return acc, keys


def _broadcast_membership(keys_ref, key_column: str, keep_members: bool):
    """Batch fn filtering on EXACT membership in a broadcast key array
    (``ray.put`` once, hash-probe per batch via ``Series.isin``)."""
    import ray

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        hit = df[key_column].isin(ray.get(keys_ref)).to_numpy()
        return df[hit] if keep_members else df[~hit]

    return _f


def _adaptive_buckets(cand, rows_per_bucket: int = 200_000):
    """Materialize a (by-construction small) candidate set and size the
    exact-join bucket count to its row count, so a few-hundred-k-row
    fallback doesn't pay for 64 fixed-overhead bucket tasks while a
    billion-row one still fans out.  The materialize pins O(candidates) in
    the object store — the same rows the bucket shuffle is about to hold
    anyway; callers that must stay fully streaming pass an explicit
    ``num_buckets`` instead."""
    cand = cand.materialize()
    n = cand.count()
    return cand, max(4, min(512, -(-n // rows_per_bucket)))


_SHARD_MIX = np.uint64(0x9E3779B97F4A7C15)


def _shard_ids(hashes: np.ndarray, num_shards: int) -> np.ndarray:
    """Shard per key from a mix INDEPENDENT of the probe-position hashes
    (h1/h2 in :func:`_probe_positions` use the raw hash and a 0xFF51...
    remix) — correlated shard/position bits would skew per-shard load."""
    return ((hashes * _SHARD_MIX) >> np.uint64(40)) % np.uint64(num_shards)


class ShardedBloom:
    """Bloom bitset PARTITIONED by key-hash range — the >10^9-keys path
    (README scale audit): a single filter at 10 bits/key over 10^9 keys is
    a ~1.25 GB object that every probe task must map; sharding it into
    ``num_shards`` independent bitsets means (1) the distributed build
    OR-folds each shard in its own reduce task and the driver pins at most
    ONE shard at a time, (2) each shard broadcasts as its own object-store
    entry, so a probe over a key-partitioned left side fetches only the
    shard(s) its batch actually touches (plasma caches per node either
    way), and (3) no single object approaches plasma's large-object
    penalties.  Same no-false-negative guarantee per shard."""

    def __init__(self, refs: list, num_shards: int, bits_per_shard: int,
                 num_hashes: int):
        self.refs = refs
        self.num_shards = num_shards
        self.bits_per_shard = bits_per_shard
        self.num_hashes = num_hashes
        self._cache: dict[int, np.ndarray] = {}

    def _shard_words(self, s: int) -> np.ndarray:
        w = self._cache.get(s)
        if w is None:
            import ray

            w = ray.get(self.refs[s])  # zero-copy plasma read, cached per holder
            self._cache[s] = w
        return w

    def contains(self, values: pd.Series) -> np.ndarray:
        if not len(values):
            return np.zeros(0, dtype=bool)
        h = _hash64(values)
        shards = _shard_ids(h, self.num_shards)
        out = np.zeros(len(values), dtype=bool)
        for s in np.unique(shards):
            sel = shards == s
            pos = _probe_positions(h[sel], self.bits_per_shard, self.num_hashes)
            words = self._shard_words(int(s))
            bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
            out[sel] = (bits != 0).all(axis=1)
        return out

    def __reduce__(self):
        # drop the per-holder cache; refs serialize fine inside Ray workers
        return (
            ShardedBloom,
            (self.refs, self.num_shards, self.bits_per_shard, self.num_hashes),
        )


def build_bloom_sharded(ds, key_column: str, num_shards: int = 16,
                        bits_per_shard: int = 1 << 22,
                        num_hashes: int = 5) -> ShardedBloom:
    """Distributed sharded build: one streaming pass emits per-(batch,
    shard) partial bitsets ONLY for shards the batch touches, a
    ``groupby(shard)`` reduce OR-folds each shard in parallel, and the
    driver ``ray.put``s one folded shard at a time (peak driver memory =
    one shard, not the whole filter)."""
    num_words = (bits_per_shard + 63) // 64
    bits_per_shard = num_words * 64

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        rows_s, rows_w = [], []
        if len(df):
            h = _hash64(df[key_column])
            shards = _shard_ids(h, num_shards)
            for s in np.unique(shards):
                words = np.zeros(num_words, dtype=np.uint64)
                pos = _probe_positions(h[shards == s], bits_per_shard, num_hashes)
                np.bitwise_or.at(
                    words, pos.ravel() >> 6,
                    np.uint64(1) << (pos.ravel() & 63).astype(np.uint64),
                )
                rows_s.append(int(s))
                rows_w.append(words.tobytes())
        return pd.DataFrame({"shard": pd.Series(rows_s, dtype="int64"),
                             "words": rows_w})

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        acc = _fold_bits(
            (np.frombuffer(raw, dtype=np.uint64) for raw in group["words"]),
            num_words,
        )
        return pd.DataFrame({"shard": [int(group["shard"].iloc[0])],
                             "words": [acc.tobytes()]})

    folded = (
        ds.map_batches(partials, batch_format="pandas", batch_size=65536)
        .groupby("shard")
        .map_groups(fold, batch_format="pandas")
    )
    import ray

    refs: list = [None] * num_shards
    empty = None
    for batch in folded.iter_batches(batch_format="pandas"):
        for s, raw in zip(batch["shard"], batch["words"]):
            refs[int(s)] = ray.put(np.frombuffer(raw, dtype=np.uint64).copy())
    for s in range(num_shards):
        if refs[s] is None:  # shard untouched by any key
            if empty is None:
                empty = ray.put(np.zeros(num_words, dtype=np.uint64))
            refs[s] = empty
    return ShardedBloom(refs, num_shards, bits_per_shard, num_hashes)


def bloom_split(filt, key_column: str, maybe: bool, num_hashes: int = 5):
    """Batch fn splitting rows on Bloom membership: ``maybe=True`` keeps
    maybe-members (true matches + false positives), ``maybe=False`` keeps
    definite non-members.  ``filt`` is either an ObjectRef to a single
    bitset (the broadcast path) or a :class:`ShardedBloom` (the >10^9-keys
    path).  Shared by the anti/semi-join and incremental-dedup call sites
    so the probe idiom cannot drift."""
    import ray

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        if isinstance(filt, ShardedBloom):
            mask = filt.contains(df[key_column])
        else:
            mask = bloom_contains(ray.get(filt), df[key_column], num_hashes)
        return df[mask] if maybe else df[~mask]

    return _f


def anti_join_bloom_agg(
    left_ds_factory,
    right_ds,
    key_column: str,
    partial,
    final,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    num_buckets: int | None = None,
    num_shards: int = 1,
    small_right_limit: int = 2_000_000,
):
    """Exact ``left ANTI JOIN right ON key`` immediately reduced by the
    caller's aggregation: ``partial(df) -> df`` collapses a batch of
    surviving left rows to combiner rows, ``final(concat_of_partials) ->
    df`` produces the driver-side result (aggregate-sized by contract).

    ``left_ds_factory`` is a zero-arg callable returning a fresh left
    Dataset — called once per branch (definite non-members / candidate
    fallback), so each branch is its own streaming scan.  When the right
    keyset fits under ``small_right_limit`` it is broadcast EXACTLY and
    the factory is called once: a single scan filters with a vectorized
    ``isin`` and aggregates in place — no shuffle at all (see module
    docstring).

    ``num_buckets=None`` (default) sizes the exact-fallback shuffle to the
    measured candidate count (:func:`_adaptive_buckets`); pass a number to
    keep that branch fully streaming at a fixed fan-out.

    ``num_shards > 1`` switches to the partitioned filter
    (:class:`ShardedBloom`) — same exact result, total capacity still
    ``num_bits`` split across shards; use it when the right side's keyset
    would make a single bitset a multi-GB broadcast (~>10^9 keys at
    10 bits/key).  It also declares the keyset too big to collect, so the
    broadcast-exact path is skipped.
    """
    import ray

    from cdm_data_loader_utils_ray.stages.keyed import anti_join_keys

    if num_shards > 1:
        filt = build_bloom_sharded(
            right_ds, key_column, num_shards=num_shards,
            bits_per_shard=max(num_bits // num_shards, 1 << 16),
            num_hashes=num_hashes,
        )
    else:
        words, keys = build_bloom_and_keys(
            right_ds, key_column, num_bits, num_hashes, small_right_limit
        )
        if keys is not None:
            keys_ref = ray.put(keys)
            drop_exact = _broadcast_membership(keys_ref, key_column, keep_members=False)

            def exact_partials(df: pd.DataFrame) -> pd.DataFrame:
                return partial(drop_exact(df))

            parts = (
                left_ds_factory()
                .map_batches(exact_partials, batch_format="pandas")
                .to_pandas()
            )
            return final(parts)
        filt = ray.put(words)
    words_ref = filt
    drop_members = bloom_split(words_ref, key_column, maybe=False, num_hashes=num_hashes)

    def nonmember_partials(df: pd.DataFrame) -> pd.DataFrame:
        return partial(drop_members(df))

    # branch 1: definite non-members collapse to partials inside the scan
    non_members = left_ds_factory().map_batches(
        nonmember_partials, batch_format="pandas"
    )
    # branch 2: maybe-members (matches + FPs) -> exact keyed anti-join
    cand = left_ds_factory().map_batches(
        bloom_split(words_ref, key_column, maybe=True, num_hashes=num_hashes),
        batch_format="pandas",
    )
    if num_buckets is None:
        cand, num_buckets = _adaptive_buckets(cand)
    survivors = anti_join_keys(cand, right_ds, [key_column], num_buckets=num_buckets)
    sur_partials = survivors.map_batches(partial, batch_format="pandas")

    parts = pd.concat(
        [non_members.to_pandas(), sur_partials.to_pandas()], ignore_index=True
    )
    return final(parts)


def semi_join_bloom_agg(
    left_ds,
    right_ds,
    key_column: str,
    partial,
    final,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    num_buckets: int | None = None,
    small_right_limit: int = 2_000_000,
):
    """Exact ``left SEMI JOIN right ON key`` (EXISTS) reduced by the
    caller's ``partial``/``final`` aggregation — the dual of
    :func:`anti_join_bloom_agg`.  One left scan either way: Bloom misses
    are provably non-members and drop inside the scan; under
    ``small_right_limit`` the membership test is the broadcast EXACT
    keyset and matches aggregate in place with no shuffle, otherwise
    maybe-members take the exact keyed semi join (bucket count sized to
    the measured candidate set when ``num_buckets=None``)."""
    import ray

    from cdm_data_loader_utils_ray.stages.keyed import semi_join_keys

    words, keys = build_bloom_and_keys(
        right_ds, key_column, num_bits, num_hashes, small_right_limit
    )
    if keys is not None:
        keys_ref = ray.put(keys)
        keep_exact = _broadcast_membership(keys_ref, key_column, keep_members=True)

        def exact_partials(df: pd.DataFrame) -> pd.DataFrame:
            return partial(keep_exact(df))

        parts = left_ds.map_batches(exact_partials, batch_format="pandas").to_pandas()
        return final(parts)

    words_ref = ray.put(words)
    cand = left_ds.map_batches(
        bloom_split(words_ref, key_column, maybe=True, num_hashes=num_hashes),
        batch_format="pandas",
    )
    if num_buckets is None:
        cand, num_buckets = _adaptive_buckets(cand)
    matched = semi_join_keys(cand, right_ds, [key_column], num_buckets=num_buckets)
    parts = matched.map_batches(partial, batch_format="pandas").to_pandas()
    return final(parts)
