"""Deterministic synthetic data: the ``(repo, path, commit, lang, content)``
source-code table and its CDC event log (FIXTURES.md §§1-3).

Everything is a pure function of ``seed`` — no wall clock, no randomness
outside numpy's seeded Generator — so tests, oracles and benchmarks are
reproducible, and retried generation tasks produce identical bytes.

Skew: repo sizes follow a Zipf-ish distribution so a few hot repos own most
keys/events (exercises the salted partitioner).  Event mix per FIXTURES §2:
~60% update / 25% insert / 10% delete / 5% exact duplicates, with
delete-then-higher-seq-update sequences (upsert-over-delete).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cdm_data_loader_utils_ray.core.schemas import EVENT_SCHEMA, REPO_FILES_SCHEMA

_LANGS = ["py", "rs", "go", "js", "md", "toml", "c", "java", None]
_WORDS = (
    "def class return import fn let mut pub struct impl for while if else match "
    "async await try except raise yield lambda map filter reduce print self type "
    "const var function export default new delete static void int str bool"
).split()


def _commit_hex(seed: int, repo: str, path: str, version: int) -> str:
    """40-hex deterministic commit id (sha1-style, FIXTURES §1)."""
    return hashlib.sha1(f"{seed}|{repo}|{path}|{version}".encode()).hexdigest()


def _content(rng_words: np.ndarray, size: int) -> str:
    return " ".join(rng_words[:size])


def make_keys(num_keys: int, seed: int = 42) -> pd.DataFrame:
    """Key universe: (repo, path) pairs with Zipf-skewed repo sizes."""
    rng = np.random.default_rng(seed)
    n_repos = max(4, num_keys // 40)
    weights = 1.0 / np.arange(1, n_repos + 1) ** 1.2
    weights /= weights.sum()
    repo_idx = rng.choice(n_repos, size=num_keys, p=weights)
    org = repo_idx % max(1, n_repos // 8)
    repos = np.array([f"org{o}/repo{r}" for o, r in zip(org, repo_idx)])
    exts = rng.choice([l for l in _LANGS if l], size=num_keys)
    paths = np.array(
        [
            f"src/module{rng.integers(0, 50)}/file{i}.{e}"
            for i, e in enumerate(exts)
        ]
    )
    lang = np.where(rng.random(num_keys) < 0.95, exts, None)
    return pd.DataFrame({"repo": repos, "path": paths, "lang": lang})


def make_events(
    num_keys: int = 2000,
    num_events: int = 10000,
    seed: int = 42,
    dup_fraction: float = 0.05,
    delete_fraction: float = 0.10,
    insert_extra_fraction: float = 0.25,
) -> pa.Table:
    """Deterministic CDC event log over ``num_keys`` keys.

    Guarantees:
    * every key gets an initial ``insert`` (first event for the key);
    * later events per key are ``update``/``delete`` with monotonically
      increasing global ``seq``; updates after a delete resurrect the key;
    * ``dup_fraction`` of events are exact duplicates of earlier events,
      appended with their ORIGINAL seq/payload (at-least-once delivery).
    """
    rng = np.random.default_rng(seed)
    n_base = int(num_events / (1 + dup_fraction))
    # can't give every key an insert with fewer events than keys: shrink
    # the key universe so each key still appears at least once
    num_keys = max(1, min(num_keys, n_base))
    keys = make_keys(num_keys, seed)
    # assign each event to a key; first occurrence of a key is its insert
    extra = rng.integers(0, num_keys, size=max(0, n_base - num_keys))
    key_ids = np.concatenate([np.arange(num_keys), extra])
    rng.shuffle(key_ids)
    key_ids = key_ids[:n_base]
    # ensure all keys appear at least once
    missing = np.setdiff1d(np.arange(num_keys), key_ids)
    if len(missing):
        key_ids[rng.choice(n_base, size=len(missing), replace=False)] = missing

    # vectorized op assignment: first occurrence of a key = insert, later
    # occurrences = update/delete by draw
    ks = pd.Series(key_ids)
    first = ~ks.duplicated().to_numpy()
    op_draw = rng.random(n_base)
    ops = np.where(first, "insert", np.where(op_draw < delete_fraction, "delete", "update"))
    is_delete = ops == "delete"

    rows = {
        "seq": np.arange(1, n_base + 1, dtype=np.int64),
        "op": ops,
        "repo": keys["repo"].to_numpy()[key_ids],
        "path": keys["path"].to_numpy()[key_ids],
        "lang": keys["lang"].to_numpy()[key_ids],
    }
    # per-key version counter (vectorized cumcount), deterministic commit ids:
    # cheap numeric hashing instead of per-row hashlib for large logs
    versions = ks.groupby(ks).cumcount().to_numpy() + 1
    h = (
        pd.util.hash_pandas_object(
            pd.Series(rows["repo"]) + "\x1f" + pd.Series(rows["path"]), index=False
        ).to_numpy()
        ^ (versions.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        ^ np.uint64(seed)
    )
    h2 = (h * np.uint64(0xBF58476D1CE4E5B9)) ^ np.uint64(seed * 2654435761 % (1 << 64))
    c1 = np.char.zfill(np.char.mod("%x", h), 16)
    c2 = np.char.zfill(np.char.mod("%x", h2), 16)
    c3 = np.char.zfill(np.char.mod("%x", (h ^ h2) & np.uint64(0xFFFFFFFF)), 8)
    commits = np.char.add(np.char.add(c1, c2), c3)  # 40 hex chars
    # deterministic pseudo-code content: slices of one long seeded text pool
    pool = " ".join(rng.choice(_WORDS, size=20000))
    pool_len = len(pool)
    sizes = rng.integers(50, 2000, size=n_base)
    offsets = rng.integers(0, pool_len - 2100, size=n_base)
    salt = np.char.mod("v%d ", versions)
    contents = np.array(
        [f"{s}{pool[o : o + z]}" for s, o, z in zip(salt, offsets, sizes)], dtype=object
    )
    contents[is_delete] = None
    rows["commit"] = commits
    rows["content"] = contents
    df = pd.DataFrame(rows)

    # exact duplicates of earlier events (same seq + payload): at-least-once
    n_dup = num_events - n_base
    if n_dup > 0:
        dup_idx = rng.choice(n_base, size=n_dup, replace=False)
        df = pd.concat([df, df.iloc[dup_idx]], ignore_index=True)

    df = df[["seq", "op", "repo", "path", "commit", "lang", "content"]]
    return pa.Table.from_pandas(df, schema=EVENT_SCHEMA, preserve_index=False)


def add_drift_v2(events: pa.Table, seed: int = 42, from_seq: int | None = None) -> pa.Table:
    """`events_v2` drift (FIXTURES §3): add nullable ``size_bytes:int64`` for
    events with ``seq >= from_seq`` (earlier epochs lack it → null)."""
    df = events.to_pandas()
    if from_seq is None:
        from_seq = int(df["seq"].max() // 2)
    size = df["content"].str.len().astype("Int64")
    df["size_bytes"] = size.where(df["seq"] >= from_seq, other=pd.NA)
    schema = EVENT_SCHEMA.append(pa.field("size_bytes", pa.int64(), nullable=True))
    return pa.Table.from_pandas(df, schema=schema, preserve_index=False)


def rename_drift_v3(events: pa.Table) -> tuple[pa.Table, dict[str, str]]:
    """`events_v3` drift: column ``lang`` arrives named ``language``; the
    engine is given the rename map (new -> canonical handled by the aligner's
    old->new mapping: we rename the *incoming* column back)."""
    renamed = events.rename_columns(
        ["language" if c == "lang" else c for c in events.column_names]
    )
    return renamed, {"language": "lang"}


def corrupt_events(events: pa.Table, seed: int = 7, fraction: float = 0.02) -> pa.Table:
    """Inject validation failures (FIXTURES §4): null required columns and
    out-of-enum ops on a deterministic subset."""
    rng = np.random.default_rng(seed)
    df = events.to_pandas()
    n = len(df)
    bad = rng.choice(n, size=max(3, int(n * fraction)), replace=False)
    third = max(1, len(bad) // 3)
    df.loc[bad[:third], "repo"] = None              # missing_required: repo
    df.loc[bad[third : 2 * third], "commit"] = None  # missing_required: commit
    df.loc[bad[2 * third :], "op"] = "upsert"        # parse_error (enum)
    # raw feeds arrive without nullability guarantees — declared-schema
    # nullability is enforced by the validator stage, not the reader
    relaxed = pa.schema([pa.field(f.name, f.type, nullable=True) for f in events.schema])
    return pa.Table.from_pandas(df, schema=relaxed, preserve_index=False)


def write_events(
    path: str, table: pa.Table, row_group_size: int = 65536, shards: int = 1
) -> str:
    """Write the event log; with ``shards`` > 1 write a DIRECTORY of part
    files so ``read_parquet`` fans out one read task per file (a single
    monolithic file serializes the scan)."""
    if shards <= 1:
        pq.write_table(table, path, row_group_size=row_group_size)
        return path
    import os

    os.makedirs(path, exist_ok=True)
    n = len(table)
    step = -(-n // shards)
    for i in range(shards):
        part = table.slice(i * step, step)
        if len(part):
            pq.write_table(
                part, os.path.join(path, f"part-{i:05d}.parquet"), row_group_size=row_group_size
            )
    return path


def _gen_shard(
    out_path: str,
    shard: int,
    shards: int,
    num_keys: int,
    num_events: int,
    seed: int,
    keys_repo: np.ndarray,
    keys_path: np.ndarray,
    keys_lang: np.ndarray,
    row_group_size: int,
) -> int:
    """One deterministic shard of a distributed event log: seq range
    [shard*step+1, ...], keys drawn from the shared zipf universe with an
    independent (seed, shard) stream.  Op mix approximates FIXTURES §2
    without cross-shard first-occurrence tracking (insert vs update are
    equivalent to the engine; both upsert)."""
    rng = np.random.default_rng((seed << 16) ^ shard)
    step = -(-num_events // shards)
    lo = shard * step
    n = min(step, num_events - lo)
    if n <= 0:
        return 0
    key_ids = rng.integers(0, num_keys, size=n)
    draw = rng.random(n)
    ops = np.where(draw < 0.10, "delete", np.where(draw < 0.35, "insert", "update"))
    is_delete = ops == "delete"
    seqs = np.arange(lo + 1, lo + n + 1, dtype=np.int64)
    h = (
        pd.util.hash_pandas_object(
            pd.Series(keys_repo[key_ids]) + "\x1f" + pd.Series(keys_path[key_ids]),
            index=False,
        ).to_numpy()
        ^ (seqs.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        ^ np.uint64(seed)
    )
    h2 = (h * np.uint64(0xBF58476D1CE4E5B9)) ^ np.uint64(seed * 2654435761 % (1 << 64))
    c1 = np.char.zfill(np.char.mod("%x", h), 16)
    c2 = np.char.zfill(np.char.mod("%x", h2), 16)
    c3 = np.char.zfill(np.char.mod("%x", (h ^ h2) & np.uint64(0xFFFFFFFF)), 8)
    commits = np.char.add(np.char.add(c1, c2), c3)
    pool = " ".join(rng.choice(_WORDS, size=20000))
    sizes = rng.integers(50, 2000, size=n)
    offsets = rng.integers(0, len(pool) - 2100, size=n)
    contents = np.array(
        [f"s{q} {pool[o : o + z]}" for q, o, z in zip(seqs, offsets, sizes)], dtype=object
    )
    contents[is_delete] = None
    df = pd.DataFrame(
        {
            "seq": seqs,
            "op": ops,
            "repo": keys_repo[key_ids],
            "path": keys_path[key_ids],
            "commit": commits,
            "lang": keys_lang[key_ids],
            "content": contents,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, schema=EVENT_SCHEMA, preserve_index=False),
        out_path,
        row_group_size=row_group_size,
    )
    return n


def make_events_distributed(
    out_dir: str,
    num_keys: int,
    num_events: int,
    seed: int = 42,
    shards: int = 64,
    row_group_size: int = 16384,
) -> str:
    """Generate a large deterministic event log IN PARALLEL with Ray tasks
    (one shard file per task; ~20x faster than the single-threaded
    generator at bench scale).  Requires an active Ray session (bench/cli
    own one).  Same schema/zipf-skew/op-mix contract as ``make_events`` but
    an independent RNG stream per shard."""
    import os as _os

    import ray

    _os.makedirs(out_dir, exist_ok=True)
    keys = make_keys(num_keys, seed)
    repo_ref = ray.put(keys["repo"].to_numpy())
    path_ref = ray.put(keys["path"].to_numpy())
    lang_ref = ray.put(keys["lang"].to_numpy())
    gen = ray.remote(num_cpus=1)(_gen_shard)
    refs = [
        gen.remote(
            _os.path.join(out_dir, f"part-{i:05d}.parquet"),
            i, shards, num_keys, num_events, seed,
            repo_ref, path_ref, lang_ref, row_group_size,
        )
        for i in range(shards)
    ]
    ray.get(refs)
    return out_dir


def make_repo_files(num_keys: int = 2000, seed: int = 42) -> pa.Table:
    """A standalone ``repo_files`` base table (one live version per key)."""
    events = make_events(num_keys=num_keys, num_events=num_keys * 3, seed=seed)
    df = events.to_pandas().sort_values("seq")
    df = df.drop_duplicates(subset=["repo", "path"], keep="last")
    df = df[df["op"] != "delete"].drop(columns=["seq", "op"])
    df = df.sort_values(["repo", "path"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, schema=REPO_FILES_SCHEMA, preserve_index=False)
