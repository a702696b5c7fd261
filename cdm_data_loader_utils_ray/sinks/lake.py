"""Two-phase-commit Parquet lake with an atomic manifest log.

Replaces the reference's Delta Lake transactional layer
(``utils/spark_delta.py:135-224``, ``_delta_log``) with the minimal
equivalent that gives the CDC engine exactly-once semantics:

* **data files** are immutable per-partition Parquet deltas written to
  ``data/part-{pid}-epoch-{e}.parquet`` by the merge tasks (phase 1);
* a **manifest** JSON lists, per partition, the single live state file, its
  row count and high-water-mark ``seq`` — plus the table schema and
  lineage/metrics for the epoch (phase 2);
* commit = write ``manifest-{e}.json`` then atomically rename a ``LATEST``
  pointer; readers resolve ``LATEST`` and see only committed state.  A crash
  between phase 1 and 2 leaves orphan staging files that the next commit
  ignores and ``vacuum`` removes (Delta VACUUM analogue,
  ``refseq_pipeline/core/spark_delta.py:153-157``).

Layout (one directory per table; partition-count fixed at creation):

    <lake>/<table>/
        _manifest/LATEST            -> "42"   (atomic pointer)
        _manifest/manifest-00000042.json
        data/part-00007-epoch-00000042.parquet
        _audit/{run,checkpoint,metrics,rejects}/*.parquet

On a multi-node cluster ``<lake>`` must be shared storage (S3 / NFS via
``pyarrow.fs``); tasks write data files from workers, only the tiny manifest
commit happens on the driver.
"""

from __future__ import annotations

import base64
import json
import os
import re
import tempfile
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# module level, not lazy: these run inside worker tasks, where a lazy
# intra-package import would re-import the package without an import path
# (the by-value serialization contract — see CLAUDE.md)
from cdm_data_loader_utils_ray.core.schemas import DELETED_COLUMN, KEY_COLUMNS
from cdm_data_loader_utils_ray.functions.bloom import _probe_positions, bloom_contains
from cdm_data_loader_utils_ray.functions.sketches import _hash64
from cdm_data_loader_utils_ray.stages.schema_align import align_to_schema, rename_columns
from cdm_data_loader_utils_ray.state.upsert import merge_states

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"
AUDIT_DIR = "_audit"
LATEST = "LATEST"
COMMIT_BACKEND_FILE = "COMMIT_BACKEND"

# process-local: table_dir (abspath) -> injected ObjectStore, so internal
# LakeTable(dir) constructions reuse a custom store (see create_object_store)
_STORE_REGISTRY: dict = {}

# process-local (per worker) cache: PROPERTIES path -> ((path, mtime_ns), cfg)
_BLOOM_CFG_CACHE: dict = {}


def _atomic_write(path: str, payload: str) -> None:
    """Write-then-rename so readers never observe a partial file; the
    directory is fsynced too so the rename itself survives a crash
    (rename durability requires the parent dir's metadata on disk)."""
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        dfd = os.open(d, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def _schema_from_b64(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


@dataclass
class PartitionEntry:
    """Manifest entry for one partition: its DELTA-FILE CHAIN (base +
    per-epoch delta files, oldest first) and the per-partition high-water
    mark (generalizes the reference checkpoint's ``last_entry_id``,
    ``audit/checkpoint.py:25-61``).

    An epoch appends only its winner rows as one delta file — epoch cost is
    proportional to churn, not table size (LSM-style; Delta Lake's model).
    Readers LWW-merge the chain per key; compaction folds a chain into one
    file.  ``live_keys`` is exact only for a folded (single-file) chain,
    -1 otherwise (unknown without a merge)."""

    pid: int
    files: list[str]  # chain, oldest -> newest, relative to the table dir
    rows: int  # total rows across the chain
    hwm_seq: int  # max seq applied to this partition (-1 = none)
    live_keys: int  # exact for single-file chains, else -1
    bytes: int = 0
    # equality-delete vectors (Iceberg-style): small key-list parquet
    # sidecars; a chain row is dropped at read time when its key appears in
    # a DV whose watermark covers the row's seq.  Deletes without data
    # rewrites — compaction materializes and clears them.
    delete_files: list[str] = field(default_factory=list)

    @property
    def file(self) -> str:
        """Newest file of the chain (compat accessor)."""
        return self.files[-1]

    def to_json(self) -> dict[str, Any]:
        d = {
            "pid": self.pid,
            "files": self.files,
            "rows": self.rows,
            "hwm_seq": self.hwm_seq,
            "live_keys": self.live_keys,
            "bytes": self.bytes,
        }
        if self.delete_files:  # back-compat: absent key == no DVs
            d["delete_files"] = self.delete_files
        return d

    @staticmethod
    def from_json(d: dict[str, Any]) -> "PartitionEntry":
        files = d["files"] if "files" in d else [d["file"]]
        return PartitionEntry(
            pid=d["pid"],
            files=list(files),
            rows=d["rows"],
            hwm_seq=d["hwm_seq"],
            live_keys=d["live_keys"],
            bytes=d.get("bytes", 0),
            delete_files=list(d.get("delete_files", [])),
        )


@dataclass
class Manifest:
    epoch: int
    num_partitions: int
    schema: pa.Schema
    partitions: dict[int, PartitionEntry] = field(default_factory=dict)
    parent_epoch: int | None = None
    run_id: str | None = None
    metrics: dict[str, Any] = field(default_factory=dict)
    rename_history: dict[str, str] = field(default_factory=dict)

    @property
    def hwm(self) -> dict[int, int]:
        return {p.pid: p.hwm_seq for p in self.partitions.values()}

    def to_json(self) -> str:
        return json.dumps(
            {
                "epoch": self.epoch,
                "num_partitions": self.num_partitions,
                "schema_b64": _schema_to_b64(self.schema),
                "partitions": [p.to_json() for p in sorted(self.partitions.values(), key=lambda p: p.pid)],
                "parent_epoch": self.parent_epoch,
                "run_id": self.run_id,
                "metrics": self.metrics,
                "rename_history": self.rename_history,
            },
            indent=1,
        )

    @staticmethod
    def from_json(payload: str) -> "Manifest":
        d = json.loads(payload)
        return Manifest(
            epoch=d["epoch"],
            num_partitions=d["num_partitions"],
            schema=_schema_from_b64(d["schema_b64"]),
            partitions={p["pid"]: PartitionEntry.from_json(p) for p in d["partitions"]},
            parent_epoch=d.get("parent_epoch"),
            run_id=d.get("run_id"),
            metrics=d.get("metrics", {}),
            rename_history=d.get("rename_history", {}),
        )


def chain_may_match(
    table_dir: str, files: list[str], column: str, lo=None, hi=None
) -> bool:
    """Data skipping from parquet FOOTER statistics (Delta-style, but with
    zero write-path changes — parquet already persists per-row-group
    min/max): True unless EVERY row group of EVERY chain file provably
    lies outside [lo, hi].  Sound at partition granularity for LWW-merged
    state: a winner row's value exists verbatim in some chain file, so a
    chain with no in-range values yields no in-range winners.  Footer
    reads are metadata-only (no data IO) and run inside the per-partition
    worker task.  Conservative on any missing stat."""
    for f in files:
        try:
            md = pq.ParquetFile(os.path.join(table_dir, f)).metadata
        except Exception:
            return True  # unreadable footer -> cannot prove disjoint
        try:
            ci = [md.schema.to_arrow_schema().names.index(column)]
        except ValueError:
            return True  # column absent pre-rename -> be conservative
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci[0]).statistics
            if st is None or not st.has_min_max:
                return True
            try:
                if (lo is None or st.max >= lo) and (hi is None or st.min <= hi):
                    return True
            except TypeError:
                return True  # bound/stat type mismatch -> cannot prove disjoint
    return False


BLOOM_SIDECAR_SUFFIX = ".bloom.npz"

# Identifies the exact bit-position scheme a sidecar was built with:
# pd.util.hash_pandas_object (whose output may change across pandas
# versions) + the double-hash probe layout.  Bump "v1" if the probe
# derivation in functions/bloom.py ever changes shape.
_BLOOM_HASH_SCHEME = f"pandas-{pd.__version__}-v1"


def _bloom_config(props: dict):
    """Parsed ``bloom_index`` table property, or None when unset.
    ``{"bloom_index": {"columns": [...], "bits_per_value": 10,
    "num_hashes": 5}}`` declares which columns get per-FILE Bloom
    sidecars on every data-file write."""
    cfg = props.get("bloom_index") or {}
    cols = list(cfg.get("columns") or [])
    if not cols:
        return None
    return cols, int(cfg.get("bits_per_value", 10)), int(cfg.get("num_hashes", 5))


def write_bloom_sidecar(
    data_path: str,
    table: pa.Table,
    columns: list[str],
    bits_per_value: int = 10,
    num_hashes: int = 5,
) -> None:
    """Per-file Bloom bitsets for EQUALITY data skipping (Delta bloom-index
    analogue) — the complement of :func:`chain_may_match`: footer min/max
    prunes range predicates but is useless on high-cardinality unordered
    columns (a sha/path column's min..max spans everything in every file);
    a Bloom sidecar proves absence of a specific value.

    One ``<datafile>.bloom.npz`` next to each data file: a JSON meta blob
    (hash count, column -> array key) plus one uint64 bitset per covered
    column, sized ``bits_per_value`` bits per non-null row (10 bits + 5
    hashes ~ 1% false positives).  Sidecars are ADVISORY — a missing or
    unreadable one only costs pruning, never correctness — so they need no
    fsync and no manifest entry; written atomically (tmp + rename) so a
    torn write is just an absent sidecar.  Hashing is the shared
    process-stable ``_hash64`` / double-hash probe used by
    ``functions/bloom.py`` (build and probe must agree, nothing else)."""
    arrays: dict[str, Any] = {}
    meta_cols: dict[str, str] = {}
    for i, c in enumerate(columns):
        if c not in table.column_names:
            continue
        # drop nulls in ARROW, not pandas: int64-with-nulls -> pandas
        # float64 would hash apart from the probe's int64 (reviewed bug —
        # a dtype mismatch makes Bloom report false NEGATIVES, silently
        # skipping chains that do hold the value)
        s = table[c].drop_null().to_pandas()
        num_words = max(1, (len(s) * bits_per_value + 63) // 64)
        words = np.zeros(num_words, dtype=np.uint64)
        if len(s):
            pos = _probe_positions(_hash64(s), num_words * 64, num_hashes)
            np.bitwise_or.at(
                words,
                pos.ravel() >> 6,
                np.uint64(1) << (pos.ravel() & 63).astype(np.uint64),
            )
        key = f"b{i}"
        arrays[key] = words
        meta_cols[c] = key
    if not arrays:
        return
    meta = json.dumps(
        {
            "num_hashes": num_hashes,
            "columns": meta_cols,
            # hash-scheme marker (r4 advice): sidecars persist _hash64 bit
            # positions to DISK, but _hash64's contract is only stable-
            # within-run (pd.util.hash_pandas_object).  If a pandas upgrade
            # ever changes the hash, a stale sidecar would produce Bloom
            # FALSE NEGATIVES — silently wrong read_state(column_equals)
            # results, not just lost pruning.  chain_may_contain treats a
            # scheme mismatch as unreadable (conservative True).
            "hash_scheme": _BLOOM_HASH_SCHEME,
        }
    )
    tmp = data_path + BLOOM_SIDECAR_SUFFIX + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, meta=np.frombuffer(meta.encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, data_path + BLOOM_SIDECAR_SUFFIX)


def chain_may_contain(table_dir: str, files: list[str], column: str, probe) -> bool:
    """Equality data skipping from Bloom sidecars: False only when EVERY
    chain file's sidecar covers ``column`` and proves the probed value
    absent.  Sound for LWW-merged state by the :func:`chain_may_match`
    argument — a winner row's value exists verbatim in some chain file, so
    a chain with no occurrence yields no matching winners.  Conservative
    on any missing/unreadable sidecar or uncovered column (Bloom has no
    false negatives, so a clear probe is proof of absence).

    ``probe`` is a 1-row ``pandas.Series`` already cast to the column's
    committed type (the caller owns the cast — dtype decides the hash)."""
    for f in files:
        sc = os.path.join(table_dir, f) + BLOOM_SIDECAR_SUFFIX
        try:
            with np.load(sc) as z:
                meta = json.loads(bytes(z["meta"].tobytes()).decode())
                if meta.get("hash_scheme") != _BLOOM_HASH_SCHEME:
                    # sidecar built under a different (or unrecorded) hash
                    # scheme — its bit positions may not match this run's
                    # probe; trusting it risks false negatives
                    return True
                key = meta["columns"].get(column)
                if key is None:
                    return True
                words = z[key]
                k = int(meta["num_hashes"])
        except Exception:
            return True  # absent/unreadable sidecar -> cannot prove absence
        if bool(bloom_contains(words, probe, num_hashes=k)[0]):
            return True
    return False


def select_row_groups(md, column_ranges: dict) -> list[int]:
    """Row groups of one parquet file whose footer stats MAY overlap every
    range in ``column_ranges`` (col -> (lo, hi)).  Conservative: a missing
    column (e.g. a physical name predating a rename), absent stats, or a
    type-mismatched comparison keeps the group."""
    names = md.schema.to_arrow_schema().names
    keep = []
    for rg in range(md.num_row_groups):
        ok = True
        for c, (lo, hi) in column_ranges.items():
            if c not in names:
                continue
            st = md.row_group(rg).column(names.index(c)).statistics
            if st is None or not st.has_min_max:
                continue
            try:
                if (lo is not None and st.max < lo) or (hi is not None and st.min > hi):
                    ok = False
                    break
            except TypeError:
                continue
        if ok:
            keep.append(rg)
    return keep


DV_HWM_COLUMN = "__dv_hwm__"


def dv_delete_mask(table_dir: str, delete_files, t: pa.Table):
    """Boolean numpy mask of rows in ``t`` hit by the partition's
    equality-delete vectors: key present in a DV file AND the row's
    ``seq`` is at or below that DV's watermark (a later re-insert of the
    key outlives the delete — Iceberg sequence-number semantics).
    Returns None when there are no DVs or no rows."""
    if not delete_files or t.num_rows == 0:
        return None
    import pyarrow.compute as pc

    sep = pa.scalar("\x1f")

    def key_of(tbl: pa.Table):
        return pc.binary_join_element_wise(
            tbl[KEY_COLUMNS[0]].combine_chunks().cast(pa.string()),
            tbl[KEY_COLUMNS[1]].combine_chunks().cast(pa.string()),
            sep,
        )

    # fold all DV files: key -> max watermark (vectorized groupby-max —
    # a large delete's vector is key-list-sized, not tiny)
    dvs = [pq.read_table(os.path.join(table_dir, f)) for f in delete_files]
    dv_all = pa.concat_tables(dvs)
    if dv_all.num_rows == 0:
        return None
    folded = (
        pd.DataFrame(
            {
                "k": key_of(dv_all).to_pandas(),
                "w": dv_all[DV_HWM_COLUMN].to_numpy(zero_copy_only=False),
            }
        )
        .groupby("k", sort=False)["w"]
        .max()
    )
    dv_keys = pa.array(folded.index.to_numpy(), type=pa.string())
    dv_marks = folded.to_numpy(np.int64)
    idx = pc.index_in(key_of(t), dv_keys).to_numpy(zero_copy_only=False)
    hit = ~pd.isna(idx)
    marks = np.full(t.num_rows, -1, dtype=np.int64)
    marks[hit] = dv_marks[idx[hit].astype(np.int64)]
    seq = (
        t["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
        if "seq" in t.column_names
        else np.full(t.num_rows, -1, dtype=np.int64)
    )
    return seq <= marks  # unmatched keys have mark -1 < any real seq


def merge_chain_files(
    table_dir: str,
    files: list[str],
    m: "Manifest",
    column_ranges: dict | None = None,
    columns: "Sequence[str] | None" = None,
    delete_files=(),
) -> pa.Table:
    """LWW-merge one partition's delta-chain files, applying the manifest's
    ``rename_history`` per file BEFORE schema alignment (older chain files
    may predate a column rename; without the rename they would silently
    align to null) — the same per-file treatment as
    ``pipelines.cdc._merge_chain_table``.

    ``column_ranges`` enables ROW-GROUP pruning — but ONLY on a
    single-file chain: within one file keys are unique (every data file is
    a merged state/delta), so dropping out-of-range groups cannot change
    any LWW outcome.  Across a multi-file chain it could — pruning an
    out-of-range WINNER would resurrect an in-range loser from an older
    file — so longer chains always read fully (file-level skipping via
    :func:`chain_may_match` still applies upstream).

    ``columns`` is a PROJECTION PUSHDOWN: only those parquet columns leave
    storage (per-file physical names resolved through ``rename_history``,
    so pre-rename files prune correctly).  The LWW merge itself always
    needs the key columns + ``seq`` (+ ``is_deleted`` when the table has
    it) — they are added to the read set here; callers wanting a narrower
    result project after the merge."""
    schema = m.schema
    if columns is not None:
        need = set(columns) | set(KEY_COLUMNS) | {"seq"}
        if DELETED_COLUMN in m.schema.names:
            need.add(DELETED_COLUMN)
        schema = pa.schema([f for f in m.schema if f.name in need])

    def _read(f: str) -> pa.Table:
        path = os.path.join(table_dir, f)
        pf = None
        cols = None
        if columns is not None:
            pf = pq.ParquetFile(path)
            # physical -> logical via the rename map; pre-rename files
            # carry the OLD physical name for a renamed logical column
            cols = [
                n
                for n in pf.schema_arrow.names
                if m.rename_history.get(n, n) in schema.names
            ]
        if column_ranges and len(files) == 1:
            pf = pf or pq.ParquetFile(path)
            keep = select_row_groups(pf.metadata, column_ranges)
            if len(keep) < pf.metadata.num_row_groups:
                if not keep:
                    t = pf.schema_arrow.empty_table()
                    return t.select(cols) if cols is not None else t
                return pf.read_row_groups(keep, columns=cols)
        return pq.read_table(path, columns=cols)

    parts = [
        align_to_schema(rename_columns(_read(f), m.rename_history), schema)
        for f in files
    ]
    merged = merge_states(None, pa.concat_tables(parts), schema)
    mask = dv_delete_mask(table_dir, delete_files, merged)
    if mask is not None and mask.any():
        merged = merged.filter(pa.array(~mask))
    return merged


class LakeTable:
    """One logical table in the lake (Delta-table analogue)."""

    def __init__(self, table_dir: str, *, object_store=None):
        self.dir = table_dir
        self.manifest_dir = os.path.join(table_dir, MANIFEST_DIR)
        self.data_dir = os.path.join(table_dir, DATA_DIR)
        self.audit_dir = os.path.join(table_dir, AUDIT_DIR)
        for d in (self.manifest_dir, self.data_dir, self.audit_dir):
            os.makedirs(d, exist_ok=True)
        # Commit backend: default is the POSIX rename path; a table created
        # with create_object_store() carries a COMMIT_BACKEND marker and
        # routes stage/publish/latest through the conditional-put protocol
        # (sinks/oscommit.py) — the marker makes every later
        # ``LakeTable(dir)`` (cdc.py constructs them internally) reopen
        # with the same commit semantics.  ``object_store`` injects a
        # custom store (e.g. a real S3 adapter); default is the
        # directory-backed one rooted at the manifest dir.
        self._oslog = None
        if object_store is None:
            # a custom store injected via create_object_store(dir, store=...)
            # is registered process-wide so INTERNAL constructions
            # (run_replay builds LakeTable(dir) itself) commit through the
            # SAME store — without this, the user's handle and the
            # pipeline's handles would write divergent manifest logs
            # (review r5 split-brain finding)
            object_store = _STORE_REGISTRY.get(os.path.abspath(table_dir))
        if object_store is None and os.path.exists(
            os.path.join(self.manifest_dir, COMMIT_BACKEND_FILE)
        ):
            with open(os.path.join(self.manifest_dir, COMMIT_BACKEND_FILE)) as f:
                if f.read().strip() == "object-store":
                    from cdm_data_loader_utils_ray.sinks.oscommit import (
                        DirObjectStore,
                    )

                    object_store = DirObjectStore(self.manifest_dir)
        if object_store is not None:
            from cdm_data_loader_utils_ray.sinks.oscommit import (
                ObjectStoreManifestLog,
            )

            self._oslog = ObjectStoreManifestLog(object_store)

    @classmethod
    def create_object_store(cls, table_dir: str, store=None) -> "LakeTable":
        """Create (or reopen) a table whose manifest COMMIT runs on the
        object-store conditional-put protocol instead of POSIX rename —
        the deployment mode for S3/GCS/MinIO-backed lakes, where rename
        does not exist.  Only the commit path is store-abstracted here:
        properties/tags are advisory last-writer-wins sidecars (plain puts
        on a real store), and vacuum/clone remain directory-level
        operations of the bridge layout.

        A custom ``store`` is registered PROCESS-WIDE for this table dir,
        so pipeline internals that construct ``LakeTable(dir)`` themselves
        commit through the same store (driver-side commits only; data
        files still go via the filesystem path)."""
        t = cls(table_dir)
        _atomic_write(
            os.path.join(t.manifest_dir, COMMIT_BACKEND_FILE), "object-store"
        )
        if store is not None:
            _STORE_REGISTRY[os.path.abspath(table_dir)] = store
        return cls(table_dir, object_store=store)

    # -- table properties (epoch-independent sidecar) -------------------------
    def get_properties(self) -> dict:
        """Epoch-independent table properties (e.g. ``constraints`` — see
        ``stages/constraints.py``).  ``{}`` when never set."""
        p = os.path.join(self.manifest_dir, "PROPERTIES.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def set_properties(self, props: dict) -> None:
        """Atomically replace the table properties (read-modify-write on
        the caller for partial updates — properties are tiny)."""
        _atomic_write(
            os.path.join(self.manifest_dir, "PROPERTIES.json"),
            json.dumps(props, indent=1),
        )

    # -- snapshot tags (named epoch refs, Iceberg-tag analogue) ---------------
    def tags(self) -> dict:
        """``name -> epoch`` of all snapshot tags (``{}`` when none)."""
        p = os.path.join(self.manifest_dir, "TAGS.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return {k: int(v) for k, v in json.load(f).items()}

    def set_tag(self, name: str, epoch: int | None = None) -> int:
        """Pin a name to a committed epoch (default: the current LATEST).
        Tagged epochs survive :meth:`vacuum` regardless of ``keep_epochs``
        — the tag is a retention lease, not just a bookmark.  Re-tagging an
        existing name moves it.  Raises if the epoch has no committed
        manifest or lies above LATEST (phase-1 of an in-flight write)."""
        latest = self.latest_epoch()
        if latest is None:
            raise ValueError("cannot tag an empty table")
        e = latest if epoch is None else int(epoch)
        if e > latest:
            raise ValueError(f"epoch {e} not committed (LATEST={latest})")
        if not os.path.exists(
            os.path.join(self.manifest_dir, f"manifest-{e:08d}.json")
        ):
            raise ValueError(f"no manifest for epoch {e} (vacuumed or never written)")
        t = self.tags()
        t[name] = e
        _atomic_write(
            os.path.join(self.manifest_dir, "TAGS.json"), json.dumps(t, indent=1)
        )
        return e

    def delete_tag(self, name: str) -> None:
        """Drop a tag (missing name is a no-op); the next :meth:`vacuum`
        may then reclaim the epoch's files."""
        t = self.tags()
        if t.pop(name, None) is not None:
            _atomic_write(
                os.path.join(self.manifest_dir, "TAGS.json"), json.dumps(t, indent=1)
            )

    def resolve_tag(self, name: str) -> int:
        t = self.tags()
        if name not in t:
            raise KeyError(f"unknown tag {name!r} (have: {sorted(t)})")
        return t[name]

    # -- manifest log -------------------------------------------------------
    def latest_epoch(self) -> int | None:
        if self._oslog is not None:
            return self._oslog.latest_epoch()
        p = os.path.join(self.manifest_dir, LATEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def latest_manifest(self) -> Manifest | None:
        e = self.latest_epoch()
        return None if e is None else self.read_manifest(e)

    def read_manifest(self, epoch: int) -> Manifest:
        if self._oslog is not None:
            return Manifest.from_json(self._oslog.read(epoch))
        with open(os.path.join(self.manifest_dir, f"manifest-{epoch:08d}.json")) as f:
            return Manifest.from_json(f.read())

    def commit(self, manifest: Manifest) -> None:
        """Phase-2 commit: manifest file first, then the LATEST pointer —
        both atomic renames.  Re-committing the same epoch is idempotent."""
        if self.stage_manifest(manifest):
            self.publish_epoch(manifest.epoch)

    def stage_manifest(self, manifest: Manifest) -> bool:
        """Write the durable manifest file WITHOUT flipping LATEST — the
        first half of :meth:`commit`, split out so a multi-table
        transaction (``pipelines/txn.py``) can stage every table before
        any becomes visible.  Returns False for the idempotent replay
        no-op (same epoch, same run), True when staged."""
        cur = self.latest_epoch()
        if cur is not None and manifest.epoch <= cur:
            try:
                existing = self.read_manifest(manifest.epoch)
            except FileNotFoundError:
                existing = None  # epoch inside the committed range but no
                # manifest on disk (foreign/corrupt history): clear error below
            if existing is not None and existing.run_id == manifest.run_id:
                return False  # replayed commit of an already-applied epoch
            raise ValueError(
                f"commit epoch {manifest.epoch} <= committed epoch {cur} by a different run"
            )
        # make the data files' directory entries durable before the manifest
        # that references them (the files themselves were fsynced at write)
        fd = os.open(self.data_dir, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        if self._oslog is not None:
            # last stager of an epoch wins (mirrors the POSIX overwrite of
            # manifest-{e}.json): clear older runs' staging litter first
            from cdm_data_loader_utils_ray.sinks.oscommit import staged_key

            prefix = f"staged-{manifest.epoch:08d}-"
            mine = staged_key(manifest.epoch, manifest.run_id)
            for k in self._oslog.store.list_keys(prefix):
                if k != mine:
                    self._oslog.store.delete(k)
            self._oslog.stage(manifest.epoch, manifest.to_json(), manifest.run_id)
            return True
        _atomic_write(
            os.path.join(self.manifest_dir, f"manifest-{manifest.epoch:08d}.json"),
            manifest.to_json(),
        )
        return True

    def publish_epoch(self, epoch: int) -> None:
        """Flip LATEST to a previously-staged epoch (atomic rename).
        Idempotent: a pointer already at or past ``epoch`` is left alone,
        so transaction recovery can re-publish blindly.  Raises if the
        epoch was never staged — publishing an unstaged epoch would hand
        readers a dangling pointer."""
        if self._oslog is not None:
            # COMMIT POINT here is the conditional put of the final
            # manifest object (not a pointer flip): resolve the staged
            # payload's run_id, then let put_if_absent arbitrate.
            from cdm_data_loader_utils_ray.sinks.oscommit import final_key

            staged = [
                k
                for k in self._oslog.store.list_keys(f"staged-{epoch:08d}-")
            ]
            if not staged:
                if self._oslog.store.get(final_key(epoch)) is not None:
                    return  # already committed (idempotent re-publish)
                raise ValueError(f"publish_epoch: epoch {epoch} was never staged")
            payload = self._oslog.store.get(staged[0])
            if payload is None:  # raced with a concurrent publish's cleanup
                if self._oslog.store.get(final_key(epoch)) is not None:
                    return
                raise ValueError(f"publish_epoch: epoch {epoch} was never staged")
            run_id = Manifest.from_json(payload.decode()).run_id
            self._oslog.publish(epoch, run_id)
            return
        if not os.path.exists(
            os.path.join(self.manifest_dir, f"manifest-{epoch:08d}.json")
        ):
            raise ValueError(f"publish_epoch: epoch {epoch} was never staged")
        cur = self.latest_epoch()
        if cur is not None and cur >= epoch:
            return
        _atomic_write(os.path.join(self.manifest_dir, LATEST), str(epoch))

    def _bloom_config_cached(self):
        """Parsed ``bloom_index`` property without re-reading PROPERTIES
        on every partition write (hot ingest path — a P=1024 epoch would
        otherwise open+parse the same immutable JSON 1024 times).  The
        cache keys on the file's mtime_ns: one os.stat per write, a
        re-parse only when the property file actually changed."""
        p = os.path.join(self.manifest_dir, "PROPERTIES.json")
        try:
            mt = os.stat(p).st_mtime_ns
        except FileNotFoundError:
            mt = None
        key = (p, mt)
        hit = _BLOOM_CFG_CACHE.get(p)
        if hit is not None and hit[0] == key:
            return hit[1]
        cfg = None if mt is None else _bloom_config(self.get_properties())
        _BLOOM_CFG_CACHE[p] = (key, cfg)
        return cfg

    # -- data files ---------------------------------------------------------
    def partition_file(self, pid: int, epoch: int, suffix: str | None = None) -> str:
        tail = f"-{suffix}" if suffix else ""
        return os.path.join(
            DATA_DIR, f"part-{pid:05d}-epoch-{epoch:08d}{tail}.parquet"
        )

    def delete_vector_file(self, pid: int, epoch: int,
                           suffix: str | None = None) -> str:
        tail = f"-{suffix}" if suffix else ""
        return os.path.join(
            DATA_DIR, f"dv-{pid:05d}-epoch-{epoch:08d}{tail}.parquet"
        )

    def write_delete_vector(self, keys: pa.Table, pid: int, epoch: int,
                            hwm_seq: int, suffix: str | None = None) -> str:
        """Phase-1 write of one partition's equality-delete vector: the key
        columns of the rows to delete plus a constant watermark column —
        a chain row dies at read time iff its key matches AND its ``seq``
        is at or below the watermark (so later re-inserts survive).
        Same write-then-rename + fsync discipline as data files."""
        dv = pa.table(
            {
                KEY_COLUMNS[0]: keys[KEY_COLUMNS[0]].cast(pa.string()),
                KEY_COLUMNS[1]: keys[KEY_COLUMNS[1]].cast(pa.string()),
                DV_HWM_COLUMN: pa.array(
                    np.full(len(keys), int(hwm_seq), dtype=np.int64)
                ),
            }
        )
        rel = self.delete_vector_file(pid, epoch, suffix=suffix)
        path = self.abspath(rel)
        import uuid as _uuid

        tmp = path + f".tmp-{_uuid.uuid4().hex[:8]}"
        pq.write_table(dv, tmp, compression="zstd")
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        os.replace(tmp, path)
        return rel

    def abspath(self, rel: str) -> str:
        return os.path.join(self.dir, rel)

    def write_partition(
        self, table: pa.Table, pid: int, epoch: int,
        row_group_size: int | None = None, suffix: str | None = None,
    ) -> PartitionEntry:
        """Phase-1 write of one partition's full state (immutable file).
        Overwrite-safe: a retried task rewrites the same deterministic path
        with identical content before any manifest references it.

        ``suffix`` makes the path RUN-unique: maintenance rewrites pass one
        because two concurrent maintenance ops (different predicates) can
        produce DIFFERENT content for the same (pid, epoch) — on the
        deterministic path the loser's rename would silently swap the
        committed winner's file content (the commit guard rejects the
        loser's manifest, not its phase-1 writes).  CDC replay keeps the
        deterministic path: its content is a pure function of the event
        log, so retries and same-epoch racers write identical bytes.

        ``row_group_size`` bounds rows per parquet row group — smaller
        groups mean finer-grained data skipping on sorted/z-ordered
        rewrites (each group's footer min/max covers fewer rows), at the
        cost of more footer entries.  None keeps the parquet default."""
        rel = self.partition_file(pid, epoch, suffix=suffix)
        path = self.abspath(rel)
        # write-then-RENAME, never in place: an in-place rewrite by a task
        # retry or a concurrent same-epoch writer would tear the file
        # under readers of an already-committed manifest (the commit guard
        # rejects the loser AFTER its phase-1 writes).  The rename makes
        # every visible state a complete file; losers merely overwrite
        # with an equally complete file.
        import uuid as _uuid

        tmp = path + f".tmp-{_uuid.uuid4().hex[:8]}"
        pq.write_table(table, tmp, compression="zstd", row_group_size=row_group_size)
        # fsync before any manifest can reference this file — the manifest
        # and LATEST are fsynced in _atomic_write, and a durable manifest
        # pointing at page-cache-only parquet breaks crash resume
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        os.replace(tmp, path)
        cfg = self._bloom_config_cached()
        if cfg is not None:
            cols, bpv, k = cfg
            write_bloom_sidecar(path, table, cols, bits_per_value=bpv, num_hashes=k)
        live = len(table)
        if "is_deleted" in table.column_names:
            import pyarrow.compute as pc

            live = len(table.filter(pc.equal(table["is_deleted"], False)))
        hwm = -1
        if len(table) and "seq" in table.column_names:
            import pyarrow.compute as pc

            m = pc.max(table["seq"]).as_py()
            hwm = -1 if m is None else int(m)
        return PartitionEntry(
            pid=pid,
            files=[rel],
            rows=len(table),
            hwm_seq=hwm,
            live_keys=live,
            bytes=os.path.getsize(path),
        )

    def live_files(self, manifest: Manifest | None = None) -> list[str]:
        """All chain files across partitions (oldest first within each)."""
        m = manifest or self.latest_manifest()
        if m is None:
            return []
        out: list[str] = []
        for p in sorted(m.partitions.values(), key=lambda p: p.pid):
            out.extend(self.abspath(f) for f in p.files)
        return out

    def read_state(
        self,
        manifest: Manifest | None = None,
        live_only: bool = True,
        column_range: dict | None = None,
        pids: "Sequence[int] | None" = None,
        column_equals: dict | None = None,
        columns: "Sequence[str] | None" = None,
    ):
        """Committed state as a ``ray.data.Dataset``: one task per
        partition LWW-merges its delta chain (streaming across
        partitions).

        ``column_range`` maps column -> (lo, hi) (either bound may be
        None): rows are filtered to the ranges AND partitions whose chain
        footers prove no overlap are skipped before any data IO
        (:func:`chain_may_match` — Delta-style data skipping from the
        parquet statistics already on disk).

        ``column_equals`` maps column -> value: rows are filtered to
        equality AND, when the table carries Bloom sidecars for the column
        (``bloom_index`` table property), chains whose sidecars prove the
        value absent are skipped before any data IO
        (:func:`chain_may_contain`) — the equality complement of the
        footer-stat skipping, effective precisely where min/max is not
        (high-cardinality unordered columns: shas, paths, ids).  The
        equality also participates in footer skipping as a (v, v) range.

        ``pids`` restricts the read to a subset of partitions — the
        churn-proportional pre-image read for incremental view maintenance
        (pipelines/ivm.py): only partitions the CDF window names are
        opened at all.

        ``columns`` is a PROJECTION PUSHDOWN: only the requested columns
        (plus whatever the LWW merge and the predicates need internally)
        are read from parquet at all — the prune-at-the-read rule for wide
        tables.  Renamed columns prune correctly in pre-rename files."""
        import ray.data as rd

        m = manifest or self.latest_manifest()
        if m is None or not m.partitions:
            schema = m.schema if m else pa.schema([])
            return rd.from_arrow(schema.empty_table())
        table_dir = self.dir
        chains = {p.pid: list(p.files) for p in m.partitions.values()}
        dvs = {p.pid: list(p.delete_files) for p in m.partitions.values()}
        want = sorted(chains) if pids is None else sorted(set(pids) & set(chains))
        ranges = dict(column_range or {})
        # type the bounds from the committed schema (r3 ADVICE: a CLI
        # `--range col:100:200` on a string column would otherwise carry
        # int bounds into a str-vs-int comparison); a bound that cannot
        # cast to the column type is a clear user error here, not a
        # worker-side TypeError later
        for c, (lo, hi) in list(ranges.items()):
            if c not in m.schema.names:
                raise ValueError(f"column_range column {c!r} not in table schema")
            typ = m.schema.field(c).type
            try:
                ranges[c] = tuple(
                    None if v is None else pa.scalar(v).cast(typ).as_py()
                    for v in (lo, hi)
                )
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
                raise ValueError(
                    f"column_range bound for {c!r} does not cast to {typ}: {e}"
                ) from None

        # equality predicates: cast once to the committed type; the same
        # arrow -> pandas conversion as the sidecar build side, so the
        # probe hashes with the identical dtype
        probes: dict[str, Any] = {}
        for c, v in dict(column_equals or {}).items():
            if c not in m.schema.names:
                raise ValueError(f"column_equals column {c!r} not in table schema")
            if v is None:
                raise ValueError("column_equals does not support null probes")
            typ = m.schema.field(c).type
            try:
                cast = pa.scalar(v).cast(typ)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
                raise ValueError(
                    f"column_equals value for {c!r} does not cast to {typ}: {e}"
                ) from None
            probes[c] = pa.array([cast.as_py()], type=typ).to_pandas()
            if c in ranges:
                raise ValueError(f"column {c!r} in both column_range and column_equals")
            ranges[c] = (cast.as_py(), cast.as_py())  # footer + row filtering

        read_cols = None
        if columns is not None:
            for c in columns:
                if c not in m.schema.names:
                    raise ValueError(f"columns entry {c!r} not in table schema")
            if live_only and DELETED_COLUMN in columns:
                raise ValueError(
                    "columns includes is_deleted but live_only=True drops it; "
                    "pass live_only=False to read the tombstone flag"
                )
            # the merge + predicates need their own columns even when the
            # caller did not request them; project back down after both
            read_cols = list(dict.fromkeys(list(columns) + list(ranges)))

        out_schema = m.schema
        if columns is not None:
            out_schema = pa.schema([f for f in m.schema if f.name in set(columns)])
        if live_only and "is_deleted" in out_schema.names:
            out_schema = out_schema.remove(out_schema.get_field_index("is_deleted"))

        def merge_chain(batch: dict) -> pa.Table:
            import pyarrow.compute as pc

            out = []
            for pid in batch["item"]:
                files = chains[int(pid)]
                if any(
                    not chain_may_match(table_dir, files, c, lo, hi)
                    for c, (lo, hi) in ranges.items()
                ):
                    continue  # footer-proven disjoint: no data IO at all
                if any(
                    not chain_may_contain(table_dir, files, c, probe)
                    for c, probe in probes.items()
                ):
                    continue  # Bloom-proven absent: no data IO at all
                t = merge_chain_files(
                    table_dir, files, m, column_ranges=ranges, columns=read_cols,
                    delete_files=dvs[int(pid)],
                )
                if live_only and "is_deleted" in t.column_names:
                    t = t.filter(pc.equal(t["is_deleted"], False)).drop_columns(["is_deleted"])
                for c, (lo, hi) in ranges.items():
                    if lo is not None:
                        t = t.filter(pc.greater_equal(t[c], pa.scalar(lo)))
                    if hi is not None:
                        t = t.filter(pc.less_equal(t[c], pa.scalar(hi)))
                out.append(t.select(out_schema.names))
            # skipped-partition batches still need the output schema
            return pa.concat_tables(out) if out else out_schema.empty_table()

        if not want:
            return rd.from_arrow(out_schema.empty_table())
        return rd.from_items(want, override_num_blocks=len(want)).map_batches(
            merge_chain, batch_size=1
        )

    def lookup(self, keys, manifest: Manifest | None = None,
               live_only: bool = True,
               columns: "Sequence[str] | None" = None) -> pa.Table:
        """Point lookups: read ONLY the partitions that own the requested
        ``(repo, path)`` keys — pid is recomputed with the WRITER's
        assignment (``stable_key_hash % P``), so the IO is O(partitions
        touched), never O(table).  The 100-TB point-read path: a handful
        of keys opens a handful of partition chains.  Keys absent from the
        table (or deleted, with ``live_only``) simply return no rows.
        ``columns`` pushes a projection into the parquet read (same
        contract as :meth:`read_state`)."""
        import numpy as np
        import pyarrow.compute as pc

        from cdm_data_loader_utils_ray.core.schemas import DELETED_COLUMN, KEY_COLUMNS
        from cdm_data_loader_utils_ray.stages.partition import stable_key_hash

        m = manifest or self.latest_manifest()
        out_schema = m.schema if m else pa.schema([])
        if columns is not None and m is not None:
            for c in columns:
                if c not in m.schema.names:
                    raise ValueError(f"columns entry {c!r} not in table schema")
            out_schema = pa.schema([f for f in m.schema if f.name in set(columns)])
        if live_only and DELETED_COLUMN in out_schema.names:
            out_schema = out_schema.remove(
                out_schema.get_field_index(DELETED_COLUMN)
            )
        if m is None or not m.partitions or not keys:
            return out_schema.empty_table()
        kt = pa.table(
            {
                KEY_COLUMNS[0]: pa.array([k[0] for k in keys], pa.string()),
                KEY_COLUMNS[1]: pa.array([k[1] for k in keys], pa.string()),
            }
        )
        sep = pa.scalar("\x1f")
        want = pc.binary_join_element_wise(
            kt[KEY_COLUMNS[0]], kt[KEY_COLUMNS[1]], sep
        )
        pids = stable_key_hash(kt, list(KEY_COLUMNS)) % np.uint64(m.num_partitions)
        out = []
        for pid in sorted(set(pids.astype(np.int64).tolist())):
            p = m.partitions.get(pid)
            if p is None:
                continue
            t = merge_chain_files(
                self.dir, p.files, m, columns=columns,
                delete_files=p.delete_files,
            )
            comp = pc.binary_join_element_wise(
                t[KEY_COLUMNS[0]].combine_chunks().cast(pa.string()),
                t[KEY_COLUMNS[1]].combine_chunks().cast(pa.string()),
                sep,
            )
            t = t.filter(pc.is_in(comp, value_set=want))
            if live_only and DELETED_COLUMN in t.column_names:
                t = t.filter(pc.equal(t[DELETED_COLUMN], False))
            t = t.select(out_schema.names)
            if t.num_rows:
                out.append(t)
        if not out:
            return out_schema.empty_table()
        return pa.concat_tables(out, promote_options="permissive")

    def read_state_arrow(self, manifest: Manifest | None = None, live_only: bool = True) -> pa.Table:
        """Driver-side full read — tests and small tables only.  LWW-merges
        each partition's delta chain (rename_history applied per file)."""
        m = manifest or self.latest_manifest()
        if m is None or not m.partitions:
            return (m.schema if m else pa.schema([])).empty_table()
        parts = [
            merge_chain_files(self.dir, p.files, m, delete_files=p.delete_files)
            for p in sorted(m.partitions.values(), key=lambda p: p.pid)
        ]
        t = pa.concat_tables(parts) if parts else m.schema.empty_table()
        if live_only and "is_deleted" in t.column_names:
            import pyarrow.compute as pc

            t = t.filter(pc.equal(t["is_deleted"], False)).drop_columns(["is_deleted"])
        return t

    # -- maintenance --------------------------------------------------------
    def read_changes(self, from_epoch: int | None, to_epoch: int | None = None):
        """Change Data Feed (Delta CDF analogue): the net per-key changes
        committed AFTER ``from_epoch`` up to ``to_epoch`` (default latest),
        as a Dataset with ``change_type`` ('upsert' | 'delete') plus the
        state columns.

        Churn-proportional: each partition reads ONLY the delta files its
        chain gained in the window (untouched partitions are skipped
        outright); within the window the files LWW-merge so a key changed
        twice emits once with its final value.  ``from_epoch=None`` means
        "from table creation".

        GRANULARITY SURVIVES COMPACTION (r3 verdict #3): the window is
        reconstructed by walking every intermediate manifest, collecting
        each epoch's appended delta files.  An epoch whose manifest is
        stamped ``state_preserving_rewrite`` (compact / chain-fold — the
        logical state is unchanged) contributes nothing and is skipped;
        the compacted-away delta files stay readable while the
        pre-compaction manifests sit inside ``vacuum(keep_epochs)``
        retention, so a consumer polling after a routine compact still
        receives O(churn), not O(table).  The full-current-state fallback
        remains only for: a state-CHANGING rewrite in the window
        (``update_where``), a partition remap (``migrate_partitions``),
        or window files already vacuumed away."""
        import ray.data as rd

        windows, m_to = self._change_windows(from_epoch, to_epoch)
        out_schema = m_to.schema.append(pa.field("change_type", pa.string()))
        if not windows:
            return rd.from_arrow(out_schema.empty_table())
        table_dir = self.dir
        pids = sorted(windows)

        dvs = {p.pid: list(p.delete_files) for p in m_to.partitions.values()}

        def changes(batch: dict) -> pa.Table:
            import pyarrow.compute as pc

            out = []
            for pid in batch["item"]:
                t = merge_chain_files(table_dir, windows[int(pid)], m_to)
                if "is_deleted" in t.column_names:
                    deleted = pc.equal(t["is_deleted"], True).to_numpy(
                        zero_copy_only=False
                    )
                else:
                    deleted = np.zeros(len(t), dtype=bool)
                # DV-deleted rows surface as change_type='delete' (MARK, not
                # drop): silently omitting them would leave a CDF consumer
                # holding the key's stale pre-delete value forever
                dv_mask = dv_delete_mask(table_dir, dvs.get(int(pid), []), t)
                if dv_mask is not None:
                    deleted |= dv_mask
                ct = pa.array(np.where(deleted, "delete", "upsert"))
                out.append(t.append_column("change_type", ct))
            return pa.concat_tables(out) if out else out_schema.empty_table()

        return rd.from_items(pids, override_num_blocks=len(pids)).map_batches(
            changes, batch_size=1
        )

    def _change_windows(
        self, from_epoch: int | None, to_epoch: int | None = None
    ) -> "tuple[dict[int, list[str]], Manifest]":
        """Per-partition delta-file windows in ``(from_epoch, to_epoch]``:
        pid -> files the chain gained, with the full-chain fallback folded
        in wherever per-epoch granularity is lost (state-changing rewrite,
        partition remap, vacuumed window files).  Shared by
        :meth:`read_changes` and the IVM refresh (``pipelines/ivm.py``) —
        the key set of the returned files is a SUPERSET of the keys whose
        winner changed in the window (exact per-key under granularity,
        whole-partition under fallback)."""
        m_to = self.latest_manifest() if to_epoch is None else self.read_manifest(to_epoch)
        if m_to is None:
            raise ValueError("no committed manifest")
        m_from = None if from_epoch is None else self.read_manifest(from_epoch)

        committed = sorted(
            int(f[len("manifest-"):-len(".json")])
            for f in os.listdir(self.manifest_dir)
            if f.startswith("manifest-")
        )
        lo = m_from.epoch if m_from else None
        walk = [e for e in committed if (lo is None or e > lo) and e <= m_to.epoch]

        windows: dict[int, list[str]] = {}
        fallback: set[int] = set()
        prev = m_from
        prev_chains = (
            {p.pid: list(p.files) for p in m_from.partitions.values()} if m_from else {}
        )
        prev_dvs = (
            {p.pid: list(p.delete_files) for p in m_from.partitions.values()}
            if m_from
            else {}
        )
        for e in walk:
            m_e = m_to if e == m_to.epoch else self.read_manifest(e)
            preserving = bool(m_e.metrics.get("state_preserving_rewrite", False))
            cur = {p.pid: list(p.files) for p in m_e.partitions.values()}
            cur_dvs = {p.pid: list(p.delete_files) for p in m_e.partitions.values()}
            if prev is not None and (
                m_e.num_partitions != prev.num_partitions
                or set(cur) != set(prev_chains)
            ):
                # partition remap (migrate): per-pid windows are meaningless
                # across it — full-state fallback for everything
                fallback.update(cur)
                windows.clear()
            else:
                for pid, files in cur.items():
                    old = prev_chains.get(pid, [])
                    if not preserving and cur_dvs.get(pid, []) != prev_dvs.get(
                        pid, []
                    ):
                        # equality-delete vector change: the deleted keys
                        # live in OLD chain files, so the append-only window
                        # cannot surface them — full chain for this pid (the
                        # merge marks DV hits change_type='delete').  A
                        # PRESERVING epoch that clears DVs (fold/compact
                        # materializing them) changes no state: skip.
                        fallback.add(pid)
                    if files[: len(old)] == old:
                        gained = files[len(old):]
                        if gained:
                            windows.setdefault(pid, []).extend(gained)
                    elif not preserving:
                        fallback.add(pid)  # state-changing rewrite
            prev, prev_chains, prev_dvs = m_e, cur, cur_dvs

        # degrade to full-state where retention already reclaimed window files
        for pid, files in list(windows.items()):
            if pid in fallback or any(
                not os.path.exists(self.abspath(f)) for f in files
            ):
                fallback.add(pid)
        to_chains = {p.pid: list(p.files) for p in m_to.partitions.values()}
        for pid in fallback:
            windows[pid] = to_chains.get(pid, [])
        windows = {pid: fs for pid, fs in windows.items() if fs and pid in to_chains}
        return windows, m_to

    def vacuum(self, keep_epochs: int = 2) -> list[str]:
        """Delete data files not referenced by the last ``keep_epochs``
        manifests (Delta ``VACUUM`` analogue).  Files stamped with an epoch
        ABOVE the committed LATEST are phase-1 writes of an in-flight epoch
        (written before its manifest commits) — deleting them would make the
        upcoming commit reference missing paths, so they are kept; so is any
        file whose name doesn't parse (conservative).  Epochs pinned by a
        snapshot TAG (:meth:`set_tag`) are retained regardless of
        ``keep_epochs`` — drop the tag to release the lease."""
        latest = self.latest_epoch()
        if latest is None:
            return []
        keep: set[str] = set()
        epochs = sorted(
            int(f[len("manifest-") : -len(".json")])
            for f in os.listdir(self.manifest_dir)
            if f.startswith("manifest-")
        )
        tagged = set(self.tags().values()) & set(epochs)
        for e in sorted(set(epochs[-keep_epochs:]) | tagged):
            for p in self.read_manifest(e).partitions.values():
                for f in p.files:
                    keep.add(self.abspath(f))
                for f in p.delete_files:
                    keep.add(self.abspath(f))
        removed = []
        for f in os.listdir(self.data_dir):
            path = os.path.join(self.data_dir, f)
            if path in keep or f.endswith(BLOOM_SIDECAR_SUFFIX):
                continue
            m = re.fullmatch(
                r"(?:part|dv)-\d+-epoch-(\d+)(?:-[0-9a-f]+)?\.parquet", f
            )
            if m is None or int(m.group(1)) > latest:
                continue  # in-flight phase-1 write or foreign file: keep
            os.unlink(path)
            removed.append(path)
            sc = path + BLOOM_SIDECAR_SUFFIX
            if os.path.exists(sc):
                os.unlink(sc)
        # orphan sweep: sidecars whose data file is gone (e.g. removed by a
        # pre-sidecar vacuum) are advisory metadata — safe to drop
        for f in os.listdir(self.data_dir):
            if f.endswith(BLOOM_SIDECAR_SUFFIX) and not os.path.exists(
                os.path.join(self.data_dir, f[: -len(BLOOM_SIDECAR_SUFFIX)])
            ):
                os.unlink(os.path.join(self.data_dir, f))
            # crashed write_partition temp (write-then-rename): safe to
            # drop once its epoch committed (nothing is still renaming it)
            m = re.match(r"(?:part|dv)-\d+-epoch-(\d+).*\.parquet\.tmp-", f)
            if m is not None and int(m.group(1)) <= latest:
                try:
                    os.unlink(os.path.join(self.data_dir, f))
                except FileNotFoundError:
                    pass
        if self._oslog is not None:
            # crash litter: staging keys whose epoch already committed
            self._oslog.gc_staged()
        # shuffle-staging litter: run-unique dirs (_staging/epoch-E-RUN)
        # from crashed runs; an epoch at or below LATEST has committed, so
        # nothing can still be reading its slices
        stage_root = os.path.join(self.dir, "_staging")
        if os.path.isdir(stage_root):
            import shutil

            for d in os.listdir(stage_root):
                m = re.match(r"(?:epoch|migrate)-(\d+)", d)
                if m is not None and int(m.group(1)) <= latest:
                    shutil.rmtree(os.path.join(stage_root, d), ignore_errors=True)
        return removed

    def preview(self, n: int = 10) -> pa.Table:
        """SELECT * LIMIT n over committed state (reference
        ``preview_or_skip``, ``utils/spark_delta.py:227-237``): merges one
        partition chain at a time until n rows are collected."""
        m = self.latest_manifest()
        if m is None or not m.partitions:
            return (m.schema if m else pa.schema([])).empty_table()
        out: list[pa.Table] = []
        got = 0
        for p in sorted(m.partitions.values(), key=lambda p: p.pid):
            t = merge_chain_files(self.dir, p.files, m, delete_files=p.delete_files)
            out.append(t.slice(0, n - got))
            got += min(len(t), n - got)
            if got >= n:
                break
        return pa.concat_tables(out)


class Catalog:
    """Namespace -> table registry (Hive-metastore analogue, reference
    ``register_table`` ``refseq_pipeline/core/spark_delta.py:160-175``):
    just a directory tree ``<root>/<namespace>/<table>``."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # roll forward any transaction that crashed mid-publish: journals
        # under <root>/_txn are complete flip sets by construction
        # (pipelines/txn.py), so recovery on open is always safe
        from cdm_data_loader_utils_ray.pipelines.txn import recover_transactions

        recover_transactions(self.txn_dir)

    @property
    def txn_dir(self) -> str:
        return os.path.join(self.root, "_txn")

    def transaction(self, commits: "list[tuple[LakeTable, Manifest]]") -> str:
        """Atomically commit several (table, manifest) pairs — see
        ``pipelines/txn.commit_transaction`` for the protocol and the
        isolation trade."""
        from cdm_data_loader_utils_ray.pipelines.txn import commit_transaction

        return commit_transaction(commits, self.txn_dir)

    def table(self, namespace: str, name: str) -> LakeTable:
        return LakeTable(os.path.join(self.root, namespace, name))

    def tables(self, namespace: str) -> list[str]:
        d = os.path.join(self.root, namespace)
        if not os.path.isdir(d):
            return []
        return sorted(
            t for t in os.listdir(d) if os.path.isdir(os.path.join(d, t, MANIFEST_DIR))
        )
