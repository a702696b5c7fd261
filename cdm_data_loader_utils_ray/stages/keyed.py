"""Generic keyed operators: distributed last-writer-wins reduce and
full-outer snapshot diff.

Both use the same scalable shape: a *within-batch* vectorized combiner in
``map_batches`` (collapses the stream before the exchange), then ONE
``groupby(bucket)`` shuffle where each bucket handles thousands of keys with
a single vectorized pandas kernel — never one Python call per key.

Reference parity:
* LWW reduce = dedup-ranking window ``row_number().over(partitionBy(key)
  .orderBy(...)) == 1`` (``refseq_pipeline/core/spark_delta.py:130-139``) and
  latest-report-per-taxon (``taxon_processing.py:103-105``);
* outer diff = the snapshot change-event derivation: full outer join on the
  key + null-classification into new/updated/deleted/unchanged
  (``snapshot_utils.py:37-61``, ``hashes_diff.py:75-78``).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.stages.partition import stable_key_hash
from cdm_data_loader_utils_ray.state.upsert import _lww_take_indices

_BUCKET = "__bucket__"


def _add_bucket(batch: pa.Table, key_columns: Sequence[str], num_buckets: int) -> pa.Table:
    b = (stable_key_hash(batch, key_columns) % np.uint64(num_buckets)).astype(np.int32)
    if _BUCKET in batch.column_names:
        batch = batch.drop_columns([_BUCKET])
    return batch.append_column(_BUCKET, pa.array(b, type=pa.int32()))


def _lww_pandas(df: pd.DataFrame, key_columns: list[str], seq_column: str) -> pd.DataFrame:
    df = df.sort_values(seq_column, kind="stable")
    return df.drop_duplicates(subset=key_columns, keep="last")


def lww_latest(
    ds,
    key_columns: Sequence[str],
    seq_column: str = "seq",
    num_buckets: int = 64,
    batch_size: int = 65536,
    keep: str = "max",
):
    """Distributed argmax-by-``seq_column`` per key: returns one row per key,
    the one with the greatest sequence value (``keep="min"`` flips to the
    least — works for string seqs too, no sign trick).  Ties broken by
    input order (stable), matching ``keep='last'`` on a stably sorted frame.

    PRECONDITION: key columns must be non-null (the CDC schema enforces
    this; validate upstream otherwise) — Arrow's boundary detection treats
    null keys as distinct, so every null-key row would survive."""
    keys = list(key_columns)
    seq_order = "ascending" if keep == "max" else "descending"

    def combine(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            # keep the bucket column even on empty blocks — a block missing
            # the groupby key would give the shuffle heterogeneous schemas
            return _add_bucket(batch, keys, num_buckets)
        # Arrow-native per-key argmax (state.upsert._lww_take_indices): one
        # multi-key sort_indices + boundary detection — no pandas round-trip
        # of the payload columns in the map stage.
        out = batch.take(_lww_take_indices(batch, keys, seq_column, seq_order))
        return _add_bucket(out, keys, num_buckets)

    def reduce_bucket(group: pa.Table) -> pa.Table:
        return group.take(
            _lww_take_indices(group, keys, seq_column, seq_order)
        ).drop_columns([_BUCKET])

    return (
        ds.map_batches(combine, batch_format="pyarrow", batch_size=batch_size)
        .groupby(_BUCKET)
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )


CHANGE_TYPES = ("new", "updated", "deleted", "unchanged")


def outer_diff(
    old_ds,
    new_ds,
    key_columns: Sequence[str],
    compare_column: str,
    num_buckets: int = 64,
    keep_unchanged: bool = True,
    carry_columns: Sequence[str] = (),
):
    """Full-outer snapshot diff: classify each key as new / updated /
    deleted / unchanged by comparing ``compare_column`` across the two
    snapshots (the reference's change-event derivation J1).

    Returns a Dataset with columns: keys..., ``change_type``,
    ``old_<compare>``, ``new_<compare>`` and optional carried columns
    (prefixed old_/new_).
    """
    keys = list(key_columns)
    carry = list(carry_columns)
    old_col, new_col = f"old_{compare_column}", f"new_{compare_column}"

    def tag(side: str):
        def _t(batch: pa.Table) -> pa.Table:
            cols = keys + [compare_column] + carry
            batch = batch.select([c for c in cols if c in batch.column_names])
            batch = batch.append_column("__side__", pa.array([side] * len(batch)))
            return _add_bucket(batch, keys, num_buckets)

        return _t

    tagged = old_ds.map_batches(tag("old"), batch_format="pyarrow").union(
        new_ds.map_batches(tag("new"), batch_format="pyarrow")
    )

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["__side__"] == "old"].drop(columns=["__side__", _BUCKET])
        n = df[df["__side__"] == "new"].drop(columns=["__side__", _BUCKET])
        ren_o = {compare_column: old_col, **{c: f"old_{c}" for c in carry}}
        ren_n = {compare_column: new_col, **{c: f"new_{c}" for c in carry}}
        # side presence comes from the merge indicator, NOT from null-ness
        # of the compared value: a present row whose compare value is null
        # must still classify by presence (null==null compares False)
        m = o.rename(columns=ren_o).merge(
            n.rename(columns=ren_n), on=keys, how="outer", sort=False,
            indicator=True,
        )
        presence = m["_merge"]
        m = m.drop(columns=["_merge"])
        same = (m[old_col] == m[new_col]) | (m[old_col].isna() & m[new_col].isna())
        m["change_type"] = np.select(
            [presence == "right_only", presence == "left_only", same],
            ["new", "deleted", "unchanged"],
            default="updated",
        )
        if not keep_unchanged:
            m = m[m["change_type"] != "unchanged"]
        return m

    return tagged.groupby(_BUCKET).map_groups(classify, batch_format="pandas")


def _arrow_schema(ds) -> pa.Schema:
    """The dataset's schema as a ``pyarrow.Schema``.  Pandas-backed
    datasets (``from_pandas`` lineages) report a PandasBlockSchema; map
    its numpy dtypes directly (object -> string, the pandas-block text
    convention) rather than sampling a row — a 0-row sample would type
    object columns as null, which Arrow's join kernel rejects."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base

    def _to_arrow(t) -> pa.DataType:
        if t == np.dtype("O"):
            return pa.string()
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            # pandas extension dtypes: let Arrow derive the real type from
            # a zero-row typed Series (nullable Int64 -> int64, categorical
            # -> dictionary, tz-aware datetime -> timestamp) instead of
            # blanket-mapping everything to timestamp (r3 ADVICE: a
            # nullable-Int64 join key would otherwise declare a bogus
            # timestamp schema and fail/miscast at execution)
            try:
                return pa.Array.from_pandas(pd.Series([], dtype=t)).type
            except Exception:
                if getattr(t, "kind", None) == "M" or "datetime" in str(t):
                    return pa.timestamp("us")
                raise TypeError(
                    f"cannot map pandas dtype {t!r} to an Arrow type for join schema"
                ) from None

    return pa.schema([(n, _to_arrow(t)) for n, t in zip(base.names, base.types)])


def hash_join(
    left_ds,
    right_ds,
    on: Sequence[str],
    how: str = "inner",
    num_buckets: int = 64,
    suffix: str = "_right",
):
    """Partitioned hash join for two LARGE sides: bucket both on the key
    hash (one shuffle each), Arrow hash join per bucket.  For a small side
    use a broadcast lookup instead (SURVEY §2.5 J4/J5 — no shuffle at all).
    Skewed keys: salt upstream; a single key's rows must fit one bucket.
    Null join keys never match (Arrow join semantics, same as SQL)."""
    keys = list(on)
    left_sch = _arrow_schema(left_ds)
    right_sch = _arrow_schema(right_ds)
    left_cols = list(left_sch.names)
    right_cols = list(right_sch.names)
    left_types = {f.name: f.type for f in left_sch}
    right_types = {f.name: f.type for f in right_sch}
    join_type = {"inner": "inner", "left": "left outer", "outer": "full outer",
                 "right": "right outer"}[how]

    def tag(side: str):
        def _t(batch: pa.Table) -> pa.Table:
            b = batch.append_column("__side__", pa.array([side] * len(batch)))
            return _add_bucket(b, keys, num_buckets)

        return _t

    tagged = left_ds.map_batches(tag("l"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r"), batch_format="pyarrow")
    )

    def _side(group: pa.Table, side: str, cols: list[str], types: dict) -> pa.Table:
        hit = group.filter(pc.equal(group["__side__"], side))
        # a group made of one side's blocks lacks the other side's columns
        # entirely (or carries them null-typed from the union promote);
        # align to the side's DECLARED types — Arrow's join rejects
        # null-typed non-key fields
        out = {}
        for c in cols:
            if c in hit.column_names and not pa.types.is_null(hit[c].type):
                out[c] = hit[c].cast(types[c])
            else:
                out[c] = pa.nulls(len(hit), type=types[c])
        return pa.table(out)

    def join_bucket(group: pa.Table) -> pa.Table:
        # Arrow-native per-bucket hash join (C++ kernel) — no pandas
        # round-trip of the payload columns
        l = _side(group, "l", left_cols, left_types)
        r = _side(group, "r", right_cols, right_types)
        return l.join(r, keys=keys, join_type=join_type, right_suffix=suffix)

    return tagged.groupby(_BUCKET).map_groups(join_bucket, batch_format="pyarrow")


def broadcast_hash_join(
    left_ds,
    right_table: pa.Table | "object",
    on: Sequence[str] | str,
    how: str = "inner",
    suffix: str = "_right",
):
    """Hash join where the RIGHT side fits in one broadcast object — the
    "broadcast join under the threshold" physical plan: the right side is
    pinned in the object store ONCE (``ray.put``) and every left batch
    joins against it with the Arrow C++ join kernel inside ``map_batches``
    — ZERO shuffle; the left side streams.  Inner and left joins only:
    each left batch joins independently, so emitting unmatched RIGHT rows
    (right/full outer) would need a global pass — use :func:`hash_join`.

    ``right_table`` is a ``pyarrow.Table`` or a Ray Dataset (materialized
    here).  The caller asserts smallness — the table lives on the driver
    once and in plasma once; ~<100 MB is comfortable, past that use
    :func:`hash_join` (or salt + :func:`hash_join_salted` for skew).
    Null join keys never match (Arrow join semantics, same as SQL)."""
    import ray

    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("broadcast_hash_join supports inner/left joins only")
    join_type = {"inner": "inner", "left": "left outer"}[how]
    if not isinstance(right_table, pa.Table):
        right_table = pa.concat_tables(
            ray.get(right_table.to_arrow_refs()), promote_options="default"
        )
    right_ref = ray.put(right_table.combine_chunks())

    def join_batch(batch: pa.Table) -> pa.Table:
        r = ray.get(right_ref)  # zero-copy plasma read, cached per node
        return batch.join(r, keys=keys, join_type=join_type, right_suffix=suffix)

    return left_ds.map_batches(join_batch, batch_format="pyarrow")


def anti_join_keys(left_ds, right_ds, key_columns: Sequence[str], num_buckets: int = 64):
    """Left-anti by key (reference ``snapshot_utils.py:16-31`` new-only /
    removed-only): rows of ``left_ds`` whose key does not appear in
    ``right_ds``.  Same single-shuffle bucket shape."""
    keys = list(key_columns)

    def tag(side: str):
        def _t(batch: pa.Table) -> pa.Table:
            if side == "right":
                batch = batch.select(keys)
            batch = batch.append_column("__side__", pa.array([side] * len(batch)))
            return _add_bucket(batch, keys, num_buckets)

        return _t

    tagged = left_ds.map_batches(tag("left"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("right"), batch_format="pyarrow")
    )

    def keep_left_only(df: pd.DataFrame) -> pd.DataFrame:
        right_keys = df.loc[df["__side__"] == "right", keys].drop_duplicates()
        left = df[df["__side__"] == "left"].drop(columns=[_BUCKET])
        m = left.merge(right_keys.assign(__hit__=1), on=keys, how="left")
        out = m[m["__hit__"].isna()].drop(columns=["__hit__", "__side__"])
        return out

    return tagged.groupby(_BUCKET).map_groups(keep_left_only, batch_format="pandas")


def hot_keys(ds, key_column: str, hot_frac: float = 0.01, per_batch_top: int = 200):
    """Keys carrying more than ``hot_frac`` of the dataset's rows, found
    with one combiner pass: each batch emits its top ``per_batch_top``
    key counts plus its row count; the driver folds (aggregate-sized).
    Heuristic by design — a key hot globally is hot in its batches too;
    misses only affect balance downstream, never correctness."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[key_column].value_counts().head(per_batch_top)
        out = pd.DataFrame({key_column: vc.index, "c": vc.to_numpy()})
        return pd.concat(
            [out, pd.DataFrame({key_column: [None], "c": [len(df)]})],
            ignore_index=True,
        )

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    total = int(parts.loc[parts[key_column].isna(), "c"].sum())
    counts = parts.dropna(subset=[key_column]).groupby(key_column, sort=False)["c"].sum()
    if total == 0:
        return counts.index[:0]
    return counts.index[counts >= hot_frac * total]


def hash_join_salted(
    left_ds,
    right_ds,
    on: str,
    how: str = "inner",
    num_salts: int = 8,
    hot_frac: float = 0.01,
    num_buckets: int = 64,
    suffix: str = "_right",
):
    """:func:`hash_join` for a SKEWED left side: keys above ``hot_frac``
    of left rows are salted into ``num_salts`` sub-keys (left rows get a
    round-robin salt; the matching right rows are replicated once per
    salt), so no single bucket receives a hot key's full row set.  The
    join key is extended with the salt and stripped after the join —
    results are row-identical to the unsalted join.  Inner and left joins
    only (replication would duplicate unmatched right rows under
    right/full outer).  Single-column key by design."""
    if how not in ("inner", "left"):
        raise ValueError("hash_join_salted supports inner/left joins only")
    import ray

    hot = np.asarray(hot_keys(left_ds, on, hot_frac=hot_frac))
    hot_ref = ray.put(hot)
    salt_t = pa.int32()

    def salt_left(batch: pa.Table) -> pa.Table:
        keys = batch[on].to_numpy(zero_copy_only=False)
        mask = np.isin(keys, ray.get(hot_ref))
        salt = np.where(mask, np.arange(len(keys), dtype=np.int64) % num_salts, 0)
        return batch.append_column("__salt__", pa.array(salt.astype(np.int32), type=salt_t))

    def salt_right(batch: pa.Table) -> pa.Table:
        keys = batch[on].to_numpy(zero_copy_only=False)
        mask = np.isin(keys, ray.get(hot_ref))
        cold = batch.filter(pa.array(~mask))
        cold = cold.append_column(
            "__salt__", pa.array(np.zeros(len(cold), dtype=np.int32), type=salt_t)
        )
        hot_rows = batch.filter(pa.array(mask))
        reps = [
            hot_rows.append_column(
                "__salt__", pa.array(np.full(len(hot_rows), s, dtype=np.int32), type=salt_t)
            )
            for s in range(num_salts)
        ]
        return pa.concat_tables([cold, *reps])

    joined = hash_join(
        left_ds.map_batches(salt_left, batch_format="pyarrow"),
        right_ds.map_batches(salt_right, batch_format="pyarrow"),
        on=[on, "__salt__"],
        how=how,
        num_buckets=num_buckets,
        suffix=suffix,
    )
    return joined.map_batches(
        lambda b: b.drop_columns(["__salt__"]), batch_format="pyarrow"
    )


def semi_join_keys(left_ds, right_ds, key_columns: Sequence[str], num_buckets: int = 64):
    """Left-SEMI by key (EXISTS): rows of ``left_ds`` whose key appears in
    ``right_ds`` — the dual of :func:`anti_join_keys`, same single-shuffle
    bucket shape, right side reduced to distinct keys inside the bucket."""
    keys = list(key_columns)

    def tag(side: str):
        def _t(batch: pa.Table) -> pa.Table:
            if side == "right":
                batch = batch.select(keys)
            batch = batch.append_column("__side__", pa.array([side] * len(batch)))
            return _add_bucket(batch, keys, num_buckets)

        return _t

    tagged = left_ds.map_batches(tag("left"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("right"), batch_format="pyarrow")
    )

    def keep_left_match(df: pd.DataFrame) -> pd.DataFrame:
        right_keys = df.loc[df["__side__"] == "right", keys].drop_duplicates()
        left = df[df["__side__"] == "left"].drop(columns=[_BUCKET])
        m = left.merge(right_keys.assign(__hit__=1), on=keys, how="left")
        out = m[m["__hit__"].notna()].drop(columns=["__hit__", "__side__"])
        return out

    return tagged.groupby(_BUCKET).map_groups(keep_left_match, batch_format="pandas")
