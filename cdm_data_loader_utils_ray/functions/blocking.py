"""Sorted-neighborhood blocking (Hernandez-Stolfo SNM): candidate pairs
for entity resolution by global sort order, without a global sort.

Classic ER blocking: sort all records by a blocking key, slide a window of
size ``w``, every pair inside a window is a candidate.  The scale shape
here mirrors ``stages/global_order``:

1. boundary pass — a bounded per-batch sample of keys picks
   ``num_buckets`` STRING range boundaries (sampling only affects bucket
   BALANCE, never correctness: bucket assignment is an order-monotone
   function of the key, so equal keys never straddle a boundary);
2. offset pass — exact per-bucket counts fold to cumulative offsets on
   the driver (#buckets rows);
3. rank shuffle — each order bucket sorts locally by (key, id) and adds
   its offset: exact global row numbers, consecutive integers;
4. pair shuffle — ranks tile into blocks; each row also replicates to the
   PREVIOUS tile when within ``window`` of its start (the interval-join
   overlap trick), and each tile emits only the pairs whose LEFT row it
   owns — every pair exactly once, no dedup pass.

Candidate count is ``<= n * window`` by construction — the point of SNM
over naive all-pairs blocking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.functions.aggregates import grouped_partial_sums


def _bucket_by_bounds(keys: pa.Array, bounds: list[str]) -> np.ndarray:
    """Order-monotone bucket id per key: number of boundaries <= key.
    Vectorized as one comparison per boundary (#buckets is small)."""
    out = np.zeros(len(keys), dtype=np.int64)
    for b in bounds:
        out += pc.greater_equal(keys, pa.scalar(b)).to_numpy(zero_copy_only=False)
    return out


def sorted_neighborhood_pairs(
    ds,
    key_column: str,
    id_column: str,
    window: int,
    num_buckets: int = 32,
    sample_per_batch: int = 64,
    tile_rows: int | None = None,
):
    """Candidate pairs ``(id_a, id_b, rn_a, rn_b)`` with rank distance
    ``0 < rn_b - rn_a <= window`` in the global (key, id) sort order.
    Ranks are 1-based and exact; ties in the key are broken by id, so the
    order (and therefore the pair set) is total and deterministic."""
    if window < 1:
        raise ValueError("window must be >= 1")
    T = int(tile_rows or max(window * 64, 1024))

    # -- 1. boundary pass: bounded string sample -> quantile boundaries ---
    def sample(batch: pa.Table) -> pa.Table:
        k = pc.fill_null(batch[key_column].combine_chunks().cast(pa.string()), "")
        n = len(k)
        if n == 0:
            return pa.table({"k": pa.array([], type=pa.string())})
        take = np.linspace(0, n - 1, num=min(n, sample_per_batch)).astype(np.int64)
        return pa.table({"k": k.take(pa.array(np.unique(take)))})

    samp = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    ks = np.sort(samp["k"].to_numpy())
    if len(ks) == 0:
        return ds.map_batches(
            lambda t: pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "rn_a": pa.array([], type=pa.int64()),
                    "rn_b": pa.array([], type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    bounds = sorted(
        {str(ks[int(i * len(ks) / num_buckets)]) for i in range(1, num_buckets)}
    )

    def tag(batch: pa.Table) -> pa.Table:
        k = pc.fill_null(batch[key_column].combine_chunks().cast(pa.string()), "")
        return pa.table(
            {
                "__k__": k,
                id_column: batch[id_column],
                "__obucket__": pa.array(_bucket_by_bounds(k, bounds)),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    # -- 2. offset pass: exact per-bucket counts -> cumulative offsets ----
    counts = grouped_partial_sums(
        tagged, ["__obucket__"], {}, count_alias="n"
    ).to_pandas()
    counts = counts.sort_values("__obucket__")
    offsets = {
        int(b): int(o)
        for b, o in zip(
            counts["__obucket__"], counts["n"].cumsum().shift(fill_value=0)
        )
    }

    # -- 3. rank shuffle: local sort + offset = exact global row number ---
    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        off = offsets[int(df["__obucket__"].iloc[0])]
        df = df.sort_values(["__k__", id_column], kind="mergesort")
        rn = np.arange(1, len(df) + 1, dtype=np.int64) + off
        out = pd.DataFrame({id_column: df[id_column].to_numpy(), "rn": rn})
        # -- 4a. tile replication happens here (saves a full extra pass):
        # each row joins its own tile, plus the previous tile when within
        # ``window`` of its tile start
        tile = rn // T
        prev = (rn % T) < window
        rep = pd.concat(
            [out.assign(__tile__=tile), out[prev].assign(__tile__=tile[prev] - 1)],
            ignore_index=True,
        )
        return rep[rep["__tile__"] >= 0]

    ranked = tagged.groupby("__obucket__").map_groups(
        rank_bucket, batch_format="pandas"
    )

    # -- 4b. pair emission: a tile owns pairs whose LEFT row it owns ------
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        tile = int(df["__tile__"].iloc[0])
        df = df.sort_values("rn", kind="mergesort")
        rn = df["rn"].to_numpy(np.int64)
        ids = df[id_column].to_numpy()
        owned = (rn // T) == tile
        # partners of row p: positions p+1 .. hi_p (rn <= rn_p + window)
        hi = np.searchsorted(rn, rn + window, side="right")
        pos = np.arange(len(rn))
        cnt = np.where(owned, hi - pos - 1, 0)
        left = np.repeat(pos, cnt)
        right = (
            np.arange(int(cnt.sum()))
            - np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
            + left
            + 1
        )
        return pd.DataFrame(
            {
                "id_a": ids[left],
                "id_b": ids[right],
                "rn_a": rn[left],
                "rn_b": rn[right],
            }
        )

    return ranked.groupby("__tile__").map_groups(pairs, batch_format="pandas")
