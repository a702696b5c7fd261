"""Sequence packing: next-fit bin assignment of weighted items (document
chunks, whole documents) into fixed token-budget bins — the step that
turns a curated corpus into dense training context windows.

Semantics (deterministic, engine-independent): within each group, items
are visited in ``order_columns`` order; a running token sum accumulates,
and when ``acc + w > budget`` a NEW bin opens with ``acc = w`` (an item
heavier than the whole budget therefore occupies a bin alone).  Bin ids
start at 0 per group.

Distribution: packing is inherently SEQUENTIAL within a group — that is
its semantics, not an implementation accident — so the operator shuffles
once on the group key and walks each group's rows in order.  Choose the
group column so single groups fit a worker (language / source / shard id);
at 100 TB you pack within shard-sized groups, never globally.  The
per-group walk is a numpy loop over ints (no string work), ~10M rows/s —
the shuffle dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.stages.keyed import _add_bucket


def _next_fit(weights: np.ndarray, budget: int) -> np.ndarray:
    """Bin id per item (items already in pack order)."""
    bins = np.zeros(len(weights), dtype=np.int64)
    acc = 0
    b = 0
    for i, w in enumerate(weights):
        w = int(w)
        if i > 0 and acc + w > budget:
            b += 1
            acc = w
        else:
            acc += w
        bins[i] = b
    return bins


def next_fit_pack(
    ds,
    group_column: str,
    order_columns: Sequence[str],
    weight_column: str,
    budget: int,
    bin_column: str = "bin_id",
    num_buckets: int = 64,
):
    """Assign ``bin_column`` per row: next-fit packing of ``weight_column``
    into ``budget``-sized bins, grouped by ``group_column``, visiting rows
    in ``order_columns`` order.  One hash-bucket shuffle on the group key
    (a bucket packs its groups independently — a group never spans
    buckets).  Null weights are rejected with a clear error (there is no
    sensible token count for them); null group keys pack together as one
    group, matching SQL GROUP BY."""
    order = list(order_columns)

    def bucketed(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [group_column], num_buckets)

    def pack_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["__bucket__"]).sort_values(
            [group_column] + order, kind="stable"
        )
        w = df[weight_column].to_numpy()
        if pd.isna(w).any():
            raise ValueError(
                f"next_fit_pack: null values in weight column "
                f"{weight_column!r} — fill or filter them before packing"
            )
        gids = df[group_column].to_numpy()
        # NaN != NaN would make every null-keyed row its own group; a
        # both-NaN check groups them together (SQL GROUP BY semantics)
        nan = pd.isna(gids)
        out = np.empty(len(df), dtype=np.int64)
        start = 0
        for i in range(1, len(df) + 1):
            if i == len(df) or (
                gids[i] != gids[start] and not (nan[i] and nan[start])
            ):
                out[start:i] = _next_fit(w[start:i], budget)
                start = i
        df[bin_column] = out
        return df

    return (
        ds.map_batches(bucketed, batch_format="pyarrow")
        .groupby("__bucket__")
        .map_groups(pack_bucket, batch_format="pandas")
    )
