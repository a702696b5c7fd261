"""Table profiling: per-column stats over a Dataset in two bounded passes.

Deequ/Spark-``describe``-style data profiling as first-class engine ops
(the reference's validation metrics — ``validation/run.py`` counts — only
profile validity, not the data itself):

* pass 1 — NO shuffle: one ``map_batches`` emitting a k-row partial per
  block (count / nulls / min / max per column), folded on the driver —
  driver state is O(blocks x columns) rows of scalars, never data;
* pass 2 — ONE shuffle for ALL columns: exact distinct counts via
  (column, stringified value) pairs, distinct-within-batch combiner,
  hash-bucketed global distinct, per-column partial counts summed.

Only exactly-mergeable stats (count, nulls, min, max, distinct) are
computed — no float sums whose accumulation order could differ between
runs or engines.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_NUMERIC = "numeric"
_STRING = "string"
_TEMPORAL = "temporal"


def _kind(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t):
        return _NUMERIC
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
        return _TEMPORAL
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return _STRING
    raise ValueError(f"profile: unsupported column type {t}")


def profile(ds, columns: Sequence[str], num_buckets: int = 64) -> pd.DataFrame:
    """Profile ``columns`` of ``ds``: one row per column with ``n_rows``,
    ``n_nulls``, ``n_distinct`` (exact), ``min_num``/``max_num`` (numeric
    columns, as float64) and ``min_str``/``max_str`` (string columns
    verbatim; temporal columns formatted ``%Y-%m-%d %H:%M:%S``).

    Exact at any scale: the min/max/count pass never shuffles, and the
    distinct pass is one hash-bucketed shuffle of the DISTINCT-per-batch
    (column, value) pairs for all profiled columns together.
    """
    from cdm_data_loader_utils_ray.functions.aggregates import grouped_partial_sums
    from cdm_data_loader_utils_ray.stages.keyed import _BUCKET, _add_bucket, _arrow_schema

    cols = list(columns)
    schema = _arrow_schema(ds)  # handles pandas-backed datasets too
    kinds = {c: _kind(schema.field(c).type) for c in cols}

    # ---- pass 1: count / nulls / min / max (no shuffle) --------------------
    def partial(batch: pa.Table) -> pa.Table:
        rows = {
            "column": [], "n_rows": [], "n_nulls": [],
            "min_num": [], "max_num": [], "min_str": [], "max_str": [],
        }
        for c in cols:
            arr = batch[c]
            mm = pc.min_max(arr)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            rows["column"].append(c)
            rows["n_rows"].append(len(arr))
            rows["n_nulls"].append(arr.null_count)
            if kinds[c] == _NUMERIC:
                rows["min_num"].append(None if lo is None else float(lo))
                rows["max_num"].append(None if hi is None else float(hi))
                rows["min_str"].append(None)
                rows["max_str"].append(None)
            elif kinds[c] == _TEMPORAL:
                fmt = "%Y-%m-%d %H:%M:%S"
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["min_str"].append(None if lo is None else lo.strftime(fmt))
                rows["max_str"].append(None if hi is None else hi.strftime(fmt))
            else:
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["min_str"].append(lo)
                rows["max_str"].append(hi)
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                "n_rows": pa.array(rows["n_rows"], pa.int64()),
                "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
                "min_num": pa.array(rows["min_num"], pa.float64()),
                "max_num": pa.array(rows["max_num"], pa.float64()),
                "min_str": pa.array(rows["min_str"], pa.string()),
                "max_str": pa.array(rows["max_str"], pa.string()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("column", sort=False)
    folded = pd.DataFrame(
        {
            "n_rows": g["n_rows"].sum(),
            "n_nulls": g["n_nulls"].sum(),
            "min_num": g["min_num"].min(),
            "max_num": g["max_num"].max(),
            "min_str": g["min_str"].min(),
            "max_str": g["max_str"].max(),
        }
    )

    # ---- pass 2: exact distinct for all columns in ONE shuffle -------------
    def pairs(batch: pa.Table) -> pa.Table:
        outs = []
        for c in cols:
            arr = batch[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arr = arr.drop_null()
            # cast is injective per column (fixed source type), so distinct
            # counts over the strings equal distinct counts over the values
            vals = pc.cast(arr, pa.string())
            t = pa.table({"column": pa.array([c] * len(vals), pa.string()),
                          "value": vals})
            outs.append(t.group_by(["column", "value"]).aggregate([]))
        merged = pa.concat_tables(outs)
        return _add_bucket(merged, ["column", "value"], num_buckets)

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["column", "value"])
        out = d.groupby("column", sort=False).size().rename("nd").reset_index()
        return out[["column", "nd"]]

    nd_parts = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(count_distinct, batch_format="pandas")
    )
    nd = grouped_partial_sums(nd_parts, ["column"], {"n_distinct": "nd"},
                              count_alias="__nb").to_pandas()
    folded = folded.join(nd.set_index("column")["n_distinct"], how="left")
    folded["n_distinct"] = folded["n_distinct"].fillna(0).astype("int64")

    out = folded.reset_index().rename(columns={"index": "column"})
    return out[
        ["column", "n_rows", "n_nulls", "n_distinct",
         "min_num", "max_num", "min_str", "max_str"]
    ].sort_values("column", kind="mergesort").reset_index(drop=True)
