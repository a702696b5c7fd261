"""Group-wise 2-D Pareto frontier (skyline) — dominance pruning.

A row survives iff no other row of its group is >= on BOTH dimensions with
at least one strict inequality (maximize-maximize; negate a column to
minimize it).  Duplicate (x, y) points dominate neither each other and
survive or fall together.

Scale shape: the skyline of a union is the skyline of the union of local
skylines, so a ``map_batches`` local-skyline pass prunes nearly everything
(the frontier of an n-point batch is O(log n) EXPECTED for independent
dims), and the union of local frontiers folds once with the same kernel.
The final fold runs driver-side and is frontier-sized by construction —
worst case (perfectly anti-correlated dims) the frontier is O(n) and this
op degenerates; that is a property of the problem, not the plan.

The kernel is fully vectorized: collapse to unique (group, x, y) points,
keep the max-y point per (group, x), then one descending-x pass per group
where a point survives iff its y strictly exceeds the running max of all
strictly-greater-x points (groupby cummax + shift — no Python loop)."""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
import pyarrow as pa


def _frontier_points(
    df: pd.DataFrame, by: list[str], x: str, y: str
) -> pd.DataFrame:
    """Surviving unique (by, x, y) points of the frontier."""
    u = df[by + [x, y]].drop_duplicates()
    # per (group, x): only the max-y point can survive (same x, larger y
    # dominates)
    s = u.groupby(by + [x], sort=False, dropna=False, as_index=False)[y].max()
    s = s.sort_values(by + [x], ascending=[True] * len(by) + [False], kind="stable")
    if by:
        codes = s.groupby(by, sort=False, dropna=False).ngroup().to_numpy()
        cm = s.groupby(codes, sort=False)[y].cummax()
        prev_cm = cm.groupby(codes, sort=False).shift()
    else:
        cm = s[y].cummax()
        prev_cm = cm.shift()
    keep = prev_cm.isna() | (s[y] > prev_cm)
    return s[keep.to_numpy()]


def _local_skyline(df: pd.DataFrame, by: list[str], x: str, y: str) -> pd.DataFrame:
    if len(df) == 0:
        return df
    pts = _frontier_points(df, by, x, y)
    return df.merge(pts[by + [x, y]], on=by + [x, y], how="inner")


def pareto_frontier(
    ds,
    x_col: str,
    y_col: str,
    by: Sequence[str] | None = None,
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Rows of ``ds`` on the maximize-(x_col, y_col) Pareto frontier within
    each ``by`` group (global frontier when ``by`` is None).  Returns a
    pandas DataFrame — frontier-sized by construction (see module note on
    the anti-correlated worst case)."""
    grp = list(by or [])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return _local_skyline(df, grp, x_col, y_col)

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    return _local_skyline(cand, grp, x_col, y_col).reset_index(drop=True)
