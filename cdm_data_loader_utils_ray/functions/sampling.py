"""Deterministic hash-based sampling and dataset splitting.

The scalable sampling primitive for a 100-TB corpus is a pure function of
the row's stable id: ``md5(str(id))`` read as a fraction of 2^128 compared
against the rate.  No RNG state, no coordination, no second pass — every
worker decides independently, reruns and resumes pick the same rows, and a
DuckDB oracle reproduces the exact row set (md5 is engine-independent,
and comparing the lowercase hex digest lexicographically IS the numeric
comparison, since the strings are fixed-width).

Reference parity: the reference samples previews with driver ``limit()``
(``sinks/lake.py`` preview path covers that); content-hash bucketing for
deterministic selection follows its sha-based id discipline
(``cdm_task_service/ids.py`` style).  The stratified form is the standard
training-data recipe (per-language / per-source quotas).
"""

from __future__ import annotations

import hashlib
from collections.abc import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from cdm_data_loader_utils_ray.stages.keyed import _BUCKET, _add_bucket


def _hex_threshold(rate: float) -> str:
    """32-hex-digit threshold: keep iff md5 hex digest < threshold.
    Lexicographic comparison of fixed-width lowercase hex IS the numeric
    comparison.  rate >= 1 returns ``"g"`` — greater than every hex digest
    (33-char ``format(2**128)`` would sort BELOW digests starting >= '1')."""
    rate = min(max(float(rate), 0.0), 1.0)
    v = int(rate * (1 << 128))
    if v >= 1 << 128:
        return "g"
    return format(v, "032x")


def _digests(ids: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(lowercase hex md5 of ``str(id)``, valid-mask) per row — C-speed
    hashlib calls, the same work any engine does.  Null ids get a dummy
    digest and ``valid=False``: SQL's ``md5(CAST(id AS VARCHAR))`` is NULL
    there, so a WHERE drops the row and a CASE falls to its ELSE — callers
    must reproduce exactly that."""
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    valid = np.asarray(ids.is_valid())
    s = ids.cast(pa.string()).to_pylist()
    hx = np.array([hashlib.md5(v.encode()).hexdigest() if v is not None else ""
                   for v in s])
    return hx, valid


def hash_sample(
    ds,
    id_column: str,
    rate: float | None = None,
    stratum_column: str | None = None,
    rates: Mapping[str, float] | None = None,
    default_rate: float = 0.0,
    batch_size: int = 65536,
):
    """Deterministic sample: keep a row iff ``md5(str(id)) / 2^128 < rate``.

    With ``stratum_column`` + ``rates`` the rate is chosen per stratum
    (e.g. ``{"en": 0.5}`` with ``default_rate=0.25``) — stratified sampling
    without a shuffle: one embarrassingly-parallel filter pass.
    """
    if rate is None and rates is None:
        raise ValueError("pass rate= or (stratum_column=, rates=)")
    if (rates is not None) and stratum_column is None:
        # catch this on the driver — inside the tasks it surfaces as an
        # opaque float(None) TypeError in _hex_threshold
        raise ValueError("rates= requires stratum_column=")

    def keep(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        hx, valid = _digests(batch[id_column])
        if stratum_column is None:
            mask = hx < _hex_threshold(rate)
        else:
            strata = batch[stratum_column].cast(pa.string()).to_pylist()
            thr = {k: _hex_threshold(v) for k, v in (rates or {}).items()}
            dflt = _hex_threshold(default_rate if rate is None else rate)
            mask = hx < np.array([thr.get(s, dflt) for s in strata])
        # null ids never sample in (SQL: NULL < threshold is NULL -> WHERE
        # drops the row)
        return batch.filter(pa.array(mask & valid))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=batch_size)


_PORTABLE_MOD = 1_000_003          # prime; bounds the product below 2^51
_PORTABLE_MULT = 2_654_435_761     # Knuth multiplicative-hash constant
_PORTABLE_RANGE = 1 << 32


_MD5_RANGE = 1 << 52  # 16^13: 13 hex digits, exactly representable in double


def portable_uniform(ids: pa.Array) -> tuple[np.ndarray, np.ndarray, int]:
    """Engine-portable per-row uniform draw, SQL-reproducible either way:

    * integer ids: ``((id % 1000003) * 2654435761) % 2^32`` — pure int64
      arithmetic that ANSI SQL reproduces token-for-token (no md5/hex
      conversion needed when the comparison threshold is itself
      data-derived, e.g. a per-group rate).  The product is < 2^51 so it
      never overflows int64 on either engine.
    * string ids: the first 13 hex digits of md5 as an integer — DuckDB:
      ``CAST(('0x' || substr(md5(id), 1, 13)) AS BIGINT)``.  16^13 = 2^52,
      so the value (and its fraction of the range) is exact in a double.

    Returns ``(u int64, valid-mask, range)`` with ``u`` uniform in
    ``[0, range)``; null ids get u=0 and valid=False (SQL: NULL arithmetic
    / md5(NULL) yields NULL, WHERE drops the row).  Negative integer ids
    are rejected — C-style ``%`` on negatives diverges between engines.
    """
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    valid = np.asarray(ids.is_valid())
    if pa.types.is_string(ids.type) or pa.types.is_large_string(ids.type):
        hx, _ = _digests(ids)
        u = np.array([int(h[:13], 16) if h else 0 for h in hx], dtype=np.int64)
        return u, valid, _MD5_RANGE
    v = np.asarray(ids.cast(pa.int64()).fill_null(0))
    if (v < 0).any():
        raise ValueError("portable_uniform requires non-negative integer ids")
    u = ((v % _PORTABLE_MOD) * _PORTABLE_MULT) % _PORTABLE_RANGE
    return u, valid, _PORTABLE_RANGE


def temperature_sample(
    ds,
    group_column: str,
    id_column: str,
    temperature: float = 0.5,
    batch_size: int = 65536,
):
    """Temperature-based data mixing: downsample each group toward the size
    of the SMALLEST group, keeping rate ``(n_min / n_g) ** (1 - temperature)``
    of group g.  ``temperature=1`` keeps everything; ``temperature=0``
    equalises group sizes (in expectation).  The standard training-data
    recipe for re-balancing a multi-source / multi-language corpus.

    Two passes, both scale-shaped for 100 TB: (1) per-group counts via the
    combiner aggregate (exchange carries one row per group per block, the
    folded result is k-sized and legitimately driver-resident — k = number
    of languages/domains, not rows); (2) an embarrassingly-parallel filter
    where each row's portable uniform draw (``portable_uniform``) is
    compared to its group's rate.  Deterministic, rerun/resume-stable, no
    RNG state.

    At ``temperature=0.5`` the rate is ``sqrt(n_min/n_g)`` computed with one
    correctly-rounded IEEE sqrt, so a SQL oracle reproduces the row set
    bit-for-bit; other temperatures use ``pow`` (engines agree in practice
    but the last ulp is not guaranteed by IEEE).
    """
    from cdm_data_loader_utils_ray.functions.aggregates import grouped_partial_sums

    counts = grouped_partial_sums(ds, [group_column], {}, count_alias="n").take_all()
    if not counts:
        return ds
    # n_min sees EVERY group including the null one (SQL GROUP BY groups
    # NULLs; min(n) includes them) — but null-group rows themselves never
    # emit (the SQL twin's `JOIN ... ON d.g = r.g` drops them)
    n_min = float(min(r["n"] for r in counts))
    expo = 1.0 - float(temperature)

    def _rate(n: float) -> float:
        frac = np.float64(n_min) / np.float64(n)
        if expo == 0.5:
            return float(np.sqrt(frac))
        return float(frac ** np.float64(expo))

    rates = {
        r[group_column]: _rate(float(r["n"]))
        for r in counts
        if r[group_column] is not None and not pd.isna(r[group_column])
    }

    def keep(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        u, valid, rng = portable_uniform(batch[id_column])
        frac = u.astype(np.float64) / float(rng)
        # vectorized group->rate: ONE lookup per unique value in the batch,
        # not one dict .get per row; unseen/null groups get rate 0 (drop)
        codes, uniques = pd.factorize(
            batch[group_column].to_pandas(), use_na_sentinel=True
        )
        if len(uniques):
            urates = np.array([rates.get(g, 0.0) for g in uniques],
                              dtype=np.float64)
            thr = np.where(codes >= 0, urates[np.maximum(codes, 0)], 0.0)
        else:  # all-null group batch: fancy-indexing an empty urates raises
            thr = np.zeros(len(codes), dtype=np.float64)
        return batch.filter(pa.array((frac < thr) & valid))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=batch_size)


def cap_per_group(
    ds,
    group_column: str,
    id_column: str,
    k: int,
    uniform_column: str = "uh",
    rank_column: str = "rn",
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """Per-domain document cap (the Common-Crawl "at most k pages per host"
    rule): keep a deterministic pseudo-random k rows per group, selected by
    portable-uniform order with the id as tiebreak.

    Delegates to ``top_n_per_group`` so the exchange is combiner-bounded:
    each block ships at most k rows per group it contains, never the raw
    rows — the shuffle carries O(groups x k) regardless of skew.  Appends
    ``uniform_column`` (the draw) and ``rank_column`` (1-based rank within
    the group, SQL row_number semantics).

    Null ``id_column`` rows are DROPPED (they have no uniform draw; a SQL
    twin must filter ``id IS NOT NULL``).  Null group values form one
    group, like SQL PARTITION BY.
    """
    from cdm_data_loader_utils_ray.functions.aggregates import top_n_per_group

    def add_u(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(uniform_column,
                                       pa.array([], type=pa.int64()))
        u, valid, _rng = portable_uniform(batch[id_column])
        batch = batch.filter(pa.array(valid))
        return batch.append_column(uniform_column, pa.array(u[valid],
                                                            type=pa.int64()))

    withu = ds.map_batches(add_u, batch_format="pyarrow", batch_size=batch_size)
    return top_n_per_group(
        withu, [group_column], uniform_column, k, tiebreak=[id_column],
        ascending=True, rank_column=rank_column, num_buckets=num_buckets,
        batch_size=batch_size,
    )


def hash_split(
    ds,
    id_column: str,
    fractions: Mapping[str, float],
    split_column: str = "split",
    batch_size: int = 65536,
):
    """Deterministic train/val/test assignment: the md5 fraction of the id
    falls into consecutive ranges sized by ``fractions`` (insertion order;
    they must sum to 1).  Adds ``split_column`` — no shuffle, rerun-stable,
    and a row never changes split when other rows are added or removed
    (the property per-epoch RNG splits lack)."""
    labels = list(fractions)
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    edges: list[str] = []
    acc = 0.0
    for lbl in labels[:-1]:
        acc += fractions[lbl]
        edges.append(_hex_threshold(acc))

    def assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(split_column, pa.array([], type=pa.string()))
        hx, valid = _digests(batch[id_column])
        # null ids land in the LAST label (SQL: every CASE WHEN md5(NULL) <
        # edge compares NULL -> not true -> falls to ELSE)
        out = np.full(len(hx), labels[-1], dtype=object)
        remaining = valid.copy()
        for lbl, edge in zip(labels[:-1], edges):
            hit = remaining & (hx < edge)
            out[hit] = lbl
            remaining &= ~hit
        return batch.append_column(split_column, pa.array(out, type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=batch_size)


def fixed_size_sample(
    ds,
    id_column: str,
    k: int,
    uniform_column: str = "u",
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Deterministic fixed-size uniform sample WITHOUT replacement: the k
    globally-smallest ``(portable_uniform(id), id)`` pairs — "bottom-k by
    hash", the classic coordinated-sampling scheme (each row's draw depends
    only on its id, so samples from different runs/tables of the same ids
    coincide).  Distributed shape: each batch keeps only its own k smallest
    pairs (vectorized argpartition-equivalent), the driver merges the
    <= n_batches*k partial rows — no sort or shuffle of the raw data.

    Exact-size (unlike a rate filter, which is binomial around n*rate) and
    rerun-stable; SQL twin: ``ORDER BY u, id LIMIT k`` over the portable
    uniform expression.  Returns a pandas DataFrame (id, uniform_column)
    of min(k, n_valid) rows.  Null ids are excluded (SQL: NULL arithmetic
    drops out of any ORDER BY ... LIMIT prefix deterministically only if
    excluded; we exclude, matching a WHERE id IS NOT NULL twin)."""

    def part(batch: pa.Table) -> pd.DataFrame:
        u, valid, _rng = portable_uniform(batch[id_column])
        ids = batch[id_column].to_pandas()
        sub = pd.DataFrame({id_column: ids[valid], uniform_column: u[valid]})
        return sub.sort_values([uniform_column, id_column], kind="mergesort").head(k)

    parts = ds.map_batches(part, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    return (
        parts.sort_values([uniform_column, id_column], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def weighted_sample(
    ds,
    id_column: str,
    weight_column: str,
    k: int,
    key_column: str = "wkey",
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): keep the ``k`` rows with the smallest
    ``key = -ln((u + 0.5) / range) / w`` — equivalently the largest
    ``u^(1/w)`` — where ``u`` is the portable per-id uniform.  Inclusion
    probability is proportional to weight; draws are coordinated (a row's
    key depends only on its id and weight), so reruns and overlapping
    tables sample consistently.

    Engine-portable float: ``(u + 0.5) / range`` is an exact dyadic
    rational (one ln on identical doubles — the surprisal precedent), and
    the single division by the weight is pinned, so a SQL twin orders by
    the token-identical expression.  Rows with ``w <= 0`` or null ids are
    excluded (matching the twin's WHERE).  Same bottom-k shape as
    :func:`fixed_size_sample`: per-batch partial top-k, driver merge of
    ``<= n_batches * k`` rows."""

    def part(batch: pa.Table) -> pd.DataFrame:
        u, valid, rng = portable_uniform(batch[id_column])
        w = np.asarray(batch[weight_column].cast(pa.float64()).fill_null(0.0))
        ok = valid & (w > 0)
        key = -np.log((u[ok] + 0.5) / float(rng)) / w[ok]
        ids = batch[id_column].to_pandas()
        sub = pd.DataFrame(
            {
                id_column: ids[ok],
                weight_column: np.asarray(batch[weight_column])[ok],
                key_column: key,
            }
        )
        return sub.sort_values([key_column, id_column], kind="mergesort").head(k)

    parts = ds.map_batches(part, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    return (
        parts.sort_values([key_column, id_column], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def fixed_size_sample_per_group(
    ds,
    group_columns: Sequence[str],
    id_column: str,
    k: int,
    uniform_column: str = "u",
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """Deterministic exact-``k``-PER-GROUP sample: within each group, the k
    smallest ``(portable_uniform(id), id)`` pairs — the stratified form of
    :func:`fixed_size_sample` (which is global), i.e. quota sampling with
    coordinated, rerun-stable draws.  SQL twin:
    ``row_number() OVER (PARTITION BY group ORDER BY u, id) <= k``.

    Scale shape: a per-batch per-group bottom-k combiner shrinks the
    stream to <= k rows per (batch, group), then ONE group-bucket shuffle
    finishes each group's bottom-k in its bucket — the group count may be
    unbounded (no driver-side fold; returns a Dataset of
    ``group_columns + [id_column, uniform_column]``).  Null ids are
    excluded; null group keys form one group (SQL PARTITION BY semantics —
    filter upstream to match a ``WHERE g IS NOT NULL`` twin)."""
    groups = list(group_columns)

    def part(batch: pa.Table) -> pd.DataFrame:
        u, valid, _rng = portable_uniform(batch[id_column])
        df = batch.select(groups + [id_column]).to_pandas()
        df[uniform_column] = u
        df = df[valid]
        d = df.sort_values(groups + [uniform_column, id_column], kind="mergesort")
        keep = d.groupby(groups, sort=False, dropna=False).cumcount() < k
        return d[keep.to_numpy()]

    def tag(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, groups, num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if _BUCKET in df.columns:
            df = df.drop(columns=[_BUCKET])
        if len(df) == 0:
            return df
        d = df.sort_values(groups + [uniform_column, id_column], kind="mergesort")
        keep = d.groupby(groups, sort=False, dropna=False).cumcount() < k
        return d[keep.to_numpy()]

    return (
        ds.map_batches(part, batch_format="pyarrow", batch_size=batch_size)
        .map_batches(tag, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(final, batch_format="pandas")
    )
