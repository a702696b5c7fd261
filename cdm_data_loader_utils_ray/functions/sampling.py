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
from collections.abc import Mapping

import numpy as np
import pyarrow as pa


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
