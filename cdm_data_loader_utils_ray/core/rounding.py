"""THE cross-engine float-rounding conventions — single source of truth.

Every hash-checked catalog entry rounds floats identically on both the
engine and its DuckDB twin (CLAUDE.md invariant).  DuckDB ``round()`` is
HALF-AWAY-FROM-ZERO; pandas/numpy ``.round`` is half-EVEN, so values
landing exactly on a 5·10^-(d+1) boundary would hash-mismatch.  Two
conventions exist in the SQL twins and both live here:

* :func:`round_half_away` — sign-aware, matches SQL ``round(x, d)``.
* :func:`round_half_up` — ``floor(x·10^d + 0.5)/10^d``, matches the SQL
  twins written as that exact ``floor`` expression; identical to
  half-away for the non-negative ratios it is used on.

Do not re-implement these inline — a drifting copy silently desyncs an
entry from its oracle (round-3 review finding)."""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int) -> np.ndarray:
    """Round HALF-AWAY-FROM-ZERO: ``sign(x) * floor(|x|*10^d + 0.5)/10^d``
    — the convention of DuckDB ``round()`` on doubles."""
    m = 10.0 ** decimals
    v = np.asarray(x, dtype=np.float64)
    return np.sign(v) * np.floor(np.abs(v) * m + 0.5) / m


def round_half_up(x, decimals: int = 6) -> np.ndarray:
    """Round HALF-UP: ``floor(x*10^d + 0.5)/10^d`` — matches SQL twins
    spelled with that floor expression; equals half-away for x >= 0."""
    m = 10.0 ** decimals
    return np.floor(np.asarray(x, dtype=np.float64) * m + 0.5) / m
