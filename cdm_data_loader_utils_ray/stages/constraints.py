"""Table-level CHECK constraints (Delta ``ALTER TABLE ADD CONSTRAINT``
analogue; extends the reference's fixed event validation —
``validation/run.py`` — with USER-DECLARED, persisted rules).

A constraint spec is a JSON-serializable per-column rule dict stored in
the table's PROPERTIES sidecar (``LakeTable.set_properties``)::

    {"lang":    {"allowed": ["py", "rs"]},
     "content": {"not_null": true},
     "seq":     {"min": 0, "max": 10**12},
     "path":    {"regex": "^[^\\x00]*$"}}

``compile_constraints`` turns the spec into vectorized validators with
SQL CHECK semantics — a NULL cell SATISFIES min/max/allowed/regex
(unknown is not a violation); add ``not_null`` to reject nulls.  The
batch replay path picks the table's spec up AUTOMATICALLY
(``pipelines/cdc.run_replay``): violating events are annotated and
quarantined to the audit rejects table, never committed.  Columns absent
from a batch are skipped (constraints on evolved columns only bind once
the column exists).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.stages.validate import Validator, predicate_validator


def _rule_validator(col: str, kind: str, arg) -> Validator:
    # True = INVALID row; nulls fall out via predicate_validator's
    # fill_null(False) => NULL satisfies every rule except not_null
    if kind == "not_null":
        def expr(b: pa.Table):
            return pc.is_null(b[col])
    elif kind == "min":
        def expr(b: pa.Table):
            return pc.less(b[col], arg)
    elif kind == "max":
        def expr(b: pa.Table):
            return pc.greater(b[col], arg)
    elif kind == "allowed":
        vals = list(arg)

        def expr(b: pa.Table):
            c = b[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            return pc.and_(
                pc.invert(pc.is_in(c, value_set=pa.array(vals))), pc.is_valid(c)
            )
    elif kind == "regex":
        def expr(b: pa.Table):
            return pc.invert(pc.match_substring_regex(b[col], arg))
    else:
        raise ValueError(f"unknown constraint rule {kind!r} on column {col!r}")

    def guarded(b: pa.Table):
        if col not in b.column_names:
            return pa.array([False] * len(b), pa.bool_())
        bad = expr(b)
        if "op" in b.column_names:
            # constraints govern WRITTEN data: delete events carry null
            # payload columns by design and must never be quarantined by a
            # payload rule (Delta CHECK semantics)
            bad = pc.and_kleene(bad, pc.not_equal(b["op"], "delete"))
        return bad

    return predicate_validator(guarded, f"constraint:{col}:{kind}")


def compile_constraints(spec: dict) -> list[Validator]:
    """Compile a constraint spec into a list of vectorized validators.
    Raises on unknown rule kinds at compile time (a typo must fail the
    declaration, not silently skip enforcement at ingest time)."""
    out: list[Validator] = []
    for col in sorted(spec):
        rules = spec[col]
        for kind in sorted(rules):
            if kind == "not_null" and not rules[kind]:
                continue
            out.append(_rule_validator(col, kind, rules[kind]))
    return out


def table_constraint_validators(table) -> list[Validator]:
    """The table's persisted constraints, compiled — empty when none set."""
    spec = table.get_properties().get("constraints") or {}
    return compile_constraints(spec)
