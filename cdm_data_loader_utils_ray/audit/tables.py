"""Audit tables: run / checkpoint / metrics / rejects.

Mirrors the reference's four Delta audit tables (``audit/schema.py:50-93``)
and their upsert semantics (merge on ``(run_id, source_path, pipeline)``,
``audit/checkpoint.py:54-60``, ``audit/metrics.py:84-93``) as Parquet files
under the lake table's ``_audit/`` directory.  Volumes are tiny (one row per
run / per partition per epoch), so these are driver-side appends with
keyed-upsert compaction on read — the data plane never blocks on them.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cdm_data_loader_utils_ray.core.schemas import (
    CHECKPOINT_SCHEMA,
    METRICS_SCHEMA,
    REJECTS_SCHEMA,
    RUN_SCHEMA,
)

RUNNING, SUCCESS, ERROR = "RUNNING", "SUCCESS", "ERROR"

_MERGE_KEYS = {
    "run": ["run_id", "pipeline", "source_path"],
    "checkpoint": ["run_id", "pipeline", "source_path", "partition_id"],
    "metrics": ["run_id", "pipeline", "source_path"],
    "rejects": None,  # append-only
}
_SCHEMAS = {
    "run": RUN_SCHEMA,
    "checkpoint": CHECKPOINT_SCHEMA,
    "metrics": METRICS_SCHEMA,
    "rejects": REJECTS_SCHEMA,
}
_ORDER_COL = {"run": "start_time", "checkpoint": "updated", "metrics": "updated", "rejects": None}


@dataclass(frozen=True)
class PipelineRun:
    """Frozen run identity keying all audit records (reference
    ``core/pipeline_run.py:6-13``)."""

    run_id: str
    pipeline: str
    source_path: str

    @staticmethod
    def new(pipeline: str, source_path: str) -> "PipelineRun":
        return PipelineRun(str(uuid.uuid4()), pipeline, source_path)


def _now() -> pd.Timestamp:
    return pd.Timestamp.fromtimestamp(time.time()).floor("us")


class AuditLog:
    """Audit writer for one lake table directory."""

    def __init__(self, audit_dir: str):
        self.dir = audit_dir
        os.makedirs(audit_dir, exist_ok=True)

    def _append(self, name: str, rows: list[dict]) -> None:
        if not rows:
            return
        schema = _SCHEMAS[name]
        d = os.path.join(self.dir, name)
        os.makedirs(d, exist_ok=True)
        table = pa.Table.from_pylist(rows, schema=schema)
        path = os.path.join(d, f"{name}-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.parquet")
        pq.write_table(table, path)

    def read(self, name: str, latest_only: bool = True) -> pa.Table:
        """Read an audit table; with ``latest_only`` the append log is
        compacted to last-writer-wins per merge key (the reference's
        merge-upsert result, recomputed on read)."""
        schema = _SCHEMAS[name]
        d = os.path.join(self.dir, name)
        files = sorted(os.listdir(d)) if os.path.isdir(d) else []
        if not files:
            return schema.empty_table()
        t = pa.concat_tables(pq.read_table(os.path.join(d, f)) for f in files)
        keys = _MERGE_KEYS[name]
        if latest_only and keys:
            df = t.to_pandas()
            df["_file_order"] = range(len(df))
            df = df.sort_values("_file_order").drop_duplicates(subset=keys, keep="last")
            df = df.drop(columns="_file_order")
            t = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
        return t

    # -- run state machine (reference audit/run.py) -------------------------
    def start_run(self, run: PipelineRun) -> None:
        self._append(
            "run",
            [
                {
                    "run_id": run.run_id,
                    "pipeline": run.pipeline,
                    "source_path": run.source_path,
                    "status": RUNNING,
                    "records_processed": None,
                    "start_time": _now(),
                    "end_time": None,
                    "error": None,
                }
            ],
        )

    def complete_run(self, run: PipelineRun, records_processed: int) -> None:
        self._finish(run, SUCCESS, records_processed, None)

    def fail_run(self, run: PipelineRun, error: str) -> None:
        self._finish(run, ERROR, None, error)

    def _finish(self, run: PipelineRun, status: str, n: int | None, err: str | None) -> None:
        existing = self.read("run")
        start = _now()
        if len(existing):
            df = existing.to_pandas()
            hit = df[df["run_id"] == run.run_id]
            if len(hit):
                start = hit.iloc[-1]["start_time"]
        self._append(
            "run",
            [
                {
                    "run_id": run.run_id,
                    "pipeline": run.pipeline,
                    "source_path": run.source_path,
                    "status": status,
                    "records_processed": n,
                    "start_time": start,
                    "end_time": _now(),
                    "error": err,
                }
            ],
        )

    # -- checkpoint (per-partition high-water marks) ------------------------
    def upsert_checkpoints(
        self, run: PipelineRun, hwm: dict[int, int], records: dict[int, int], status: str = SUCCESS
    ) -> None:
        now = _now()
        self._append(
            "checkpoint",
            [
                {
                    "run_id": run.run_id,
                    "pipeline": run.pipeline,
                    "source_path": run.source_path,
                    "status": status,
                    "records_processed": int(records.get(pid, 0)),
                    "partition_id": int(pid),
                    "hwm_seq": int(seq),
                    "updated": now,
                }
                for pid, seq in sorted(hwm.items())
            ],
        )

    # -- metrics ------------------------------------------------------------
    def write_metrics(
        self,
        run: PipelineRun,
        records_read: int,
        records_valid: int,
        records_invalid: int,
        validation_errors: list[str],
    ) -> None:
        self._append(
            "metrics",
            [
                {
                    "run_id": run.run_id,
                    "pipeline": run.pipeline,
                    "source_path": run.source_path,
                    "records_read": int(records_read),
                    "records_valid": int(records_valid),
                    "records_invalid": int(records_invalid),
                    "validation_errors": sorted(set(validation_errors)),
                    "updated": _now(),
                }
            ],
        )

    # -- rejects ------------------------------------------------------------
    def write_rejects(self, run: PipelineRun, rejects: pa.Table, errors_column: str) -> None:
        """Append reject rows: raw record JSON + parsed record + error list
        (reference ``audit/rejects.py:57-82``)."""
        if len(rejects) == 0:
            return
        now = _now()
        rows = []
        errs = rejects[errors_column].to_pylist()
        plain = rejects.drop_columns([errors_column]).to_pylist()
        for rec, e in zip(plain, errs):
            raw = json.dumps(rec, default=str, sort_keys=True)
            rows.append(
                {
                    "run_id": run.run_id,
                    "pipeline": run.pipeline,
                    "source_path": run.source_path,
                    "raw_record": raw,
                    "parsed_record": raw,
                    "errors_in_record": e or [],
                    "timestamp": now,
                }
            )
        self._append("rejects", rows)
