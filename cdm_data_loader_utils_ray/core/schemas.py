"""Arrow schemas for the CDC engine.

Mirrors the reference's declared-``StructType``-per-table discipline
(reference: ``readers/dsv.py:59-65``, ``audit/schema.py:50-93``,
``parsers/refseq_pipeline/core/hashes_snapshot.py:16-25``) re-expressed as
``pyarrow.Schema`` with per-field nullability.  Arrow, like Spark, does not
enforce nullability on ingest, so a validation stage re-checks it
(see ``stages/validate.py``; reference ``validation/df_nullable_fields.py``).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Base table: one row per live file version (BASELINE.json input_hint shape).
# ---------------------------------------------------------------------------
REPO_FILES_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string(), nullable=False),
        pa.field("path", pa.string(), nullable=False),
        pa.field("commit", pa.string(), nullable=False),
        pa.field("lang", pa.string(), nullable=True),
        pa.field("content", pa.string(), nullable=False),
    ]
)

# ---------------------------------------------------------------------------
# Change-event log: the engine's replay input (FIXTURES.md §2).
# ``seq`` is the global authority for last-writer-wins; ``op`` is the change
# type.  ``content`` is null iff op == "delete".
# ---------------------------------------------------------------------------
EVENT_SCHEMA = pa.schema(
    [
        pa.field("seq", pa.int64(), nullable=False),
        pa.field("op", pa.string(), nullable=False),
        pa.field("repo", pa.string(), nullable=False),
        pa.field("path", pa.string(), nullable=False),
        pa.field("commit", pa.string(), nullable=False),
        pa.field("lang", pa.string(), nullable=True),
        pa.field("content", pa.string(), nullable=True),
    ]
)

VALID_OPS = ("insert", "update", "delete")

# Columns that form the upsert key (reference merges on natural keys,
# ``audit/schema.py:96-109``; here the CDC key from the north_star).
KEY_COLUMNS = ("repo", "path")

# ---------------------------------------------------------------------------
# Internal state / lake columns added by the engine.
# ---------------------------------------------------------------------------
SHA_COLUMN = "content_sha256"
DELETED_COLUMN = "is_deleted"
PARTITION_COLUMN = "_pid"
ERRORS_COLUMN = "errors_in_record"  # reference: validation ROW_ERRORS
INVALID_DATA_COLUMN = "__invalid_data__"  # reference: core/constants.py:3


def state_schema(event_schema: pa.Schema = EVENT_SCHEMA) -> pa.Schema:
    """Schema of a lake partition's state file: event columns (minus ``op``)
    plus the content hash and a tombstone flag.

    Tombstones are retained so the merge is commutative and idempotent under
    any replay order — upsert-over-delete resurrects a key only for a higher
    ``seq`` (reference semantics: ``whenNotMatchedInsertAll`` merge, SURVEY
    §2.10 U1, + latest-wins resolution O3).
    """
    fields = [f for f in event_schema if f.name != "op"]
    fields.append(pa.field(SHA_COLUMN, pa.string(), nullable=True))
    fields.append(pa.field(DELETED_COLUMN, pa.bool_(), nullable=False))
    return pa.schema(fields)


STATE_SCHEMA = state_schema()

# ---------------------------------------------------------------------------
# Audit tables (mirrors reference ``audit/schema.py:50-93``; checkpoint
# generalizes ``last_entry_id`` to a per-partition high-water mark).
# ---------------------------------------------------------------------------
RUN_SCHEMA = pa.schema(
    [
        pa.field("run_id", pa.string(), nullable=False),
        pa.field("pipeline", pa.string(), nullable=False),
        pa.field("source_path", pa.string(), nullable=False),
        pa.field("status", pa.string(), nullable=False),
        pa.field("records_processed", pa.int64(), nullable=True),
        pa.field("start_time", pa.timestamp("us"), nullable=False),
        pa.field("end_time", pa.timestamp("us"), nullable=True),
        pa.field("error", pa.string(), nullable=True),
    ]
)

CHECKPOINT_SCHEMA = pa.schema(
    [
        pa.field("run_id", pa.string(), nullable=False),
        pa.field("pipeline", pa.string(), nullable=False),
        pa.field("source_path", pa.string(), nullable=False),
        pa.field("status", pa.string(), nullable=False),
        pa.field("records_processed", pa.int64(), nullable=True),
        pa.field("partition_id", pa.int32(), nullable=False),
        pa.field("hwm_seq", pa.int64(), nullable=True),
        pa.field("updated", pa.timestamp("us"), nullable=False),
    ]
)

METRICS_SCHEMA = pa.schema(
    [
        pa.field("run_id", pa.string(), nullable=False),
        pa.field("pipeline", pa.string(), nullable=False),
        pa.field("source_path", pa.string(), nullable=False),
        pa.field("records_read", pa.int64(), nullable=False),
        pa.field("records_valid", pa.int64(), nullable=False),
        pa.field("records_invalid", pa.int64(), nullable=False),
        pa.field("validation_errors", pa.list_(pa.string()), nullable=False),
        pa.field("updated", pa.timestamp("us"), nullable=False),
    ]
)

REJECTS_SCHEMA = pa.schema(
    [
        pa.field("run_id", pa.string(), nullable=False),
        pa.field("pipeline", pa.string(), nullable=False),
        pa.field("source_path", pa.string(), nullable=False),
        pa.field("raw_record", pa.string(), nullable=False),
        pa.field("parsed_record", pa.string(), nullable=True),
        pa.field(ERRORS_COLUMN, pa.list_(pa.string()), nullable=False),
        pa.field("timestamp", pa.timestamp("us"), nullable=False),
    ]
)
