"""Snapshot fingerprinting + diffing — the reference's change-detection loop
(``cli/snapshot_hashes.py``, ``cli/detect_updates.py``,
``parsers/refseq_pipeline/core/hashes_snapshot.py`` / ``snapshot_utils.py``)
re-expressed on Ray Data.

A *snapshot* is a tagged set of ``(key..., content_sha256)`` rows; diffing
two snapshots derives the change events (new / updated / deleted /
unchanged) that feed the CDC upsert — also used in reverse to generate
synthetic event logs from two table states in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyarrow as pa

from cdm_data_loader_utils_ray.core.schemas import KEY_COLUMNS, SHA_COLUMN
from cdm_data_loader_utils_ray.stages.hashing import add_content_sha256
from cdm_data_loader_utils_ray.stages.keyed import anti_join_keys, outer_diff


def snapshot_hashes(ds, tag: str, content_column: str = "content",
                    key_columns: Sequence[str] = KEY_COLUMNS):
    """Fingerprint a table state: keys + sha256(content) + snapshot tag
    (reference ``hashes_snapshot.py:16-25`` HASH_SCHEMA rows)."""
    keys = list(key_columns)

    def fp(batch: pa.Table) -> pa.Table:
        b = add_content_sha256(batch, column=content_column)
        b = b.select(keys + [SHA_COLUMN])
        return b.append_column("tag", pa.array([tag] * len(b)))

    return ds.map_batches(fp, batch_format="pyarrow")


def diff_snapshots(old_ds, new_ds, key_columns: Sequence[str] = KEY_COLUMNS,
                   hash_column: str = SHA_COLUMN, keep_unchanged: bool = True,
                   num_buckets: int = 64):
    """Change-event derivation: full-outer classify per key
    (reference ``snapshot_utils.py:37-61``).  Returns
    (keys..., old_<hash>, new_<hash>, change_type)."""
    return outer_diff(
        old_ds,
        new_ds,
        key_columns,
        hash_column,
        num_buckets=num_buckets,
        keep_unchanged=keep_unchanged,
    )


def new_keys(old_ds, new_ds, key_columns: Sequence[str] = KEY_COLUMNS):
    """Keys present only in the new snapshot (reference
    ``get_new_accessions``, left-anti)."""
    return anti_join_keys(new_ds, old_ds, key_columns)


def removed_keys(old_ds, new_ds, key_columns: Sequence[str] = KEY_COLUMNS):
    """Keys present only in the old snapshot (reference
    ``get_removed_accessions``)."""
    return anti_join_keys(old_ds, new_ds, key_columns)
