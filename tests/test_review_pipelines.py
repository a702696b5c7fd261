"""Regression tests for the round-4 review of ingest/gaf/maintenance +
extract functions: migrate hwm carry-forward, calendar-invalid GAF dates,
null-qualifier error paths, overflow-safe coercion, typed JSON extraction."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdm_data_loader_utils_ray.functions.extract import JsonRowExtractor, safe_int
from cdm_data_loader_utils_ray.pipelines.cdc import read_final_state_arrow, run_replay
from cdm_data_loader_utils_ray.pipelines.gaf import GafNormalizer, parse_eco_mapping
from cdm_data_loader_utils_ray.pipelines.maintenance import compact, migrate_partitions
from cdm_data_loader_utils_ray.sinks.lake import LakeTable


def test_migrate_preserves_hwm_against_partial_redelivery(tmp_path):
    """After compact (tombstone dropped, hwm carried) + migrate, a partial
    redelivery below the old hwm must still be skipped — pre-fix, migrate
    recomputed hwm from surviving rows and the replay resurrected the
    compacted-away deleted key."""
    ev = pa.table(
        {
            "seq": pa.array([5, 9, 3], pa.int64()),
            "op": ["insert", "delete", "insert"],
            "repo": ["r", "r", "r"],
            "path": ["k1", "k1", "k2"],
            "commit": ["c1", "c2", "c3"],
            "lang": ["py", None, "go"],
            "content": ["x", None, "y"],
        }
    )
    p = str(tmp_path / "ev.parquet")
    pq.write_table(ev, p)
    lake_dir = str(tmp_path / "lake")
    run_replay(p, lake_dir, num_partitions=2)
    table = LakeTable(lake_dir)
    compact(table)  # k1's tombstone physically dropped; hwm stays 9
    m = migrate_partitions(table, 4)
    # every new pid has an entry and none re-opens the gate below 9
    assert sorted(m.partitions) == [0, 1, 2, 3]
    assert all(e.hwm_seq >= 9 for e in m.partitions.values())
    # redeliver only seq <= 5 (k1's insert, NOT its delete)
    run_replay(p, lake_dir, max_seq=5)
    state = read_final_state_arrow(table)
    paths = set(state["path"].to_pylist())
    assert "k1" not in paths  # stays deleted
    assert "k2" in paths


def _gaf_batch(qualifiers, dates):
    n = len(qualifiers)
    return pa.table(
        {
            "DB": ["UniProtKB"] * n,
            "DB_Object_ID": [f"A{i}" for i in range(n)],
            "Qualifier": pa.array(qualifiers, type=pa.string()),
            "GO_ID": [f"GO:{i:07d}" for i in range(n)],
            "DB_Reference": ["PMID:1"] * n,
            "Evidence_Code": ["IEA"] * n,
            "With_From": [""] * n,
            "Date": pa.array(dates, type=pa.string()),
            "Assigned_By": ["Src"] * n,
        }
    )


def test_gaf_calendar_invalid_date_is_null_not_crash():
    """'20231399' passes the 8-digit regex but is no calendar date: the
    guarded to_date must null it, not raise ArrowInvalid."""
    exact, fb = parse_eco_mapping("IEA\tDEFAULT\tECO:0000501\n")
    out = GafNormalizer(exact, fb)(
        _gaf_batch(["enables", "enables"], ["20231399", "20240115"])
    )
    dates = out["annotation_date"].to_pylist()
    assert dates[0] is None
    assert str(dates[1]) == "2024-01-15"


def test_gaf_invalid_predicate_with_null_qualifier_raises_value_error():
    """A batch mixing a null qualifier with an invalid one must raise the
    informative ValueError, not TypeError from sorting None against str."""
    exact, fb = parse_eco_mapping("IEA\tDEFAULT\tECO:0000501\n")
    with pytest.raises(ValueError, match="frobnicates"):
        GafNormalizer(exact, fb)(
            _gaf_batch([None, "frobnicates"], ["20240101", "20240101"])
        )


def test_safe_int_overflow_returns_none():
    assert safe_int("1e400") is None
    assert safe_int(float("inf")) is None
    assert safe_int("-1e999") is None
    assert safe_int("12,345") == 12345


def test_json_row_extractor_typed_sparse_field():
    """An all-None block must not infer a null-typed column when the field
    declares its type."""
    batch = pa.table({"props": ['{"a": 1}', "{}"]})
    ex = JsonRowExtractor(
        {"taxid": lambda p: p.get("tax_id")}, types={"taxid": pa.int64()}
    )
    out = ex(batch)
    assert out.schema.field("taxid").type == pa.int64()
    assert out["taxid"].to_pylist() == [None, None]
