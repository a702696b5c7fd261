"""Composed validated-ingest pipeline (pipelines/ingest.py) end to end:
DSV -> validate -> quarantine + metrics -> projection -> Parquet + audit
(reference ``parsers/uniprot/idmapping.py:56-95`` shape)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from cdm_data_loader_utils_ray.audit.tables import AuditLog
from cdm_data_loader_utils_ray.pipelines.ingest import ingest_dsv, run_ingest
from cdm_data_loader_utils_ray.stages.validate import predicate_validator

SCHEMA = pa.schema(
    [
        pa.field("id", pa.string(), nullable=False),
        pa.field("db", pa.string(), nullable=False),
        pa.field("xref", pa.string(), nullable=False),
    ]
)


def _write_tsv(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_ingest_dsv_end_to_end(tmp_path):
    tsv = str(tmp_path / "idmap.tsv")
    _write_tsv(
        tsv,
        [
            "P1\tGeneID\t111",
            "P2\tGeneID\t222",
            "P3\t\t333",          # empty db -> missing_required (empty->null)
            "P4\tRefSeq\t444",
            "bad line with no tabs",  # wrong column count -> parse_error
        ],
    )

    def project(batch: pa.Table) -> pa.Table:
        curie = pc.binary_join_element_wise(
            pa.array(["UniProt"] * len(batch)), batch["id"], ":"
        )
        return pa.table(
            {
                "uniprot_id": curie,
                "db": batch["db"],
                "xref": batch["xref"],
                "source": pa.array(["UniProt ID mapping"] * len(batch)),
            }
        )

    out = str(tmp_path / "out")
    res = ingest_dsv(tsv, out, SCHEMA, delimiter="\t", header=False, project=project)

    assert res.records_read == 5
    assert res.records_valid == 3
    assert res.records_invalid == 2
    assert "parse_error" in res.distinct_errors

    data = pq.read_table(os.path.join(out, "data")).to_pandas().sort_values("uniprot_id")
    assert list(data["uniprot_id"]) == ["UniProt:P1", "UniProt:P2", "UniProt:P4"]
    assert set(data["source"]) == {"UniProt ID mapping"}

    # quarantine captured both bad rows with raw records
    rej_dir = os.path.join(out, "_audit", "rejects")
    rej = pa.concat_tables(
        [pq.read_table(os.path.join(rej_dir, f)) for f in os.listdir(rej_dir)]
    )
    assert len(rej) == 2
    assert set(rej["run_id"].to_pylist()) == {res.run_id}

    # audit state machine: completed run + metrics row
    log = AuditLog(os.path.join(out, "_audit"))
    runs = log.read("run").to_pandas()
    assert list(runs["status"]) == ["SUCCESS"]
    metrics = log.read("metrics").to_pandas()
    assert int(metrics["records_invalid"].iloc[0]) == 2


def test_ingest_idempotent_rejects(tmp_path):
    """Quarantine audit semantics: each run KEEPS its own reject record (a
    later run must not erase an earlier run's audit trail), a same-run
    retry purges its earlier generation instead of double-counting, and
    per-run metrics always count only the current run."""
    from cdm_data_loader_utils_ray.audit.tables import PipelineRun

    tsv = str(tmp_path / "x.tsv")
    _write_tsv(tsv, ["a\tb\tc", "broken"])
    out = str(tmp_path / "out")
    rej_dir = os.path.join(out, "_audit", "rejects")
    r1 = ingest_dsv(tsv, out, SCHEMA, delimiter="\t", header=False)
    r2 = ingest_dsv(tsv, out, SCHEMA, delimiter="\t", header=False)
    assert len(os.listdir(rej_dir)) == 2  # both runs' audit records survive
    assert r1.records_invalid == r2.records_invalid == 1
    # same-run retry: earlier generation purged, counts stay exact
    run = PipelineRun.new("validated_ingest", tsv)
    r3 = ingest_dsv(tsv, out, SCHEMA, delimiter="\t", header=False, run=run)
    r4 = ingest_dsv(tsv, out, SCHEMA, delimiter="\t", header=False, run=run)
    assert len(os.listdir(rej_dir)) == 3
    assert r3.records_invalid == r4.records_invalid == 1
    # the quarantine dir doubles as the AuditLog 'rejects' table: files
    # must carry the full REJECTS_SCHEMA so the audit API can read them
    from cdm_data_loader_utils_ray.audit.tables import AuditLog

    t = AuditLog(os.path.join(out, "_audit")).read("rejects")
    assert t.num_rows == 3
    assert "parsed_record" in t.column_names and "timestamp" in t.column_names


def test_run_ingest_extra_validator(tmp_path):
    ds = rd.from_arrow(
        pa.table({"id": ["a", "b", "c"], "db": ["x", "y", "x"], "xref": ["1", "2", "3"]})
    )
    only_x = predicate_validator(
        lambda b: pc.invert(pc.equal(b["db"], pa.scalar("x"))), "invalid_value: db"
    )
    res = run_ingest(ds, str(tmp_path / "o"), SCHEMA, extra_validators=[only_x])
    assert res.records_valid == 2
    assert res.records_invalid == 1
    assert res.distinct_errors == ["invalid_value: db"]


def test_ingest_overwrite_is_atomic(tmp_path):
    """A re-run that CRASHES mid-write must leave the previously committed
    table intact and readable (r2 verdict: rmtree-then-write lost it); a
    subsequent successful re-run replaces it completely."""
    tsv = str(tmp_path / "x.tsv")
    _write_tsv(tsv, ["a\tb\tc", "d\te\tf"])
    out = str(tmp_path / "out")
    ingest_dsv(tsv, out, SCHEMA, delimiter="\t", header=False)
    before = pq.read_table(os.path.join(out, "data")).to_pandas()
    assert sorted(before["id"]) == ["a", "d"]

    # crash mid-pipeline: a validator that raises an infrastructure error
    def boom(batch):
        raise RuntimeError("simulated crash")

    try:
        run_ingest(
            rd.from_arrow(pa.table({"id": ["z"], "db": ["z"], "xref": ["z"]})),
            out, SCHEMA, extra_validators=[boom],
        )
    except Exception:
        pass
    after_crash = pq.read_table(os.path.join(out, "data")).to_pandas()
    assert sorted(after_crash["id"]) == ["a", "d"]  # old table survived

    # successful re-run with DIFFERENT data fully replaces the table
    tsv2 = str(tmp_path / "y.tsv")
    _write_tsv(tsv2, ["g\th\ti"])
    ingest_dsv(tsv2, out, SCHEMA, delimiter="\t", header=False)
    after = pq.read_table(os.path.join(out, "data")).to_pandas()
    assert sorted(after["id"]) == ["g"]
    # exactly one live generation remains next to the symlink
    gens = [d for d in os.listdir(out) if d.startswith("data-")]
    assert len(gens) == 1


def test_ingest_post_commit_failure_keeps_committed_table(tmp_path, monkeypatch):
    """An exception AFTER the pointer swap (audit/metrics steps) must not
    delete the just-committed generation — the previous one is already
    gone, so deleting the new one would lose everything (review finding)."""
    tsv = str(tmp_path / "x.tsv")
    _write_tsv(tsv, ["a\tb\tc", "d\te\tf"])
    out = str(tmp_path / "out")

    import cdm_data_loader_utils_ray.audit.tables as audit_tables

    def boom(self, run, n):
        raise RuntimeError("post-commit audit failure")

    monkeypatch.setattr(audit_tables.AuditLog, "complete_run", boom)
    try:
        ingest_dsv(tsv, out, SCHEMA, delimiter="\t", header=False)
    except RuntimeError:
        pass
    monkeypatch.undo()
    # the swap happened before the failure: table must be committed+readable
    got = pq.read_table(os.path.join(out, "data")).to_pandas()
    assert sorted(got["id"]) == ["a", "d"]


def test_ingest_retry_with_same_run_id_never_deletes_live_generation(tmp_path):
    """Retrying a run whose previous attempt already committed (same
    run_id) must not rmtree the live generation it is about to replace."""
    from cdm_data_loader_utils_ray.audit.tables import PipelineRun

    tsv = str(tmp_path / "x.tsv")
    _write_tsv(tsv, ["a\tb\tc"])
    out = str(tmp_path / "out")
    run = PipelineRun.new("validated_ingest", "ingest")
    from cdm_data_loader_utils_ray.sources.dsv import read_dsv

    ds = read_dsv(tsv, SCHEMA, delimiter="\t", header=False)
    run_ingest(ds, out, SCHEMA, run=run)
    live = os.path.realpath(os.path.join(out, "data"))

    # retry with the SAME run object (post-swap crash scenario)
    res = run_ingest(read_dsv(tsv, SCHEMA, delimiter="\t", header=False),
                     out, SCHEMA, run=run)
    got = pq.read_table(os.path.join(out, "data")).to_pandas()
    assert sorted(got["id"]) == ["a"]
    assert res.records_valid == 1
    # the retried attempt wrote a DIFFERENT generation dir and swapped to it
    assert os.path.realpath(os.path.join(out, "data")) != live


def test_recover_data_pointer_after_migration_crash(tmp_path):
    """A crash between the legacy-dir rename and the symlink creation
    leaves data missing + data.legacy present; the next run repairs it."""
    import pandas as pd

    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "data.legacy"), exist_ok=True)
    pq.write_table(
        pa.table({"id": ["old"], "db": ["x"], "xref": ["y"]}),
        os.path.join(out, "data.legacy", "part-0.parquet"),
    )
    from cdm_data_loader_utils_ray.pipelines.ingest import _recover_data_pointer

    _recover_data_pointer(out, os.path.join(out, "data"))
    got = pq.read_table(os.path.join(out, "data")).to_pandas()
    assert got["id"].tolist() == ["old"]


def test_hash_sample_and_split_null_ids_match_sql_semantics():
    """Null ids: WHERE drops them (sample); CASE falls to ELSE (split)."""
    import pandas as pd
    from cdm_data_loader_utils_ray.functions.sampling import hash_sample, hash_split

    df = pd.DataFrame({"id": pd.array([1, 2, None, 4], dtype="Int64")})
    ds = rd.from_pandas(df)
    sampled = hash_sample(ds, "id", rate=1.0).to_pandas()
    assert sampled["id"].notna().all() and len(sampled) == 3
    split = hash_split(ds, "id", {"train": 0.9, "test": 0.1}).to_pandas()
    null_rows = split[split["id"].isna()]
    assert (null_rows["split"] == "test").all() and len(null_rows) == 1
