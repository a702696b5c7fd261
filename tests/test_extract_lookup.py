"""Extractors, small-table parsers, cached lookup, routed sinks."""

import gzip
import os

import pyarrow as pa
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.functions.cached_lookup import CachedLookup, LruCache
from cdm_data_loader_utils_ray.functions.extract import (
    JsonRowExtractor,
    coalesce,
    deep_collect_regex,
    deep_find_str,
    extract_accessions,
    percent_to_fraction_strict,
    safe_float,
    safe_int,
)
from cdm_data_loader_utils_ray.sources.metadata_files import parse_metalink, parse_relnotes
from cdm_data_loader_utils_ray.sources.small_tables import (
    MissingColumnsError,
    read_path_map,
    read_quality_report,
    read_stats_by_filename,
)
from cdm_data_loader_utils_ray.sinks.routing import write_csv_export, write_routed_parquet


def test_safe_coercions():
    assert safe_int("1,234") == 1234
    assert safe_int("x") is None and safe_int(None) is None
    assert safe_float("1,234.5") == 1234.5
    assert percent_to_fraction_strict("97.5%") == 0.975
    assert percent_to_fraction_strict("150") is None
    assert coalesce(None, "", [], "x") == "x"


def test_deep_extractors():
    obj = {
        "a": [{"taxId": "562"}],
        "b": {"note": "assembly GCF_000005845.2 and GCA_000001405.29"},
        "organismName": "E. coli",
    }
    assert deep_find_str(obj, "organism_name") == "E. coli"
    assert deep_find_str(obj, "tax_id") == "562"
    assert extract_accessions(obj) == ["GCF_000005845.2", "GCA_000001405.29"]
    assert deep_collect_regex(obj, r"E\. \w+") == ["E. coli"]


def test_json_row_extractor():
    t = pa.table({"id": [1, 2], "props": ['{"k": 5}', "not json"]})
    out = JsonRowExtractor({"k": lambda p: safe_int(p.get("k"))})(t)
    assert out["k"].to_pylist() == [5, None]


def test_quality_report_and_required_columns():
    tsv = "Name\tCompleteness\tContamination\ng1\t98.5\t1.2\n"
    d = read_quality_report(tsv, "Name", ["Completeness", "Contamination"])
    assert d["g1"]["Completeness"] == "98.5"
    with pytest.raises(MissingColumnsError):
        read_quality_report("Wrong\tHeaders\nx\ty\n", "Name", ["Completeness"])


def test_concatenated_json_repair():
    payload = '{"filename": "a.fq", "reads": 10}\n{"filename": "b.fq", "reads": 20}'
    d = read_stats_by_filename(payload)
    assert d["a.fq"]["reads"] == 10 and d["b.fq"]["reads"] == 20


def test_path_map_error_accumulation():
    payload = '{"g1": {"fna": "x.fna"}, "g2": {"fna": ""}, "g3": 5}'
    valid, errors = read_path_map(payload, required_keys=("fna",))
    assert set(valid) == {"g1"}
    assert len(errors) == 2


METALINK = b"""<?xml version="1.0"?>
<metalink xmlns="urn:ietf:params:xml:ns:metalink">
 <version>2025_03</version>
 <publisher><name>UniProt</name></publisher>
 <license><url>https://example.org/license</url></license>
 <file name="a.xml.gz"><size>123</size><hash type="md5">abc</hash></file>
</metalink>"""


def test_metalink_parse():
    info = parse_metalink(METALINK)
    assert info.version == "2025_03"
    assert info.publisher == "UniProt"
    assert info.files["a.xml.gz"]["checksums"]["md5"] == "abc"
    assert info.files["a.xml.gz"]["size"] == 123


def test_relnotes_parse():
    text = (
        "UniProt Release 2025_03 of 23-Apr-2025\n"
        "UniProtKB/Swiss-Prot contains 573,230 sequence entries\n"
        "TrEMBL contains 253,635,358 entries\n"
    )
    rn = parse_relnotes(text)
    assert rn.release == "2025_03" and rn.date == "23-Apr-2025"
    assert rn.entry_counts["TrEMBL"] == 253_635_358


def test_cached_lookup_counts_fetches():
    calls = {"n": 0}

    def fetch(k):
        calls["n"] += 1
        return f"v:{k}"

    stage = CachedLookup(fetch, key_column="acc")
    t = pa.table({"acc": ["a", "b", "a", "a", "b"]})
    out = stage(t)
    assert out["fetched"].to_pylist() == ["v:a", "v:b", "v:a", "v:a", "v:b"]
    assert calls["n"] == 2  # memoized per actor
    assert stage.cache.hits == 3


def test_lru_bounded():
    c = LruCache(maxsize=2)
    for k in "abcb":
        c.get_or(k, lambda x: x)
    assert "a" not in c.data and set(c.data) == {"b", "c"}


def test_routed_parquet_and_csv(tmp_path):
    ds = rd.from_items(
        [
            {"table": "entity", "row": '{"id": 1}'},
            {"table": "name", "row": '{"n": "x"}'},
            {"table": "entity", "row": '{"id": 2}'},
        ]
    )
    out = write_routed_parquet(ds, str(tmp_path / "routed"))
    subdirs = {d for d in os.listdir(out) if "=" in d}
    assert subdirs == {"table=entity", "table=name"}
    csv_dir = write_csv_export(rd.from_items([{"a": 1}]), str(tmp_path / "csv"), single_file=True)
    assert len(os.listdir(csv_dir)) == 1


def test_cli_replay_and_preview(tmp_path, capsys):
    import pyarrow.parquet as pq

    from cdm_data_loader_utils_ray.cli import main
    from cdm_data_loader_utils_ray.synth import make_events

    ev = str(tmp_path / "ev.parquet")
    pq.write_table(make_events(num_keys=40, num_events=300, seed=3), ev)
    lake = str(tmp_path / "lake")
    assert main(["replay", "--events", ev, "--lake", lake, "--partitions", "4"]) == 0
    assert main(["preview", "--lake", lake, "-n", "3"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 + 3  # replay summary + 3 preview rows
    assert main(["compact", "--lake", lake]) == 0
    assert main(["vacuum", "--lake", lake, "--keep", "1"]) == 0


def test_parse_taxid_args(tmp_path):
    from cdm_data_loader_utils_ray.functions.extract import (
        ordered_unique,
        parse_taxid_args,
    )

    assert parse_taxid_args("224325, 2741724, taxon:224325") == ["224325", "2741724"]
    f = tmp_path / "ids.txt"
    f.write_text("123\nabc999\n\n123\n")
    assert parse_taxid_args("5", str(f)) == ["5", "123", "999"]
    assert ordered_unique(["b", "a", "b", "c", "a"]) == ["b", "a", "c"]
