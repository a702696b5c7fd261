"""Multi-table routed sinks.

Reference parity:
* dlt ``with_table_name`` routing (``pipelines/uniprot_kb_pipeline.py:68-75``
  K4): one stream fanning rows out to several destination tables — here a
  Dataset with a ``table`` column written as ``write_parquet(
  partition_cols=["table"])``, or materialized per-table with declared
  schemas;
* per-genome incremental TSV writers (``parsers/genome_loader.py:278-405``
  K2): ``ds.write_csv`` per table (header handling is free);
* CSV diff export (``cli/detect_updates.py:99-102`` K3).
"""

from __future__ import annotations

import os

import pyarrow as pa


def write_routed_parquet(ds, out_dir: str, table_column: str = "table"):
    """One Parquet directory per destination table (Hive-partitioned by the
    routing column) — the multi-table sink for parser stages that emit
    ``(table, row)`` streams (e.g. ``sources/xml_stream.XmlEntryParser``)."""
    ds.write_parquet(out_dir, partition_cols=[table_column])
    return out_dir


def write_tables(routed_ds, out_dir: str, schemas: dict[str, pa.Schema]):
    """Materialize each routed table with its declared schema into
    ``<out_dir>/<table>/`` (align + cast + null-fill per table).

    The routed stream is materialized ONCE up front: each per-table write
    would otherwise re-execute the full upstream lineage (e.g. the XML
    parse) — k destination tables means k re-parses of every file."""
    from cdm_data_loader_utils_ray.sources.xml_stream import rows_for_table

    if len(schemas) > 1:
        routed_ds = routed_ds.materialize()
    paths = {}
    for name, schema in schemas.items():
        sub = rows_for_table(routed_ds, name, schema)
        d = os.path.join(out_dir, name)
        sub.write_parquet(d)
        paths[name] = d
    return paths


def write_csv_export(ds, out_dir: str, single_file: bool = False):
    """CSV export of a result (reference diff export); ``single_file``
    mirrors the reference's ``coalesce(1)`` for small diffs."""
    if single_file:
        ds = ds.repartition(1)
    ds.write_csv(out_dir)
    return out_dir
