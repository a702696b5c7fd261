"""Command-line entry points (reference: click CLIs under ``cli/`` +
``[project.scripts]``), argparse-based to stay stdlib-only.

    python -m cdm_data_loader_utils_ray.cli replay  --events E --lake L [...]
    python -m cdm_data_loader_utils_ray.cli diff    --old A --new B --out D
    python -m cdm_data_loader_utils_ray.cli compact --lake L
    python -m cdm_data_loader_utils_ray.cli vacuum  --lake L [--keep 2]
    python -m cdm_data_loader_utils_ray.cli preview --lake L [-n 10]
    python -m cdm_data_loader_utils_ray.cli stream  --events E --lake L
    python -m cdm_data_loader_utils_ray.cli dedup   --input D --out O [--method exact]
    python -m cdm_data_loader_utils_ray.cli sample  --input D --out O [--split train=0.8 val=0.1 test=0.1]
    python -m cdm_data_loader_utils_ray.cli chunk   --input D --out O [--size 512 --stride 384]
    python -m cdm_data_loader_utils_ray.cli textstats --input D --out O

Owns its Ray session (scripts init/shutdown; library code never does).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_replay(args) -> int:
    ray = _ray_session(args.num_cpus)
    from cdm_data_loader_utils_ray.pipelines.cdc import run_replay

    m = run_replay(
        args.events,
        args.lake,
        num_partitions=args.partitions,
        epochs=args.epochs,
        shuffle_mode=args.shuffle_mode,
        rename_map=dict(kv.split("=", 1) for kv in args.rename) if args.rename else None,
    )
    print(json.dumps({"epoch": m.epoch, **m.metrics}))
    ray.shutdown()
    return 0


def cmd_diff(args) -> int:
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from cdm_data_loader_utils_ray.pipelines.snapshot import diff_snapshots, snapshot_hashes

    old = snapshot_hashes(rd.read_parquet(args.old), tag="old")
    new = snapshot_hashes(rd.read_parquet(args.new), tag="new")
    diff = diff_snapshots(old, new, keep_unchanged=not args.changes_only)
    diff.write_csv(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    ray = _ray_session(args.num_cpus)
    from cdm_data_loader_utils_ray.pipelines.maintenance import compact
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    m = compact(
        LakeTable(args.lake),
        sort_by=args.sort_by,
        zorder_by=args.zorder_by.split(",") if args.zorder_by else None,
        row_group_size=args.row_group_size,
    )
    print(json.dumps({"epoch": m.epoch, **m.metrics}))
    ray.shutdown()
    return 0


def cmd_analyze(args) -> int:
    ray = _ray_session(args.num_cpus)
    from cdm_data_loader_utils_ray.pipelines.maintenance import analyze_table
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    cols = [c for c in args.columns.split(",") if c] if args.columns else None
    stats = analyze_table(LakeTable(args.lake), columns=cols)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


def cmd_delete(args) -> int:
    """DELETE FROM ... WHERE col = value.  ``--mode dv`` (default) writes
    equality-delete vectors — no data rewrite; ``--mode rewrite`` is the
    copy-on-write path."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ray = _ray_session(args.num_cpus)
    from cdm_data_loader_utils_ray.pipelines.maintenance import delete_where
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    table = LakeTable(args.lake)
    m0 = table.latest_manifest()
    if m0 is None:
        raise SystemExit("delete: no committed manifest")
    col, _, val = args.equals.partition(":")
    if col not in m0.schema.names:
        raise SystemExit(f"delete: column {col!r} not in table schema")
    scalar = pa.scalar(val).cast(m0.schema.field(col).type)

    m, n = delete_where(
        table, lambda t: pc.equal(t[col], scalar), mode=args.mode
    )
    print(json.dumps({"epoch": m.epoch, "deleted_rows": n, **m.metrics}))
    ray.shutdown()
    return 0


def cmd_describe(args) -> int:
    """Metadata-only table summary (DESCRIBE DETAIL analogue): epoch, schema,
    partition/chain/file stats, tags, properties — straight from the
    manifest, no Ray session and no data IO."""
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    t = LakeTable(args.lake)
    m = t.latest_manifest()
    if m is None:
        print(json.dumps({"lake": args.lake, "committed": False}))
        return 0
    chains = [len(p.files) for p in m.partitions.values()]
    out = {
        "lake": args.lake,
        "epoch": m.epoch,
        "num_partitions": m.num_partitions,
        "columns": [(f.name, str(f.type)) for f in m.schema],
        "rows": sum(p.rows for p in m.partitions.values()),
        "live_keys": (
            sum(p.live_keys for p in m.partitions.values())
            if all(p.live_keys >= 0 for p in m.partitions.values())
            else None
        ),
        "bytes": sum(p.bytes for p in m.partitions.values()),
        "files": sum(chains),
        "max_chain_len": max(chains, default=0),
        "hwm_seq": max((p.hwm_seq for p in m.partitions.values()), default=-1),
        "rename_history": m.rename_history,
        "tags": t.tags(),
        "properties": t.get_properties(),
        "run_id": m.run_id,
    }
    print(json.dumps(out))
    return 0


def cmd_alter(args) -> int:
    from cdm_data_loader_utils_ray.pipelines.maintenance import (
        alter_drop_column,
        alter_rename_column,
    )
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    t = LakeTable(args.lake)
    if args.drop is not None:
        m = alter_drop_column(t, args.drop)
        print(json.dumps({"epoch": m.epoch, "dropped": args.drop}))
    elif args.rename is not None:
        old, sep, new = args.rename.partition(":")
        if not sep or not old or not new:
            raise SystemExit("alter: --rename takes OLD:NEW")
        m = alter_rename_column(t, old, new)
        print(json.dumps({"epoch": m.epoch, "renamed": [old, new]}))
    else:
        raise SystemExit("alter: pass --drop COL or --rename OLD:NEW")
    return 0


def cmd_vacuum(args) -> int:
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    removed = LakeTable(args.lake).vacuum(keep_epochs=args.keep)
    print(json.dumps({"removed_files": len(removed)}))
    return 0


def cmd_expire(args) -> int:
    from cdm_data_loader_utils_ray.pipelines.maintenance import expire_snapshots
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    expired = expire_snapshots(LakeTable(args.lake), keep_epochs=args.keep)
    print(json.dumps({"expired_epochs": expired}))
    return 0


def cmd_restore(args) -> int:
    from cdm_data_loader_utils_ray.pipelines.maintenance import restore
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    m = restore(LakeTable(args.lake), args.epoch)
    print(json.dumps({"epoch": m.epoch, "restored_from": args.epoch}))
    return 0


def cmd_clone(args) -> int:
    from cdm_data_loader_utils_ray.pipelines.maintenance import clone_table
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    m = clone_table(LakeTable(args.lake), args.dst, epoch=args.epoch)
    print(json.dumps({"dst": args.dst, "epoch": m.epoch}))
    return 0


def cmd_lookup(args) -> int:
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    keys = []
    for spec in args.key:
        repo, _, path = spec.partition(":")
        keys.append((repo, path))
    t = LakeTable(args.lake).lookup(keys)
    for row in t.to_pylist():
        print(json.dumps(row, default=str))
    return 0


def cmd_tag(args) -> int:
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    t = LakeTable(args.lake)
    if args.set is not None:
        e = t.set_tag(args.set, args.epoch)
        print(json.dumps({"tag": args.set, "epoch": e}))
    elif args.delete is not None:
        t.delete_tag(args.delete)
        print(json.dumps({"deleted": args.delete}))
    else:
        print(json.dumps(t.tags()))
    return 0


def cmd_constraints(args) -> int:
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable
    from cdm_data_loader_utils_ray.stages.constraints import compile_constraints

    t = LakeTable(args.lake)
    props = t.get_properties()
    if args.set is not None:
        spec = json.loads(args.set)
        compile_constraints(spec)  # reject typo'd rule kinds BEFORE persisting
        props["constraints"] = spec
        t.set_properties(props)
    print(json.dumps(props.get("constraints") or {}))
    return 0


def cmd_preview(args) -> int:
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    t = LakeTable(args.lake).preview(args.n)
    for row in t.to_pylist():
        print(json.dumps(row, default=str))
    return 0


def cmd_read(args) -> int:
    """Export committed state (optionally range-pruned via the parquet
    footer statistics — Delta-style data skipping) to a parquet dir."""
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    ranges = {}
    for spec in args.range or []:
        col, lo, hi = (spec.split(":") + ["", ""])[:3]

        def parse(v):
            if v == "":
                return None
            try:
                return int(v)
            except ValueError:
                return v

        ranges[col] = (parse(lo), parse(hi))
    equals = {}
    for spec in getattr(args, "equals", None) or []:
        col, _, val = spec.partition(":")
        equals[col] = val  # read_state casts to the committed column type
    ray = _ray_session(args.num_cpus)
    table = LakeTable(args.lake)
    epoch = args.epoch
    if getattr(args, "tag", None) is not None:
        if epoch is not None:
            raise SystemExit("--tag and --epoch are mutually exclusive")
        epoch = table.resolve_tag(args.tag)
    manifest = None if epoch is None else table.read_manifest(epoch)
    ds = table.read_state(
        manifest=manifest,
        column_range=ranges or None,
        column_equals=equals or None,
        columns=(
            [c for c in args.columns.split(",") if c]
            if getattr(args, "columns", None)
            else None
        ),
    )
    ds.write_parquet(args.out)
    print(json.dumps({"rows": _parquet_dir_rows(args.out), "out": args.out}))
    ray.shutdown()
    return 0


def _parquet_dir_rows(out_dir: str) -> int:
    """Row count of a just-written parquet dir from file footers — counting
    via ds.count() would re-execute the whole unmaterialized read+merge."""
    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )


def cmd_changes(args) -> int:
    """Export the Change Data Feed between two committed epochs."""
    from cdm_data_loader_utils_ray.sinks.lake import LakeTable

    ray = _ray_session(args.num_cpus)
    ds = LakeTable(args.lake).read_changes(
        from_epoch=args.since, to_epoch=args.to
    )
    ds.write_parquet(args.out)
    print(json.dumps({"rows": _parquet_dir_rows(args.out), "out": args.out}))
    ray.shutdown()
    return 0


def cmd_stream(args) -> int:
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from cdm_data_loader_utils_ray.state.streaming import StreamingUpserter

    s = StreamingUpserter(args.lake, num_partitions=args.partitions)
    applied = s.feed(rd.read_parquet(args.events))
    m = s.commit()
    s.shutdown()
    print(json.dumps({"epoch": m.epoch, "applied": applied}))
    ray.shutdown()
    return 0


def cmd_ingest(args) -> int:
    """Validated DSV ingest (reference idmapping end-to-end shape):
    --schema is name:type[!] pairs, '!' marking non-nullable."""
    ray = _ray_session(args.num_cpus)
    import pyarrow as pa

    from cdm_data_loader_utils_ray.pipelines.ingest import ingest_dsv

    types = {"int64": pa.int64(), "float64": pa.float64(), "string": pa.string()}
    fields = []
    for spec in args.schema:
        name, typ = spec.split(":")
        required = typ.endswith("!")
        fields.append(pa.field(name, types[typ.rstrip("!")], nullable=not required))
    res = ingest_dsv(
        args.input, args.out, pa.schema(fields),
        delimiter=args.delimiter, header=args.header,
    )
    print(json.dumps({
        "run_id": res.run_id, "records_read": res.records_read,
        "records_valid": res.records_valid, "records_invalid": res.records_invalid,
        "errors": res.distinct_errors,
    }))
    ray.shutdown()
    return 0


def cmd_dedup(args) -> int:
    """Near-duplicate clustering of a document Parquet table (MinHash+LSH
    or exact sha256), cluster ids written as Parquet."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
    if args.method == "exact":
        from cdm_data_loader_utils_ray.functions.dedup import dedup_exact

        out = dedup_exact(ds, text_column=args.text_col, id_column=args.id_col)
        out.write_parquet(args.out)
        n = "unknown (streamed)"
    elif args.method == "substring":
        # substring-granular keep-one-copy (Lee et al.): detect duplicated
        # k-gram spans (losers only), cut them, write docs with text_dedup
        from cdm_data_loader_utils_ray.functions.substrings import (
            duplicate_spans,
            remove_spans,
        )

        cuts = duplicate_spans(
            ds, text_column=args.text_col, id_column=args.id_col,
            k=args.gram_k, emit="losers",
        )
        ds2 = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
        out = remove_spans(
            ds2, cuts, text_column=args.text_col, id_column=args.id_col
        )
        out.write_parquet(args.out)
        n = "unknown (streamed)"
    elif args.method == "paragraph":
        # paragraph-granular keep-first (CCNet/C4 line dedup): drop every
        # repeated paragraph, reassemble docs as text_dedup (docs whose
        # paragraphs ALL repeat produce no row)
        from cdm_data_loader_utils_ray.functions.paragraphs import paragraph_dedup

        out = paragraph_dedup(
            ds, text_column=args.text_col, id_column=args.id_col,
            mode=args.para_mode, window=args.para_window,
        )
        out.write_parquet(args.out)
        n = "unknown (streamed)"
    else:
        if args.method == "fuzzy":
            from cdm_data_loader_utils_ray.functions.fuzzy import fuzzy_dedup_clusters

            clusters = fuzzy_dedup_clusters(
                ds, id_column=args.id_col, text_column=args.text_col,
                max_dist=args.max_dist,
            )
        else:
            from cdm_data_loader_utils_ray.functions.dedup import minhash_dedup

            clusters = minhash_dedup(
                ds, threshold=args.threshold, num_perm=128, bands=32,
                text_column=args.text_col, id_column=args.id_col,
            )
        import pyarrow.parquet as pq
        import pyarrow as pa

        os.makedirs(args.out, exist_ok=True)
        t = pa.Table.from_pandas(clusters, preserve_index=False)
        pq.write_table(t, os.path.join(args.out, "clusters.parquet"))
        n = len(clusters)
    print(json.dumps({"method": args.method, "rows": str(n), "out": args.out}))
    ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    """Full training-data curation recipe over a document Parquet table:
    exact dedup -> near-dup subtract -> paragraph dedup -> quality gate ->
    decontamination -> mixing/caps -> split -> per-split parquet dirs."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from cdm_data_loader_utils_ray.pipelines.curation import (
        curate_corpus,
        write_curated,
    )

    cols = [args.id_col, args.text_col] + ([args.group_col] if args.group_col else [])
    ds = rd.read_parquet(args.input, columns=cols)
    bench = rd.read_parquet(args.bench) if args.bench else None
    fractions = None
    if args.fractions:
        fractions = {}
        for part in args.fractions.split(","):
            k, v = part.split(":")
            fractions[k] = float(v)
    report: list = []
    out = curate_corpus(
        ds, bench_ds=bench, id_column=args.id_col, text_column=args.text_col,
        group_column=args.group_col,
        near_threshold=None if args.near_threshold <= 0 else args.near_threshold,
        paragraph_mode=args.paragraph_mode or None,
        temperature=args.temperature if args.temperature >= 0 else None,
        cap_k=args.cap or None, fractions=fractions,
        report=report if args.report else None,
    )
    paths = write_curated(out, args.out)
    print(json.dumps({"out": paths, "stages": report}))
    ray.shutdown()
    return 0


def cmd_sample(args) -> int:
    """Deterministic hash sample (or train/val/test split) of a Parquet
    table — rerun-stable, no shuffle."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    ds = rd.read_parquet(args.input)
    if args.split:
        from cdm_data_loader_utils_ray.functions.sampling import hash_split

        fr = dict(kv.split("=", 1) for kv in args.split)
        out = hash_split(ds, args.id_col, {k: float(v) for k, v in fr.items()})
    else:
        from cdm_data_loader_utils_ray.functions.sampling import hash_sample

        out = hash_sample(ds, args.id_col, rate=args.rate)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_chunk(args) -> int:
    """Token-window chunking of a document table (context packing prep)."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.chunking import chunk_documents

    ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
    chunk_documents(ds, id_column=args.id_col, text_column=args.text_col,
                    size=args.size, stride=args.stride).write_parquet(args.out)
    print(json.dumps({"out": args.out, "size": args.size, "stride": args.stride}))
    ray.shutdown()
    return 0


def cmd_textstats(args) -> int:
    """Language-ID / quality / token-count / fingerprint / repetition
    signals for every document, written as Parquet."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.textstats import (
        analyze_documents,
        repetition_stats,
    )

    ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
    analyze_documents(ds, text_column=args.text_col).write_parquet(
        os.path.join(args.out, "analysis")
    )
    repetition_stats(ds, id_column=args.id_col, text_column=args.text_col).write_parquet(
        os.path.join(args.out, "repetition")
    )
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="cdm-ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("replay", help="replay a CDC event log into a lake table")
    r.add_argument("--events", required=True)
    r.add_argument("--lake", required=True)
    r.add_argument("--partitions", type=int, default=32)
    r.add_argument("--epochs", type=int, default=1)
    r.add_argument("--shuffle-mode", default="staging", choices=["staging", "late", "groupby"])
    r.add_argument("--rename", nargs="*", help="old=new column renames")
    r.set_defaults(fn=cmd_replay)

    d = sub.add_parser("diff", help="snapshot-diff two table states")
    d.add_argument("--old", required=True)
    d.add_argument("--new", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--changes-only", action="store_true")
    d.set_defaults(fn=cmd_diff)

    c = sub.add_parser("compact", help="drop tombstones, rewrite partitions")
    c.add_argument("--lake", required=True)
    c.add_argument("--sort-by", default=None,
                   help="physically order each file by this column")
    c.add_argument("--zorder-by", default=None,
                   help="comma-separated 2-4 numeric/temporal columns: "
                        "Morton-interleave order for multi-column skipping")
    c.add_argument("--row-group-size", type=int, default=None,
                   help="rows per parquet row group (skipping granularity)")
    c.set_defaults(fn=cmd_compact)

    an = sub.add_parser(
        "analyze", help="compute exact per-column table statistics"
    )
    an.add_argument("--lake", required=True)
    an.add_argument("--columns", default=None,
                    help="comma-separated subset (default: every column)")
    an.set_defaults(fn=cmd_analyze)

    dl = sub.add_parser(
        "delete", help="DELETE rows by column equality (dv sidecar or rewrite)"
    )
    dl.add_argument("--lake", required=True)
    dl.add_argument("--equals", required=True, metavar="COL:VALUE",
                    help="delete rows where COL equals VALUE "
                         "(cast through the committed column type)")
    dl.add_argument("--mode", default="dv", choices=["dv", "rewrite"],
                    help="dv = equality-delete vectors (no data rewrite); "
                         "rewrite = copy-on-write")
    dl.set_defaults(fn=cmd_delete)

    dsc = sub.add_parser(
        "describe", help="metadata-only table summary (no Ray, no data IO)"
    )
    dsc.add_argument("--lake", required=True)
    dsc.set_defaults(fn=cmd_describe)

    al = sub.add_parser(
        "alter", help="metadata-only schema change: drop or rename a column"
    )
    al.add_argument("--lake", required=True)
    al.add_argument("--drop", default=None, help="column to drop")
    al.add_argument("--rename", default=None, help="OLD:NEW column rename")
    al.set_defaults(fn=cmd_alter)

    v = sub.add_parser("vacuum", help="delete unreferenced data files")
    v.add_argument("--lake", required=True)
    v.add_argument("--keep", type=int, default=2)
    v.set_defaults(fn=cmd_vacuum)

    ex = sub.add_parser(
        "expire", help="delete manifests older than the kept epoch window "
        "(tags lease retention; Iceberg expire_snapshots analogue)"
    )
    ex.add_argument("--lake", required=True)
    ex.add_argument("--keep", type=int, default=10)
    ex.set_defaults(fn=cmd_expire)

    rs = sub.add_parser(
        "restore", help="roll the table back to an earlier epoch (metadata-only)"
    )
    rs.add_argument("--lake", required=True)
    rs.add_argument("--epoch", type=int, required=True)
    rs.set_defaults(fn=cmd_restore)

    cl = sub.add_parser(
        "clone", help="zero-copy clone of the table state (hardlinked data files)"
    )
    cl.add_argument("--lake", required=True)
    cl.add_argument("--dst", required=True)
    cl.add_argument("--epoch", type=int, default=None)
    cl.set_defaults(fn=cmd_clone)

    lk = sub.add_parser(
        "lookup", help="point-read keys (repo:path), opening only their partitions"
    )
    lk.add_argument("--lake", required=True)
    lk.add_argument("--key", action="append", required=True,
                    help="repo:path (repeatable)")
    lk.set_defaults(fn=cmd_lookup)

    cn = sub.add_parser(
        "constraints",
        help="show or set table CHECK constraints (enforced on replay)",
    )
    cn.add_argument("--lake", required=True)
    cn.add_argument("--set", default=None,
                    help='JSON spec, e.g. {"lang": {"allowed": ["py"]}}')
    cn.set_defaults(fn=cmd_constraints)

    pv = sub.add_parser("preview", help="print first rows of committed state")
    pv.add_argument("--lake", required=True)
    pv.add_argument("-n", type=int, default=10)
    pv.set_defaults(fn=cmd_preview)

    rdp = sub.add_parser(
        "read", help="export committed state, optionally range-pruned (data skipping)"
    )
    rdp.add_argument("--lake", required=True)
    rdp.add_argument("--out", required=True)
    rdp.add_argument(
        "--range", action="append",
        help="col:lo:hi (either bound empty for unbounded), repeatable",
    )
    rdp.add_argument(
        "--equals", action="append",
        help="col:value equality (Bloom-sidecar data skipping), repeatable",
    )
    rdp.add_argument(
        "--columns", default=None,
        help="comma-separated projection (pushed down to the parquet read)",
    )
    rdp.add_argument(
        "--epoch", type=int, default=None,
        help="time travel: read this committed epoch instead of latest",
    )
    rdp.add_argument(
        "--tag", default=None,
        help="time travel by snapshot tag name (mutually exclusive with --epoch)",
    )
    rdp.set_defaults(fn=cmd_read)

    tg = sub.add_parser(
        "tag", help="snapshot tags: named epoch refs that also lease vacuum retention"
    )
    tg.add_argument("--lake", required=True)
    tg.add_argument("--set", default=None, metavar="NAME",
                    help="pin NAME to --epoch (default: current LATEST)")
    tg.add_argument("--epoch", type=int, default=None)
    tg.add_argument("--delete", default=None, metavar="NAME")
    tg.set_defaults(fn=cmd_tag)

    chg = sub.add_parser("changes", help="export the Change Data Feed between epochs")
    chg.add_argument("--lake", required=True)
    chg.add_argument("--out", required=True)
    chg.add_argument("--since", type=int, default=None,
                     help="emit changes after this epoch (default: from creation)")
    chg.add_argument("--to", type=int, default=None, help="up to this epoch (default latest)")
    chg.set_defaults(fn=cmd_changes)

    ing = sub.add_parser("ingest", help="validated DSV ingest -> Parquet + audit")
    ing.add_argument("--input", required=True)
    ing.add_argument("--out", required=True)
    ing.add_argument("--schema", nargs="+", required=True,
                     help="column specs name:type[!] ('!' = non-nullable)")
    ing.add_argument("--delimiter", default="\t")
    ing.add_argument("--header", action="store_true")
    ing.set_defaults(fn=cmd_ingest)

    st = sub.add_parser("stream", help="feed events through the shard-actor tailer")
    st.add_argument("--events", required=True)
    st.add_argument("--lake", required=True)
    st.add_argument("--partitions", type=int, default=32)
    st.set_defaults(fn=cmd_stream)

    dd = sub.add_parser("dedup", help="near-dup clustering (minhash) or exact dedup")
    dd.add_argument("--input", required=True)
    dd.add_argument("--out", required=True)
    dd.add_argument("--method", default="minhash",
                    choices=["minhash", "exact", "fuzzy", "substring", "paragraph"])
    dd.add_argument("--threshold", type=float, default=0.8)
    dd.add_argument("--max-dist", type=int, default=2,
                    help="fuzzy method: max edit distance")
    dd.add_argument("--gram-k", type=int, default=24,
                    help="substring method: duplicated k-gram length")
    dd.add_argument("--para-mode", default="newline",
                    choices=["newline", "word_window"],
                    help="paragraph method: paragraph definition")
    dd.add_argument("--para-window", type=int, default=20,
                    help="paragraph method: words per word_window paragraph")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--text-col", default="text")
    dd.set_defaults(fn=cmd_dedup)

    cu = sub.add_parser(
        "curate",
        help="full curation recipe: dedup -> quality -> decontam -> mix -> split",
    )
    cu.add_argument("--input", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--bench", default=None,
                    help="benchmark parquet for decontamination")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--group-col", default=None,
                    help="grouping column for mixing/caps (e.g. lang)")
    cu.add_argument("--near-threshold", type=float, default=0.8,
                    help="MinHash similarity threshold; <=0 disables near-dup")
    cu.add_argument("--paragraph-mode", default="newline",
                    choices=["newline", "word_window", ""],
                    help="'' disables paragraph dedup")
    cu.add_argument("--temperature", type=float, default=-1.0,
                    help="temperature mixing (needs --group-col); <0 disables")
    cu.add_argument("--cap", type=int, default=0,
                    help="max docs per group (needs --group-col); 0 disables")
    cu.add_argument("--fractions", default=None,
                    help="split spec, e.g. train:0.9,val:0.05,test:0.05")
    cu.add_argument("--report", action="store_true",
                    help="count rows per stage (one extra execution each)")
    cu.set_defaults(fn=cmd_curate)

    sm = sub.add_parser("sample", help="deterministic hash sample / split")
    sm.add_argument("--input", required=True)
    sm.add_argument("--out", required=True)
    sm.add_argument("--id-col", default="doc_id")
    sm.add_argument("--rate", type=float, default=0.1)
    sm.add_argument("--split", nargs="*",
                    help="label=frac pairs (e.g. train=0.8 val=0.1 test=0.1)")
    sm.set_defaults(fn=cmd_sample)

    ch = sub.add_parser("chunk", help="token-window document chunking")
    ch.add_argument("--input", required=True)
    ch.add_argument("--out", required=True)
    ch.add_argument("--id-col", default="doc_id")
    ch.add_argument("--text-col", default="text")
    ch.add_argument("--size", type=int, default=512)
    ch.add_argument("--stride", type=int, default=384)
    ch.set_defaults(fn=cmd_chunk)

    ts = sub.add_parser("textstats", help="langid/quality/tokens + repetition signals")
    ts.add_argument("--input", required=True)
    ts.add_argument("--out", required=True)
    ts.add_argument("--id-col", default="doc_id")
    ts.add_argument("--text-col", default="text")
    ts.set_defaults(fn=cmd_textstats)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
