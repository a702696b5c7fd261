"""End-to-end training-data curation: the canonical web-corpus recipe
(CCNet/C4/Dolma shape) as ONE lazy composition of the engine's stages —
the flagship "switch your corpus pipeline to this repo" entry point.

    exact dedup -> near-dup (MinHash) subtract -> paragraph dedup ->
    quality gate -> benchmark decontamination -> temperature mixing /
    per-source caps -> deterministic train/val/test split -> write
    (one directory per split: resumable, never one giant file)

Every stage is an existing oracle- or property-checked operator; this
module composes them lazily, with exactly two deliberate checkpoints:
before the paragraph stage (it consumes its input three times) and before
the per-split write (N_splits filtered writes) — both ``materialize()``
into the object store (spillable), never driver memory.  ``report=True``
additionally counts rows per stage boundary (one execution each).

Scale notes: stage order matters — exact dedup FIRST (cheapest, removes
the mass that would make near-dup quadratic), paragraph dedup after
near-dup (operates on surviving docs only), the quality gate before
decontamination (shrinks the gram join's left side).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def quality_gate(
    ds,
    text_column: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_score: float = 0.5,
    min_stopword_ratio: float = 0.05,
    batch_size: int = 4096,
):
    """Heuristic quality filter (the Gopher/C4-rule family) as ONE
    embarrassingly-parallel pass: length window, composite quality score,
    stopword-ratio floor.  Keeps every input column; null texts drop."""
    from cdm_data_loader_utils_ray.functions.textstats import (
        _LANG_PROFILES,
        quality_columns,
        token_count_columns,
    )

    stops = set().union(*_LANG_PROFILES.values())

    def gate(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        texts = batch[text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        q = quality_columns(texts, stops)
        t = token_count_columns(texts)
        n_tok = np.asarray(
            pc.fill_null(t["n_tokens_ws"], -1).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        score = pc.fill_null(q["quality_score"], -1.0).to_numpy(
            zero_copy_only=False
        )
        stop_r = pc.fill_null(q["stopword_ratio"], -1.0).to_numpy(
            zero_copy_only=False
        )
        keep = (
            (n_tok >= min_tokens)
            & (n_tok <= max_tokens)
            & (score >= min_score)
            & (stop_r >= min_stopword_ratio)
        )
        return batch.filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow", batch_size=batch_size)


def curate_corpus(
    ds,
    bench_ds=None,
    id_column: str = "doc_id",
    text_column: str = "text",
    group_column: str | None = None,
    near_threshold: float | None = 0.8,
    paragraph_mode: str | None = "newline",
    paragraph_window: int = 20,
    quality: dict | None = None,
    decontam_k: int = 8,
    temperature: float | None = None,
    cap_k: int | None = None,
    fractions: dict | None = None,
    num_buckets: int = 64,
    report: list | None = None,
):
    """Compose the full curation recipe over a docs Dataset.  Returns the
    curated Dataset (original columns; ``text`` replaced by the deduped
    text when ``paragraph_mode`` is set; plus ``split`` when ``fractions``
    is given).  Pass a list as ``report`` to collect per-stage row counts
    — that COUNTS each boundary (one extra execution per stage), so leave
    it None for production streaming.

    Stages are all optional: ``near_threshold=None`` skips near-dup,
    ``paragraph_mode=None`` skips paragraph dedup, ``quality=None`` uses
    gate defaults (``quality={}`` disables), ``bench_ds=None`` skips
    decontamination, ``temperature``/``cap_k``/``fractions`` default off.
    """
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.dedup import dedup_exact, minhash_dedup
    from cdm_data_loader_utils_ray.functions.decontam import contaminated_docs
    from cdm_data_loader_utils_ray.functions.paragraphs import paragraph_dedup
    from cdm_data_loader_utils_ray.functions.sampling import (
        cap_per_group,
        hash_split,
        temperature_sample,
    )
    from cdm_data_loader_utils_ray.stages.keyed import anti_join_keys

    def note(stage, d):
        if report is not None:
            report.append({"stage": stage, "rows": d.count()})
        return d

    out = note("input", ds)

    # 1. exact dedup (cheapest; shrinks everything downstream)
    out = note(
        "exact_dedup",
        dedup_exact(out, text_column=text_column, id_column=id_column,
                    num_buckets=num_buckets),
    )

    # 2. near-dup subtract (keep cluster representative + singletons)
    if near_threshold is not None:
        clusters = minhash_dedup(out, threshold=near_threshold,
                                 text_column=text_column, id_column=id_column)
        losers = clusters[clusters[id_column] != clusters["cluster"]][[id_column]]
        if len(losers):
            out = anti_join_keys(out, rd.from_pandas(losers), [id_column],
                                 num_buckets=num_buckets)
        out = note("near_dedup", out)

    # 3. paragraph-level dedup (cross-doc repeated-line removal); rebuilt
    #    text joins back onto the surviving docs' other columns.
    #    CHECKPOINT first: this stage consumes `out` three times (the
    #    paragraph split runs twice by design, plus the join side), so
    #    without a materialize the upstream dedup shuffles would re-execute
    #    per consumer (spills to the object store; never driver memory)
    if paragraph_mode is not None:
        out = out.materialize()
        rebuilt = paragraph_dedup(
            out, text_column=text_column, id_column=id_column,
            mode=paragraph_mode, window=paragraph_window,
            num_buckets=num_buckets,
        )
        from cdm_data_loader_utils_ray.stages.keyed import hash_join

        side = out.drop_columns([text_column])
        out = hash_join(rebuilt, side, on=[id_column], how="inner",
                        num_buckets=num_buckets)

        def rename(batch: pa.Table) -> pa.Table:
            i = batch.schema.get_field_index("text_dedup")
            return batch.set_column(
                i, text_column, batch["text_dedup"].cast(pa.string())
            )

        out = note("paragraph_dedup", out.map_batches(rename, batch_format="pyarrow"))

    # 4. quality gate
    if quality is None or quality:
        out = note(
            "quality_gate",
            quality_gate(out, text_column=text_column, **(quality or {})),
        )

    # 5. benchmark decontamination (drop docs sharing k-grams with bench)
    if bench_ds is not None:
        bad = contaminated_docs(out, bench_ds, k=decontam_k,
                                id_column=id_column, text_column=text_column,
                                num_buckets=num_buckets, hashed=True)
        out = note(
            "decontaminate",
            anti_join_keys(out, bad, [id_column], num_buckets=num_buckets),
        )

    # 6. data mixing: temperature re-balancing, then per-group caps
    if group_column is not None and temperature is not None:
        out = note(
            "temperature_mix",
            temperature_sample(out, group_column, id_column,
                               temperature=temperature),
        )
    if group_column is not None and cap_k is not None:
        capped = cap_per_group(out, group_column, id_column, k=cap_k,
                               num_buckets=num_buckets)
        out = note("cap_per_group", capped.drop_columns(["uh", "rn"]))

    # 7. deterministic split (rerun-stable, row-independent)
    if fractions:
        out = note("split", hash_split(out, id_column, fractions))
    return out


def write_curated(out_ds, out_dir: str, split_column: str = "split"):
    """Write the curated corpus as one parquet directory per split value —
    RESUMABLE: each split stages into ``<dir>.tmp`` and atomically renames
    on completion (the lake's two-phase pattern), so a re-run after a
    crash skips every finished split and only rebuilds the missing ones.
    No split column -> a single ``all/`` directory (same staging)."""
    import os
    import shutil

    def staged_write(d, path: str) -> bool:
        if os.path.isdir(path):  # finished by a previous run — skip
            return False
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        d.write_parquet(tmp)
        os.replace(tmp, path)
        return True

    names = out_ds.schema().names
    if split_column not in names:
        path = os.path.join(out_dir, "all")
        staged_write(out_ds, path)
        return {"all": path}
    # materialize ONCE: unique() plus one filtered write per split would
    # otherwise re-execute the whole curation DAG N_splits+1 times
    out_ds = out_ds.materialize()
    paths = {}
    for split in sorted(out_ds.select_columns([split_column]).unique(split_column)):
        path = os.path.join(out_dir, f"{split_column}={split}")
        staged_write(
            out_ds.filter(
                expr=f"{split_column} == '{split}'"
            ).drop_columns([split_column]),
            path,
        )
        paths[split] = path
    return paths
