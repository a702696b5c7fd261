"""End-to-end curation pipeline composition (exact dedup -> near-dup ->
paragraph dedup -> quality -> decontaminate -> mix/cap -> split -> write)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd


def _corpus(n=60, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    para = "the quick brown fox jumps over the lazy dog again and again today"
    for i in range(n):
        uniq = " ".join(
            f"w{rng.integers(0, 5000)}" for _ in range(int(rng.integers(30, 60)))
        )
        text = f"{para}\n{uniq}" if i % 3 == 0 else uniq
        if i % 10 == 0:
            text = "short"                      # fails the quality gate
        rows.append({"doc_id": i, "lang": "en" if i % 4 else "de", "text": text})
    rows.append({"doc_id": n, "lang": "en", "text": rows[1]["text"]})  # exact dup
    return pd.DataFrame(rows)


def test_curate_corpus_stages_and_write(tmp_path, ray_session):
    from cdm_data_loader_utils_ray.pipelines.curation import (
        curate_corpus,
        write_curated,
    )

    df = _corpus()
    bench = pd.DataFrame(
        {"doc_id": [900], "text": [df.loc[5, "text"]]}  # contaminates doc 5
    )
    report = []
    out = curate_corpus(
        rd.from_pandas(df).repartition(4),
        bench_ds=rd.from_pandas(bench),
        group_column="lang",
        near_threshold=0.8,
        paragraph_mode="newline",
        quality={"min_tokens": 10, "min_score": 0.0, "min_stopword_ratio": 0.0},
        temperature=0.5,
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        report=report,
    )
    res = out.to_pandas()
    stages = [r["stage"] for r in report]
    assert stages == [
        "input", "exact_dedup", "near_dedup", "paragraph_dedup",
        "quality_gate", "decontaminate", "temperature_mix", "split",
    ]
    counts = {r["stage"]: r["rows"] for r in report}
    # exact dedup keeps one doc per distinct text (the planted dup and the
    # repeated 'short' docs collapse)
    assert counts["exact_dedup"] == df["text"].nunique()
    assert counts["exact_dedup"] < counts["input"]
    assert counts["quality_gate"] < counts["paragraph_dedup"]    # shorts dropped
    assert counts["decontaminate"] <= counts["quality_gate"]
    assert 5 not in set(res["doc_id"])                           # contaminated
    assert set(res.columns) == {"doc_id", "lang", "text", "split"}
    # paragraph dedup leaves the shared leading paragraph in exactly one
    # doc; later stages (temperature sampling) may drop that survivor too
    n_para = res["text"].str.contains("quick brown fox").sum()
    assert n_para <= 1
    paths = write_curated(out, str(tmp_path / "corpus"))
    total = 0
    for split, path in paths.items():
        t = pq.read_table(path)
        assert "split" not in t.schema.names
        total += t.num_rows
    assert total == len(res)


def test_curate_minimal_passthrough(ray_session):
    from cdm_data_loader_utils_ray.pipelines.curation import curate_corpus

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["alpha beta gamma", "alpha beta gamma"]}
    )
    out = curate_corpus(
        rd.from_pandas(df), near_threshold=None, paragraph_mode=None,
        quality={}, fractions=None,
    ).to_pandas()
    assert len(out) == 1  # exact dedup only


def test_write_curated_resumes_past_finished_splits(tmp_path, ray_session):
    from cdm_data_loader_utils_ray.pipelines.curation import write_curated

    df = pd.DataFrame(
        {"doc_id": range(20), "split": ["train"] * 15 + ["val"] * 5}
    )
    ds = rd.from_pandas(df)
    paths = write_curated(ds, str(tmp_path / "c"))
    assert sorted(paths) == ["train", "val"]
    # simulate a crash that lost 'val': finished 'train' must be skipped
    # (its files untouched), only 'val' rebuilt; stray .tmp dirs cleaned
    import shutil, os

    train_mtimes = {
        f: os.path.getmtime(os.path.join(paths["train"], f))
        for f in os.listdir(paths["train"])
    }
    shutil.rmtree(paths["val"])
    os.makedirs(paths["val"] + ".tmp")  # half-written staging leftover
    paths2 = write_curated(ds, str(tmp_path / "c"))
    assert os.path.isdir(paths2["val"]) and not os.path.isdir(paths2["val"] + ".tmp")
    for f, m in train_mtimes.items():
        assert os.path.getmtime(os.path.join(paths2["train"], f)) == m
    assert pq.read_table(paths2["val"]).num_rows == 5
