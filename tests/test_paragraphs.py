"""Paragraph-level dedup (functions/paragraphs.py): newline mode vs a
brute-force keep-first reference, word-window split semantics, edge cases.
The word_window end-to-end path is oracle-checked by test_queries_oracle
(duplicate_paragraphs / paragraph_dedup_text); these tests pin the parts
the SQL twin can't see (newline corpora, null text, separators)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _ds(df: pd.DataFrame, blocks: int = 4):
    return rd.from_pandas(df).repartition(blocks)


def _brute_paragraph_dedup(docs: dict[int, str], splitter) -> dict[int, str]:
    """Keep-first over exact paragraph text in (doc_id, idx) order."""
    seen: set[str] = set()
    out: dict[int, list[str]] = {}
    for did in sorted(docs):
        for p in splitter(docs[did]):
            if p not in seen:
                seen.add(p)
                out.setdefault(did, []).append(p)
    return {d: ps for d, ps in out.items()}


def test_paragraph_dedup_newline_matches_brute_force():
    from cdm_data_loader_utils_ray.functions.paragraphs import paragraph_dedup

    rng = np.random.default_rng(7)
    lines = [f"line {i} {'x' * (i % 5)}" for i in range(12)]
    docs = {}
    for did in range(40):
        n = int(rng.integers(1, 6))
        docs[did] = "\n".join(rng.choice(lines, size=n))
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})

    out = paragraph_dedup(_ds(df), mode="newline").to_pandas()
    got = dict(zip(out["doc_id"], out["text_dedup"]))

    want = {
        d: "\n".join(ps)
        for d, ps in _brute_paragraph_dedup(docs, lambda t: t.split("\n")).items()
    }
    assert got == want


def test_paragraph_dedup_word_window_matches_brute_force():
    from cdm_data_loader_utils_ray.functions.paragraphs import paragraph_dedup

    rng = np.random.default_rng(11)
    vocab = ["a", "b", "c", "d"]
    docs = {
        did: " ".join(rng.choice(vocab, size=int(rng.integers(1, 20))))
        for did in range(60)
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})

    out = paragraph_dedup(_ds(df), mode="word_window", window=3).to_pandas()
    got = dict(zip(out["doc_id"], out["text_dedup"]))

    def split3(t):
        w = t.split(" ")
        return [" ".join(w[i : i + 3]) for i in range(0, len(w), 3)]

    want = {
        d: " ".join(ps) for d, ps in _brute_paragraph_dedup(docs, split3).items()
    }
    assert got == want


def test_split_paragraphs_word_window_offsets_and_empty_text():
    from cdm_data_loader_utils_ray.functions.paragraphs import split_paragraphs

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b c d e", "", "x  y"]}
    )
    out = (
        split_paragraphs(_ds(df, blocks=2), mode="word_window", window=2)
        .to_pandas()
        .sort_values(["doc_id", "idx"])
    )
    rows = list(zip(out["doc_id"], out["idx"], out["ptext"]))
    # '' splits to [''] -> one empty paragraph; 'x  y' splits to ['x','','y']
    assert rows == [
        (1, 0, "a b"), (1, 1, "c d"), (1, 2, "e"),
        (2, 0, ""),
        (3, 0, "x "), (3, 1, "y"),
    ]


def test_split_paragraphs_drops_null_text_and_keeps_schema():
    from cdm_data_loader_utils_ray.functions.paragraphs import split_paragraphs

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a\nb", None]})
    out = split_paragraphs(_ds(df, blocks=2), mode="newline").to_pandas()
    assert sorted(out["ptext"]) == ["a", "b"]
    assert set(out.columns) == {"doc_id", "idx", "ptext"}
    assert out["doc_id"].tolist() == [1, 1]


def test_paragraph_dedup_doc_losing_everything_disappears():
    from cdm_data_loader_utils_ray.functions.paragraphs import paragraph_dedup

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["p\nq", "p\nq", "p\nr"]}
    )
    out = paragraph_dedup(_ds(df, blocks=2), mode="newline").to_pandas()
    got = dict(zip(out["doc_id"], out["text_dedup"]))
    assert got == {1: "p\nq", 3: "r"}  # doc 2 loses both paragraphs


def test_split_paragraphs_rejects_bad_mode():
    from cdm_data_loader_utils_ray.functions.paragraphs import split_paragraphs

    with pytest.raises(ValueError, match="mode"):
        split_paragraphs(_ds(pd.DataFrame({"doc_id": [1], "text": ["x"]})),
                         mode="sentence")


def test_assemble_preserves_idx_order_not_arrival_order():
    from cdm_data_loader_utils_ray.functions.paragraphs import assemble_paragraphs

    df = pd.DataFrame(
        {
            "doc_id": [7, 7, 7, 8],
            "idx": [2, 0, 1, 0],
            "ptext": ["c", "a", "b", "z"],
        }
    )
    out = assemble_paragraphs(_ds(df, blocks=3), sep="|").to_pandas()
    got = dict(zip(out["doc_id"], out["text_dedup"]))
    assert got == {7: "a|b|c", 8: "z"}
