"""BPE trainer: driver variant vs an independent reference implementation,
distributed variant vs driver, encode properties."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cdm_data_loader_utils_ray.functions.bpe import (
    END,
    encode_dataset,
    encode_words,
    train_bpe,
    train_bpe_distributed,
    word_frequencies,
)


def _ref_bpe(word_counts: dict, num_merges: int, min_count: int = 2):
    """Straight-line reference trainer (dicts and loops, no vectorization)."""
    vocab = {tuple(list(w) + [END]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for seq, c in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] = pairs.get((seq[i], seq[i + 1]), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        out = {}
        for seq, c in vocab.items():
            s, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                    s.append(a + b)
                    i += 2
                else:
                    s.append(seq[i])
                    i += 1
            out[tuple(s)] = out.get(tuple(s), 0) + c
        vocab = out
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "new new new lowest",
]


def _counts():
    c = {}
    for line in CORPUS:
        for w in line.split():
            c[w] = c.get(w, 0) + 1
    return c


def test_train_matches_reference(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(CORPUS)), "text": CORPUS}))
    got = train_bpe(ds, num_merges=12)
    exp = _ref_bpe(_counts(), 12)
    assert got == exp
    assert len(got) >= 8


def test_distributed_matches_driver(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(CORPUS)), "text": CORPUS}))
    a = train_bpe(ds, num_merges=10)
    b = train_bpe_distributed(ds, num_merges=10, batch_size=2)
    assert a == b


def test_encode_roundtrip_and_counts(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(CORPUS)), "text": CORPUS}))
    merges = train_bpe(ds, num_merges=12)
    toks = encode_words(pd.Series(["lowest", "newest", "zzz"]), merges)
    # token concatenation reconstructs the word (+ end marker)
    for w, seq in zip(["lowest", "newest", "zzz"], toks):
        assert "".join(seq) == w + END
    # frequent full word should have merged down to few symbols
    assert len(toks[1]) <= 3
    # per-doc token counts: no merges -> chars+1 per word
    none = encode_dataset(ds, [], text_column="text").to_pandas()
    exp0 = [sum(len(w) + 1 for w in line.split()) for line in CORPUS]
    assert sorted(none["n_tokens"]) == sorted(exp0)
    with_m = encode_dataset(ds, merges, text_column="text").to_pandas()
    assert (with_m.sort_values("doc_id")["n_tokens"].to_numpy()
            <= none.sort_values("doc_id")["n_tokens"].to_numpy()).all()


def test_word_frequencies_fold(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame({"text": ["a b a", "b c", "a"]}),
    )
    wf = word_frequencies(ds).to_pandas().set_index("word")["n"].to_dict()
    assert wf == {"a": 3, "b": 2, "c": 1}
