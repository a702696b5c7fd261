"""Unit tests for the corpus-statistics / scrubbing operators: top n-grams,
PII redaction, benchmark decontamination."""

import pandas as pd
import pytest
import ray.data as rd


def _ds(df: pd.DataFrame, blocks: int = 3):
    return rd.from_pandas(df).repartition(blocks)


def test_top_ngrams_counts_and_ties():
    from cdm_data_loader_utils_ray.functions.vocab import top_ngrams

    df = pd.DataFrame(
        {
            "text": [
                "a b c a b",      # bigrams: a b, b c, c a, a b
                "a b x",          # a b, b x
                "z z",            # z z
                "",               # nothing
                "solo",           # no bigram
            ]
        }
    )
    out = top_ngrams(_ds(df), n=2, k=3)
    assert out.iloc[0].tolist() == ["a b", 3]
    # ties (all count 1) break by gram ascending
    assert out["gram"].tolist() == ["a b", "b c", "b x"]


def test_top_ngrams_does_not_cross_document_boundaries():
    from cdm_data_loader_utils_ray.functions.vocab import top_ngrams

    df = pd.DataFrame({"text": ["end token", "token start"]})
    out = top_ngrams(_ds(df, blocks=1), n=2, k=10)
    grams = set(out["gram"])
    assert "token token" not in grams
    assert {"end token", "token start"} == grams


def test_redact_text_patterns_and_counts():
    from cdm_data_loader_utils_ray.functions.redact import redact_text

    df = pd.DataFrame(
        {
            "text": [
                "mail me at a.b+c@x-y.co and see https://ex.org/p?q=1 now",
                "no pii here",
                None,
            ]
        }
    )
    out = redact_text(_ds(df, blocks=2), "text").to_pandas()
    out = out.sort_values("n_email", ascending=False).reset_index(drop=True)
    assert out.loc[0, "text_redacted"] == "mail me at [EMAIL] and see [URL] now"
    assert out.loc[0, "n_email"] == 1 and out.loc[0, "n_url"] == 1
    assert (out.loc[1:, "n_email"] == 0).all()
    assert out.loc[out["text_redacted"] == "", "n_url"].tolist() == [0]  # null -> ''


def test_decontaminate_flags_only_overlapping_docs():
    from cdm_data_loader_utils_ray.functions.decontam import contaminated_docs

    bench = pd.DataFrame(
        {"doc_id": [100], "text": ["the quick brown fox jumps over the lazy dog"]}
    )
    train = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "xx the quick brown fox jumps over yy",  # shares 5-grams
                "completely different words entirely here now",
                "quick brown fox",  # < k tokens -> whole-doc gram, no match
            ],
        }
    )
    out = (
        contaminated_docs(_ds(train), _ds(bench, blocks=1), k=5)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["doc_id"].tolist() == [1]
    # doc 1 valid windows: 4 five-grams, of which 'the quick brown fox
    # jumps' and 'quick brown fox jumps over' are in the bench doc
    assert out["n_hits"].tolist() == [2]


def test_repetition_stats_signals():
    from cdm_data_loader_utils_ray.functions.textstats import repetition_stats

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "spam spam spam spam spam",          # one 3-gram repeated 3x
                "all words here are different ones",  # no repetition
                "line\nline\nother",                  # 1 duplicate line of 3
                "ab",                                 # < 3 tokens -> zeros
            ],
        }
    )
    out = (
        repetition_stats(_ds(df, blocks=2), n=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1: 3 occurrences, all of the same gram
    assert out.loc[1, "top_ngram_frac"] == 1.0
    assert out.loc[1, "dup_ngram_frac"] == 1.0
    # doc 2: 4 distinct grams
    assert out.loc[2, "top_ngram_frac"] == 0.25
    assert out.loc[2, "dup_ngram_frac"] == 0.0
    # doc 3: 3 lines, 2 distinct
    assert abs(out.loc[3, "dup_line_frac"] - 1 / 3) < 1e-12
    # doc 4: no 3-grams at all
    assert out.loc[4, "top_ngram_frac"] == 0.0
    assert out.loc[4, "dup_line_frac"] == 0.0


def test_next_fit_pack_rule_and_group_isolation():
    from cdm_data_loader_utils_ray.functions.packing import next_fit_pack

    df = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 2,
            "i": [1, 2, 3, 4, 5, 1, 2],
            "w": [300, 300, 900, 100, 100, 512, 1],
        }
    )
    out = (
        next_fit_pack(_ds(df), "g", ["i"], "w", budget=512)
        .to_pandas()
        .sort_values(["g", "i"])
        .reset_index(drop=True)
    )
    # group a: 300 | 300 | 900 (oversized -> own bin) | 100+100
    assert out.loc[out["g"] == "a", "bin_id"].tolist() == [0, 1, 2, 3, 3]
    # group b restarts at bin 0; 512 exactly fills, 1 opens the next
    assert out.loc[out["g"] == "b", "bin_id"].tolist() == [0, 1]


def test_next_fit_pack_first_item_oversized():
    from cdm_data_loader_utils_ray.functions.packing import _next_fit

    import numpy as np

    assert _next_fit(np.array([999, 1, 1]), 512).tolist() == [0, 1, 1]


def test_decontaminate_short_doc_exact_match():
    from cdm_data_loader_utils_ray.functions.decontam import contaminated_docs

    bench = pd.DataFrame({"doc_id": [9], "text": ["tiny doc"]})
    train = pd.DataFrame({"doc_id": [1, 2], "text": ["tiny doc", "tiny dog"]})
    out = contaminated_docs(_ds(train, blocks=2), _ds(bench, blocks=1), k=5).to_pandas()
    assert out["doc_id"].tolist() == [1] and out["n_hits"].tolist() == [1]


def test_decontaminate_hashed_path_matches_string_path():
    """hashed=True (8-byte uint64 grams, the 100-TB shuffle payload) must
    reproduce the string-gram result row-for-row on mixed-length docs:
    long docs (rolling k-grams), short docs (whole-doc gram), empty docs
    (sentinel gram), duplicate windows (per-doc distinctness)."""
    from cdm_data_loader_utils_ray.functions.decontam import contaminated_docs

    bench = pd.DataFrame(
        {
            "doc_id": [100, 101, 102],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "tiny doc",
                "",  # empty bench doc: matches empty train docs only
            ],
        }
    )
    train = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "xx the quick brown fox jumps over yy",
                "completely different words entirely here now",
                "quick brown fox",  # < k tokens, no whole-doc match
                "tiny doc",  # short exact match
                "",  # empty -> matches bench 102
                # repeated window: distinctness keeps n_hits at 1
                "a the quick brown fox jumps b the quick brown fox jumps c",
            ],
        }
    )
    kw = dict(k=5, num_buckets=8)
    s = (
        contaminated_docs(_ds(train, blocks=3), _ds(bench, blocks=2), **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    h = (
        contaminated_docs(
            _ds(train, blocks=3), _ds(bench, blocks=2), hashed=True, **kw
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(s, h, check_dtype=False)
    assert s["doc_id"].tolist() == [1, 4, 5, 6]


def test_source_overlap_hashed_matches_string_path(ray_session):
    """source_overlap_matrix: the 8-byte hashed-gram scale path must count
    the same shared-gram pairs as the SQL-exact string path (same
    tokenizer, same short-doc conventions)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.decontam import source_overlap_matrix

    docs = pd.DataFrame(
        {
            "source": ["a", "a", "b", "b", "c", None, "c"],
            "text": [
                "the quick brown fox jumps over the lazy dog tonight",
                "shared eight gram one two three four five six seven",
                "shared eight gram one two three four five six seven",
                "totally different words here with no overlap at all",
                "the quick brown fox jumps over the lazy dog tonight",
                "null source rows are dropped like the SQL join drops them",
                "short doc",  # < k tokens -> whole-doc gram
            ],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    a = source_overlap_matrix(ds, k=8, num_buckets=4)
    ds2 = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    b = source_overlap_matrix(ds2, k=8, num_buckets=4, hashed=True)
    pd.testing.assert_frame_equal(a, b)
    # a<->c share the fox sentence's grams; a<->b share the counting one
    got = {(r.source_a, r.source_b): r.n_shared for r in a.itertuples()}
    assert set(got) == {("a", "b"), ("a", "c")}
    # 10-token sentences -> 3 distinct 8-gram windows each
    assert got[("a", "c")] == 3 and got[("a", "b")] == 3
