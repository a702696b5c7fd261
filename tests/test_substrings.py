"""Substring-level duplicate spans (functions/substrings.py) and the
all-window Rabin-Karp kernel (stages/hashing.char_window_hashes)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cdm_data_loader_utils_ray.stages.hashing import (
    char_window_hashes,
    rolling_fingerprint,
)


def test_char_window_hashes_matches_scalar_reference():
    texts = ["abcdefabcdef", "xxabcdefyy", "zz", None, "", "abcdef",
             "ababababab", "The quick brown fox jumps over the lazy dog"]
    k = 6
    row_of, pos, h = char_window_hashes(pa.array(texts, type=pa.string()), k)
    expected = []
    for i, t in enumerate(texts):
        t = t or ""
        for p in range(max(0, len(t) - k + 1)):
            expected.append((i, p, rolling_fingerprint(t[p : p + k], k)))
    assert list(zip(row_of.tolist(), pos.tolist(), h.tolist())) == expected


def test_char_window_hashes_sliced_and_chunked():
    base = pa.array(["padpad", "abcdefgh", "abcdeXgh"], type=pa.string())
    sl = base.slice(1, 2)  # non-zero offset path
    r1, p1, h1 = char_window_hashes(sl, 4)
    chunked = pa.chunked_array([base.slice(1, 1), base.slice(2, 1)])
    r2, p2, h2 = char_window_hashes(chunked, 4)
    assert (h1 == h2).all() and (r1 == r2).all() and (p1 == p2).all()
    # shared prefix "abcd" collides (equal), divergent windows differ
    assert h1[0] == h2[0]


def _spans_df(ds):
    return (
        ds.to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )


def test_duplicate_spans_basic(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import duplicate_spans

    boiler = "LICENSE HEADER v1.0 --"  # 22 chars, k=8 windows inside
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(
                [
                    boiler + " unique tail one",
                    boiler + " zz different tail",
                    "totally unrelated document body",
                    None,
                ],
                type=pa.string(),
            ),
        }
    )
    out = _spans_df(duplicate_spans(rd.from_arrow(docs), k=8, num_buckets=4, doc_buckets=4))
    # docs 1 and 2 share boiler + the following space (23 bytes); doc 3/4
    # emit nothing
    import os.path

    shared = len(os.path.commonprefix([boiler + " unique tail one",
                                       boiler + " zz different tail"]))
    assert set(out["doc_id"]) == {1, 2}
    for _, r in out.iterrows():
        assert r["span_start"] == 1
        assert r["span_end"] == shared + 1  # maximal shared prefix
    # spans are 1-based, end-exclusive: bytes == span_end - span_start
    assert (out["span_end"] - out["span_start"]).tolist() == [shared] * 2


def test_duplicate_spans_within_doc_and_gap_split(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import duplicate_spans

    # the same 8-gram twice WITHIN one doc, separated by > k unique bytes:
    # two islands, not one
    t = "abcdefgh" + "0123456789012345" + "abcdefgh"
    docs = pa.table(
        {"doc_id": pa.array([7], type=pa.int64()),
         "text": pa.array([t], type=pa.string())}
    )
    out = _spans_df(duplicate_spans(rd.from_arrow(docs), k=8, num_buckets=4, doc_buckets=4))
    assert out["span_start"].tolist() == [1, 25]
    assert out["span_end"].tolist() == [9, 33]


def test_duplicate_spans_empty_corpus_keeps_schema(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import duplicate_spans

    docs = pa.table(
        {"doc_id": pa.array([1], type=pa.int64()),
         "text": pa.array(["all unique text with no repeats"], type=pa.string())}
    )
    out = duplicate_spans(rd.from_arrow(docs), k=16, num_buckets=4, doc_buckets=4)
    # Dataset-level schema survives the empty result (ray's to_pandas()
    # drops columns for any fully-empty dataset — even a plain
    # from_arrow(empty_table) — so block schemas are the guarantee here;
    # every bundle stays schema-consistent thanks to the sentinel rows)
    assert out.schema().names == ["doc_id", "span_start", "span_end"]
    assert out.count() == 0


def test_duplicate_spans_string_ids(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import duplicate_spans

    docs = pa.table(
        {"doc_id": pa.array(["a", "b"], type=pa.string()),
         "text": pa.array(["shared-prefix-here xx", "shared-prefix-here yy"],
                          type=pa.string())}
    )
    out = _spans_df(duplicate_spans(rd.from_arrow(docs), k=8, num_buckets=4, doc_buckets=4))
    assert set(out["doc_id"]) == {"a", "b"}


def test_duplicate_spans_validates_params(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import duplicate_spans

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([1]), "text": pa.array(["x"])}))
    with pytest.raises(ValueError, match="min_count"):
        duplicate_spans(docs, min_count=1)
    with pytest.raises(ValueError, match="k must"):
        duplicate_spans(docs, k=0)


def test_span_stats(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import (
        duplicate_spans,
        span_stats,
    )

    boiler = "BOILERPLATE-BLOCK-9000 :: "
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array([boiler + "alpha", boiler + "beta"], type=pa.string()),
        }
    )
    spans = duplicate_spans(rd.from_arrow(docs), k=8, num_buckets=4, doc_buckets=4)
    stats = (
        span_stats(spans).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert stats["doc_id"].tolist() == [1, 2]
    assert (stats["dup_bytes"] == len(boiler)).all()
    assert (stats["n_spans"] == 1).all()


def test_anchored_mode_finds_long_shared_blocks(ray_session):
    """anchor_mod selects ~1/mod of windows content-deterministically: the
    same shared block selects the same anchors in both copies, so a long
    duplicated block is still found; merge_gap bridges the anchor gaps."""
    import numpy as np
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import duplicate_spans
    from cdm_data_loader_utils_ray.stages.hashing import char_window_hashes

    rng = np.random.default_rng(11)
    alphabet = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", dtype="S1")
    shared = b"".join(rng.choice(alphabet, 400)).decode()
    u1 = b"".join(rng.choice(alphabet, 150)).decode()
    u2 = b"".join(rng.choice(alphabet, 150)).decode()
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array([u1 + shared, shared + u2], type=pa.string()),
        }
    )
    k, mod = 16, 8
    out = _spans_df(
        duplicate_spans(
            rd.from_arrow(docs), k=k, num_buckets=4, doc_buckets=4,
            anchor_mod=mod, merge_gap=k + 8 * mod,
        )
    )
    # both docs report a span covering most of the 400-byte shared block
    assert set(out["doc_id"]) == {1, 2}
    for doc, lo in ((1, len(u1)), (2, 0)):
        spans = out[out["doc_id"] == doc]
        covered = (spans["span_end"] - spans["span_start"]).sum()
        assert covered >= 250  # most of the shared block, few spans
        assert (spans["span_start"] >= lo + 1 - (k + 8 * mod)).all()

    # density: anchors are a small fraction of all windows
    _r, _p, h = char_window_hashes(docs["text"], k)
    sel = ((h * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(mod)) == 0
    assert 0 < sel.sum() < len(h) / 3


def test_anchored_mode_validates_params(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import duplicate_spans

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([1]), "text": pa.array(["x"])}))
    with pytest.raises(ValueError, match="anchor_mod"):
        duplicate_spans(docs, anchor_mod=0)
    with pytest.raises(ValueError, match="merge_gap"):
        duplicate_spans(docs, k=8, merge_gap=4)


def test_remove_spans_basic(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import remove_spans

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["aaBBBBcc", "untouched", None], type=pa.string()),
        }
    )
    spans = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "span_start": pa.array([3], type=pa.int64()),  # 1-based
            "span_end": pa.array([7], type=pa.int64()),    # exclusive
        }
    )
    out = (
        remove_spans(rd.from_arrow(docs), rd.from_arrow(spans), doc_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text_dedup"].tolist()[0] == "aacc"
    assert out["text_dedup"].tolist()[1] == "untouched"
    assert out["text_dedup"].isna().tolist()[2]
    # original column preserved
    assert list(out.columns) == ["doc_id", "text", "text_dedup"]


def test_remove_spans_multi_and_edges(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import remove_spans

    # spans at the very start and very end, plus a middle one
    docs = pa.table(
        {"doc_id": pa.array([9], type=pa.int64()),
         "text": pa.array(["XXabYYcdZZ"], type=pa.string())}
    )
    spans = pa.table(
        {
            "doc_id": pa.array([9, 9, 9], type=pa.int64()),
            "span_start": pa.array([1, 5, 9], type=pa.int64()),
            "span_end": pa.array([3, 7, 11], type=pa.int64()),
        }
    )
    out = remove_spans(rd.from_arrow(docs), rd.from_arrow(spans), doc_buckets=4).to_pandas()
    assert out["text_dedup"].tolist() == ["abcd"]


def test_remove_spans_overlap_raises(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import remove_spans

    docs = pa.table(
        {"doc_id": pa.array([1], type=pa.int64()),
         "text": pa.array(["abcdefgh"], type=pa.string())}
    )
    spans = pa.table(
        {
            "doc_id": pa.array([1, 1], type=pa.int64()),
            "span_start": pa.array([1, 3], type=pa.int64()),
            "span_end": pa.array([5, 7], type=pa.int64()),
        }
    )
    with pytest.raises(Exception, match="overlapping spans"):
        remove_spans(rd.from_arrow(docs), rd.from_arrow(spans), doc_buckets=4).to_pandas()


def test_detect_then_remove_roundtrip(ray_session):
    """End-to-end: detect duplicated spans, cut them, re-detect — the
    deduped corpus has no duplicated k-grams left (aggressive mode cuts
    every copy)."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import (
        duplicate_spans,
        remove_spans,
    )

    boiler = "SHARED-BOILERPLATE-BLOCK :: "
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [boiler + "alpha body", boiler + "beta body", "clean unique doc"],
                type=pa.string(),
            ),
        }
    )
    k = 8
    spans = duplicate_spans(rd.from_arrow(tbl), k=k, num_buckets=4, doc_buckets=4)
    deduped = remove_spans(rd.from_arrow(tbl), spans, doc_buckets=4).to_pandas()
    deduped = deduped.sort_values("doc_id").reset_index(drop=True)
    assert deduped["text_dedup"][2] == "clean unique doc"
    # the shared prefix is gone from both copies
    for i in (0, 1):
        assert boiler not in deduped["text_dedup"][i]
    # re-detect over the deduped text: nothing left
    re_tbl = pa.table(
        {"doc_id": pa.array(deduped["doc_id"], type=pa.int64()),
         "text": pa.array(deduped["text_dedup"], type=pa.string())}
    )
    again = duplicate_spans(rd.from_arrow(re_tbl), k=k, num_buckets=4, doc_buckets=4)
    assert again.count() == 0


def test_char_window_hashes_property_unicode():
    """Byte-level semantics on arbitrary unicode: kernel output equals the
    scalar reference over each row's utf-8 BYTE windows (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=8),
        st.integers(min_value=1, max_value=9),
    )
    def check(texts, k):
        arr = pa.array(texts, type=pa.string())
        row_of, pos, h = char_window_hashes(arr, k)
        P = (1 << 61) - 1
        expected = []
        for i, t in enumerate(texts):
            data = (t or "").encode("utf-8")
            for p in range(max(0, len(data) - k + 1)):
                # reference: the scalar Rabin-Karp loop over the raw BYTE
                # window (rolling_fingerprint's formula, re-applied here
                # because it only accepts str and would re-encode)
                acc = 0
                for b in data[p : p + k]:
                    acc = (acc * 257 + b) % P
                expected.append((i, p, acc))
        got = list(zip(row_of.tolist(), pos.tolist(), h.tolist()))
        assert got == expected

    check()


def test_keep_first_policy_emit_losers(ray_session):
    """Two exact copies of a block: emit='losers' withholds the
    (doc_id, pos)-first occurrence of every duplicated gram, so cutting
    the emitted spans leaves exactly one copy intact."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import (
        duplicate_spans,
        remove_spans,
    )

    boiler = "EXACT-COPY-BLOCK-123456 :: "
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [boiler + "alpha", boiler + "beta", "unique text here"],
                type=pa.string(),
            ),
        }
    )

    def docs():
        return rd.from_arrow(tbl)

    cuts = duplicate_spans(
        docs(), k=8, num_buckets=4, doc_buckets=4, emit="losers"
    )
    cuts_df = cuts.to_pandas().sort_values(["doc_id", "span_start"])
    # only doc 2's copy lands on the cut list (doc 1 wins every gram)
    assert set(cuts_df["doc_id"]) == {2}
    out = (
        remove_spans(docs(), cuts, doc_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text_dedup"][0] == boiler + "alpha"  # kept copy intact
    assert boiler not in out["text_dedup"][1]        # second copy cut
    assert out["text_dedup"][2] == "unique text here"


def test_emit_losers_within_doc(ray_session):
    """Within-doc copies: the earlier occurrence wins, the later is cut."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import duplicate_spans

    t = "abcdefgh" + "0123456789012345" + "abcdefgh"
    docs = pa.table(
        {"doc_id": pa.array([7], type=pa.int64()),
         "text": pa.array([t], type=pa.string())}
    )
    out = (
        duplicate_spans(rd.from_arrow(docs), k=8, num_buckets=4,
                        doc_buckets=4, emit="losers")
        .to_pandas()
    )
    assert out["span_start"].tolist() == [25]
    assert out["span_end"].tolist() == [33]


def test_emit_validates(ray_session):
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import duplicate_spans

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([1]), "text": pa.array(["x"])}))
    import pytest as _pt
    with _pt.raises(ValueError, match="emit"):
        duplicate_spans(docs, emit="bogus")


def test_duplicate_spans_property_vs_bruteforce(ray_session):
    """Random small corpora: the distributed pipeline equals a brute-force
    substring-count + island-merge reference (hypothesis)."""
    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cdm_data_loader_utils_ray.functions.substrings import duplicate_spans

    def brute(texts, k):
        from collections import Counter

        counts = Counter()
        occ = []
        for i, t in enumerate(texts):
            t = t or ""
            for p in range(len(t) - k + 1):
                g = t[p : p + k]
                counts[g] += 1
                occ.append((i, p + 1, g))
        spans = {}
        for i, p, g in occ:
            if counts[g] >= 2:
                spans.setdefault(i, []).append(p)
        out = []
        for i, ps in spans.items():
            ps.sort()
            start = prev = ps[0]
            for p in ps[1:]:
                if p - prev > k:
                    out.append((i, start, prev + k))
                    start = p
                prev = p
            out.append((i, start, prev + k))
        return sorted(out)

    # small alphabet so duplicates actually occur
    text_st = st.text(alphabet="abc", max_size=30)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.one_of(st.none(), text_st), min_size=1, max_size=6),
           st.integers(min_value=2, max_value=5))
    def check(texts, k):
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        got = (
            duplicate_spans(rd.from_arrow(docs), k=k, num_buckets=3, doc_buckets=3)
            .to_pandas()
        )
        got_t = sorted(
            zip(got["doc_id"].astype(int), got["span_start"].astype(int),
                got["span_end"].astype(int))
        ) if len(got) else []
        assert got_t == brute(texts, k)

    check()


def test_remove_spans_vectorized_edges(ray_session):
    """Edge rows for the byte-mask cut kernel: whole-doc span, empty text,
    trailing empty row (reduceat clamp), null text, span clamped past the
    end of its doc."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import remove_spans

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "text": pa.array(["WHOLE", "abcXdef", None, "tail", ""], type=pa.string()),
        }
    )
    spans = pa.table(
        {
            "doc_id": pa.array([1, 2, 4], type=pa.int64()),
            "span_start": pa.array([1, 4, 2], type=pa.int64()),
            "span_end": pa.array([6, 5, 99], type=pa.int64()),  # 99 clamps
        }
    )
    out = (
        remove_spans(rd.from_arrow(docs), rd.from_arrow(spans), doc_buckets=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text_dedup"].tolist()[0] == ""        # whole doc cut
    assert out["text_dedup"].tolist()[1] == "abcdef"  # middle byte cut
    assert out["text_dedup"].isna().tolist()[2]       # null stays null
    assert out["text_dedup"].tolist()[3] == "t"       # clamped tail cut
    assert out["text_dedup"].tolist()[4] == ""        # empty stays empty


def test_remove_spans_trailing_empty_doc_keeps_final_bytes(ray_session):
    """Reviewer repro: docs ['abc', ''] in one bucket, span cutting only
    byte 1 of doc 1 — the old reduceat index clamp truncated doc 1's
    segment and silently dropped its LAST kept byte ('b' instead of 'bc')."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import remove_spans

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["abc", ""], type=pa.string()),
        }
    )
    spans = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "span_start": pa.array([1], type=pa.int64()),
            "span_end": pa.array([2], type=pa.int64()),
        }
    )
    out = (
        remove_spans(rd.from_arrow(docs), rd.from_arrow(spans), doc_buckets=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text_dedup"].tolist() == ["bc", ""]


def test_remove_spans_duplicate_doc_ids_each_get_cut(ray_session):
    """Duplicate doc ids in a bucket: every copy receives the cut (the
    unique-index Series.map raised InvalidIndexError on them)."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import remove_spans

    docs = pa.table(
        {
            "doc_id": pa.array([7, 7, 8], type=pa.int64()),
            "text": pa.array(["xyz", "xyz", "keep"], type=pa.string()),
        }
    )
    spans = pa.table(
        {
            "doc_id": pa.array([7], type=pa.int64()),
            "span_start": pa.array([2], type=pa.int64()),
            "span_end": pa.array([3], type=pa.int64()),
        }
    )
    out = (
        remove_spans(rd.from_arrow(docs), rd.from_arrow(spans), doc_buckets=1)
        .to_pandas()
        .sort_values(["doc_id", "text_dedup"])
        .reset_index(drop=True)
    )
    assert out["text_dedup"].tolist() == ["xz", "xz", "keep"]


def test_remove_spans_property_vs_python_reference(ray_session):
    """Random corpora with EMPTY docs, null texts and duplicate ids mixed
    in: the vectorized byte-surgery kernel must equal a plain Python
    slice-and-join reference on every doc (the reduceat-era bug hid
    exactly in the empty-doc arrangement a fixed fixture missed)."""
    import ray.data as rd

    from cdm_data_loader_utils_ray.functions.substrings import remove_spans

    rng = np.random.default_rng(123)
    for trial in range(6):
        n = int(rng.integers(3, 16))
        ids, texts = [], []
        for i in range(n):
            ids.append(int(i if rng.random() > 0.2 else max(0, i - 1)))  # dups
            r = rng.random()
            texts.append(
                None if r < 0.15 else ""
                if r < 0.35 else "".join(rng.choice(list("abxy "), size=int(rng.integers(1, 20))))
            )
        spans = {}
        for i, t in zip(ids, texts):
            if t and rng.random() > 0.3 and i not in spans:
                a = int(rng.integers(0, len(t)))
                b = int(rng.integers(a + 1, len(t) + 1))
                spans[i] = (a + 1, b + 1)  # 1-based like duplicate_spans
        docs = pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )
        sp = pa.table(
            {
                "doc_id": pa.array(list(spans), pa.int64()),
                "span_start": pa.array([v[0] for v in spans.values()], pa.int64()),
                "span_end": pa.array([v[1] for v in spans.values()], pa.int64()),
            }
        )
        out = (
            remove_spans(rd.from_arrow(docs), rd.from_arrow(sp), doc_buckets=2)
            .to_pandas()
        )
        # reference: python slicing per (id, text) occurrence
        want = []
        for i, t in zip(ids, texts):
            if t is None:
                want.append(None)
            elif i in spans:
                a, b = spans[i]
                want.append(t[: a - 1] + t[b - 1:])
            else:
                want.append(t)
        got = sorted(out["text_dedup"].tolist(), key=lambda x: (x is None, x))
        assert got == sorted(want, key=lambda x: (x is None, x)), trial
