"""Golden equivalence: the vectorized text-analysis kernels must match the
per-row reference implementations (the executable spec) bit-for-bit on an
adversarial corpus — mixed scripts, contractions, apostrophe pathologies,
every whitespace class, empty/null rows, and case-mapping edge cases
('İ' lowers to 'i' + combining dot in Python, which CREATES a word char)."""

import random
import string

import numpy as np
import pyarrow as pa
import pytest

from cdm_data_loader_utils_ray.functions import textstats as ts
from cdm_data_loader_utils_ray.stages.hashing import (
    rolling_fingerprint,
    rolling_fingerprint_batch,
)


def _nasty_corpus():
    random.seed(11)
    rows = [
        "", None, "a", "  ", "\t\n\v\f\r", "hello world", "a  b", "a b",
        "a\t b", "a \tb", "it's a don't'll 'street 'la ''x",
        "the quick brown fox is in the house", "der und die das ist ein",
        "le la les et est pour", "el la los y es para que",
        "中文文档测试 the and", "İstanbul ß ẞ ı I İ", "kaİb the", "éàü çñ",
        "1234 _under_ mix3d", "trailing space ", " leading", "!!!", " !",
        "! ", "a!b", "a !b", "a! b", "word" * 100, "the and of " * 80,
        "x 'm", "'s", "''s", "' s", "x" * 63, "y" * 64, "z" * 65,
    ]
    alphabet = string.printable + "中文éİß'"
    for _ in range(300):
        n = random.randrange(0, 300)
        rows.append("".join(random.choice(alphabet) for _ in range(n)))
    return rows


@pytest.fixture(scope="module")
def corpus():
    rows = _nasty_corpus()
    return rows, pa.array(rows, type=pa.string())


def test_quality_columns_match_rowwise(corpus):
    rows, arr = corpus
    stops = frozenset().union(*ts._LANG_PROFILES.values())
    got = ts.quality_columns(arr, stops)
    want = ts.quality_columns_rowwise(arr, stops)
    for k in want:
        g = np.asarray(got[k].to_pylist(), dtype=np.float64)
        w = np.asarray(want[k].to_pylist(), dtype=np.float64)
        assert ((g == w) | (np.isnan(g) & np.isnan(w))).all(), k


def test_bpe_count_matches_regex(corpus):
    rows, arr = corpus
    got = ts.bpe_token_count(arr).to_pylist()
    # null text -> null count (SQL len(regexp_extract_all(NULL,...)) is NULL)
    want = [None if t is None else len(ts._BPE.findall(t)) for t in rows]
    assert got == want


def test_langid_matches_classify(corpus):
    rows, arr = corpus
    li = ts.LangId()
    got = ts.langid_array(arr).to_pylist()
    want = [li.classify(t or "") for t in rows]
    assert got == want


def test_fingerprint_batch_matches_scalar(corpus):
    rows, arr = corpus
    got = rolling_fingerprint_batch(arr).to_pylist()
    want = [rolling_fingerprint(t or "") for t in rows]
    assert got == want
    # non-zero offset (sliced array) path
    sl = arr.slice(5, 100)
    assert rolling_fingerprint_batch(sl).to_pylist() == want[5:105]


def test_fused_analyzer_consistent(corpus):
    """TextAnalyzer output columns == the standalone kernels' outputs."""
    rows, arr = corpus
    batch = pa.table({"doc_id": list(range(len(rows))), "text": arr})
    out = ts.TextAnalyzer()(batch)
    li = ts.LangId()
    assert out["lang_pred"].to_pylist() == [li.classify(t or "") for t in rows]
    assert out["n_tokens_bpe"].to_pylist() == [
        None if t is None else len(ts._BPE.findall(t)) for t in rows
    ]
    assert out["fingerprint"].to_pylist() == [
        rolling_fingerprint(t or "") for t in rows
    ]


def test_lower_exact_nonascii_vectorized_path():
    """Non-ASCII batches no longer take a whole-batch Python loop: only
    rows containing DIVERGENT codepoints (utf8proc vs str.lower) do.
    Semantics must equal str.lower on every row either way."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from cdm_data_loader_utils_ray.functions.textstats import (
        _divergent_lower_pattern,
        _lower_exact,
    )

    rows = [
        "PLAIN ASCII",
        "Café NAÏVE déjà vu",        # accented, NON-divergent -> utf8_lower
        "İstanbul İİ",               # dotted capital I: divergent
        "ΟΔΥΣΣΕΥΣ",                  # trailing sigma: Python final-sigma ς
        "ΣΙΓΜΑ MID Σ END",
        "straße GROSS ẞ",            # U+1E9E sharp S
        "",
        "混合 CJK と ASCII",
    ]
    got = _lower_exact(pa.array(rows, type=pa.string()))
    assert got.to_pylist() == [r.lower() for r in rows]
    # the divergent class flags exactly the rows that need Python
    pat = _divergent_lower_pattern()
    flags = pc.match_substring_regex(pa.array(rows), pat).to_pylist()
    assert flags[1] is False  # plain accents stay on the Arrow path
    assert flags[2] and flags[3] and flags[4]


def test_lower_exact_fuzz_vs_python():
    import random

    import pyarrow as pa

    from cdm_data_loader_utils_ray.functions.textstats import _lower_exact

    rng = random.Random(7)
    pool = (
        [chr(c) for c in range(32, 127)]
        + ["İ", "Σ", "ς", "ß", "ẞ", "Ö", "Ǆ", "ǅ", "Ⅷ", "Ｆ", "土", "Ａ"]
    )
    rows = ["".join(rng.choices(pool, k=rng.randrange(0, 30))) for _ in range(500)]
    got = _lower_exact(pa.array(rows, type=pa.string()))
    assert got.to_pylist() == [r.lower() for r in rows]
