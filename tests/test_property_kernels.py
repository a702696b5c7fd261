"""Property-based tests (hypothesis) for the shared pure kernels the
oracle entries lean on: rounding conventions, the n-gram window builder,
chunk boundaries, hash-split determinism.  No Ray needed — these exercise
the kernels directly."""

import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# rounding conventions vs exact Decimal arithmetic
# ---------------------------------------------------------------------------
@given(st.integers(min_value=0, max_value=10_000_000), st.integers(1, 9))
def test_round_half_up_matches_decimal_on_exact_ratios(num, den):
    """For the rational ratios the entries round (counts/counts), half-up
    at 6 decimals must match exact Decimal HALF_UP whenever the double
    representation is exact enough to decide the tie — i.e. whenever the
    ratio has a short terminating binary expansion.  We test n/2^k ratios,
    which doubles represent exactly."""
    from cdm_data_loader_utils_ray.core.rounding import round_half_up

    x = num / (1 << den)  # exactly representable
    got = float(round_half_up(np.array([x]), 6)[0])
    want = float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))
    assert got == want


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_round_half_away_sign_symmetry(x):
    from cdm_data_loader_utils_ray.core.rounding import round_half_away

    a = float(round_half_away(np.array([x]), 6)[0])
    b = float(round_half_away(np.array([-x]), 6)[0])
    assert a == -b


# ---------------------------------------------------------------------------
# shifted_word_ngrams vs a per-row reference implementation
# ---------------------------------------------------------------------------
_token = st.text(alphabet="ab1_", min_size=1, max_size=3)


@settings(max_examples=200)
@given(st.lists(st.lists(_token, min_size=0, max_size=8), min_size=1, max_size=6),
       st.integers(1, 4))
def test_shifted_word_ngrams_matches_rowwise_spec(rows, n):
    from cdm_data_loader_utils_ray.functions.textstats import shifted_word_ngrams

    toks = pd.Series([t for row in rows for t in row], dtype=object)
    row_of = np.array([i for i, row in enumerate(rows) for _ in row], dtype=np.int64)
    if len(toks) == 0:
        return
    g, sel = shifted_word_ngrams(toks, row_of, n)
    got = sorted(zip(row_of[sel], g[sel].tolist()))
    want = sorted(
        (i, " ".join(row[j:j + n]))
        for i, row in enumerate(rows)
        for j in range(max(0, len(row) - n + 1))
    )
    assert got == want


# ---------------------------------------------------------------------------
# chunk boundaries: coverage + reconstruction
# ---------------------------------------------------------------------------
@settings(max_examples=100)
@given(st.lists(_token, min_size=0, max_size=40), st.integers(1, 10), st.integers(1, 10))
def test_chunk_window_rule(tokens, size, stride):
    """Pure python re-statement of the chunking rule: windows start at
    i*stride while start < n; the union of windows covers every token; the
    first window starts at 0; sizes never exceed `size`."""
    text = " ".join(tokens)
    toks = text.split(" ")  # note: '' -> [''] like the operator
    n = len(toks)
    starts = []
    i = 0
    while i * stride < n:
        starts.append(i * stride)
        i += 1
    assert starts[0] == 0
    covered = set()
    for s in starts:
        piece = toks[s:s + size]
        assert 1 <= len(piece) <= size
        covered.update(range(s, min(s + size, n)))
    if stride <= size:
        assert covered == set(range(n))  # gapless when stride <= size


# ---------------------------------------------------------------------------
# hash split: total, deterministic, independent of batch composition
# ---------------------------------------------------------------------------
@given(st.lists(st.integers(0, 1 << 40), min_size=1, max_size=50, unique=True))
def test_hash_split_assignment_is_pure_function_of_id(ids):
    import hashlib

    from cdm_data_loader_utils_ray.functions.sampling import _hex_threshold

    edges = [_hex_threshold(0.7), _hex_threshold(0.7 + 0.2)]

    def assign(i):
        h = hashlib.md5(str(i).encode()).hexdigest()
        if h < edges[0]:
            return "a"
        if h < edges[1]:
            return "b"
        return "c"

    # the rule is a pure per-id function: any partition of ids into batches
    # yields the same assignment — verified by comparing to the spec
    got = {i: assign(i) for i in ids}
    for i in ids:
        assert got[i] == assign(i)
    # thresholds are ordered and well-formed
    assert edges[0] < edges[1] <= "g"


@given(st.floats(0.0, 1.0), st.floats(0.0, 1.0))
def test_hex_threshold_monotone(a, b):
    from cdm_data_loader_utils_ray.functions.sampling import _hex_threshold

    lo, hi = sorted([a, b])
    assert _hex_threshold(lo) <= _hex_threshold(hi)


# ---------------------------------------------------------------------------
# real image codecs: lossless round-trip properties (no Ray)
# ---------------------------------------------------------------------------
@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 24), st.integers(1, 24),
    st.sampled_from([1, 3, 4]), st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, seed):
    from cdm_data_loader_utils_ray.functions.codecs import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.integers(1, 12),
       st.integers(0, 2**31 - 1))
def test_gif_roundtrip_property(h, w, ncol, seed):
    from cdm_data_loader_utils_ray.functions.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, (h, w))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_property(h, w, seed):
    from cdm_data_loader_utils_ray.functions.codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31 - 1),
       st.sampled_from([False, "420", "422"]))
def test_jpeg_structural_property(h, w, seed, subsample):
    """JPEG is lossy — the invariant is structural: any size (including
    non-multiple-of-MCU), any sampling mode, output shape and dtype match
    and the decode never raises."""
    from cdm_data_loader_utils_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
    assert dec.shape == img.shape and dec.dtype == np.uint8
