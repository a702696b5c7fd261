"""Text analysis for training-data pipelines: language ID (n-gram
heuristic), quality scoring (length/punct/stopword ratios), token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprinting.

All are actor-pool ``map_batches`` stages.  The column kernels are
vectorized end-to-end (r3): tokenization is ONE ``pc.split_pattern_regex``
call per batch, per-row aggregates are cumsum-diffs over the flat token
array, language scores are ``pc.is_in`` + segment sums, the BPE-ish token
count is a byte-class transition count (exact regex fallback only for rows
containing an apostrophe, where the contraction alternatives fire), and the
fingerprint is the batched mod-(2^61-1) kernel in ``stages/hashing.py``.
The per-row reference implementations are kept (``*_rowwise`` /
``LangId.classify``) as the executable spec — a golden pytest asserts the
vectorized kernels match them on an adversarial corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.core.rounding import round_half_up
from cdm_data_loader_utils_ray.stages.hashing import (
    rolling_fingerprint,
    rolling_fingerprint_batch,
)

# Tiny per-language stopword / character profiles (public common words).
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "with", "this"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que", "des"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "para", "que", "de", "en"},
}
_CJK = re.compile(r"[一-鿿]")
_CJK_PATTERN = "[一-鿿]"
# Explicit ASCII classes, NOT "\w"/"\s": Python's "\w" is Unicode-aware
# while DuckDB's RE2 "\w" is ASCII-only, so the shared patterns must spell
# out the exact class to tokenize identically on non-ASCII input (the r2
# ADVICE finding — parity previously held only because the test corpus was
# pure ASCII).  [0-9A-Za-z_] == RE2 "\w"; [ \t\n\v\f\r] is the explicit
# whitespace class both engines agree on.
_WORD = re.compile(r"[0-9A-Za-z_]+")
_NONWORD_SPLIT = "[^0-9A-Za-z_]+"
_WS = r" \t\n\v\f\r"
# BPE-ish pre-tokenizer (GPT-2-style pattern, public).  Deliberately
# lookahead-free so the EXACT same pattern runs under RE2 (DuckDB
# regexp_extract_all) for the SQL oracle twin.
BPE_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[0-9A-Za-z_]+| ?[^"
    + _WS + r"0-9A-Za-z_]+|[" + _WS + r"]+"
)
_BPE = re.compile(BPE_PATTERN)


def round6_half_up(x: np.ndarray) -> np.ndarray:
    """Round to 6 decimals with HALF-UP ties — ``np.round`` is half-even
    while DuckDB ``round()`` is half-away; rational ratios (stopword
    counts / token counts) can land exactly on the 5e-7 boundary, so both
    engines must use the same explicit convention.  Thin alias of the
    shared :func:`core.rounding.round_half_up` (single source of truth)."""
    return round_half_up(x, 6)


# ---------------------------------------------------------------------------
# Flat-token machinery: ONE regex split per batch, then per-row aggregates
# as cumsum-diffs over the flattened token array.  `re.findall(WORD, s)` ==
# the non-empty pieces of `re.split(NONWORD, s)` in order, so segment sums
# masked by `valid` reproduce the per-row findall loops exactly.
# ---------------------------------------------------------------------------
def _flat_tokens(texts: pa.Array):
    """(flat_tokens, row_offsets, tok_len, valid) for a string array with
    no nulls.  Empty pieces from edge delimiters are present but masked
    out by ``valid``."""
    lists = pc.split_pattern_regex(texts, pattern=_NONWORD_SPLIT)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    off = lists.offsets.to_numpy().astype(np.int64)
    flat = lists.values
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, off, tok_len, tok_len > 0


_DIVERGENT_LOWER_RE: str | None = None


def _divergent_lower_pattern() -> str:
    """RE2 character class of every codepoint where ``pc.utf8_lower``
    (utf8proc) and Python ``str.lower`` DISAGREE, plus U+03A3 'Σ' (Python's
    single context-sensitive mapping — final sigma — which no per-codepoint
    comparison can capture).  Computed once per process by lowering all
    codepoints through both engines in one vectorized call (~0.3 s, cached;
    only ever paid by workers that see a non-ASCII batch)."""
    chars = [chr(c) for c in range(0x110000) if not (0xD800 <= c <= 0xDFFF)]
    arrow_low = pc.utf8_lower(pa.array(chars, type=pa.string())).to_pylist()
    div = {c for c, a in zip(chars, arrow_low) if a != c.lower()}
    div.add("Σ")
    return "[" + "".join(re.escape(c) for c in sorted(div)) + "]"


def _lower_exact(filled: pa.Array) -> pa.Array:
    """Lowercase with exact ``str.lower`` semantics.  ``pc.utf8_lower``
    diverges from Python on e.g. 'İ' (utf8proc: 'i'; Python: 'i' +
    combining dot) and final sigma — and 'İ'→'i' CREATES a word char,
    changing token boundaries.  Pure-ASCII batches (the common case) take
    the C-speed ``ascii_lower`` path, which is exactly ``str.lower`` there.
    Non-ASCII batches stay vectorized too (r3 verdict #5): ``utf8_lower``
    is pointwise-identical to Python for every row free of divergent
    codepoints, so only rows matching the precomputed divergent class
    (rare: dotted-I, sigma, a handful of Unicode edge mappings) take the
    per-row Python path, patched back in with ``replace_with_mask``."""
    if pc.all(pc.string_is_ascii(filled)).as_py() is not False:
        return pc.ascii_lower(filled)
    global _DIVERGENT_LOWER_RE
    if _DIVERGENT_LOWER_RE is None:
        _DIVERGENT_LOWER_RE = _divergent_lower_pattern()
    lowered = pc.utf8_lower(filled)
    needs_py = pc.match_substring_regex(filled, _DIVERGENT_LOWER_RE)
    if pc.any(needs_py).as_py():
        mask = needs_py.to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(mask)
        fixed = pa.array(
            [filled[int(i)].as_py().lower() for i in idx], type=pa.string()
        )
        lowered = pc.replace_with_mask(lowered, needs_py, fixed)
    return lowered


def shifted_word_ngrams(toks, row_of: np.ndarray, n: int):
    """Word n-grams over a flat VALID-token Series via (n-1) shifted string
    concats — the shared builder for vocab/decontam/repetition (r3 review:
    three drifting copies).  ``row_of`` is the row id per token
    (nondecreasing); returns ``(grams, sel)`` where ``grams`` is aligned to
    window-START positions and ``sel`` masks starts whose whole window
    stays inside one row (tail windows that would run off the end or cross
    a document boundary are False)."""
    g = toks.copy()
    for j in range(1, n):
        g = g + " " + toks.shift(-j)
    ok = row_of == np.roll(row_of, -(n - 1))
    if n > 1:
        # max(0, ...): when n-1 >= len the naive negative slice start would
        # wrap and mask only its last few positions, letting a NaN window
        # through (hypothesis-found edge; call sites used to guard it away)
        ok[max(0, len(ok) - (n - 1)):] = False
    return g, ok


def _seg_sum(x: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Per-row sums of a flat array under row offsets (safe for empty rows,
    unlike ``np.add.reduceat``)."""
    c = np.zeros(len(x) + 1, dtype=np.int64)
    np.cumsum(x, out=c[1:])
    return c[off[1:]] - c[off[:-1]]


def quality_columns(texts, stops) -> dict:
    """n_chars_f / space_ratio / stopword_ratio / mean_token_len /
    quality_score arrays for a text column.  Vectorized; bit-identical to
    :func:`quality_columns_rowwise` (segment int sums then one float64
    division, exactly like the per-row ``sum()/len()``)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_chars = pc.utf8_length(texts).cast(pa.float64())
    n_space = pc.count_substring(texts, " ").cast(pa.float64())
    lowered = _lower_exact(pc.fill_null(texts, ""))
    flat, off, tok_len, valid = _flat_tokens(lowered)
    stop_mask = pc.is_in(flat, value_set=pa.array(sorted(stops))).to_numpy(
        zero_copy_only=False
    )
    n_tok = _seg_sum(valid, off).astype(np.float64)
    denom = np.maximum(n_tok, 1.0)
    stop_arr = _seg_sum(stop_mask & valid, off) / denom
    mt = _seg_sum(tok_len, off) / denom
    nc = n_chars.to_numpy(zero_copy_only=False)
    space_ratio = n_space.to_numpy(zero_copy_only=False) / np.maximum(nc, 1)
    len_score = np.clip(nc / 500.0, 0, 1)
    tok_score = np.exp(-0.5 * ((mt - 5.0) / 3.0) ** 2)  # plausible word lengths
    score = 0.4 * len_score + 0.3 * np.minimum(stop_arr * 4, 1) + 0.3 * tok_score
    return _null_masked_quality(texts, nc, space_ratio, stop_arr, mt, score)


def quality_columns_rowwise(texts, stops) -> dict:
    """Per-row reference implementation of :func:`quality_columns` (the
    executable spec for the golden equivalence test)."""
    n_chars = pc.utf8_length(texts).cast(pa.float64())
    n_space = pc.count_substring(texts, " ").cast(pa.float64())
    stop_ratio, mean_tok = [], []
    for t in texts.to_pylist():
        toks = _WORD.findall((t or "").lower())
        if toks:
            stop_ratio.append(sum(tt in stops for tt in toks) / len(toks))
            mean_tok.append(sum(map(len, toks)) / len(toks))
        else:
            stop_ratio.append(0.0)
            mean_tok.append(0.0)
    stop_arr = np.array(stop_ratio)
    mt = np.array(mean_tok)
    nc = n_chars.to_numpy(zero_copy_only=False)
    space_ratio = n_space.to_numpy(zero_copy_only=False) / np.maximum(nc, 1)
    len_score = np.clip(nc / 500.0, 0, 1)
    tok_score = np.exp(-0.5 * ((mt - 5.0) / 3.0) ** 2)
    score = 0.4 * len_score + 0.3 * np.minimum(stop_arr * 4, 1) + 0.3 * tok_score
    return _null_masked_quality(texts, nc, space_ratio, stop_arr, mt, score)


def _null_masked_quality(texts, nc, space_ratio, stop_arr, mt, score) -> dict:
    """Assemble the quality dict, nulling every output for null-text rows
    (SQL aggregates over NULL text yield NULL, not NaN/0)."""
    cols = {
        "n_chars_f": pa.array(nc),
        "space_ratio": pa.array(round6_half_up(space_ratio)),
        "stopword_ratio": pa.array(round6_half_up(stop_arr)),
        "mean_token_len": pa.array(round6_half_up(mt)),
        "quality_score": pa.array(round6_half_up(score)),
    }
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if texts.null_count:
        valid = pc.is_valid(texts)
        nulls = pa.nulls(len(texts), pa.float64())
        cols = {k: pc.if_else(valid, v, nulls) for k, v in cols.items()}
    return cols


# ---------------------------------------------------------------------------
# BPE-ish token count.  For apostrophe-free text no contraction alternative
# can fire, and the leftmost-first scan reduces to maximal byte-class runs
# (word / punct / whitespace) with ONE absorption rule: a whitespace run
# that is exactly a single ' ' immediately followed by a word or punct char
# merges into the following token (" ?...").  Runs ≥ 2 ws chars are eaten
# whole by the greedy "[ws]+" (a trailing space does NOT detach).  Byte
# classes suffice: every non-ASCII utf-8 byte (lead or continuation) is
# punct-class, so class-run boundaries over bytes == over codepoints.
# Rows containing "'" fall back to the exact regex scan.
# ---------------------------------------------------------------------------
_BYTE_CLASS = np.full(256, 2, dtype=np.uint8)  # 2 = punct
for _b in b"0123456789_":
    _BYTE_CLASS[_b] = 0
for _b in range(ord("A"), ord("Z") + 1):
    _BYTE_CLASS[_b] = 0
for _b in range(ord("a"), ord("z") + 1):
    _BYTE_CLASS[_b] = 0
for _b in b" \t\n\v\f\r":
    _BYTE_CLASS[_b] = 1  # ws


def _bpe_counts_vectorized(texts: pa.Array) -> np.ndarray:
    """Exact ``len(_BPE.findall(t))`` per row for a no-null, no-apostrophe
    string array, via byte-class transition counting."""
    n = len(texts)
    off0 = texts.offset
    odt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    offs = np.frombuffer(texts.buffers()[1], dtype=odt, count=n + 1 + off0)[off0:]
    data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
    offs = (offs - offs[0]).astype(np.int64)
    total = len(data)
    if total == 0:
        return np.zeros(n, dtype=np.int64)
    cls = _BYTE_CLASS[data]
    start = np.empty(total, dtype=bool)
    start[0] = True
    np.not_equal(cls[1:], cls[:-1], out=start[1:])
    start[offs[:-1][offs[:-1] < total]] = True  # row boundaries reset runs
    runs = _seg_sum(start, offs)
    # absorption: single ' ' run followed (same row) by a non-ws byte
    row_last = np.zeros(total, dtype=bool)
    ends = offs[1:] - 1
    row_last[ends[ends >= 0]] = True
    nxt_start = np.empty(total, dtype=bool)
    nxt_start[:-1] = start[1:]
    nxt_start[-1] = True
    nxt_not_ws = np.zeros(total, dtype=bool)
    nxt_not_ws[:-1] = cls[1:] != 1
    absorbed = start & (data == ord(" ")) & nxt_start & ~row_last & nxt_not_ws
    return runs - _seg_sum(absorbed, offs)


def bpe_token_count(texts) -> pa.Array:
    """``len(_BPE.findall(t))`` per row; null text -> null (the SQL twin's
    ``len(regexp_extract_all(NULL, ...))`` is NULL, and n_tokens_ws is
    already null there — 0 would be internally inconsistent).  Vectorized
    transition counting for apostrophe-free rows, exact regex scan for the
    rest (contractions make the scan genuinely sequential)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    filled = pc.fill_null(texts, "")
    counts = _bpe_counts_vectorized(filled).astype(np.int64)
    has_apos = pc.count_substring(filled, "'").to_numpy(zero_copy_only=False) > 0
    if has_apos.any():
        idx = np.where(has_apos)[0]
        sub = filled.take(pa.array(idx)).to_pylist()
        counts[idx] = [len(_BPE.findall(t)) for t in sub]
    out = pa.array(counts, type=pa.int64())
    if texts.null_count:
        out = pc.if_else(pc.is_valid(texts), out, pa.nulls(len(texts), pa.int64()))
    return out


def token_count_columns(texts) -> dict:
    """n_tokens_ws (whitespace) / n_tokens_bpe (RE2-safe BPE-ish) arrays."""
    return {
        "n_tokens_ws": pc.list_value_length(pc.split_pattern(texts, " ")).cast(pa.int64()),
        "n_tokens_bpe": bpe_token_count(texts),
    }


def fingerprint_column(texts, window: int = 64) -> pa.Array:
    """Rolling-hash fingerprint per row (vectorized; bit-identical to the
    scalar :func:`stages.hashing.rolling_fingerprint`)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return rolling_fingerprint_batch(texts, window=window)


# ---------------------------------------------------------------------------
# Language ID.  `classify` is the per-row reference; `langid_array` is the
# vectorized twin: tokens of the ORIGINAL text (findall-then-lower, like
# classify — subtly different from lower-then-findall for chars like 'İ'),
# capped at the first 200, scored per profile with is_in + segment sums,
# first-max-wins across profiles in insertion order.
# ---------------------------------------------------------------------------
def langid_array(texts) -> pa.Array:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    filled = pc.fill_null(texts, "")
    flat, off, tok_len, valid = _flat_tokens(filled)
    # tokens are runs of [0-9A-Za-z_] — pure ASCII — so ascii_lower IS
    # str.lower here (findall-then-lower == lower each ASCII token)
    flat_lower = pc.ascii_lower(flat)
    # rank of each token among its row's VALID tokens (1-based)
    cv = np.zeros(len(valid) + 1, dtype=np.int64)
    np.cumsum(valid, out=cv[1:])
    row_id = np.repeat(np.arange(n), np.diff(off))
    rank = cv[1:] - cv[off[:-1]][row_id]
    in200 = valid & (rank <= 200)
    n200 = _seg_sum(in200, off).astype(np.float64)
    langs = list(_LANG_PROFILES)
    scores = np.empty((len(langs), n), dtype=np.float64)
    denom = np.maximum(n200, 1.0)
    for i, lang in enumerate(langs):
        hit = pc.is_in(
            flat_lower, value_set=pa.array(sorted(_LANG_PROFILES[lang]))
        ).to_numpy(zero_copy_only=False)
        scores[i] = _seg_sum(hit & in200, off) / denom
    best_idx = np.argmax(scores, axis=0)  # first max wins == profile order
    best_score = scores[best_idx, np.arange(n)]
    preds = np.array(langs, dtype=object)[best_idx]
    preds[(best_score <= 0.02) | (n200 == 0)] = "und"
    cjk = pc.match_substring_regex(filled, _CJK_PATTERN).to_numpy(zero_copy_only=False)
    preds[cjk] = "zh"
    empty = pc.equal(pc.utf8_length(filled), 0).to_numpy(zero_copy_only=False)
    preds[empty] = "und"
    return pa.array(preds, type=pa.string())


class LangId:
    """n-gram/stopword language-ID heuristic (no model downloads)."""

    def __init__(self, text_column: str = "text", out_column: str = "lang_pred"):
        self.text_column, self.out_column = text_column, out_column
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def classify(self, text: str) -> str:
        """Per-row reference implementation (spec for `langid_array`)."""
        if not text:
            return "und"
        if _CJK.search(text):
            return "zh"
        toks = [t.lower() for t in _WORD.findall(text)[:200]]
        if not toks:
            return "und"
        best, best_score = "und", 0.0
        for lang, stops in self.profiles.items():
            score = sum(t in stops for t in toks) / len(toks)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0.02 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(self.out_column, langid_array(batch[self.text_column]))


class QualityScore:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0, 1] (heuristic quality filter for pretraining corpora)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.stops = frozenset().union(*_LANG_PROFILES.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch
        for name, arr in quality_columns(batch[self.text_column], self.stops).items():
            out = out.append_column(name, arr)
        return out


class TokenCount:
    """Whitespace and BPE-ish token counts per document."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch
        for name, arr in token_count_columns(batch[self.text_column]).items():
            out = out.append_column(name, arr)
        return out


class Fingerprint:
    """Rolling-hash document fingerprint (Rabin-Karp min-window; stable
    under small edits elsewhere in the document)."""

    def __init__(self, text_column: str = "text", window: int = 64):
        self.text_column, self.window = text_column, window

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "fingerprint", fingerprint_column(batch[self.text_column], self.window)
        )


class TextAnalyzer:
    """FUSED text-analysis stage: langid + quality + token counts +
    fingerprint in ONE ``map_batches`` pass (one stage's worth of batch
    (de)serialization instead of four).  Metric definitions live in the
    shared column kernels above, so this stage can never diverge from the
    standalone classes or the SQL oracle twin."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.langid = LangId(text_column)
        self.stops = frozenset().union(*_LANG_PROFILES.values())
        self.window = 64

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        out = batch.append_column("lang_pred", langid_array(texts))
        for name, arr in quality_columns(texts, self.stops).items():
            out = out.append_column(name, arr)
        for name, arr in token_count_columns(texts).items():
            out = out.append_column(name, arr)
        return out.append_column("fingerprint", fingerprint_column(texts, self.window))


def analyze_documents(ds, text_column: str = "text", concurrency: int = 4,
                      batch_size: int = 4096):
    """Full text-analysis pipeline: langid + quality + tokens + fingerprint
    as ONE fused actor-pool stage over Arrow batches (the standalone
    ``LangId``/``QualityScore``/``TokenCount``/``Fingerprint`` classes
    remain for piecemeal use)."""
    return ds.map_batches(
        TextAnalyzer(text_column), batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Repetition quality signals (the Gopher-rules family): fraction of the
# doc's word-3-gram occurrences held by the single most frequent gram,
# fraction of occurrences whose gram repeats at all, and fraction of
# duplicate lines.  High values flag boilerplate / degenerate generations.
# Embarrassingly parallel; vectorized (one tokenize kernel + shifted
# concats per batch); SQL-oracle-checkable bit-for-bit.
# ---------------------------------------------------------------------------
def repetition_columns(texts, n: int = 3) -> dict:
    """Per-row ``top_ngram_frac`` / ``dup_ngram_frac`` / ``dup_line_frac``
    float64 arrays (unrounded; callers round per catalog convention)."""
    import pandas as pd

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    filled = pc.fill_null(texts, "")
    nrows = len(filled)

    # --- word-n-gram occurrence counts per row -----------------------------
    flat, off, _l, valid = _flat_tokens(_lower_exact(filled))
    keep = np.flatnonzero(valid)
    toks = flat.to_pandas().iloc[keep].reset_index(drop=True)
    row_of = np.repeat(np.arange(nrows), np.diff(off))[keep]
    top = np.zeros(nrows, dtype=np.float64)
    dup = np.zeros(nrows, dtype=np.float64)
    if len(toks) >= n:
        g, sel = shifted_word_ngrams(toks, row_of, n)
        occ = pd.DataFrame({"r": row_of[sel], "g": g[sel].to_numpy()})
        if len(occ):
            c = occ.groupby(["r", "g"], sort=False).size()
            per = c.groupby(level=0)
            total = per.sum()
            top_c = per.max()
            dup_c = c[c > 1].groupby(level=0).sum()
            rows = total.index.to_numpy()
            top[rows] = top_c.to_numpy() / total.to_numpy()
            if len(dup_c):
                dup[dup_c.index.to_numpy()] = dup_c.to_numpy() / total.reindex(
                    dup_c.index
                ).to_numpy()

    # --- duplicate-line fraction -------------------------------------------
    lines = pc.split_pattern(filled, pattern="\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    loff = lines.offsets.to_numpy().astype(np.int64)
    lrow = np.repeat(np.arange(nrows), np.diff(loff))
    ldf = pd.DataFrame({"r": lrow, "l": lines.values.to_pandas().to_numpy()})
    nl = np.maximum(np.diff(loff), 1).astype(np.float64)
    dl = ldf.drop_duplicates().groupby("r", sort=False).size()
    distinct = np.ones(nrows, dtype=np.float64)
    distinct[dl.index.to_numpy()] = dl.to_numpy()
    dup_line = (np.diff(loff) - distinct) / nl

    return {"top_ngram_frac": top, "dup_ngram_frac": dup, "dup_line_frac": dup_line}


def repetition_stats(ds, id_column: str = "doc_id", text_column: str = "text",
                     n: int = 3, batch_size: int = 4096):
    """Dataset of ``(id, top_ngram_frac, dup_ngram_frac, dup_line_frac)``."""

    def stats(batch: pa.Table) -> pa.Table:
        cols = repetition_columns(batch[text_column], n)
        return pa.table({
            id_column: batch[id_column],
            **{k: pa.array(v, type=pa.float64()) for k, v in cols.items()},
        })

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=batch_size)
