"""Text analysis for training-data pipelines: language ID (n-gram
heuristic), quality scoring (length/punct/stopword ratios), token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprinting.

All are actor-pool ``map_batches`` stages: models/regexes/profiles built
once per actor in ``__init__`` (SURVEY §2.4), vectorized where the kernel
allows (Arrow string compute for lengths/ratios, Python per row only inside
the tokenizer loops).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdm_data_loader_utils_ray.stages.hashing import rolling_fingerprint

# Tiny per-language stopword / character profiles (public common words).
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "with", "this"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que", "des"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "para", "que", "de", "en"},
}
_CJK = re.compile(r"[一-鿿]")
# Explicit ASCII classes, NOT "\w"/"\s": Python's "\w" is Unicode-aware
# while DuckDB's RE2 "\w" is ASCII-only, so the shared patterns must spell
# out the exact class to tokenize identically on non-ASCII input (the r2
# ADVICE finding — parity previously held only because the test corpus was
# pure ASCII).  [0-9A-Za-z_] == RE2 "\w"; [ \t\n\v\f\r] is the explicit
# whitespace class both engines agree on.
_WORD = re.compile(r"[0-9A-Za-z_]+")
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
    engines must use the same explicit convention:
    ``floor(x * 1e6 + 0.5) / 1e6``."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# Shared column kernels — the SINGLE definition of each metric.  Both the
# standalone stages and the fused TextAnalyzer call these, so a convention
# change (e.g. the half-up rounding migration) can never make them diverge
# from each other or from the SQL oracle twin.
# ---------------------------------------------------------------------------
def quality_columns(texts, stops) -> dict:
    """n_chars_f / space_ratio / stopword_ratio / mean_token_len /
    quality_score arrays for a text column."""
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
    tok_score = np.exp(-0.5 * ((mt - 5.0) / 3.0) ** 2)  # plausible word lengths
    score = 0.4 * len_score + 0.3 * np.minimum(stop_arr * 4, 1) + 0.3 * tok_score
    return {
        "n_chars_f": pa.array(nc),
        "space_ratio": pa.array(round6_half_up(space_ratio)),
        "stopword_ratio": pa.array(round6_half_up(stop_arr)),
        "mean_token_len": pa.array(round6_half_up(mt)),
        "quality_score": pa.array(round6_half_up(score)),
    }


def token_count_columns(texts) -> dict:
    """n_tokens_ws (whitespace) / n_tokens_bpe (RE2-safe BPE-ish) arrays."""
    return {
        "n_tokens_ws": pc.list_value_length(pc.split_pattern(texts, " ")).cast(pa.int64()),
        "n_tokens_bpe": pa.array(
            [len(_BPE.findall(t or "")) for t in texts.to_pylist()], type=pa.int64()
        ),
    }


def fingerprint_column(texts, window: int = 64) -> pa.Array:
    return pa.array(
        [rolling_fingerprint(t or "", window) for t in texts.to_pylist()],
        type=pa.uint64(),
    )


class LangId:
    """n-gram/stopword language-ID heuristic (no model downloads)."""

    def __init__(self, text_column: str = "text", out_column: str = "lang_pred"):
        self.text_column, self.out_column = text_column, out_column
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def classify(self, text: str) -> str:
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
        preds = pa.array(
            [self.classify(t) for t in batch[self.text_column].to_pylist()],
            type=pa.string(),
        )
        return batch.append_column(self.out_column, preds)


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
        preds = pa.array(
            [self.langid.classify(t or "") for t in texts.to_pylist()],
            type=pa.string(),
        )
        out = batch.append_column("lang_pred", preds)
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
