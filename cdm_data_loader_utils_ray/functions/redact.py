"""PII scrubbing for training corpora: regex redaction of emails / URLs
(extensible pattern map).

Patterns are RE2-COMPATIBLE BY CONTRACT and executed by Arrow's RE2
(`pc.replace_substring_regex` / `pc.count_substring_regex`) — one C++
kernel call per pattern per batch, zero Python per row, and the exact
same regex engine any RE2-based SQL oracle uses, so redacted output is
bit-identical cross-engine.  Patterns apply in insertion order (an email
matched inside a not-yet-redacted URL would already be gone — order the
map accordingly).
"""

from __future__ import annotations

from collections.abc import Mapping

import pyarrow as pa
import pyarrow.compute as pc

# Deliberately simple, RE2-safe (no lookaround/backrefs) public patterns.
DEFAULT_PATTERNS: dict[str, str] = {
    "email": r"[0-9A-Za-z_.+-]+@[0-9A-Za-z-]+\.[0-9A-Za-z.-]+",
    "url": r"https?://[^ \t\n]+",
}


def redact_text(
    ds,
    text_column: str = "text",
    patterns: Mapping[str, str] | None = None,
    out_column: str | None = None,
    count_matches: bool = True,
    batch_size: int = 8192,
):
    """Replace every match of each pattern with ``[NAME]`` (uppercased key).

    Adds ``out_column`` (default: replaces ``text_column`` content in a new
    ``<text_column>_redacted`` column) and, with ``count_matches``, one
    ``n_<name>`` int64 column per pattern counting pre-redaction matches.
    Embarrassingly parallel — no shuffle.
    """
    pats = dict(patterns or DEFAULT_PATTERNS)
    out_col = out_column or f"{text_column}_redacted"

    def scrub(batch: pa.Table) -> pa.Table:
        texts = batch[text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        cur = pc.fill_null(texts, "")
        for name, pat in pats.items():
            if count_matches:
                n = pc.count_substring_regex(cur, pattern=pat).cast(pa.int64())
                batch = batch.append_column(f"n_{name}", n)
            cur = pc.replace_substring_regex(
                cur, pattern=pat, replacement=f"[{name.upper()}]"
            )
        return batch.append_column(out_col, cur)

    return ds.map_batches(scrub, batch_format="pyarrow", batch_size=batch_size)
