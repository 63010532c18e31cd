"""Text canonicalization, vectorized with pyarrow.compute.

Engine analog of REL's mention-normalization cascade
(``REL:src/REL/utils.py::preprocess_mention`` / ``modify_uppercase_phrase``):
NFKC normalize → casefold (utf8_lower) → collapse whitespace → trim. The raw
``text`` column is never modified (per-row invariant, BASELINE.json:input_hint);
all products go to new columns.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# maximal run of capitalized tokens — the engine's mention detector
# (REL analog: flair NER in REL:src/REL/ner/; here a deterministic NER-lite
# that needs no model artifact)
MENTION_PATTERN = r"(?P<mention>[A-Z][\w'.\-]*(?: [A-Z][\w'.\-]*)*)"


def normalize_strings(arr: pa.ChunkedArray | pa.Array, *, nfkc: bool = True) -> pa.Array:
    """NFKC → lower → collapse whitespace → trim. Pure Arrow kernels."""
    x = arr
    if nfkc:
        x = pc.utf8_normalize(x, form="NFKC")
    x = pc.utf8_lower(x)
    x = pc.replace_substring_regex(x, r"\s+", " ")
    return pc.utf8_trim_whitespace(x)


def simple_normalize(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """lower + collapse whitespace + trim (no NFKC) — the SQL-oracle-exact
    subset used by the `normalize_documents` query (DuckDB lacks NFKC)."""
    return normalize_strings(arr, nfkc=False)


def token_counts(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count (REL:src/REL/utils.py::split_in_words analog)."""
    trimmed = pc.utf8_trim_whitespace(arr)
    n = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    # empty string splits to [''] → count 0
    return pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int32()), n)


def char_counts(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.cast(pc.utf8_length(arr), pa.int32())


def extract_mentions(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """First maximal capitalized-token run per string; "" when none.

    Deterministic NER-lite mention detection over the *raw* text (capitalization
    carries the signal, as in REL's NER-based MD).
    """
    m = pc.extract_regex(text, pattern=MENTION_PATTERN)
    mention = pc.struct_field(m, "mention")
    return pc.fill_null(mention, "")


# sentinel for the mark-and-split multi-match extraction; \x1e (ASCII record
# separator) never appears in natural text, and the patterns used here cannot
# match it
_SENT = "\x1e"


def extract_all_matches(text: pa.ChunkedArray | pa.Array,
                        pattern: str) -> pa.ListArray:
    """ALL non-overlapping RE2 matches per string as list<string> — fully
    vectorized, no per-row Python (REL analog:
    ``REL:src/REL/mention_detection.py::MentionDetection.find_mentions``
    returns every mention in a document, not just the first).

    Mechanism: one ``replace_substring_regex`` pass wraps every match in
    sentinel chars, one ``split_pattern`` pass cuts on the sentinel; each
    match contributes exactly "\\x1e match \\x1e", so the split elements at
    ODD positions are exactly the matches, in order. Requires a pattern that
    cannot match the empty string or the sentinel.
    """
    import numpy as np

    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    marked = pc.replace_substring_regex(
        text, pattern=pattern, replacement=_SENT + r"\0" + _SENT)
    parts = pc.split_pattern(marked, pattern=_SENT)
    flat = pc.list_flatten(parts)
    lens = np.asarray(pc.list_value_length(parts), dtype=np.int64)
    starts = np.cumsum(lens) - lens
    total = int(lens.sum())
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    odd = (pos & 1) == 1
    vals = flat.filter(pa.array(odd))
    out_lens = (lens - 1) // 2  # split always yields 2*n_matches + 1 elements
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(out_lens, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), vals)


# honorifics stripped from normalized mentions: they are shared across
# unrelated entities and would otherwise seed cross-entity LSH collisions
# (REL:src/REL/utils.py::preprocess_mention cascade analog)
_HONORIFIC_RE = r"^(?:dr|prof|ms|mr|mrs)\.? "


def normalize_mentions(mentions: pa.ChunkedArray | pa.Array, *,
                       nfkc: bool = True) -> pa.Array:
    """Mention-specific canonicalization: text normalize + honorific strip."""
    x = normalize_strings(mentions, nfkc=nfkc)
    return pc.replace_substring_regex(x, _HONORIFIC_RE, "")
