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


# honorifics stripped from normalized mentions: they are shared across
# unrelated entities and would otherwise seed cross-entity LSH collisions
# (REL:src/REL/utils.py::preprocess_mention cascade analog)
_HONORIFIC_RE = r"^(?:dr|prof|ms|mr|mrs)\.? "


def normalize_mentions(mentions: pa.ChunkedArray | pa.Array, *,
                       nfkc: bool = True) -> pa.Array:
    """Mention-specific canonicalization: text normalize + honorific strip."""
    x = normalize_strings(mentions, nfkc=nfkc)
    return pc.replace_substring_regex(x, _HONORIFIC_RE, "")
