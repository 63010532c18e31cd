"""Text cleaning: PII scrubbing with vectorized RE2 replacement.

The LLM-training-data hygiene op: mask emails, URLs and phone-like digit
runs with typed placeholders before any downstream tokenization/dedup.
Both Arrow's ``replace_substring_regex`` and DuckDB's ``regexp_replace``
execute RE2, so a SQL oracle reproduces the output byte-for-byte — the
replacement ORDER below (urls → emails → phones) is part of the contract
(an email inside a URL is masked as part of the URL, never twice).

Embarrassingly parallel: one streaming map_batches pass, no shuffle, no
Python per row. Patterns are conservative by design (scrubbing leans
toward precision; auditing recall belongs to a dedicated PII pipeline).

REL parity anchor: the preprocessing normalization cascade
(REL:src/REL/mention_detection.py preprocessing) — same stage position,
hygiene instead of casefolding.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (pattern, placeholder), applied IN ORDER
PII_RULES: list[tuple[str, str]] = [
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def scrub_text(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    for pat, repl in PII_RULES:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
    return col


def scrub_pii(ds, *, text_col: str, out_col: str | None = None,
              batch_size: int = 8192):
    """Adds/overwrites ``out_col`` (default: in place) with the scrubbed
    text; all other columns pass through untouched."""
    dst = out_col or text_col

    def scrub(t: pa.Table) -> pa.Table:
        cleaned = scrub_text(t.column(text_col))
        if dst in t.column_names:
            i = t.column_names.index(dst)
            return t.set_column(i, dst, cleaned)
        return t.append_column(dst, cleaned)

    return ds.map_batches(scrub, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def json_scalar_field(col: pa.ChunkedArray | pa.Array,
                      field: str) -> pa.Array:
    """Vectorized scalar-field extraction from one-level JSON object
    strings (the semi-structured `props` payload shape): returns the raw
    value text of ``"field": <scalar>`` (quotes stripped for strings),
    null where the field is absent.

    One RE2 ``pc.extract_regex`` pass over the Arrow buffers — the ETL
    projection for JSON side-channel columns without a per-row parser.
    Contract: top-level scalar fields only (numbers, strings without
    escaped quotes, booleans, null); nested objects/arrays need a real
    parser upstream.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # two passes, not one alternation: RE2 alternation reports the losing
    # branch's group as "" (valid) rather than null, which is
    # indistinguishable from a real empty string value
    ext_s = pc.extract_regex(
        col, r'"' + field + r'"\s*:\s*"(?P<s>[^"]*)"')
    ext_v = pc.extract_regex(
        col, r'"' + field + r'"\s*:\s*(?P<v>[^",}\s][^,}\s]*)')
    s = pc.struct_field(ext_s, "s")
    v = pc.struct_field(ext_v, "v")
    return pc.if_else(pc.is_valid(s), s, v)
