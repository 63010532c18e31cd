"""Phonetic blocking keys: American Soundex (Russell/Odell; the NARA
variant every database textbook ships) — the classic cheap blocking key for
name-typo ER, complementing MinHash (content) and sorted-neighborhood
(prefix order) blocking.

Shared spec (the Python kernel and the DuckDB oracle in
pipelines/queries.py implement it verbatim — keep in sync):
  1. token  = first [A-Za-z]+ run of the input, uppercased, first 16 chars
     ('' if no alpha run -> code '').
  2. first  = token[0]; body = token with every H and W removed (H/W never
     separate equal codes).
  3. digits = map over body: BFPV->1 CGJKQSXZ->2 DT->3 L->4 MN->5 R->6
     AEIOUY->0.
  4. collapse adjacent equal digits (vowel 0s collapse too; one survivor
     still separates).
  5. drop the leading digit (the first letter's own run) UNLESS the first
     letter is H or W (then it produced no digit).
  6. remove the 0s, take 3 digits, right-pad with '0'.
  7. code = first + digits3.

Vectorization: per-DISTINCT-value Python over the dictionary-encoded token
column (the scoring stage's measured pattern — names repeat heavily, so the
Python cost is O(vocabulary), not O(rows)), then one vectorized take.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"[A-Za-z]+")
_CODE = {}
for letters, d in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                   ("L", "4"), ("MN", "5"), ("R", "6"), ("AEIOUY", "0")):
    for ch in letters:
        _CODE[ch] = d


def soundex_one(s: str) -> str:
    """Soundex of one raw string per the module spec ('' if no letters)."""
    m = _TOKEN_RE.search(s or "")
    if not m:
        return ""
    tok = m.group(0).upper()[:16]
    first = tok[0]
    body = tok.replace("H", "").replace("W", "")
    digits = [_CODE[c] for c in body]
    collapsed = [d for i, d in enumerate(digits)
                 if i == 0 or d != digits[i - 1]]
    tail = collapsed if first in "HW" else collapsed[1:]
    tail = [d for d in tail if d != "0"]
    return first + ("".join(tail) + "000")[:3]


def soundex_codes(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized soundex over a string column via dictionary encoding."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(col)
    vocab = enc.dictionary.to_pylist()
    codes = pa.array([soundex_one(v) for v in vocab], type=pa.string())
    idx = enc.indices
    out = pc.take(codes, pc.fill_null(idx, 0)) if len(vocab) else \
        pa.array([""] * len(col), type=pa.string())
    if idx.null_count:
        out = pc.if_else(pc.is_valid(idx), out, pa.scalar("", pa.string()))
    return out


def soundex_sql(expr: str, passes: int = 5) -> str:
    """DuckDB SQL expression computing the module-spec soundex of ``expr``.

    RE2 has no backreferences, so run-collapsing is ``passes`` rounds of
    pairwise replace per digit — round p halves remaining run lengths, so
    5 rounds collapse any run up to 2^5 = 32 > the 16-char token cap.
    Generated, not hand-maintained: keep in lockstep with soundex_one."""
    tok = f"substr(upper(regexp_extract({expr}, '[A-Za-z]+', 0)), 1, 16)"
    dd = ("translate(translate(TOK, 'HW', ''), "
          "'BFPVCGJKQSXZDTLMNRAEIOUY', '111122222222334556000000')")
    for _ in range(passes):
        for d in "0123456":
            dd = f"replace({dd}, '{d}{d}', '{d}')"
    return f"""
        CASE WHEN TOK = '' THEN '' ELSE
          substr(TOK, 1, 1) || substr(
            replace(CASE WHEN substr(TOK, 1, 1) IN ('H','W')
                         THEN {dd} ELSE substr({dd}, 2) END, '0', '')
            || '000', 1, 3)
        END""".replace("TOK", tok)
