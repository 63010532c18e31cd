"""Char-n-gram shingling, MinHash signatures and LSH band keys.

This is the engine's candidate-selection core (the analog of REL's p(e|m)
prior lookup, ``REL:src/REL/mention_detection.py::MentionDetectionBase
.get_candidates``): instead of a precomputed surface-form→candidates table,
records are mapped to LSH band keys; records sharing a key are candidates.

Everything here is vectorized over the *raw Arrow string buffers* (zero-copy:
the int32 offsets and uint8 data buffers are viewed with numpy, never copied
per row). Per-row Python loops appear only where row-local arrays are tiny
(unique-shingle extraction for short mention strings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import U64_MAX, minhash_params, splitmix64

U64 = np.uint64


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (offsets, data) views of an Arrow string array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        # nulls → empty strings; rebuilds the array once per batch, rare path
        arr = arr.fill_null("")
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8)
    return offsets.astype(np.int64, copy=False), data


def char_ngram_codes(arr: pa.Array, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """All char-k-gram shingle hashes of each string, concatenated.

    Returns (codes, row_splits): codes is uint64 of every k-gram hash in row
    order; row_splits (len n+1) delimits each row's span in codes. Rows shorter
    than k (but non-empty) contribute one zero-padded-gram hash; empty/null
    rows contribute nothing.
    """
    offsets, data = _string_buffers(arr)
    n = len(offsets) - 1
    str_lens = offsets[1:] - offsets[:-1]

    # full-buffer k-gram codes (positions spanning row boundaries filtered below)
    if len(data) >= k:
        gram = data[: len(data) - k + 1].astype(np.uint64)
        for j in range(1, k):
            gram = (gram << U64(8)) | data[j : len(data) - k + 1 + j]
        gram = splitmix64(gram)
    else:
        gram = np.empty(0, dtype=np.uint64)

    lens = np.maximum(str_lens - (k - 1), 0)
    # short non-empty rows get exactly one padded shingle
    short = (str_lens > 0) & (str_lens < k)
    lens = np.where(short, 1, lens)
    row_splits = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=row_splits[1:])
    total = int(row_splits[-1])

    codes = np.empty(total, dtype=np.uint64)
    # ragged-arange gather for normal rows
    normal = str_lens >= k
    if normal.any():
        nl = np.where(normal, lens, 0)
        pos = np.repeat(offsets[:-1], nl) + _ragged_arange(nl)
        dst = np.repeat(row_splits[:-1], nl) + _ragged_arange(nl)
        codes[dst] = gram[pos]
    if short.any():
        idx = np.nonzero(short)[0]
        for i in idx:  # rare: strings shorter than k
            s, e = offsets[i], offsets[i + 1]
            v = np.uint64(0)
            for b in data[s:e]:
                v = (v << U64(8)) | U64(b)
            codes[row_splits[i]] = splitmix64(v)[()]
    return codes, row_splits


def word_ngram_codes(arr: pa.Array, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Word-level n-gram shingle hashes (w-shingling, Broder '97) — the right
    unit for *document* near-dedup, where char-grams saturate on shared
    vocabulary. Fully vectorized: per-token hashes via position-mixed byte
    xor-reduceat over the flattened token buffer, then n-gram combination.

    Returns (codes, row_splits) like char_ngram_codes. Docs with fewer than
    n tokens contribute one combined whole-doc shingle; empty docs none.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null("")
    import pyarrow.compute as pc

    trimmed = pc.utf8_trim_whitespace(arr)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    flat = pc.list_flatten(toks)
    # flat counts index into `flat`; blank rows contribute one '' token there
    # but must emit zero shingles — tracked separately
    flat_counts = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    is_blank = np.asarray(pc.equal(pc.utf8_length(trimmed), 0))
    real_tokens = np.where(is_blank, 0, flat_counts)

    offsets, data = _string_buffers(flat)
    tok_lens = offsets[1:] - offsets[:-1]
    # per-byte position-mixed code, xor-reduced per token
    pos = _ragged_arange(tok_lens)
    if len(data):
        byte_idx = np.repeat(offsets[:-1], tok_lens) + pos
        mixed = splitmix64(data[byte_idx].astype(np.uint64)
                           ^ (pos.astype(np.uint64) * U64(0x9E3779B97F4A7C15)))
    else:
        mixed = np.empty(0, dtype=np.uint64)
    tok_hash = np.zeros(len(tok_lens), dtype=np.uint64)
    nz = np.nonzero(tok_lens > 0)[0]
    if len(nz):
        starts = (np.cumsum(tok_lens) - tok_lens)[nz]
        tok_hash[nz] = np.bitwise_xor.reduceat(mixed, starts)

    # n-gram combine across each row's token sequence
    gram_lens = np.maximum(real_tokens - (n - 1), 0)
    short = (real_tokens > 0) & (real_tokens < n)
    gram_lens = np.where(short, 1, gram_lens)
    row_splits = np.zeros(len(real_tokens) + 1, dtype=np.int64)
    np.cumsum(gram_lens, out=row_splits[1:])
    codes = np.zeros(int(row_splits[-1]), dtype=np.uint64)

    tok_row_starts = np.cumsum(flat_counts) - flat_counts
    normal = real_tokens >= n
    if normal.any():
        nl = np.where(normal, gram_lens, 0)
        base = np.repeat(tok_row_starts, nl) + _ragged_arange(nl)
        acc = np.zeros(len(base), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(n):
                acc = splitmix64(acc ^ tok_hash[base + j])
        dst = np.repeat(row_splits[:-1], nl) + _ragged_arange(nl)
        codes[dst] = acc
    if short.any():
        with np.errstate(over="ignore"):
            for i in np.nonzero(short)[0]:
                acc = np.uint64(0)
                s = tok_row_starts[i]
                for j in range(real_tokens[i]):
                    acc = splitmix64(acc ^ tok_hash[s + j])[()]
                codes[row_splits[i]] = acc
    return codes, row_splits


def _ragged_arange(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated."""
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.cumsum(lens) - lens
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def string_hash_u64(arr: pa.Array) -> np.ndarray:
    """Vectorized per-string 64-bit hash over the raw Arrow buffers
    (position-mixed byte xor + length mix). For bucketing/partitioning —
    NOT for equality decisions (those group on the string itself)."""
    offsets, data = _string_buffers(arr)
    lens = offsets[1:] - offsets[:-1]
    pos = _ragged_arange(lens)
    with np.errstate(over="ignore"):
        if len(data):
            idx = np.repeat(offsets[:-1], lens) + pos
            mixed = splitmix64(data[idx].astype(np.uint64)
                               ^ (pos.astype(np.uint64) * U64(0x9E3779B97F4A7C15)))
        else:
            mixed = np.empty(0, dtype=np.uint64)
        out = np.zeros(len(lens), dtype=np.uint64)
        nz = np.nonzero(lens > 0)[0]
        if len(nz):
            starts = (np.cumsum(lens) - lens)[nz]
            out[nz] = np.bitwise_xor.reduceat(mixed, starts)
        return splitmix64(out ^ lens.astype(np.uint64))


def string_hash_u128(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-string 128-bit digest (two independent 64-bit
    tabulation-style lanes over the raw Arrow buffers). Unlike
    ``string_hash_u64`` this IS meant for equality decisions: with two
    independently-mixed lanes the per-pair collision probability is
    ~2^-128, so grouping on the digest instead of the text itself is
    collision-free in practice at any corpus size (10^12 docs ⇒
    P(any collision) < 10^-14) — and the exchange carries 16 bytes per
    row instead of the document body.

    Lane independence: each lane finalizes (byte, position) with
    splitmix64 under a different lane constant, so a lane-1 collision
    says nothing about lane 2 (h2 is NOT a function of h1)."""
    offsets, data = _string_buffers(arr)
    lens = offsets[1:] - offsets[:-1]
    pos = _ragged_arange(lens)
    _L2 = U64(0xC2B2AE3D27D4EB4F)  # xxhash prime — lane-2 tweak
    with np.errstate(over="ignore"):
        if len(data):
            idx = np.repeat(offsets[:-1], lens) + pos
            base = data[idx].astype(np.uint64) ^ (
                pos.astype(np.uint64) * U64(0x9E3779B97F4A7C15))
            m1 = splitmix64(base)
            m2 = splitmix64(base ^ _L2)
        else:
            m1 = m2 = np.empty(0, dtype=np.uint64)
        h1 = np.zeros(len(lens), dtype=np.uint64)
        h2 = np.zeros(len(lens), dtype=np.uint64)
        nz = np.nonzero(lens > 0)[0]
        if len(nz):
            starts = (np.cumsum(lens) - lens)[nz]
            h1[nz] = np.bitwise_xor.reduceat(m1, starts)
            h2[nz] = np.bitwise_xor.reduceat(m2, starts)
        ul = lens.astype(np.uint64)
        return splitmix64(h1 ^ ul), splitmix64((h2 ^ ul) ^ _L2)


def string_digest128_hex(arr: pa.Array) -> pa.Array:
    """128-bit digest rendered as a 32-hex-char string column — a compact
    drop-in group/join key for the string-key exchange machinery
    (bucketing, sorting, segment detection all already handle strings).
    Null inputs digest to the distinct sentinel ``"null"`` so SQL GROUP BY
    semantics hold (all NULLs together, distinct from '')."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    h1, h2 = string_hash_u128(arr)
    n = len(h1)
    raw = np.empty((n, 2), dtype=">u8")
    raw[:, 0], raw[:, 1] = h1, h2
    b = raw.view(np.uint8).reshape(n, 16)
    hexdig = np.array(list("0123456789abcdef"), dtype="U1")
    chars = np.empty((n, 32), dtype="U1")
    chars[:, 0::2] = hexdig[b >> 4]
    chars[:, 1::2] = hexdig[b & 15]
    out = pa.array(chars.view("U32").ravel(), type=pa.string())
    if arr.null_count:
        out = pc.if_else(pc.is_null(arr), pa.scalar("null"), out)
    return out


def minhash_signatures(
    codes: np.ndarray,
    row_splits: np.ndarray,
    num_perm: int,
    seed: int,
    *,
    assume_unique: bool = False,
) -> np.ndarray:
    """(n, K) uint64 MinHash signature matrix; empty rows get U64_MAX sentinels.

    Dedupes shingles per row first (min over a multiset == min over its set —
    and duplicated text, e.g. repeated tool output, shrinks dramatically), then
    one 1-D ``np.minimum.reduceat`` per permutation. ~50× faster than the naive
    2-D chunked formulation on repetitive text.
    """
    n = len(row_splits) - 1
    a, b = minhash_params(num_perm, seed)
    sig = np.full((n, num_perm), U64_MAX, dtype=np.uint64)
    if not assume_unique and len(codes):
        uniq = unique_shingle_sets(codes, row_splits)
        codes = np.asarray(uniq.values, dtype=np.uint64)
        row_splits = np.asarray(uniq.offsets, dtype=np.int64)
    lens = row_splits[1:] - row_splits[:-1]
    nonempty = np.nonzero(lens > 0)[0]
    if len(nonempty) == 0:
        return sig
    seg_starts = row_splits[:-1][nonempty]
    with np.errstate(over="ignore"):
        for k in range(num_perm):
            g = a[k] * codes + b[k]
            sig[nonempty, k] = np.minimum.reduceat(g, seg_starts)
    return sig


def band_keys(sig: np.ndarray, bands: int, rows: int, seed: int) -> np.ndarray:
    """(n, bands) uint64 LSH keys. Rows whose signature is all-sentinel
    (empty text) get key 0 in every band — callers must drop those."""
    n, num_perm = sig.shape
    assert num_perm == bands * rows, (num_perm, bands, rows)
    s = sig.reshape(n, bands, rows)
    acc = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(rows):
            acc = splitmix64(acc ^ s[:, :, j])
        band_salt = splitmix64(np.arange(bands, dtype=np.uint64) + U64(seed))
        acc = splitmix64(acc ^ band_salt[None, :])
    empty = (sig == U64_MAX).all(axis=1)
    acc[empty] = U64(0)
    return acc


def unique_shingle_sets(codes: np.ndarray, row_splits: np.ndarray) -> pa.ListArray:
    """Per-row sorted-unique shingle hashes as list<uint64> (for exact Jaccard).

    Fully vectorized: one global lexsort over (row, code), adjacent-dup mask.
    """
    n = len(row_splits) - 1
    total = len(codes)
    if total == 0:
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int32)), pa.array([], type=pa.uint64())
        )
    lens = row_splits[1:] - row_splits[:-1]
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
    order = np.lexsort((codes, row_ids))
    rc, cc = row_ids[order], codes[order]
    keep = np.ones(total, dtype=bool)
    keep[1:] = (rc[1:] != rc[:-1]) | (cc[1:] != cc[:-1])
    rc, cc = rc[keep], cc[keep]
    counts = np.bincount(rc, minlength=n)
    new_splits = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=new_splits[1:])
    return pa.ListArray.from_arrays(
        pa.array(new_splits, type=pa.int32() if new_splits[-1] < 2**31 else pa.int64()),
        pa.array(cc, type=pa.uint64()),
    )


def exact_jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two sorted-unique uint64 arrays."""
    if len(a) == 0 and len(b) == 0:
        return 0.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)
