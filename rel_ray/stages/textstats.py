"""Text analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting. All vectorized map_batches
stages over Arrow string columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import splitmix64
from ..functions.normalize import token_counts
from ..functions.shingles import char_ngram_codes

# tiny per-language stopword marker sets for the n-gram/stopword heuristic —
# deterministic, no model artifact
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "con", "por", "para"],
    "it": ["il", "la", "che", "di", "non", "una", "per", "sono", "con", "del"],
}


def _marker_counts(arr: pa.Array, words: list[str]) -> np.ndarray:
    pat = r"\b(" + "|".join(words) + r")\b"
    c = pc.count_substring_regex(pc.utf8_lower(arr), pattern=pat)
    return np.asarray(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c,
                      dtype=np.float64)


def lang_id(arr: pa.Array) -> pa.Array:
    """Argmax language over stopword-marker hit counts; 'und' when no hits."""
    langs = list(_LANG_MARKERS)
    counts = np.stack([_marker_counts(arr, _LANG_MARKERS[l]) for l in langs])
    best = counts.argmax(axis=0)
    nohit = counts.max(axis=0) == 0
    out = np.array(langs, dtype=object)[best]
    out[nohit] = "und"
    return pa.array(out, type=pa.string())


def quality_features(arr: pa.Array) -> pa.Table:
    """Length / punctuation / stopword / word-length features + a composite
    quality score in [0,1]. All double-precision pyarrow+numpy (so the DuckDB
    oracle can reproduce values bit-for-bit with the same formulas)."""
    n_chars = np.asarray(pc.utf8_length(arr), dtype=np.float64)
    n_tok = np.asarray(token_counts(arr), dtype=np.float64)
    stripped = pc.replace_substring_regex(arr, r"[^\w\s]", "")
    n_punct = n_chars - np.asarray(pc.utf8_length(stripped), dtype=np.float64)
    stop = _marker_counts(arr, _LANG_MARKERS["en"])

    safe_chars = np.maximum(n_chars, 1.0)
    safe_tok = np.maximum(n_tok, 1.0)
    punct_ratio = n_punct / safe_chars
    stop_ratio = stop / safe_tok
    mean_word_len = (n_chars - (n_tok - 1).clip(min=0)) / safe_tok

    len_score = np.minimum(n_tok / 20.0, 1.0)
    punct_score = 1.0 - np.minimum(punct_ratio * 4.0, 1.0)
    stop_score = np.minimum(stop_ratio * 4.0, 1.0)
    quality = (len_score + punct_score + stop_score) / 3.0
    return pa.table({
        "n_chars": pa.array(n_chars.astype(np.int64)),
        "n_tokens": pa.array(n_tok.astype(np.int64)),
        "punct_ratio": pa.array(punct_ratio),
        "stop_ratio": pa.array(stop_ratio),
        "mean_word_len": pa.array(mean_word_len),
        "quality": pa.array(quality),
    })


def bpe_ish_token_count(arr: pa.Array) -> pa.Array:
    """Approximate subword token count: a GPT-style pre-tokenizer regex
    (word pieces, numbers, punctuation runs) counted per string."""
    pat = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+"
    return pc.cast(pc.count_substring_regex(arr, pattern=pat), pa.int64())


def fingerprint_winnow(arr: pa.Array, k: int = 5, window: int = 4) -> pa.ListArray:
    """Winnowing document fingerprints (Schleimer et al. 2003): per string,
    the sorted set of per-window minima over rolling k-gram hashes, as
    list<int64>.

    Fully vectorized across the whole batch (no per-document loop): ONE
    global sliding-window min over the concatenated codes array, in-row
    window starts selected by a segment mask, short rows (< window codes)
    covered by a segmented whole-row min, then one lexsort + adjacent-dedup
    produces every row's unique fingerprint set (same trick as
    functions.shingles.unique_shingle_sets).
    """
    codes, splits = char_ngram_codes(arr, k)
    n = len(splits) - 1
    total = len(codes)
    lens = splits[1:] - splits[:-1]
    # windows per row: L-window+1 full windows (L > window), else one
    # whole-row window for nonempty rows, zero for empty rows
    w = np.where(lens > 0, np.maximum(lens - window + 1, 1), 0)
    total_w = int(w.sum())
    if total_w == 0:
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int64), type=pa.int64()),
            pa.array(np.empty(0, dtype=np.int64), type=pa.int64()))
    row_of = np.repeat(np.arange(n, dtype=np.int64), w)
    w_starts = np.cumsum(w) - w
    local = np.arange(total_w, dtype=np.int64) - np.repeat(w_starts, w)
    global_start = np.repeat(splits[:-1], w) + local

    mins = np.empty(total_w, dtype=np.uint64)
    long_mask = lens[row_of] > window
    if long_mask.any() and total >= window:
        sw_min = np.lib.stride_tricks.sliding_window_view(
            codes, window).min(axis=1)
        mins[long_mask] = sw_min[global_start[long_mask]]
    if (~long_mask).any():
        # whole-row min for short rows: segmented reduceat over nonempty
        # starts (empty rows have zero-length segments and are skipped)
        nonempty = np.nonzero(lens > 0)[0]
        rowmin = np.zeros(n, dtype=np.uint64)
        rowmin[nonempty] = np.minimum.reduceat(codes, splits[:-1][nonempty])
        mins[~long_mask] = rowmin[row_of[~long_mask]]

    # sorted-unique per row: one lexsort + adjacent-dedup
    order = np.lexsort((mins, row_of))
    r, v = row_of[order], mins[order]
    keep = np.ones(total_w, dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (v[1:] != v[:-1])
    out_rows, out_vals = r[keep], v[keep]
    out_lens = np.bincount(out_rows, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_lens, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()),
        pa.array(out_vals.view(np.int64), type=pa.int64()))


def rolling_text_hash(arr: pa.Array) -> pa.Array:
    """One order-sensitive 64-bit document hash: splitmix-chained over k-gram
    hashes (cheap content fingerprint for manifests / change detection)."""
    codes, splits = char_ngram_codes(arr, 3)
    n = len(splits) - 1
    out = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # order-sensitive: mix position into each code before combining;
        # in-row positions for ALL rows at once (global arange minus each
        # row's repeated segment start — no per-document Python)
        lens = splits[1:] - splits[:-1]
        pos = (np.arange(len(codes), dtype=np.uint64)
               - np.repeat(splits[:-1], lens).astype(np.uint64))
        mixed = splitmix64(codes ^ (pos * np.uint64(0x9E3779B97F4A7C15)))
        nonempty = np.nonzero(lens > 0)[0]
        if len(nonempty):
            out[nonempty] = np.bitwise_xor.reduceat(mixed, splits[:-1][nonempty])
    return pa.array(out.view(np.int64), type=pa.int64())


class TextStats:
    """map_batches stage: id + full text-analysis column set."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        feats = quality_features(text)
        out = pa.table({self.id_col: batch.column(self.id_col)})
        for name in feats.column_names:
            out = out.append_column(name, feats.column(name))
        out = out.append_column("lang_pred", lang_id(text))
        out = out.append_column("n_subtokens", bpe_ish_token_count(text))
        out = out.append_column("doc_hash", rolling_text_hash(text))
        return out


# ---------------------------------------------------------------------------
# char-bigram LM quality scoring (perplexity-style filter)
# ---------------------------------------------------------------------------
# Published shape: CCNet (Wenzek et al., LREC 2020) filters crawl text by
# language-model perplexity; the model here is the smallest useful one — a
# byte-bigram model with add-one smoothing — so the OPERATOR shape (two
# streaming passes: corpus-count partials -> broadcast log-prob table ->
# per-doc mean log-prob) is real and a heavier LM drops in behind the same
# interface. Deterministic: integer counts, float64 log2 on the driver.


def _byte_pairs(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(codes, row_ids) of every intra-row byte bigram: code = prev*256+cur.
    Zero-copy over the Arrow string buffers; cross-row pairs masked out."""
    from ..functions.shingles import _string_buffers

    offsets, data = _string_buffers(arr)
    n = len(offsets) - 1
    if len(data) < 2:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    code = (data[:-1].astype(np.int64) << 8) | data[1:]
    # pair at buffer position p spans rows iff p+1 is a row start
    starts = offsets[1:-1]  # interior row starts
    # a start at 0 has no pair before it; a start at len(data) (trailing
    # empty rows) has no pair at it either
    starts = starts[(starts > 0) & (starts < len(data))]
    keep = np.ones(len(code), dtype=bool)
    keep[starts - 1] = False
    lens = offsets[1:] - offsets[:-1]
    row_of = np.repeat(np.arange(n, dtype=np.int64),
                       np.maximum(lens - 1, 0))
    return code[keep], row_of


def bigram_counts(ds, *, text_col: str) -> np.ndarray:
    """Corpus byte-bigram count grid (256*256 int64): per-batch bincount
    partials (one 512 KiB row each), summed on the driver — the mergeable
    -combiner shape, nothing data-sized leaves a task."""
    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes, _ = _byte_pairs(col)
        grid = np.bincount(codes, minlength=65536).astype(np.int64)
        return pa.table({"grid": pa.array([grid], type=pa.list_(pa.int64()))})

    from .sketches import fold_grid_partials

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = fold_grid_partials(parts, col="grid")
    return out if out is not None else np.zeros(65536, dtype=np.int64)


def lm_score(ds, *, id_col: str, text_col: str,
             counts: np.ndarray | None = None,
             carry_cols: list[str] | None = None):
    """Per-document mean log2 P(byte | prev byte) under the corpus bigram
    model (add-one smoothed). Higher = more typical of the corpus; a
    quality filter thresholds low scorers. Two streaming passes total
    (counts pass + scoring pass); the 512 KiB log-prob table is ray.put
    once. Docs with <2 bytes score 0.0. ``carry_cols`` carries extra
    input columns through unchanged (a downstream filter then needs no
    join-back and no driver-side id collection)."""
    import ray as _ray

    from ..functions.rayutil import get_broadcast

    if counts is None:
        counts = bigram_counts(ds, text_col=text_col)
    grid = counts.reshape(256, 256).astype(np.float64) + 1.0
    logp = (np.log2(grid) - np.log2(grid.sum(axis=1, keepdims=True))
            ).astype(np.float32).ravel()
    logp_ref = _ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        lp = get_broadcast(logp_ref)
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes, row_of = _byte_pairs(col)
        n = t.num_rows
        sums = np.zeros(n, dtype=np.float64)
        cnts = np.zeros(n, dtype=np.int64)
        if len(codes):
            np.add.at(sums, row_of, lp[codes].astype(np.float64))
            np.add.at(cnts, row_of, 1)
        mean = np.where(cnts > 0, sums / np.maximum(cnts, 1), 0.0)
        cols = {id_col: t.column(id_col)}
        for c in (carry_cols or []):
            cols[c] = t.column(c)
        cols["lm_logprob"] = pa.array(mean)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
