"""Distributed BPE tokenizer training + encoding.

Byte-pair-encoding subword training (Sennrich, Haddow & Birch, ACL 2016 —
the algorithm behind GPT-2/SentencePiece-BPE vocabularies) restructured
for the engine: the corpus-sized work (pre-tokenization and word
counting) is ONE streaming map_batches pass + one skinny groupby over
distinct words, and the merge loop then runs over the *word-frequency
table* — the standard formulation: merge statistics depend only on
(distinct word, count), never on the raw corpus, so a 100 TB corpus
contributes exactly its distinct-word table to training. ``min_count``
prunes the long unicode tail before the table leaves the cluster (the
same lever SentencePiece's trainer applies), and ``max_vocab`` hard-fails
rather than silently OOM the driver.

Encoding is the soundex idiom: per batch, words are dictionary-encoded
and the merge loop runs per DISTINCT word (O(distinct) interpreter work,
not O(tokens)), with a per-process LRU so hot words across batches are
encoded once per worker.

REL parity anchor: REL's mention detection tokenizes with a fixed
segmenter (REL:src/REL/mention_detection.py uses segment-level splits);
a trainable subword vocabulary is the corpus-scale generalization used
by LLM data pipelines for token accounting and packing budgets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_PATTERN = r"[a-z]+"


def word_counts(ds, text_col: str, *, pattern: str = DEFAULT_PATTERN,
                lowercase: bool = True):
    """Distributed word-frequency table: Dataset (word:string, cnt:int64).

    One streaming pass (regex extraction + per-batch dictionary-encode
    bincount partials) then one distinct-word-sized groupby — the
    combiner pattern; bytes exchanged are O(distinct words per block),
    not O(tokens).
    """
    from ray.data.aggregate import Sum

    from ..functions.normalize import extract_all_matches

    def partial(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if lowercase:
            text = pc.utf8_lower(text)
        ml = extract_all_matches(text, pattern)
        if isinstance(ml, pa.ChunkedArray):
            ml = ml.combine_chunks()
        flat = ml.flatten()
        if len(flat) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        enc = pc.dictionary_encode(flat)
        codes = np.asarray(enc.indices, dtype=np.int64)
        return pa.table({
            "word": enc.dictionary,
            "cnt": pa.array(np.bincount(
                codes, minlength=len(enc.dictionary)).astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("word").aggregate(Sum("cnt"))
            .map_batches(lambda t: t.rename_columns(["word", "cnt"]),
                         batch_format="pyarrow", zero_copy_batch=True))


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    """Apply one merge (left, right) -> left+right to a symbol tuple."""
    out = []
    i, n = 0, len(sym)
    a, b = pair
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_train_from_counts(words: list[str], counts: list[int],
                          num_merges: int) -> list[tuple[str, str]]:
    """The exact Sennrich'16 merge loop over a word-frequency table, with
    a DETERMINISTIC tie-break (highest pair count, then lexicographically
    smallest (left, right)). Incremental pair-count maintenance: each
    merge touches only the words containing the merged pair.
    """
    seqs = [tuple(w) for w in words]
    cnts = list(counts)
    pair_counts: dict[tuple, int] = {}
    pair_words: dict[tuple, set] = {}
    for wi, (s, c) in enumerate(zip(seqs, cnts)):
        for j in range(len(s) - 1):
            p = (s[j], s[j + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best, best_c = None, 0
        for p, c in pair_counts.items():
            if c > best_c or (c == best_c and best is not None and p < best):
                best, best_c = p, c
        if best is None or best_c <= 0:
            break
        merges.append(best)
        for wi in list(pair_words.get(best, ())):
            s, c = seqs[wi], cnts[wi]
            # retract the word's old pair contributions
            for j in range(len(s) - 1):
                p = (s[j], s[j + 1])
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[p]
            s = _merge_word(s, best)
            seqs[wi] = s
            for j in range(len(s) - 1):
                p = (s[j], s[j + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
    return merges


def bpe_train(ds, text_col: str, num_merges: int, *,
              pattern: str = DEFAULT_PATTERN, lowercase: bool = True,
              min_count: int = 1, max_vocab: int = 5_000_000) -> pa.Table:
    """Train ``num_merges`` BPE merges over a text column. Returns a small
    Arrow table (rank:int64, left:string, right:string).

    Scale: the only corpus-sized work is `word_counts` (one pass + one
    skinny groupby). The merge loop needs the distinct-word table on the
    driver — ``min_count`` prunes the tail IN the cluster first (at web
    scale set min_count>=3..10; hapax legomena never influence the first
    tens of thousands of merges anyway), and ``max_vocab`` fails loudly
    instead of collecting an unbounded vocabulary.
    """
    from ..functions.rayutil import collect_table

    wc = word_counts(ds, text_col, pattern=pattern, lowercase=lowercase)
    if min_count > 1:
        wc = wc.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("cnt"),
                                                min_count)),
            batch_format="pyarrow", zero_copy_batch=True)
    wc = wc.materialize()
    n = wc.count()
    if n > max_vocab:
        raise ValueError(
            f"bpe_train: pruned vocabulary has {n} words > max_vocab="
            f"{max_vocab}; raise min_count (web-scale corpora need the "
            f"tail pruned in-cluster) or max_vocab")
    tab = collect_table(wc, pa.schema([("word", pa.string()),
                                       ("cnt", pa.int64())]))
    # canonical driver order so training is partitioning-invariant
    tab = tab.sort_by([("word", "ascending")])
    merges = bpe_train_from_counts(tab.column("word").to_pylist(),
                                   tab.column("cnt").to_pylist(),
                                   num_merges)
    return pa.table({
        "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
        "left": pa.array([m[0] for m in merges], type=pa.string()),
        "right": pa.array([m[1] for m in merges], type=pa.string())})


def encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the GPT-2 bpe())."""
    sym = list(word)
    while len(sym) > 1:
        best_j, best_r = -1, None
        for j in range(len(sym) - 1):
            r = ranks.get((sym[j], sym[j + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_j, best_r = j, r
        if best_r is None:
            break
        sym[best_j:best_j + 2] = [sym[best_j] + sym[best_j + 1]]
    return sym


_ENCODE_CACHE: dict = {}


def bpe_token_counts(ds, text_col: str, id_col: str, merges: pa.Table, *,
                     pattern: str = DEFAULT_PATTERN, lowercase: bool = True,
                     cache_max: int = 1_000_000):
    """Per-document BPE token count with a trained merge table:
    Dataset (id_col, n_bpe_tokens:int64).

    The merge table is broadcast ONCE (ray.put); each batch
    dictionary-encodes its words so the Python merge loop runs per
    DISTINCT word, memoized per worker process across batches.
    """
    import ray as _ray

    from ..functions.normalize import extract_all_matches
    from ..functions.rayutil import get_broadcast

    ref = _ray.put(merges)

    def counts(t: pa.Table, ref=ref) -> pa.Table:
        mt = get_broadcast(ref)
        ck = id(mt)
        cached = _ENCODE_CACHE.get(ck)
        if cached is None:
            ranks = {(l, r): i for i, (l, r) in enumerate(
                zip(mt.column("left").to_pylist(),
                    mt.column("right").to_pylist()))}
            cached = _ENCODE_CACHE[ck] = (ranks, {})
        ranks, memo = cached
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if lowercase:
            text = pc.utf8_lower(text)
        ml = extract_all_matches(text, pattern)
        if isinstance(ml, pa.ChunkedArray):
            ml = ml.combine_chunks()
        flat = ml.flatten()
        offs = np.asarray(ml.offsets, dtype=np.int64)
        if len(flat) == 0:
            return pa.table({id_col: t.column(id_col),
                             "n_bpe_tokens": pa.array(
                                 np.zeros(t.num_rows, dtype=np.int64))})
        enc = pc.dictionary_encode(flat)
        if len(memo) > cache_max:
            memo.clear()
        toks_per_distinct = np.empty(len(enc.dictionary), dtype=np.int64)
        for di, w in enumerate(enc.dictionary.to_pylist()):
            v = memo.get(w)
            if v is None:
                v = memo[w] = len(encode_word(w, ranks))
            toks_per_distinct[di] = v
        per_word = toks_per_distinct[np.asarray(enc.indices,
                                                dtype=np.int64)]
        csum = np.concatenate([[0], np.cumsum(per_word)])
        n_tok = csum[offs[1:]] - csum[offs[:-1]]
        return pa.table({id_col: t.column(id_col),
                         "n_bpe_tokens": pa.array(n_tok.astype(np.int64))})

    return ds.map_batches(counts, batch_format="pyarrow",
                          zero_copy_batch=True)
