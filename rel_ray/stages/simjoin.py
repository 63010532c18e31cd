"""Exact set-similarity self-join (AllPairs/PPJoin-style prefix filtering).

REL parity anchor: the candidate-generation + exact-verify split mirrors
REL:src/REL/mention_detection.py (candidate lookup) followed by exact
scoring — but here the *similarity predicate itself* is exact: every pair of
documents whose distinct word-n-gram shingle sets have Jaccard >= tau is
emitted, and no others. This is the exact counterpart of the probabilistic
MinHash path in stages/dedup.py (LSH proposes ~= ; this stage proves =).

Algorithm (published: Bayardo et al., "Scaling Up All Pairs Similarity
Search", WWW'07; Xiao et al. PPJoin, WWW'08):
  1. per document: sorted-unique shingle codes (a global total order — we use
     the 64-bit shingle hash itself as the order, which needs no global
     document-frequency pass; a df-ascending order would shrink candidate
     lists further at the cost of one extra aggregate + broadcast).
  2. prefix filter: if J(a,b) >= tau then, for tokens sorted by ONE global
     order, a and b share at least one code among their first
     ``L - ceil(tau*L) + 1`` codes (L = set size). Each doc therefore indexes
     only that prefix.
  3. candidate pairs = docs sharing a prefix code, generated per code-segment
     inside hash buckets (bucketed_group_apply — never one task per distinct
     code), pre-filtered by the length condition ``min >= tau * max``.
  4. exact verify: vectorized (intersection, union) via one lexsort
     (scoring.pairwise_overlap); integer predicate ``den*inter >= num*uni``.
  5. band-style dedup of pairs found via multiple shared prefix codes
     (same sorted adjacent-dup filter as stages/pairs.py).

Scale notes (100 TB): the only all-to-all exchange is the prefix-code
shuffle, keyed into ``num_buckets`` hash buckets. Each prefix row carries its
doc's full code set (list<uint64>) so verification happens in-bucket with no
second join; that multiplies index size by the prefix length — the classic
AllPairs space/shuffle tradeoff. Hot shingles (df >> avg) quadratically blow
up one segment; ``max_seg`` caps the segment with a LOGGED drop counter
(exactness requires the cap off — default 0 = unlimited).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.rayutil import DropCounter, bucketed_group_apply, segment_starts
from ..functions.shingles import unique_shingle_sets, word_ngram_codes


def _empty_pairs() -> pa.Table:
    return pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "inter": pa.array([], type=pa.int64()),
        "uni": pa.array([], type=pa.int64()),
    })


def shingle_records(ds, *, id_col: str, text_col: str, token_pattern: str,
                    ngram: int, tau_num: int, tau_den: int,
                    batch_size: int = 4096):
    """documents → exploded prefix-index rows
    (pcode, doc_id, dlen, codes: list<uint64>).

    Docs with fewer than ``ngram`` tokens emit no shingles (matches a SQL
    oracle generating n-grams via generate_series(1, len - n + 1))."""
    from ..functions.normalize import extract_all_matches

    def explode(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64())
        ml = extract_all_matches(t.column(text_col), token_pattern)
        nwords = np.asarray(pc.list_value_length(ml), dtype=np.int64)
        joined = pc.binary_join(ml, " ")
        codes, splits = word_ngram_codes(joined, ngram)
        uniq = unique_shingle_sets(codes, splits)
        usplits = np.asarray(uniq.offsets, dtype=np.int64)
        ucodes = np.asarray(uniq.values, dtype=np.uint64)
        lens = usplits[1:] - usplits[:-1]
        # prefix length L - ceil(tau*L) + 1, integer-exact; short docs drop out
        ceil_tau_l = (tau_num * lens + tau_den - 1) // tau_den
        plen = np.where(nwords >= ngram,
                        np.clip(lens - ceil_tau_l + 1, 0, lens), 0)
        total = int(plen.sum())
        if total == 0:
            return pa.table({
                "pcode": pa.array([], type=pa.uint64()),
                "doc_id": pa.array([], type=pa.int64()),
                "dlen": pa.array([], type=pa.int64()),
                "codes": pa.ListArray.from_arrays(
                    pa.array([0], type=pa.int32()),
                    pa.array([], type=pa.uint64())),
            })
        row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), plen)
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(plen) - plen, plen))
        pcode = ucodes[np.repeat(usplits[:-1], plen) + pos]
        row_take = pa.array(row_idx)
        return pa.table({
            "pcode": pa.array(pcode, type=pa.uint64()),
            "doc_id": ids.take(row_take),
            "dlen": pa.array(lens[row_idx]),
            "codes": uniq.take(row_take),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


class SegmentAllPairs:
    """Per-bucket candidate generation + exact verify.

    The bucket arrives sorted by (pcode, doc_id); each equal-pcode segment
    yields all i<j pairs (doc_id ascending → id_a < id_b numerically),
    length-filtered then overlap-verified — all vectorized."""

    def __init__(self, tau_num: int, tau_den: int, max_seg: int = 0,
                 counter_name: str = "simjoin_drops", cross_side: bool = False):
        self.tau_num = tau_num
        self.tau_den = tau_den
        self.max_seg = max_seg
        self.counter = DropCounter(counter_name) if max_seg else None
        # cross-side mode (similarity_cross_join): the bucket carries a
        # `side` column; only side-0 × side-1 pairs are emitted, oriented
        # so id_a is always the side-0 (new-corpus) doc
        self.cross_side = cross_side

    def __call__(self, bucket: pa.Table) -> pa.Table:
        from .scoring import pairwise_overlap

        n = bucket.num_rows
        if n < 2:
            return _empty_pairs()
        pcode = bucket.column("pcode")
        starts = np.asarray(segment_starts(pcode), dtype=np.int64)
        seg_lens = np.diff(np.append(starts, n))
        if self.max_seg and (seg_lens > self.max_seg).any():
            over = seg_lens[seg_lens > self.max_seg]
            self.counter.add("prefix_segment_rows", int((over - self.max_seg).sum()))
            # truncate each oversized segment to its first max_seg members
            keep_rows = (np.arange(n, dtype=np.int64)
                         - np.repeat(starts, seg_lens)) < self.max_seg
            bucket = bucket.filter(pa.array(keep_rows))
            n = bucket.num_rows
            starts = np.asarray(segment_starts(bucket.column("pcode")),
                                dtype=np.int64)
            seg_lens = np.diff(np.append(starts, n))
        seg_start_per_row = np.repeat(starts, seg_lens)
        local_pos = np.arange(n, dtype=np.int64) - seg_start_per_row
        total = int(local_pos.sum())
        if total == 0:
            return _empty_pairs()
        b_idx = np.repeat(np.arange(n, dtype=np.int64), local_pos)
        offs = np.cumsum(local_pos) - local_pos
        a_idx = (np.arange(total, dtype=np.int64)
                 - np.repeat(offs, local_pos)
                 + np.repeat(seg_start_per_row, local_pos))
        dlen = bucket.column("dlen").to_numpy()
        la, lb = dlen[a_idx], dlen[b_idx]
        # J >= tau implies min_len >= tau * max_len
        keep = (self.tau_den * np.minimum(la, lb)
                >= self.tau_num * np.maximum(la, lb))
        if self.cross_side:
            side = bucket.column("side").to_numpy()
            keep &= side[a_idx] != side[b_idx]
        a_idx, b_idx = a_idx[keep], b_idx[keep]
        if len(a_idx) == 0:
            return _empty_pairs()
        if self.cross_side:
            # orient: id_a = side-0 row (consistent orientation is what lets
            # the downstream band dedup collapse multi-prefix duplicates)
            side = bucket.column("side").to_numpy()
            sw = side[a_idx] != 0
            a_idx, b_idx = (np.where(sw, b_idx, a_idx),
                            np.where(sw, a_idx, b_idx))
        codes = bucket.column("codes")
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        usplits = np.asarray(codes.offsets, dtype=np.int64)
        ucodes = np.asarray(codes.values, dtype=np.uint64)
        inter, uni = pairwise_overlap(a_idx, b_idx, ucodes, usplits)
        keep2 = self.tau_den * inter >= self.tau_num * uni
        ids = bucket.column("doc_id").to_numpy()
        return pa.table({
            "id_a": pa.array(ids[a_idx][keep2]),
            "id_b": pa.array(ids[b_idx][keep2]),
            "inter": pa.array(inter[keep2]),
            "uni": pa.array(uni[keep2]),
        })


def similarity_self_join(ds, *, id_col: str, text_col: str,
                         tau_num: int, tau_den: int,
                         token_pattern: str = "[a-z]+", ngram: int = 3,
                         num_buckets: int = 256, max_seg: int = 0,
                         cfg: PipelineConfig | None = None):
    """All pairs (id_a < id_b) of docs with shingle-set Jaccard >= tau_num/tau_den.

    Output schema: (id_a, id_b, inter, uni) — integer intersection/union of
    the distinct word-``ngram`` shingle sets, DuckDB-oracle-exact."""
    from .pairs import _dedup_bucket

    prefix = shingle_records(ds, id_col=id_col, text_col=text_col,
                             token_pattern=token_pattern, ngram=ngram,
                             tau_num=tau_num, tau_den=tau_den)
    pairs = bucketed_group_apply(
        prefix, "pcode", SegmentAllPairs(tau_num, tau_den, max_seg),
        num_buckets=num_buckets, sort_cols=[("doc_id", "ascending")])
    # one pair can qualify via several shared prefix codes; payload identical
    return bucketed_group_apply(
        pairs, "id_a", _dedup_bucket,
        num_buckets=num_buckets, sort_cols=[("id_b", "ascending")])


def similarity_cross_join(new_ds, base_ds, *, id_col: str, text_col: str,
                          tau_num: int, tau_den: int,
                          token_pattern: str = "[a-z]+", ngram: int = 3,
                          num_buckets: int = 256, max_seg: int = 0):
    """Exact set-similarity join BETWEEN two corpora: every (new, base) doc
    pair with shingle-set Jaccard >= tau_num/tau_den; id_a is always the
    new-corpus doc. The incremental-dedup primitive (dedup a fresh crawl
    against an existing training corpus) — same AllPairs prefix filter as
    the self-join, one shared prefix-code exchange over BOTH sides, no
    same-side pairs generated.

    Scale shape: identical to similarity_self_join — the prefix shuffle is
    the only all-to-all, and the (usually much larger) base corpus streams
    through it exactly once; nothing is materialized driver-side."""
    from .pairs import _dedup_bucket

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, dtype=np.int8)))
        return f

    def pre(ds, side):
        return shingle_records(
            ds, id_col=id_col, text_col=text_col,
            token_pattern=token_pattern, ngram=ngram,
            tau_num=tau_num, tau_den=tau_den).map_batches(
                tag(side), batch_format="pyarrow", zero_copy_batch=True)

    prefix = pre(new_ds, 0).union(pre(base_ds, 1))
    pairs = bucketed_group_apply(
        prefix, "pcode",
        SegmentAllPairs(tau_num, tau_den, max_seg, cross_side=True),
        num_buckets=num_buckets, sort_cols=[("doc_id", "ascending")])
    return bucketed_group_apply(
        pairs, "id_a", _dedup_bucket,
        num_buckets=num_buckets, sort_cols=[("id_b", "ascending")])


def _full_code_records(ds, *, id_col: str, text_col: str,
                       token_pattern: str, ngram: int,
                       batch_size: int = 4096):
    """documents → one row per DISTINCT shingle code
    (pcode, doc_id, dlen, codes) — the container-side index of the
    containment join (the container must be findable through ANY of its
    codes, so it indexes all of them; the standard asymmetric-join cost)."""
    from ..functions.normalize import extract_all_matches
    from ..functions.shingles import unique_shingle_sets, word_ngram_codes

    def explode(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64())
        ml = extract_all_matches(t.column(text_col), token_pattern)
        joined = pc.binary_join(ml, " ")
        codes, splits = word_ngram_codes(joined, ngram)
        uniq = unique_shingle_sets(codes, splits)
        usplits = np.asarray(uniq.offsets, dtype=np.int64)
        ucodes = np.asarray(uniq.values, dtype=np.uint64)
        lens = usplits[1:] - usplits[:-1]
        total = int(lens.sum())
        if total == 0:
            return pa.table({
                "pcode": pa.array([], type=pa.uint64()),
                "doc_id": pa.array([], type=pa.int64()),
                "dlen": pa.array([], type=pa.int64()),
                "codes": pa.ListArray.from_arrays(
                    pa.array([0], type=pa.int32()),
                    pa.array([], type=pa.uint64())),
            })
        row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        row_take = pa.array(row_idx)
        return pa.table({
            "pcode": pa.array(ucodes, type=pa.uint64()),
            "doc_id": ids.take(row_take),
            "dlen": pa.array(lens[row_idx]),
            "codes": uniq.take(row_take),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


class SegmentContainment:
    """Per-bucket (probe × container) candidate generation + exact verify
    for the containment join. Bucket sorted by (pcode, side, doc_id):
    each equal-pcode segment holds its probes (side 0, prefix-indexed)
    first, containers (side 1, fully indexed) after."""

    def __init__(self, tau_num: int, tau_den: int, max_pairs_per_code: int = 0,
                 counter_name: str = "containment_drops"):
        self.tau_num = tau_num
        self.tau_den = tau_den
        self.max_pairs = max_pairs_per_code
        self.counter = DropCounter(counter_name) if max_pairs_per_code else None

    def __call__(self, bucket: pa.Table) -> pa.Table:
        from .scoring import pairwise_overlap

        n = bucket.num_rows
        if n < 2:
            return _empty_pairs()
        starts = np.asarray(segment_starts(bucket.column("pcode")),
                            dtype=np.int64)
        seg_lens = np.diff(np.append(starts, n))
        side = bucket.column("side").to_numpy()
        is_probe = (side == 0).astype(np.int64)
        c0 = np.add.reduceat(is_probe, starts)
        c1 = seg_lens - c0
        pairs_per_seg = c0 * c1
        if self.max_pairs:
            over = pairs_per_seg > self.max_pairs
            if over.any():
                self.counter.add(
                    "containment_pairs",
                    int((pairs_per_seg[over] - self.max_pairs).sum()))
                # drop oversized segments entirely (logged) — a stopword
                # shingle matches everything and proves nothing
                pairs_per_seg = np.where(over, 0, pairs_per_seg)
        total = int(pairs_per_seg.sum())
        if total == 0:
            return _empty_pairs()
        p_global = (np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(pairs_per_seg) - pairs_per_seg,
                                pairs_per_seg))
        c1_per_pair = np.repeat(c1, pairs_per_seg)
        seg_start_per_pair = np.repeat(starts, pairs_per_seg)
        c0_per_pair = np.repeat(c0, pairs_per_seg)
        a_idx = seg_start_per_pair + p_global // c1_per_pair
        b_idx = seg_start_per_pair + c0_per_pair + p_global % c1_per_pair
        ids = bucket.column("doc_id").to_numpy()
        dlen = bucket.column("dlen").to_numpy()
        la, lb = dlen[a_idx], dlen[b_idx]
        # C(a→b) >= tau needs |B| >= tau*|A|; also drop self-pairs
        keep = (self.tau_den * lb >= self.tau_num * la) \
            & (ids[a_idx] != ids[b_idx])
        a_idx, b_idx = a_idx[keep], b_idx[keep]
        if len(a_idx) == 0:
            return _empty_pairs()
        codes = bucket.column("codes")
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        usplits = np.asarray(codes.offsets, dtype=np.int64)
        ucodes = np.asarray(codes.values, dtype=np.uint64)
        inter, _uni = pairwise_overlap(a_idx, b_idx, ucodes, usplits)
        la = dlen[a_idx]
        keep2 = self.tau_den * inter >= self.tau_num * la
        return pa.table({
            "id_a": pa.array(ids[a_idx][keep2]),
            "id_b": pa.array(ids[b_idx][keep2]),
            "inter": pa.array(inter[keep2]),
            "uni": pa.array(la[keep2]),  # |A| — the containment denominator
        })


def containment_self_join(ds, *, id_col: str, text_col: str,
                          tau_num: int, tau_den: int,
                          token_pattern: str = "[a-z]+", ngram: int = 3,
                          num_buckets: int = 256,
                          max_pairs_per_code: int = 0):
    """ASYMMETRIC set-containment self-join: every ORDERED pair (a, b),
    a ≠ b, with |shingles(a) ∩ shingles(b)| ≥ tau · |shingles(a)| — "a is
    mostly contained in b". The curation op symmetric Jaccard misses: a
    paragraph quoted inside a long page has tiny Jaccard but containment
    ≈ 1; boilerplate-wrapped copies, quote-mining and subset-document
    detection are all containment queries.

    Prefix filter (Bayardo et al. WWW'07, asymmetric form): if
    |A∩B| ≥ ceil(tau·|A|) then at most |A| − ceil(tau·|A|) of A's codes
    miss B, so A's first |A| − ceil(tau·|A|) + 1 codes (global hash order)
    must intersect B's FULL set → probe side indexes its prefix (the same
    rows `shingle_records` already emits — the Jaccard prefix length is
    the identical formula), container side indexes every distinct code.
    Candidates are (probe × container) per equal-code segment; exact
    verify via the same lexsort overlap kernel; ordered-pair dedup.

    Scale shape: one prefix-code exchange, same as the Jaccard self-join;
    the container side's full-code index multiplies its exchange rows by
    its set size — the irreducible asymmetric-join cost, linear in corpus
    shingle mass, never quadratic. Hot codes (stopword shingles) blow up
    one segment: ``max_pairs_per_code`` drops those segments with a LOGGED
    counter (default 0 = exact).

    Output: (id_a, id_b, inter, uni) where uni = |A| (the containment
    denominator), ordered pairs — DuckDB-oracle-exact."""
    from .pairs import _dedup_bucket

    def tag(side_val: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side_val, dtype=np.int8)))
        return f

    probe = shingle_records(
        ds, id_col=id_col, text_col=text_col, token_pattern=token_pattern,
        ngram=ngram, tau_num=tau_num, tau_den=tau_den).map_batches(
            tag(0), batch_format="pyarrow", zero_copy_batch=True)
    container = _full_code_records(
        ds, id_col=id_col, text_col=text_col, token_pattern=token_pattern,
        ngram=ngram).map_batches(
            tag(1), batch_format="pyarrow", zero_copy_batch=True)
    pairs = bucketed_group_apply(
        probe.union(container), "pcode",
        SegmentContainment(tau_num, tau_den, max_pairs_per_code),
        num_buckets=num_buckets,
        sort_cols=[("side", "ascending"), ("doc_id", "ascending")])
    return bucketed_group_apply(
        pairs, "id_a", _dedup_bucket,
        num_buckets=num_buckets, sort_cols=[("id_b", "ascending")])
