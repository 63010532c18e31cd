"""Canopy blocking (McCallum, Nigam & Ungar, KDD'00) — deterministic
distributed variant.

Classic canopy clustering picks centers greedily while scanning (inherently
sequential); the standard distributed adaptation (as in Mahout's canopy
job) fixes the center set up front. Here centers are the records whose
Knuth id-hash falls in a 1/center_mod slice — deterministic, reproducible
across runs/engines, and density-proportional. Every record is assigned to
EVERY center it shares >= min_shared distinct word tokens with (the cheap
distance), producing the overlapping canopies the expensive pairwise stage
then works within. REL parity anchor: a coarse recall-oriented candidate
filter before exact scoring (REL:src/REL/mention_detection.py candidate
lookup plays this role against the Wikipedia prior store).

Plan: one token-bucket co-group does everything — each distinct token's
rows land in one hash bucket, so document frequency, the df cap, center
membership and the doc x center emission are all per-segment vectorized
ops; a final (doc, center) groupby counts shared tokens. The df cap
(max_df) is part of the OPERATOR SEMANTICS (mirrored in the SQL oracle),
not a silent drop: high-df tokens carry no blocking signal and would
quadratically blow up their segment at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rayutil import bucketed_group_apply, segment_starts
from ..stages.sampling import _KNUTH, _MOD


def distinct_doc_tokens(ds, *, id_col: str, text_col: str,
                        shingle: int = 3, batch_size: int = 4096):
    """documents -> distinct (id, tk) rows where tk is a word `shingle`-gram
    of the space-split lowercased text (shingles, not single words, because
    canopy needs features rarer than any one vocabulary item — single words
    on a natural corpus are near-stopwords for blocking purposes).
    Per-doc dedup happens inside the batch that owns the doc (each source
    row explodes within one batch), so the result is globally distinct."""

    def explode(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(t.column(text_col)), " ")
        wl = np.asarray(pc.list_value_length(words), dtype=np.int64)
        n_sh = np.maximum(wl - (shingle - 1), 0)   # shingles per doc
        flat = pc.list_flatten(words).combine_chunks()
        # flattened start index of each doc's word run
        doc_off = np.concatenate(([0], np.cumsum(wl)[:-1]))
        base = (np.repeat(doc_off, n_sh)
                + (np.arange(int(n_sh.sum()), dtype=np.int64)
                   - np.repeat(np.cumsum(n_sh) - n_sh, n_sh)))
        parts = [flat.take(pa.array(base + j)) for j in range(shingle)]
        tk = pc.binary_join_element_wise(*parts, " ")
        ids = t.column(id_col).take(
            pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64), n_sh)))
        pairs = pa.table({id_col: ids, "tk": tk})
        if pairs.num_rows == 0:
            return pairs
        pairs = pairs.sort_by([(id_col, "ascending"), ("tk", "ascending")])
        n = pairs.num_rows
        keep = np.ones(n, dtype=bool)
        same_id = np.asarray(pc.equal(pairs.column(id_col).slice(1),
                                      pairs.column(id_col).slice(0, n - 1)))
        same_tk = np.asarray(pc.equal(pairs.column("tk").slice(1),
                                      pairs.column("tk").slice(0, n - 1)))
        keep[1:] = ~(same_id & same_tk)
        return pairs.filter(pa.array(keep))

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def canopy_assign(ds, *, id_col: str, text_col: str,
                  shingle: int = 3, center_mod: int = 10,
                  min_shared: int = 3, max_df: int = 50,
                  num_buckets: int = 64):
    """(doc_id, center_id, n_shared) canopy assignments: every doc paired
    with every center sharing >= min_shared distinct word shingles, over
    shingles with document frequency <= max_df. Centers = ids with
    knuth_hash(id) % center_mod == 0 (centers are in their own canopy)."""
    from ray.data.aggregate import Count

    toks = distinct_doc_tokens(ds, id_col=id_col, text_col=text_col,
                               shingle=shingle)

    def emit(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "center_id": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        starts = np.asarray(segment_starts(bucket.column("tk")))
        lens = np.diff(np.append(starts, n))
        seg_of = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        ids = np.asarray(pc.cast(bucket.column(id_col), pa.int64()))
        ok_seg = lens <= max_df                      # df cap (semantics)
        is_center = ((ids % _MOD) * _KNUTH % _MOD) % center_mod == 0
        is_center &= ok_seg[seg_of]
        cpos = np.nonzero(is_center)[0]
        if len(cpos) == 0:
            return empty
        c_per_seg = np.add.reduceat(is_center.astype(np.int64), starts)
        c_start = np.searchsorted(cpos, starts)
        rep = np.where(ok_seg[seg_of], c_per_seg[seg_of], 0)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), rep)
        total = int(rep.sum())
        if total == 0:
            return empty
        slot = (np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(rep) - rep, rep))
        cent_idx = cpos[c_start[seg_of[doc_idx]] + slot]
        return pa.table({"doc_id": pa.array(ids[doc_idx]),
                         "center_id": pa.array(ids[cent_idx])})

    emissions = bucketed_group_apply(toks, "tk", emit,
                                     num_buckets=num_buckets,
                                     sort_cols=[(id_col, "ascending")])
    counted = emissions.groupby(["doc_id", "center_id"]).aggregate(Count())

    def fin(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["doc_id", "center_id", "n_shared"])
        return t.filter(pc.greater_equal(t.column("n_shared"),
                                         pa.scalar(min_shared, pa.int64())))

    return counted.map_batches(fin, batch_format="pyarrow",
                               zero_copy_batch=True)
