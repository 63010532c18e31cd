"""Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD'95).

The third classic ER blocking family next to LSH (stages/blocking.py) and
exact-key grouping: sort all records by a blocking key and emit candidate
pairs for every two records within a sliding window of ``window`` positions
in the sorted order. REL parity anchor: REL's candidate selection bounds
the comparison space per mention (REL:src/REL/mention_detection.py +
wikipedia prior top-k); SNM is the surname/typo-robust equivalent used when
no prior store exists.

Distributed plan (no all-to-all sort of the data):
  1. boundary sampling — per-batch order statistics of an order-preserving
     uint64 key proxy (big-endian first 8 bytes), one worker-side pre-fold,
     driver sees O(num_buckets) scalars;
  2. exact global rank — range-bucket by proxy, per-bucket counts (skinny
     aggregate) -> exclusive scan on the driver (num_buckets ints) ->
     per-bucket sort + local arange + offset. Ranks are exact and dense
     even though boundaries are approximate (boundaries only affect load
     balance, never rank values);
  3. pairing — re-bucket by rank chunk (perfectly balanced: ranks are
     dense); each row goes to its owner chunk, plus a ghost copy to the
     previous chunk iff it is one of the first window-1 ranks of its chunk,
     so every in-window pair is generated exactly once, in the chunk that
     owns its left element. Replication factor <= 1 + (window-1)/chunk.

Skew note: all keys sharing one 8-byte prefix land in one range bucket; a
pathological corpus (every key equal) degrades step 2 to one bucket. That
is the same degenerate case a distributed sort hits; callers should pick a
key with entropy in the first bytes (the default query uses the lowercased
text prefix).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_RB = "__snm_rb"
_RK = "rk"
_CH = "__snm_ch"
_OWN = "__snm_own"


def prefix_u64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Order-preserving uint64 proxy of a string column: big-endian first 8
    UTF-8 bytes, zero-padded. Monotone (non-strict) in byte-lexicographic
    string order, so range buckets in proxy space are order-contiguous."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.binary_slice(pc.cast(col, pa.binary()), 0, 8)
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    # zero-copy buffer reads (honor the array offset, cf. gru_encode)
    off = np.frombuffer(col.buffers()[1], dtype=np.int32,
                        count=n + 1, offset=col.offset * 4).astype(np.int64)
    mat = np.zeros((n, 8), dtype=np.uint8)
    if col.buffers()[2] is not None:
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        lens = np.diff(off)
        total = int(lens.sum())
        if total:
            starts = np.cumsum(lens) - lens
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            k = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            mat[rows, k] = data[np.repeat(off[:-1], lens) + k]
    return mat.view(">u8").ravel().astype(np.uint64)


def _sample_boundaries(ds, key_col: str, num_buckets: int,
                       per_partial: int = 257) -> np.ndarray:
    """num_buckets-1 ascending uint64 cut points from a two-level
    order-statistic sample: per-batch sorted proxies -> evenly spaced picks
    (one skinny list row per batch) -> worker-side pre-fold merges 64
    partial rows into one -> driver merges the survivors. Driver traffic is
    O(blocks/64 * per_partial) scalars; a deeper fold tree is the same code
    with a second pre-fold pass."""

    def partial(t: pa.Table) -> pa.Table:
        p = np.sort(prefix_u64(t.column(key_col)))
        if len(p) > per_partial:
            idx = np.linspace(0, len(p) - 1, per_partial).astype(np.int64)
            p = p[idx]
        return pa.table({"s": pa.array([p.astype(np.int64)],
                                       type=pa.list_(pa.int64()))})

    def fold(t: pa.Table) -> pa.Table:
        parts = [np.asarray(t.column("s")[i].values, dtype=np.int64)
                 for i in range(t.num_rows)]
        if not parts:
            return t
        p = np.sort(np.concatenate(parts))
        if len(p) > per_partial:
            idx = np.linspace(0, len(p) - 1, per_partial).astype(np.int64)
            p = p[idx]
        return pa.table({"s": pa.array([p], type=pa.list_(pa.int64()))})

    from ..functions.rayutil import collect_table
    folded = collect_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
          .map_batches(fold, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([("s", pa.list_(pa.int64()))]))
    parts = [np.asarray(folded.column("s")[i].values, dtype=np.int64)
             for i in range(folded.num_rows)]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    p = np.sort(np.concatenate(parts)).view(np.uint64)
    if num_buckets <= 1 or len(p) == 0:
        return np.empty(0, dtype=np.uint64)
    idx = (np.arange(1, num_buckets, dtype=np.int64)
           * (len(p) - 1)) // num_buckets
    return np.unique(p[idx])


def global_rank(ds, *, key_col: str, id_col: str, num_buckets: int = 64):
    """Append ``rk``: exact dense 0-based global rank under
    ORDER BY (key_col, id_col). Two skinny exchanges (bucket counts +
    bucketed sort); never a full-data all-to-all sort block move beyond the
    one bucketed shuffle a distributed sort needs anyway."""
    import ray as _ray

    from ray.data.aggregate import Count

    from ..functions.rayutil import get_broadcast

    bounds = _sample_boundaries(ds, key_col, num_buckets)
    bounds_ref = _ray.put(bounds)

    def add_rb(t: pa.Table) -> pa.Table:
        b = np.searchsorted(get_broadcast(bounds_ref),
                            prefix_u64(t.column(key_col)), side="right")
        return t.append_column(_RB, pa.array(b.astype(np.int64)))

    bucketed = ds.map_batches(add_rb, batch_format="pyarrow",
                              zero_copy_batch=True)
    counts = bucketed.groupby(_RB).aggregate(Count()).take_all()
    sizes = {int(r[_RB]): int(r["count()"]) for r in counts}
    offsets, acc = {}, 0
    for b in sorted(sizes):
        offsets[b] = acc
        acc += sizes[b]
    off_ref = _ray.put(offsets)

    def rank_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.drop_columns([_RB]).append_column(
                _RK, pa.array([], type=pa.int64()))
        off = get_broadcast(off_ref)
        b = int(g.column(_RB)[0].as_py())
        g = g.sort_by([(key_col, "ascending"), (id_col, "ascending")])
        rk = np.arange(g.num_rows, dtype=np.int64) + off.get(b, 0)
        return g.drop_columns([_RB]).append_column(_RK, pa.array(rk))

    return bucketed.groupby(_RB).map_groups(rank_bucket,
                                            batch_format="pyarrow")


def sorted_neighborhood_pairs(ds, *, id_col: str, key_col: str,
                              window: int, num_buckets: int = 64,
                              chunk: int = 4096):
    """Candidate pairs (id_a, id_b) for every two records within ``window``
    positions of each other under ORDER BY (key_col, id_col); id_a is the
    earlier-ranked record. Exactly the SQL
    ``JOIN ... ON b.rk > a.rk AND b.rk <= a.rk + window-1`` over
    row_number()-ranked rows."""
    assert window >= 2
    chunk = max(chunk, window)
    ranked = global_rank(ds.select_columns([id_col, key_col]),
                         key_col=key_col, id_col=id_col,
                         num_buckets=num_buckets)

    def scatter(t: pa.Table) -> pa.Table:
        rk = np.asarray(t.column(_RK))
        own = rk // chunk
        ids = t.column(id_col)
        base = pa.table({id_col: ids, _RK: t.column(_RK),
                         _CH: pa.array(own),
                         _OWN: pa.array(np.ones(len(rk), dtype=bool))})
        ghost_mask = (rk % chunk < window - 1) & (own > 0)
        if ghost_mask.any():
            gm = pa.array(ghost_mask)
            ghosts = pa.table({
                id_col: pc.filter(ids, gm),
                _RK: pc.filter(t.column(_RK), gm),
                _CH: pa.array(own[ghost_mask] - 1),
                _OWN: pa.array(np.zeros(int(ghost_mask.sum()), dtype=bool)),
            })
            base = pa.concat_tables([base, ghosts])
        return base

    scattered = ranked.map_batches(scatter, batch_format="pyarrow",
                                   zero_copy_batch=True)

    def pair_chunk(g: pa.Table) -> pa.Table:
        g = g.sort_by([(_RK, "ascending")])
        n = g.num_rows
        ids = np.asarray(g.column(id_col))
        n_own = int(np.asarray(g.column(_OWN)).sum())
        a_parts, b_parts = [], []
        for d in range(1, window):
            m = min(n_own, n - d)
            if m <= 0:
                break
            a_parts.append(ids[:m])
            b_parts.append(ids[d:d + m])
        if not a_parts:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64())})
        return pa.table({"id_a": np.concatenate(a_parts),
                         "id_b": np.concatenate(b_parts)})

    return scattered.groupby(_CH).map_groups(pair_chunk,
                                             batch_format="pyarrow")
