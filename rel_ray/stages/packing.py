"""Sequence packing: assign documents to fixed token-budget training
sequences by a distributed prefix scan.

The LLM-training op: concatenate documents in a deterministic order into
packs of ``budget`` tokens (contiguous greedy fill — doc d goes to pack
``floor(running_total_before_d / budget)``). Needs a GLOBAL running sum,
which Ray Data has no operator for; this is the classic two-pass scan:

  pass 1: per-range-bucket token sums (tiny aggregate, one row per bucket)
          → exclusive scan on the driver (O(num_buckets) scalars)
          → broadcast offsets.
  pass 2: per-bucket in-bucket sort + local cumsum + bucket offset.

Both passes stream; driver state is num_buckets integers, independent of
data size. Buckets are RANGE buckets on the id (order-preserving), not hash
buckets — the scan needs bucket k to contain exactly the ids between the
bucket boundaries.

Scale note: num_buckets bounds parallelism of pass 2; size it ~#cores of
the cluster. Skewed id ranges skew bucket sizes — ids here are dense
synthetic keys; for arbitrary keys sample quantile boundaries first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_RB = "__rb"


def running_sum(ds, *, id_col: str, val_col: str, num_buckets: int = 64):
    """Adds ``cum``: inclusive running sum of val_col in id_col order."""
    import ray as _ray

    from ..functions.rayutil import get_broadcast

    stats = ds.aggregate(*_minmax(id_col))
    lo, hi = stats[f"min({id_col})"], stats[f"max({id_col})"]
    span = max(int(hi) - int(lo) + 1, 1)
    if span - 1 > (2**63 - 1) // num_buckets:
        # (ids - lo) * num_buckets would wrap int64 and produce negative
        # range buckets -> a silently wrong prefix scan. Such a sparse id
        # space needs sampled quantile boundaries instead of fixed-width
        # range buckets; fail loudly rather than scan wrong.
        raise ValueError(
            f"running_sum: id span {span} x num_buckets {num_buckets} "
            f"overflows int64 range bucketing; use denser ids or "
            f"quantile-based boundaries")

    def add_rb(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy()
        rb = (ids - int(lo)) * num_buckets // span
        return t.append_column(_RB, pa.array(rb, type=pa.int64()))

    bucketed = ds.map_batches(add_rb, batch_format="pyarrow",
                              zero_copy_batch=True)
    from ray.data.aggregate import Sum
    per_bucket = bucketed.groupby(_RB).aggregate(Sum(val_col)).take_all()
    sums = {int(r[_RB]): int(r[f"sum({val_col})"]) for r in per_bucket}
    offsets, acc = {}, 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += sums.get(b, 0)
    off_ref = _ray.put(offsets)

    def scan_bucket(group: pa.Table) -> pa.Table:
        off = get_broadcast(off_ref)
        g = group.sort_by([(id_col, "ascending")])
        b = int(g.column(_RB)[0].as_py()) if g.num_rows else 0
        v = pc.cast(g.column(val_col), pa.int64()).to_numpy()
        cum = np.cumsum(v) + off.get(b, 0)
        return g.drop_columns([_RB]).append_column(
            "cum", pa.array(cum, type=pa.int64()))

    return bucketed.groupby(_RB).map_groups(scan_bucket, batch_format="pyarrow")


def _minmax(col: str):
    from ray.data.aggregate import Max, Min
    return Min(col), Max(col)


def pack_sequences(ds, *, id_col: str, count_col: str, budget: int,
                   num_buckets: int = 64):
    """(id, count) → (id, count, seq_id): contiguous greedy fill in id order,
    pack p holds the docs whose preceding running total is in [p*b, (p+1)*b)."""
    scanned = running_sum(ds, id_col=id_col, val_col=count_col,
                          num_buckets=num_buckets)

    def assign(t: pa.Table) -> pa.Table:
        cum = t.column("cum").to_numpy()
        cnt = pc.cast(t.column(count_col), pa.int64()).to_numpy()
        seq = (cum - cnt) // budget
        return t.append_column("seq_id", pa.array(seq, type=pa.int64()))

    return scanned.map_batches(assign, batch_format="pyarrow",
                               zero_copy_batch=True)


def chunk_documents(ds, *, id_col: str, text_col: str, chunk_size: int = 50,
                    stride: int = 40, token_pattern: str = "[a-z]+",
                    batch_size: int = 4096):
    """RAG-style overlapping chunking: split each document's token sequence
    into windows of ``chunk_size`` tokens starting every ``stride`` tokens
    (overlap = chunk_size - stride), one output row per chunk.

    Chunk starts are s = 0, stride, 2*stride, ... while s < n_tokens; the
    last chunk may be short (it still has > overlap tokens unless the doc
    ends inside the overlap). Zero-token docs emit no chunks. chunk_text is
    the space-joined token window (normalized form, matching an ANSI-SQL
    oracle built from regexp_extract_all + array slicing).

    Fully vectorized per batch (ragged arange + one take + binary_join);
    embarrassingly parallel — no shuffle at any scale. Output:
    (id_col, chunk_idx:int64, n_tokens:int64, chunk_text:string).
    """
    from ..functions.normalize import extract_all_matches

    assert 0 < stride <= chunk_size

    def chunk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        ml = extract_all_matches(pc.utf8_lower(t.column(text_col)),
                                 token_pattern)
        if isinstance(ml, pa.ChunkedArray):
            ml = ml.combine_chunks()
        lens = np.asarray(pc.list_value_length(ml), dtype=np.int64)
        tok_starts = np.asarray(ml.offsets, dtype=np.int64)[:-1]
        n_chunks = (lens + stride - 1) // stride  # ceil(len/stride), 0 for empty
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({id_col: ids.slice(0, 0),
                             "chunk_idx": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64()),
                             "chunk_text": pa.array([], type=pa.string())})
        row = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
        offs = np.cumsum(n_chunks) - n_chunks
        cidx = np.arange(total, dtype=np.int64) - np.repeat(offs, n_chunks)
        s = cidx * stride
        clen = np.minimum(s + chunk_size, lens[row]) - s
        # gather token indices per chunk (overlap duplicates the window)
        tot_toks = int(clen.sum())
        crow = np.repeat(np.arange(total, dtype=np.int64), clen)
        coffs = np.cumsum(clen) - clen
        pos = np.arange(tot_toks, dtype=np.int64) - np.repeat(coffs, clen)
        gather = np.repeat(tok_starts[row] + s, clen) + pos
        chunk_toks = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(clen))), type=pa.int32()),
            ml.values.take(pa.array(gather)))
        return pa.table({
            id_col: ids.take(pa.array(row)),
            "chunk_idx": pa.array(cidx),
            "n_tokens": pa.array(clen),
            "chunk_text": pc.binary_join(chunk_toks, " "),
        })

    return ds.map_batches(chunk, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)
