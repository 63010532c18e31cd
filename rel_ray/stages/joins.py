"""Distributed semi / anti join (existence joins), join-free by design.

REL parity anchor: REL's candidate filter keeps only mentions that have at
least one entry in the candidate store (REL:src/REL/mention_detection.py::
format_spans filtering against the p(e|m) index) — a semi join — and routes
the remainder to a fallback path — an anti join. Here both are first-class
relational operators over arbitrary keys.

Ray-Data-first: no ``Dataset.join`` (see rayutil.py for why). Two paths:

* ``semi_anti_join`` — the scale path. Left rows carry their payload, right
  rows are projected to the KEY ONLY, both are tagged and unioned, ONE
  bucket exchange co-locates equal keys, and each bucket filters left rows
  by a vectorized membership test against the right keys present in the
  bucket. Shuffle volume: |left| + |distinct-ish right keys| rows. Handles a
  right side of any size (no broadcast).
* ``broadcast_semi_anti`` — the small-right fast path: collect distinct
  right keys once, ``ray.put`` them, and filter left per batch with
  ``pc.is_in`` against the broadcast value set (per-process cached). Zero
  shuffles; use when the right key set fits comfortably in worker memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rayutil import bucketed_group_apply

_SIDE = "__side"


def semi_anti_join(left, right, *, key: str, anti: bool = False,
                   num_buckets: int = 256):
    """Keep left rows whose ``key`` appears (semi) / never appears (anti) in
    ``right``. Output schema == left schema (column order preserved)."""
    l_schema = left.schema()
    out_cols = [f.name for f in l_schema.base_schema]
    assert key in out_cols, f"key {key!r} must be a left column"
    types = {f.name: f.type for f in l_schema.base_schema}

    def proj_left(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in out_cols}
        cols[_SIDE] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def proj_right(t: pa.Table) -> pa.Table:
        # key only + in-batch distinct: shrinks the exchange to one row per
        # distinct key per batch without a pre-shuffle dedup pass
        k = t.column(key)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        k = pc.unique(k)
        n = len(k)
        cols = {c: (pc.cast(k, types[key]) if c == key
                    else pa.nulls(n, type=types[c])) for c in out_cols}
        cols[_SIDE] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    lp = left.map_batches(proj_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    rp = right.map_batches(proj_right, batch_format="pyarrow",
                           zero_copy_batch=True)

    def filt(bucket: pa.Table) -> pa.Table:
        side = np.asarray(bucket.column(_SIDE))
        l_mask = side == 0
        lt = bucket.filter(pa.array(l_mask)).drop_columns([_SIDE])
        rk = bucket.filter(pa.array(~l_mask)).column(key)
        if isinstance(rk, pa.ChunkedArray):
            rk = rk.combine_chunks()
        if len(rk) == 0:
            return lt.select(out_cols) if anti else lt.select(out_cols).slice(0, 0)
        hit = pc.is_in(lt.column(key), value_set=rk)
        keep = pc.invert(hit) if anti else hit
        return lt.filter(keep).select(out_cols)

    return bucketed_group_apply(lp.union(rp), key, filt,
                                num_buckets=num_buckets)


def broadcast_semi_anti(left, right_keys_ref, *, key: str, anti: bool = False,
                        batch_size: int = 8192):
    """Small-right fast path: ``right_keys_ref`` is a ``ray.put`` ObjectRef of
    a pyarrow Array (distinct right keys). One streaming pass over left."""
    from ..functions.rayutil import get_broadcast

    def filt(t: pa.Table) -> pa.Table:
        keys = get_broadcast(right_keys_ref)
        hit = pc.is_in(t.column(key), value_set=keys)
        return t.filter(pc.invert(hit) if anti else hit)

    return left.map_batches(filt, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)


def broadcast_inner_join(left, right_ref, *, key: str,
                         val_cols: list[str], batch_size: int = 8192):
    """Small-right inner equi-join: ``right_ref`` is a ``ray.put`` ObjectRef
    of a pyarrow Table with UNIQUE ``key`` values (a dimension table).

    One streaming pass over left, zero shuffles: per batch one
    ``pc.index_in`` against the broadcast key column + one ``take`` per value
    column (per-process cached via get_broadcast). Left rows with no match
    are dropped (inner semantics). This is the explicit operator form of the
    broadcast-dim-join pattern used throughout the engine (REL parity:
    REL:src/REL/db/generic.py batch lookups against the loaded store).
    """
    from ..functions.rayutil import get_broadcast

    def join(t: pa.Table) -> pa.Table:
        dim = get_broadcast(right_ref)
        idx = pc.index_in(t.column(key), value_set=dim.column(key))
        hit = pc.is_valid(idx)
        t = t.filter(hit)
        idx = idx.filter(hit)
        cols = {c: t.column(c) for c in t.column_names}
        for c in val_cols:
            cols[c] = dim.column(c).take(idx)
        return pa.table(cols)

    return left.map_batches(join, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)


def cogroup_inner_join(left, right, *, key: str, right_cols: list[str],
                       num_buckets: int = 256, how: str = "inner"):
    """Large-large equi-join with UNIQUE right keys (fact ⋈ keyed
    table at scale, when the right side is too big to broadcast).

    Both sides are projected to one tagged schema, unioned, and exchanged
    ONCE by ``key``; each bucket joins vectorized with a single
    ``pc.index_in`` of left keys against the bucket's right keys (uniqueness
    of right keys makes index_in a complete join — duplicate right keys
    would need the segment expansion of temporal.range_join instead; an
    assertion guards that contract).

    ``how="inner"`` drops left rows without a match; ``how="left"`` keeps
    them with nulls in ``right_cols`` (Arrow ``take`` propagates the null
    index straight through — the outer padding costs nothing extra).

    Output schema: all left columns + ``right_cols``.
    """
    assert how in ("inner", "left"), how
    l_schema = left.schema()
    left_cols = [f.name for f in l_schema.base_schema]
    assert key in left_cols, f"key {key!r} must be a left column"
    r_schema = right.schema()
    r_types = {f.name: f.type for f in r_schema.base_schema}
    out_cols = left_cols + right_cols

    def proj_left(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in left_cols}
        for c in right_cols:
            cols[c] = pa.nulls(t.num_rows, type=r_types[c])
        cols[_SIDE] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    l_types = {f.name: f.type for f in l_schema.base_schema}

    def proj_right(t: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            if c == key:
                cols[c] = pc.cast(t.column(key), l_types[key])
            else:
                cols[c] = pa.nulls(t.num_rows, type=l_types[c])
        for c in right_cols:
            cols[c] = t.column(c)
        cols[_SIDE] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    lp = left.map_batches(proj_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    rp = right.map_batches(proj_right, batch_format="pyarrow",
                           zero_copy_batch=True)

    def join(bucket: pa.Table) -> pa.Table:
        side = np.asarray(bucket.column(_SIDE))
        l_mask = side == 0
        lt = bucket.filter(pa.array(l_mask))
        rt = bucket.filter(pa.array(~l_mask))
        rk = rt.column(key)
        if isinstance(rk, pa.ChunkedArray):
            rk = rk.combine_chunks()
        if len(rk) != len(pc.unique(rk)):
            raise ValueError("cogroup_inner_join requires unique right keys")
        empty = pa.table({c: pa.array([], type=bucket.column(c).type)
                          for c in out_cols})
        if lt.num_rows == 0:
            return empty
        if len(rk) == 0:
            if how == "inner":
                return empty
            cols = {c: lt.column(c) for c in left_cols}
            for c in right_cols:
                cols[c] = pa.nulls(lt.num_rows, type=r_types[c])
            return pa.table(cols)
        idx = pc.index_in(lt.column(key), value_set=rk)
        if how == "inner":
            hit = pc.is_valid(idx)
            lt = lt.filter(hit)
            idx = idx.filter(hit)
        cols = {c: lt.column(c) for c in left_cols}
        for c in right_cols:
            cols[c] = rt.column(c).take(idx)
        return pa.table(cols)

    return bucketed_group_apply(lp.union(rp), key, join,
                                num_buckets=num_buckets)


def _base_schema(ds, override: pa.Schema | None) -> pa.Schema:
    """Dataset schema, tolerating the 0-row map_batches case where Ray
    never ran the UDF and reports None — callers with empty-capable
    inputs pass the schema explicitly."""
    if override is not None:
        return override
    s = ds.schema()
    if s is None:
        raise ValueError(
            "dataset schema unavailable (0-row map output); pass "
            "left_schema/right_schema explicitly")
    return s.base_schema


def cogroup_join_multi(left, right, *, key: str, left_cols: list[str],
                       right_cols: list[str], num_buckets: int = 256,
                       max_matches: int = 0, counters=None,
                       how: str = "inner",
                       left_schema: pa.Schema | None = None,
                       right_schema: pa.Schema | None = None):
    """General many-to-many equi-join (duplicate keys on BOTH sides).

    Same single tagged-union bucket exchange as cogroup_inner_join; each
    bucket is sorted by (key, side) so every key's left rows and right rows
    are adjacent, and the cross product per key is emitted with pure
    numpy repeat/tile index arithmetic over the whole bucket at once — no
    per-key Python. Output rows per key = n_left × n_right, the SQL INNER
    JOIN multiplicity.

    Skew guard: a hot key producing more than ``max_matches`` output rows
    per left row (0 = unlimited) keeps the ``max_matches`` right rows with
    the lowest sort position and COUNTS the drop via ``counters``
    (rayutil.DropCounter) — never a silent cap. At 100 TB a pathological
    key (empty string, null-ish sentinel) otherwise materializes a
    quadratic block; filter or salt upstream for real workloads.

    ``how`` extends the multiplicity to the outer variants: ``"left"`` /
    ``"right"`` / ``"full"`` additionally emit the unmatched rows of that
    side with nulls in the opposite payload. The tagged-union projection
    already gives every bucket row the full output schema with nulls on
    the absent side, so outer padding is a mask + filter over the bucket —
    no extra columns are built.

    Output schema: ``left_cols`` + key + ``right_cols`` (left_cols and
    right_cols must be disjoint and exclude the key).
    """
    from ..functions.rayutil import segment_starts, tagged_union

    assert how in ("inner", "left", "right", "full"), how

    l_schema = _base_schema(left, left_schema)
    r_schema = _base_schema(right, right_schema)
    l_types = {f.name: f.type for f in l_schema}
    r_types = {f.name: f.type for f in r_schema}
    payload = list(left_cols) + list(right_cols)
    out_cols = [key] + payload

    def proj(is_left: bool):
        def p(t: pa.Table) -> pa.Table:
            cols = {key: t.column(key)}
            for c in left_cols:
                cols[c] = (t.column(c) if is_left
                           else pa.nulls(t.num_rows, type=l_types[c]))
            for c in right_cols:
                cols[c] = (pa.nulls(t.num_rows, type=r_types[c]) if is_left
                           else t.column(c))
            cols[_SIDE] = pa.array(
                np.full(t.num_rows, 0 if is_left else 1, dtype=np.int8))
            return pa.table(cols)
        return p

    lp = left.map_batches(proj(True), batch_format="pyarrow",
                          zero_copy_batch=True)
    rp = right.map_batches(proj(False), batch_format="pyarrow",
                           zero_copy_batch=True)

    def join(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        empty = pa.table({c: pa.array([], type=bucket.column(c).type)
                          for c in out_cols})
        if n == 0:
            return empty
        side = np.asarray(bucket.column(_SIDE))
        starts = np.asarray(segment_starts(bucket.column(key)))
        ends = np.append(starts[1:], n)
        # within each key segment rows are sorted left-first (side 0 < 1):
        # first right position per segment via searchsorted on a global
        # monotone composite (segment index, side)
        seg_of = np.repeat(np.arange(len(starts)), ends - starts)
        comp = seg_of * 2 + side
        first_r = np.searchsorted(comp, np.arange(len(starts)) * 2 + 1,
                                  side="left")
        nl = first_r - starts
        nr = ends - first_r
        if max_matches:
            over = nr > max_matches
            if over.any():
                dropped = int(((nr[over] - max_matches) * nl[over]).sum())
                if dropped and counters is not None:
                    counters.add("join_multi_matches", dropped)
                nr = np.minimum(nr, max_matches)
        per_seg = nl * nr
        total = int(per_seg.sum())
        parts = []
        if total:
            # left index: for each segment repeat each left row nr times;
            # right index: tile the right block nl times
            seg_sel = np.repeat(np.arange(len(starts)), per_seg)
            offs = np.cumsum(per_seg) - per_seg
            pos = np.arange(total, dtype=np.int64) - offs[seg_sel]
            l_idx = starts[seg_sel] + pos // np.maximum(nr[seg_sel], 1)
            r_idx = first_r[seg_sel] + pos % np.maximum(nr[seg_sel], 1)
            la, ra = pa.array(l_idx), pa.array(r_idx)
            cols = {key: bucket.column(key).take(la)}
            for c in left_cols:
                cols[c] = bucket.column(c).take(la)
            for c in right_cols:
                cols[c] = bucket.column(c).take(ra)
            parts.append(pa.table(cols))
        if how in ("left", "full") and (nr == 0).any():
            lm = (side == 0) & (nr[seg_of] == 0)
            parts.append(bucket.filter(pa.array(lm)).select(out_cols))
        if how in ("right", "full") and (nl == 0).any():
            rm = (side == 1) & (nl[seg_of] == 0)
            parts.append(bucket.filter(pa.array(rm)).select(out_cols))
        if not parts:
            return empty
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    return bucketed_group_apply(lp.union(rp), key, join,
                                num_buckets=num_buckets,
                                sort_cols=[(_SIDE, "ascending")])


def bloom_semi_anti(left, right, *, key: str, anti: bool = False,
                    m_bits: int = 1 << 22, k: int = 7,
                    num_buckets: int = 256):
    """Bloom-prefiltered semi/anti join — EXACT result, reduced shuffle.

    The scale refinement of ``semi_anti_join``: first a distributed Bloom
    sketch of the right keys (mergeable OR-combiner, m/8 bytes broadcast
    total regardless of key count), then a streaming probe over left.
    Probe misses are TRUE negatives (a Bloom filter has no false
    negatives), so:

    * semi: only probe HITS (~matches + ~0.8% FPs) enter the exact
      bucketed semi join — the all-to-all exchange shrinks from |left|
      to roughly |semi result|.
    * anti: probe misses are emitted DIRECTLY with zero shuffle; only the
      hits (the small ambiguous set) go through the exact anti join.

    Same output contract as semi_anti_join (left schema, exact rows).
    Int keys probe on their bit pattern, strings on string_hash_u64 —
    both splitmix64-deterministic across runs and cluster sizes.
    """
    import ray as _ray

    from ..functions.rayutil import get_broadcast
    from ..stages.sketches import bloom_from_dataset, bloom_probe

    def _key_u64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from ..functions.shingles import string_hash_u64
            return string_hash_u64(col)
        arr = np.asarray(col)
        if arr.dtype.itemsize != 8:
            arr = arr.astype(np.int64)
        return arr.view(np.uint64)

    hashed_right = right.map_batches(
        lambda t: pa.table({"__h": pa.array(
            _key_u64(t.column(key)).view(np.int64), type=pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    bits = bloom_from_dataset(hashed_right, "__h", m_bits=m_bits, k=k)
    bits_ref = _ray.put(bits)

    def probe(want_hit: bool):
        def f(t: pa.Table) -> pa.Table:
            b = get_broadcast(bits_ref)
            hit = bloom_probe(b, _key_u64(t.column(key)), k=k)
            return t.filter(pa.array(hit if want_hit else ~hit))
        return f

    hits = left.map_batches(probe(True), batch_format="pyarrow",
                            zero_copy_batch=True)
    exact = semi_anti_join(hits, right, key=key, anti=anti,
                           num_buckets=num_buckets)
    if not anti:
        return exact
    misses = left.map_batches(probe(False), batch_format="pyarrow",
                              zero_copy_batch=True)
    return exact.union(misses)
