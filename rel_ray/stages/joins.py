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
