"""Temporal joins: distributed as-of join (latest right row at-or-before).

REL parity anchor: REL keys every lookup to the *state of the store at
processing time* (REL:src/REL/db/generic.py lookups against a fixed
snapshot); the as-of join is the batch generalization — each left record is
joined to the most recent right record that existed at its timestamp.

Ray-Data-first design: no Dataset.join (see rayutil.py for why), no per-key
map_groups. Both sides are projected to a shared tagged schema, unioned,
hash-bucketed by key (ONE all-to-all exchange), and each bucket is merged
vectorized: after the in-bucket sort by (key, t, side, tie) a single
``cumsum(side == right) - 1`` gives, for every left row, the ordinal of the
last right row at-or-before it — the entire as-of semantics in one numpy
expression. Key-boundary crossings are rejected by one vectorized key
equality check. O(bucket) work, no Python loop over rows or keys.

Scale: the only shuffle is the bucket exchange on the join key; skew on a
hot key lands that key's rows in one bucket — same exposure as any hash
join; salt upstream if a key exceeds a block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rayutil import bucketed_group_apply, tagged_union

_T = "__t"
_SIDE = "__side"


def asof_join(left, right, *, key: str, left_ts: str, right_ts: str,
              left_cols: list[str], right_cols: list[str],
              right_tie: str | None = None, num_buckets: int = 256):
    """Inner as-of join: for every left row, the single right row with equal
    ``key`` and the greatest ``right_ts`` <= ``left_ts``; among equal
    timestamps the greatest ``right_tie`` wins (deterministic output).

    ``left_cols`` / ``right_cols`` name the payload columns to carry (key
    included in left_cols if wanted); they must not overlap."""
    l_schema = left.schema()
    r_schema = right.schema()

    def _type_of(schema, name):
        return schema.base_schema.field(name).type

    l_payload = [c for c in left_cols if c != key]
    r_payload = [c for c in right_cols if c != key]
    assert not set(l_payload) & set(r_payload), "payload columns must not overlap"
    types = {key: _type_of(l_schema, key)}
    types |= {c: _type_of(l_schema, c) for c in l_payload}
    types |= {c: _type_of(r_schema, c) for c in r_payload}
    # one canonical column order for BOTH sides (union needs equal schemas)
    ordered = [key, _T, _SIDE, *l_payload, *r_payload]
    tag_schema = pa.schema(
        [pa.field(key, types[key]), pa.field(_T, pa.int64()),
         pa.field(_SIDE, pa.int8())]
        + [pa.field(c, types[c]) for c in [*l_payload, *r_payload]])

    def _proj(is_left: bool):
        mine = set(l_payload if is_left else r_payload)
        ts_col = left_ts if is_left else right_ts
        side_val = 1 if is_left else 0

        def proj(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for c in ordered:
                if c == key:
                    cols[c] = t.column(key)
                elif c == _T:
                    cols[c] = pc.cast(t.column(ts_col), pa.int64())
                elif c == _SIDE:
                    cols[c] = pa.array(np.full(n, side_val, dtype=np.int8))
                elif c in mine:
                    cols[c] = t.column(c)
                else:
                    cols[c] = pa.nulls(n, type=types[c])
            return pa.table(cols)

        return proj

    lp = left.map_batches(_proj(True), batch_format="pyarrow",
                          zero_copy_batch=True)
    rp = right.map_batches(_proj(False), batch_format="pyarrow",
                           zero_copy_batch=True)
    out_cols = [key, *l_payload, *r_payload]

    sort_cols = [(_T, "ascending"), (_SIDE, "ascending")]
    if right_tie:
        sort_cols.append((right_tie, "ascending"))

    def merge(bucket: pa.Table) -> pa.Table:
        is_r = np.asarray(bucket.column(_SIDE)) == 0
        # ordinal of the last right row at-or-before each position (-1: none)
        last_r = np.cumsum(is_r) - 1
        l_pos = np.nonzero(~is_r)[0]
        r_pos = np.nonzero(is_r)[0]
        m = last_r[l_pos] if len(l_pos) else np.empty(0, dtype=np.int64)
        valid = m >= 0
        lsel = l_pos[valid]
        rsel = r_pos[m[valid]] if len(r_pos) else np.empty(0, dtype=np.int64)
        if len(lsel):
            keys = bucket.column(key)
            eq = np.asarray(pc.equal(keys.take(pa.array(lsel)),
                                     keys.take(pa.array(rsel))),
                            dtype=bool)
            lsel, rsel = lsel[eq], rsel[eq]
        la, ra = pa.array(lsel, type=pa.int64()), pa.array(rsel, type=pa.int64())
        cols = {}
        for c in out_cols:
            src = la if (c == key or c in l_payload) else ra
            cols[c] = bucket.column(c).take(src)
        return pa.table(cols)

    merged = tagged_union(lp, rp, left_tag_schema=tag_schema,
                          right_tag_schema=tag_schema)
    return bucketed_group_apply(merged, key, merge, num_buckets=num_buckets,
                                sort_cols=sort_cols)
