"""Temporal joins: as-of join, range (interval) join, rolling-window aggregate.

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
              right_tie: str | None = None, num_buckets: int = 256,
              direction: str = "backward"):
    """Inner as-of join: for every left row, the single right row with equal
    ``key`` and the greatest ``right_ts`` <= ``left_ts``; among equal
    timestamps the greatest ``right_tie`` wins (deterministic output).

    ``direction="forward"`` flips the time semantics to the SMALLEST
    ``right_ts`` >= ``left_ts`` (pandas merge_asof parity) — implemented
    by negating the internal int64 time axis, so the one-pass cumsum
    merge is reused verbatim; the equal-timestamp tie rule is unchanged.

    ``left_cols`` / ``right_cols`` name the payload columns to carry (key
    included in left_cols if wanted); they must not overlap."""
    assert direction in ("backward", "forward"), direction
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
                    tv = pc.cast(t.column(ts_col), pa.int64())
                    if direction == "forward":
                        tv = pc.multiply(tv, pa.scalar(-1, pa.int64()))
                    cols[c] = tv
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

# ---------------------------------------------------------------------------
# composite (key, time) encoding — shared by range_join / rolling_window_agg
# ---------------------------------------------------------------------------
#
# Within one bucket sorted by (key, t), pack (dense key code, time offset)
# into ONE uint64 so a single vectorized np.searchsorted answers per-row
# "first/last row of the same key within a time bound" — no per-key Python
# loop, no per-row bisect. Key codes are per-bucket-dense (segment ordinals
# over the sorted key column), so the bit budget scales with DISTINCT KEYS
# PER BUCKET, not global cardinality: raising num_buckets shrinks it.


def _dense_key_codes(key_col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Sorted key column → dense int64 codes (0..n_distinct-1 per bucket)."""
    from ..functions.rayutil import segment_starts

    n = len(key_col)
    starts = np.asarray(segment_starts(key_col), dtype=np.int64)
    codes = np.zeros(n, dtype=np.int64)
    codes[starts[1:]] = 1
    return np.cumsum(codes)


def _composite(codes: np.ndarray, toff: np.ndarray, t_bits: int) -> np.ndarray:
    return (codes.astype(np.uint64) << np.uint64(t_bits)) | toff.astype(np.uint64)


def _time_bits(max_off: int) -> int:
    return max(1, int(max_off + 2).bit_length())


def range_join(left, right, *, key: str, left_ts: str,
               right_start: str, right_end: str,
               left_cols: list[str], right_cols: list[str],
               num_buckets: int = 256, max_matches: int = 0,
               counter_name: str = "range_join_drops"):
    """Inner interval join: every (left, right) pair with equal ``key`` and
    ``right_start <= left_ts < right_end`` (end exclusive).

    Ray-Data-first: ONE bucket exchange on the key (tagged union, same
    pattern as asof_join), then per bucket a single searchsorted over the
    composite (key code, time) order finds each interval's [lo, hi) slice of
    left points — O(bucket log bucket), fully vectorized. Intervals are
    assumed BOUNDED (attribution windows, session windows): output per
    interval is hi-lo; ``max_matches`` caps it with a LOGGED drop counter
    (0 = unlimited).

    Scale: shuffle volume is |left|+|right| rows once; skewed hot keys land
    in one bucket (salt upstream if a key exceeds a block). Composite bit
    budget = log2(distinct keys per bucket) + log2(time span in input time
    units); raise ``num_buckets`` if a bucket ever overflows 64 bits.
    """
    from ..functions.rayutil import DropCounter

    l_schema, r_schema = left.schema(), right.schema()

    def _type_of(schema, name):
        return schema.base_schema.field(name).type

    l_payload = [c for c in left_cols if c != key]
    r_payload = [c for c in right_cols if c != key]
    assert not set(l_payload) & set(r_payload), "payload columns must not overlap"
    types = {key: _type_of(l_schema, key)}
    types |= {c: _type_of(l_schema, c) for c in l_payload}
    types |= {c: _type_of(r_schema, c) for c in r_payload}
    _END = "__t_end"
    ordered = [key, _T, _END, _SIDE, *l_payload, *r_payload]
    tag_schema = pa.schema(
        [pa.field(key, types[key]), pa.field(_T, pa.int64()),
         pa.field(_END, pa.int64()), pa.field(_SIDE, pa.int8())]
        + [pa.field(c, types[c]) for c in [*l_payload, *r_payload]])

    def _proj(is_left: bool):
        mine = set(l_payload if is_left else r_payload)
        side_val = 0 if is_left else 1

        def proj(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for c in ordered:
                if c == key:
                    cols[c] = t.column(key)
                elif c == _T:
                    src = left_ts if is_left else right_start
                    cols[c] = pc.cast(t.column(src), pa.int64())
                elif c == _END:
                    cols[c] = (pa.nulls(n, type=pa.int64()) if is_left
                               else pc.cast(t.column(right_end), pa.int64()))
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
    counter = DropCounter(counter_name) if max_matches else None

    def merge(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        empty = pa.table({c: pa.array([], type=types[c]) for c in out_cols})
        if n == 0:
            return empty
        side = np.asarray(bucket.column(_SIDE))
        t_all = np.asarray(bucket.column(_T))
        l_pos = np.nonzero(side == 0)[0]
        r_pos = np.nonzero(side == 1)[0]
        if len(l_pos) == 0 or len(r_pos) == 0:
            return empty
        ends = np.asarray(pc.fill_null(bucket.column(_END), 0))
        codes = _dense_key_codes(bucket.column(key))
        t0 = int(t_all.min())
        max_off = int(max(t_all.max(), ends[r_pos].max()) - t0)
        t_bits = _time_bits(max_off)
        if int(codes[-1]).bit_length() + t_bits > 63:
            raise ValueError(
                f"range_join composite overflow ({codes[-1]+1} keys x "
                f"{max_off} time span in one bucket) — raise num_buckets")
        l_comp = _composite(codes[l_pos], t_all[l_pos] - t0, t_bits)
        r_start_off = np.maximum(t_all[r_pos] - t0, 0)
        r_end_off = np.clip(ends[r_pos] - t0, 0, max_off + 1)
        lo = np.searchsorted(l_comp, _composite(codes[r_pos], r_start_off, t_bits),
                             side="left")
        hi = np.searchsorted(l_comp, _composite(codes[r_pos], r_end_off, t_bits),
                             side="left")
        cnt = hi - lo
        if max_matches:
            over = cnt - max_matches
            dropped = int(over[over > 0].sum())
            if dropped:
                counter.add("range_join_matches", dropped)
            cnt = np.minimum(cnt, max_matches)
        total = int(cnt.sum())
        if total == 0:
            return empty
        r_sel = np.repeat(np.arange(len(r_pos), dtype=np.int64), cnt)
        offs = np.cumsum(cnt) - cnt
        l_sel_local = (np.arange(total, dtype=np.int64) - np.repeat(offs, cnt)
                       + np.repeat(lo, cnt))
        la = pa.array(l_pos[l_sel_local], type=pa.int64())
        ra = pa.array(r_pos[r_sel], type=pa.int64())
        cols = {}
        for c in out_cols:
            src = la if (c == key or c in l_payload) else ra
            cols[c] = bucket.column(c).take(src)
        return pa.table(cols)

    merged = tagged_union(lp, rp, left_tag_schema=tag_schema,
                          right_tag_schema=tag_schema)
    return bucketed_group_apply(merged, key, merge, num_buckets=num_buckets,
                                sort_cols=[(_T, "ascending"),
                                           (_SIDE, "ascending")])


def rolling_window_agg(ds, *, key: str, ts: str, val_int: str,
                       window: int, carry_cols: list[str],
                       num_buckets: int = 256):
    """Per-key rolling aggregate over a trailing time window, SQL ``RANGE
    BETWEEN <window> PRECEDING AND CURRENT ROW`` semantics: for each row,
    count and integer-sum of all same-key rows with ``row.ts - window <=
    other.ts <= row.ts`` — equal timestamps are peers (all included), exactly
    as the SQL RANGE frame defines.

    ``val_int`` must be an int64 column (integer-exact house rule: round
    currency to cents upstream). One bucket exchange; per bucket two
    vectorized searchsorteds over the composite (key code, time) order plus
    one prefix-sum — O(bucket log bucket), no per-key callbacks.

    Output: carry_cols + (w_count:int64, w_sum:int64).
    """
    def agg(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        out_schema = {c: bucket.column(c).type for c in carry_cols}
        if n == 0:
            return pa.table(
                {**{c: pa.array([], type=out_schema[c]) for c in carry_cols},
                 "w_count": pa.array([], type=pa.int64()),
                 "w_sum": pa.array([], type=pa.int64())})
        t_all = np.asarray(pc.cast(bucket.column(ts), pa.int64()))
        codes = _dense_key_codes(bucket.column(key))
        t0 = int(t_all.min())
        toff = t_all - t0
        t_bits = _time_bits(int(toff.max()))
        if int(codes[-1]).bit_length() + t_bits > 63:
            raise ValueError("rolling_window_agg composite overflow — "
                             "raise num_buckets")
        comp = _composite(codes, toff, t_bits)
        lo = np.searchsorted(comp, _composite(codes, np.maximum(toff - window, 0),
                                              t_bits), side="left")
        hi = np.searchsorted(comp, comp, side="right")
        vals = np.asarray(bucket.column(val_int), dtype=np.int64)
        prefix = np.concatenate(([0], np.cumsum(vals)))
        cols = {c: bucket.column(c) for c in carry_cols}
        cols["w_count"] = pa.array(hi - lo)
        cols["w_sum"] = pa.array(prefix[hi] - prefix[lo])
        return pa.table(cols)

    return bucketed_group_apply(ds, key, agg, num_buckets=num_buckets,
                                sort_cols=[(ts, "ascending")])



def partitioned_window(ds, *, key: str, ts: str, tie: str, val_int: str,
                       carry_cols: list[str], num_buckets: int = 256,
                       rows_preceding: int | None = None):
    """Per-key ordered window functions in one pass: ``row_number``,
    ``lag(val)`` (0 at each partition's first row, i.e. SQL
    ``COALESCE(LAG(v), 0)``), and the running inclusive sum
    (``SUM(v) OVER (PARTITION BY key ORDER BY ts, tie ROWS UNBOUNDED
    PRECEDING)``). Ray Data has no window operator; this is the engine's:
    ONE bucket exchange on the partition key, then everything is numpy over
    the (key, ts, tie)-sorted bucket — segment offsets from one
    ``segment_starts`` call, row numbers by subtracting the repeated segment
    start, the running sum as a global cumsum minus the per-segment base,
    lag as a shift masked at segment firsts. No per-key callbacks, no
    Python loop.

    ``(ts, tie)`` must totally order rows within a key (pass a unique id as
    `tie`) or the result is nondeterministic — same contract SQL has.
    Output: carry_cols + (row_number:int64, lag_val:int64, run_sum:int64).

    ``rows_preceding=k`` adds ``mov_sum`` — the bounded ROWS frame
    ``SUM(v) OVER (... ROWS BETWEEN k PRECEDING AND CURRENT ROW)`` —
    computed from the same global cumsum: window start = max(i-k,
    segment start), so it is two numpy maxima on top of the unbounded
    sum, not a second pass. (The RANGE/time-based frame lives in
    ``rolling_window_agg``; this is its row-count twin.)
    """
    from ..functions.rayutil import segment_starts

    def win(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        out_types = {c: bucket.column(c).type for c in carry_cols}
        if n == 0:
            extra = ({"mov_sum": pa.array([], type=pa.int64())}
                     if rows_preceding is not None else {})
            return pa.table(
                {**{c: pa.array([], type=out_types[c]) for c in carry_cols},
                 "row_number": pa.array([], type=pa.int64()),
                 "lag_val": pa.array([], type=pa.int64()),
                 "run_sum": pa.array([], type=pa.int64()), **extra})
        starts = np.asarray(segment_starts(bucket.column(key)))
        lens = np.diff(np.append(starts, n))
        offs = np.repeat(starts, lens)
        rn = np.arange(n, dtype=np.int64) - offs + 1
        vals = np.asarray(bucket.column(val_int), dtype=np.int64)
        cum = np.cumsum(vals)
        base = np.where(offs > 0, cum[np.maximum(offs - 1, 0)], 0)
        run = cum - base
        lag = np.empty(n, dtype=np.int64)
        lag[0] = 0
        lag[1:] = vals[:-1]
        lag[starts] = 0
        cols = {c: bucket.column(c) for c in carry_cols}
        cols["row_number"] = pa.array(rn)
        cols["lag_val"] = pa.array(lag)
        cols["run_sum"] = pa.array(run)
        if rows_preceding is not None:
            w = np.maximum(np.arange(n, dtype=np.int64) - rows_preceding,
                           offs)
            cols["mov_sum"] = pa.array(
                cum - np.where(w > 0, cum[np.maximum(w - 1, 0)], 0))
        return pa.table(cols)

    return bucketed_group_apply(ds, key, win, num_buckets=num_buckets,
                                sort_cols=[(ts, "ascending"),
                                           (tie, "ascending")])


def sessionize(ds, *, key: str, ts: str, tie: str, val_int: str,
               gap: int, num_buckets: int = 256):
    """Gap-based sessionization: per key, a new session starts whenever the
    time since the previous event exceeds ``gap`` (ts units). Emits ONE ROW
    PER SESSION: (key, session_id — 0-based per key, session_start,
    session_end, n_events:int64, sum_val:int64).

    The whole operator is one bucket exchange plus numpy over the sorted
    bucket: break flags from one diff, session boundaries from nonzero,
    per-session aggregates from ``add.reduceat`` — never a per-session or
    per-key Python callback, so a key with millions of events costs
    O(events) vectorized work. Matches the standard SQL idiom
    (LAG → CASE gap → SUM OVER as session id → GROUP BY), which is the
    oracle (queries.SQL_SESSIONIZE_EVENTS).
    """
    from ..functions.rayutil import segment_starts

    def sess(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        kcol = bucket.column(key)
        if n == 0:
            return pa.table({
                key: pa.array([], type=kcol.type),
                "session_id": pa.array([], type=pa.int64()),
                "session_start": pa.array([], type=pa.int64()),
                "session_end": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "sum_val": pa.array([], type=pa.int64())})
        t = np.asarray(pc.cast(bucket.column(ts), pa.int64()))
        kstarts = np.asarray(segment_starts(kcol))
        new_key = np.zeros(n, dtype=bool)
        new_key[kstarts] = True
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (t[1:] - t[:-1]) > gap
        brk |= new_key
        s_starts = np.nonzero(brk)[0]
        s_lens = np.diff(np.append(s_starts, n))
        vals = np.asarray(bucket.column(val_int), dtype=np.int64)
        # 0-based session index within each key: session ordinal minus the
        # ordinal of the key's first session
        first_sess_of_key = np.searchsorted(s_starts, kstarts)
        sess_per_key = np.diff(np.append(first_sess_of_key, len(s_starts)))
        sid = (np.arange(len(s_starts), dtype=np.int64)
               - np.repeat(first_sess_of_key, sess_per_key))
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        return pa.table({
            key: kcol.take(pa.array(s_starts)),
            "session_id": pa.array(sid),
            "session_start": pa.array(t[s_starts]),
            "session_end": pa.array(t[s_starts + s_lens - 1]),
            "n_events": pa.array(s_lens.astype(np.int64)),
            "sum_val": pa.array(np.add.reduceat(vals, s_starts)),
        })

    return bucketed_group_apply(ds, key, sess, num_buckets=num_buckets,
                                sort_cols=[(ts, "ascending"),
                                           (tie, "ascending")])


def grouped_string_agg(ds, *, key: str, ts: str, tie: str, val: str,
                       sep: str = ",", num_buckets: int = 256):
    """Ordered grouped concatenation (SQL ``string_agg(val, sep ORDER BY
    ts, tie)``): one row per key with its values joined in event order.

    Same one-exchange ordered-bucket shape as partitioned_window; inside a
    bucket the per-key lists are built with ZERO Python per row — segment
    starts become ListArray offsets over the sorted value column, and
    ``pc.binary_join`` concatenates each list in C.

    The output row for a key is as wide as everything that key saw —
    same contract (and same skew exposure) as SQL string_agg; cap or
    bucket the values upstream if a key can exceed a block.
    """
    from ..functions.rayutil import segment_starts

    def agg(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        key_t = bucket.column(key).type
        if n == 0:
            return pa.table({key: pa.array([], type=key_t),
                             "agg": pa.array([], type=pa.string())})
        starts = np.asarray(segment_starts(bucket.column(key)))
        offsets = pa.array(np.append(starts, n).astype(np.int32))
        vals = bucket.column(val)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        lists = pa.ListArray.from_arrays(offsets, vals)
        kc = bucket.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        return pa.table({key: kc.take(pa.array(starts)),
                         "agg": pc.binary_join(lists, sep)})

    return bucketed_group_apply(ds, key, agg, num_buckets=num_buckets,
                                sort_cols=[(ts, "ascending"),
                                           (tie, "ascending")])


def grouped_rank(ds, *, key: str, val: str, tie: str, carry_cols: list[str],
                 tiles: int = 4, num_buckets: int = 256):
    """SQL ranking-window family in one pass: per ``key`` ordered by
    ``val``, emits ``rnk`` (RANK — ties share, gaps after),
    ``dense_rnk`` (no gaps), ``pct_rank`` (PERCENT_RANK =
    (rank-1)/(count-1), 0.0 for 1-row partitions) and ``tile``
    (NTILE(tiles) over the (val, tie) total order — SQL leaves tie order
    unspecified, so the tile assignment pins it with the unique tie).

    Same one-exchange ordered-bucket shape as partitioned_window; ranks
    come from value-run starts (one vectorized change-point pass), tiles
    from pure integer arithmetic on segment positions — SQL's exact
    "first (n % tiles) tiles get the extra row" rule.
    """
    from ..functions.rayutil import segment_starts

    def win(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        types = {c: bucket.column(c).type for c in carry_cols}
        if n == 0:
            return pa.table(
                {**{c: pa.array([], type=types[c]) for c in carry_cols},
                 "rnk": pa.array([], type=pa.int64()),
                 "dense_rnk": pa.array([], type=pa.int64()),
                 "pct_rank": pa.array([], type=pa.float64()),
                 "tile": pa.array([], type=pa.int64())})
        starts = np.asarray(segment_starts(bucket.column(key)))
        lens = np.diff(np.append(starts, n))
        offs = np.repeat(starts, lens)
        pos = np.arange(n, dtype=np.int64) - offs
        cnt = np.repeat(lens, lens)

        vals = bucket.column(val)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = np.asarray(vals)
        run_start = np.ones(n, dtype=bool)
        run_start[1:] = v[1:] != v[:-1]
        run_start[starts] = True
        run_pos = np.maximum.accumulate(np.where(run_start,
                                                 np.arange(n), 0))
        rnk = run_pos - offs + 1
        dense = np.cumsum(run_start)
        dense_rnk = dense - np.repeat(dense[starts], lens) + 1
        pct = np.where(cnt > 1, (rnk - 1) / np.maximum(cnt - 1, 1), 0.0)

        base, rem = cnt // tiles, cnt % tiles
        boundary = rem * (base + 1)
        small = np.maximum(base, 1)
        tile = np.where(pos < boundary, pos // np.maximum(base + 1, 1),
                        rem + (pos - boundary) // small) + 1

        cols = {c: bucket.column(c) for c in carry_cols}
        cols["rnk"] = pa.array(rnk.astype(np.int64))
        cols["dense_rnk"] = pa.array(dense_rnk.astype(np.int64))
        cols["pct_rank"] = pa.array(pct)
        cols["tile"] = pa.array(tile.astype(np.int64))
        return pa.table(cols)

    return bucketed_group_apply(ds, key, win, num_buckets=num_buckets,
                                sort_cols=[(val, "ascending"),
                                           (tie, "ascending")])


def interval_overlap_self(ds, *, key: str, id_col: str, start: str, end: str,
                          num_buckets: int = 256, max_matches: int = 0,
                          counter_name: str = "interval_overlap_drops"):
    """Interval-overlap SELF-join: every pair of rows with equal ``key``
    whose [start, end] intervals intersect (inclusive ends):
    ``s_a <= e_b AND s_b <= e_a``, each unordered pair once, id_a < id_b.

    Distinct from ``range_join`` (point-in-interval): both sides are
    intervals. One bucket exchange on the key; per bucket the rows arrive
    start-sorted, and every overlapping pair is found exactly once through
    its LATER-STARTING member: for row i, the overlapping rows j > i are
    precisely those with ``s_j <= e_i`` — one searchsorted over the
    composite (key code, start) order, O(bucket log bucket), vectorized
    repeat/arange expansion (same machinery as range_join).

    Intervals are assumed BOUNDED (session/attribution windows): output per
    row is its forward-overlap degree; ``max_matches`` caps a hot row with
    a LOGGED drop counter (0 = unlimited). Skewed hot keys land in one
    bucket — salt upstream if a key exceeds a block.
    """
    from ..functions.rayutil import DropCounter, bucketed_group_apply

    counter = DropCounter(counter_name) if max_matches else None
    out_cols = [key, "id_a", "id_b"]

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t.column(key),
            "rid": pc.cast(t.column(id_col), pa.int64()),
            _T: pc.cast(t.column(start), pa.int64()),
            "__e": pc.cast(t.column(end), pa.int64())})

    p = ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
    key_type = ds.schema().base_schema.field(key).type

    def sweep(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        empty = pa.table({key: pa.array([], type=key_type),
                          "id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64())})
        if n < 2:
            return empty
        s = np.asarray(bucket.column(_T), dtype=np.int64)
        e = np.asarray(bucket.column("__e"), dtype=np.int64)
        rid = np.asarray(bucket.column("rid"), dtype=np.int64)
        codes = _dense_key_codes(bucket.column(key))
        t0 = int(s.min())
        max_off = int(max(s.max(), e.max()) - t0)
        t_bits = _time_bits(max_off)
        if int(codes[-1]).bit_length() + t_bits > 63:
            raise ValueError(
                f"interval_overlap composite overflow ({codes[-1]+1} keys x "
                f"{max_off} time span in one bucket) — raise num_buckets")
        comp = _composite(codes, s - t0, t_bits)
        e_off = np.clip(e - t0, 0, max_off)
        hi = np.searchsorted(comp, _composite(codes, e_off, t_bits),
                             side="right")
        idx = np.arange(n, dtype=np.int64)
        cnt = hi - idx - 1  # j in (i, hi): s_j <= e_i within the same key
        if max_matches:
            over = cnt - max_matches
            dropped = int(over[over > 0].sum())
            if dropped:
                counter.add("interval_overlap_matches", dropped)
            cnt = np.minimum(cnt, max_matches)
        total = int(cnt.sum())
        if total == 0:
            return empty
        a_sel = np.repeat(idx, cnt)
        offs = np.cumsum(cnt) - cnt
        b_sel = (np.arange(total, dtype=np.int64) - np.repeat(offs, cnt)
                 + a_sel + 1)
        ia, ib = rid[a_sel], rid[b_sel]
        return pa.table({
            key: bucket.column(key).take(pa.array(a_sel)),
            "id_a": pa.array(np.minimum(ia, ib)),
            "id_b": pa.array(np.maximum(ia, ib))})

    return bucketed_group_apply(p, key, sweep, num_buckets=num_buckets,
                                sort_cols=[(_T, "ascending"),
                                           ("rid", "ascending")])


def grouped_collect_set(ds, *, key: str, val: str, sep: str = "|",
                        num_buckets: int = 256, out_col: str = "vals"):
    """Grouped sorted-DISTINCT collection (SQL ``string_agg(DISTINCT val,
    sep ORDER BY val)``): one row per key with its distinct values joined
    in sorted order — the entity-resolution alias-list aggregate (all
    distinct surface forms per cluster) and the label-vocabulary reporter.

    One skinny (key, val) bucketed exchange; inside a bucket the sort
    does the ordering, a shifted-comparison mask does the dedup, and
    ListArray offsets + ``pc.binary_join`` build every key's string with
    zero Python per row. Output width follows the key's distinct-value
    count — same contract (and skew exposure) as SQL string_agg; cap or
    bucket upstream if a key's vocabulary can exceed a block."""
    from ..functions.rayutil import bucketed_group_apply, segment_starts

    def pre(t: pa.Table) -> pa.Table:
        # NULL values are ignored, matching SQL string_agg
        return t.select([key, val]).filter(pc.is_valid(t.column(val)))

    skinny = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)

    def agg(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        key_t = bucket.schema.field(key).type
        if n == 0:
            return pa.table({key: pa.array([], type=key_t),
                             out_col: pa.array([], type=pa.string())})
        kc = bucket.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        vc = bucket.column(val)
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        # bucket-sorted by (key, val): a row is a duplicate iff BOTH equal
        # the previous row's
        starts = np.asarray(segment_starts(kc))
        first_of_seg = np.zeros(n, dtype=bool)
        first_of_seg[starts] = True
        same_val = np.zeros(n, dtype=bool)
        same_val[1:] = np.asarray(
            pc.equal(vc.slice(1), vc.slice(0, n - 1)).fill_null(False))
        keep = first_of_seg | ~same_val
        dedup = bucket.filter(pa.array(keep))
        m = dedup.num_rows
        dstarts = np.asarray(segment_starts(dedup.column(key)))
        offsets = pa.array(np.append(dstarts, m).astype(np.int32))
        dvc = dedup.column(val)
        if isinstance(dvc, pa.ChunkedArray):
            dvc = dvc.combine_chunks()
        lists = pa.ListArray.from_arrays(offsets, pc.cast(dvc, pa.string()))
        dkc = dedup.column(key)
        if isinstance(dkc, pa.ChunkedArray):
            dkc = dkc.combine_chunks()
        return pa.table({key: dkc.take(pa.array(dstarts)),
                         out_col: pc.binary_join(lists, sep)})

    return bucketed_group_apply(skinny, key, agg, num_buckets=num_buckets,
                                sort_cols=[(val, "ascending")])


def forward_fill(ds, *, key: str, order_cols: list[str], val: str,
                 out_col: str = "filled", num_buckets: int = 64):
    """Per-key forward fill (LOCF — last observation carried forward):
    within each ``key`` group ordered by ``order_cols``, every null in
    ``val`` takes the most recent non-null value; rows before the first
    observation stay null. The time-series resample/gap-fill primitive —
    SQL's ``last_value(x IGNORE NULLS) OVER (PARTITION BY ... ORDER BY
    ... ROWS UNBOUNDED PRECEDING)``.

    Scale shape: ONE bucket exchange (rayutil.bucketed_group_apply hashes
    on ``key``; a key's rows land in one bucket call, sorted). Fill is
    vectorized: last-valid-index via np.maximum.accumulate, with a
    per-segment barrier (an index from the previous key segment is masked
    off by comparing against the row's own segment start) — no per-row
    Python. Output = input columns + ``out_col``."""
    from ..functions.rayutil import segment_starts

    def fill(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        vc = bucket.column(val)
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        if n == 0:
            return bucket.append_column(out_col, vc)
        valid = np.asarray(pc.is_valid(vc))
        pos = np.arange(n, dtype=np.int64)
        last_valid = np.maximum.accumulate(np.where(valid, pos, -1))
        starts = np.asarray(segment_starts(bucket.column(key)))
        lens = np.diff(np.append(starts, n))
        seg_start = np.repeat(starts, lens)
        has_obs = last_valid >= seg_start
        take_idx = pa.array(np.where(has_obs, last_valid, 0),
                            type=pa.int64())
        filled = vc.take(take_idx)
        if not has_obs.all():
            filled = pc.if_else(pa.array(has_obs), filled,
                                pa.nulls(n, type=vc.type))
        return bucket.append_column(out_col, filled)

    return bucketed_group_apply(
        ds, key, fill, num_buckets=num_buckets,
        sort_cols=[(c, "ascending") for c in order_cols])


def cumulative_distinct(ds, *, key: str, order_cols: list[str], val: str,
                        out_col: str = "distinct_so_far",
                        num_buckets: int = 64):
    """Running count of DISTINCT ``val`` per ``key`` in ``order_cols``
    order — the vocabulary-growth / novelty curve (SQL needs a
    first-occurrence flag + running sum; COUNT(DISTINCT) OVER is not a
    thing). One bucket exchange; the first-occurrence flag is vectorized
    (np.unique return_index over the time-ordered bucket — unique returns
    the FIRST hit in array order) and the running count is one cumsum
    with per-segment rebasing."""
    from ..functions.rayutil import segment_starts

    def run(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return bucket.append_column(
                out_col, pa.array([], type=pa.int64()))
        kc = bucket.column(key)
        vc = bucket.column(val)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        # composite (key, val) dictionary codes: first occurrence in the
        # time-ordered bucket = first time this key sees this value
        kcode = np.asarray(pc.dictionary_encode(kc).indices,
                           dtype=np.int64)
        vcode = np.asarray(pc.dictionary_encode(vc).indices,
                           dtype=np.int64)
        comp = kcode * (vcode.max() + 1) + vcode
        first_idx = np.unique(comp, return_index=True)[1]
        flag = np.zeros(n, dtype=np.int64)
        flag[first_idx] = 1
        cum = np.cumsum(flag)
        starts = np.asarray(segment_starts(bucket.column(key)))
        lens = np.diff(np.append(starts, n))
        base = np.repeat(cum[starts] - flag[starts], lens)
        return bucket.append_column(out_col, pa.array(cum - base))

    return bucketed_group_apply(
        ds, key, run, num_buckets=num_buckets,
        sort_cols=[(c, "ascending") for c in order_cols])


def longest_streak(ds, *, key: str, ts: str, unit_us: int = 86_400_000_000,
                   num_buckets: int = 64):
    """Longest run of CONSECUTIVE active periods per key (default unit =
    day) — the gaps-and-islands classic (SQL: day − row_number() islands
    + GROUP BY + MAX). Engagement/continuity diagnostic over resolved
    identities.

    One bucket exchange on ``key`` sorted by period; per bucket the whole
    computation is numpy: distinct periods per segment via shifted
    compare, island breaks where the period step ≠ 1 OR the key changes,
    run lengths via break-indexed diff, per-key max via maximum.reduceat.
    Returns Dataset (``key``, max_streak:int64, active_periods:int64)."""
    from ..functions.rayutil import segment_starts

    def per_bucket(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        kc = bucket.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        if n == 0:
            return pa.table({key: kc,
                             "max_streak": pa.array([], type=pa.int64()),
                             "active_periods": pa.array([],
                                                        type=pa.int64())})
        period = np.asarray(
            pc.cast(bucket.column(ts), pa.int64())) // unit_us
        starts = np.asarray(segment_starts(bucket.column(key)))
        seg_first = np.zeros(n, dtype=bool)
        seg_first[starts] = True
        # distinct periods: drop rows equal to their predecessor within a
        # segment (bucket is (key, ts)-sorted, so equal periods adjoin)
        same = np.zeros(n, dtype=bool)
        same[1:] = period[1:] == period[:-1]
        keep = seg_first | ~same
        period = period[keep]
        seg_first = seg_first[keep]
        m = len(period)
        # island break = new key OR period gap != 1
        brk = np.ones(m, dtype=bool)
        brk[1:] = seg_first[1:] | (period[1:] != period[:-1] + 1)
        run_starts = np.flatnonzero(brk)
        run_lens = np.diff(np.append(run_starts, m))
        # per-key max over that key's runs
        key_starts_kept = np.flatnonzero(seg_first)
        # map each run to its key segment: runs are ordered, key segments
        # are ordered; a run belongs to the key whose start is the last
        # key_start <= run_start
        run_key = np.searchsorted(key_starts_kept, run_starts,
                                  side="right") - 1
        key_break = np.flatnonzero(
            np.concatenate(([True], run_key[1:] != run_key[:-1])))
        max_per_key = np.maximum.reduceat(run_lens, key_break)
        active = np.bincount(run_key, weights=run_lens,
                             minlength=len(key_starts_kept)).astype(
            np.int64)
        kc_kept = kc.filter(pa.array(keep))
        return pa.table({
            key: kc_kept.take(pa.array(key_starts_kept)),
            "max_streak": pa.array(max_per_key.astype(np.int64)),
            "active_periods": pa.array(active)})

    return bucketed_group_apply(
        ds, key, per_bucket, num_buckets=num_buckets,
        sort_cols=[(ts, "ascending")])


def scd2_intervals(ds, *, key: str, ts: str, tie: str, val: str,
                   num_buckets: int = 64):
    """Slowly-changing-dimension Type-2 interval build: collapse a change
    log into (key, value, valid_from, valid_to) validity intervals —
    keep rows where the value differs from the key's previous row (in
    (ts, tie) order), each interval closing at the NEXT change's
    timestamp (open/NULL for the current value). The warehouse-standard
    history table an as-of join consumes.

    One bucket exchange; change detection and interval closing are both
    shifted-compare numpy over the sorted bucket."""
    from ..functions.rayutil import segment_starts

    def per_bucket(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        vc = bucket.column(val)
        tc = bucket.column(ts)
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        if isinstance(tc, pa.ChunkedArray):
            tc = tc.combine_chunks()
        if n == 0:
            return pa.table({key: bucket.column(key), val: vc,
                             "valid_from": tc, "valid_to": tc})
        starts = np.asarray(segment_starts(bucket.column(key)))
        seg_first = np.zeros(n, dtype=bool)
        seg_first[starts] = True
        same = np.zeros(n, dtype=bool)
        same[1:] = np.asarray(
            pc.equal(vc.slice(1), vc.slice(0, n - 1)).fill_null(False))
        keep = seg_first | ~same
        ch = bucket.filter(pa.array(keep))
        m = ch.num_rows
        ctc = ch.column(ts)
        if isinstance(ctc, pa.ChunkedArray):
            ctc = ctc.combine_chunks()
        cstarts = np.asarray(segment_starts(ch.column(key)))
        # valid_to = next change's ts within the key, NULL on the last
        nxt = np.arange(1, m + 1, dtype=np.int64)
        is_last = np.zeros(m, dtype=bool)
        is_last[np.append(cstarts[1:] - 1, m - 1)] = True
        nxt[is_last] = 0  # placeholder index; masked below
        valid_to = ctc.take(pa.array(np.minimum(nxt, m - 1)))
        valid_to = pc.if_else(pa.array(is_last),
                              pa.nulls(m, type=ctc.type), valid_to)
        cvc = ch.column(val)
        if isinstance(cvc, pa.ChunkedArray):
            cvc = cvc.combine_chunks()
        return pa.table({key: ch.column(key), val: cvc,
                         "valid_from": ctc, "valid_to": valid_to})

    return bucketed_group_apply(
        ds, key, per_bucket, num_buckets=num_buckets,
        sort_cols=[(ts, "ascending"), (tie, "ascending")])


def time_weighted_avg(ds, *, key: str, ts: str, tie: str, val: str,
                      num_buckets: int = 64,
                      out_col: str = "twa_e6") -> "object":
    """Time-weighted average per key — the metering/billing semantics:
    each observation's value HOLDS until the next one, so
    TWA = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first) (keys with a zero span
    are dropped, the SQL HAVING). INTEGER-EXACT: values are integer
    units, timestamps integer µs, and the per-interval products fold
    with masked reduceat; out_col = trunc(num·1e6 / span) (µ-units).
    Overflow guard: max|v|·span must fit int64 — raises loudly past it.
    One bucket exchange."""
    from ..functions.rayutil import segment_starts

    def per_bucket(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        kc = bucket.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        if n == 0:
            return pa.table({key: kc,
                             out_col: pa.array([], type=pa.int64())})
        t = np.asarray(pc.cast(bucket.column(ts), pa.int64()))
        v = np.asarray(bucket.column(val), dtype=np.int64)
        starts = np.asarray(segment_starts(bucket.column(key)))
        lens = np.diff(np.append(starts, n))
        ends = starts + lens - 1
        span = t[ends] - t[starts]
        if len(v) and (np.abs(v).max(initial=0)
                       * max(int(span.max(initial=0)), 1)) >= 2**62:
            raise ValueError(
                "time_weighted_avg: value x span exceeds the int64 "
                "product bound — rescale the value or shard the span")
        dt = np.zeros(n, dtype=np.int64)
        dt[:-1] = t[1:] - t[:-1]
        dt[ends] = 0  # no interval past a key's last observation
        prod = v * dt
        num = np.add.reduceat(prod, starts)
        keep = span > 0
        nk, sk = num[keep], span[keep]
        # truncation toward zero (DuckDB integer-division semantics):
        # numpy // floors, which diverges on negative numerators, so
        # divide |num| and restore the sign — the assortativity idiom
        sgn = np.where(nk < 0, -1, 1)
        an = np.abs(nk)
        if len(sk) and int(sk.max()) < 2**63 // 10**6:
            # exact two-step division, no 128-bit needed:
            # (q*span + r)*1e6/span = q*1e6 + r*1e6//span, r < span
            q, r = an // sk, an % sk
            twa = sgn * (q * 10**6 + (r * 10**6) // sk)
        else:  # spans past ~292 years of µs: arbitrary-precision per key
            twa = np.array([s_ * (int(a) * 10**6 // int(b))
                            for s_, a, b in zip(sgn, an, sk)],
                           dtype=np.int64)
        return pa.table({
            key: kc.take(pa.array(starts[keep])),
            out_col: pa.array(twa)})

    return bucketed_group_apply(
        ds, key, per_bucket, num_buckets=num_buckets,
        sort_cols=[(ts, "ascending"), (tie, "ascending")])
