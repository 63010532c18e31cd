"""Behavioral / sequence analytics over event streams: funnel completion,
cohort retention, Markov transition counts, and the 2-D skyline (Pareto
frontier).

REL parity anchor: REL's conversational pipeline orders turns per
conversation before mention detection (REL:src/REL/mention_detection.py
processes documents as ordered spans); these operators are the same
partition-by-key / order-by-time shape applied to the analytics a
transcript corpus needs downstream of linkage (per-user journeys over the
resolved identities).

Engine doctrine: every operator is ONE bucket exchange on the partition
key (``bucketed_group_apply``) followed by pure numpy over the sorted
bucket — no per-key Python callbacks — and a SKINNY second groupby over
pre-folded partials (rows bounded by vocabulary, not data). The skyline
has no key at all: a per-batch local frontier pass shrinks the data to
frontier candidates, then one single-block pass finishes exactly
(frontier composition: the global skyline is a subset of the union of
block skylines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rayutil import bucketed_group_apply, segment_starts


def funnel_counts(ds, steps: list[str], *, key: str, ts: str,
                  type_col: str, num_buckets: int = 256,
                  window: int | None = None):
    """Ordered funnel: how many distinct keys (users) reached each step.

    Semantics (the SQL-chained-CTE definition, ties allowed): per key,
    ``t_1`` = min ts of an event of type ``steps[0]``; ``t_i`` = min ts of
    a ``steps[i]`` event with ``ts >= t_{i-1}`` (and, when ``window`` is
    set, ``ts <= t_{i-1} + window`` — the CONVERSION-WINDOW variant: each
    transition must land within ``window`` ts-units of the previous step;
    step 1 is never window-constrained). A key "reaches" step i if
    ``t_i`` exists. Output: one row per step —
    (step_idx:int64 1-based, step_name:string, users:int64), every step
    present even at 0.

    Per bucket the chain is a LOOP OVER STEPS (len(steps) ~ 3-5), each
    iteration one masked ``minimum.reduceat`` over the key segments —
    O(steps × bucket) vectorized, never per-key Python.
    """
    from ray.data.aggregate import Sum

    step_names = list(steps)
    k = len(step_names)
    inf = np.iinfo(np.int64).max

    def partial(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            counts = np.zeros(k, dtype=np.int64)
        else:
            t = np.asarray(pc.cast(bucket.column(ts), pa.int64()))
            types = bucket.column(type_col)
            starts = np.asarray(segment_starts(bucket.column(key)))
            lens = np.diff(np.append(starts, n))
            prev = np.full(len(starts), np.iinfo(np.int64).min,
                           dtype=np.int64)  # t_0 = -inf: step 1 unconstrained
            counts = np.empty(k, dtype=np.int64)
            for i, s in enumerate(step_names):
                mask = np.asarray(pc.equal(types, pa.scalar(s)))
                prevr = np.repeat(prev, lens)
                ok = mask & (t >= prevr)
                if window is not None and i > 0:
                    # prevr == +inf (unreached) is already excluded by
                    # t >= prevr, so the subtraction cannot overflow here
                    ok &= (t - prevr) <= window
                cand = np.where(ok, t, inf)
                step_min = np.minimum.reduceat(cand, starts)
                counts[i] = int(np.count_nonzero(step_min != inf))
                prev = step_min  # unreached keys carry +inf: later steps stay unreached
        return pa.table({
            "step_idx": pa.array(np.arange(1, k + 1, dtype=np.int64)),
            "step_name": pa.array(step_names, type=pa.string()),
            "users": pa.array(counts),
        })

    partials = bucketed_group_apply(ds, key, partial,
                                    num_buckets=num_buckets,
                                    sort_cols=[(ts, "ascending")])
    out = partials.groupby(["step_idx", "step_name"]).aggregate(
        Sum("users", alias_name="users"))
    return out.sort("step_idx")


def cohort_retention(ds, *, key: str, ts: str, period_us: int,
                     num_buckets: int = 256):
    """Cohort retention triangle: cohort = the key's first activity period
    (``floor(min ts / period)``), one output row per (cohort, offset) with
    the count of distinct keys active in period ``cohort + offset``.

    Output: (cohort_period:int64, period_offset:int64, users:int64).
    One bucket exchange; distinct (key, period) pairs fall out of the
    time-sorted segments with one diff — no hash sets. The second groupby
    sums per-bucket partial counts (rows ≤ cohorts × offsets per bucket).
    """
    from ray.data.aggregate import Sum

    def partial(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({
                "cohort_period": pa.array([], type=pa.int64()),
                "period_offset": pa.array([], type=pa.int64()),
                "users": pa.array([], type=pa.int64())})
        t = np.asarray(pc.cast(bucket.column(ts), pa.int64()))
        p = t // period_us
        starts = np.asarray(segment_starts(bucket.column(key)))
        lens = np.diff(np.append(starts, n))
        is_start = np.zeros(n, dtype=bool)
        is_start[starts] = True
        # ts-sorted within key -> p nondecreasing within key: distinct
        # (key, period) rows are segment firsts or period changes
        keep = is_start.copy()
        keep[1:] |= p[1:] != p[:-1]
        cohort = np.repeat(p[starts], lens)
        cp = cohort[keep]
        off = p[keep] - cp  # >= 0: ts-sorted within key, cohort = first p
        # pre-fold within the bucket: count keys per (cohort, offset)
        base = int(off.max()) + 1  # n > 0 -> keep has >= 1 segment start
        uniq, cnt = np.unique(cp * base + off, return_counts=True)
        return pa.table({
            "cohort_period": pa.array(uniq // base),
            "period_offset": pa.array(uniq % base),
            "users": pa.array(cnt.astype(np.int64))})

    partials = bucketed_group_apply(ds, key, partial,
                                    num_buckets=num_buckets,
                                    sort_cols=[(ts, "ascending")])
    out = partials.groupby(["cohort_period", "period_offset"]).aggregate(
        Sum("users", alias_name="users"))
    return out.sort(["cohort_period", "period_offset"])


def transition_counts(ds, *, key: str, ts: str, tie: str, type_col: str,
                      num_buckets: int = 256):
    """First-order Markov transition counts + within-source share: per key
    ordered by (ts, tie), every consecutive (type_i → type_{i+1}) pair
    counts once. Output: (from_type, to_type, cnt:int64, share:double)
    where share = cnt / Σ cnt over the same from_type (the empirical
    transition probability).

    One bucket exchange on the key; pairs pre-folded per bucket through a
    dictionary-encode + np.unique (exchange rows bounded by vocab², not
    events). The share needs from-type totals — vocab²-sized, so it is one
    more SKINNY bucket pass on from_type, not a broadcast.
    """
    from ray.data.aggregate import Sum

    def partial(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        empty = pa.table({"from_type": pa.array([], type=pa.string()),
                          "to_type": pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64())})
        if n < 2:
            return empty
        types = bucket.column(type_col)
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        enc = pc.dictionary_encode(types)
        codes = np.asarray(enc.indices, dtype=np.int64)
        vocab = enc.dictionary
        v = len(vocab)
        starts = np.asarray(segment_starts(bucket.column(key)))
        valid = np.ones(n - 1, dtype=bool)
        valid[starts[starts > 0] - 1] = False  # no pair across key boundary
        frm = codes[:-1][valid]
        to = codes[1:][valid]
        if len(frm) == 0:
            return empty
        uniq, cnt = np.unique(frm * v + to, return_counts=True)
        return pa.table({
            "from_type": vocab.take(pa.array(uniq // v)),
            "to_type": vocab.take(pa.array(uniq % v)),
            "cnt": pa.array(cnt.astype(np.int64))})

    partials = bucketed_group_apply(ds, key, partial,
                                    num_buckets=num_buckets,
                                    sort_cols=[(ts, "ascending"),
                                               (tie, "ascending")])
    counts = partials.groupby(["from_type", "to_type"]).aggregate(
        Sum("cnt", alias_name="cnt"))

    def add_share(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({"from_type": pa.array([], type=pa.string()),
                             "to_type": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64()),
                             "share": pa.array([], type=pa.float64())})
        starts = np.asarray(segment_starts(bucket.column("from_type")))
        lens = np.diff(np.append(starts, n))
        c = np.asarray(bucket.column("cnt"), dtype=np.int64)
        totals = np.add.reduceat(c, starts)
        share = c / np.repeat(totals, lens)
        return pa.table({"from_type": bucket.column("from_type"),
                         "to_type": bucket.column("to_type"),
                         "cnt": bucket.column("cnt"),
                         "share": pa.array(share)})

    out = bucketed_group_apply(counts, "from_type", add_share,
                               num_buckets=min(num_buckets, 64),
                               sort_cols=[("to_type", "ascending")])
    return out.sort(["from_type", "to_type"])


def _skyline_kernel(t: pa.Table, x: str, y: str) -> pa.Table:
    """Exact 2-D maximal points of one table (both dims MAXIMIZED; a point
    is kept iff no other point is >= in both dims and > in at least one;
    duplicate (x,y) points are mutually non-dominating and all kept).

    Vectorized: sort (x desc, y desc); per distinct-x group the only
    candidates are its max-y rows; a group survives iff its max-y strictly
    exceeds the running max-y of all strictly-greater x seen before it.
    """
    n = t.num_rows
    if n == 0:
        return t
    idx = pc.sort_indices(t, sort_keys=[(x, "descending"),
                                        (y, "descending")])
    s = t.take(idx)
    xs = np.asarray(s.column(x))
    ys = np.asarray(s.column(y))
    starts = np.flatnonzero(np.concatenate(([True], xs[1:] != xs[:-1])))
    gmax = ys[starts]  # max y per x-group (y desc within group)
    group_keep = np.concatenate(
        ([True], gmax[1:] > np.maximum.accumulate(gmax)[:-1]))
    lens = np.diff(np.append(starts, n))
    keep = np.repeat(group_keep, lens) & (ys == np.repeat(gmax, lens))
    return s.filter(pa.array(keep))


def skyline2d(ds, *, x: str, y: str):
    """Distributed 2-D skyline (Pareto frontier, both columns maximized).

    Two passes, both exact: (1) per-batch local frontier — embarrassingly
    parallel, typically shrinks the data by orders of magnitude because a
    random block's frontier is O(log block) points; (2) the surviving
    candidates are coalesced to one block and the same kernel finishes
    (the global skyline is a subset of the union of block skylines —
    dominance is transitive, so a point dominated globally is dominated by
    some global-skyline point, which also survives its own block pass).
    Pass 2's single block is frontier-sized, not data-sized; a pathological
    corpus whose frontier IS the data degrades to one big block rather
    than failing.
    """
    local = ds.map_batches(lambda t: _skyline_kernel(t, x, y),
                           batch_format="pyarrow", zero_copy_batch=True)
    return local.repartition(1).map_batches(
        lambda t: _skyline_kernel(t, x, y),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def consecutive_pairs(ds, *, key: str, ts: str, tie: str, val: str,
                      num_buckets: int = 64):
    """(src, dst) pairs of CONSECUTIVE ``val`` values per key ordered by
    (ts, tie) — SQL's ``lead(val) OVER (PARTITION BY key ORDER BY ts,
    tie)`` with null-lead rows dropped. The standard derivation of an
    interaction edge list from an event log. One bucket exchange."""
    def pairs(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        v = bucket.column(val)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if n < 2:
            return pa.table({"src": v.slice(0, 0), "dst": v.slice(0, 0)})
        starts = np.asarray(segment_starts(bucket.column(key)))
        valid = np.ones(n - 1, dtype=bool)
        valid[starts[starts > 0] - 1] = False
        vidx = np.flatnonzero(valid)
        return pa.table({"src": v.take(pa.array(vidx)),
                         "dst": v.take(pa.array(vidx + 1))})

    return bucketed_group_apply(ds, key, pairs, num_buckets=num_buckets,
                                sort_cols=[(ts, "ascending"),
                                           (tie, "ascending")])


def market_basket_pairs(ds, *, key: str, item: str,
                        num_buckets: int = 64,
                        max_items_per_key: int = 10_000,
                        broadcast_max_rows: int = 2_000_000):
    """Association mining over (key, item) baskets — Agrawal & Srikant's
    support/lift statistics (VLDB 1994) for every unordered item pair
    co-occurring in at least one basket:

      support_e9(a,b) = trunc(c_ab·1e9 / N)
      lift_e9(a,b)    = trunc(N·c_ab·1e9 / (c_a·c_b))

    where N = distinct baskets, c_x = baskets containing x, c_ab =
    baskets containing both. Lift > 1e9 means a and b co-occur more than
    independence predicts — the blocking-key reading: two mention forms
    whose conversation sets have high lift likely name one entity.

    Scale shape: ONE bucket exchange groups each basket's rows (sorted by
    (key, item), so distinct items per basket are segment-local dedup,
    then a vectorized triangular pair expansion — same index arithmetic
    as the triangle wedge kernel); pair counts via one skinny groupby.
    Per-item counts ride the same distinct pass. The item-count table is
    broadcast (item domains are categorical vocabularies; cap-guarded at
    ``broadcast_max_rows`` with a loud error). ``max_items_per_key``
    bounds the quadratic per-basket blowup — a basket wider than that
    raises rather than silently exploding.

    Returns Dataset (a, b, c_ab, support_e9, lift_e9) with a < b."""
    import ray as _ray
    from ray.data.aggregate import Count

    from ..functions.rayutil import collect_table, get_broadcast

    def pairs_only(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        it = bucket.column(item)
        if isinstance(it, pa.ChunkedArray):
            it = it.combine_chunks()
        if n == 0:
            return pa.table({"a": it.slice(0, 0), "b": it.slice(0, 0)})
        # bucket sorted by (key, item): dedup = first-of-run within segment
        kstarts = np.asarray(segment_starts(bucket.column(key)))
        first_of_key = np.zeros(n, dtype=bool)
        first_of_key[kstarts] = True
        same_item = np.zeros(n, dtype=bool)
        same_item[1:] = np.asarray(
            pc.equal(it.slice(1), it.slice(0, n - 1)).fill_null(False))
        ded = bucket.filter(pa.array(first_of_key | ~same_item))
        m = ded.num_rows
        dit = ded.column(item)
        if isinstance(dit, pa.ChunkedArray):
            dit = dit.combine_chunks()
        dstarts = np.asarray(segment_starts(ded.column(key)))
        lens = np.diff(np.append(dstarts, m))
        if lens.max(initial=0) > max_items_per_key:
            raise ValueError(
                f"basket of {int(lens.max())} distinct items exceeds "
                f"max_items_per_key={max_items_per_key}")
        # triangular expansion: pair each row with every LATER row of its
        # segment (items sorted ascending, so a < b)
        pos = np.arange(m, dtype=np.int64) - np.repeat(dstarts, lens)
        later = np.repeat(lens, lens) - 1 - pos
        total = int(later.sum())
        if total == 0:
            return pa.table({"a": dit.slice(0, 0), "b": dit.slice(0, 0)})
        left_idx = np.repeat(np.arange(m, dtype=np.int64), later)
        block_starts = np.cumsum(later) - later
        k = (np.arange(total, dtype=np.int64)
             - np.repeat(block_starts, later))
        right_idx = left_idx + k + 1
        return pa.table({"a": dit.take(pa.array(left_idx)),
                         "b": dit.take(pa.array(right_idx))})

    def singles_only(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        it = bucket.column(item)
        if isinstance(it, pa.ChunkedArray):
            it = it.combine_chunks()
        if n == 0:
            return pa.table({"item": it, "basket": bucket.column(key)})
        kstarts = np.asarray(segment_starts(bucket.column(key)))
        first_of_key = np.zeros(n, dtype=bool)
        first_of_key[kstarts] = True
        same_item = np.zeros(n, dtype=bool)
        same_item[1:] = np.asarray(
            pc.equal(it.slice(1), it.slice(0, n - 1)).fill_null(False))
        ded = bucket.filter(pa.array(first_of_key | ~same_item))
        return pa.table({"item": ded.column(item),
                         "basket": ded.column(key)})

    skinny = ds.map_batches(
        lambda t: t.select([key, item]), batch_format="pyarrow",
        zero_copy_batch=True).materialize()  # consumed 2x: pairs + singles

    pair_counts = (bucketed_group_apply(
        skinny, key, pairs_only, num_buckets=num_buckets,
        sort_cols=[(item, "ascending")])
        .groupby(["a", "b"]).aggregate(Count())
        .map_batches(lambda t: t.rename_columns(["a", "b", "c_ab"]),
                     batch_format="pyarrow", zero_copy_batch=True))

    singles = bucketed_group_apply(
        skinny, key, singles_only, num_buckets=num_buckets,
        sort_cols=[(item, "ascending")]).materialize()
    n_baskets = (singles.groupby("basket").count()).count()
    item_counts = (singles.groupby("item").count()
                   .map_batches(lambda t: t.rename_columns(["item", "c"]),
                                batch_format="pyarrow",
                                zero_copy_batch=True))
    n_items = item_counts.count()
    if n_items > broadcast_max_rows:
        raise ValueError(
            f"{n_items} distinct items exceed broadcast_max_rows="
            f"{broadcast_max_rows} — market_basket_pairs broadcasts the "
            f"item-count table; bucketize or re-code the item domain")
    itab = collect_table(item_counts, pa.schema(
        [("item", pa.string()), ("c", pa.int64())]))
    ref = _ray.put({k_: int(v) for k_, v in
                    zip(itab.column("item").to_pylist(),
                        itab.column("c").to_pylist())})

    def finish(t: pa.Table, N=n_baskets) -> pa.Table:
        cmap = get_broadcast(ref)
        a = t.column("a").to_pylist()
        b = t.column("b").to_pylist()
        cab = t.column("c_ab").to_pylist()
        # pair-vocabulary-sized rows (distinct item pairs), python-int
        # exact rationals
        sup = [(c * 10**9) // N for c in cab]
        lift = [(N * c * 10**9) // (cmap[x] * cmap[y])
                for x, y, c in zip(a, b, cab)]
        return pa.table({
            "a": t.column("a"), "b": t.column("b"),
            "c_ab": pa.array(cab, type=pa.int64()),
            "support_e9": pa.array(sup, type=pa.int64()),
            "lift_e9": pa.array(lift, type=pa.int64())})

    return pair_counts.map_batches(finish, batch_format="pyarrow",
                                   zero_copy_batch=True)


def touch_attribution(ds, *, key: str, ts: str, tie: str, type_col: str,
                      touch_type: str, convert_type: str,
                      window_us: int, num_buckets: int = 64):
    """First- and last-touch attribution: for every conversion event,
    the MIN and MAX ``tie`` (event id) among the key's ``touch_type``
    events inside the trailing time window [t_conv − window, t_conv] —
    the marketing-attribution primitive (which touch gets credit), and
    over resolved identities exactly the post-linkage consumer workload
    this engine exists for.

    One bucket exchange; per bucket the windows are two searchsorteds
    over each segment's touch rows, and the per-window MIN/MAX run as
    ONE interleaved ``np.minimum/maximum.reduceat`` over the
    [lo, hi) pairs — overlapping windows, zero per-row Python. Empty
    windows yield NULLs. Output: (key, convert_id, first_touch,
    last_touch)."""
    from ..functions.rayutil import segment_starts

    def per_bucket(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        empty = pa.table({
            key: bucket.column(key).slice(0, 0),
            "convert_id": pa.array([], type=pa.int64()),
            "first_touch": pa.array([], type=pa.int64()),
            "last_touch": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        et = bucket.column(type_col)
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        t = np.asarray(pc.cast(bucket.column(ts), pa.int64()))
        eid = np.asarray(bucket.column(tie), dtype=np.int64)
        is_touch = np.asarray(pc.equal(et, touch_type))
        is_conv = np.asarray(pc.equal(et, convert_type))
        starts = np.asarray(segment_starts(bucket.column(key)))
        seg_id = np.repeat(np.arange(len(starts)),
                           np.diff(np.append(starts, n)))
        conv_idx = np.flatnonzero(is_conv)
        if len(conv_idx) == 0:
            return empty
        touch_idx = np.flatnonzero(is_touch)
        tt = t[touch_idx]
        tseg = seg_id[touch_idx]
        teid = eid[touch_idx]
        m = len(teid)
        # composite (segment, time-offset) searchsorted — the range_join
        # idiom: one vectorized search answers every window bound
        from ..stages.temporal import _composite, _time_bits
        t0 = int(t.min())
        t_bits = _time_bits(int(t.max()) - t0 + window_us)
        if int(seg_id.max()).bit_length() + t_bits > 63:
            raise ValueError(
                f"touch_attribution composite overflow "
                f"({int(seg_id.max()) + 1} keys x the bucket's time span)"
                f" — raise num_buckets")
        comp_touch = _composite(tseg, (tt - t0).astype(np.int64)
                                + np.int64(1), t_bits)
        cv_seg = seg_id[conv_idx]
        cv_t = t[conv_idx]
        lo = np.searchsorted(comp_touch, _composite(
            cv_seg, np.maximum(cv_t - window_us - t0, 0).astype(np.int64)
            + np.int64(1), t_bits), side="left")
        hi = np.searchsorted(comp_touch, _composite(
            cv_seg, (cv_t - t0).astype(np.int64) + np.int64(1), t_bits),
            side="right")
        has = hi > lo
        # per-window MIN/MAX via interleaved reduceat; a sentinel row
        # makes every index (incl. hi == m) valid and edge-free
        pairs = np.stack([lo, hi], axis=1).ravel()
        mins = np.minimum.reduceat(
            np.append(teid, np.iinfo(np.int64).max), pairs)[::2]
        maxs = np.maximum.reduceat(
            np.append(teid, np.iinfo(np.int64).min), pairs)[::2]
        first = np.where(has, mins, 0)
        last = np.where(has, maxs, 0)
        kc = bucket.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        return pa.table({
            key: kc.take(pa.array(conv_idx)),
            "convert_id": pa.array(eid[conv_idx]),
            "first_touch": pa.array(first, type=pa.int64(),
                                    mask=~has),
            "last_touch": pa.array(last, type=pa.int64(), mask=~has)})

    return bucketed_group_apply(
        ds, key, per_bucket, num_buckets=num_buckets,
        sort_cols=[(ts, "ascending"), (tie, "ascending")])
