"""Exact distributed order statistics WITHOUT a global sort.

`exact_kth` finds the exact k-th smallest value of an integer column by
iterative histogram refinement: each round is one streaming map_batches
pass emitting a power-of-two-binned partial histogram of the current
[lo, hi] range (driver folds ~1k ints per block — never rows), the bin
containing the k-th value becomes the next range, and when the range
collapses to at most `exact_span` distinct values one final pass takes an
exact per-value bincount. Bin edges are bit-shifts (lo + bi·2^shift), so
bin membership is exact integer arithmetic — no floor/ceil boundary
subtleties and no overflow for any int64 range. Rounds =
O(range_bits / 10) — ≤ 6 passes for full-int64 data, 2-3 realistically;
bytes leaving each worker = one small histogram per block per pass,
independent of data size.

This is the classic selection answer to "median at 100 TB": a global
`ds.sort` moves every row over the wire to answer a one-number question;
the refinement moves only histograms. (The grouped quantile operators in
stages/profile.py interpolate within per-group histograms; this operator
is the EXACT global selection.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hist_pass(ds, col: str, lo: int, hi: int, shift: int):
    """One streaming pass: per-batch partial histogram of ``col`` over
    [lo, hi] with bin width 2^shift (bin = (v - lo) >> shift), plus a
    below-lo count; the driver folds num_bins+1 ints per block."""
    num_bins = ((hi - lo) >> shift) + 1

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(pc.cast(t.column(col), pa.int64()), dtype=np.int64)
        below = int((v < lo).sum())
        in_rng = v[(v >= lo) & (v <= hi)]
        # wrap-safe difference: two's-complement subtraction viewed as
        # uint64 is the true non-negative distance even when the span
        # exceeds int64 (e.g. a full-range first round)
        d = (in_rng - lo).astype(np.uint64)
        b = (d >> np.uint64(shift)).astype(np.int64)
        counts = np.bincount(b, minlength=num_bins).astype(np.int64)
        return pa.table({"bin": pa.array(np.arange(-1, num_bins,
                                                   dtype=np.int64)),
                         "cnt": pa.array(np.concatenate(
                             [[below], counts]).astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    folded = np.zeros(num_bins + 1, dtype=np.int64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        # iter_batches may coalesce several partial tables into one batch,
        # repeating bin ids — np.add.at accumulates duplicates (plain
        # fancy-index += silently keeps only the last occurrence)
        np.add.at(folded,
                  np.asarray(t.column("bin"), dtype=np.int64) + 1,
                  np.asarray(t.column("cnt"), dtype=np.int64))
    return int(folded[0]), folded[1:]


def exact_kth(ds, col: str, k: int, *, bin_bits: int = 10,
              exact_span: int = 65536) -> int:
    """Exact k-th smallest (1-indexed) of integer column ``col``.

    ``bin_bits``: log2 of the per-pass bin count target (2^bin_bits to
    2^(bin_bits+1) bins per round). ``exact_span``: switch to the exact
    per-value bincount once the candidate range has at most this many
    distinct values.
    """
    assert k >= 1, k
    mm = ds.map_batches(
        lambda t: pa.table({
            "lo": pa.array([pc.min(t.column(col)).as_py()], type=pa.int64()),
            "hi": pa.array([pc.max(t.column(col)).as_py()], type=pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    lo, hi = None, None
    for b in mm.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for l, h in zip(t.column("lo").to_pylist(),
                        t.column("hi").to_pylist()):
            if l is None:
                continue
            lo = l if lo is None else min(lo, l)
            hi = h if hi is None else max(hi, h)
    if lo is None:
        raise ValueError("exact_kth on an all-null/empty column")

    # `remaining` is the rank WITHIN the current [lo, hi] range: the
    # narrowing step already discounts everything below the chosen bin, so
    # later passes must NOT subtract their (global) below-lo count again —
    # it is returned only as a cross-pass consistency check.
    remaining = k
    expect_below = 0
    while hi - lo + 1 > exact_span:
        span_bits = int(hi - lo).bit_length()
        shift = max(0, span_bits - bin_bits)
        below, counts = _hist_pass(ds, col, lo, hi, shift)
        if below != expect_below:
            raise ValueError(
                f"exact_kth: below-range count changed between passes "
                f"({expect_below} -> {below}); input is not stable")
        cum = np.cumsum(counts)
        if remaining > cum[-1]:
            raise ValueError(f"k={k} exceeds row count {int(cum[-1])}")
        bi = int(np.searchsorted(cum, remaining, side="left"))
        skipped = int(cum[bi - 1]) if bi > 0 else 0
        remaining -= skipped
        expect_below += skipped
        # power-of-two bin edges: exact, no floor/ceil boundary subtleties
        new_lo = lo + (bi << shift)
        new_hi = min(lo + (((bi + 1) << shift) - 1), hi)
        lo, hi = int(new_lo), int(new_hi)
    below, counts = _hist_pass(ds, col, lo, hi, 0)
    if below != expect_below:
        raise ValueError(
            f"exact_kth: below-range count changed between passes "
            f"({expect_below} -> {below}); input is not stable")
    cum = np.cumsum(counts)
    if remaining < 1 or remaining > cum[-1]:
        raise ValueError(f"k={k} out of range after refinement")
    return lo + int(np.searchsorted(cum, remaining, side="left"))


def percentile_rank(ds, *, value_col: str, keep_cols: list[str] | None = None,
                    out_col: str = "pct_rank", max_distinct: int = 2_000_000,
                    num_buckets: int = 64):
    """Exact global PERCENT_RANK over an integer column without a global
    sort: pct_rank(v) = (#rows with value < v) / (n − 1), ties sharing the
    rank of their group's first row — exactly ANSI SQL's
    ``PERCENT_RANK() OVER (ORDER BY value_col)``.

    The training-data use is quality-score normalization ("keep the top 30%
    by LM quality") where the raw score scale is meaningless but its rank
    is: a percentile threshold is corpus-size-invariant and robust to score
    re-calibration.

    Scale shape: ONE skinny count aggregate over DISTINCT values (the
    exchange is value-distribution-sized, never row-sized), a driver-side
    cumsum over the distinct-value table (cap-guarded by ``max_distinct`` —
    quality scores / lengths are low-cardinality by construction; a
    larger-than-cap vocabulary errors loudly rather than OOMing), one
    broadcast, one streaming lookup pass. Both engine and oracle divide
    the same two int64s, so the float64 quotient is bit-identical."""
    import ray as _ray

    from ..functions.rayutil import collect_table, get_broadcast

    counts = ds.groupby(value_col).count()
    tab = collect_table(
        counts, pa.schema([(value_col, pa.int64()), ("count()", pa.int64())]))
    if tab.num_rows > max_distinct:
        raise ValueError(
            f"percentile_rank: {tab.num_rows} distinct values exceed the "
            f"broadcast cap {max_distinct} — bucket the score first (the "
            "operator is meant for bounded score/length distributions)")
    tab = tab.sort_by([(value_col, "ascending")])
    vals = np.asarray(tab.column(value_col), dtype=np.int64)
    cnt = np.asarray(tab.column("count()"), dtype=np.int64)
    count_lt = np.cumsum(cnt) - cnt
    n = int(cnt.sum())
    ref = _ray.put((vals, count_lt))
    keep = list(keep_cols or [])
    denom = float(max(n - 1, 1))

    def attach(t: pa.Table) -> pa.Table:
        v, lt = get_broadcast(ref)
        x = np.asarray(pc.cast(t.column(value_col), pa.int64()),
                       dtype=np.int64)
        pos = np.searchsorted(v, x)
        out = {c: t.column(c) for c in keep}
        out[value_col] = t.column(value_col)
        out[out_col] = pa.array(lt[pos] / denom)
        return pa.table(out)

    return ds.map_batches(attach, batch_format="pyarrow",
                          zero_copy_batch=True)


def grouped_median(ds, *, group_col: str, val_col: str,
                   out_col: str = "median_val", num_buckets: int = 256):
    """Exact per-group median (ANSI ``median(val) GROUP BY g`` semantics:
    NULLs ignored, even-count groups average the two middle values, result
    is float64 — the same IEEE add/divide DuckDB performs, so the twin is
    bit-exact).

    Scale shape: groups are many and individually small (the opposite regime
    from `exact_kth`'s one global group), so the right plan is ONE bucketed
    exchange carrying (group, value) pairs with the in-bucket sort doing the
    ordering and two vectorized gathers doing every group's median at once —
    no per-group Python, no global sort, driver never sees rows. A group
    bigger than a bucket's memory is the `exact_kth` regime; use that."""
    from ..functions.rayutil import bucketed_group_apply, segment_starts

    def drop_null_vals(t: pa.Table) -> pa.Table:
        return t.select([group_col, val_col]).filter(
            pc.is_valid(t.column(val_col)))

    skinny = ds.map_batches(drop_null_vals, batch_format="pyarrow",
                            zero_copy_batch=True)

    def seg_median(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        gtype = bucket.schema.field(group_col).type
        if n == 0:
            return pa.table({group_col: pa.array([], type=gtype),
                             out_col: pa.array([], type=pa.float64())})
        starts = np.asarray(segment_starts(bucket.column(group_col)))
        lens = np.diff(np.append(starts, n))
        v = np.asarray(pc.cast(bucket.column(val_col), pa.float64()),
                       dtype=np.float64)  # bucket-sorted by (group, val)
        lo = starts + (lens - 1) // 2
        hi = starts + lens // 2
        med = (v[lo] + v[hi]) / 2.0
        return pa.table({group_col: bucket.column(group_col).take(
                             pa.array(starts)),
                         out_col: pa.array(med, type=pa.float64())})

    return bucketed_group_apply(skinny, group_col, seg_median,
                                num_buckets=num_buckets,
                                sort_cols=[(val_col, "ascending")])


def quantile_bucketize(ds, *, value_col: str, n_buckets: int,
                       keep_cols: list[str] | None = None,
                       out_col: str = "bucket", **kw):
    """Exact quantile binning (feature bucketize / curriculum tiering):
    ``bucket = min(floor(percent_rank(v) · n_buckets), n_buckets − 1)``.
    Deterministic under ties (tied values share a percent_rank, hence a
    bucket — unlike SQL NTILE, whose tie assignment is arbitrary), and the
    SQL twin computes the identical float expression, so the op is
    value-exact cross-engine. Same scale shape as `percentile_rank`: one
    distinct-value count aggregate, driver cumsum, broadcast lookup — no
    global sort, no row-sized exchange."""
    ranked = percentile_rank(ds, value_col=value_col, keep_cols=keep_cols,
                             out_col="__pct", **kw)

    def fin(t: pa.Table) -> pa.Table:
        p = np.asarray(t.column("__pct"), dtype=np.float64)
        b = np.minimum(np.floor(p * n_buckets),
                       n_buckets - 1).astype(np.int64)
        return t.drop_columns(["__pct"]).append_column(out_col, pa.array(b))

    return ranked.map_batches(fin, batch_format="pyarrow",
                              zero_copy_batch=True)


def grouped_mad_outliers(ds, *, group_col: str, val_col: str,
                         keep_cols: list[str] | None = None, k: int = 3,
                         num_buckets: int = 256,
                         broadcast_max_rows: int = 2_000_000):
    """Robust per-group outlier detection: flag rows with
    |x − median(x)| > k · MAD, MAD = median(|x − median(x)|) (Hampel
    identifier; Davies & Gather, JASA 1993). The robust analog of the
    3-sigma rule — medians don't move under the very outliers being
    hunted, unlike mean/stddev.

    INTEGER-EXACT for integral ``val_col``: medians are carried at 2×
    scale (2·median of ints is an int; the sum-of-two-middles never
    leaves the integers), distances at 2× (d2 = |2x − med2|), MAD at 4×
    (mad4 = 2·median(d2)), and the flag compares 2·d2 > k·mad4 — all
    int64, no float anywhere, so the value hash is exact vs a SQL twin
    using the same scaled expressions. NULL values are ignored (SQL
    median semantics).

    Scale shape: two `grouped_median` passes (each ONE bucketed skinny
    exchange, vectorized in-bucket gathers) + two per-group stat
    attachments (broadcast dict under ``broadcast_max_rows`` groups,
    bucketed co-group join past it) + one streaming filter. The driver
    only ever holds per-group stats, never rows.

    Returns the outlier rows: (group_col, *keep_cols, val_col).
    """
    import ray as _ray

    from ..functions.rayutil import (collect_table, dict_lookup,
                                     get_broadcast_dict)
    from ..stages.joins import cogroup_inner_join

    keep_cols = keep_cols or []
    cols = [group_col, *keep_cols, val_col]

    proj = ds.map_batches(
        lambda t: t.select(cols).filter(pc.is_valid(t.column(val_col))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    # consumed 2x: median pass (inside grouped_median) + distance attach

    def _attach_stat(src, stat_ds, stat_col):
        """src + int64 column ``stat_col`` looked up by group_col."""
        stat = stat_ds.materialize()
        if stat.count() <= broadcast_max_rows:
            gtype = stat.schema().base_schema.field(group_col).type
            tab = collect_table(stat, pa.schema(
                [(group_col, gtype), (stat_col, pa.int64())]))
            ref = _ray.put(tab)

            def add(t: pa.Table, ref=ref) -> pa.Table:
                d = get_broadcast_dict(ref, group_col, stat_col)
                return t.append_column(stat_col, dict_lookup(
                    t.column(group_col), d, value_type=pa.int64()))

            return src.map_batches(add, batch_format="pyarrow",
                                   zero_copy_batch=True)
        return cogroup_inner_join(src, stat, key=group_col,
                                  right_cols=[stat_col],
                                  num_buckets=num_buckets)

    med = grouped_median(proj, group_col=group_col, val_col=val_col,
                         out_col="__med", num_buckets=num_buckets)
    med2 = med.map_batches(
        lambda t: pa.table({
            group_col: t.column(group_col),
            "__med2": pc.cast(pc.multiply(t.column("__med"), 2.0),
                              pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)

    def with_d2(t: pa.Table) -> pa.Table:
        x = np.asarray(pc.cast(t.column(val_col), pa.int64()),
                       dtype=np.int64)
        m2 = np.asarray(t.column("__med2"), dtype=np.int64)
        return t.append_column("__d2", pa.array(np.abs(2 * x - m2)))

    dist = _attach_stat(proj, med2, "__med2").map_batches(
        with_d2, batch_format="pyarrow", zero_copy_batch=True).materialize()
    # consumed 2x: MAD pass + final filter

    mad = grouped_median(dist, group_col=group_col, val_col="__d2",
                         out_col="__mad", num_buckets=num_buckets)
    mad4 = mad.map_batches(
        lambda t: pa.table({
            group_col: t.column(group_col),
            "__mad4": pc.cast(pc.multiply(t.column("__mad"), 2.0),
                              pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)

    def flag(t: pa.Table) -> pa.Table:
        d2 = np.asarray(t.column("__d2"), dtype=np.int64)
        m4 = np.asarray(t.column("__mad4"), dtype=np.int64)
        return t.filter(pa.array(2 * d2 > k * m4)).select(cols)

    return _attach_stat(dist, mad4, "__mad4").map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True)


def spearman(ds, *, x_col: str, y_col: str,
             max_distinct: int = 2_000_000) -> pa.Table:
    """Spearman rank correlation with exact average-rank tie handling
    (Spearman 1904; the robust monotone-association complement to
    Pearson — a linkage scorer and a human judgment usually agree in
    ORDER long before they agree in value).

    Ranks are EXACT integers at 2× scale: for a distinct value with c
    ties after pos smaller rows, r2 = 2·pos + c + 1. Both marginal rank
    maps come from one distinct-value groupby each (driver fold capped at
    ``max_distinct``, the roc_auc contract) and broadcast as sorted
    arrays; one combiner pass then sums the integer co-moments over the
    r2 values (Pearson is affine-invariant, so the 2× scale cancels).
    The only float is the final correlation — ONE fixed-shape f64
    expression over six integer sums that numpy and DuckDB round
    identically (the grouped_corr idiom). int64 co-moment bound:
    Σ rx2·ry2 ≤ 4n³ — shard past ~1.3e6 rows per partial batch times
    2^63; practical corpora at this engine's block sizes stay far under.

    Returns ONE row (n, sx, sxx, syy, sxy, spearman)."""
    import ray as _ray

    from ray.data.aggregate import Sum

    from ..functions.rayutil import collect_table, get_broadcast

    def rank2_map(col: str):
        counts = (ds.map_batches(
            lambda t, c=col: pa.table({"v": t.column(c)}),
            batch_format="pyarrow", zero_copy_batch=True)
            .groupby("v").count())
        tab = collect_table(counts, pa.schema(
            [("v", pa.int64()), ("count()", pa.int64())]))
        if tab.num_rows > max_distinct:
            raise ValueError(
                f"spearman: {tab.num_rows} distinct values of {col} "
                f"exceed max_distinct={max_distinct}")
        tab = tab.sort_by([("v", "ascending")])
        c = np.asarray(tab.column("count()"), dtype=np.int64)
        pos = np.concatenate(([0], np.cumsum(c)[:-1]))
        r2 = 2 * pos + c + 1
        return _ray.put((np.asarray(tab.column("v"), dtype=np.int64), r2))

    rx_ref = rank2_map(x_col)
    ry_ref = rank2_map(y_col)

    def partial(t: pa.Table) -> pa.Table:
        xv, xr = get_broadcast(rx_ref)
        yv, yr = get_broadcast(ry_ref)
        x = xr[np.searchsorted(xv, np.asarray(t.column(x_col),
                                              dtype=np.int64))]
        y = yr[np.searchsorted(yv, np.asarray(t.column(y_col),
                                              dtype=np.int64))]
        return pa.table({
            "g": pa.array([0], type=pa.int64()),
            "n": pa.array([len(x)], type=pa.int64()),
            "sx": pa.array([int(x.sum())], type=pa.int64()),
            "sy": pa.array([int(y.sum())], type=pa.int64()),
            "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
            "syy": pa.array([int((y * y).sum())], type=pa.int64()),
            "sxy": pa.array([int((x * y).sum())], type=pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("g").aggregate(Sum("n"), Sum("sx"), Sum("sy"),
                                   Sum("sxx"), Sum("syy"), Sum("sxy")))
    tab = collect_table(agg, pa.schema(
        [("g", pa.int64())] + [(f"sum({c})", pa.int64())
                               for c in ("n", "sx", "sy", "sxx", "syy",
                                         "sxy")]))
    g = {c: int(tab.column(f"sum({c})")[0].as_py())
         for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
    d = {c: np.float64(v) for c, v in g.items()}
    num = d["n"] * d["sxy"] - d["sx"] * d["sy"]
    den = np.sqrt(d["n"] * d["sxx"] - d["sx"] * d["sx"]) \
        * np.sqrt(d["n"] * d["syy"] - d["sy"] * d["sy"])
    rho = float(num / den) if den > 0 else None
    return pa.table({
        "n": pa.array([g["n"]], type=pa.int64()),
        "sx": pa.array([g["sx"]], type=pa.int64()),
        "sxx": pa.array([g["sxx"]], type=pa.int64()),
        "syy": pa.array([g["syy"]], type=pa.int64()),
        "sxy": pa.array([g["sxy"]], type=pa.int64()),
        "spearman": pa.array([rho], type=pa.float64())})


def blb_mean_ci(ds, *, val_col: str, id_col: str, n_subsets: int = 10,
                n_boot: int = 50, alpha: float = 0.05,
                num_buckets: int = 64) -> pa.Table:
    """Bag of Little Bootstraps confidence interval for the mean
    (Kleiner, Talwalkar, Sarkar & Jordan, 2012): the distributed answer
    to "what's the error bar on this corpus statistic" — a full bootstrap
    would resample ALL rows per replicate; BLB resamples only within
    disjoint subsets and rescales, giving the same asymptotics at a
    fraction of the movement.

    Plan: rows hash-partition by ``id_col`` into ``n_subsets`` disjoint
    subsets (ONE bucket exchange); within each subset of size b, draw
    ``n_boot`` multinomial(n, 1/b) weight vectors (vectorized, one
    rng per subset seeded by the subset id — deterministic across runs
    and cluster sizes), compute the weighted mean per replicate, take the
    subset's (alpha/2, 1-alpha/2) empirical quantiles; the final CI is
    the average of the subset CIs (the BLB estimator). Returns ONE row
    (n, mean_e9, lo_e9, hi_e9)."""
    from ray.data.aggregate import Sum

    from ..functions.rayutil import (bucketed_group_apply, collect_table,
                                     segment_starts)

    skinny = ds.map_batches(
        lambda t: pa.table({
            "__subset": pa.array(
                (np.asarray(t.column(id_col), dtype=np.int64)
                 * np.int64(2654435761)) % np.int64(2**31) % n_subsets),
            "v": pc.cast(t.column(val_col), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_total = skinny.count()
    if n_total == 0:
        return pa.table({"n": pa.array([0], type=pa.int64()),
                         "mean_e9": pa.array([None], type=pa.int64()),
                         "lo_e9": pa.array([None], type=pa.int64()),
                         "hi_e9": pa.array([None], type=pa.int64())})

    def per_subset(bucket: pa.Table) -> pa.Table:
        m = bucket.num_rows
        if m == 0:
            return pa.table({"lo": pa.array([], type=pa.float64()),
                             "hi": pa.array([], type=pa.float64()),
                             "w": pa.array([], type=pa.int64())})
        starts = np.asarray(segment_starts(bucket.column("__subset")))
        lens = np.diff(np.append(starts, m))
        vv = np.asarray(bucket.column("v"), dtype=np.float64)
        subs = np.asarray(bucket.column("__subset"), dtype=np.int64)
        los, his, ws = [], [], []
        for s0, ln in zip(starts, lens):
            x = vv[s0:s0 + ln]
            rng = np.random.RandomState(100003 + int(subs[s0]))
            w = rng.multinomial(n_total, np.full(ln, 1.0 / ln),
                                size=n_boot)
            means = (w * x[None, :]).sum(axis=1) / n_total
            means.sort()
            lo_i = int(np.floor(alpha / 2 * (n_boot - 1)))
            hi_i = int(np.ceil((1 - alpha / 2) * (n_boot - 1)))
            los.append(float(means[lo_i]))
            his.append(float(means[hi_i]))
            ws.append(int(ln))
        return pa.table({"lo": pa.array(los), "hi": pa.array(his),
                         "w": pa.array(ws, type=pa.int64())})

    parts = bucketed_group_apply(skinny, "__subset", per_subset,
                                 num_buckets=min(num_buckets, n_subsets))
    tab = collect_table(parts, pa.schema(
        [("lo", pa.float64()), ("hi", pa.float64()), ("w", pa.int64())]))
    # subset-count-sized driver fold; unweighted subset average is the
    # canonical BLB combiner
    lo = float(np.mean(np.asarray(tab.column("lo"))))
    hi = float(np.mean(np.asarray(tab.column("hi"))))
    total = skinny.map_batches(
        lambda t: pa.table({"g": pa.array([0], type=pa.int64()),
                            "s": pa.array([int(np.asarray(
                                t.column("v"),
                                dtype=np.int64).sum())],
                                type=pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).groupby(
        "g").aggregate(Sum("s"))
    s_total = collect_table(total, pa.schema(
        [("g", pa.int64()), ("sum(s)", pa.int64())])
    ).column("sum(s)")[0].as_py()
    mean = s_total / n_total
    q = lambda x: int(np.floor(x * 1e9 + 0.5))
    return pa.table({"n": pa.array([n_total], type=pa.int64()),
                     "mean_e9": pa.array([q(mean)], type=pa.int64()),
                     "lo_e9": pa.array([q(lo)], type=pa.int64()),
                     "hi_e9": pa.array([q(hi)], type=pa.int64())})
