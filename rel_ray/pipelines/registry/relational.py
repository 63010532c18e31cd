"""Registry segment: auto-split from pipelines/queries.py (round 5).
Shared helpers in ._common; the public dicts live in pipelines.queries."""
from ._common import *  # noqa: F401,F403


def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-style pricing summary (groupby + partial-aggregate combine)."""
    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
              "l_discount", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("l_shipdate"),
                             pa.scalar(np.datetime64("1998-09-01", "us"))))
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty_c": _cents(t.column("l_quantity")),
            "price_c": _cents(t.column("l_extendedprice")),
            "disc_c": _cents(t.column("l_discount")),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("qty_c"), Sum("price_c"), Sum("disc_c"), Count()))
    return agg.map_batches(
        lambda t: t.rename_columns(["l_returnflag", "l_linestatus", "sum_qty_cents",
                                    "sum_price_cents", "sum_disc_cents", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT)      AS sum_qty_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT)      AS sum_disc_cents,
       COUNT(*) AS cnt
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(sf_dir: str):
    """Grouped sum → global top-10 via per-batch local top-k + tiny reduce
    (rayutil.global_topk — no all-to-all sort), id tie-break."""
    ds = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    total = (ds.map_batches(
        lambda t: pa.table({"o_custkey": t.column("o_custkey"),
                            "price_c": _cents(t.column("o_totalprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey").aggregate(Sum("price_c")))
    total = total.map_batches(
        lambda t: t.rename_columns(["o_custkey", "total_cents"]),
        batch_format="pyarrow", zero_copy_batch=True)
    from ...functions.rayutil import global_topk
    return global_topk(total, [("total_cents", "descending"),
                               ("o_custkey", "ascending")], 10)


SQL_TOP_CUSTOMERS = """
SELECT o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders GROUP BY o_custkey
ORDER BY total_cents DESC, o_custkey ASC LIMIT 10
"""


def q_customers_per_nation(sf_dir: str):
    """Broadcast join: tiny dim table shipped once via ray.put, looked up per
    batch (never a shuffle — REL's SQLite dim lookups become this)."""
    import ray as _ray

    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    lookup_ref = _ray.put({r["n_nationkey"]: r["n_name"] for r in nation})

    class AttachNation:
        def __init__(self, ref):
            self.lookup = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t.column("c_nationkey").to_numpy()
            names = [self.lookup.get(int(k), "") for k in keys]
            return pa.table({"n_name": pa.array(names, type=pa.string())})

    cust = _pq(sf_dir, "customer", ["c_nationkey"])
    named = cust.map_batches(AttachNation, fn_constructor_args=(lookup_ref,),
                             batch_format="pyarrow", zero_copy_batch=True,
                             concurrency=(1, 2))
    agg = named.groupby("n_name").count()
    return agg.map_batches(lambda t: t.rename_columns(["n_name", "cnt"]),
                           batch_format="pyarrow", zero_copy_batch=True)


SQL_CUSTOMERS_PER_NATION = """
SELECT n_name, COUNT(*) AS cnt
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_events_reconstruct(sf_dir: str):
    """Stable in-group ordering (the conversation-reconstruction primitive,
    SURVEY §2.6) over events: row_number + lag within user_id by
    (ts, event_id). Bucketed shuffle-reduce (one callback per bucket, all
    key segments vectorized) — not a per-distinct-user map_groups."""
    from ...functions.rayutil import bucketed_group_apply, segment_starts

    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def seq_bucket(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "turn_seq": pa.array([], type=pa.int64()),
                "prev_event_type": pa.array([], type=pa.string())})
        starts = segment_starts(bucket.column("user_id"))
        lens = np.diff(np.append(starts, n))
        seg_start = np.repeat(np.cumsum(lens) - lens, lens)
        idx = np.arange(n, dtype=np.int64)
        et = bucket.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        prev_src = np.maximum(idx - 1, 0)
        prev = pc.if_else(pa.array(idx > seg_start),
                          et.take(pa.array(prev_src)),
                          pa.scalar("", type=pa.string()))
        return pa.table({
            "event_id": bucket.column("event_id"),
            "user_id": bucket.column("user_id"),
            "turn_seq": pa.array(idx - seg_start + 1),
            "prev_event_type": prev,
        })

    return bucketed_group_apply(
        ds, "user_id", seq_bucket, num_buckets=64,
        sort_cols=[("ts", "ascending"), ("event_id", "ascending")])


SQL_EVENTS_RECONSTRUCT = """
SELECT event_id, user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn_seq,
       COALESCE(lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '') AS prev_event_type
FROM events
"""


def q_grouped_topk_events(sf_dir: str):
    """Grouped top-k (the p(e|m) top-100-per-surface analog,
    REL:src/REL/wikipedia_yago_freq.py): top-2 event types per user."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])
    counts = ds.groupby(["user_id", "event_type"]).count()
    counts = counts.map_batches(
        lambda t: t.rename_columns(["user_id", "event_type", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True)

    # bucketed grouped top-k: segment positions < k after the in-bucket
    # (user, cnt desc, event_type) sort — no per-distinct-user callbacks
    from ...functions.rayutil import bucketed_group_apply, segment_starts

    def topk_bucket(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
                "rnk": pa.array([], type=pa.int64())})
        starts = segment_starts(bucket.column("user_id"))
        lens = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens,
                                                       lens)
        kept = bucket.filter(pa.array(pos < 2))
        return kept.append_column("rnk", pa.array(pos[pos < 2] + 1))

    return bucketed_group_apply(
        counts, "user_id", topk_bucket, num_buckets=64,
        sort_cols=[("cnt", "descending"), ("event_type", "ascending")])


SQL_GROUPED_TOPK_EVENTS = """
SELECT user_id, event_type, cnt, rnk FROM (
  SELECT user_id, event_type, cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type ASC) AS rnk
  FROM (SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type))
WHERE rnk <= 2
"""


def q_grouped_quantiles_lineitem(sf_dir: str):
    """Grouped discrete quantiles (p50/p90/p99 of price cents per flag/status):
    explicit spec 'ceil(q*n)-th smallest, 1-indexed' so the SQL oracle is
    deterministic. Low-cardinality groups → one bucketed segment pass; at
    scale swap in a t-digest sketch (this exact path needs the in-group sort)."""
    from ...functions.rayutil import bucketed_group_apply, segment_starts

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_linestatus",
                                  "l_extendedprice"])
    skinny = ds.map_batches(
        lambda t: pa.table({"l_returnflag": t.column("l_returnflag"),
                            "l_linestatus": t.column("l_linestatus"),
                            "price_c": _cents(t.column("l_extendedprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)

    QS = (("p50", 50), ("p90", 90), ("p99", 99))

    def seg_quantiles(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({"l_returnflag": pa.array([], type=pa.string()),
                             "l_linestatus": pa.array([], type=pa.string()),
                             **{name: pa.array([], type=pa.int64())
                                for name, _ in QS}})
        s1 = np.asarray(segment_starts(bucket.column("l_returnflag")))
        s2 = np.asarray(segment_starts(bucket.column("l_linestatus")))
        starts = np.union1d(s1, s2)
        lens = np.diff(np.append(starts, n))
        v = bucket.column("price_c").to_numpy()
        take = pa.array(starts)
        cols = {"l_returnflag": bucket.column("l_returnflag").take(take),
                "l_linestatus": bucket.column("l_linestatus").take(take)}
        for name, q in QS:
            # ceil(q*n/100)-th smallest, 1-indexed -> offset ceil(q*len/100)-1
            idx = starts + (q * lens + 99) // 100 - 1
            cols[name] = pa.array(v[idx])
        return pa.table(cols)

    return bucketed_group_apply(skinny, ["l_returnflag", "l_linestatus"],
                                seg_quantiles, num_buckets=16,
                                sort_cols=[("price_c", "ascending")])


SQL_GROUPED_QUANTILES_LINEITEM = """
SELECT l_returnflag, l_linestatus,
       MAX(CASE WHEN rn = (50*cnt + 99) // 100 THEN price_c END) AS p50,
       MAX(CASE WHEN rn = (90*cnt + 99) // 100 THEN price_c END) AS p90,
       MAX(CASE WHEN rn = (99*cnt + 99) // 100 THEN price_c END) AS p99
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS cnt
  FROM lineitem)
GROUP BY l_returnflag, l_linestatus
"""


def q_grouped_quantiles_hist_lineitem(sf_dir: str):
    """Same exact quantiles as grouped_quantiles_lineitem, by the SCALE
    path: per-batch value-count partials (np.unique) -> groupby sum over
    (group, distinct value) -> per-group cumulative-count selection. The
    exchange carries one row per DISTINCT cents value per group instead of
    one per lineitem row — at 100 TB that is the difference between
    shuffling the table and shuffling a histogram. Value-exact (integer
    domain), so it shares the row-level oracle SQL."""
    from ray.data.aggregate import Sum

    from ...functions.rayutil import bucketed_group_apply, segment_starts

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_linestatus",
                                  "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        f = t.column("l_returnflag").combine_chunks() if isinstance(
            t.column("l_returnflag"), pa.ChunkedArray) else t.column("l_returnflag")
        s = t.column("l_linestatus").combine_chunks() if isinstance(
            t.column("l_linestatus"), pa.ChunkedArray) else t.column("l_linestatus")
        v = np.asarray(_cents(t.column("l_extendedprice")))
        # composite group key on the two low-cardinality dims + value
        key = pc.binary_join_element_wise(f, s, "|")
        enc = pc.dictionary_encode(key)
        gidx = np.asarray(enc.indices, dtype=np.int64)
        comp = np.stack([gidx, v], axis=1)
        uniq, cnt = np.unique(comp, axis=0, return_counts=True)
        gd = enc.dictionary
        return pa.table({
            "gkey": gd.take(pa.array(uniq[:, 0])),
            "price_c": pa.array(uniq[:, 1]),
            "cnt": pa.array(cnt.astype(np.int64))})

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["gkey", "price_c"]).aggregate(Sum("cnt")))
    hist = hist.map_batches(
        lambda t: t.rename_columns(["gkey", "price_c", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True)

    QS = (("p50", 50), ("p90", 90), ("p99", 99))

    def quantiles(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({"l_returnflag": pa.array([], type=pa.string()),
                             "l_linestatus": pa.array([], type=pa.string()),
                             **{name: pa.array([], type=pa.int64())
                                for name, _ in QS}})
        starts = np.asarray(segment_starts(bucket.column("gkey")))
        ends = np.append(starts[1:], n)
        cnt = np.asarray(bucket.column("cnt"), dtype=np.int64)
        v = np.asarray(bucket.column("price_c"), dtype=np.int64)
        cum = np.cumsum(cnt)
        base = np.where(starts > 0, cum[np.maximum(starts - 1, 0)], 0)
        totals = cum[ends - 1] - base
        gk = bucket.column("gkey")
        if isinstance(gk, pa.ChunkedArray):
            gk = gk.combine_chunks()
        heads = gk.take(pa.array(starts))
        parts = pc.split_pattern(heads, "|")
        cols = {"l_returnflag": pc.list_element(parts, 0),
                "l_linestatus": pc.list_element(parts, 1)}
        for name, q in QS:
            # rank of the ceil(q*n/100)-th smallest within each group, then
            # locate it in the cumulative histogram
            rank = (q * totals + 99) // 100
            out = np.empty(len(starts), dtype=np.int64)
            for i in range(len(starts)):  # O(groups): 6 groups, not rows
                seg = slice(starts[i], ends[i])
                pos = np.searchsorted(cum[seg] - base[i], rank[i], side="left")
                out[i] = v[starts[i] + pos]
            cols[name] = pa.array(out)
        return pa.table(cols)

    return bucketed_group_apply(hist, "gkey", quantiles, num_buckets=4,
                                sort_cols=[("price_c", "ascending")])



def q_approx_quantiles_lineitem(sf_dir: str):
    """Mergeable quantile sketch (stages/sketches.py::quantile_sketch):
    p50/p90/p99 of price cents from a fixed ~4.4k-bin geometric histogram —
    the bounded-memory scale path (relative error <= ~2*eps) where the
    exact variants shuffle rows or distinct values. VALUE-EXACT vs
    _approx_quantiles_sql(): the sketch is a deterministic function of the
    data (geometric binning, cumulative rank-select, geometric-midpoint
    readout), so the oracle replays the identical arithmetic in SQL; the
    final ROUND-to-cents absorbs libm ULP variation between numpy and
    DuckDB in log1p/pow (bin-edge collisions need a value within ~1e-13
    relative of an irrational edge — absent by measure). Error bound and
    merge law remain pinned in tests/test_ops.py."""
    from ...stages.sketches import quantile_sketch, sketch_quantile

    EPS = 0.005
    ds = _pq(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda t: pa.table({"price_c": _cents(t.column("l_extendedprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    sk = quantile_sketch(ds, val_col="price_c", eps=EPS)
    names = ["p50", "p90", "p99"]
    vals = [sketch_quantile(sk, q, EPS) for q in (0.5, 0.9, 0.99)]
    return pa.table({"quantile": pa.array(names),
                     "approx_price_c": pa.array(
                         [int(round(v)) for v in vals], type=pa.int64())})


def _approx_quantiles_sql(eps: float = 0.005) -> str:
    """SQL replay of quantile_sketch + sketch_quantile over price cents:
    bin = floor(log1p(v)/log1p(2*eps)) capped at nb-1, select the first
    bin whose cumulative count reaches ceil(q*n) (identical to numpy
    searchsorted-left: the landing bin always has a nonzero count), read
    out round(sqrt(base^b * base^(b+1)) - 1). base/denominator literals
    are spelled exactly as the engine computes them (1.0 + 2*eps with
    2*eps an exact scaling of the eps double)."""
    from ...stages.sketches import _qs_nbins

    nb = _qs_nbins(eps)
    # inline the exact doubles the engine uses: log1p avoids the 1+x
    # rounding that ln(1.0 + eps2) would reintroduce on the SQL side
    denom = repr(float(np.log1p(2 * eps)))
    base = repr(1 + 2 * eps)
    return f"""
WITH v AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
           FROM lineitem),
bins AS (SELECT LEAST(CAST(FLOOR(ln(1.0 + CAST(c AS DOUBLE)) / {denom})
                           AS BIGINT), {nb - 1}) AS b FROM v),
hist AS (SELECT b, COUNT(*) AS cnt FROM bins GROUP BY b),
cum AS (SELECT b, SUM(cnt) OVER (ORDER BY b) AS cum FROM hist),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
qs AS (SELECT * FROM (VALUES ('p50', 0.5), ('p90', 0.9), ('p99', 0.99))
       AS t(quantile, q)),
ranks AS (SELECT quantile,
                 GREATEST(1, CAST(CEIL(q * (SELECT n FROM tot)) AS BIGINT))
                 AS r FROM qs),
sel AS (SELECT r.quantile, MIN(c.b) AS b
        FROM ranks r JOIN cum c ON c.cum >= r.r GROUP BY r.quantile)
SELECT quantile,
       CAST(ROUND(SQRT(POWER({base}, b) * POWER({base}, b + 1))
                  - 1.0) AS BIGINT) AS approx_price_c
FROM sel
"""


def q_top_terms_documents(sf_dir: str):
    """Global term frequencies, top-20 by (count desc, term asc): the
    combiner pattern — per-batch value_counts partial aggregation BEFORE the
    vocab-sized groupby sum, so the shuffle moves O(vocab) not O(tokens)."""
    from ...functions.normalize import extract_all_matches

    ds = _pq(sf_dir, "documents", ["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        ml = extract_all_matches(t.column("text"), "[a-z]+")
        vc = pc.value_counts(pc.list_flatten(ml))
        return pa.table({"term": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    agg = (ds.map_batches(partial_counts, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("term").aggregate(Sum("cnt")))
    agg = agg.map_batches(lambda t: t.rename_columns(["term", "cnt"]),
                          batch_format="pyarrow", zero_copy_batch=True)
    from ...functions.rayutil import global_topk
    return global_topk(agg, [("cnt", "descending"), ("term", "ascending")], 20)


SQL_TOP_TERMS_DOCUMENTS = """
SELECT tok AS term, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS tok FROM documents)
GROUP BY tok ORDER BY cnt DESC, term ASC LIMIT 20
"""


def q_top_bigrams_documents(sf_dir: str):
    """Global word-BIGRAM frequencies, top-20 (count desc, bigram asc):
    the co-occurrence-statistics shape (PMI tables, phrase mining).
    Adjacent in-document pairs from the flattened token ListArray with a
    row-boundary mask (same trick as textstats._byte_pairs), value-counts
    combiner before the vocab²-bounded groupby sum."""
    from ...functions.normalize import extract_all_matches
    from ...functions.rayutil import global_topk

    ds = _pq(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        ml = extract_all_matches(t.column("text"), "[a-z]+")
        if isinstance(ml, pa.ChunkedArray):
            ml = ml.combine_chunks()
        flat = ml.flatten()
        offs = np.asarray(ml.offsets, dtype=np.int64)
        n = len(flat)
        empty = pa.table({"bigram": pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64())})
        if n < 2:
            return empty
        keep = np.ones(n - 1, dtype=bool)
        starts = offs[1:-1]
        starts = starts[(starts > 0) & (starts < n)]
        keep[starts - 1] = False
        idx = np.nonzero(keep)[0]
        if not len(idx):
            return empty
        big = pc.binary_join_element_wise(
            flat.take(pa.array(idx)), flat.take(pa.array(idx + 1)), " ")
        vc = pc.value_counts(big)
        return pa.table({"bigram": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bigram").aggregate(Sum("cnt")))
    agg = agg.map_batches(lambda t: t.rename_columns(["bigram", "cnt"]),
                          batch_format="pyarrow", zero_copy_batch=True)
    return global_topk(agg, [("cnt", "descending"),
                             ("bigram", "ascending")], 20)


SQL_TOP_BIGRAMS_DOCUMENTS = """
WITH docs AS (SELECT regexp_extract_all(text, '[a-z]+') AS w
              FROM documents),
pairs AS (SELECT unnest(list_zip(w[:-1], w[2:])) AS p FROM docs)
SELECT p[1] || ' ' || p[2] AS bigram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM pairs WHERE p[1] IS NOT NULL AND p[2] IS NOT NULL
GROUP BY 1 ORDER BY cnt DESC, bigram ASC LIMIT 20
"""


def q_pmi_bigrams_documents(sf_dir: str):
    """Top-20 bigrams by pointwise mutual information (phrase mining):
    pmi = ln(c_xy·N / (c_x?·c_?y)) over the bigram stream, c_xy >= 5.
    Counts are exact int64; the PMI is ONE fixed-shape f64 expression
    (integer products < 2^53 cast to double, one divide, one ln) quantized
    to 1e-9 units — the quantization absorbs the only legitimate
    divergence (libm-vs-numpy ln at 1-ulp), the pagerank oracle pattern."""
    from ray.data.aggregate import Sum

    from ...functions.normalize import extract_all_matches
    from ...functions.rayutil import collect_table, get_broadcast, global_topk

    ds = _pq(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        ml = extract_all_matches(t.column("text"), "[a-z]+")
        if isinstance(ml, pa.ChunkedArray):
            ml = ml.combine_chunks()
        flat = ml.flatten()
        offs = np.asarray(ml.offsets, dtype=np.int64)
        n = len(flat)
        empty = pa.table({"x": pa.array([], type=pa.string()),
                          "y": pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64())})
        if n < 2:
            return empty
        keep = np.ones(n - 1, dtype=bool)
        starts = offs[1:-1]
        starts = starts[(starts > 0) & (starts < n)]
        keep[starts - 1] = False
        idx = np.nonzero(keep)[0]
        if not len(idx):
            return empty
        x = flat.take(pa.array(idx))
        y = flat.take(pa.array(idx + 1))
        big = pc.binary_join_element_wise(x, y, "\x1f")
        vc = pc.value_counts(big)
        parts = pc.split_pattern(vc.field("values"), "\x1f")
        return pa.table({
            "x": pc.list_element(parts, 0), "y": pc.list_element(parts, 1),
            "cnt": pc.cast(vc.field("counts"), pa.int64())})

    bg = (ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
          .groupby(["x", "y"]).aggregate(Sum("cnt"))
          .map_batches(lambda t: t.rename_columns(["x", "y", "cnt"]),
                       batch_format="pyarrow", zero_copy_batch=True)
          .materialize())

    # marginals are vocab-sized — collect once, broadcast as dicts built
    # per worker (the engine's broadcast-dim-join pattern)
    def marg(col):
        m = (bg.groupby(col).aggregate(Sum("cnt"))
             .map_batches(lambda t: t.rename_columns([col, "m"]),
                          batch_format="pyarrow", zero_copy_batch=True))
        return collect_table(m, empty_schema=pa.schema(
            [(col, pa.string()), ("m", pa.int64())]))

    import ray as _ray

    mx, my = marg("x"), marg("y")
    n_total = int(pc.sum(mx.column("m")).as_py() or 0)
    mref = _ray.put({"mx": mx, "my": my})

    def pmi(t: pa.Table) -> pa.Table:
        b = get_broadcast(mref)
        t = t.filter(pc.greater_equal(t.column("cnt"),
                                      pa.scalar(5, type=pa.int64())))
        if t.num_rows == 0:
            return pa.table({"bigram": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64()),
                             "pmi_e9": pa.array([], type=pa.int64())})
        cx = np.asarray(b["mx"].column("m").take(
            pc.index_in(t.column("x"), value_set=b["mx"].column("x"))),
            dtype=np.int64)
        cy = np.asarray(b["my"].column("m").take(
            pc.index_in(t.column("y"), value_set=b["my"].column("y"))),
            dtype=np.int64)
        cnt = np.asarray(t.column("cnt"), dtype=np.int64)
        val = np.log((cnt * n_total).astype(np.float64)
                     / (cx * cy).astype(np.float64))
        return pa.table({
            "bigram": pc.binary_join_element_wise(t.column("x"),
                                                  t.column("y"), " "),
            "cnt": t.column("cnt"),
            "pmi_e9": pa.array(np.floor(val * 1e9 + 0.5).astype(np.int64))})

    scored = bg.map_batches(pmi, batch_format="pyarrow", zero_copy_batch=True)
    top = global_topk(scored, [("pmi_e9", "descending"),
                               ("bigram", "ascending")], 20)
    return top.select(["bigram", "cnt", "pmi_e9"])


SQL_PMI_BIGRAMS_DOCUMENTS = """
WITH docs AS (SELECT regexp_extract_all(text, '[a-z]+') AS w
              FROM documents),
pairs AS (SELECT unnest(list_zip(w[:-1], w[2:])) AS p FROM docs),
bg AS (SELECT p[1] AS x, p[2] AS y, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM pairs WHERE p[1] IS NOT NULL AND p[2] IS NOT NULL
       GROUP BY 1, 2),
mx AS (SELECT x, CAST(SUM(cnt) AS BIGINT) AS m FROM bg GROUP BY x),
my AS (SELECT y, CAST(SUM(cnt) AS BIGINT) AS m FROM bg GROUP BY y),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM bg)
SELECT bg.x || ' ' || bg.y AS bigram, bg.cnt,
       CAST(FLOOR(ln(CAST(bg.cnt * tot.n AS DOUBLE)
                     / CAST(mx.m * my.m AS DOUBLE)) * 1e9 + 0.5)
            AS BIGINT) AS pmi_e9
FROM bg, tot
JOIN mx ON bg.x = mx.x
JOIN my ON bg.y = my.y
WHERE bg.cnt >= 5
ORDER BY pmi_e9 DESC, bigram ASC LIMIT 20
"""


def q_entropy_event_type_per_user(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution (label
    diversity diagnostics). Counts exact; entropy quantized to 1e-9 units
    (absorbs 1-ulp ln and float summation-order divergence; the type
    cardinality per user is tiny, so the f64 error is ~1e-15 against a
    1e-9 grid)."""
    from ...functions.rayutil import bucketed_group_apply, segment_starts

    ds = _pq(sf_dir, "events", ["user_id", "event_type"])
    counts = ds.groupby(["user_id", "event_type"]).count()
    counts = counts.map_batches(
        lambda t: t.rename_columns(["user_id", "event_type", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def entropy_bucket(bucket: pa.Table) -> pa.Table:
        if bucket.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "entropy_e9": pa.array([], type=pa.int64())})
        starts = np.asarray(segment_starts(bucket.column("user_id")))
        c = np.asarray(bucket.column("cnt"), dtype=np.int64)
        seg = np.repeat(np.arange(len(starts)),
                        np.diff(np.append(starts, len(c))))
        n = np.bincount(seg, weights=c).astype(np.int64)
        p = c.astype(np.float64) / n[seg].astype(np.float64)
        h = np.bincount(seg, weights=-(p * np.log(p)))
        return pa.table({
            "user_id": bucket.column("user_id").take(pa.array(starts)),
            "n": pa.array(n),
            "entropy_e9": pa.array(np.floor(h * 1e9 + 0.5).astype(np.int64))})

    return bucketed_group_apply(counts, "user_id", entropy_bucket,
                                num_buckets=64,
                                sort_cols=[("event_type", "ascending")])


SQL_ENTROPY_EVENT_TYPE_PER_USER = """
WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY user_id, event_type),
n AS (SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY user_id)
SELECT c.user_id, n.n,
       CAST(FLOOR(SUM(-(CAST(c.cnt AS DOUBLE)/CAST(n.n AS DOUBLE))
                       * ln(CAST(c.cnt AS DOUBLE)/CAST(n.n AS DOUBLE)))
                  * 1e9 + 0.5) AS BIGINT) AS entropy_e9
FROM c JOIN n ON c.user_id = n.user_id
GROUP BY c.user_id, n.n
"""


def q_global_median_lineitem(sf_dir: str):
    """EXACT global median (lower median, the (n-1)//2+1-th smallest) of
    price cents via iterative histogram refinement
    (stages/selection.py::exact_kth) — no global sort: each round ships
    one ~1k-bin histogram per block, never rows."""
    from ...stages.selection import exact_kth

    ds = _pq(sf_dir, "lineitem", ["l_extendedprice"])
    cents = ds.map_batches(
        lambda t: pa.table({"c": _cents(t.column("l_extendedprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    n = ds.count()
    med = exact_kth(cents, "c", (n - 1) // 2 + 1)
    return pa.table({"n": pa.array([n], type=pa.int64()),
                     "median_cents": pa.array([med], type=pa.int64())})


SQL_GLOBAL_MEDIAN_LINEITEM = """
WITH v AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c
           FROM lineitem)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n,
       (SELECT c FROM v ORDER BY c
        LIMIT 1 OFFSET (SELECT (COUNT(*)-1)//2 FROM v)) AS median_cents
"""


def q_pack_sequences_documents(sf_dir: str):
    """Sequence packing (LLM-training op): documents → fixed 512-token
    training packs by a distributed prefix scan (stages/packing.py) —
    range-bucket sums, driver exclusive scan over num_buckets scalars,
    broadcast offsets, in-bucket cumsum."""
    from ...functions.normalize import extract_all_matches
    from ...stages.packing import pack_sequences

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        ml = extract_all_matches(t.column("text"), "[a-z]+")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "tok_cnt": pa.array(
                np.asarray(pc.list_value_length(ml), dtype=np.int64))})

    counted = ds.map_batches(tok, batch_format="pyarrow", zero_copy_batch=True)
    return pack_sequences(counted, id_col="doc_id", count_col="tok_cnt",
                          budget=512)


SQL_PACK_SEQUENCES_DOCUMENTS = """
SELECT doc_id, tok_cnt, cum, (cum - tok_cnt) // 512 AS seq_id
FROM (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS tok_cnt,
         CAST(SUM(len(regexp_extract_all(text, '[a-z]+')))
              OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM documents)
"""


def q_asof_join_events_orders(sf_dir: str):
    """Distributed as-of join: each event → the latest order of the same
    customer placed at-or-before the event timestamp (tie: max o_orderkey).
    One bucket exchange + vectorized in-bucket merge (stages/temporal.py)."""
    from ...stages.temporal import asof_join

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: pa.table({
            "user_id": t.column("o_custkey"),
            "o_orderdate": t.column("o_orderdate"),
            "o_orderkey": t.column("o_orderkey"),
            "price_cents": _cents(t.column("o_totalprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return asof_join(ev, orders, key="user_id", left_ts="ts",
                     right_ts="o_orderdate",
                     left_cols=["user_id", "event_id"],
                     right_cols=["o_orderkey", "price_cents"],
                     right_tie="o_orderkey")


SQL_ASOF_JOIN_EVENTS_ORDERS = """
SELECT user_id, event_id, o_orderkey, price_cents FROM (
  SELECT e.user_id, e.event_id, o.o_orderkey,
         CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS price_cents,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
"""


def q_asof_forward_events_orders(sf_dir: str):
    """Forward as-of join (direction="forward"): each event → the user's
    NEXT high-value event (value > 200) at-or-after its timestamp —
    next-conversion attribution shape; the negated-time reuse of the
    one-pass merge. Tie at equal ts: max event_id."""
    from ...stages.temporal import asof_join

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    hi = ev.map_batches(
        lambda t: (lambda f: pa.table({
            "user_id": f.column("user_id"), "hts": f.column("ts"),
            "hi_event_id": f.column("event_id"),
            "hi_cents": _cents(f.column("value"))}))(
            t.filter(pc.greater(t.column("value"), 200.0))),
        batch_format="pyarrow", zero_copy_batch=True)
    return asof_join(ev, hi, key="user_id", left_ts="ts",
                     right_ts="hts",
                     left_cols=["user_id", "event_id"],
                     right_cols=["hi_event_id", "hi_cents"],
                     right_tie="hi_event_id", direction="forward")


SQL_ASOF_FORWARD_EVENTS_ORDERS = """
SELECT user_id, event_id, hi_event_id, hi_cents FROM (
  SELECT e.user_id, e.event_id, h.event_id AS hi_event_id,
         CAST(ROUND(h.value*100) AS BIGINT) AS hi_cents,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY h.ts ASC, h.event_id DESC) AS rn
  FROM events e JOIN events h
    ON h.user_id = e.user_id AND h.ts >= e.ts AND h.value > 200
) WHERE rn = 1
"""


def q_sessionize_events(sf_dir: str):
    """Gap-based sessionization (windowed streaming op a transcript pipeline
    needs for conversation segmentation): a >30-minute silence within a user
    starts a new session. Vectorized per bucket — cumsum of boundary flags +
    running position since the last boundary, no per-row Python."""
    from ...functions.rayutil import bucketed_group_apply, segment_starts

    GAP_US = 30 * 60 * 1_000_000
    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id"])

    def sessionize(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "user_id": pa.array([], type=pa.int64()),
                             "session_idx": pa.array([], type=pa.int64()),
                             "turn_in_session": pa.array([], type=pa.int64())})
        starts = segment_starts(bucket.column("user_id"))
        ts = np.asarray(bucket.column("ts")).view(np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > GAP_US
        new[starts] = True  # first event of every user opens a session
        sess = np.cumsum(new) - 1
        lens = np.diff(np.append(starts, n))
        sess_base = np.repeat(sess[starts], lens)
        idx = np.arange(n, dtype=np.int64)
        last_new = np.maximum.accumulate(np.where(new, idx, 0))
        return pa.table({
            "event_id": bucket.column("event_id"),
            "user_id": bucket.column("user_id"),
            "session_idx": pa.array(sess - sess_base),
            "turn_in_session": pa.array(idx - last_new),
        })

    return bucketed_group_apply(
        ds, "user_id", sessionize, num_buckets=64,
        sort_cols=[("ts", "ascending"), ("event_id", "ascending")])


SQL_SESSIONIZE_EVENTS = """
SELECT event_id, user_id, session_idx,
       CAST(row_number() OVER (PARTITION BY user_id, session_idx
                               ORDER BY ts, event_id) - 1 AS BIGINT)
         AS turn_in_session
FROM (
  SELECT event_id, user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
           AS session_idx
  FROM (
    SELECT event_id, user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
"""


def q_sentence_split_documents(sf_dir: str):
    """Sentence splitting (SURVEY §2.2: REL's segtok-style splitter inside
    find_mentions): split → one row per sentence (flat_map, vectorized via
    list-flatten instead of per-row Python)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def split(t: pa.Table) -> pa.Table:
        sents = pc.split_pattern_regex(t.column("text"), r"[.!?]+\s+")
        lens = pc.list_value_length(sents)
        doc_ids = t.column("doc_id").take(
            pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64),
                               np.asarray(lens, dtype=np.int64))))
        return pa.table({"doc_id": doc_ids,
                         "sentence": pc.list_flatten(sents)})

    return ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)


SQL_SENTENCE_SPLIT_DOCUMENTS = r"""
SELECT doc_id, unnest(regexp_split_to_array(text, '[.!?]+\s+')) AS sentence
FROM documents
"""


def q_extract_tokens_documents(sf_dir: str):
    """Multi-match span exploder (the find_mentions-parity kernel,
    REL:src/REL/mention_detection.py::MentionDetection.find_mentions): ALL
    regex matches per document exploded to (doc_id, span_idx, token) rows.
    Same kernel the flagship's multi-mention explosion uses
    (functions.normalize.extract_all_matches)."""
    from ...functions.normalize import extract_all_matches

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ml = extract_all_matches(t.column("text"), r"[a-z]{6,}")
        lens = np.asarray(pc.list_value_length(ml), dtype=np.int64)
        doc_ids = t.column("doc_id").take(
            pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)))
        starts = np.cumsum(lens) - lens
        span = (np.arange(int(lens.sum()), dtype=np.int64)
                - np.repeat(starts, lens))
        return pa.table({"doc_id": doc_ids,
                         "span_idx": pa.array(span + 1),  # 1-based (SQL parity)
                         "token": pc.list_flatten(ml)})

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


SQL_EXTRACT_TOKENS_DOCUMENTS = """
SELECT doc_id,
       generate_subscripts(regexp_extract_all(text, '[a-z]{6,}'), 1) AS span_idx,
       unnest(regexp_extract_all(text, '[a-z]{6,}')) AS token
FROM documents
"""


def q_union_sum(sf_dir: str):
    """Set-op parity (SURVEY §2.7: merge of prior sources with count-sum on
    overlap, REL:src/REL/wikipedia_yago_freq.py::compute_custom): two derived
    row sources unioned, then summed per key."""
    li = _pq(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
    pt = _pq(sf_dir, "part", ["p_partkey", "p_retailprice"])
    a = li.map_batches(
        lambda t: pa.table({"partkey": t.column("l_partkey"),
                            "amount_cents": _cents(t.column("l_extendedprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    b = pt.map_batches(
        lambda t: pa.table({"partkey": pc.cast(t.column("p_partkey"), pa.int64()),
                            "amount_cents": _cents(t.column("p_retailprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    agg = a.union(b).groupby("partkey").aggregate(Sum("amount_cents"), Count())
    return agg.map_batches(
        lambda t: t.rename_columns(["partkey", "total_cents", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_UNION_SUM = """
SELECT partkey, CAST(SUM(amount_cents) AS BIGINT) AS total_cents,
       COUNT(*) AS cnt
FROM (
  SELECT l_partkey AS partkey,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS amount_cents FROM lineitem
  UNION ALL
  SELECT CAST(p_partkey AS BIGINT) AS partkey,
         CAST(ROUND(p_retailprice*100) AS BIGINT) AS amount_cents FROM part)
GROUP BY partkey
"""


def q_sample_lineitem(sf_dir: str):
    """Deterministic 10% row sample via the module's Knuth hash over the
    (l_orderkey, l_linenumber) row key (SURVEY §2.6). Membership depends
    only on the row key — reproducible across runs, retries and cluster
    sizes, and VALUE-EXACT vs the integer-arithmetic SQL twin
    (stages/sampling.py::sample_bucket; ``Dataset.random_sample`` stays
    available for per-execution seeding but is not oracle-comparable)."""
    from ...stages.sampling import sample_bucket

    ds = _pq(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])

    def filt(t: pa.Table) -> pa.Table:
        # TPC-H l_linenumber is 1..7, so orderkey*8+linenumber is unique.
        key = pc.add(pc.multiply(pc.cast(t.column("l_orderkey"), pa.int64()),
                                 pa.scalar(8, type=pa.int64())),
                     pc.cast(t.column("l_linenumber"), pa.int64()))
        keep = pa.array(sample_bucket(key) < 1000)
        t = t.filter(keep)
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "l_linenumber": pc.cast(t.column("l_linenumber"),
                                                 pa.int64()),
                         "qty_cents": _cents(t.column("l_quantity"))})

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


SQL_SAMPLE_LINEITEM = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_cents
FROM lineitem
WHERE ((((l_orderkey*8 + l_linenumber) % 2147483648 + 2147483648) % 2147483648)
       * 2654435761 % 2147483648) % 10000 < 1000
"""


# ---------------------------------------------------------------------------
# dedup family (training-data ops, SURVEY §2.7)
# ---------------------------------------------------------------------------

