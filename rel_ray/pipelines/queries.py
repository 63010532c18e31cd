"""Driver-contract query registry: every operator from SURVEY.md §2 exposed as
a callable over the driver's testdata tables, with a DuckDB oracle SQL string
where ANSI-SQL can express the same computation.

Conventions that make the driver's value-hash comparison deterministic:
  * money aggregates are integer cents, rounded per-row BEFORE summation
    (float sums are order-dependent; int sums are exact);
  * every computed column is named identically in the Ray code and the SQL;
  * ties in any top-k / rank are broken by an explicit id column.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..config import DEFAULT_CONFIG as CFG
from ..stages.textstats import _LANG_MARKERS


def _pq(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _pq_nrows(sf_dir: str, table: str) -> int:
    """Row count straight from parquet footer metadata (no read)."""
    import pyarrow.parquet as pq
    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def _cents(x) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(x, 100)), pa.int64())


# ---------------------------------------------------------------------------
# relational parity (REL store-build analytics analogs, SURVEY §2.5/2.6)
# ---------------------------------------------------------------------------

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
    from ..functions.rayutil import global_topk
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
    from ..functions.rayutil import bucketed_group_apply, segment_starts

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
    from ..functions.rayutil import bucketed_group_apply, segment_starts

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
    from ..functions.rayutil import bucketed_group_apply, segment_starts

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

    from ..functions.rayutil import bucketed_group_apply, segment_starts

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
    from ..stages.sketches import quantile_sketch, sketch_quantile

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
    from ..stages.sketches import _qs_nbins

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
    from ..functions.normalize import extract_all_matches

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
    from ..functions.rayutil import global_topk
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
    from ..functions.normalize import extract_all_matches
    from ..functions.rayutil import global_topk

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

    from ..functions.normalize import extract_all_matches
    from ..functions.rayutil import collect_table, get_broadcast, global_topk

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
    from ..functions.rayutil import bucketed_group_apply, segment_starts

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
    from ..stages.selection import exact_kth

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
    from ..functions.normalize import extract_all_matches
    from ..stages.packing import pack_sequences

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
    from ..stages.temporal import asof_join

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
    from ..stages.temporal import asof_join

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
    from ..functions.rayutil import bucketed_group_apply, segment_starts

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
    from ..functions.normalize import extract_all_matches

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
    from ..stages.sampling import sample_bucket

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

def q_exact_dedup_documents(sf_dir: str):
    from ..stages.dedup import exact_dedup
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(ds, id_col="doc_id", text_col="text")


SQL_EXACT_DEDUP_DOCUMENTS = """
SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
"""


def q_dup_pairs_documents(sf_dir: str):
    """Exact-duplicate pairs: segment pair enumeration inside hash buckets
    (the CC edge oracle). Bucketed — no per-distinct-text map_groups; the
    Python loop runs only over multi-row segments (actual duplicate groups),
    never over distinct keys."""
    from ..functions.rayutil import bucketed_group_apply, segment_starts

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def pairs(bucket: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64())})
        n = bucket.num_rows
        if n == 0:
            return empty
        starts = segment_starts(bucket.column("text"))
        lens = np.diff(np.append(starts, n))
        ids = bucket.column("doc_id").to_numpy()  # asc within segment
        ia, ib = [], []
        for s, ln in zip(starts[lens > 1], lens[lens > 1]):
            seg = ids[s : s + ln]
            iu, ju = np.triu_indices(int(ln), k=1)
            ia.append(seg[iu])
            ib.append(seg[ju])
        if not ia:
            return empty
        return pa.table({"id_a": pa.array(np.concatenate(ia)),
                         "id_b": pa.array(np.concatenate(ib))})

    out = bucketed_group_apply(ds, "text", pairs, num_buckets=64,
                               sort_cols=[("doc_id", "ascending")])
    base = pa.table({"id_a": pa.array([], type=pa.int64()),
                     "id_b": pa.array([], type=pa.int64())})
    tabs = [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables([base] + tabs, promote_options="default")


SQL_DUP_PAIRS_DOCUMENTS = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM documents a JOIN documents b ON a.text = b.text AND a.doc_id < b.doc_id
"""


def q_ngram_jaccard_pairs_documents(sf_dir: str):
    """EXACT n-gram-Jaccard similarity self-join (AllPairs prefix filter):
    every doc pair whose distinct word-trigram shingle sets have Jaccard
    >= 0.5 — integer (inter, uni) so the DuckDB oracle hash-matches.

    The deterministic counterpart of minhash_dedup (LSH proposes, this
    proves); REL parity: exact candidate verification after pruning
    (REL:src/REL/mention_detection.py candidate lookup + exact scoring)."""
    from ..stages.simjoin import similarity_self_join
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    # NOT adaptive-bucketed: SegmentAllPairs is compute-heavy (quadratic per
    # shared-prefix segment), so many small buckets are load-balancing, not
    # overhead — measured 3x slower at 40 buckets than at 256 on sf0.1
    return similarity_self_join(ds, id_col="doc_id", text_col="text",
                                tau_num=1, tau_den=2,
                                token_pattern="[a-z]+", ngram=3)


SQL_NGRAM_JACCARD_PAIRS_DOCUMENTS = """
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS tok
  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS s(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ovl
  FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       CAST(c.ovl AS BIGINT) AS inter,
       CAST(sa.sz + sb.sz - c.ovl AS BIGINT) AS uni
FROM cand c
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE 2 * c.ovl >= (sa.sz + sb.sz - c.ovl)
"""


def q_containment_pairs_documents(sf_dir: str):
    """ASYMMETRIC containment self-join: ordered pairs (a, b) where >= 3/4
    of a's word-trigram shingles appear in b — the quote/boilerplate/subset
    detection op symmetric Jaccard misses (a paragraph quoted inside a long
    page has tiny Jaccard but containment ~ 1). AllPairs prefix filter on
    the probe side, full-code index on the container side, one prefix-code
    exchange (stages/simjoin.py::containment_self_join)."""
    from ..stages.simjoin import containment_self_join
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return containment_self_join(ds, id_col="doc_id", text_col="text",
                                 tau_num=3, tau_den=4)


SQL_CONTAINMENT_PAIRS_DOCUMENTS = """
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS tok
  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS s(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ovl
  FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       CAST(c.ovl AS BIGINT) AS inter,
       CAST(sa.sz AS BIGINT) AS uni
FROM cand c
JOIN sizes sa ON sa.doc_id = c.id_a
WHERE 4 * c.ovl >= 3 * sa.sz
"""


def q_cross_dedup_documents(sf_dir: str):
    """Incremental dedup: exact n-gram-Jaccard join of a NEW corpus (odd
    doc_ids) against the EXISTING corpus (even doc_ids) — every (new, base)
    pair with word-trigram Jaccard >= 0.5, integer (inter, uni) so the
    DuckDB oracle hash-matches. The dedup-new-crawl-against-training-set
    primitive (stages/simjoin.py::similarity_cross_join)."""
    from ..stages.simjoin import similarity_cross_join

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def split(odd: bool):
        def f(t: pa.Table) -> pa.Table:
            m = (t.column("doc_id").to_numpy() % 2) == 1
            return t.filter(pa.array(m if odd else ~m))
        return f

    new = docs.map_batches(split(True), batch_format="pyarrow",
                           zero_copy_batch=True)
    base = docs.map_batches(split(False), batch_format="pyarrow",
                            zero_copy_batch=True)
    return similarity_cross_join(new, base, id_col="doc_id", text_col="text",
                                 tau_num=1, tau_den=2,
                                 token_pattern="[a-z]+", ngram=3)


SQL_CROSS_DEDUP_DOCUMENTS = """
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS tok
  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS s(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ovl
  FROM sh a JOIN sh b ON a.tok = b.tok
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       CAST(c.ovl AS BIGINT) AS inter,
       CAST(sa.sz + sb.sz - c.ovl AS BIGINT) AS uni
FROM cand c
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE 2 * c.ovl >= (sa.sz + sb.sz - c.ovl)
"""


def q_minhash_dedup_documents(sf_dir: str):
    """MinHash/LSH near-dedup over documents (no SQL oracle: LSH keys)."""
    from ..stages.dedup import near_dedup_minhash
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return near_dedup_minhash(ds, id_col="doc_id", text_col="text", cfg=CFG,
                              threshold=0.7)


def q_simhash_documents(sf_dir: str):
    """64-bit SimHash per document (no SQL oracle)."""
    from ..stages.dedup import SimHashStage
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(SimHashStage("text"), batch_format="pyarrow",
                          zero_copy_batch=True).map_batches(
        lambda t: t.select(["doc_id", "simhash"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_simhash_dedup_documents(sf_dir: str):
    """SimHash near-dedup (hamming ≤ 3 via 16-bit chunk pigeonhole blocking)."""
    from ..stages.dedup import near_dedup_simhash
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return near_dedup_simhash(ds, id_col="doc_id", text_col="text")


def q_embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-dup via sign-LSH buckets (no SQL oracle)."""
    from ..stages.similarity import embedding_near_dup
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_near_dup(ds, threshold=0.99, n_planes=6)


def q_knn_graph_embeddings(sf_dir: str):
    """EXACT kNN graph (every row's top-5 cosine neighbors) — the primitive
    under SemDeDup/diversity curation, in its auditable brute-force form.
    VALUE-EXACT ranking incl. k-boundary ties: integer-quantized components
    make dot/norms exact, cos = dot/sqrt(na*nb) is one exact-input IEEE
    sqrt+divide, identical in numpy and DuckDB
    (stages/similarity.py::knn_graph_exact)."""
    from ..stages.similarity import knn_graph_exact
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_graph_exact(ds, k=5, scale=100)


SQL_KNN_GRAPH_EMBEDDINGS = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> FLOOR(CAST(x AS DOUBLE)*100 + 0.5)) AS qe
  FROM embeddings
), n AS (
  SELECT vec_id, qe, list_dot_product(qe, qe) AS nn FROM q
), r AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         CAST(list_dot_product(a.qe, b.qe) AS BIGINT) AS dot_q,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_dot_product(a.qe, b.qe) / sqrt(a.nn * b.nn) DESC,
                    b.vec_id) AS rank
  FROM n a JOIN n b ON a.vec_id <> b.vec_id)
SELECT vec_id, neighbor_id, rank, dot_q FROM r WHERE rank <= 5
"""


def q_knn_graph_ivf_embeddings(sf_dir: str):
    """Approximate kNN graph at scale: IVF-bucketed self-join (each row
    shipped once to its home cell + nprobe query copies, per-cell BLAS,
    per-row top-k merge). Recall vs the exact graph pinned >= 0.9 in tests;
    rows-only oracle (stages/similarity.py::knn_graph_ivf)."""
    from ..stages.similarity import knn_graph_ivf
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_graph_ivf(ds, k=5, n_cells=16, nprobe=4)


def q_pq_encode_embeddings(sf_dir: str):
    """Product-quantize the embedding column: 64-dim float32 -> 8 uint8
    codes (32x compression; Jegou et al. TPAMI'11). Codebooks train on a
    seeded driver-side sample, ship once; encode is one stateless
    map_batches. Deterministic (seeded Lloyd's) but k-means is not
    SQL-expressible -> rows-only oracle; reconstruction error and recall
    pinned in pytest (stages/pq.py)."""
    from ..stages.pq import pq_encode, pq_train
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = pq_train(ds, m=8, n_codes=256, sample_size=2048, seed=42)
    return pq_encode(ds, books)


def q_pq_ann_topk_embeddings(sf_dir: str):
    """ANN over PQ codes via asymmetric distance computation — search
    WITHOUT decompression: per query one (m, n_codes) table, per batch m
    uint8 gathers + a sum. Top-10 for the 5 lowest vec_ids; recall pinned
    in pytest, rows-only oracle (stages/pq.py::pq_ann_topk)."""
    from ..functions.rayutil import global_topk
    from ..stages.pq import pq_ann_topk, pq_encode, pq_train
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = pq_train(ds, m=8, n_codes=256, sample_size=2048, seed=42)
    enc = pq_encode(ds, books)
    qt = global_topk(ds, [("vec_id", "ascending")], 5)
    queries = {"ids": qt.column("vec_id").to_numpy().astype(np.int64),
               "vecs": np.stack([np.asarray(v, dtype=np.float64)
                                 for v in qt.column("embedding").to_pylist()])}
    out = pq_ann_topk(enc, queries, books, k=10)
    return out.map_batches(lambda t: t.select(["query_id", "vec_id", "rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def q_ivfpq_ann_topk_embeddings(sf_dir: str):
    """IVF-PQ ANN (the canonical billion-scale index: coarse cells + PQ on
    residuals, ADC within probed cells — Jegou et al. TPAMI'11 SectionV).
    Top-10 for the 5 lowest vec_ids at nprobe=4; shortlist recall pinned in
    pytest, rows-only oracle (stages/pq.py::ivfpq_build/ivfpq_ann_topk)."""
    from ..functions.rayutil import global_topk
    from ..stages.pq import ivfpq_ann_topk, ivfpq_build
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    enc, index = ivfpq_build(ds, n_cells=16, m=8, n_codes=256,
                             sample_size=2048, seed=42)
    qt = global_topk(ds, [("vec_id", "ascending")], 5)
    queries = {"ids": qt.column("vec_id").to_numpy().astype(np.int64),
               "vecs": np.stack([np.asarray(v, dtype=np.float64)
                                 for v in qt.column("embedding").to_pylist()])}
    out = ivfpq_ann_topk(enc, queries, index, k=10, nprobe=4)
    return out.map_batches(lambda t: t.select(["query_id", "vec_id", "rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def q_cosine_pairs_embeddings(sf_dir: str):
    """Exact cosine-threshold all-pairs join (the exact baseline companion
    to the LSH near-dup scale path). VALUE-EXACT: components quantized to
    integers, dot/norms exact in float64, threshold evaluated as the same
    left-associated expression the SQL twin uses
    (stages/similarity.py::cosine_pairs_exact)."""
    from ..stages.similarity import cosine_pairs_exact
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_pairs_exact(ds, threshold_permyriad=3500, scale=100)


SQL_COSINE_PAIRS_EMBEDDINGS = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> FLOOR(CAST(x AS DOUBLE)*100 + 0.5)) AS qe
  FROM embeddings
), n AS (
  SELECT vec_id, qe, list_dot_product(qe, qe) AS nn FROM q
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(list_dot_product(a.qe, b.qe) AS BIGINT) AS dot_q
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.qe, b.qe) > 0
  AND (10000.0*list_dot_product(a.qe, b.qe))
      * (10000.0*list_dot_product(a.qe, b.qe))
      >= (12250000.0 * a.nn) * b.nn
"""


def q_levenshtein_pairs_part(sf_dir: str):
    """Edit-distance <= 2 record-pair self-join on part names. The length
    band prefilter is lossless, so the oracle is the plain unblocked join;
    similarity is verified once per DISTINCT name pair through DuckDB's C++
    levenshtein kernel (bit-identical to the oracle by construction), then
    expanded to record pairs (stages/strjoin.py::string_sim_self_join)."""
    from ..stages.strjoin import string_sim_self_join
    ds = _pq(sf_dir, "part", ["p_partkey", "p_name"])
    return string_sim_self_join(ds, id_col="p_partkey", text_col="p_name",
                                metric="levenshtein", threshold=2,
                                score_col="dist")


SQL_LEVENSHTEIN_PAIRS_PART = """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b ON a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


def q_jw_pairs_part(sf_dir: str):
    """Blocked Jaro-Winkler >= 0.93 record-pair self-join on part names
    (first-character blocking is part of the declared semantics and is
    mirrored in the oracle; the JW kernel is DuckDB's own, so scores are
    bit-identical)."""
    from ..stages.strjoin import string_sim_self_join
    ds = _pq(sf_dir, "part", ["p_partkey", "p_name"])
    return string_sim_self_join(ds, id_col="p_partkey", text_col="p_name",
                                metric="jaro_winkler", threshold=0.93,
                                score_col="jw")


SQL_JW_PAIRS_PART = """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       jaro_winkler_similarity(a.p_name, b.p_name) AS jw
FROM part a JOIN part b
  ON a.p_partkey < b.p_partkey
 AND substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.93
"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def q_ann_topk_embeddings(sf_dir: str):
    """Brute-force cosine top-10 for the 5 lowest vec_ids (rank-only output)."""
    from ..stages.similarity import ann_topk
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    from ..functions.rayutil import global_topk
    qt = global_topk(ds, [("vec_id", "ascending")], 5)
    queries = {"ids": qt.column("vec_id").to_numpy().astype(np.int64),
               "vecs": np.stack([np.asarray(v, dtype=np.float64)
                                 for v in qt.column("embedding").to_pylist()])}
    return ann_topk(ds, queries, k=10)


SQL_ANN_TOPK_EMBEDDINGS = """
SELECT query_id, vec_id, rank FROM (
  SELECT q.qid AS query_id, e.vec_id AS vec_id,
         row_number() OVER (PARTITION BY q.qid
             ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                      e.vec_id ASC) AS rank
  FROM (SELECT vec_id qid, embedding qe FROM embeddings
        ORDER BY vec_id LIMIT 5) q
  CROSS JOIN embeddings e)
WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# text analysis (training-data ops)
# ---------------------------------------------------------------------------

def q_ann_topk_lsh_embeddings(sf_dir: str):
    """Scale-path ANN: sign-LSH bucketed search (rows-only — recall is
    traded for candidate reduction, so no exact oracle)."""
    from ..stages.similarity import ann_topk_lsh
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    from ..functions.rayutil import global_topk
    qt = global_topk(ds, [("vec_id", "ascending")], 5)
    queries = {"ids": qt.column("vec_id").to_numpy().astype(np.int64),
               "vecs": np.stack([np.asarray(v, dtype=np.float64)
                                 for v in qt.column("embedding").to_pylist()])}
    return ann_topk_lsh(ds, queries, k=10)


def q_ann_topk_ivf_embeddings(sf_dir: str):
    """IVF ANN: spherical-kmeans cells + nprobe probing (rows-only —
    recall-lossy by design; recall ≥0.9 measured in tests)."""
    from ..stages.similarity import ann_topk_ivf
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    from ..functions.rayutil import global_topk
    qt = global_topk(ds, [("vec_id", "ascending")], 5)
    queries = {"ids": qt.column("vec_id").to_numpy().astype(np.int64),
               "vecs": np.stack([np.asarray(v, dtype=np.float64)
                                 for v in qt.column("embedding").to_pylist()])}
    return ann_topk_ivf(ds, queries, k=10, n_cells=32, nprobe=6)


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means over the full embedding table
    (stages/similarity.py::kmeans): per-iteration streaming pass emitting
    O(k x dim) partial sums per batch, maximin deterministic init. Output:
    (vec_id, cluster) assignments. Rows-only check (iterative, not
    SQL-expressible); blob recovery, inertia monotonicity and determinism
    are pinned in tests/test_ops.py::test_kmeans_recovers_blobs."""
    from ..stages.similarity import kmeans

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    assigns, _C, _inertia = kmeans(ds, n_clusters=16, iters=5)
    return assigns



def q_label_centroids_embeddings(sf_dir: str):
    """Per-label embedding centroid (integer-exact partial sums; combiner
    → tiny merge groupby — the vectors never shuffle)."""
    from ..stages.similarity import grouped_centroids
    ds = _pq(sf_dir, "embeddings", ["label", "embedding"])
    return grouped_centroids(ds, group_col="label", vec_col="embedding")


SQL_LABEL_CENTROIDS_EMBEDDINGS = """
WITH u AS (
  SELECT CAST(label AS BIGINT) AS grp,
         UNNEST(generate_series(1, len(embedding))) - 1 AS dim,
         UNNEST(embedding) AS v
  FROM embeddings
)
SELECT grp AS "group", CAST(dim AS BIGINT) AS dim,
       CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_scaled,
       COUNT(*) AS n
FROM u GROUP BY 1, 2
"""


def q_train_split_documents(sf_dir: str):
    """Deterministic train/val/test split (reproducible across runs/workers:
    pure function of doc_id, no RNG state)."""
    ds = _pq(sf_dir, "documents", ["doc_id"])

    def split(t: pa.Table) -> pa.Table:
        m = pc.cast(t.column("doc_id"), pa.int64()).to_numpy() % 10
        lab = np.where(m < 8, "train", np.where(m == 8, "val", "test"))
        return pa.table({"doc_id": t.column("doc_id"),
                         "split": pa.array(lab, type=pa.string())})

    return ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)


SQL_TRAIN_SPLIT_DOCUMENTS = """
SELECT doc_id,
       CASE WHEN doc_id % 10 < 8 THEN 'train'
            WHEN doc_id % 10 = 8 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_leakage_safe_split_documents(sf_dir: str):
    """Leakage-safe split: near-duplicate documents (MinHash clusters) always
    land in the SAME split — the split key is the cluster id, not the doc id.
    The op a naive per-doc split silently gets wrong in training pipelines
    (near-dup train/test contamination). Rows-only (LSH clustering)."""
    from ..functions.shingles import string_hash_u64
    from ..stages.dedup import near_dedup_minhash

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    clusters = near_dedup_minhash(ds, id_col="doc_id", text_col="text",
                                  cfg=CFG, threshold=0.7)

    def split(t: pa.Table) -> pa.Table:
        h = np.asarray(string_hash_u64(t.column("cluster_id"))) % np.uint64(10)
        lab = np.where(h < 8, "train", np.where(h == 8, "val", "test"))
        return pa.table({"record_id": t.column("record_id"),
                         "cluster_id": t.column("cluster_id"),
                         "split": pa.array(lab, type=pa.string())})

    return clusters.map_batches(split, batch_format="pyarrow",
                                zero_copy_batch=True)


def q_normalize_documents(sf_dir: str):
    from ..functions.normalize import simple_normalize
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "text_norm": simple_normalize(t.column("text"))}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_NORMALIZE_DOCUMENTS = r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text_norm
FROM documents
"""


def q_token_count_documents(sf_dir: str):
    from ..functions.normalize import token_counts
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.cast(token_counts(t.column("text")), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_TOKEN_COUNT_DOCUMENTS = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
       END AS n_tokens
FROM documents
"""


def _stop_pattern() -> str:
    return r"\b(" + "|".join(_LANG_MARKERS["en"]) + r")\b"


def q_quality_counts_documents(sf_dir: str):
    """Integer quality features (char/punct/stopword counts) — the quality
    scorer's inputs, integer-valued so the oracle hashes exactly."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        text = t.column("text")
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        stripped = pc.replace_substring_regex(text, r"[^\w\s]", "")
        n_punct = pc.subtract(n_chars, pc.cast(pc.utf8_length(stripped), pa.int64()))
        n_stop = pc.cast(pc.count_substring_regex(pc.utf8_lower(text),
                                                  pattern=_stop_pattern()),
                         pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "n_chars": n_chars,
                         "n_punct": n_punct, "n_stop": n_stop})

    return ds.map_batches(feats, batch_format="pyarrow", zero_copy_batch=True)


def q_quality_classifier_documents(sf_dir: str):
    """Batched model inference (stages/inference.py::LinearClassifier): an
    actor-pool stage scoring every document with a quantized linear quality
    classifier — integer weights over integer text features, weights fetched
    from the object store once per actor. keep = logit >= 0. Integer logit
    so the DuckDB oracle hash-matches bit-for-bit."""
    from ..stages.inference import quality_classifier

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return quality_classifier(ds)


SQL_QUALITY_CLASSIFIER_DOCUMENTS = (
    r"""
SELECT doc_id,
       (-30 + 1*n_tokens + 8*n_stop - 6*n_punct) AS logit,
       (-30 + 1*n_tokens + 8*n_stop - 6*n_punct) >= 0 AS is_keep
FROM (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
         END AS n_tokens,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
         CAST(array_length(regexp_extract_all(lower(text), '"""
    + _stop_pattern().replace("'", "''")
    + r"""')) AS BIGINT) AS n_stop
  FROM documents)
"""
)


def q_gru_embed_documents(sf_dir: str):
    """Batched byte-level GRU encoder (stages/inference.py::gru_encode — the
    REL MulRelRanker GRU-head analog): one recurrence over the whole batch,
    zero-copy byte tokens from the Arrow buffers. Rows-only check (float
    embeddings have no SQL equivalent); determinism and batch-invariance are
    pinned in tests/test_inference.py."""
    from ..stages.inference import gru_encode

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def embed(t: pa.Table) -> pa.Table:
        emb = gru_encode(t.column("text"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), type=pa.float32()), emb.shape[1]),
        })

    return ds.map_batches(embed, batch_format="pyarrow", zero_copy_batch=True)


SQL_QUALITY_COUNTS_DOCUMENTS = (
    r"""
SELECT doc_id,
       length(text) AS n_chars,
       length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
       CAST(array_length(regexp_extract_all(lower(text), '"""
    + _stop_pattern().replace("'", "''")
    + r"""')) AS BIGINT) AS n_stop
FROM documents
"""
)


def q_lang_id_documents(sf_dir: str):
    from ..stages.textstats import lang_id
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "lang_pred": lang_id(t.column("text"))}),
        batch_format="pyarrow", zero_copy_batch=True)


def _lang_sql() -> str:
    langs = list(_LANG_MARKERS)
    counts = []
    for lang in langs:
        pat = (r"\b(" + "|".join(_LANG_MARKERS[lang]) + r")\b").replace("'", "''")
        counts.append(
            f"CAST(array_length(regexp_extract_all(lower(text), '{pat}')) AS BIGINT)"
            f" AS c_{lang}")
    # numpy argmax tie-break = first max in langs order → chained CASE
    case = ["CASE WHEN " + " AND ".join(f"c_{l} = 0" for l in langs) + " THEN 'und'"]
    for i, lang in enumerate(langs):
        rest = langs[i + 1:]
        cond = " AND ".join([f"c_{lang} >= c_{r}" for r in rest]) or "TRUE"
        case.append(f"WHEN {cond} THEN '{lang}'")
    case.append("END AS lang_pred")
    return (f"SELECT doc_id, {' '.join(case)} FROM "
            f"(SELECT doc_id, text, {', '.join(counts)} FROM documents)")


def q_fingerprint_documents(sf_dir: str):
    """Winnowing fingerprint count + order-sensitive doc hash (no SQL oracle)."""
    from ..stages.textstats import fingerprint_winnow, rolling_text_hash
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        prints = fingerprint_winnow(text)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_fingerprints": pc.cast(pc.list_value_length(prints), pa.int64()),
            "doc_hash": rolling_text_hash(text),
        })

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def q_textstats_documents(sf_dir: str):
    """Full text-analysis column set. The float columns are single IEEE-754
    double operations over integer counts (divisions, *4.0, min, +, /3.0),
    which numpy and DuckDB round identically — so the oracle is VALUE-EXACT.
    doc_hash (splitmix-chained, not SQL-expressible) is excluded here; it is
    exercised by fingerprint_documents."""
    from ..stages.textstats import TextStats
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    cols = ["doc_id", "n_chars", "n_tokens", "punct_ratio", "stop_ratio",
            "mean_word_len", "quality", "lang_pred", "n_subtokens"]
    return ds.map_batches(TextStats("doc_id", "text"), batch_format="pyarrow",
                          zero_copy_batch=True).map_batches(
        lambda t: t.select(cols), batch_format="pyarrow", zero_copy_batch=True)


def _textstats_sql() -> str:
    """DuckDB twin of TextStats (minus doc_hash): same integer counts, same
    double-precision formula graph, same argmax tie-break as _lang_sql."""
    langs = list(_LANG_MARKERS)
    count_exprs = []
    for lang in langs:
        pat = (r"\b(" + "|".join(_LANG_MARKERS[lang]) + r")\b").replace("'", "''")
        count_exprs.append(
            f"CAST(array_length(regexp_extract_all(lower(text), '{pat}')) AS BIGINT)"
            f" AS c_{lang}")
    case = ["CASE WHEN " + " AND ".join(f"c_{l} = 0" for l in langs)
            + " THEN 'und'"]
    for i, lang in enumerate(langs):
        rest = langs[i + 1:]
        cond = " AND ".join([f"c_{lang} >= c_{r}" for r in rest]) or "TRUE"
        case.append(f"WHEN {cond} THEN '{lang}'")
    case.append("END AS lang_pred")
    stop_pat = _stop_pattern().replace("'", "''")
    tok = (r"CAST(CASE WHEN trim(text) = '' THEN 0 "
           r"ELSE array_length(regexp_split_to_array(trim(text), '\s+')) "
           r"END AS BIGINT)")
    return rf"""
SELECT doc_id, n_chars, n_tokens,
       punct_ratio, stop_ratio, mean_word_len,
       (LEAST(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
        + (1.0 - LEAST(punct_ratio * 4.0, 1.0))
        + LEAST(stop_ratio * 4.0, 1.0)) / 3.0 AS quality,
       lang_pred, n_subtokens
FROM (
  SELECT doc_id, n_chars, n_tokens, n_subtokens,
         CAST(n_punct AS DOUBLE) / GREATEST(CAST(n_chars AS DOUBLE), 1.0)
           AS punct_ratio,
         CAST(n_stop AS DOUBLE) / GREATEST(CAST(n_tokens AS DOUBLE), 1.0)
           AS stop_ratio,
         (CAST(n_chars AS DOUBLE) - GREATEST(CAST(n_tokens AS DOUBLE) - 1.0, 0.0))
           / GREATEST(CAST(n_tokens AS DOUBLE), 1.0) AS mean_word_len,
         {' '.join(case)}
  FROM (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           {tok} AS n_tokens,
           CAST(length(text)
                - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS BIGINT)
             AS n_punct,
           CAST(array_length(regexp_extract_all(lower(text), '{stop_pat}'))
                AS BIGINT) AS n_stop,
           CAST(array_length(regexp_extract_all(text,
                '[A-Za-z]+|\d+|[^\sA-Za-z\d]+')) AS BIGINT) AS n_subtokens,
           {', '.join(count_exprs)}
    FROM documents))
"""


def q_multimodal_features(sf_dir: str):
    """Multimodal decode + frame-sample over REAL encoded payloads (rows-only:
    byte parsing is not SQL-expressible): the media parquet carries actual
    24-bit BMP images and 16-bit PCM WAV tones, decoded by the pure-numpy
    codecs (stages/multimodal.decode_bmp/decode_wav — known-answer pinned in
    tests/test_ops.py). Written once per sf_dir under /tmp, then read_parquet
    → actor-pool decode (small batches for binary payloads) → per-frame
    explode by duration metadata."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from ..stages.multimodal import (decode_stage, frame_sample_stage,
                                     synth_real_media_table)

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:10]
    path = f"/tmp/relray_media_real_{tag}.parquet"
    if not os.path.exists(path):
        pq.write_table(synth_real_media_table(256, seed=42), path)
    media = rd.read_parquet(path)
    feats = decode_stage(media, fake=False, dim=32, batch_size=64)
    frames = frame_sample_stage(rd.read_parquet(path), every_ms=5000)
    frame_counts = frames.groupby("media_id").count().map_batches(
        lambda t: t.rename_columns(["media_id", "n_frames"]),
        batch_format="pyarrow", zero_copy_batch=True)
    # feature summary keeps the result hash-stable without list columns:
    # mean feature value per media row (float32 sum of a fixed-size list)
    def summarize(t: pa.Table) -> pa.Table:
        f = t.column("features")
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        m = np.asarray(f.values, dtype=np.float32).reshape(t.num_rows, -1)
        return pa.table({
            "media_id": t.column("media_id"),
            "kind": t.column("kind"),
            "n_bytes": t.column("n_bytes"),
            "feat_mean": pa.array(m.mean(axis=1)),
        })

    summary = feats.map_batches(summarize, batch_format="pyarrow",
                                zero_copy_batch=True)
    # broadcast the small frame-count table and attach (join-free)
    import ray as _ray

    from ..functions.rayutil import collect_table, dict_lookup, get_broadcast_dict
    fc_schema = pa.schema([("media_id", pa.int64()), ("n_frames", pa.int64())])
    fc_tab = collect_table(frame_counts, fc_schema)
    fc_ref = _ray.put(pa.table({
        "media_id": pc.cast(fc_tab.column("media_id"), pa.string()),
        "n_frames": fc_tab.column("n_frames")}))

    def attach(t: pa.Table) -> pa.Table:
        d = get_broadcast_dict(fc_ref, "media_id", "n_frames")
        nf = dict_lookup(pc.cast(t.column("media_id"), pa.string()), d,
                         default=0, value_type=pa.int64())
        return t.append_column("n_frames", nf)

    return summary.map_batches(attach, batch_format="pyarrow",
                               zero_copy_batch=True)


# ---------------------------------------------------------------------------
# the flagship linkage pipeline over a transcripts-shaped table derived
# deterministically from the events table (BASELINE.json:input_hint shape)
# ---------------------------------------------------------------------------

_ROLE_BY_EVENT = {"click": "user", "view": "user", "signup": "user",
                  "purchase": "assistant", "error": "tool"}

_EVENT_TEMPLATES = [
    "ok, i will check with {m} about the schedule tomorrow.",
    "as discussed, {m} sent the revised draft earlier today.",
    "the ticket was reassigned to {m} after the standup.",
    "per the notes, {m} approved the deployment window.",
    "reminder: {m} owns the follow-up on this thread.",
]


def transcripts_from_events(sf_dir: str):
    """Deterministic transcripts-shaped table synthesized from events
    (the input_hint schema; entity mentions injected as a pure function of
    event_id so clusters are non-trivial and reproducible)."""
    from ..synth import _make_entities

    rng = np.random.default_rng(42)
    entities = _make_entities(rng, 40)
    forms: list[str] = []
    for e in entities:
        forms.append(e["variants"][0])
        forms.append(e["variants"][1 % len(e["variants"])])
        forms.append(e["variants"][2 % len(e["variants"])])
    forms_arr = np.array(forms, dtype=object)  # 3 forms per entity, index = 3*e+v

    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def to_turns(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        etype = t.column("event_type").to_pylist()
        ent = (eid % 40) * 3 + (eid // 40) % 3
        texts = []
        roles = []
        tools = []
        for i, e in enumerate(etype):
            role = _ROLE_BY_EVENT.get(e, "user")
            roles.append(role)
            if role == "tool":
                tools.append(e)
                texts.append('{"status": "error", "code": 500}')
            else:
                tools.append("")
                m = forms_arr[ent[i]]
                texts.append(_EVENT_TEMPLATES[eid[i] % len(_EVENT_TEMPLATES)]
                             .format(m=m))
        conv = pc.binary_join_element_wise(
            pa.array(["c"] * t.num_rows),
            pc.utf8_lpad(pc.cast(t.column("user_id"), pa.string()), width=6,
                         padding="0"), "")
        return pa.table({
            "conv_id": conv,
            "event_id": t.column("event_id"),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": t.column("ts"),
        })

    turns = ds.map_batches(to_turns, batch_format="pyarrow", zero_copy_batch=True)

    from ..functions.rayutil import bucketed_group_apply, segment_starts

    def assign_turn_idx(bucket: pa.Table) -> pa.Table:
        # sorted by (conv_id, ts, event_id); turn_idx = ragged arange
        n = bucket.num_rows
        if n == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "turn_idx": pa.array([], type=pa.int32()),
                "role": pa.array([], type=pa.string()),
                "text": pa.array([], type=pa.string()),
                "tool": pa.array([], type=pa.string()),
                "ts": pa.array([], type=pa.timestamp("us")),
            })
        starts = segment_starts(bucket.column("conv_id"))
        lens = np.diff(np.append(starts, n))
        seg_start_per_row = np.repeat(np.cumsum(lens) - lens, lens)
        turn_idx = (np.arange(n, dtype=np.int64) - seg_start_per_row).astype(np.int32)
        return pa.table({
            "conv_id": bucket.column("conv_id"),
            "turn_idx": pa.array(turn_idx),
            "role": bucket.column("role"),
            "text": bucket.column("text"),
            "tool": bucket.column("tool"),
            "ts": bucket.column("ts"),
        })

    return bucketed_group_apply(
        turns, "conv_id", assign_turn_idx, num_buckets=256,
        sort_cols=[("ts", "ascending"), ("event_id", "ascending")])


def q_linkage_clusters(sf_dir: str):
    """Flagship: full record-linkage pipeline on the events-derived
    transcripts (no SQL oracle — LSH + iterative CC)."""
    from .linkage import run_linkage
    tr = transcripts_from_events(sf_dir)
    out = run_linkage(tr, CFG)
    return out["clusters"]


def q_train_pair_scorer(sf_dir: str):
    """REL training-path analog (pipelines/eval.py::train_pair_weights):
    distributed logistic regression over UNGATED pair features
    (threshold=0 disables the exact JW gate) for the labeled fixture's
    train split — per-batch gradient partial sums, driver full-batch
    steps. Returns learned weights/bias + train accuracy as one row.
    Rows-only (float fixpoint)."""
    import dataclasses

    import ray.data as rd

    from ..functions.rayutil import dict_lookup
    from ..stages.blocking import records_stage
    from ..stages.conversation import conversation_stage
    from ..stages.scoring import scoring_stage
    from ..synth import generate_corpus
    from .eval import train_pair_weights

    tables = generate_corpus(seed=31, n_convs=200)
    turns = conversation_stage(rd.from_arrow(tables["transcripts"]), CFG)
    recs = pa.concat_tables(
        [pa.table(b) for b in records_stage(turns, CFG)
         .iter_batches(batch_format="pyarrow")])
    mn_of = dict(zip(recs.column("record_id").to_pylist(),
                     recs.column("mention_norm").to_pylist()))

    # the fixture's calibration split is the training set (the test
    # split stays untouched for the F1 gate)
    lab = tables["labels"].filter(
        pc.equal(tables["labels"].column("split"), "calib"))
    pairs = pa.table({
        "id_a": lab.column("id_a"), "id_b": lab.column("id_b"),
        "mn_a": dict_lookup(lab.column("id_a"), mn_of, default=""),
        "mn_b": dict_lookup(lab.column("id_b"), mn_of, default=""),
        "same_entity": lab.column("same_entity")})
    pairs = pairs.filter(pc.and_(pc.not_equal(pairs.column("mn_a"), ""),
                                 pc.not_equal(pairs.column("mn_b"), "")))
    y_of = dict(zip(
        pc.binary_join_element_wise(pairs.column("id_a"),
                                    pairs.column("id_b"), "|").to_pylist(),
        pairs.column("same_entity").to_pylist()))

    ungated = dataclasses.replace(CFG, threshold=0.0)
    feats = scoring_stage(
        rd.from_arrow(pairs.select(["id_a", "id_b", "mn_a", "mn_b"])),
        ungated)

    def attach_y(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(t.column("id_a"),
                                        t.column("id_b"), "|")
        return t.append_column(
            "same_entity",
            dict_lookup(k, y_of, value_type=pa.bool_()))

    labeled = feats.map_batches(attach_y, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    res = train_pair_weights(labeled)
    return pa.table({
        **{f"w_{k}": pa.array([v]) for k, v in res["weights"].items()},
        "bias": pa.array([res["bias"]]),
        "train_accuracy": pa.array([res["accuracy"]]),
        "final_loss": pa.array([res["loss_curve"][-1]])})


def q_entity_summary(sf_dir: str):
    """The user-facing ENTITY TABLE (REL's end product, aggregated): one
    row per resolved entity — member count, distinct conversations, and
    the most frequent surface form (pipelines/linkage.py::entity_summary;
    one bucketed exchange computes all three stats vectorized).
    Rows-only (LSH-derived clusters)."""
    from .linkage import entity_summary, run_linkage

    out = run_linkage(transcripts_from_events(sf_dir), CFG)
    return entity_summary(out["clusters"], out["records"])


def q_blocking_metrics(sf_dir: str):
    """Blocking-quality report (pipelines/eval.py::blocking_metrics): pair
    completeness + reduction ratio of the flagship's LSH blocking against
    a deterministic labeled corpus (labels mapped to exact-precluster
    reps, same id space as the candidate pairs). Rows-only; the metric
    arithmetic is pinned in tests/test_eval.py."""
    import ray.data as rd

    from ..functions.rayutil import dict_lookup
    from ..synth import generate_corpus
    from .eval import blocking_metrics
    from .linkage import run_linkage

    tables = generate_corpus(seed=21, n_convs=300)
    out = run_linkage(rd.from_arrow(tables["transcripts"]), CFG)
    recs = pa.concat_tables(
        [pa.table(b) for b in out["records"]
         .iter_batches(batch_format="pyarrow")])
    rep_of = dict(zip(recs.column("record_id").to_pylist(),
                      recs.column("rep_id").to_pylist()))

    def to_reps(t: pa.Table) -> pa.Table:
        a = dict_lookup(t.column("id_a"), rep_of, default_to_key=True)
        b = dict_lookup(t.column("id_b"), rep_of, default_to_key=True)
        keep = pc.not_equal(a, b)  # same-rep pairs are matched pre-blocking
        return pa.table({"id_a": a, "id_b": b,
                         "same_entity": t.column("same_entity"),
                         "split": t.column("split")}).filter(keep)

    labels = rd.from_arrow(tables["labels"]).map_batches(
        to_reps, batch_format="pyarrow", zero_copy_batch=True)
    return blocking_metrics(out["pairs"], labels,
                            n_records=len(rep_of))


def q_incremental_link(sf_dir: str):
    """Incremental linkage (pipelines/incremental.py): resolve the
    even-user half of the corpus into a frozen entity store, then link the
    odd-user half against it — the daily-increment shape at 100 TB. Rows:
    one assignment per new record (record_id, cluster_id, matched_old).
    No SQL oracle (LSH blocking + iterative CC); invariants are pinned in
    tests/test_incremental.py."""
    from .incremental import build_entity_store, incremental_link
    from .linkage import run_linkage

    tr = transcripts_from_events(sf_dir)

    def split(even: bool):
        def f(t: pa.Table) -> pa.Table:
            n = pc.cast(pc.utf8_slice_codeunits(t.column("conv_id"), 1),
                        pa.int64())
            m = pc.equal(pc.bit_wise_and(n, 1), 0 if even else 1)
            return t.filter(m)
        return f

    old_tr = tr.map_batches(split(True), batch_format="pyarrow",
                            zero_copy_batch=True)
    new_tr = tr.map_batches(split(False), batch_format="pyarrow",
                            zero_copy_batch=True)
    store = build_entity_store(run_linkage(old_tr, CFG)).materialize()
    return incremental_link(new_tr, store, CFG)["assignments"]


def q_merge_stores_transcripts(sf_dir: str):
    """Entity-store MERGE (pipelines/incremental.py::merge_entity_stores):
    resolve the two corpus halves independently into frozen stores, then
    merge — shared surface forms bridge cluster ids, connected components
    over the skinny id graph pick the min-id survivor (the REL analog of
    combining two wiki-version p(e|m) stores). Rows-only (LSH-derived
    stores); bridging/transitivity/idempotence pinned in
    tests/test_incremental.py."""
    from .incremental import build_entity_store, merge_entity_stores
    from .linkage import run_linkage

    tr = transcripts_from_events(sf_dir)

    def split(even: bool):
        def f(t: pa.Table) -> pa.Table:
            n = pc.cast(pc.utf8_slice_codeunits(t.column("conv_id"), 1),
                        pa.int64())
            m = pc.equal(pc.bit_wise_and(n, 1), 0 if even else 1)
            return t.filter(m)
        return f

    a = build_entity_store(run_linkage(
        tr.map_batches(split(True), batch_format="pyarrow",
                       zero_copy_batch=True), CFG)).materialize()
    b = build_entity_store(run_linkage(
        tr.map_batches(split(False), batch_format="pyarrow",
                       zero_copy_batch=True), CFG)).materialize()
    return merge_entity_stores(a, b, CFG)


def q_linkage_edges(sf_dir: str):
    """Scored candidate edges from the flagship pipeline (no SQL oracle)."""
    from .linkage import run_linkage
    tr = transcripts_from_events(sf_dir)
    out = run_linkage(tr, CFG)
    return out["edges"]


def q_best_match_per_record(sf_dir: str):
    """Per-record argmax over incident candidate edges (SURVEY §2.6: REL's
    per-mention final-entity argmax, REL:src/REL/entity_disambiguation.py::
    predict). Ties break on (score desc, partner asc). Rows-only check."""
    from ..functions.rayutil import bucketed_group_apply, segment_starts
    from .linkage import run_linkage

    out = run_linkage(transcripts_from_events(sf_dir), CFG)
    edges = out["edges"]

    def explode(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"rec": t.column("id_a"), "partner": t.column("id_b"),
                      "score": t.column("score")}),
            pa.table({"rec": t.column("id_b"), "partner": t.column("id_a"),
                      "score": t.column("score")}),
        ])

    both = edges.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def argmax(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({"record_id": pa.array([], type=pa.string()),
                             "best_partner": pa.array([], type=pa.string()),
                             "best_score": pa.array([], type=pa.float32())})
        starts = pa.array(segment_starts(bucket.column("rec")))
        return pa.table({"record_id": bucket.column("rec").take(starts),
                         "best_partner": bucket.column("partner").take(starts),
                         "best_score": bucket.column("score").take(starts)})

    return bucketed_group_apply(
        both, "rec", argmax, num_buckets=64,
        sort_cols=[("score", "descending"), ("partner", "ascending")])


def q_context_windows_events(sf_dir: str):
    """ORACLE-EXACT slice of the flagship's S1+S2: events → transcripts
    derivation → conversation reconstruction → ctx windows → multi-mention
    explosion → span record_ids. Only the order-sensitive coref scan is
    excluded (not SQL-expressible); q_conversation_windows keeps it rows-only.
    """
    from ..stages.conversation import conversation_stage
    tr = transcripts_from_events(sf_dir)
    import dataclasses

    from ..functions.rayutil import adaptive_buckets
    cfg = dataclasses.replace(
        CFG, num_buckets=adaptive_buckets(_pq_nrows(sf_dir, "events"),
                                          CFG.num_buckets))
    out = conversation_stage(tr, cfg)
    return out.map_batches(
        lambda t: t.select(["record_id", "conv_id", "turn_idx", "mention",
                            "ctx_before", "ctx_after"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _context_windows_sql() -> str:
    """DuckDB twin of q_context_windows_events: reproduces the deterministic
    events→transcripts derivation (forms table inlined as VALUES), the
    (ts, event_id) turn ordering, the 2-turn/240-char context windows, and
    the sentinel-equivalent multi-mention explosion with span record ids."""
    from ..synth import _make_entities

    rng = np.random.default_rng(42)
    entities = _make_entities(rng, 40)
    forms: list[str] = []
    for e in entities:
        forms.append(e["variants"][0])
        forms.append(e["variants"][1 % len(e["variants"])])
        forms.append(e["variants"][2 % len(e["variants"])])
    values = ", ".join(f"({i}, '{f}')" for i, f in enumerate(forms))
    tpl_case = " ".join(
        f"WHEN {i} THEN replace('{t}', '{{m}}', f.form)"
        for i, t in enumerate(_EVENT_TEMPLATES))
    # MENTION_PATTERN with the single quote doubled for SQL
    pat = r"[A-Z][\w''.\-]*(?: [A-Z][\w''.\-]*)*"
    return rf"""
WITH forms(idx, form) AS (VALUES {values}),
turns AS (
  SELECT 'c' || lpad(CAST(e.user_id AS VARCHAR), 6, '0') AS conv_id,
         CAST(row_number() OVER (PARTITION BY e.user_id
                                 ORDER BY e.ts, e.event_id) - 1 AS INTEGER)
           AS turn_idx,
         CASE WHEN e.event_type = 'error' THEN '{{"status": "error", "code": 500}}'
              ELSE CASE e.event_id % 5 {tpl_case} END
         END AS text
  FROM events e
  LEFT JOIN forms f ON f.idx = (e.event_id % 40) * 3 + (e.event_id // 40) % 3
),
ctx AS (
  SELECT conv_id, turn_idx, text,
         trim(coalesce(lag(text, 2) OVER w, '') || ' '
              || coalesce(lag(text, 1) OVER w, '')) AS cb,
         trim(coalesce(lead(text, 1) OVER w, '') || ' '
              || coalesce(lead(text, 2) OVER w, '')) AS ca
  FROM turns
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
capped AS (
  SELECT conv_id, turn_idx, text,
         CASE WHEN length(cb) > 240 THEN substr(cb, length(cb) - 239) ELSE cb
         END AS ctx_before,
         substr(ca, 1, 240) AS ctx_after,
         regexp_extract_all(text, '{pat}') AS ms
  FROM ctx
)
SELECT conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 5, '0') || '#'
         || lpad(CAST(generate_subscripts(ms, 1) - 1 AS VARCHAR), 3, '0')
         AS record_id,
       conv_id, turn_idx, unnest(ms) AS mention, ctx_before, ctx_after
FROM capped WHERE len(ms) > 0
UNION ALL
SELECT conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 5, '0') || '#000'
         AS record_id,
       conv_id, turn_idx, '' AS mention, ctx_before, ctx_after
FROM capped WHERE len(ms) = 0
"""


def _conversation_windows_sql() -> str:
    """DuckDB twin of q_conversation_windows — extends the context-windows
    oracle with the order-sensitive `with_coref` scan
    (REL:src/REL/training_datasets.py::with_coref): the latest earlier
    record in the conversation whose normalized-mention token list differs
    and token-subset-matches (exact or dotted-abbreviation prefix,
    honorifics skipped on the later side). The engine's scan order equals
    record_id lexicographic order (zero-padded conv/turn/span), so
    "latest earlier match" is `max(earlier_id)` — a plain argmax join."""
    inner = _context_windows_sql()
    return rf"""
WITH recs0 AS ({inner}),
recs AS (
  SELECT *,
    regexp_replace(
      trim(regexp_replace(lower(mention), '\s+', ' ', 'g')),
      '^(dr|prof|ms|mr|mrs)\.? ', '') AS mn
  FROM recs0
),
pairs AS (
  SELECT l.record_id AS lid, e.record_id AS eid,
         str_split(l.mn, ' ') AS ltoks, str_split(e.mn, ' ') AS etoks
  FROM recs l JOIN recs e
    ON e.conv_id = l.conv_id AND e.record_id < l.record_id
  WHERE e.mn <> '' AND l.mn <> '' AND e.mn <> l.mn
),
coref AS (
  SELECT lid AS record_id, max(eid) AS coref_prev
  FROM pairs
  WHERE len(list_filter(ltoks, lt ->
          lt NOT IN ('dr','prof','ms','mr','mrs')
          AND len(list_filter(etoks, et ->
                et = lt OR (lt LIKE '%.'
                            AND starts_with(et, left(lt, length(lt)-1)))
              )) = 0
        )) = 0
  GROUP BY lid
)
SELECT r.record_id, r.conv_id, r.turn_idx, r.mention, r.ctx_before,
       r.ctx_after, coalesce(c.coref_prev, '') AS coref_prev
FROM recs r LEFT JOIN coref c USING (record_id)
"""


def q_conversation_windows(sf_dir: str):
    """Conversation reconstruction + context windows + `with_coref` scan over
    the events-derived transcripts — ORACLE-EXACT including the coref column
    (see _conversation_windows_sql)."""
    from ..stages.conversation import conversation_stage
    tr = transcripts_from_events(sf_dir)
    import dataclasses

    from ..functions.rayutil import adaptive_buckets
    cfg = dataclasses.replace(
        CFG, num_buckets=adaptive_buckets(_pq_nrows(sf_dir, "events"),
                                          CFG.num_buckets))
    out = conversation_stage(tr, cfg)
    return out.map_batches(
        lambda t: t.select(["record_id", "conv_id", "turn_idx", "mention",
                            "ctx_before", "ctx_after", "coref_prev"]),
        batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_range_join_events(sf_dir: str):
    """Attribution-window range join: every purchase within 1 hour at-or-after
    a view by the same user. One bucket exchange + one vectorized composite
    searchsorted per bucket (stages/temporal.py::range_join)."""
    from ..stages.temporal import range_join

    HOUR_US = 3_600_000_000
    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    purchases = ev.map_batches(
        lambda t: (lambda f: pa.table({
            "user_id": f.column("user_id"),
            "purchase_id": f.column("event_id"),
            "ts_us": pc.cast(f.column("ts"), pa.int64())}))(
                t.filter(pc.equal(t.column("event_type"), "purchase"))),
        batch_format="pyarrow", zero_copy_batch=True)
    views = ev.map_batches(
        lambda t: (lambda f, s: pa.table({
            "user_id": f.column("user_id"),
            "view_id": f.column("event_id"),
            "start_us": s,
            "end_us": pc.add(s, HOUR_US)}))(
                t.filter(pc.equal(t.column("event_type"), "view")),
                pc.cast(t.filter(pc.equal(t.column("event_type"), "view"))
                        .column("ts"), pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)
    return range_join(purchases, views, key="user_id", left_ts="ts_us",
                      right_start="start_us", right_end="end_us",
                      left_cols=["user_id", "purchase_id"],
                      right_cols=["view_id"])


SQL_RANGE_JOIN_EVENTS = """
SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id
FROM events p JOIN events v
  ON p.user_id = v.user_id
 AND p.event_type = 'purchase' AND v.event_type = 'view'
 AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR
"""


def q_tumbling_window_events(sf_dir: str):
    """Tumbling 1-hour windowed aggregate per user (the batch analog of a
    streaming window operator): window key computed vectorized (int64 floor
    division on the raw epoch-us), then ONE partial-combining groupby —
    Ray's Sum/Count aggregate pre-combines inside every block before the
    exchange, so the shuffle carries (user, window) partials, not events.
    Cents-quantized sum for a bit-exact oracle."""
    from ray.data.aggregate import Count, Sum

    HOUR_US = 3_600_000_000
    ds = _pq(sf_dir, "events", ["ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        ts = np.asarray(t.column("ts")).view(np.int64)
        return pa.table({
            "user_id": t.column("user_id"),
            "window_start_us": pa.array((ts // HOUR_US) * HOUR_US),
            "value_c": _cents(t.column("value")),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(["user_id", "window_start_us"])
           .aggregate(Sum("value_c"), Count()))
    return agg.map_batches(
        lambda t: t.rename_columns(["user_id", "window_start_us",
                                    "sum_value_cents", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_TUMBLING_WINDOW_EVENTS = """
SELECT user_id,
       CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS cnt
FROM events
GROUP BY 1, 2
"""


def q_rolling_window_events(sf_dir: str):
    """Per-user trailing 1-hour rolling count + cents-sum, SQL RANGE-frame
    semantics (equal timestamps are peers). One bucket exchange, two
    searchsorteds + one prefix sum per bucket (stages/temporal.py)."""
    from ..stages.temporal import rolling_window_agg

    HOUR_US = 3_600_000_000
    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    prep = ev.map_batches(
        lambda t: pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value_c": _cents(t.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return rolling_window_agg(prep, key="user_id", ts="ts", val_int="value_c",
                              window=HOUR_US,
                              carry_cols=["event_id", "user_id"])


SQL_ROLLING_WINDOW_EVENTS = """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS w_count,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS BIGINT) AS w_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_window_functions_events(sf_dir: str):
    """Partitioned window functions (SQL ROW_NUMBER / LAG / running SUM) —
    Ray Data has no window operator; stages/temporal.py::partitioned_window
    is the engine's: one bucket exchange on the partition key, then numpy
    over each sorted bucket (segment offsets, shift-with-mask lag, cumsum
    minus per-segment base). Cents-quantized value for a bit-exact oracle."""
    from ..stages.temporal import partitioned_window

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    prep = ev.map_batches(
        lambda t: pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value_c": _cents(t.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_window(prep, key="user_id", ts="ts", tie="event_id",
                              val_int="value_c",
                              carry_cols=["event_id", "user_id"])


SQL_WINDOW_FUNCTIONS_EVENTS = """
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS row_number,
       CAST(COALESCE(lag(CAST(ROUND(value*100) AS BIGINT)) OVER w, 0)
            AS BIGINT) AS lag_val,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_moving_sum_events(sf_dir: str):
    """Bounded ROWS-frame window (SUM OVER ... ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW): the row-count twin of the time-based rolling_window_agg.
    Same one-exchange partitioned_window kernel — the bounded frame is two
    numpy maxima over the already-computed global cumsum."""
    from ..stages.temporal import partitioned_window

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    prep = ev.map_batches(
        lambda t: pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value_c": _cents(t.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    out = partitioned_window(prep, key="user_id", ts="ts", tie="event_id",
                             val_int="value_c",
                             carry_cols=["event_id", "user_id"],
                             rows_preceding=3)
    return out.select_columns(["event_id", "user_id", "mov_sum"])


SQL_MOVING_SUM_EVENTS = """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS mov_sum
FROM events
"""


def q_string_agg_events(sf_dir: str):
    """Ordered grouped concatenation (SQL string_agg ... ORDER BY):
    stages/temporal.py::grouped_string_agg — per-user event-type history
    strings, list offsets straight from segment starts, pc.binary_join in
    C. The sequence-building shape a training pipeline uses to turn an
    event log into per-entity behavior strings."""
    from ..stages.temporal import grouped_string_agg

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    out = grouped_string_agg(ev, key="user_id", ts="ts", tie="event_id",
                             val="event_type", sep=",")
    return out.map_batches(
        lambda t: t.rename_columns(["user_id", "history"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_STRING_AGG_EVENTS = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS history
FROM events GROUP BY user_id
"""


def q_latest_event_per_user(sf_dir: str):
    """Dedup-by-recency (stages/dedup.py::keep_latest): each user's single
    newest event row, all columns carried — segment heads of one
    descending bucket sort. The merge-crawls "newest version wins" op."""
    from ..stages.dedup import keep_latest

    ev = _pq(sf_dir, "events",
             ["event_id", "ts", "user_id", "event_type", "value"])
    prep = ev.map_batches(
        lambda t: pa.table({
            "event_id": t.column("event_id"),
            "ts": t.column("ts"),
            "user_id": t.column("user_id"),
            "event_type": t.column("event_type"),
            "value_c": _cents(t.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return keep_latest(prep, key="user_id", order_cols=["ts", "event_id"])


SQL_LATEST_EVENT_PER_USER = """
SELECT event_id, ts, user_id, event_type,
       CAST(ROUND(value*100) AS BIGINT) AS value_c
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
"""


def q_ranked_events(sf_dir: str):
    """SQL ranking-window family (stages/temporal.py::grouped_rank):
    RANK / DENSE_RANK / PERCENT_RANK / NTILE(4) per user ordered by cents
    value — value-run change points for the tie-sharing ranks, integer
    tile arithmetic for SQL's uneven-tile rule; ties in NTILE pinned by
    the unique event_id (SQL leaves them unspecified)."""
    from ..stages.temporal import grouped_rank

    ev = _pq(sf_dir, "events", ["event_id", "user_id", "value"])
    prep = ev.map_batches(
        lambda t: pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "value_c": _cents(t.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return grouped_rank(prep, key="user_id", val="value_c", tie="event_id",
                        carry_cols=["event_id", "user_id"], tiles=4)


SQL_RANKED_EVENTS = """
SELECT event_id, user_id,
       CAST(rank() OVER w1 AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w1 AS BIGINT) AS dense_rnk,
       percent_rank() OVER w1 AS pct_rank,
       CAST(ntile(4) OVER w2 AS BIGINT) AS tile
FROM (SELECT event_id, user_id,
             CAST(ROUND(value*100) AS BIGINT) AS value_c FROM events)
WINDOW w1 AS (PARTITION BY user_id ORDER BY value_c),
       w2 AS (PARTITION BY user_id ORDER BY value_c, event_id)
"""


def q_session_agg_events(sf_dir: str):
    """Session-level aggregates (one row per gap-delimited session):
    stages/temporal.py::sessionize — break flags from one vectorized diff,
    per-session count/sum via add.reduceat, 0-based per-user session ids by
    searchsorted against key starts. The session-AGGREGATE shape a training
    pipeline uses for per-conversation stats (sessionize_events keeps the
    per-event shape)."""
    from ..stages.temporal import sessionize

    GAP_US = 30 * 60 * 1_000_000
    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    prep = ev.map_batches(
        lambda t: pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value_c": _cents(t.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return sessionize(prep, key="user_id", ts="ts", tie="event_id",
                      val_int="value_c", gap=GAP_US)


SQL_SESSION_AGG_EVENTS = """
WITH flagged AS (
  SELECT user_id, ts, CAST(ROUND(value*100) AS BIGINT) AS value_c,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, ts, value_c,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) - 1 AS sid
  FROM flagged)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS session_start,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(value_c) AS BIGINT) AS sum_val
FROM sessions GROUP BY user_id, sid
"""



def q_customers_no_urgent_orders(sf_dir: str):
    """Distributed anti join: customers with zero '1-URGENT' orders.
    Tagged-union bucket exchange + vectorized membership test
    (stages/joins.py::semi_anti_join) — right side never broadcast."""
    from ..stages.joins import semi_anti_join

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    urgent = _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    urgent = urgent.map_batches(
        lambda t: pa.table({"c_custkey": t.filter(
            pc.equal(t.column("o_orderpriority"), "1-URGENT"))
            .column("o_custkey")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return semi_anti_join(cust, urgent, key="c_custkey", anti=True)


SQL_CUSTOMERS_NO_URGENT_ORDERS = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


def q_customer_big_order_counts(sf_dir: str):
    """LEFT OUTER equi-join at scale (stages/joins.py::cogroup_inner_join
    how="left"): every customer keeps a row even with zero qualifying
    orders — one tagged-union bucket exchange, vectorized index_in join,
    null right-side propagated by Arrow take and COALESCEd to 0 (same
    expression on both sides so the value hash is exact)."""
    from ray.data.aggregate import Count

    from ..stages.joins import cogroup_inner_join

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = (orders.map_batches(
        lambda t: pa.table({"c_custkey": t.filter(
            pc.greater(t.column("o_totalprice"), 150000.0))
            .column("o_custkey")}),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_custkey").aggregate(Count()))
    big = big.map_batches(
        lambda t: t.rename_columns(["c_custkey", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = cogroup_inner_join(cust, big, key="c_custkey",
                                right_cols=["cnt"], how="left")
    return joined.map_batches(
        lambda t: pa.table({
            "c_custkey": t.column("c_custkey"),
            "c_name": t.column("c_name"),
            "big_orders": pc.fill_null(pc.cast(t.column("cnt"), pa.int64()),
                                       0)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_CUSTOMER_BIG_ORDER_COUNTS = """
SELECT c.c_custkey, c.c_name,
       CAST(COALESCE(r.cnt, 0) AS BIGINT) AS big_orders
FROM customer c LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS cnt FROM orders
  WHERE o_totalprice > 150000 GROUP BY o_custkey) r
ON c.c_custkey = r.o_custkey
"""



def q_nation_customer_supplier_pairs(sf_dir: str):
    """Many-to-many inner join (stages/joins.py::cogroup_join_multi):
    customers x suppliers co-located in a nation — duplicate keys on BOTH
    sides, full SQL multiplicity from one tagged-union bucket exchange and
    numpy repeat/tile segment cross-products (no per-key Python)."""
    from ..stages.joins import cogroup_join_multi

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": t.column("c_nationkey"),
                            "c_custkey": t.column("c_custkey")}),
        batch_format="pyarrow", zero_copy_batch=True)
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": t.column("s_nationkey"),
                            "s_suppkey": t.column("s_suppkey")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return cogroup_join_multi(cust, supp, key="nationkey",
                              left_cols=["c_custkey"],
                              right_cols=["s_suppkey"])


SQL_NATION_CUSTOMER_SUPPLIER_PAIRS = """
SELECT c.c_nationkey AS nationkey, c.c_custkey, s.s_suppkey
FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
"""


def q_region_nation_cross(sf_dir: str):
    """CROSS JOIN as the degenerate constant-key case of
    cogroup_join_multi — both sides land in one segment, the segment
    cross-product IS the Cartesian product. Guarded use only (bounded
    sides); value-hash-exact vs SQL CROSS JOIN."""
    from ..stages.joins import cogroup_join_multi

    reg = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).map_batches(
        lambda t: pa.table({
            "__k": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "r_regionkey": t.column("r_regionkey"),
            "region_name": t.column("r_name")}),
        batch_format="pyarrow", zero_copy_batch=True)
    nat = _pq(sf_dir, "nation", ["n_nationkey", "n_name"]).map_batches(
        lambda t: pa.table({
            "__k": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "n_nationkey": t.column("n_nationkey"),
            "nation_name": t.column("n_name")}),
        batch_format="pyarrow", zero_copy_batch=True)
    out = cogroup_join_multi(reg, nat, key="__k",
                             left_cols=["r_regionkey", "region_name"],
                             right_cols=["n_nationkey", "nation_name"],
                             num_buckets=1)
    return out.map_batches(
        lambda t: t.drop_columns(["__k"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_REGION_NATION_CROSS = """
SELECT r.r_regionkey, r.r_name AS region_name,
       n.n_nationkey, n.n_name AS nation_name
FROM region r CROSS JOIN nation n
"""


def q_grouped_variance_lineitem(sf_dir: str):
    """Grouped second-moment statistics, INTEGER-EXACT: per returnflag the
    count, sum, sum-of-squares and the population-variance NUMERATOR
    n*Σx² − (Σx)² over integral quantities — the combiner pattern (one
    partial row per batch per group), no float accumulation anywhere, so
    the value hash is exact and the merge is order-independent (the
    parallel-variance pitfall of naive float Welford)."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        f = t.column("l_returnflag")
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        q = np.asarray(_cents(t.column("l_quantity"))) // 100  # integral
        enc = pc.dictionary_encode(f)
        codes = np.asarray(enc.indices, dtype=np.int64)
        k = len(enc.dictionary)
        return pa.table({
            "l_returnflag": enc.dictionary,
            "n": pa.array(np.bincount(codes, minlength=k)
                          .astype(np.int64)),
            "s1": pa.array(np.bincount(codes, weights=q, minlength=k)
                           .astype(np.int64)),
            "s2": pa.array(np.bincount(codes, weights=q * q, minlength=k)
                           .astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("l_returnflag").aggregate(Sum("n"), Sum("s1"),
                                              Sum("s2")))
    return agg.map_batches(
        lambda t: (lambda n, s1, s2: pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "n": pa.array(n), "sum_q": pa.array(s1),
            "sum_q2": pa.array(s2),
            "var_num": pa.array(n * s2 - s1 * s1)}))(
            np.asarray(t.column("sum(n)"), dtype=np.int64),
            np.asarray(t.column("sum(s1)"), dtype=np.int64),
            np.asarray(t.column("sum(s2)"), dtype=np.int64)),
        batch_format="pyarrow", zero_copy_batch=True)


def q_interval_overlap_events(sf_dir: str):
    """Interval-overlap SELF-join (both sides intervals — distinct from the
    point-in-interval range join): per user, event pairs whose 15-minute
    windows [ts, ts+900s] intersect. One bucket exchange + start-sorted
    sweep (stages/temporal.py::interval_overlap_self)."""
    from ..stages.temporal import interval_overlap_self

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])
    W = 900 * 1_000_000  # 15 min in microseconds

    def win(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("ts"), pa.int64())
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "s": s,
                         "e": pc.add(s, pa.scalar(W, type=pa.int64()))})

    iv = ds.map_batches(win, batch_format="pyarrow", zero_copy_batch=True)
    return interval_overlap_self(iv, key="user_id", id_col="event_id",
                                 start="s", end="e", num_buckets=64)


SQL_INTERVAL_OVERLAP_EVENTS = """
SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
WHERE epoch_us(a.ts) <= epoch_us(b.ts) + 900000000
  AND epoch_us(b.ts) <= epoch_us(a.ts) + 900000000
"""


def q_grouped_corr_lineitem(sf_dir: str):
    """Grouped Pearson correlation (quantity vs price dollars per
    returnflag) with INTEGER-EXACT co-moment partials. All six sufficient
    statistics (n, Σx, Σy, Σx², Σy², Σxy) are int64 — the combiner merge is
    order-independent — and the final correlation is ONE fixed-shape float64
    expression over them (each int64 cast to double first, two products,
    one subtract, sqrt, divide) that numpy and DuckDB round identically, so
    even the float column is value-hash-exact."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        f = t.column("l_returnflag")
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        x = np.asarray(_cents(t.column("l_quantity"))) // 100
        y = np.asarray(_cents(t.column("l_extendedprice"))) // 100
        enc = pc.dictionary_encode(f)
        codes = np.asarray(enc.indices, dtype=np.int64)
        k = len(enc.dictionary)

        def bc(w):
            return pa.array(np.bincount(codes, weights=w, minlength=k)
                            .astype(np.int64))

        return pa.table({
            "l_returnflag": enc.dictionary,
            "n": pa.array(np.bincount(codes, minlength=k).astype(np.int64)),
            "sx": bc(x), "sy": bc(y), "sxx": bc(x * x), "syy": bc(y * y),
            "sxy": bc(x * y)})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("l_returnflag")
           .aggregate(Sum("n"), Sum("sx"), Sum("sy"), Sum("sxx"),
                      Sum("syy"), Sum("sxy")))

    def finish(t: pa.Table) -> pa.Table:
        g = {c: np.asarray(t.column(f"sum({c})"), dtype=np.int64)
             for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        d = {c: v.astype(np.float64) for c, v in g.items()}
        num = d["n"] * d["sxy"] - d["sx"] * d["sy"]
        den = np.sqrt(d["n"] * d["sxx"] - d["sx"] * d["sx"]) \
            * np.sqrt(d["n"] * d["syy"] - d["sy"] * d["sy"])
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            **{c: pa.array(g[c]) for c in ("n", "sx", "sy", "sxx", "syy",
                                           "sxy")},
            "corr": pa.array(num / den)})

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_GROUPED_CORR_LINEITEM = """
WITH b AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity*100) AS BIGINT) // 100 AS x,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) // 100 AS y
  FROM lineitem
), s AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
         CAST(SUM(x*y) AS BIGINT) AS sxy
  FROM b GROUP BY l_returnflag
)
SELECT l_returnflag, n, sx, sy, sxx, syy, sxy,
       (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS corr
FROM s
"""


def q_mode_event_type_per_user(sf_dir: str):
    """Grouped MODE: each user's most frequent event type (tie-break:
    lexicographically smallest type). Count pre-fold + one bucketed
    argmax — the grouped_topk machinery at k=1."""
    from ..functions.rayutil import bucketed_group_apply, segment_starts

    ds = _pq(sf_dir, "events", ["user_id", "event_type"])
    counts = ds.groupby(["user_id", "event_type"]).count()
    counts = counts.map_batches(
        lambda t: t.rename_columns(["user_id", "event_type", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def first_bucket(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64())})
        starts = np.asarray(segment_starts(bucket.column("user_id")))
        return bucket.take(pa.array(starts))

    return bucketed_group_apply(
        counts, "user_id", first_bucket, num_buckets=64,
        sort_cols=[("cnt", "descending"), ("event_type", "ascending")])


SQL_MODE_EVENT_TYPE_PER_USER = """
SELECT user_id, event_type, cnt FROM (
  SELECT user_id, event_type, cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type ASC) AS rnk
  FROM (SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type))
WHERE rnk = 1
"""


SQL_GROUPED_VARIANCE_LINEITEM = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
       CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
            AS BIGINT) AS sum_q2,
       CAST(COUNT(*) * SUM(CAST(l_quantity AS BIGINT)
                           * CAST(l_quantity AS BIGINT))
            - SUM(CAST(l_quantity AS BIGINT))
              * SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS var_num
FROM lineitem GROUP BY l_returnflag
"""


def q_rollup_lineitem(sf_dir: str):
    """ROLLUP multi-level aggregation (stages/rollup.py::rollup_sum): price
    cents summed at (returnflag, linestatus), (returnflag) and grand-total
    levels. One pass over lineitem (per-batch Arrow group_by partials);
    coarser levels re-aggregate the previous level's tiny output."""
    from ..stages.rollup import rollup_sum

    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_extendedprice"])
    ds = ds.map_batches(
        lambda t: pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "price_c": _cents(t.column("l_extendedprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return rollup_sum(ds, dims=["l_returnflag", "l_linestatus"],
                      value_col="price_c")


SQL_ROLLUP_LINEITEM = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
         AS price_c
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_cube_lineitem(sf_dir: str):
    """CUBE aggregation (stages/rollup.py::cube_sum): price cents summed
    at every subset of (returnflag, linestatus) — finest level from one
    fact pass, the other three levels from its tiny output."""
    from ..stages.rollup import cube_sum

    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_extendedprice"])
    ds = ds.map_batches(
        lambda t: pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "price_c": _cents(t.column("l_extendedprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return cube_sum(ds, dims=["l_returnflag", "l_linestatus"],
                    value_col="price_c")


SQL_CUBE_LINEITEM = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
         AS price_c
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def q_user_activity_full_outer(sf_dir: str):
    """FULL OUTER equi-join (stages/joins.py::cogroup_join_multi
    how="full"): even-keyed customers vs per-user event counts — unmatched
    rows survive on BOTH sides (even custkeys >= 150 have no events; odd
    event users have no customer row here). Nulls are COALESCEd to
    sentinels with the same expression on both engines so the value hash
    is exact."""
    from ray.data.aggregate import Count

    from ..stages.joins import cogroup_join_multi

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda t: (lambda f: pa.table({
            "id": f.column("c_custkey"), "c_acctbal": f.column("c_acctbal")}))(
            t.filter(pc.equal(pc.bit_wise_and(t.column("c_custkey"), 1), 0))),
        batch_format="pyarrow", zero_copy_batch=True)
    ev = (_pq(sf_dir, "events", ["user_id"])
          .groupby("user_id").aggregate(Count()))
    ev = ev.map_batches(lambda t: t.rename_columns(["id", "n_events"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    joined = cogroup_join_multi(cust, ev, key="id",
                                left_cols=["c_acctbal"],
                                right_cols=["n_events"], how="full")
    return joined.map_batches(
        lambda t: pa.table({
            "id": t.column("id"),
            "acctbal": pc.fill_null(t.column("c_acctbal"), -1.0),
            "n_events": pc.fill_null(pc.cast(t.column("n_events"),
                                             pa.int64()), -1)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_USER_ACTIVITY_FULL_OUTER = """
SELECT COALESCE(c.id, e.id) AS id,
       COALESCE(c.c_acctbal, -1.0) AS acctbal,
       CAST(COALESCE(e.n_events, -1) AS BIGINT) AS n_events
FROM (SELECT c_custkey AS id, c_acctbal FROM customer
      WHERE c_custkey % 2 = 0) c
FULL OUTER JOIN (SELECT user_id AS id, COUNT(*) AS n_events
                 FROM events GROUP BY user_id) e
ON c.id = e.id
"""



def q_budget_sample_documents(sf_dir: str):
    """Token-budget corpus selection (stages/sampling.py::budget_sample):
    per language, take docs in deterministic Knuth-hash order until 5,000
    chars are filled — the reproducible "N tokens per language" subset
    op. Windowed-cumsum SQL twin, value-hash-exact."""
    from ..stages.sampling import budget_sample

    ds = _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return budget_sample(ds, group_col="lang", id_col="doc_id",
                         weight_col="n_chars", budget=5000)


SQL_BUDGET_SAMPLE_DOCUMENTS = """
SELECT doc_id, lang, n_chars FROM documents
QUALIFY SUM(n_chars) OVER (
  PARTITION BY lang
  ORDER BY ((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761 % 2147483648, doc_id
  ROWS UNBOUNDED PRECEDING) <= 5000
"""


def q_partitioned_sink_roundtrip(sf_dir: str):
    """Resumable partitioned sink (sources/sinks.py::write_partitioned):
    events written as hash-sharded hive dirs with per-shard _done.json
    markers, read back via read_partitioned — value-hash-exact against
    the identity oracle, proving the sink is lossless. Kill-resume
    semantics are pinned in tests/test_resume.py."""
    import os
    import shutil
    import tempfile

    from ..sources.sinks import read_partitioned, write_partitioned

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "event_type"])
    out = os.path.join(tempfile.gettempdir(), "relray_sink_roundtrip")
    shutil.rmtree(out, ignore_errors=True)
    write_partitioned(ds, out, key_col="user_id", num_shards=16)
    return read_partitioned(out).map_batches(
        lambda t: t.select(["event_id", "user_id", "event_type"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_PARTITIONED_SINK_ROUNDTRIP = """
SELECT event_id, user_id, event_type FROM events
"""


def q_sample_k_events_per_user(sf_dir: str):
    """Deterministic exact-k per-group sample
    (stages/sampling.py::sample_k_per_group): 5 events per user by the
    module's overflow-safe Knuth hash — the reproducible reservoir-sample
    analog, identical rows on every run / cluster size / engine."""
    from ..stages.sampling import sample_k_per_group

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "event_type"])
    return sample_k_per_group(ds, group_col="user_id", id_col="event_id",
                              k=5)


SQL_SAMPLE_K_EVENTS_PER_USER = """
SELECT event_id, user_id, event_type FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id
  ORDER BY ((event_id % 2147483648 + 2147483648) % 2147483648) * 2654435761 % 2147483648,
           event_id) <= 5
"""


def q_lm_quality_documents(sf_dir: str):
    """Char-bigram LM quality scoring (stages/textstats.py::lm_score, the
    CCNet-perplexity-filter shape): corpus bigram counts in one combiner
    pass, per-doc mean log2 P(byte|prev) in a second broadcast pass.
    VALUE-EXACT vs SQL_LM_QUALITY_DOCUMENTS: DuckDB's log2 matches numpy's
    bit-for-bit at float64 (verified on this container), so casting the
    smoothed log-prob to REAL on both sides reproduces the engine's
    float32 table exactly; the per-doc mean is quantized to 1e-6 units,
    absorbing only float64 summation-order noise (~1e-13)."""
    from ..stages.textstats import lm_score

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return lm_score(ds, id_col="doc_id", text_col="text").map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "lm_q": pc.cast(pc.round(pc.multiply(
                t.column("lm_logprob"), pa.scalar(1e6))), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)


# Byte-bigram LM twin. The documents fixture is pure ASCII (verified), so
# per-character ascii() == the engine's per-byte view of the UTF-8 buffer.
# Model contract mirrored from textstats.lm_score: add-one smoothing over
# the full 256x256 grid (denominator = row total + 256), logp table cast
# to float32, docs with < 2 bytes score 0.
SQL_LM_QUALITY_DOCUMENTS = """
WITH pairs AS (
  SELECT d.doc_id,
         ascii(substr(d.text, CAST(g.i AS INTEGER), 1)) AS a,
         ascii(substr(d.text, CAST(g.i AS INTEGER) + 1, 1)) AS b
  FROM documents d, unnest(range(1, CAST(length(d.text) AS BIGINT))) AS g(i)
  WHERE length(d.text) >= 2),
counts AS (
  SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS cnt FROM pairs GROUP BY a, b),
rowtot AS (SELECT a, SUM(cnt) AS tot FROM counts GROUP BY a),
logp AS (
  SELECT c.a, c.b,
         CAST(log2(c.cnt + 1.0) - log2(r.tot + 256.0) AS REAL) AS lp
  FROM counts c JOIN rowtot r USING (a)),
scored AS (
  SELECT p.doc_id, SUM(CAST(l.lp AS DOUBLE)) AS s,
         CAST(COUNT(*) AS DOUBLE) AS np
  FROM pairs p JOIN logp l ON p.a = l.a AND p.b = l.b
  GROUP BY p.doc_id)
SELECT d.doc_id,
       CAST(ROUND(COALESCE(s.s / s.np, 0.0) * 1e6) AS BIGINT) AS lm_q
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


def q_histogram_lineitem(sf_dir: str):
    """Exact fixed-width histogram (stages/profile.py::histogram_fixed):
    price cents in 20 bins over [0, 12,000,000) — integer bin arithmetic
    shared with the SQL twin, bincount combiner before the n_bins-row
    groupby sum."""
    from ..stages.profile import histogram_fixed

    ds = _pq(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda t: pa.table({"price_c": _cents(t.column("l_extendedprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return histogram_fixed(ds, val_col="price_c", lo=0, hi=12_000_000,
                           n_bins=20)


SQL_HISTOGRAM_LINEITEM = """
WITH v AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c
           FROM lineitem),
bins AS (SELECT unnest(generate_series(0, 19)) AS bin),
counts AS (SELECT (c - 0) // 600000 AS bin, COUNT(*) AS cnt
           FROM v WHERE c >= 0 AND c < 12000000 GROUP BY 1)
SELECT b.bin, b.bin * 600000 AS lo_edge, (b.bin + 1) * 600000 AS hi_edge,
       CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
FROM bins b LEFT JOIN counts c ON b.bin = c.bin
"""


def q_prepare_corpus_report(sf_dir: str):
    """Second-flagship composition (pipelines/prep.py::prepare_corpus):
    filter → LM-quantile cut → exact+near dedup → decontaminate → chunk,
    each stage checkpointable; returns the per-stage row funnel.
    VALUE-EXACT vs _prep_report_sql(): near_mode="exact" swaps the LSH
    near-dedup (recall < 1 by design, hence unverifiable) for the
    deterministic AllPairs Jaccard join + CC, making every stage of the
    funnel a pure function of the data; the LSH default path keeps its
    pytest coverage (tests/test_resume, tests/test_dedup)."""
    from ..pipelines.prep import prepare_corpus

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.map_batches(
        lambda t: t.filter(pa.array(
            np.asarray(t.column("doc_id")) % 50 == 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    return prepare_corpus(docs, bench, near_mode="exact")["report"]


def _prep_report_sql(*, min_tokens: int = 20, lm_quantile: float = 0.05,
                     eps: float = 0.0005, tau_num: int = 7,
                     tau_den: int = 10, stride: int = 40) -> str:
    """SQL replay of the whole prepare_corpus funnel (near_mode="exact").

    Stage twins: lang/token filter = _lang_sql + whitespace token count;
    LM cut = byte-bigram model over the FILTERED subset (float32 logp table
    — DuckDB log2 is bit-identical to numpy's here) + the geometric
    quantile-sketch threshold replayed with the engine's exact double
    constants; dedup = MIN(doc_id) per text, then AllPairs Jaccard >=
    tau_num/tau_den over word trigrams + recursive-CTE min-label CC with
    MIN-STRING representatives (connected_components operates on string
    ids); decontam = distinct word-5-gram overlap vs the doc_id%%50==0
    benchmark; chunks = ceil(len/stride) per surviving doc."""
    from ..stages.sketches import _qs_nbins

    nb = _qs_nbins(eps)
    denom = repr(float(np.log1p(2 * eps)))
    base = repr(1 + 2 * eps)
    lang = _lang_sql()
    return rf"""
WITH RECURSIVE
lang AS MATERIALIZED ({lang}),
ntok AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
         END AS n_tokens
  FROM documents),
filtered AS MATERIALIZED (
  SELECT t.doc_id, t.text
  FROM ntok t JOIN lang l USING (doc_id)
  WHERE l.lang_pred = 'en' AND t.n_tokens >= {min_tokens}),
bpairs AS MATERIALIZED (
  SELECT d.doc_id,
         ascii(substr(d.text, CAST(g.i AS INTEGER), 1)) AS a,
         ascii(substr(d.text, CAST(g.i AS INTEGER) + 1, 1)) AS b
  FROM filtered d, unnest(range(1, CAST(length(d.text) AS BIGINT))) AS g(i)
  WHERE length(d.text) >= 2),
bcounts AS (
  SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS cnt FROM bpairs GROUP BY a, b),
rowtot AS (SELECT a, SUM(cnt) AS tot FROM bcounts GROUP BY a),
logp AS MATERIALIZED (
  SELECT c.a, c.b,
         CAST(log2(c.cnt + 1.0) - log2(r.tot + 256.0) AS REAL) AS lp
  FROM bcounts c JOIN rowtot r USING (a)),
scored AS MATERIALIZED (
  SELECT f.doc_id, f.text, COALESCE(s.s / s.np, 0.0) AS score
  FROM filtered f LEFT JOIN (
    SELECT p.doc_id, SUM(CAST(l.lp AS DOUBLE)) AS s,
           CAST(COUNT(*) AS DOUBLE) AS np
    FROM bpairs p JOIN logp l ON p.a = l.a AND p.b = l.b
    GROUP BY p.doc_id) s USING (doc_id)),
shifted AS MATERIALIZED (
  SELECT GREATEST(CAST(TRUNC((score + 16.0) * 1000.0) AS BIGINT), 0) AS v
  FROM scored),
qbins AS (
  SELECT LEAST(CAST(FLOOR(ln(1.0 + CAST(v AS DOUBLE)) / {denom}) AS BIGINT),
               {nb - 1}) AS b FROM shifted),
qhist AS (SELECT b, COUNT(*) AS cnt FROM qbins GROUP BY b),
qcum AS (SELECT b, SUM(cnt) OVER (ORDER BY b) AS cum FROM qhist),
qtot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM shifted),
qsel AS (
  SELECT MIN(c.b) AS b FROM qcum c
  WHERE c.cum >= GREATEST(1, CAST(CEIL({lm_quantile!r} * (SELECT n FROM qtot))
                                  AS BIGINT))),
cut AS (
  SELECT COALESCE(
    (SQRT(POWER({base}, b) * POWER({base}, b + 1)) - 1.0) / 1000.0 - 16.0,
    -16.0) AS thr
  FROM qsel),
lm_kept AS MATERIALIZED (
  SELECT doc_id, text FROM scored WHERE score >= (SELECT thr FROM cut)),
dedup AS MATERIALIZED (
  SELECT MIN(doc_id) AS doc_id, text FROM lm_kept GROUP BY text),
w AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS ws FROM dedup),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS tok
  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS s(i)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
epairs AS MATERIALIZED (
  SELECT c.id_a, c.id_b
  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ovl
        FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2) c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  WHERE {tau_den} * c.ovl >= {tau_num} * (sa.sz + sb.sz - c.ovl)),
sym AS MATERIALIZED (
  SELECT CAST(id_a AS VARCHAR) AS a, CAST(id_b AS VARCHAR) AS b FROM epairs
  UNION ALL
  SELECT CAST(id_b AS VARCHAR), CAST(id_a AS VARCHAR) FROM epairs),
lbl(nd, l) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym) t
  UNION
  SELECT s.b, MIN(x.l) FROM lbl x JOIN sym s ON s.a = x.nd GROUP BY s.b),
comp AS MATERIALIZED (SELECT nd, MIN(l) AS cl FROM lbl GROUP BY nd),
survivors AS MATERIALIZED (
  SELECT d.doc_id, d.text FROM dedup d
  LEFT JOIN comp c ON c.nd = CAST(d.doc_id AS VARCHAR)
  WHERE COALESCE(c.cl, CAST(d.doc_id AS VARCHAR)) = CAST(d.doc_id AS VARCHAR)),
btoks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
  FROM documents WHERE doc_id % 50 = 0),
bgrams AS MATERIALIZED (
  SELECT DISTINCT CASE WHEN len(tk) < 5 THEN array_to_string(tk, ' ')
              ELSE array_to_string(list_slice(tk, i, i + 4), ' ') END AS gram
  FROM btoks,
       unnest(CASE WHEN len(tk) = 0 THEN []
                   WHEN len(tk) < 5 THEN [1]
                   ELSE range(1, len(tk) - 3) END) AS u(i)),
ctoks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
  FROM survivors),
contam AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id,
               CASE WHEN len(tk) < 5 THEN array_to_string(tk, ' ')
                    ELSE array_to_string(list_slice(tk, i, i + 4), ' ')
               END AS gram
        FROM ctoks,
             unnest(CASE WHEN len(tk) < 5 THEN [1]
                         ELSE range(1, len(tk) - 3) END) AS u(i)) g
  JOIN bgrams b USING (gram)),
clean AS MATERIALIZED (
  SELECT s.doc_id, s.text FROM survivors s
  LEFT JOIN contam c USING (doc_id) WHERE c.doc_id IS NULL),
toks2 AS (
  SELECT CAST(array_length(regexp_extract_all(lower(text), '[a-z]+'))
              AS BIGINT) AS len FROM clean),
chunkn AS (
  SELECT COALESCE(SUM(CASE WHEN len > 0 THEN (len + {stride - 1}) // {stride}
                           ELSE 0 END), 0) AS n FROM toks2)
SELECT 'input' AS stage,
       CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS "rows"
UNION ALL SELECT 'filtered', CAST((SELECT COUNT(*) FROM filtered) AS BIGINT)
UNION ALL SELECT 'lm_filtered', CAST((SELECT COUNT(*) FROM lm_kept) AS BIGINT)
UNION ALL SELECT 'deduped', CAST((SELECT COUNT(*) FROM survivors) AS BIGINT)
UNION ALL SELECT 'decontaminated',
          CAST((SELECT COUNT(*) FROM clean) AS BIGINT)
UNION ALL SELECT 'chunks', CAST((SELECT n FROM chunkn) AS BIGINT)
"""


def q_profile_events(sf_dir: str):
    """Table profiling (stages/profile.py::profile_table): one streaming
    pass → per-column row/null/distinct counts + typed min/max (int,
    string and timestamp channels; float columns excluded from the oracle
    to keep string rendering engine-agnostic). Exact-distinct path at
    fixture cardinality; HLL beyond (pinned in tests)."""
    from ..stages.profile import profile_table

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    return profile_table(ds, columns=["event_id", "user_id",
                                      "event_type", "ts"])


SQL_PROFILE_EVENTS = """
SELECT 'event_id' AS "column", COUNT(*) AS n_rows,
       COUNT(*) - COUNT(event_id) AS n_nulls,
       COUNT(DISTINCT event_id) AS n_distinct, TRUE AS distinct_exact,
       CAST(MIN(event_id) AS VARCHAR) AS min,
       CAST(MAX(event_id) AS VARCHAR) AS max
FROM events
UNION ALL
SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
       COUNT(DISTINCT user_id), TRUE,
       CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
FROM events
UNION ALL
SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
       COUNT(DISTINCT event_type), TRUE,
       MIN(event_type), MAX(event_type)
FROM events
UNION ALL
SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts),
       COUNT(DISTINCT ts), TRUE,
       CAST(MIN(ts) AS VARCHAR), CAST(MAX(ts) AS VARCHAR)
FROM events
"""


def q_json_props_agg_events(sf_dir: str):
    """Semi-structured projection (stages/cleaning.py::json_scalar_field):
    pull props.k out of the JSON side-channel column with one vectorized
    RE2 pass, then a partial-combining grouped sum per event_type.
    Value-hash-exact against DuckDB's real JSON parser — the regex
    fast path and the parser agree on the scalar contract."""
    from ray.data.aggregate import Sum

    from ..stages.cleaning import json_scalar_field

    ds = _pq(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        k = json_scalar_field(t.column("props"), "k")
        return pa.table({
            "event_type": t.column("event_type"),
            "k": pc.cast(k, pa.int64())})

    out = (ds.map_batches(extract, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type").aggregate(Sum("k")))
    return out.map_batches(
        lambda t: t.rename_columns(["event_type", "sum_k"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_JSON_PROPS_AGG_EVENTS = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""


def q_diff_corpora_documents(sf_dir: str):
    """Corpus snapshot diff (stages/dedup.py::diff_corpora): documents vs a
    deterministically perturbed v2 (every 7th doc removed, every 5th
    edited, every 11th cloned under a new id) → one (doc_id, status) row
    per id, status in added/removed/changed/unchanged. One FULL OUTER
    co-group exchange; value-hash-exact against the SQL twin."""
    from ..stages.dedup import diff_corpora

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def v2(t: pa.Table) -> pa.Table:
        did = np.asarray(t.column("doc_id"), dtype=np.int64)
        keep = t.filter(pa.array(did % 7 != 0))
        kid = keep.column("doc_id")
        edited = pc.if_else(
            pa.array(np.asarray(kid, dtype=np.int64) % 5 == 0),
            pc.binary_join_element_wise(keep.column("text"), " v2", ""),
            keep.column("text"))
        base = pa.table({"doc_id": kid, "text": edited})
        clones = t.filter(pa.array(did % 11 == 0))
        added = pa.table({
            "doc_id": pc.add(clones.column("doc_id"), 1_000_000),
            "text": clones.column("text")})
        return pa.concat_tables([base, added])

    new = docs.map_batches(v2, batch_format="pyarrow", zero_copy_batch=True)
    return diff_corpora(docs, new, id_col="doc_id", text_col="text")


SQL_DIFF_CORPORA_DOCUMENTS = """
WITH v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 != 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL THEN
              CASE WHEN o.text = n.text THEN 'unchanged' ELSE 'changed' END
            WHEN n.doc_id IS NOT NULL THEN 'added'
            ELSE 'removed' END AS status
FROM documents o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
"""


def q_pagerank_events(sf_dir: str):
    """Distributed PageRank (stages/graph.py::pagerank) over the bipartite
    user → event_type interaction graph. VALUE-EXACT vs a DuckDB oracle
    that unrolls the same 10 damped iterations as chained CTEs
    (_pagerank_sql): both sides emit rank quantized to 1e-9 units, which
    absorbs the only legitimate divergence (float64 summation order) while
    any semantic drift — damping, dangling mass, multi-edge multiplicity —
    shifts ranks by far more than 0.5e-9."""
    from ..stages.graph import pagerank

    ev = _pq(sf_dir, "events", ["user_id", "event_type"]).map_batches(
        lambda t: pa.table({
            "src": pc.binary_join_element_wise(
                pa.array(["u"] * t.num_rows),
                pc.cast(t.column("user_id"), pa.string()), ""),
            "dst": pc.binary_join_element_wise(
                pa.array(["t"] * t.num_rows), t.column("event_type"), "")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return pagerank(ev, iters=10).map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "rank_e9": pc.cast(pc.round(pc.multiply(
                t.column("rank"), pa.scalar(1e9))), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)


def _pagerank_sql(iters: int = 10, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank twin of stages/graph.py::pagerank
    (same update: dangling mass redistributed uniformly, multi-edges count
    per occurrence, rank init 1/N). Recursive CTEs can't aggregate over the
    recursive relation, so the 10 iterations are generated as chained CTEs."""
    d = repr(damping)
    parts = [f"""
WITH edges AS MATERIALIZED (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS src, 't' || event_type AS dst
  FROM events),
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
deg AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(o.c, 0) AS DOUBLE) AS outdeg
  FROM nodes n LEFT JOIN (
    SELECT src AS node, COUNT(*) AS c FROM edges GROUP BY src) o
  USING (node)),
r0 AS MATERIALIZED (
  SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(f""",
b{k} AS MATERIALIZED (
  SELECT (1.0 - {d}) / (SELECT n FROM nn)
         + {d} * COALESCE((SELECT SUM(r.rank) FROM r{p} r
                           JOIN deg g USING (node) WHERE g.outdeg = 0), 0.0)
           / (SELECT n FROM nn) AS base),
c{k} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(r.rank / g.outdeg) AS c
  FROM edges e JOIN r{p} r ON r.node = e.src
  JOIN deg g ON g.node = e.src
  GROUP BY e.dst),
r{k} AS MATERIALIZED (
  SELECT n.node, {d} * COALESCE(c.c, 0.0) + (SELECT base FROM b{k}) AS rank
  FROM nodes n LEFT JOIN c{k} c USING (node))""")
    parts.append(f"""
SELECT node, CAST(ROUND(rank * 1e9) AS BIGINT) AS rank_e9 FROM r{iters}""")
    return "".join(parts)


def q_customers_with_big_events(sf_dir: str):
    """Bloom-prefiltered semi join (stages/joins.py::bloom_semi_anti):
    customers with any event of value > 200 — the Bloom probe (no false
    negatives) shrinks the exact semi-join exchange from |customers| to
    ~|matches|, broadcasting m/8 bytes instead of the key set. EXACT
    result; value-hash-checked against the EXISTS oracle."""
    from ..stages.joins import bloom_semi_anti

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"])
    ev = _pq(sf_dir, "events", ["user_id", "value"]).map_batches(
        lambda t: pa.table({"c_custkey": t.filter(
            pc.greater(t.column("value"), 200.0)).column("user_id")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return bloom_semi_anti(cust, ev, key="c_custkey", m_bits=1 << 16)


SQL_CUSTOMERS_WITH_BIG_EVENTS = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM events e
              WHERE e.user_id = c.c_custkey AND e.value > 200)
"""


def q_revenue_by_mktsegment(sf_dir: str):
    """Broadcast dim join (orders fact ⋈ customer dim) → grouped revenue.
    The dim table is ray.put once and per-process cached; the fact side
    streams with zero shuffles before the 5-group aggregate."""
    import ray as _ray

    from ..stages.joins import broadcast_inner_join
    from ..functions.rayutil import collect_table

    dim = collect_table(_pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]))
    dim_ref = _ray.put(dim)
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    fact = orders.map_batches(
        lambda t: pa.table({"c_custkey": t.column("o_custkey"),
                            "price_c": _cents(t.column("o_totalprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = broadcast_inner_join(fact, dim_ref, key="c_custkey",
                                  val_cols=["c_mktsegment"])
    agg = joined.groupby("c_mktsegment").aggregate(Sum("price_c"), Count())
    return agg.map_batches(
        lambda t: pa.table({"c_mktsegment": t.column("c_mktsegment"),
                            "revenue_cents": t.column("sum(price_c)"),
                            "n_orders": t.column("count()")}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_REVENUE_BY_MKTSEGMENT = """
SELECT c.c_mktsegment,
       CAST(SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_stratified_sample_documents(sf_dir: str):
    """Deterministic per-stratum hash sampling (en 20%, zh 50%, rest 10%):
    membership depends only on doc_id, reproducible across engines/retries —
    the SQL oracle reproduces the exact same integer hash."""
    from ..stages.sampling import stratified_sample

    ds = _pq(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(ds, id_col="doc_id", stratum_col="lang",
                             rates_permyriad={"en": 2000, "zh": 5000},
                             default_permyriad=1000)


SQL_STRATIFIED_SAMPLE_DOCUMENTS = """
SELECT doc_id, lang FROM documents
WHERE (((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761 % 2147483648) % 10000 <
      CASE lang WHEN 'en' THEN 2000 WHEN 'zh' THEN 5000 ELSE 1000 END
"""


def q_distinct_users_per_event_type(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): per-batch distinct (type, user) pairs
    (combiner) → one bucket exchange dedups pairs globally → tiny count-sum.
    Shuffle volume is distinct-ish pairs, never raw events."""
    from ..functions.rayutil import bucketed_group_apply, segment_starts

    ds = _pq(sf_dir, "events", ["event_type", "user_id"])

    def batch_distinct(t: pa.Table) -> pa.Table:
        enc_t = pc.dictionary_encode(t.column("event_type").combine_chunks()
                                     if isinstance(t.column("event_type"),
                                                   pa.ChunkedArray)
                                     else t.column("event_type"))
        tc = np.asarray(enc_t.indices, dtype=np.int64)
        u = np.asarray(t.column("user_id"), dtype=np.int64)
        if len(u) == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "user_id": pa.array([], type=pa.int64())})
        base = u.max() + 1
        pair = np.unique(tc * base + u)
        return pa.table({
            "event_type": enc_t.dictionary.take(pa.array(pair // base)),
            "user_id": pa.array(pair % base)})

    def bucket_count(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        ch_t = np.zeros(n, dtype=bool)
        ch_t[np.asarray(segment_starts(bucket.column("event_type")))] = True
        ch_u = np.zeros(n, dtype=bool)
        ch_u[np.asarray(segment_starts(bucket.column("user_id")))] = True
        first = ch_t | ch_u          # first row of each distinct pair
        t_starts = np.asarray(segment_starts(bucket.column("event_type")))
        seg_id = np.zeros(n, dtype=np.int64)
        seg_id[t_starts[1:]] = 1
        seg_id = np.cumsum(seg_id)
        counts = np.bincount(seg_id[first], minlength=len(t_starts))
        return pa.table({
            "event_type": bucket.column("event_type").take(pa.array(t_starts)),
            "n": pa.array(counts.astype(np.int64))})

    partial = ds.map_batches(batch_distinct, batch_format="pyarrow",
                             zero_copy_batch=True)
    per_bucket = bucketed_group_apply(partial, ["event_type", "user_id"],
                                      bucket_count, num_buckets=64)
    agg = per_bucket.groupby("event_type").sum("n")
    return agg.map_batches(
        lambda t: t.rename_columns(["event_type", "n_users"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_DISTINCT_USERS_PER_EVENT_TYPE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog grouped distinct (p=12, ~1.6% expected error): the
    mergeable-sketch combiner path for COUNT(DISTINCT) at 100-TB scale —
    shuffle moves one 4-KiB sketch row per (group, batch), never the pairs.

    Bracket oracle: the estimate itself is approximate by design, so the
    query emits ``within_bound = |hll − exact| / exact ≤ 0.05`` per group
    (0.05 ≈ 3σ of HLL's 1.04/√2¹² ≈ 1.6% std error) against the engine's own
    exact-distinct pass; the SQL oracle asserts TRUE for every group. The
    driver check is therefore value-hash-exact without faking precision.
    Tighter accuracy is pinned in tests/test_ops.py::test_hll_accuracy.
    Both sides are one row per GROUP (bounded by group cardinality, not
    data size) — the driver-side bracket join is O(#groups)."""
    from ..functions.rayutil import collect_table
    from ..stages.sketches import grouped_approx_distinct

    ds = _pq(sf_dir, "events", ["event_type", "user_id"])
    approx = grouped_approx_distinct(ds, group_col="event_type",
                                     value_col="user_id", p=12)
    exact = collect_table(
        q_distinct_users_per_event_type(sf_dir),
        pa.schema([("event_type", pa.string()), ("n_users", pa.int64())]))
    exact_map = dict(zip(exact.column("event_type").to_pylist(),
                         exact.column("n_users").to_pylist()))

    def bracket(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pylist()
        est = np.asarray(t.column("approx_distinct"), dtype=np.float64)
        true = np.array([exact_map[e] for e in et], dtype=np.float64)
        ok = np.abs(est - true) <= 0.05 * true
        return pa.table({"event_type": t.column("event_type"),
                         "within_bound": pa.array(ok)})

    return approx.map_batches(bracket, batch_format="pyarrow",
                              zero_copy_batch=True)


SQL_APPROX_DISTINCT_USERS = """
SELECT event_type, TRUE AS within_bound FROM events GROUP BY event_type
"""


def q_percent_rank_documents(sf_dir: str):
    """Exact global percentile-rank normalization of a quality/length score
    (the corpus-curation 'keep the top X% by score' primitive) — one
    distinct-value count aggregate + driver cumsum + broadcast lookup; no
    global sort, no row-sized exchange (stages/selection.percentile_rank)."""
    from ..stages.selection import percentile_rank

    docs = _pq(sf_dir, "documents", ["doc_id", "n_chars"])
    return percentile_rank(docs, value_col="n_chars", keep_cols=["doc_id"])


SQL_PERCENT_RANK_DOCUMENTS = """
SELECT doc_id, n_chars,
       percent_rank() OVER (ORDER BY n_chars) AS pct_rank
FROM documents
"""


def q_collect_set_events(sf_dir: str):
    """Grouped sorted-DISTINCT collection: every user's distinct event
    types, pipe-joined in sorted order — the ER alias-list aggregate shape
    (all distinct surface forms per cluster). One skinny bucketed exchange,
    in-bucket sort + shifted-compare dedup + ListArray/binary_join — zero
    per-row Python (stages/temporal.py::grouped_collect_set)."""
    from ..stages.temporal import grouped_collect_set

    ev = _pq(sf_dir, "events", ["user_id", "event_type"])
    return grouped_collect_set(ev, key="user_id", val="event_type",
                               out_col="event_types")


SQL_COLLECT_SET_EVENTS = """
SELECT user_id, string_agg(DISTINCT event_type, '|' ORDER BY event_type)
       AS event_types
FROM events GROUP BY user_id
"""


def q_quantile_bucket_documents(sf_dir: str):
    """Exact decile binning of a length/quality score (feature bucketize /
    curriculum tiering): bucket = min(floor(percent_rank * 10), 9) —
    deterministic under ties (unlike SQL NTILE), value-exact cross-engine;
    one distinct-value aggregate + broadcast lookup, no global sort
    (stages/selection.quantile_bucketize)."""
    from ..stages.selection import quantile_bucketize

    docs = _pq(sf_dir, "documents", ["doc_id", "n_chars"])
    return quantile_bucketize(docs, value_col="n_chars", n_buckets=10,
                              keep_cols=["doc_id"])


SQL_QUANTILE_BUCKET_DOCUMENTS = """
SELECT doc_id, n_chars,
       LEAST(CAST(FLOOR(percent_rank() OVER (ORDER BY n_chars) * 10)
                  AS BIGINT), 9) AS bucket
FROM documents
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events_per_user(sf_dir: str):
    """Pivot: per-user event-type counts as columns. Per-batch bincount
    partials (combiner) → groupby(user).sum — the shuffle moves one partial
    row per (user, batch), pre-aggregated."""
    ds = _pq(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            t.column("user_id").combine_chunks()
            if isinstance(t.column("user_id"), pa.ChunkedArray)
            else t.column("user_id"))
        codes = np.asarray(enc.indices, dtype=np.int64)
        users = enc.dictionary
        et = t.column("event_type")
        cols = {"user_id": users}
        for name in _EVENT_TYPES:
            mask = np.asarray(pc.equal(et, name), dtype=bool)
            cols[f"n_{name}"] = pa.array(
                np.bincount(codes[mask], minlength=len(users)).astype(np.int64))
        return pa.table(cols)

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("user_id")
           .sum([f"n_{n}" for n in _EVENT_TYPES]))
    return agg.map_batches(
        lambda t: t.rename_columns(["user_id"] +
                                   [f"n_{n}" for n in _EVENT_TYPES]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_unpivot_events_per_user(sf_dir: str):
    """UNPIVOT (stages/rollup.py::unpivot): the pivoted per-user counts
    reshaped back to long (user_id, metric, value) — one shuffle-free
    map over the wide table; round-trips the engine's own pivot."""
    from ..stages.rollup import unpivot

    wide = q_pivot_events_per_user(sf_dir)
    return unpivot(wide, id_cols=["user_id"],
                   value_cols=[f"n_{n}" for n in _EVENT_TYPES])


SQL_UNPIVOT_EVENTS_PER_USER = """
WITH wide AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
         COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
         COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
         COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
  FROM events GROUP BY user_id)
SELECT user_id, metric, CAST(value AS BIGINT) AS value
FROM wide
UNPIVOT (value FOR metric IN (n_click, n_error, n_purchase,
                              n_signup, n_view))
"""


SQL_PIVOT_EVENTS_PER_USER = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY user_id
"""


def q_chunk_documents(sf_dir: str):
    """RAG-style overlapping chunking (50-token windows every 40 tokens):
    embarrassingly parallel, zero shuffles (stages/packing.py)."""
    from ..stages.packing import chunk_documents

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(ds, id_col="doc_id", text_col="text",
                           chunk_size=50, stride=40)


SQL_CHUNK_DOCUMENTS = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS arr,
         CAST(array_length(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS len
  FROM documents)
, starts AS (
  SELECT doc_id, arr, len, unnest(range(0, len, 40)) AS gs
  FROM toks WHERE len > 0)
SELECT doc_id,
       gs // 40 AS chunk_idx,
       LEAST(gs + 50, len) - gs AS n_tokens,
       array_to_string(arr[gs + 1 : LEAST(gs + 50, len)], ' ') AS chunk_text
FROM starts
"""


def q_scrub_pii_documents(sf_dir: str):
    """PII scrubbing (urls → emails → phone runs, RE2 both engines):
    one streaming pass, byte-exact vs the SQL oracle
    (stages/cleaning.py documents the rule order contract)."""
    from ..stages.cleaning import scrub_pii

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return scrub_pii(ds, text_col="text", out_col="text_clean")


SQL_SCRUB_PII_DOCUMENTS = r"""
SELECT doc_id, text,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g') AS text_clean
FROM documents
"""


TFIDF_QUERY = "fast merge sort dup window"


def q_tfidf_topk_documents(sf_dir: str):
    """Lexical retrieval: top-20 documents by quantized-idf TF-IDF against a
    fixed query string. Integer-exact scoring (stages/retrieval.py) — two
    streaming passes, no corpus shuffle, local top-k before the global sort."""
    from ..stages.retrieval import tfidf_topk

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_topk(ds, id_col="doc_id", text_col="text",
                      query=TFIDF_QUERY, k=20)


SQL_TFIDF_TOPK_DOCUMENTS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents),
q(tok, tfq) AS (VALUES ('dup',1),('fast',1),('merge',1),('sort',1),('window',1)),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
df AS (SELECT q.tok, q.tfq, COUNT(DISTINCT t.doc_id) AS df
       FROM q JOIN toks t USING (tok) GROUP BY 1, 2),
w AS (SELECT tok, tfq, (SELECT n_docs FROM n) * 1048576 // df AS w
      FROM df WHERE df > 0)
SELECT t.doc_id, CAST(SUM(w.tfq * w.w) AS BIGINT) AS score
FROM toks t JOIN w USING (tok)
GROUP BY t.doc_id
ORDER BY score DESC, doc_id ASC LIMIT 20
"""


def q_bm25_topk_documents(sf_dir: str):
    """Lexical retrieval, BM25 head: top-20 documents by integer-quantized
    BM25 (k1=3/2, b=3/4) against the same fixed query as the TF-IDF twin.
    All-integer rational form (stages/retrieval.py::bm25_topk) so the score
    is bit-exact vs the SQL oracle; two streaming passes, no corpus
    shuffle."""
    from ..stages.retrieval import bm25_topk

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, id_col="doc_id", text_col="text",
                     query=TFIDF_QUERY, k=20)


SQL_BM25_TOPK_DOCUMENTS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents),
q(tok) AS (VALUES ('dup'),('fast'),('merge'),('sort'),('window')),
stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) AS big_l),
df AS (SELECT q.tok, COUNT(DISTINCT t.doc_id) AS df
       FROM q JOIN toks t USING (tok) GROUP BY 1),
w AS (SELECT tok, (SELECT n_docs FROM stats) * 256 // df AS w
      FROM df WHERE df > 0),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
tf AS (SELECT t.doc_id, t.tok, COUNT(*) AS tf
       FROM toks t JOIN w USING (tok) GROUP BY 1, 2)
SELECT tf.doc_id,
       CAST(SUM(w.w * tf.tf * 20 * s.big_l //
                (8 * s.big_l * tf.tf + 3 * s.big_l + 9 * dl.dl * s.n_docs))
            AS BIGINT) AS score
FROM tf JOIN w USING (tok) JOIN dl USING (doc_id), stats s
GROUP BY tf.doc_id
HAVING SUM(w.w * tf.tf * 20 * s.big_l //
           (8 * s.big_l * tf.tf + 3 * s.big_l + 9 * dl.dl * s.n_docs)) > 0
ORDER BY score DESC, doc_id ASC LIMIT 20
"""


def q_bottomk_sample_documents(sf_dir: str):
    """Deterministic global 100-row uniform sample without replacement: the
    100 docs with the smallest Knuth hash of doc_id (bottom-k sketch —
    mergeable, consistent under corpus growth, reproducible across engines;
    stages/sampling.py::bottomk_sample). Local bottom-k per batch, one
    k-per-block global reduce — no full shuffle."""
    from ..stages.sampling import bottomk_sample

    ds = _pq(sf_dir, "documents", ["doc_id", "lang"])
    return bottomk_sample(ds, id_col="doc_id", k=100, carry_cols=["lang"])


SQL_BOTTOMK_SAMPLE_DOCUMENTS = """
SELECT doc_id, lang FROM documents
ORDER BY ((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761
         % 2147483648, doc_id
LIMIT 100
"""


def q_dup_passages_documents(sf_dir: str):
    """Duplicate-passage mining: every word 5-gram appearing in >= 2
    distinct documents with its distinct-doc count (the discovery half of
    exact-substring dedup, Lee et al. ACL 2022;
    stages/dedup.py::dup_passages). Per-batch distinct (doc, gram) pre-fold
    -> one groupby-sum over unique grams -> threshold."""
    from ..stages.dedup import dup_passages

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return dup_passages(ds, text_col="text", n=5, min_docs=2)


# shared gram CTE for the decontamination/repetition oracles: word 5-grams
# per doc; docs with fewer than 5 tokens contribute one whole-doc gram,
# empty docs none (word_ngram_codes contract)
_SQL_GRAMS = r"""
toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(tk) < 5 THEN array_to_string(tk, ' ')
              ELSE array_to_string(list_slice(tk, i, i + 4), ' ')
         END AS gram
  FROM toks,
       unnest(CASE WHEN len(tk) = 0 THEN []
                   WHEN len(tk) < 5 THEN [1]
                   ELSE range(1, len(tk) - 3) END) AS u(i)
)
"""


def q_decontaminate_documents(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 50 == 0 form the held-out
    benchmark; every other doc is flagged iff it shares a word-5-gram with
    any benchmark doc (broadcast gram set + per-batch isin, no shuffle)."""
    from ..stages.dedup import flag_contaminated

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def split(bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = (t.column("doc_id").to_numpy() % 50) == 0
            return t.filter(pa.array(m if bench else ~m))
        return f

    bench = docs.map_batches(split(True), batch_format="pyarrow",
                             zero_copy_batch=True)
    corpus = docs.map_batches(split(False), batch_format="pyarrow",
                              zero_copy_batch=True)
    flagged = flag_contaminated(corpus, bench, id_col="doc_id",
                                text_col="text")
    return flagged.map_batches(
        lambda t: t.select(["doc_id", "contaminated"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_heavy_hitters_documents(sf_dir: str):
    """Misra-Gries top-64 frequent tokens with error bounds
    (stages/sketches.py::heavy_hitter_terms): each batch compresses to <=64
    (token, count) rows, the driver merges O(k x batches) skinny partials —
    the bounded-memory path when the vocabulary is too large to shuffle.
    Rows-only check (est/err are sketch-specific); the lower-bound and
    no-lost-heavy-hitter guarantees are pinned in tests."""
    from ..stages.sketches import heavy_hitter_terms

    ds = _pq(sf_dir, "documents", ["text"])
    return heavy_hitter_terms(ds, text_col="text", k=64)


def q_cms_heavy_hitters_documents(sf_dir: str):
    """Composed sketch pipeline: Misra-Gries finds WHICH tokens are frequent
    (lower bounds), a Count-Min sketch answers point queries (upper bounds)
    — together each heavy hitter gets a [mg_lower, cms_upper] interval that
    provably brackets the true count. Both sketches are one streaming pass
    each with O(k) / O(depth x width) state per batch; nothing shuffles.
    Rows-only check (sketch-specific estimates); the bracket guarantee is
    pinned in tests (test_misra_gries_bounds, test_count_min_guarantees)."""
    from ..stages.sketches import cms_query, count_min_terms, heavy_hitter_terms

    ds = _pq(sf_dir, "documents", ["text"])
    hh = heavy_hitter_terms(ds, text_col="text", k=32)
    sketch = count_min_terms(ds, text_col="text", depth=4, width=4096)
    hashes = hh.column("token_hash")
    ests = cms_query(sketch, hashes.to_numpy(zero_copy_only=False))
    return pa.table({
        "token_hash": hashes,
        "mg_lower": hh.column("est_count"),
        "cms_upper": pa.array(ests.astype("int64")),
    })



def q_decontaminate_bloom_documents(sf_dir: str):
    """Bloom-filter decontamination (stages/sketches.py::bloom_decontaminate):
    same benchmark split as decontaminate_documents but the benchmark gram
    set is a 10-bits/gram Bloom sketch (OR-merged per-batch partials,
    broadcast once) instead of the exact gram array — the 100-TB path when
    the held-out side is itself large. No false negatives (superset of the
    exact filter, asserted in tests); rows-only driver check (FPs are
    probabilistic by design)."""
    from ..stages.sketches import bloom_decontaminate

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def split(bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = (t.column("doc_id").to_numpy() % 50) == 0
            return t.filter(pa.array(m if bench else ~m))
        return f

    bench = docs.map_batches(split(True), batch_format="pyarrow",
                             zero_copy_batch=True)
    corpus = docs.map_batches(split(False), batch_format="pyarrow",
                              zero_copy_batch=True)
    flagged = bloom_decontaminate(corpus, bench, id_col="doc_id",
                                  text_col="text")
    return flagged.map_batches(
        lambda t: t.select(["doc_id", "contaminated"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_DECONTAMINATE_DOCUMENTS = rf"""
WITH {_SQL_GRAMS},
contam AS (
  SELECT DISTINCT g.doc_id
  FROM grams g
  JOIN (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0) b USING (gram)
  WHERE g.doc_id % 50 <> 0
)
SELECT t.doc_id, (c.doc_id IS NOT NULL) AS contaminated
FROM toks t LEFT JOIN contam c USING (doc_id)
WHERE t.doc_id % 50 <> 0
"""


def q_repetition_documents(sf_dir: str):
    """Within-doc n-gram repetition counts (total vs distinct word-5-grams):
    the boilerplate/looping-output quality signal."""
    from ..stages.dedup import ngram_repetition

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return ngram_repetition(docs, id_col="doc_id", text_col="text")


SQL_REPETITION_DOCUMENTS = rf"""
WITH {_SQL_GRAMS},
agg AS (
  SELECT doc_id, count(*) AS total, count(DISTINCT gram) AS dist
  FROM grams GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(coalesce(a.total, 0) AS BIGINT) AS total_grams,
       CAST(coalesce(a.dist, 0) AS BIGINT) AS distinct_grams
FROM toks t LEFT JOIN agg a USING (doc_id)
"""


SQL_DUP_PASSAGES_DOCUMENTS = rf"""
WITH {_SQL_GRAMS}
SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM grams GROUP BY gram
HAVING COUNT(DISTINCT doc_id) >= 2
"""


def q_dup_ratio_documents(sf_dir: str):
    """Per-document duplication ratio: fraction (floor-scaled e6) of each
    doc's DISTINCT word 5-grams that appear in >= 2 distinct docs — the
    per-doc score pipelines threshold on to drop near-boilerplate documents
    (stages/dedup.py::dup_ratio; Lee et al. ACL 2022). Docs with no tokens
    emit no row."""
    from ..stages.dedup import dup_ratio

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return dup_ratio(ds, id_col="doc_id", text_col="text", n=5, min_docs=2)


SQL_DUP_RATIO_DOCUMENTS = rf"""
WITH {_SQL_GRAMS},
pairs AS (SELECT DISTINCT doc_id, gram FROM grams),
gc AS (SELECT gram, COUNT(*) AS d FROM pairs GROUP BY 1)
SELECT p.doc_id,
       CAST(SUM(CASE WHEN gc.d >= 2 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS dup_e6
FROM pairs p JOIN gc USING (gram) GROUP BY 1
"""


def q_drop_boilerplate_documents(sf_dir: str):
    """Boilerplate drop: keep documents whose dup_ratio <= 0.35 (floor e6),
    token-less docs kept — dup_ratio's two skinny exchanges + the bucketed
    anti join (stages/dedup.py::drop_high_dup_ratio; the threshold-apply
    half of Lee et al. ACL 2022). Value-exact vs DuckDB."""
    from ..stages.dedup import drop_high_dup_ratio

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    kept = drop_high_dup_ratio(ds, id_col="doc_id", text_col="text",
                               n=5, min_docs=2, max_dup_e6=350_000)
    return kept.map_batches(lambda t: t.select(["doc_id"]),
                            batch_format="pyarrow", zero_copy_batch=True)


SQL_DROP_BOILERPLATE_DOCUMENTS = rf"""
WITH {_SQL_GRAMS},
pairs AS (SELECT DISTINCT doc_id, gram FROM grams),
gc AS (SELECT gram, COUNT(*) AS d FROM pairs GROUP BY 1),
score AS (
  SELECT p.doc_id,
         CAST(SUM(CASE WHEN gc.d >= 2 THEN 1 ELSE 0 END) * 1000000
              // COUNT(*) AS BIGINT) AS dup_e6
  FROM pairs p JOIN gc USING (gram) GROUP BY 1)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM score WHERE dup_e6 > 350000)
"""


def q_heavy_hitters_exact_documents(sf_dir: str):
    """EXACT phi-heavy hitters (phi=1/64) over document tokens: Misra-Gries
    candidates → exact recount → HAVING cnt*64 > N
    (stages/sketches.py::heavy_hitters_exact — two streaming passes, no
    token shuffle). The value-exact sibling of the rows-only MG/CMS sketch
    queries."""
    from ..stages.sketches import heavy_hitters_exact

    ds = _pq(sf_dir, "documents", ["text"])
    return heavy_hitters_exact(ds, text_col="text", k=64)


SQL_HEAVY_HITTERS_EXACT_DOCUMENTS = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS token FROM documents
), tot AS (SELECT count(*) AS n FROM toks)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM toks, tot
GROUP BY token, tot.n
HAVING count(*) * 64 > tot.n
"""


def q_semantic_dedup_embeddings(sf_dir: str):
    """SemDeDup-style semantic dedup (Abbas et al. 2023): out-of-core
    k-means blocks → within-cluster cosine >= 0.99 verify → connected
    components (stages/similarity.py::semantic_dedup). Rows-only
    (k-means blocking); planted-duplicate recovery and the LSH-path
    equivalence on verified pairs are pinned in tests."""
    from ..stages.similarity import semantic_dedup

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semantic_dedup(ds, threshold=0.99, n_clusters=8, iters=4)


def q_fellegi_sunter_transcripts(sf_dir: str):
    """UNSUPERVISED Fellegi-Sunter m/u/lambda estimation via EM over the
    flagship's blocking candidates (pipelines/eval.py::fellegi_sunter_em;
    Fellegi & Sunter 1969, Winkler 1988 — the Splink-style ER parameter
    learner, the unsupervised sibling of train_pair_scorer). The JW gate is
    disabled (threshold=0) so the sim features are ungated; EM's only
    distributed work is ONE pattern-count pass. Rows-only (float fixpoint);
    planted-mixture recovery is pinned in tests."""
    import dataclasses

    from .eval import fellegi_sunter_em
    from .linkage import run_linkage

    ungated = dataclasses.replace(CFG, threshold=0.0)
    out = run_linkage(transcripts_from_events(sf_dir), ungated)
    return fellegi_sunter_em(
        out["edges"], feature_cols=("sim_jaccard", "sim_jw", "sim_emb"),
        cuts=(0.3, 0.5, 0.7, 0.9))


def q_linkage_em_transcripts(sf_dir: str):
    """END-TO-END UNSUPERVISED linkage: the flagship pipeline with the
    match decision LEARNED by Fellegi-Sunter EM instead of the fixed
    weighted-score threshold (run_linkage's ``match_rule`` seam +
    eval.fs_match_rule — fit is one pattern-count pass over the candidate
    edges, decision is a posterior pattern filter). Rows-only (LSH + EM
    fixpoint); the F1 >= 0.98 / precision >= 0.999 gate vs labels is pinned
    in tests/test_pipeline.py::test_fs_em_match_rule_f1_gate."""
    import dataclasses

    from .eval import fs_match_rule
    from .linkage import run_linkage

    ungated = dataclasses.replace(CFG, threshold=0.0)
    out = run_linkage(transcripts_from_events(sf_dir), ungated,
                      match_rule=fs_match_rule())
    return out["clusters"]


def q_fs_review_pairs_transcripts(sf_dir: str):
    """Clerical-review queue (pipelines/eval.py::fs_review_pairs): FS-EM
    posterior in the ambiguous band, deterministic bottom-k-by-hash sample
    with posterior_e6 + feature columns — the Fellegi-Sunter 1969 third
    region / Splink review export. Rows-only (EM fixpoint)."""
    import dataclasses

    from .eval import fs_review_pairs
    from .linkage import run_linkage

    ungated = dataclasses.replace(CFG, threshold=0.0)
    out = run_linkage(transcripts_from_events(sf_dir), ungated)
    return fs_review_pairs(out["edges"], band=(0.02, 0.98), k=100)


def q_agreement_lang_id_documents(sf_dir: str):
    """Partition-agreement eval of the lang-ID classifier: B-cubed P/R/F1
    (Bagga & Baldwin '98, THE standard entity-resolution cluster metric)
    and Adjusted Rand Index between the predicted-language partition of
    documents and the labeled `lang` partition — one all-integer row
    (pipelines/eval.py::partition_agreement), bit-exact vs SQL including
    the floor/truncation conventions."""
    from ..stages.textstats import lang_id
    from .eval import partition_agreement

    ds = _pq(sf_dir, "documents", ["doc_id", "text", "lang"])
    pred = ds.map_batches(
        lambda t: pa.table({"lang_pred": lang_id(t.column("text")),
                            "lang": t.column("lang")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return partition_agreement(pred, pred_col="lang_pred", gold_col="lang")


def _sql_agreement_lang_id() -> str:
    # HUGEINT casts: the ARI cross-terms (~n^4) overflow int64 past ~55k
    # rows. DuckDB's // truncates toward zero — partition_agreement matches
    # (trunc on the one possibly-negative ARI quotient, floor==trunc on the
    # non-negative rest).
    return f"""
WITH pred AS ({_lang_sql()}),
j AS (SELECT p.lang_pred AS pred, d.lang AS gold
      FROM pred p JOIN documents d USING (doc_id)),
cont AS (SELECT pred, gold, CAST(COUNT(*) AS HUGEINT) AS ncg
         FROM j GROUP BY 1, 2),
csz AS (SELECT pred, SUM(ncg) AS nc FROM cont GROUP BY 1),
gsz AS (SELECT gold, SUM(ncg) AS ng FROM cont GROUP BY 1),
s AS (SELECT
  (SELECT SUM(ncg) FROM cont) AS n,
  (SELECT SUM(ncg * (ncg - 1) // 2) FROM cont) AS pb,
  (SELECT SUM(nc * (nc - 1) // 2) FROM csz) AS a,
  (SELECT SUM(ng * (ng - 1) // 2) FROM gsz) AS b,
  (SELECT SUM(ncg * ncg * 1000000 // nc)
   FROM cont JOIN csz USING (pred)) AS pn,
  (SELECT SUM(ncg * ncg * 1000000 // ng)
   FROM cont JOIN gsz USING (gold)) AS rn)
SELECT CAST(n AS BIGINT) AS n,
  CAST(pb AS BIGINT) AS pairs_both,
  CAST(a AS BIGINT) AS pairs_pred,
  CAST(b AS BIGINT) AS pairs_gold,
  CAST(pn * 1000000 // (n * 1000000) AS BIGINT) AS b3p_e6,
  CAST(rn * 1000000 // (n * 1000000) AS BIGINT) AS b3r_e6,
  CAST(CASE WHEN pn + rn = 0 THEN 0
       ELSE 2 * pn * rn * 1000000 // ((pn + rn) * n * 1000000)
       END AS BIGINT) AS b3f_e6,
  CAST(CASE WHEN (a + b) * (n * (n - 1) // 2) - 2 * a * b = 0 THEN 1000000
       ELSE 2 * (pb * (n * (n - 1) // 2) - a * b) * 1000000
            // ((a + b) * (n * (n - 1) // 2) - 2 * a * b)
       END AS BIGINT) AS ari_e6
FROM s
"""


def q_tpch_q3_style(sf_dir: str):
    """TPC-H Q3-style 3-table pipeline: filtered customer KEYS broadcast
    semi-join orders (keys-only small side: ~8 B/customer, broadcastable at
    any realistic scale — the co-group `semi_anti_join` remains the general
    path and has its own query), qualifying orders inner-join lineitem
    (cogroup_inner_join — large-large, unique right keys), integer-cents
    revenue aggregate, top 10. Exercises the join operators composed, the
    shape of every 'enrich the fact table' pipeline at scale."""
    import ray as _ray

    from ..functions.rayutil import collect_table
    from ..stages.joins import broadcast_semi_anti, cogroup_inner_join

    CUT = pa.scalar(np.datetime64("1998-06-01", "us"))
    cust_keys = _pq(sf_dir, "customer",
                    ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table({"o_custkey": t.filter(
            pc.equal(t.column("c_mktsegment"), "BUILDING")).column("c_custkey")}),
        batch_format="pyarrow", zero_copy_batch=True)
    keys_ref = _ray.put(collect_table(
        cust_keys, pa.schema([("o_custkey", pa.int64())])).column(
        "o_custkey").combine_chunks())
    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate",
                  "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.less(t.column("o_orderdate"), CUT)),
        batch_format="pyarrow", zero_copy_batch=True)
    qual = broadcast_semi_anti(orders, keys_ref,
                               key="o_custkey").map_batches(
        lambda t: pa.table({"l_orderkey": t.column("o_orderkey"),
                            "o_orderdate": t.column("o_orderdate"),
                            "o_orderpriority": t.column("o_orderpriority")}),
        batch_format="pyarrow", zero_copy_batch=True)
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_extendedprice", "l_discount",
              "l_shipdate"]).map_batches(
        lambda t: (lambda f: pa.table({
            "l_orderkey": f.column("l_orderkey"),
            "rev_c": pc.multiply(
                _cents(f.column("l_extendedprice")),
                pc.subtract(pa.scalar(100, pa.int64()),
                            _cents(f.column("l_discount"))))}))(
            t.filter(pc.greater(t.column("l_shipdate"), CUT))),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = cogroup_inner_join(
        li, qual, key="l_orderkey",
        right_cols=["o_orderdate", "o_orderpriority"], num_buckets=64)
    agg = joined.groupby(
        ["l_orderkey", "o_orderdate", "o_orderpriority"]).aggregate(
        Sum("rev_c"))
    from ..functions.rayutil import global_topk
    return global_topk(
        agg.map_batches(
            lambda t: t.rename_columns(["l_orderkey", "o_orderdate",
                                        "o_orderpriority", "revenue_cents"]),
            batch_format="pyarrow", zero_copy_batch=True),
        [("revenue_cents", "descending"), ("l_orderkey", "ascending")], 10)


SQL_TPCH_Q3_STYLE = """
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT)))
            AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cents DESC, l.l_orderkey ASC
LIMIT 10
"""


def q_corpus_prep_documents(sf_dir: str):
    """Flagship training-data-prep composition, end-to-end ORACLE-EXACT:
    lang-ID filter (en) → quality filter (≥20 tokens) → exact dedup
    (min doc_id per text) → benchmark decontamination (word-5-gram overlap
    vs held-out doc_id%50==0 docs) → RAG chunking (50-token windows every
    40). Every step is an existing operator; the composition runs as ONE
    streaming pipeline with a single skinny exchange (the dedup grouped_min)
    plus the broadcast gram set."""
    from ..functions.normalize import token_counts
    from ..functions.rayutil import grouped_min
    from ..stages.dedup import flag_contaminated
    from ..stages.packing import chunk_documents
    from ..stages.textstats import lang_id

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.equal(lang_id(t.column("text")), "en"),
                    pc.greater_equal(token_counts(t.column("text")),
                                     pa.scalar(20, pa.int32()))),
            pa.array((t.column("doc_id").to_numpy() % 50) != 0))
        return t.filter(mask)

    kept = docs.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)
    # exact dedup keeping (text, min doc_id) — text carries through the
    # skinny aggregate, so no join back is needed
    deduped = grouped_min(kept, "text", "doc_id", num_buckets=64)

    bench = docs.map_batches(
        lambda t: t.filter(pa.array((t.column("doc_id").to_numpy() % 50) == 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    clean = flag_contaminated(deduped, bench, id_col="doc_id",
                              text_col="text").map_batches(
        lambda t: t.filter(pc.invert(t.column("contaminated"))).select(
            ["doc_id", "text"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return chunk_documents(clean, id_col="doc_id", text_col="text",
                           chunk_size=50, stride=40)


def _corpus_prep_sql() -> str:
    lang = _lang_sql()
    return rf"""
WITH lang AS ({lang}),
ntok AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
         END AS n_tokens
  FROM documents),
kept AS (
  SELECT t.doc_id, t.text
  FROM ntok t JOIN lang l USING (doc_id)
  WHERE l.lang_pred = 'en' AND t.n_tokens >= 20 AND t.doc_id % 50 <> 0),
dedup AS (SELECT MIN(doc_id) AS doc_id, text FROM kept GROUP BY text),
btoks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
  FROM documents WHERE doc_id % 50 = 0),
bgrams AS (
  SELECT DISTINCT CASE WHEN len(tk) < 5 THEN array_to_string(tk, ' ')
              ELSE array_to_string(list_slice(tk, i, i + 4), ' ') END AS gram
  FROM btoks,
       unnest(CASE WHEN len(tk) = 0 THEN []
                   WHEN len(tk) < 5 THEN [1]
                   ELSE range(1, len(tk) - 3) END) AS u(i)),
ctoks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk, text
  FROM dedup),
contam AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id,
               CASE WHEN len(tk) < 5 THEN array_to_string(tk, ' ')
                    ELSE array_to_string(list_slice(tk, i, i + 4), ' ')
               END AS gram
        FROM ctoks,
             unnest(CASE WHEN len(tk) < 5 THEN [1]
                         ELSE range(1, len(tk) - 3) END) AS u(i)) g
  JOIN bgrams b USING (gram)),
clean AS (
  SELECT d.doc_id, d.text FROM dedup d
  LEFT JOIN contam c USING (doc_id) WHERE c.doc_id IS NULL),
toks2 AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS arr,
         CAST(array_length(regexp_extract_all(lower(text), '[a-z]+'))
              AS BIGINT) AS len
  FROM clean),
starts AS (
  SELECT doc_id, arr, len, unnest(range(0, len, 40)) AS gs
  FROM toks2 WHERE len > 0)
SELECT doc_id,
       gs // 40 AS chunk_idx,
       LEAST(gs + 50, len) - gs AS n_tokens,
       array_to_string(arr[gs + 1 : LEAST(gs + 50, len)], ' ') AS chunk_text
FROM starts
"""


# ---------------------------------------------------------------------------
# round-3 additions: sorted-neighborhood blocking, weighted sampling,
# phonetic (soundex) blocking keys
# ---------------------------------------------------------------------------

def q_snm_pairs_documents(sf_dir: str):
    """Sorted-neighborhood blocking (Hernandez-Stolfo SIGMOD'95): candidate
    pairs within a window of 8 positions under ORDER BY (12-char lowercased
    text prefix, doc_id). Distributed: sampled range-partition boundaries ->
    exact dense global rank -> rank-chunk pairing with <= (window-1)/chunk
    ghost replication (stages/neighborhood.py)."""
    from ..stages.neighborhood import sorted_neighborhood_pairs

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def add_key(t: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(pc.utf8_lower(t.column("text")), 0, 12)
        return pa.table({"doc_id": t.column("doc_id"), "key": key})

    keyed = docs.map_batches(add_key, batch_format="pyarrow",
                             zero_copy_batch=True)
    return sorted_neighborhood_pairs(keyed, id_col="doc_id", key_col="key",
                                     window=8, num_buckets=16, chunk=512)


SQL_SNM_PAIRS_DOCUMENTS = """
WITH k AS (SELECT doc_id, substr(lower(text), 1, 12) AS key FROM documents),
r AS (SELECT doc_id,
             row_number() OVER (ORDER BY key, doc_id) - 1 AS rk
      FROM k)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 7
"""


def q_snm_multipass_documents(sf_dir: str):
    """Multi-pass sorted-neighborhood (the standard recall fix from the
    SIGMOD'95 paper: one pass per key, union the candidate pairs): pass 1
    sorts by the text prefix, pass 2 by the reversed-text prefix, pairs
    normalized to (min,max) and deduped by one skinny (id_a,id_b) groupby."""
    from ..stages.neighborhood import sorted_neighborhood_pairs

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def add_keys(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t.column("text"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "k1": pc.utf8_slice_codeunits(low, 0, 12),
            "k2": pc.utf8_slice_codeunits(pc.utf8_reverse(low), 0, 12),
        })

    keyed = docs.map_batches(add_keys, batch_format="pyarrow",
                             zero_copy_batch=True)
    p1 = sorted_neighborhood_pairs(keyed, id_col="doc_id", key_col="k1",
                                   window=8, num_buckets=16, chunk=512)
    p2 = sorted_neighborhood_pairs(keyed, id_col="doc_id", key_col="k2",
                                   window=8, num_buckets=16, chunk=512)

    def norm(t: pa.Table) -> pa.Table:
        a, b = t.column("id_a"), t.column("id_b")
        return pa.table({"id_a": pc.min_element_wise(a, b),
                         "id_b": pc.max_element_wise(a, b)})

    u = p1.union(p2).map_batches(norm, batch_format="pyarrow",
                                 zero_copy_batch=True)
    dedup = u.groupby(["id_a", "id_b"]).aggregate(Count())
    return dedup.map_batches(lambda t: t.select(["id_a", "id_b"]),
                             batch_format="pyarrow", zero_copy_batch=True)


SQL_SNM_MULTIPASS_DOCUMENTS = """
WITH k AS (SELECT doc_id, substr(lower(text), 1, 12) AS k1,
                  substr(reverse(lower(text)), 1, 12) AS k2
           FROM documents),
r1 AS (SELECT doc_id, row_number() OVER (ORDER BY k1, doc_id) - 1 AS rk FROM k),
r2 AS (SELECT doc_id, row_number() OVER (ORDER BY k2, doc_id) - 1 AS rk FROM k)
SELECT LEAST(a.doc_id, b.doc_id) AS id_a, GREATEST(a.doc_id, b.doc_id) AS id_b
FROM r1 a JOIN r1 b ON b.rk > a.rk AND b.rk <= a.rk + 7
UNION
SELECT LEAST(a.doc_id, b.doc_id), GREATEST(a.doc_id, b.doc_id)
FROM r2 a JOIN r2 b ON b.rk > a.rk AND b.rk <= a.rk + 7
"""


def q_canopy_assign_documents(sf_dir: str):
    """Canopy blocking (McCallum-Nigam-Ungar KDD'00, deterministic
    distributed variant): hash-selected centers, docs assigned to every
    center sharing >= 3 distinct word trigram shingles (df-capped at a
    corpus-relative n_docs/20 — an absolute cap can't hold across scale
    factors). One token co-group + one pair groupby (stages/canopy.py)."""
    import pyarrow.parquet as papq

    from ..stages.canopy import canopy_assign

    n_docs = papq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return canopy_assign(docs, id_col="doc_id", text_col="text",
                         shingle=3, center_mod=10, min_shared=3,
                         max_df=max(100, n_docs // 20), num_buckets=32)


SQL_CANOPY_ASSIGN_DOCUMENTS = """
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
           FROM documents),
tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                )) AS tk
  FROM w),
ok AS (SELECT tk FROM tok GROUP BY tk
       HAVING COUNT(*) <= GREATEST(100, (SELECT COUNT(*) FROM documents) // 20)),
tok2 AS (SELECT t.doc_id, t.tk FROM tok t JOIN ok USING (tk)),
centers AS (
  SELECT doc_id AS center_id, tk FROM tok2
  WHERE ((doc_id % 2147483648 + 2147483648) % 2147483648)
        * 2654435761 % 2147483648 % 10 = 0)
SELECT t.doc_id, c.center_id, COUNT(*) AS n_shared
FROM tok2 t JOIN centers c USING (tk)
GROUP BY 1, 2 HAVING COUNT(*) >= 3
"""


def q_weighted_sample_documents(sf_dir: str):
    """Weight-proportional k-sample without replacement (Efraimidis-Spirakis
    A-Res, deterministic hash randomness): 100 docs drawn proportional to
    n_chars — the 'sample long documents more' corpus-curation op. No
    shuffle: per-batch bottom-k prune + O(k x blocks) reduce."""
    from ..stages.sampling import weighted_bottomk

    docs = _pq(sf_dir, "documents", ["doc_id", "n_chars", "lang"])
    return weighted_bottomk(docs, id_col="doc_id", weight_col="n_chars",
                            k=100, carry_cols=["n_chars", "lang"])


SQL_WEIGHTED_SAMPLE_DOCUMENTS = """
SELECT doc_id, n_chars, lang FROM documents
ORDER BY -ln((((doc_id % 2147483648 + 2147483648) % 2147483648)
              * 2654435761 % 2147483648 + 0.5) / 2147483648.0)
         / CAST(n_chars AS DOUBLE),
         doc_id
LIMIT 100
"""


def q_shuffle_export_documents(sf_dir: str):
    """Deterministic global shuffle + shard assignment for training export:
    each doc's rank in the Knuth-hash order -> (shard, pos) at 64 rows per
    shard. Hash order replaces random_shuffle so the layout is reproducible
    and resumable; two-pass range-bucket scan, no global sort
    (stages/sampling.shuffle_shard_assign)."""
    from ..stages.sampling import shuffle_shard_assign

    docs = _pq(sf_dir, "documents", ["doc_id", "source"])
    return shuffle_shard_assign(docs, id_col="doc_id", rows_per_shard=64,
                                carry_cols=["source"])


SQL_SHUFFLE_EXPORT_DOCUMENTS = """
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           ORDER BY ((doc_id % 2147483648 + 2147483648) % 2147483648)
                    * 2654435761 % 2147483648, doc_id) - 1 AS rank
  FROM documents)
SELECT doc_id, source, rank // 64 AS shard, rank % 64 AS pos FROM ranked
"""


def q_grouped_median_events(sf_dir: str):
    """Exact per-user median event value (ANSI median semantics: NULLs
    ignored, even counts average the middle pair). One bucketed exchange of
    (user_id, value) pairs; every group's median computed by two vectorized
    gathers — no per-group Python, no global sort
    (stages/selection.grouped_median)."""
    from ..stages.selection import grouped_median

    ev = _pq(sf_dir, "events", ["user_id", "value"])
    return grouped_median(ev, group_col="user_id", val_col="value",
                          out_col="median_value")


SQL_GROUPED_MEDIAN_EVENTS = """
SELECT user_id, median(value) AS median_value
FROM events WHERE value IS NOT NULL GROUP BY user_id
"""


def q_soundex_blocks_documents(sf_dir: str):
    """Phonetic blocking-key histogram: American Soundex of each document's
    first alpha token, grouped counts — the name-typo-robust blocking key
    family (functions/phonetic.py; per-distinct-token Python over the
    dictionary-encoded column, vectorized take back)."""
    from ..functions.phonetic import soundex_codes

    docs = _pq(sf_dir, "documents", ["text"])

    def code(t: pa.Table) -> pa.Table:
        return pa.table({"code": soundex_codes(t.column("text"))})

    agg = (docs.map_batches(code, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("code").aggregate(Count()))
    return agg.map_batches(lambda t: t.rename_columns(["code", "cnt"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def _sql_soundex_blocks() -> str:
    from ..functions.phonetic import soundex_sql
    return f"""
SELECT {soundex_sql('text')} AS code, COUNT(*) AS cnt
FROM documents GROUP BY 1
"""


def q_funnel_events(sf_dir: str):
    """Ordered funnel over the event stream: distinct users reaching
    signup -> view -> purchase with each next step at-or-after the
    previous (stages/behavior.py::funnel_counts — one bucket exchange on
    user_id + masked minimum.reduceat chain per step). Oracle: the same
    chained-min definition as three dependent CTEs."""
    from ..stages.behavior import funnel_counts

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return funnel_counts(ev, ["signup", "view", "purchase"],
                         key="user_id", ts="ts", type_col="event_type")


SQL_FUNNEL_EVENTS = """
WITH s1 AS (SELECT user_id, min(ts) t FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) t FROM events e JOIN s1 USING(user_id)
       WHERE e.event_type = 'view' AND e.ts >= s1.t GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) t FROM events e JOIN s2 USING(user_id)
       WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY e.user_id)
SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step_name,
       (SELECT count(*) FROM s1) AS users
UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
ORDER BY step_idx
"""


def q_cohort_retention_events(sf_dir: str):
    """Daily cohort-retention triangle: cohort = a user's first active day,
    one row per (cohort, day offset) with distinct active users
    (stages/behavior.py::cohort_retention — distinct (user, day) pairs fall
    out of the time-sorted segments with one diff, partial counts pre-fold
    per bucket)."""
    from ..stages.behavior import cohort_retention

    ev = _pq(sf_dir, "events", ["ts", "user_id"])
    return cohort_retention(ev, key="user_id", ts="ts",
                            period_us=86_400 * 1_000_000)


SQL_COHORT_RETENTION_EVENTS = """
WITH per AS (SELECT user_id, epoch_us(ts) // 86400000000 AS p FROM events),
firsts AS (SELECT user_id, min(p) AS cohort FROM per GROUP BY user_id),
act AS (SELECT DISTINCT per.user_id, firsts.cohort,
               per.p - firsts.cohort AS poff
        FROM per JOIN firsts USING(user_id))
SELECT cohort AS cohort_period, poff AS period_offset, count(*) AS users
FROM act GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_transition_matrix_events(sf_dir: str):
    """First-order Markov transitions between consecutive event types per
    user (+ empirical transition probability). The classic behavioral-model
    feature over an event log (stages/behavior.py::transition_counts —
    pairs pre-folded per bucket, exchange rows bounded by vocab², share via
    one skinny from_type pass). Oracle: lead() window + partition share."""
    from ..stages.behavior import transition_counts

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return transition_counts(ev, key="user_id", ts="ts", tie="event_id",
                             type_col="event_type")


SQL_TRANSITION_MATRIX_EVENTS = """
WITH seq AS (SELECT user_id, event_type AS f,
                    lead(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS t
             FROM events),
cnts AS (SELECT f AS from_type, t AS to_type, count(*) AS cnt
         FROM seq WHERE t IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, cnt,
       cnt / (sum(cnt) OVER (PARTITION BY from_type)) AS share
FROM cnts ORDER BY 1, 2
"""


def q_skyline_lineitem(sf_dir: str):
    """2-D skyline (Pareto frontier) of lineitem maximizing both
    extendedprice and discount — the 'no other row at least as good in
    both and better in one' multi-objective filter
    (stages/behavior.py::skyline2d — per-block local frontier, exact
    single-block finish over frontier candidates only). Oracle: the
    textbook NOT EXISTS dominance predicate."""
    from ..stages.behavior import skyline2d

    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])
    return skyline2d(li, x="l_extendedprice", y="l_discount").sort(
        ["l_orderkey", "l_linenumber"])


SQL_SKYLINE_LINEITEM = """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
FROM lineitem p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem q
  WHERE q.l_extendedprice >= p.l_extendedprice
    AND q.l_discount >= p.l_discount
    AND (q.l_extendedprice > p.l_extendedprice
         OR q.l_discount > p.l_discount))
ORDER BY l_orderkey, l_linenumber
"""


def q_triangle_count_events(sf_dir: str):
    """Exact triangle count of the user-interaction graph (u—v whenever v's
    event directly follows u's within an event type): the standard
    clustering-coefficient numerator. Edges via
    behavior.consecutive_pairs (one bucket exchange), count via the
    degree-ordered node iterator (stages/graph.py::triangle_count — wedges
    bounded O(m^1.5) regardless of hub skew, closure via bucketed semi
    join). Oracle: lead() edge derivation + the a<b<c three-way self
    join."""
    from ..stages.behavior import consecutive_pairs
    from ..stages.graph import triangle_count

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    edges = consecutive_pairs(ev, key="event_type", ts="ts", tie="event_id",
                              val="user_id")
    edges = edges.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("src"), t.column("dst"))),
        batch_format="pyarrow", zero_copy_batch=True)
    n = triangle_count(edges)
    return pa.table({"n_triangles": pa.array([n], type=pa.int64())})


SQL_TRIANGLE_COUNT_EVENTS = """
WITH raw AS (SELECT user_id AS src,
                    lead(user_id) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) AS dst
             FROM events QUALIFY dst IS NOT NULL AND dst != user_id),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM raw)
SELECT count(*) AS n_triangles
FROM e e1 JOIN e e2 ON e1.b = e2.a
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def q_kcore_lineitem(sf_dir: str):
    """3-core of a (deterministically thinned) part–supplier bipartite
    graph: iterative degree peeling to the fixpoint
    (stages/graph.py::k_core — per round one skinny degree groupby + one
    broadcast keep-set edge filter, semi-join fallback past the broadcast
    cap; edge state shrinks monotonically). Peeling is confluent, so the
    fixpoint equals the oracle's unrolled synchronous peel; the SQL twin
    unrolls 16 rounds (measured convergence: 4–5 rounds at sf0.01/0.1)."""
    from ..stages.graph import k_core

    li = _pq(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def mk_edges(t: pa.Table) -> pa.Table:
        import numpy as np
        p = np.asarray(t.column("l_partkey"), dtype=np.int64)
        s = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        # deterministic 1/25 thinning (same arithmetic as the SQL twin);
        # node namespaces: parts even, suppliers odd
        m = (p * 1000003 + s) % 25 == 0
        return pa.table({"src": pa.array(p[m] * 2),
                         "dst": pa.array(s[m] * 2 + 1)})

    edges = li.map_batches(mk_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    return k_core(edges, 3).sort("node")


def _sql_kcore_lineitem(k: int = 3, rounds: int = 16) -> str:
    """Unrolled synchronous-peeling twin of q_kcore_lineitem (chained CTEs
    — DuckDB's recursive CTE cannot aggregate over the recursive relation,
    same workaround as _pagerank_sql)."""
    # AS MATERIALIZED: without it DuckDB inlines each CTE at every
    # reference site and the 16-round chain expands 3^16-fold
    parts = [f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v
  FROM lineitem
  WHERE (l_partkey * 1000003 + l_suppkey) % 25 = 0)"""]
    for i in range(rounds):
        parts.append(f""",
d{i} AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
           SELECT u AS node FROM e{i} UNION ALL SELECT v FROM e{i})
         GROUP BY node),
e{i + 1} AS MATERIALIZED (SELECT e.u, e.v FROM e{i} e
             JOIN d{i} a ON a.node = e.u JOIN d{i} b ON b.node = e.v
             WHERE a.deg >= {k} AND b.deg >= {k})""")
    parts.append(f""",
dfin AS (SELECT node, count(*) AS deg FROM (
           SELECT u AS node FROM e{rounds} UNION ALL SELECT v FROM e{rounds})
         GROUP BY node)
SELECT node, deg FROM dfin WHERE deg >= {k} ORDER BY node""")
    return "".join(parts)


_MIXTURE_WEIGHTS = {f"src{i}": (i % 4) + 1 for i in range(20)}


def q_mixture_sample_documents(sf_dir: str):
    """Deterministic training-data mixing: rebalance the documents corpus
    so source proportions follow a 1:2:3:4 target cycle, keeping the
    binding source near-whole (stages/sampling.py::mixture_sample — one skinny
    per-source count pass + one streaming Knuth-hash filter; rates derived
    in pure-integer arithmetic so the HUGEINT SQL twin lands on identical
    rates and the membership predicate is the module's standard
    sample_bucket expression)."""
    from ..stages.sampling import mixture_sample

    ds = _pq(sf_dir, "documents", ["doc_id", "source"])
    return mixture_sample(ds, id_col="doc_id", source_col="source",
                          weights=_MIXTURE_WEIGHTS)


def _sql_mixture_sample_documents() -> str:
    vals = ", ".join(f"('{s}', {w})" for s, w in _MIXTURE_WEIGHTS.items())
    return f"""
WITH w(source, wgt) AS (VALUES {vals}),
n AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
cap AS (SELECT min(CAST(n.n AS HUGEINT) * 10000 // w.wgt) AS c
        FROM n JOIN w USING(source)),
r AS (SELECT w.source, CAST(cap.c * w.wgt // n.n AS BIGINT) AS bp
      FROM w JOIN n USING(source), cap)
SELECT d.doc_id, d.source FROM documents d JOIN r USING(source)
WHERE (((doc_id % 2147483648 + 2147483648) % 2147483648)
       * 2654435761 % 2147483648) % 10000 < r.bp
"""


_FUNNEL_WINDOW_US = 6 * 3600 * 1_000_000


def q_funnel_window_events(sf_dir: str):
    """Conversion-window funnel: signup -> view -> purchase where each
    transition must land within 6 hours of the previous step
    (behavior.funnel_counts(window=...) — the windowed variant of the
    chained-min semantics; step 1 unconstrained). Counts differentiate
    sharply from the unwindowed funnel (150/15/2 vs 150/150/150 at
    sf0.01), exercising the window arm of the kernel."""
    from ..stages.behavior import funnel_counts

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return funnel_counts(ev, ["signup", "view", "purchase"],
                         key="user_id", ts="ts", type_col="event_type",
                         window=_FUNNEL_WINDOW_US)


SQL_FUNNEL_WINDOW_EVENTS = f"""
WITH s1 AS (SELECT user_id, min(ts) t FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) t FROM events e JOIN s1 USING(user_id)
       WHERE e.event_type = 'view' AND e.ts >= s1.t
         AND epoch_us(e.ts) <= epoch_us(s1.t) + {_FUNNEL_WINDOW_US}
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) t FROM events e JOIN s2 USING(user_id)
       WHERE e.event_type = 'purchase' AND e.ts >= s2.t
         AND epoch_us(e.ts) <= epoch_us(s2.t) + {_FUNNEL_WINDOW_US}
       GROUP BY e.user_id)
SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step_name,
       (SELECT count(*) FROM s1) AS users
UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
ORDER BY step_idx
"""


def q_adamic_adar_events(sf_dir: str):
    """Adamic–Adar link prediction over the user-interaction graph (same
    edge derivation as triangle_count_events): top-100 NEW links by
    aa_e9 = sum over common neighbors w of floor(1e9/ln(deg w) + 0.5),
    the per-term-quantized e9 idiom (order-independent integer sum, so
    hash-exact vs the SQL twin). stages/graph.py::adamic_adar — one
    bucket exchange for wedges (deg(w) read off the segment length, no
    degree table), one pair groupby, one anti join vs existing edges;
    final 100 rows via global_topk (k rows per block, no global sort)."""
    from ..functions.rayutil import global_topk
    from ..stages.behavior import consecutive_pairs
    from ..stages.graph import adamic_adar

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    edges = consecutive_pairs(ev, key="event_type", ts="ts", tie="event_id",
                              val="user_id")
    edges = edges.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("src"), t.column("dst"))),
        batch_format="pyarrow", zero_copy_batch=True)
    scored = adamic_adar(edges)
    return global_topk(scored, [("aa_e9", "descending"), ("u", "ascending"),
                                ("v", "ascending")], 100)


SQL_ADAMIC_ADAR_EVENTS = """
WITH raw AS (SELECT user_id AS src,
                    lead(user_id) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) AS dst
             FROM events QUALIFY dst IS NOT NULL AND dst != user_id),
e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM raw),
adj AS (SELECT u AS w, v AS nbr FROM e UNION ALL SELECT v AS w, u AS nbr
        FROM e),
deg AS (SELECT w, count(*) AS d FROM adj GROUP BY w),
wedge AS (SELECT a.nbr AS u, b.nbr AS v,
                 CAST(FLOOR(1e9 / ln(CAST(d.d AS DOUBLE)) + 0.5) AS BIGINT)
                     AS wt
          FROM adj a JOIN adj b ON a.w = b.w AND a.nbr < b.nbr
          JOIN deg d ON d.w = a.w),
aa AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
              CAST(SUM(wt) AS BIGINT) AS aa_e9
       FROM wedge GROUP BY u, v),
newl AS (SELECT aa.u, aa.v, aa.cn, aa.aa_e9 FROM aa
         LEFT JOIN e ON aa.u = e.u AND aa.v = e.v WHERE e.u IS NULL)
SELECT u, v, cn, aa_e9 FROM newl ORDER BY aa_e9 DESC, u, v LIMIT 100
"""


def q_mad_outliers_events(sf_dir: str):
    """Robust per-event-type outlier rows by the Hampel identifier
    |x − median| > 3·MAD (stages/selection.py::grouped_mad_outliers) —
    INTEGER-EXACT: medians carried at 2× scale, MAD at 4×, the flag is
    2·d2 > 3·mad4 in pure int64, so the hash matches the SQL twin's
    identical scaled expressions. Two grouped-median bucket exchanges +
    broadcast stat attach; the driver holds only per-group stats."""
    from ..stages.selection import grouped_mad_outliers

    ev = _pq(sf_dir, "events", ["event_id", "event_type", "value"])
    cents = ev.map_batches(
        lambda t: pa.table({"event_type": t.column("event_type"),
                            "event_id": t.column("event_id"),
                            "value_cents": _cents(t.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return grouped_mad_outliers(cents, group_col="event_type",
                                val_col="value_cents",
                                keep_cols=["event_id"], k=3)


SQL_MAD_OUTLIERS_EVENTS = """
WITH t AS (SELECT event_type, event_id,
                  CAST(ROUND(value * 100) AS BIGINT) AS value_cents
           FROM events WHERE value IS NOT NULL),
med AS (SELECT event_type, CAST(2 * median(value_cents) AS BIGINT) AS med2
        FROM t GROUP BY event_type),
d AS (SELECT t.event_type, t.event_id, t.value_cents,
             ABS(2 * t.value_cents - m.med2) AS d2
      FROM t JOIN med m ON t.event_type = m.event_type),
mad AS (SELECT event_type, CAST(2 * median(d2) AS BIGINT) AS mad4
        FROM d GROUP BY event_type)
SELECT d.event_type, d.event_id, d.value_cents
FROM d JOIN mad ON d.event_type = mad.event_type
WHERE 2 * d.d2 > 3 * mad.mad4
"""


def q_bpe_train_documents(sf_dir: str):
    """Distributed BPE tokenizer training (Sennrich'16): one streaming
    word-count pass + one distinct-word groupby, merge loop over the
    pruned (word, count) table on the driver — the standard formulation;
    merge statistics depend only on the frequency table, so the corpus
    never leaves the cluster (stages/tokenizer.py::bpe_train, min_count
    prunes the tail in-cluster, max_vocab fails loudly). Returns the
    64-merge table (rank, left, right). Not SQL-expressible (iterative
    argmax with state); exactness pinned in tests/test_tokenizer.py
    against a from-scratch recount reference."""
    from ..stages.tokenizer import bpe_train

    docs = _pq(sf_dir, "documents", ["text"])
    return bpe_train(docs, "text", 64, min_count=2)


def q_bpe_token_count_documents(sf_dir: str):
    """Per-document token count under a corpus-trained 64-merge BPE
    vocabulary (stages/tokenizer.py::bpe_token_counts): merge table
    broadcast once, per-batch dictionary-encode so the merge loop runs
    per DISTINCT word with a per-worker memo — the soundex idiom. Batch-
    split invariance + driver-encode equality pinned in tests.

    VALUE-EXACT oracle via the degenerate-config twin: with ZERO merges
    every word encodes to its characters, so the engine's encode path run
    with an empty merge table must produce exactly
    length(regexp_replace(lower(text), '[^a-z]', '')) — plain SQL. The
    trained count is bracketed per doc (word count ≤ trained ≤ char
    count; each merge only ever shrinks a word's symbol sequence) and the
    bracket is emitted as a boolean the SQL asserts TRUE. Exact trained
    values are pinned in tests/test_tokenizer.py."""
    from ..stages.joins import cogroup_join_multi
    from ..stages.tokenizer import bpe_token_counts, bpe_train

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_train(docs, "text", 64, min_count=2)
    trained = bpe_token_counts(docs, "text", "doc_id", merges)
    empty = pa.table({"rank": pa.array([], type=pa.int64()),
                      "left": pa.array([], type=pa.string()),
                      "right": pa.array([], type=pa.string())})
    base = bpe_token_counts(docs, "text", "doc_id", empty).map_batches(
        lambda t: t.rename_columns(["doc_id", "n_chars_az"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def words(t: pa.Table) -> pa.Table:
        from ..functions.normalize import extract_all_matches
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ml = extract_all_matches(pc.utf8_lower(text), r"[a-z]+")
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_words": pc.cast(pc.list_value_length(ml),
                                            pa.int64())})

    nw = docs.map_batches(words, batch_format="pyarrow",
                          zero_copy_batch=True)
    j1 = cogroup_join_multi(
        trained, base, key="doc_id", left_cols=["n_bpe_tokens"],
        right_cols=["n_chars_az"],
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("n_bpe_tokens", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("n_chars_az", pa.int64())]))
    j2 = cogroup_join_multi(
        j1, nw, key="doc_id", left_cols=["n_bpe_tokens", "n_chars_az"],
        right_cols=["n_words"],
        left_schema=pa.schema([("n_bpe_tokens", pa.int64()),
                               ("doc_id", pa.int64()),
                               ("n_chars_az", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("n_words", pa.int64())]))
    return j2.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars_az": t.column("n_chars_az"),
            "trained_in_bounds": pc.and_(
                pc.less_equal(t.column("n_words"),
                              t.column("n_bpe_tokens")),
                pc.less_equal(t.column("n_bpe_tokens"),
                              t.column("n_chars_az")))}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_BPE_TOKEN_COUNT_DOCUMENTS = """
SELECT doc_id,
       CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
            AS BIGINT) AS n_chars_az,
       TRUE AS trained_in_bounds
FROM documents
"""


def q_roc_auc_events(sf_dir: str):
    """Exact distributed ROC-AUC (Mann–Whitney with tie correction) of
    the event value as a 'purchase' classifier score
    (pipelines/eval.py::roc_auc): one combiner pass + one distinct-score
    groupby; the driver folds only the distinct-score table in
    arbitrary-precision ints — auc_num2 carried at 2× scale, auc_e9 =
    floor(num2·1e9/(2·den) + 0.5), all integer, hash-exact vs the
    HUGEINT SQL twin."""
    from .eval import roc_auc

    ev = _pq(sf_dir, "events", ["event_type", "value"])
    scored = ev.map_batches(
        lambda t: pa.table({
            "score": _cents(t.column("value")),
            "lab": pc.equal(t.column("event_type"), "purchase")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return roc_auc(scored, score_col="score", label_col="lab")


SQL_ROC_AUC_EVENTS = """
WITH t AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS score,
                  (event_type = 'purchase') AS lab FROM events),
s AS (SELECT score,
             CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(SUM(CASE WHEN lab THEN 0 ELSE 1 END) AS BIGINT) AS nn
      FROM t GROUP BY score),
c AS (SELECT np, nn,
             COALESCE(SUM(nn) OVER (ORDER BY score
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cumnn
      FROM s)
SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
       CAST(SUM(nn) AS BIGINT) AS n_neg,
       CAST(SUM(np * (2 * cumnn + nn)) AS BIGINT) AS auc_num2,
       CAST((SUM(np * (2 * cumnn + nn)) * 1000000000
             + SUM(np) * SUM(nn))
            // (2 * SUM(np) * SUM(nn)) AS BIGINT) AS auc_e9
FROM c
"""


def q_clustering_coef_events(sf_dir: str):
    """Per-node local clustering coefficient (Watts–Strogatz) of the
    user-interaction graph — same edge derivation as
    triangle_count_events (stages/graph.py::local_clustering): closed
    triangles credit all three vertices, one skinny groupby + one cogroup
    LEFT join against the degree table; coef_e9 =
    trunc(2·tri·1e9/(deg·(deg−1))), NULL for deg<2 — hash-exact vs the
    three-way self-join twin."""
    from ..stages.behavior import consecutive_pairs
    from ..stages.graph import local_clustering

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    edges = consecutive_pairs(ev, key="event_type", ts="ts", tie="event_id",
                              val="user_id")
    edges = edges.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("src"), t.column("dst"))),
        batch_format="pyarrow", zero_copy_batch=True)
    return local_clustering(edges)


SQL_CLUSTERING_COEF_EVENTS = """
WITH raw AS (SELECT user_id AS src,
                    lead(user_id) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) AS dst
             FROM events QUALIFY dst IS NOT NULL AND dst != user_id),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw),
tri3 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM e e1 JOIN e e2 ON e1.b = e2.a
         JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
pernode AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri
            FROM (SELECT x AS node FROM tri3
                  UNION ALL SELECT y FROM tri3
                  UNION ALL SELECT z FROM tri3)
            GROUP BY node),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node)
SELECT d.node, COALESCE(p.tri, 0) AS tri, d.deg,
       CASE WHEN d.deg >= 2 THEN
            CAST((2 * COALESCE(p.tri, 0) * CAST(1000000000 AS HUGEINT))
                 // (d.deg * (d.deg - 1)) AS BIGINT)
       END AS coef_e9
FROM deg d LEFT JOIN pernode p USING (node)
"""


def q_blocking_frontier_transcripts(sf_dir: str):
    """Blocking-rule cost/coverage frontier (pipelines/eval.py::
    blocking_rule_frontier — the Splink blocking-analysis report):
    candidate-pair count from the key histogram (no pair
    materialization) + recall on labeled true pairs via two cogroup key
    attaches, for four candidate rules (first_char / prefix3 /
    first_token / soundex) over the deterministic labeled corpus (the
    blocking_metrics fixture).

    Agreement oracle: the corpus is synthesized, so SQL cannot see the
    per-rule numbers — instead the wrapper recomputes the whole frontier
    with an independent NAIVE driver reference (Counter over keys,
    dict-lookup recall — fixture-scale only) and emits one boolean per
    rule asserting the distributed histogram/cogroup path produced
    identical (cand_pairs, true_pairs, covered, recall_e6); the SQL
    asserts TRUE per rule. blocking_frontier_part is the fully
    value-exact twin of the same operator on parquet data."""
    import ray.data as rd

    from ..functions.rayutil import collect_table
    from ..synth import generate_corpus
    from .eval import blocking_rule_frontier, default_blocking_rules
    from .linkage import run_linkage

    tables = generate_corpus(seed=21, n_convs=300)
    out = run_linkage(rd.from_arrow(tables["transcripts"]), CFG)
    records = out["records"].map_batches(
        lambda t: t.select(["record_id", "mention_norm"]),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    labels = rd.from_arrow(tables["labels"])
    frontier = blocking_rule_frontier(records, labels)

    # naive reference over the collected fixture (bounded: 300 convs)
    rec = collect_table(records, pa.schema([
        ("record_id", pa.string()), ("mention_norm", pa.string())]))
    lab = tables["labels"]
    lab = lab.filter(pc.cast(lab.column("same_entity"), pa.bool_()))
    rows = {r["rule"]: r for r in frontier.to_pylist()}
    oks = []
    for name, fn in default_blocking_rules().items():
        keys = fn(rec.column("mention_norm").combine_chunks())
        kmap = {}
        from collections import Counter
        cnt: Counter = Counter()
        for rid, k in zip(rec.column("record_id").to_pylist(),
                          keys.to_pylist()):
            if k:
                kmap[rid] = k
                cnt[k] += 1
        cand = sum(c * (c - 1) // 2 for c in cnt.values())
        n_true = lab.num_rows
        covered = sum(
            1 for a, b in zip(lab.column("id_a").to_pylist(),
                              lab.column("id_b").to_pylist())
            if kmap.get(a) is not None and kmap.get(a) == kmap.get(b))
        r = rows.get(name)
        oks.append((name, r is not None and r["cand_pairs"] == cand
                    and r["true_pairs"] == n_true
                    and r["covered"] == covered
                    and r["recall_e6"] == (covered * 10**6) // n_true))
    oks.sort()
    return pa.table({"rule": pa.array([o[0] for o in oks]),
                     "frontier_ok": pa.array([o[1] for o in oks])})


SQL_BLOCKING_FRONTIER_TRANSCRIPTS = """
SELECT rule, TRUE AS frontier_ok
FROM (VALUES ('first_char'), ('prefix3'), ('first_token'), ('soundex'))
     t(rule)
"""


def q_blocking_frontier_part(sf_dir: str):
    """Blocking-rule cost/coverage frontier on parquet data, fully
    VALUE-EXACT: records = part names, labeled true pairs = parts
    sharing (p_brand, p_size) — both the label set and every frontier
    number are plain SQL (cand_pairs = Σ c(c−1)/2 over the rule-key
    histogram; covered = Σ c(c−1)/2 over (brand, size, key) groups).
    The engine side runs the REAL general-path operator
    (pipelines/eval.py::blocking_rule_frontier): label pairs generated
    distributedly per (brand, size) group, recall via two cogroup key
    attaches — nothing is special-cased for the oracle."""
    from ..functions.rayutil import bucketed_group_apply
    from .eval import blocking_rule_frontier

    parts = _pq(sf_dir, "part", ["p_partkey", "p_name", "p_brand",
                                 "p_size"])
    records = parts.map_batches(
        lambda t: pa.table({
            "rid": pc.cast(t.column("p_partkey"), pa.string()),
            "name": t.column("p_name")}),
        batch_format="pyarrow", zero_copy_batch=True)

    grouped = parts.map_batches(
        lambda t: pa.table({
            "grp": pc.binary_join_element_wise(
                t.column("p_brand"),
                pc.cast(t.column("p_size"), pa.string()), "|"),
            "rid": pc.cast(t.column("p_partkey"), pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True)

    def group_pairs(bucket: pa.Table) -> pa.Table:
        from ..functions.rayutil import segment_starts
        n = bucket.num_rows
        if n == 0:
            return pa.table({"id_a": pa.array([], type=pa.string()),
                             "id_b": pa.array([], type=pa.string()),
                             "same_entity": pa.array([], type=pa.bool_())})
        starts = np.asarray(segment_starts(bucket.column("grp")))
        lens = np.diff(np.append(starts, n))
        ia, ib = [], []
        for s0, ln in zip(starts, lens):
            if ln < 2:
                continue
            iu, ju = np.triu_indices(ln, k=1)
            ia.append(iu + s0)
            ib.append(ju + s0)
        if not ia:
            return pa.table({"id_a": pa.array([], type=pa.string()),
                             "id_b": pa.array([], type=pa.string()),
                             "same_entity": pa.array([], type=pa.bool_())})
        iu = np.concatenate(ia)
        ju = np.concatenate(ib)
        rid = bucket.column("rid")
        if isinstance(rid, pa.ChunkedArray):
            rid = rid.combine_chunks()
        return pa.table({"id_a": rid.take(pa.array(iu)),
                         "id_b": rid.take(pa.array(ju)),
                         "same_entity": pa.array(
                             np.ones(len(iu), dtype=bool))})

    labels = bucketed_group_apply(grouped, "grp", group_pairs,
                                  num_buckets=64,
                                  sort_cols=[("rid", "ascending")])

    def first_char(col):
        return pc.utf8_slice_codeunits(col, 0, 1)

    def prefix3(col):
        return pc.utf8_slice_codeunits(col, 0, 3)

    def first_token(col):
        return pc.list_element(pc.split_pattern(col, " "), 0)

    return blocking_rule_frontier(
        records, labels, id_col="rid", text_col="name",
        rules={"first_char": first_char, "prefix3": prefix3,
               "first_token": first_token})


def _sql_frontier_rule(name: str, key_expr: str) -> str:
    return f"""
SELECT '{name}' AS rule,
  (SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) FROM
     (SELECT COUNT(*) AS c FROM
        (SELECT {key_expr} AS key FROM part)
      WHERE key IS NOT NULL AND key <> '' GROUP BY key)) AS cand_pairs,
  (SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) FROM
     (SELECT COUNT(*) AS c FROM part GROUP BY p_brand, p_size))
    AS true_pairs,
  (SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) FROM
     (SELECT COUNT(*) AS c FROM
        (SELECT p_brand, p_size, {key_expr} AS key FROM part)
      WHERE key IS NOT NULL AND key <> ''
      GROUP BY p_brand, p_size, key)) AS covered
"""


SQL_BLOCKING_FRONTIER_PART = f"""
WITH raw AS (
  {_sql_frontier_rule('first_char', "substr(p_name, 1, 1)")}
  UNION ALL
  {_sql_frontier_rule('prefix3', "substr(p_name, 1, 3)")}
  UNION ALL
  {_sql_frontier_rule('first_token', "split_part(p_name, ' ', 1)")}
)
SELECT rule, cand_pairs, true_pairs, covered,
       CAST(covered * 1000000 // true_pairs AS BIGINT) AS recall_e6
FROM raw
"""


def q_pagerank_weighted_events(sf_dir: str):
    """Edge-weighted PageRank (stages/graph.py::pagerank_weighted) over
    the user → event_type graph with value-cents edge weights:
    contributions split by weight share, zero-out-weight nodes dangling.
    VALUE-EXACT vs the unrolled weighted chained-CTE twin at 1e-9
    quantization (the pagerank oracle idiom)."""
    from ..stages.graph import pagerank_weighted

    ev = _pq(sf_dir, "events", ["user_id", "event_type",
                                "value"]).map_batches(
        lambda t: pa.table({
            "src": pc.binary_join_element_wise(
                pa.array(["u"] * t.num_rows),
                pc.cast(t.column("user_id"), pa.string()), ""),
            "dst": pc.binary_join_element_wise(
                pa.array(["t"] * t.num_rows), t.column("event_type"), ""),
            "w": pc.cast(_cents(t.column("value")), pa.float64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    return pagerank_weighted(ev, iters=10).map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "rank_e9": pc.cast(pc.round(pc.multiply(
                t.column("rank"), pa.scalar(1e9))), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)


def _pagerank_weighted_sql(iters: int = 10, damping: float = 0.85) -> str:
    """Unrolled weighted-PageRank twin of pagerank_weighted (same update:
    contribution r·w/W_out, dangling = zero out-weight, rank init 1/N)."""
    d = repr(damping)
    parts = [f"""
WITH edges AS MATERIALIZED (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS src, 't' || event_type AS dst,
         CAST(CAST(ROUND(value * 100) AS BIGINT) AS DOUBLE) AS w
  FROM events),
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
wout AS MATERIALIZED (
  SELECT n.node, COALESCE(o.sw, 0.0) AS sw
  FROM nodes n LEFT JOIN (
    SELECT src AS node, SUM(w) AS sw FROM edges GROUP BY src) o
  USING (node)),
r0 AS MATERIALIZED (
  SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(f""",
b{k} AS MATERIALIZED (
  SELECT (1.0 - {d}) / (SELECT n FROM nn)
         + {d} * COALESCE((SELECT SUM(r.rank) FROM r{p} r
                           JOIN wout g USING (node) WHERE g.sw = 0), 0.0)
           / (SELECT n FROM nn) AS base),
c{k} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(r.rank * e.w / g.sw) AS c
  FROM edges e JOIN r{p} r ON r.node = e.src
  JOIN wout g ON g.node = e.src
  WHERE g.sw > 0
  GROUP BY e.dst),
r{k} AS MATERIALIZED (
  SELECT n.node, {d} * COALESCE(c.c, 0.0) + (SELECT base FROM b{k}) AS rank
  FROM nodes n LEFT JOIN c{k} c USING (node))""")
    parts.append(f"""
SELECT node, CAST(ROUND(rank * 1e9) AS BIGINT) AS rank_e9 FROM r{iters}""")
    return "".join(parts)


def q_grouped_means_events(sf_dir: str):
    """Grouped harmonic and geometric means of the event value per type
    (latency-style vs ratio-style averaging — the two non-arithmetic
    Pythagorean means). Harmonic is INTEGER-EXACT: each reciprocal is
    per-term floor-quantized at 1e12 (rq = 1e12 // cents, an exact
    integer, order-independent sum), hm_e6 = trunc(n·1e12·1e6 / Σrq).
    Geometric uses the quantized-log idiom: counts/Σln exact per term in
    f64, gm_e6 quantized after exp (1-ulp ln/exp divergence ≪ the 1e-6
    grid at these magnitudes). Rows with zero cents are excluded from
    both (the SQL WHERE)."""
    from ray.data.aggregate import Sum

    ev = _pq(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        v = np.asarray(_cents(t.column("value")), dtype=np.int64)
        keep = v > 0
        et = et.filter(pa.array(keep))
        v = v[keep]
        enc = pc.dictionary_encode(et)
        codes = np.asarray(enc.indices, dtype=np.int64)
        k = len(enc.dictionary)
        rq = 10**12 // v
        return pa.table({
            "event_type": enc.dictionary,
            "n": pa.array(np.bincount(codes, minlength=k)
                          .astype(np.int64)),
            "sr": pa.array(np.bincount(codes, weights=rq, minlength=k)
                           .astype(np.int64)),
            "sl": pa.array(np.bincount(codes, weights=np.log(v),
                                       minlength=k))})

    agg = (ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type").aggregate(Sum("n"), Sum("sr"),
                                            Sum("sl")))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("sum(n)").to_pylist()
        sr = t.column("sum(sr)").to_pylist()
        sl = np.asarray(t.column("sum(sl)"), dtype=np.float64)
        hm = [(m * 10**12 * 10**6) // s if s else None
              for m, s in zip(n, sr)]
        gm = np.floor(np.exp(sl / np.asarray(n, dtype=np.float64))
                      * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "event_type": t.column("event_type"),
            "n": pa.array(n, type=pa.int64()),
            "harmonic_e6": pa.array(hm, type=pa.int64()),
            "geometric_e6": pa.array(gm)})

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_GROUPED_MEANS_EVENTS = """
WITH t AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
           FROM events WHERE CAST(ROUND(value * 100) AS BIGINT) > 0),
a AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(1000000000000 // v) AS HUGEINT) AS sr,
             SUM(ln(CAST(v AS DOUBLE))) AS sl
      FROM t GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST((n * 1000000000000 * 1000000) // sr AS BIGINT)
           AS harmonic_e6,
       CAST(FLOOR(exp(sl / CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
           AS geometric_e6
FROM a
"""


def q_attribution_events(sf_dir: str):
    """First/last-touch attribution (stages/behavior.py::
    touch_attribution): for every purchase, the min/max click event_id in
    the trailing 24h window per user. One bucket exchange; window bounds
    via the range_join composite searchsorted, per-window MIN/MAX via one
    interleaved reduceat with a sentinel (overlapping windows, no per-row
    Python). Hash-exact vs the RANGE-frame window twin."""
    from ..stages.behavior import touch_attribution

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return touch_attribution(ev, key="user_id", ts="ts", tie="event_id",
                             type_col="event_type", touch_type="click",
                             convert_type="purchase",
                             window_us=24 * 3600 * 1_000_000)


SQL_ATTRIBUTION_EVENTS = """
WITH w AS (SELECT user_id, event_id, event_type, ts,
                  MIN(CASE WHEN event_type = 'click' THEN event_id END)
                      OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                                      AND CURRENT ROW) AS first_touch,
                  MAX(CASE WHEN event_type = 'click' THEN event_id END)
                      OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                                      AND CURRENT ROW) AS last_touch
           FROM events)
SELECT user_id, event_id AS convert_id, first_touch, last_touch
FROM w WHERE event_type = 'purchase'
"""


def q_autocorr_events(sf_dir: str):
    """Lag-1 autocorrelation of the event value over each user's ordered
    stream (pooled across users — consecutive (vᵢ, vᵢ₊₁) pairs never
    straddle a user): does activity value persist? Six INTEGER-EXACT
    sufficient statistics from one bucket exchange + shifted compares;
    the correlation is the one fixed-shape f64 expression numpy and
    DuckDB round identically (the grouped_corr idiom)."""
    from ray.data.aggregate import Sum

    from ..functions.rayutil import bucketed_group_apply, segment_starts

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    ints = ev.map_batches(
        lambda t: pa.table({"user_id": t.column("user_id"),
                            "ts": t.column("ts"),
                            "event_id": t.column("event_id"),
                            "v": _cents(t.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)

    def pairs(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n < 2:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in ("g", "n", "sx", "sy", "sxx",
                                       "syy", "sxy")})
        v = np.asarray(bucket.column("v"), dtype=np.int64)
        starts = np.asarray(segment_starts(bucket.column("user_id")))
        seg_id = np.repeat(np.arange(len(starts)),
                           np.diff(np.append(starts, n)))
        ok = seg_id[:-1] == seg_id[1:]
        x, y = v[:-1][ok], v[1:][ok]
        return pa.table({
            "g": pa.array([0], type=pa.int64()),
            "n": pa.array([len(x)], type=pa.int64()),
            "sx": pa.array([int(x.sum())], type=pa.int64()),
            "sy": pa.array([int(y.sum())], type=pa.int64()),
            "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
            "syy": pa.array([int((y * y).sum())], type=pa.int64()),
            "sxy": pa.array([int((x * y).sum())], type=pa.int64())})

    agg = (bucketed_group_apply(
        ints, "user_id", pairs, num_buckets=64,
        sort_cols=[("ts", "ascending"), ("event_id", "ascending")])
        .groupby("g").aggregate(Sum("n"), Sum("sx"), Sum("sy"),
                                Sum("sxx"), Sum("syy"), Sum("sxy")))

    def finish(t: pa.Table) -> pa.Table:
        g = {c: int(t.column(f"sum({c})")[0].as_py())
             for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        d = {c: np.float64(v) for c, v in g.items()}
        num = d["n"] * d["sxy"] - d["sx"] * d["sy"]
        den = np.sqrt(d["n"] * d["sxx"] - d["sx"] * d["sx"]) \
            * np.sqrt(d["n"] * d["syy"] - d["sy"] * d["sy"])
        return pa.table({
            "n": pa.array([g["n"]], type=pa.int64()),
            "sxy": pa.array([g["sxy"]], type=pa.int64()),
            "autocorr": pa.array([float(num / den) if den > 0 else None],
                                 type=pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_AUTOCORR_EVENTS = """
WITH s AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS x,
                  lead(CAST(ROUND(value * 100) AS BIGINT))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS y
           FROM events),
p AS (SELECT x, y FROM s WHERE y IS NOT NULL),
t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x*x) AS HUGEINT) AS sxx,
             CAST(SUM(y*y) AS HUGEINT) AS syy,
             CAST(SUM(x*y) AS HUGEINT) AS sxy
      FROM p)
SELECT CAST(n AS BIGINT) AS n, CAST(sxy AS BIGINT) AS sxy,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS autocorr
FROM t
"""


def q_top_paths_events(sf_dir: str):
    """Top-25 length-3 event-type paths (sequential trigrams per user in
    (ts, event_id) order) — the journey-mining extension of the Markov
    transition matrix. One bucket exchange; trigrams are two shifted
    compares inside each user segment (vectorized), counts via one
    skinny groupby, top-25 with (count desc, path asc) tie-breaks via
    global_topk (k rows per block, no global sort). Hash-exact vs the
    double-lead window twin."""
    from ray.data.aggregate import Count

    from ..functions.rayutil import (bucketed_group_apply, global_topk,
                                     segment_starts)

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def trigrams(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        et = bucket.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        if n < 3:
            return pa.table({"path": pa.array([], type=pa.string())})
        starts = np.asarray(segment_starts(bucket.column("user_id")))
        seg_id = np.repeat(np.arange(len(starts)),
                           np.diff(np.append(starts, n)))
        ok = np.zeros(n - 2, dtype=bool)
        ok = (seg_id[:-2] == seg_id[2:])
        idx = np.flatnonzero(ok)
        joined = pc.binary_join_element_wise(
            et.take(pa.array(idx)), et.take(pa.array(idx + 1)),
            et.take(pa.array(idx + 2)), ">")
        return pa.table({"path": joined})

    grams = bucketed_group_apply(
        ev, "user_id", trigrams, num_buckets=64,
        sort_cols=[("ts", "ascending"), ("event_id", "ascending")])
    counts = (grams.groupby("path").aggregate(Count())
              .map_batches(lambda t: t.rename_columns(["path", "n"]),
                           batch_format="pyarrow", zero_copy_batch=True))
    return global_topk(counts, [("n", "descending"),
                                ("path", "ascending")], 25)


SQL_TOP_PATHS_EVENTS = """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type, 1) OVER w AS e2,
                  lead(event_type, 2) OVER w AS e3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (SELECT event_type || '>' || e2 || '>' || e3 AS path
      FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY path
ORDER BY n DESC, path ASC
LIMIT 25
"""


def q_twa_events(sf_dir: str):
    """Time-weighted average event value per user (stages/temporal.py::
    time_weighted_avg — metering semantics: a value holds until the next
    observation). Integer-exact µ-cents via masked reduceat + a two-step
    exact division; users with zero span dropped (the SQL HAVING).
    Hash-exact vs the lead() window twin (values non-negative, so floor
    == DuckDB truncation)."""
    from ..stages.temporal import time_weighted_avg

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    ints = ev.map_batches(
        lambda t: pa.table({"user_id": t.column("user_id"),
                            "ts": t.column("ts"),
                            "event_id": t.column("event_id"),
                            "v": _cents(t.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return time_weighted_avg(ints, key="user_id", ts="ts", tie="event_id",
                             val="v")


SQL_TWA_EVENTS = """
WITH o AS (SELECT user_id, epoch_us(ts) AS t,
                  CAST(ROUND(value * 100) AS BIGINT) AS v,
                  lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS nxt
           FROM events)
SELECT user_id,
       CAST((CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                            ELSE v * (nxt - t) END) AS HUGEINT) * 1000000)
            // (MAX(t) - MIN(t)) AS BIGINT) AS twa_e6
FROM o GROUP BY user_id
HAVING MAX(t) > MIN(t)
"""


def q_hierarchy_flatten_part(sf_dir: str):
    """Hierarchy flattening by pointer jumping (stages/graph.py::
    pointer_jump_roots — Wyllie's path doubling, ⌈log₂ depth⌉ rounds vs
    the recursive CTE's depth sequential steps) over a deterministic
    synthetic forest on part: parent(k) = k−1−(k·2654435761 mod 2³¹) mod
    47 for k ≥ 50, roots below. Hash-exact vs DuckDB's WITH RECURSIVE
    twin — the oracle walks the chains row-at-a-time, the engine doubles;
    identical (node, root, depth) is the whole point."""
    from ..stages.graph import pointer_jump_roots

    part = _pq(sf_dir, "part", ["p_partkey"])

    def parent(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("p_partkey"), dtype=np.int64)
        par = np.where(k < 50, k,
                       k - 1 - (k * 2654435761 % 2**31) % 47)
        return pa.table({"node": pa.array(k), "parent": pa.array(par)})

    parents = part.map_batches(parent, batch_format="pyarrow",
                               zero_copy_batch=True)
    return pointer_jump_roots(parents)


SQL_HIERARCHY_FLATTEN_PART = """
WITH RECURSIVE p AS (
  SELECT p_partkey AS node,
         CASE WHEN p_partkey < 50 THEN p_partkey
              ELSE p_partkey - 1
                   - (p_partkey * 2654435761 % 2147483648) % 47
         END AS parent
  FROM part),
chain AS (
  SELECT node, parent AS cur,
         CASE WHEN node < 50 THEN 0 ELSE 1 END AS depth
  FROM p
  UNION ALL
  SELECT c.node, pp.parent, c.depth + 1
  FROM chain c JOIN p pp ON pp.node = c.cur
  WHERE c.cur >= 50)
SELECT node, cur AS root, CAST(depth AS BIGINT) AS depth
FROM chain WHERE cur < 50 OR node < 50
"""


def q_pca_embeddings(sf_dir: str):
    """Distributed PCA of the embeddings table (stages/similarity.py::
    pca_fit_transform): one d×d-covariance combiner pass + driver eigh +
    a broadcast projection map; signs fixed, output deterministic.
    Returns the per-id 8-component projection. Not SQL-expressible
    (eigendecomposition); planted-axis recovery + determinism pinned in
    tests/test_ops.py."""
    from ..stages.similarity import pca_fit_transform

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    _, out = pca_fit_transform(emb, n_components=8)
    return out


def q_blb_ci_events(sf_dir: str):
    """Bag of Little Bootstraps 95% CI for the mean event value in cents
    (stages/selection.py::blb_mean_ci — Kleiner et al. 2012): disjoint
    hash subsets, per-subset multinomial(n, 1/b) replicates with
    subset-seeded deterministic rngs, subset-averaged CI. Not
    SQL-expressible (multinomial resampling); bracketing + determinism
    pinned in tests/test_selection.py."""
    from ..stages.selection import blb_mean_ci

    ev = _pq(sf_dir, "events", ["event_id", "value"])
    ints = ev.map_batches(
        lambda t: pa.table({"id": t.column("event_id"),
                            "v": _cents(t.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    return blb_mean_ci(ints, val_col="v", id_col="id")


def q_one_to_one_part(sf_dir: str):
    """Uniqueness-constrained 1:1 linkage over the JW ≥ 0.93 part-name
    candidate pairs (stages/pairs.py::greedy_one_to_one): connected
    components of the pair graph are the matching scopes (components
    partition records, so the at-most-one guarantee holds globally),
    greedy by (jw_e6 desc, ids asc) within each.

    Oracle: the candidate-pair count is VALUE-EXACT (DuckDB's own
    jaro_winkler_similarity reproduces the pair set bit-identically —
    the jw_pairs_part twin), and the greedy matching is verified by its
    UNIQUE characterization, emitted as booleans the SQL asserts TRUE:
    (a) accepted pairs are vertex-disjoint, and (b) every candidate pair
    NOT accepted has an accepted neighbor pair strictly earlier in the
    greedy order (jw_e6 desc, id_a asc, id_b asc). Exactly one matching
    satisfies both — induction over candidates in greedy order — so the
    booleans pin the full output without SQL having to replay the
    sequential scan. Verification collects only the candidate pairs
    (bounded: blocked JW ≥ 0.93 survivors, not the corpus); matching
    semantics also pinned on hand graphs in tests/test_stages.py."""
    import ray as _ray

    from ..config import DEFAULT_CONFIG as CFG
    from ..functions.rayutil import get_broadcast
    from ..stages.clustering import connected_components_codes
    from ..stages.pairs import greedy_one_to_one
    from ..stages.strjoin import string_sim_self_join

    ds = _pq(sf_dir, "part", ["p_partkey", "p_name"])
    pairs = string_sim_self_join(ds, id_col="p_partkey", text_col="p_name",
                                 metric="jaro_winkler", threshold=0.93,
                                 score_col="jw").materialize()
    lab = connected_components_codes(pairs.map_batches(
        lambda t: pa.table({"id_a": t.column("id_a"),
                            "id_b": t.column("id_b")}),
        batch_format="pyarrow", zero_copy_batch=True), CFG)
    lab = lab.sort_by([("code", "ascending")])
    ref = _ray.put((np.asarray(lab.column("code"), dtype=np.int64),
                    np.asarray(lab.column("cluster_code"),
                               dtype=np.int64)))

    def prep(t: pa.Table) -> pa.Table:
        codes, roots = get_broadcast(ref)
        a = np.asarray(t.column("id_a"), dtype=np.int64)
        return pa.table({
            "blk": pa.array(roots[np.searchsorted(codes, a)]),
            "id_a": t.column("id_a"), "id_b": t.column("id_b"),
            "jw_e6": pc.cast(pc.round(pc.multiply(
                t.column("jw"), pa.scalar(1e6))), pa.int64())})

    scored = pairs.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True)
    matched = greedy_one_to_one(scored, block_col="blk",
                                score_col="jw_e6")
    from ..functions.rayutil import collect_table
    cand = collect_table(scored, pa.schema([
        ("blk", pa.int64()), ("id_a", pa.int64()), ("id_b", pa.int64()),
        ("jw_e6", pa.int64())]))
    mt = collect_table(matched, pa.schema([
        ("blk", pa.int64()), ("id_a", pa.int64()), ("id_b", pa.int64()),
        ("jw_e6", pa.int64())]))
    # (a) vertex-disjoint: every endpoint appears in at most one pair
    ends = np.concatenate([np.asarray(mt.column("id_a"), dtype=np.int64),
                           np.asarray(mt.column("id_b"), dtype=np.int64)])
    ids_unique = bool(len(np.unique(ends)) == len(ends))
    # (b) greedy dominance: order key per pair is (-jw, id_a, id_b);
    # endpoint -> its accepted pair's order key (lexicographic int rows)
    def keys(t):
        return np.stack([-np.asarray(t.column("jw_e6"), dtype=np.int64),
                         np.asarray(t.column("id_a"), dtype=np.int64),
                         np.asarray(t.column("id_b"), dtype=np.int64)],
                        axis=1)

    mkeys = keys(mt)
    order = np.argsort(ends, kind="stable")
    sends = ends[order]
    # accepted pair index per endpoint slot (pair i owns slots i and n+i)
    pair_of = np.concatenate([np.arange(mt.num_rows)] * 2)[order]
    ckeys = keys(cand)

    def lookup(col):
        pos = np.searchsorted(sends, col)
        hit = (pos < len(sends))
        pos = np.minimum(pos, max(len(sends) - 1, 0))
        hit &= (sends[pos] == col) if len(sends) else False
        return hit, pair_of[pos]

    def earlier(col):
        if mt.num_rows == 0:
            return np.zeros(len(col), dtype=bool)
        hit, pi = lookup(col)
        mk = mkeys[pi]
        lt = ((mk[:, 0] < ckeys[:, 0]) |
              ((mk[:, 0] == ckeys[:, 0]) & (mk[:, 1] < ckeys[:, 1])) |
              ((mk[:, 0] == ckeys[:, 0]) & (mk[:, 1] == ckeys[:, 1]) &
               (mk[:, 2] < ckeys[:, 2])))
        return hit & lt

    ca = np.asarray(cand.column("id_a"), dtype=np.int64)
    cb = np.asarray(cand.column("id_b"), dtype=np.int64)
    # accepted ⇔ both endpoints map to a pair whose key equals this row's
    def self_match(col):
        if mt.num_rows == 0:
            return np.zeros(len(col), dtype=bool)
        hit, pi = lookup(col)
        return hit & np.all(mkeys[pi] == ckeys, axis=1)

    accepted = self_match(ca) & self_match(cb)
    ok = accepted | earlier(ca) | earlier(cb)
    greedy_consistent = bool(ok.all()) and mt.num_rows == int(
        accepted.sum())
    return pa.table({
        "n_cand": pa.array([cand.num_rows], type=pa.int64()),
        "ids_unique": pa.array([ids_unique]),
        "greedy_consistent": pa.array([greedy_consistent])})


SQL_ONE_TO_ONE_PART = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_cand, TRUE AS ids_unique,
       TRUE AS greedy_consistent
FROM part a JOIN part b
  ON a.p_partkey < b.p_partkey
 AND substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.93
"""


def q_mutual_info_events(sf_dir: str):
    """Mutual information between event_type and hour-of-day — the
    information-theoretic association measure next to chi2_events'
    significance test. Counts exact via the same joint groupby; MI =
    Σ (o/n)·ln(o·n/(r·c)) over non-zero cells, quantized to 1e-9 after
    the sum (the entropy-oracle idiom — ≤ type×hour cells, f64 error
    ~1e-15 against the grid). One row (n, mi_e9)."""
    from ray.data.aggregate import Count

    from ..functions.rayutil import collect_table

    ev = _pq(sf_dir, "events", ["event_type", "ts"])

    def qi(t: pa.Table) -> pa.Table:
        return pa.table({
            "et": t.column("event_type"),
            "hour": pc.cast(pc.hour(t.column("ts")), pa.int64())})

    agg = (ev.map_batches(qi, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(["et", "hour"]).aggregate(Count()))
    tab = collect_table(agg, pa.schema(
        [("et", pa.string()), ("hour", pa.int64()),
         ("count()", pa.int64())]))
    ets = tab.column("et").to_pylist()
    hrs = tab.column("hour").to_pylist()
    os_ = tab.column("count()").to_pylist()
    n = sum(os_)
    row_tot: dict = {}
    col_tot: dict = {}
    for e, h, o in zip(ets, hrs, os_):
        row_tot[e] = row_tot.get(e, 0) + o
        col_tot[h] = col_tot.get(h, 0) + o
    mi = sum((o / n) * np.log(o * n / (row_tot[e] * col_tot[h]))
             for e, h, o in sorted(zip(ets, hrs, os_)))
    return pa.table({
        "n": pa.array([n], type=pa.int64()),
        "mi_e9": pa.array([int(np.floor(mi * 1e9 + 0.5))],
                          type=pa.int64())})


SQL_MUTUAL_INFO_EVENTS = """
WITH j AS (SELECT event_type AS et,
                  CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
                  CAST(COUNT(*) AS BIGINT) AS o
           FROM events GROUP BY 1, 2),
r AS (SELECT et, CAST(SUM(o) AS BIGINT) AS rt FROM j GROUP BY et),
c AS (SELECT hour, CAST(SUM(o) AS BIGINT) AS ct FROM j GROUP BY hour),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM j)
SELECT n.n,
       CAST(FLOOR(SUM((CAST(j.o AS DOUBLE) / n.n)
                      * ln(CAST(j.o AS DOUBLE) * n.n
                           / (CAST(r.rt AS DOUBLE) * c.ct)))
                  * 1e9 + 0.5) AS BIGINT) AS mi_e9
FROM j JOIN r USING (et) JOIN c USING (hour) CROSS JOIN n
GROUP BY n.n
"""


def q_ks_drift_documents(sf_dir: str):
    """Exact two-sample Kolmogorov–Smirnov statistic between the n_chars
    distributions of two document sources — the continuous-column drift
    gate (PSI's complement: no binning choice). INTEGER-EXACT: with
    per-side distinct-value counts, D = max over values of
    |cumA·nB − cumB·nA| / (nA·nB) is an exact rational; one distinct-
    value groupby, driver folds the distinct-value table (the roc_auc
    contract). Hash-exact vs the HUGEINT window twin."""
    from ray.data.aggregate import Sum

    from ..functions.rayutil import collect_table

    docs = _pq(sf_dir, "documents", ["n_chars", "source"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("source"),
                        value_set=pa.array(["src0", "src1"]))
        f = t.filter(keep)
        v = np.asarray(f.column("n_chars"), dtype=np.int64)
        a = np.asarray(pc.equal(f.column("source"), "src0"))
        vals, inv = np.unique(v, return_inverse=True)
        return pa.table({
            "v": pa.array(vals),
            "ca": pa.array(np.bincount(inv, weights=a,
                                       minlength=len(vals))
                           .astype(np.int64)),
            "cb": pa.array(np.bincount(inv, weights=~a,
                                       minlength=len(vals))
                           .astype(np.int64))})

    agg = (docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("v").aggregate(Sum("ca"), Sum("cb")))
    tab = collect_table(agg, pa.schema(
        [("v", pa.int64()), ("sum(ca)", pa.int64()),
         ("sum(cb)", pa.int64())])).sort_by([("v", "ascending")])
    ca = tab.column("sum(ca)").to_pylist()
    cb = tab.column("sum(cb)").to_pylist()
    na, nb = sum(ca), sum(cb)
    best = 0
    cum_a = cum_b = 0
    for x, y in zip(ca, cb):  # distinct-value-sized driver fold
        cum_a += x
        cum_b += y
        best = max(best, abs(cum_a * nb - cum_b * na))
    ks_e9 = (best * 10**9) // (na * nb) if na and nb else None
    return pa.table({
        "n_a": pa.array([na], type=pa.int64()),
        "n_b": pa.array([nb], type=pa.int64()),
        "ks_e9": pa.array([ks_e9], type=pa.int64())})


SQL_KS_DRIFT_DOCUMENTS = """
WITH t AS (SELECT n_chars AS v, (source = 'src0') AS a
           FROM documents WHERE source IN ('src0', 'src1')),
c AS (SELECT v,
             CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS ca,
             CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS HUGEINT) AS cb
      FROM t GROUP BY v),
w AS (SELECT v,
             SUM(ca) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cuma,
             SUM(cb) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cumb
      FROM c),
n AS (SELECT CAST(SUM(ca) AS HUGEINT) AS na,
             CAST(SUM(cb) AS HUGEINT) AS nb FROM c)
SELECT CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
       CAST((MAX(ABS(w.cuma * n.nb - w.cumb * n.na)) * 1000000000)
            // (n.na * n.nb) AS BIGINT) AS ks_e9
FROM w CROSS JOIN n
GROUP BY n.na, n.nb
"""


def q_ctfidf_labels(sf_dir: str):
    """BERTopic-style c-TF-IDF cluster labeling (stages/retrieval.py::
    ctfidf_topk): top-5 most distinctive terms per embedding-cluster
    label — score = cnt(term, cluster) · ln(K/df_cluster(term)), per-term
    e9-quantized, deterministic (score desc, term asc) tie-breaks. One
    cogroup label attach + two groupbys + a vocab-sized broadcast;
    hash-exact vs the ROW_NUMBER twin."""
    from ..stages.retrieval import ctfidf_topk

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    labels = _pq(sf_dir, "embeddings", ["vec_id", "label"])
    return ctfidf_topk(docs, labels, id_col="doc_id", text_col="text",
                       label_id_col="vec_id", label_col="label", k=5)


SQL_CTFIDF_LABELS = """
WITH lab AS (SELECT vec_id AS doc_id, CAST(label AS BIGINT) AS label
             FROM embeddings),
tok AS (SELECT l.label,
               unnest(regexp_extract_all(lower(d.text), '[a-z]{4,}'))
                   AS term
        FROM documents d JOIN lab l USING (doc_id)),
c AS (SELECT label, term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok GROUP BY label, term),
kk AS (SELECT CAST(COUNT(DISTINCT label) AS DOUBLE) AS k FROM c),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM c GROUP BY term),
s AS (SELECT c.label, c.term, c.cnt,
             c.cnt * CAST(FLOOR(ln(kk.k / df.df) * 1e9 + 0.5) AS BIGINT)
                 AS score_e9
      FROM c JOIN df USING (term) CROSS JOIN kk),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                   ORDER BY score_e9 DESC, term ASC)
          AS rn
      FROM s)
SELECT label, term, cnt, score_e9 FROM r WHERE rn <= 5
"""


def q_fs_explain_transcripts(sf_dir: str):
    """Match-weight waterfall for every candidate pair (pipelines/eval.py
    ::fs_explain_pairs — the Splink-style per-pair explanation): prior
    log2 odds + per-feature log2 Bayes factors at the pair's agreement
    levels, e6-quantized on the driver grid so total_e6 is exactly the
    sum of its parts.

    Identity oracle (the EM fixpoint itself is not SQL-expressible, but
    the waterfall CONTRACT is): the wrapper verifies, over every emitted
    pair, that (a) total_e6 == prior_e6 + Σ per-feature weight_e6 — the
    additive-explanation property quantization must not break, (b)
    posterior_e6 == round(σ(ln2·total_e6/1e6)·1e6) recomputed, and (c)
    every agreement level lies in [0, n_cuts]; it emits one row of
    booleans plus has_pairs, and the SQL asserts all TRUE (has_pairs
    doubles as 'the corpus yields candidate pairs at threshold 0').
    Checks run as per-batch folds (aggregate Min), never a driver
    collect. Full per-pair values pinned in tests/test_eval.py."""
    import dataclasses

    from ray.data.aggregate import Min, Sum

    from .eval import fs_explain_pairs
    from .linkage import run_linkage

    ungated = dataclasses.replace(CFG, threshold=0.0)
    out = run_linkage(transcripts_from_events(sf_dir), ungated)
    ex = fs_explain_pairs(out["edges"])
    feature_cols = ("sim_jaccard", "sim_jw", "sim_emb")

    def fold(t: pa.Table) -> pa.Table:
        tot = np.asarray(t.column("total_e6"), dtype=np.int64)
        parts = np.asarray(t.column("prior_e6"), dtype=np.int64).copy()
        lvl_ok = True
        for c in feature_cols:
            parts += np.asarray(t.column(f"{c}_weight_e6"),
                                dtype=np.int64)
            lv = np.asarray(t.column(f"{c}_level"), dtype=np.int64)
            lvl_ok &= bool(((lv >= 0) & (lv <= 4)).all())
        post = 1.0 / (1.0 + np.exp(-np.log(2.0) * tot / 1e6))
        post_e6 = np.floor(post * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "sum_ok": pa.array([int((tot == parts).all())]),
            "post_ok": pa.array([int((post_e6 == np.asarray(
                t.column("posterior_e6"), dtype=np.int64)).all())]),
            "lvl_ok": pa.array([int(lvl_ok)]),
            "n": pa.array([t.num_rows], type=pa.int64())})

    agg = (ex.map_batches(fold, batch_format="pyarrow",
                          zero_copy_batch=True)
           .aggregate(Min("sum_ok"), Min("post_ok"), Min("lvl_ok"),
                      Sum("n")))
    return pa.table({
        "waterfall_sum_ok": pa.array([bool(agg["min(sum_ok)"])]),
        "posterior_ok": pa.array([bool(agg["min(post_ok)"])]),
        "levels_in_range": pa.array([bool(agg["min(lvl_ok)"])]),
        "has_pairs": pa.array([bool(agg["sum(n)"] or 0)])})


SQL_FS_EXPLAIN_TRANSCRIPTS = """
SELECT TRUE AS waterfall_sum_ok, TRUE AS posterior_ok,
       TRUE AS levels_in_range, TRUE AS has_pairs
"""


def q_bridge_edges_events(sf_dir: str):
    """Cut edges of each user-interaction component (stages/clustering.py
    ::bridge_edges — Tarjan low-link per cluster inside one bucket
    exchange): the cluster-REPAIR primitive — a component held together
    by one edge is a split candidate for clerical review. Components via
    the int-coded CC fast path, cluster attach by broadcast. Not
    SQL-expressible (connectivity); bridge semantics pinned on hand
    graphs in tests/test_behavior.py."""
    import ray as _ray

    from ..config import DEFAULT_CONFIG as CFG
    from ..functions.rayutil import get_broadcast
    from ..stages.behavior import consecutive_pairs
    from ..stages.clustering import bridge_edges, connected_components_codes

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    edges = consecutive_pairs(ev, key="event_type", ts="ts",
                              tie="event_id", val="user_id")
    edges = edges.map_batches(
        lambda t: pa.table({
            "id_a": pc.min_element_wise(t.column("src"), t.column("dst")),
            "id_b": pc.max_element_wise(t.column("src"), t.column("dst"))}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    edges = edges.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("id_a"),
                                        t.column("id_b"))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    lab = connected_components_codes(edges, CFG)
    lab = lab.sort_by([("code", "ascending")])
    ref = _ray.put((np.asarray(lab.column("code"), dtype=np.int64),
                    np.asarray(lab.column("cluster_code"),
                               dtype=np.int64)))

    def attach(t: pa.Table) -> pa.Table:
        codes, roots = get_broadcast(ref)
        a = np.asarray(t.column("id_a"), dtype=np.int64)
        return pa.table({
            "cluster_id": pa.array(roots[np.searchsorted(codes, a)]),
            "id_a": t.column("id_a"), "id_b": t.column("id_b")})

    with_cluster = edges.map_batches(attach, batch_format="pyarrow",
                                     zero_copy_batch=True)
    # dedup multi-edges so a repeated pair is not its own cycle
    dedup = with_cluster.groupby(
        ["cluster_id", "id_a", "id_b"]).count().map_batches(
        lambda t: t.select(["cluster_id", "id_a", "id_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return bridge_edges(dedup)


def q_spearman_lineitem(sf_dir: str):
    """Spearman rank correlation of quantity vs extendedprice (dollars)
    with exact average-rank ties (stages/selection.py::spearman): two
    distinct-value groupbys feed broadcast rank maps at 2× integer scale,
    one combiner pass sums integer co-moments, and only the final rho is
    float — one fixed-shape f64 expression over six integer sums (the
    grouped_corr idiom), hash-exact vs the window twin."""
    from ..stages.selection import spearman

    ds = _pq(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    ints = ds.map_batches(
        lambda t: pa.table({
            "x": pc.cast(pc.divide(_cents(t.column("l_quantity")),
                                   pa.scalar(100)), pa.int64()),
            "y": pc.cast(pc.divide(_cents(t.column("l_extendedprice")),
                                   pa.scalar(100)), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    return spearman(ints, x_col="x", y_col="y")


SQL_SPEARMAN_LINEITEM = """
WITH b AS (SELECT CAST(ROUND(l_quantity*100) AS BIGINT) // 100 AS x,
                  CAST(ROUND(l_extendedprice*100) AS BIGINT) // 100 AS y
           FROM lineitem),
xr AS (SELECT v, 2 * pos + c + 1 AS r2 FROM (
  SELECT x AS v, CAST(COUNT(*) AS HUGEINT) AS c,
         COALESCE(SUM(COUNT(*)) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos
  FROM b GROUP BY x)),
yr AS (SELECT v, 2 * pos + c + 1 AS r2 FROM (
  SELECT y AS v, CAST(COUNT(*) AS HUGEINT) AS c,
         COALESCE(SUM(COUNT(*)) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos
  FROM b GROUP BY y)),
r AS (SELECT xr.r2 AS rx, yr.r2 AS ry
      FROM b JOIN xr ON xr.v = b.x JOIN yr ON yr.v = b.y),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(rx) AS HUGEINT) AS sx,
             CAST(SUM(ry) AS HUGEINT) AS sy,
             CAST(SUM(rx*rx) AS HUGEINT) AS sxx,
             CAST(SUM(ry*ry) AS HUGEINT) AS syy,
             CAST(SUM(rx*ry) AS HUGEINT) AS sxy
      FROM r)
SELECT CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sx,
       CAST(sxx AS BIGINT) AS sxx, CAST(syy AS BIGINT) AS syy,
       CAST(sxy AS BIGINT) AS sxy,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS spearman
FROM s
"""


def q_chi2_events(sf_dir: str):
    """Pearson chi-squared test of independence between event_type and
    hour-of-day — the categorical-association audit (is activity mix
    time-of-day dependent?). INTEGER-EXACT: with O the observed cell
    count, r/c the marginals and N the total, the cell statistic
    (O·N − r·c)²/(N·r·c) is an exact rational; each cell is floor-
    quantized to e9 (all terms non-negative, so Python floor == DuckDB
    truncation) and the sum of per-cell integers is order-independent —
    hash-exact vs the HUGEINT twin. One joint groupby; marginals fold on
    the driver over the vocab-sized (type × hour) table."""
    from ray.data.aggregate import Count

    from ..functions.rayutil import collect_table

    ev = _pq(sf_dir, "events", ["event_type", "ts"])

    def qi(t: pa.Table) -> pa.Table:
        return pa.table({
            "et": t.column("event_type"),
            "hour": pc.cast(pc.hour(t.column("ts")), pa.int64())})

    agg = (ev.map_batches(qi, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(["et", "hour"]).aggregate(Count()))
    tab = collect_table(agg, pa.schema(
        [("et", pa.string()), ("hour", pa.int64()),
         ("count()", pa.int64())]))
    ets = tab.column("et").to_pylist()
    hrs = tab.column("hour").to_pylist()
    os_ = tab.column("count()").to_pylist()
    n = sum(os_)
    row_tot: dict = {}
    col_tot: dict = {}
    for e, h, o in zip(ets, hrs, os_):
        row_tot[e] = row_tot.get(e, 0) + o
        col_tot[h] = col_tot.get(h, 0) + o
    # zero cells still contribute (0·N − r·c)²/(N·r·c) = r·c/N — the
    # full cross product is walked, absent cells defaulting to O=0
    chi2 = 0
    seen = {(e, h): o for e, h, o in zip(ets, hrs, os_)}
    for e, r in row_tot.items():
        for h, c in col_tot.items():
            o = seen.get((e, h), 0)
            num = (o * n - r * c) ** 2 * 10**9
            chi2 += num // (n * r * c)
    dof = (len(row_tot) - 1) * (len(col_tot) - 1)
    return pa.table({
        "n": pa.array([n], type=pa.int64()),
        "dof": pa.array([dof], type=pa.int64()),
        "chi2_e9": pa.array([chi2], type=pa.int64())})


SQL_CHI2_EVENTS = """
WITH j AS (SELECT event_type AS et,
                  CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
                  CAST(COUNT(*) AS HUGEINT) AS o
           FROM events GROUP BY 1, 2),
r AS (SELECT et, CAST(SUM(o) AS HUGEINT) AS rt FROM j GROUP BY et),
c AS (SELECT hour, CAST(SUM(o) AS HUGEINT) AS ct FROM j GROUP BY hour),
n AS (SELECT CAST(SUM(o) AS HUGEINT) AS n FROM j),
cells AS (SELECT r.et, c.hour, r.rt, c.ct, COALESCE(j.o, 0) AS o
          FROM r CROSS JOIN c
          LEFT JOIN j ON j.et = r.et AND j.hour = c.hour)
SELECT CAST(n.n AS BIGINT) AS n,
       CAST(((SELECT COUNT(*) FROM r) - 1)
            * ((SELECT COUNT(*) FROM c) - 1) AS BIGINT) AS dof,
       CAST(SUM(((cells.o * n.n - cells.rt * cells.ct)
                 * (cells.o * n.n - cells.rt * cells.ct)
                 * 1000000000) // (n.n * cells.rt * cells.ct))
            AS BIGINT) AS chi2_e9
FROM cells CROSS JOIN n
GROUP BY n.n
"""


def q_benford_events(sf_dir: str):
    """Benford first-significant-digit audit of the event value — the
    fabricated-numbers / data-quality screen: observed digit counts vs
    Benford's log10(1+1/d) expectation, chi-squared over the 9 digits.
    Digit extraction is integer (repeated //10 via log-free numpy);
    counts exact; the statistic's transcendental expectation makes the
    final chi2 a float, quantized to 1e-9 after the 9-term sum (the
    entropy-oracle idiom). Returns per-digit rows + the statistic as
    columns repeated per row would break hashing — so ONE row with the
    digit counts pivoted wide (d1..d9) plus chi2_e9."""
    from ray.data.aggregate import Sum

    ev = _pq(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(_cents(t.column("value")), dtype=np.int64)
        v = v[v > 0]
        # first significant digit: strip trailing magnitude by integer
        # division until < 10 (max 19 digits -> bounded loop on the BATCH,
        # vectorized per step, not per row)
        while (v >= 10).any():
            v = np.where(v >= 10, v // 10, v)
        cnt = np.bincount(v, minlength=10)[1:10]
        return pa.table({
            "g": pa.array([0], type=pa.int64()),
            **{f"d{i}": pa.array([int(cnt[i - 1])], type=pa.int64())
               for i in range(1, 10)}})

    agg = (ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("g").aggregate(*[Sum(f"d{i}") for i in range(1, 10)]))

    def finish(t: pa.Table) -> pa.Table:
        cnt = np.array([t.column(f"sum(d{i})")[0].as_py()
                        for i in range(1, 10)], dtype=np.int64)
        n = int(cnt.sum())
        exp = n * np.log10(1.0 + 1.0 / np.arange(1, 10))
        chi2 = float(((cnt - exp) ** 2 / exp).sum()) if n else 0.0
        return pa.table({
            **{f"d{i}": pa.array([int(cnt[i - 1])], type=pa.int64())
               for i in range(1, 10)},
            "n": pa.array([n], type=pa.int64()),
            "chi2_e9": pa.array([int(np.floor(chi2 * 1e9 + 0.5))],
                                type=pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_BENFORD_EVENTS = """
WITH t AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
           WHERE CAST(ROUND(value * 100) AS BIGINT) > 0),
d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM t),
c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY digit),
w AS (SELECT
        COALESCE(MAX(CASE WHEN digit = 1 THEN cnt END), 0) AS d1,
        COALESCE(MAX(CASE WHEN digit = 2 THEN cnt END), 0) AS d2,
        COALESCE(MAX(CASE WHEN digit = 3 THEN cnt END), 0) AS d3,
        COALESCE(MAX(CASE WHEN digit = 4 THEN cnt END), 0) AS d4,
        COALESCE(MAX(CASE WHEN digit = 5 THEN cnt END), 0) AS d5,
        COALESCE(MAX(CASE WHEN digit = 6 THEN cnt END), 0) AS d6,
        COALESCE(MAX(CASE WHEN digit = 7 THEN cnt END), 0) AS d7,
        COALESCE(MAX(CASE WHEN digit = 8 THEN cnt END), 0) AS d8,
        COALESCE(MAX(CASE WHEN digit = 9 THEN cnt END), 0) AS d9,
        CAST(SUM(cnt) AS BIGINT) AS n
      FROM c)
SELECT d1, d2, d3, d4, d5, d6, d7, d8, d9, n,
       CAST(FLOOR((
         POWER(d1 - n*LOG10(2.0/1.0), 2) / (n*LOG10(2.0/1.0)) +
         POWER(d2 - n*LOG10(3.0/2.0), 2) / (n*LOG10(3.0/2.0)) +
         POWER(d3 - n*LOG10(4.0/3.0), 2) / (n*LOG10(4.0/3.0)) +
         POWER(d4 - n*LOG10(5.0/4.0), 2) / (n*LOG10(5.0/4.0)) +
         POWER(d5 - n*LOG10(6.0/5.0), 2) / (n*LOG10(6.0/5.0)) +
         POWER(d6 - n*LOG10(7.0/6.0), 2) / (n*LOG10(7.0/6.0)) +
         POWER(d7 - n*LOG10(8.0/7.0), 2) / (n*LOG10(8.0/7.0)) +
         POWER(d8 - n*LOG10(9.0/8.0), 2) / (n*LOG10(9.0/8.0)) +
         POWER(d9 - n*LOG10(10.0/9.0), 2) / (n*LOG10(10.0/9.0))
       ) * 1e9 + 0.5) AS BIGINT) AS chi2_e9
FROM w
"""


def q_scd2_events(sf_dir: str):
    """SCD Type-2 validity intervals of each user's event_type change log
    (stages/temporal.py::scd2_intervals): one bucket exchange, shifted-
    compare change detection, next-change interval closing (NULL-open
    current row). Hash-exact vs the lag-filter + lead window twin."""
    from ..stages.temporal import scd2_intervals

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return scd2_intervals(ev, key="user_id", ts="ts", tie="event_id",
                          val="event_type")


SQL_SCD2_EVENTS = """
WITH r AS (SELECT user_id, event_type, ts, event_id,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS pv
           FROM events),
c AS (SELECT user_id, event_type, ts, event_id FROM r
      WHERE pv IS NULL OR event_type != pv)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
FROM c
"""


def q_longest_streak_events(sf_dir: str):
    """Longest run of consecutive active DAYS per user — gaps-and-islands
    (stages/temporal.py::longest_streak): one bucket exchange, numpy
    distinct-day dedup + island breaks + maximum.reduceat per key.
    Hash-exact vs the day − row_number() island twin."""
    from ..stages.temporal import longest_streak

    ev = _pq(sf_dir, "events", ["user_id", "ts"])
    return longest_streak(ev, key="user_id", ts="ts")


SQL_LONGEST_STREAK_EVENTS = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
           FROM events),
r AS (SELECT user_id, day,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d),
runs AS (SELECT user_id, day - rn AS grp, CAST(COUNT(*) AS BIGINT) AS len
         FROM r GROUP BY user_id, day - rn)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
       CAST(SUM(len) AS BIGINT) AS active_periods
FROM runs GROUP BY user_id
"""


def q_cumulative_distinct_events(sf_dir: str):
    """Running distinct-event-type count per user in (ts, event_id) order
    (stages/temporal.py::cumulative_distinct) — the novelty/vocabulary-
    growth curve. One bucket exchange, vectorized first-occurrence flag +
    per-segment-rebased cumsum; hash-exact vs the ROW_NUMBER + running-sum
    window twin."""
    from ..stages.temporal import cumulative_distinct

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    out = cumulative_distinct(ev, key="user_id",
                              order_cols=["ts", "event_id"],
                              val="event_type")
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "distinct_so_far"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_CUMULATIVE_DISTINCT_EVENTS = """
WITH r AS (SELECT event_id, ts, user_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
           FROM events)
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS distinct_so_far
FROM r
"""


def q_psi_drift_documents(sf_dir: str):
    """Population stability index between the lang distributions of two
    document sources ('src0' vs 'src1'): the standard distribution-drift
    gate a refreshed training corpus runs before replacing the old one.
    Counts exact (one groupby); Laplace +1 smoothing over the category
    union (no zero-cell infinities, deterministic); PSI quantized to 1e-9
    units after the sum — the entropy-oracle idiom (category cardinality
    is tiny, so f64 error ~1e-15 against the 1e-9 grid)."""
    from ray.data.aggregate import Sum

    docs = _pq(sf_dir, "documents", ["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("source"),
                        value_set=pa.array(["src0", "src1"]))
        f = t.filter(keep)
        return pa.table({
            "lang": f.column("lang"),
            "a": pc.cast(pc.equal(f.column("source"), "src0"), pa.int64()),
            "b": pc.cast(pc.equal(f.column("source"), "src1"), pa.int64())})

    counts = (docs.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
              .groupby("lang").aggregate(Sum("a"), Sum("b")))

    def finish(t: pa.Table) -> pa.Table:
        ca = np.asarray(t.column("sum(a)"), dtype=np.int64) + 1
        cb = np.asarray(t.column("sum(b)"), dtype=np.int64) + 1
        na, nb = int(ca.sum()), int(cb.sum())
        p = ca.astype(np.float64) / na
        q = cb.astype(np.float64) / nb
        psi = float(((p - q) * np.log(p / q)).sum())
        return pa.table({
            "n_src0": pa.array([na - len(ca)], type=pa.int64()),
            "n_src1": pa.array([nb - len(cb)], type=pa.int64()),
            "k": pa.array([len(ca)], type=pa.int64()),
            "psi_e9": pa.array([int(np.floor(psi * 1e9 + 0.5))],
                               type=pa.int64())})

    # category-sized single-block finish (lang domain is a tiny vocab)
    return counts.repartition(1).map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True)


SQL_PSI_DRIFT_DOCUMENTS = """
WITH c AS (SELECT lang,
                  CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                       AS BIGINT) + 1 AS ca,
                  CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
                       AS BIGINT) + 1 AS cb
           FROM documents WHERE source IN ('src0', 'src1')
           GROUP BY lang),
n AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
             CAST(COUNT(*) AS BIGINT) AS k FROM c)
SELECT n.na - n.k AS n_src0, n.nb - n.k AS n_src1, n.k AS k,
       CAST(FLOOR(SUM((CAST(c.ca AS DOUBLE)/n.na
                       - CAST(c.cb AS DOUBLE)/n.nb)
                      * ln((CAST(c.ca AS DOUBLE)/n.na)
                           / (CAST(c.cb AS DOUBLE)/n.nb)))
                  * 1e9 + 0.5) AS BIGINT) AS psi_e9
FROM c CROSS JOIN n
GROUP BY n.na, n.nb, n.k
"""


def q_gini_events(sf_dir: str):
    """Exact Gini concentration coefficient of the event value (cents)
    — the inequality/hot-key diagnostic: how concentrated is activity
    mass? INTEGER-EXACT from the distinct-value count table (the roc_auc
    contract): with values sorted ascending and S1 = Σ rank·x over the
    1-indexed sorted multiset (tie runs fold in closed form:
    v·(c·s + c(c+1)/2)), G = (2·S1 − (n+1)·T) / (n·T). gini_e9 by
    truncation, arbitrary-precision driver fold, hash-exact vs the
    HUGEINT window twin."""
    from ray.data.aggregate import Sum

    from ..functions.rayutil import collect_table

    ev = _pq(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(_cents(t.column("value")), dtype=np.int64)
        vals, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vals),
                         "c": pa.array(cnt.astype(np.int64))})

    agg = (ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("v").aggregate(Sum("c")))
    tab = collect_table(agg, pa.schema(
        [("v", pa.int64()), ("sum(c)", pa.int64())])).sort_by(
        [("v", "ascending")])
    vs = tab.column("v").to_pylist()
    cs = tab.column("sum(c)").to_pylist()
    s1 = 0
    t_sum = 0
    pos = 0  # cumulative count before this run
    for v, c in zip(vs, cs):  # distinct-value-sized driver fold
        s1 += v * (c * pos + c * (c + 1) // 2)
        t_sum += v * c
        pos += c
    n = pos
    num = 2 * s1 - (n + 1) * t_sum
    den = n * t_sum
    gini_e9 = (num * 10**9) // den if den else None
    return pa.table({
        "n": pa.array([n], type=pa.int64()),
        "total_cents": pa.array([t_sum], type=pa.int64()),
        "gini_e9": pa.array([gini_e9], type=pa.int64())})


SQL_GINI_EVENTS = """
WITH t AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v FROM events),
c AS (SELECT v, CAST(COUNT(*) AS HUGEINT) AS c FROM t GROUP BY v),
w AS (SELECT v, c,
             COALESCE(SUM(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS pos
      FROM c),
s AS (SELECT CAST(SUM(v * (c * pos + c * (c + 1) // 2)) AS HUGEINT) AS s1,
             CAST(SUM(v * c) AS HUGEINT) AS t_sum,
             CAST(SUM(c) AS HUGEINT) AS n
      FROM w)
SELECT CAST(n AS BIGINT) AS n, CAST(t_sum AS BIGINT) AS total_cents,
       CAST(((2 * s1 - (n + 1) * t_sum) * 1000000000) // (n * t_sum)
            AS BIGINT) AS gini_e9
FROM s
"""


def q_isotonic_events(sf_dir: str):
    """Isotonic probability calibration (PAV — pipelines/eval.py::
    isotonic_fit) of the event value as a 'purchase' score: one combiner
    pass + one distinct-score groupby, integer-exact pooling on the
    driver's distinct-score table.

    VALUE-EXACT oracle on the fit's sufficient statistics — the emitted
    (score, n, sum_y) per distinct score are exactly what SQL computes —
    plus three engine-verified invariants of the PAV solution emitted as
    boolean columns the SQL asserts TRUE: the fit is monotone
    non-decreasing in score, every fitted value lies in [0, 1e9], and
    total probability mass is preserved up to per-block floor error
    (Σ n·fitted_e9 ∈ (1e9·Σ sum_y − Σ n, 1e9·Σ sum_y] — PAV pools
    preserve Σ labels exactly; only the e9 floor loses < 1 per pooled
    row). The fitted values themselves are pinned in tests/test_eval.py
    against a Fraction-exact naive PAV (iterative pooling is not
    SQL-expressible, but its contract is)."""
    from .eval import isotonic_fit

    ev = _pq(sf_dir, "events", ["event_type", "value"])
    scored = ev.map_batches(
        lambda t: pa.table({
            "score": _cents(t.column("value")),
            "lab": pc.equal(t.column("event_type"), "purchase")}),
        batch_format="pyarrow", zero_copy_batch=True)
    fit = isotonic_fit(scored, score_col="score", label_col="lab")
    f = np.asarray(fit.column("fitted_e9"), dtype=np.int64)
    n = np.asarray(fit.column("n"), dtype=np.int64)
    sy = np.asarray(fit.column("sum_y"), dtype=np.int64)
    monotone = bool(np.all(np.diff(f) >= 0))
    in_range = bool(np.all((f >= 0) & (f <= 10**9)))
    mass = int((n * f).sum())
    target = 10**9 * int(sy.sum())
    mass_ok = target - int(n.sum()) < mass <= target
    k = fit.num_rows
    return pa.table({
        "score": fit.column("score"), "n": fit.column("n"),
        "sum_y": fit.column("sum_y"),
        "fitted_monotone": pa.array([monotone] * k),
        "fitted_in_range": pa.array([in_range] * k),
        "mass_preserved": pa.array([mass_ok] * k)})


SQL_ISOTONIC_EVENTS = """
SELECT CAST(ROUND(value * 100) AS BIGINT) AS score,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS sum_y,
       TRUE AS fitted_monotone, TRUE AS fitted_in_range,
       TRUE AS mass_preserved
FROM events GROUP BY 1
"""


def q_match_merge_documents(sf_dir: str):
    """Iterative match-merge ER (R-Swoosh family, stages/swoosh.py) over
    documents: evidence tokens = distinct lowercased words of length ≥ 4,
    match = ≥ 8 shared tokens, merge = token-set union — merging two docs
    can surface enough combined evidence to absorb a third that matched
    neither parent (the closure pairwise near-dedup cannot reach).

    Oracle: match_merge maps EVERY input record to its fixpoint entity,
    so the emitted record_id column is VALUE-EXACT against
    SELECT doc_id FROM documents — one row per doc, no loss, no
    invention. The cluster assignment itself (iterative fixpoint, not
    SQL-expressible) is verified by two emitted invariants the SQL
    asserts TRUE: cluster_id ≤ record_id per row (cluster id = min
    member code) and every cluster_id is itself a self-mapped root.
    Exact merge semantics pinned in tests/test_swoosh.py against a
    sequential R-Swoosh reference (order-independent under ICAR, so the
    naive greedy IS the answer)."""
    import ray as _ray

    from ..functions.rayutil import get_broadcast
    from ..stages.swoosh import match_merge

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t.column("text"))
        if isinstance(low, pa.ChunkedArray):
            low = low.combine_chunks()
        words = pc.split_pattern_regex(low, r"[^a-z0-9]+")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words)
        ids = pc.take(t.column("doc_id").combine_chunks()
                      if isinstance(t.column("doc_id"), pa.ChunkedArray)
                      else t.column("doc_id"), parent)
        keep = pc.greater_equal(pc.utf8_length(flat), 4)
        return pa.table({"record_id": pc.filter(ids, keep),
                         "token": pc.filter(flat, keep)})

    recs = docs.map_batches(tok, batch_format="pyarrow",
                            zero_copy_batch=True)
    mapped = match_merge(recs, theta=8)
    # docs with no qualifying evidence tokens are singleton entities:
    # left-join the full id set, absent rows map to themselves
    ids = docs.map_batches(
        lambda t: pa.table({"record_id": t.column("doc_id")}),
        batch_format="pyarrow", zero_copy_batch=True)
    from ..stages.joins import cogroup_join_multi
    mapped = cogroup_join_multi(
        ids, mapped, key="record_id", left_cols=[],
        right_cols=["cluster_id"], how="left",
        left_schema=pa.schema([("record_id", pa.int64())]),
        right_schema=pa.schema([("record_id", pa.int64()),
                                ("cluster_id", pa.int64())])
    ).map_batches(
        lambda t: pa.table({
            "record_id": t.column("record_id"),
            "cluster_id": pc.coalesce(t.column("cluster_id"),
                                      t.column("record_id"))}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    roots = mapped.map_batches(
        lambda t: t.filter(pc.equal(t.column("record_id"),
                                    t.column("cluster_id")))
        .select(["cluster_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    from ..functions.rayutil import collect_table
    root_ids = np.sort(np.asarray(collect_table(
        roots, pa.schema([("cluster_id", pa.int64())]))
        .column("cluster_id"), dtype=np.int64))
    ref = _ray.put(root_ids)

    def check(t: pa.Table) -> pa.Table:
        rid = np.asarray(t.column("record_id"), dtype=np.int64)
        cid = np.asarray(t.column("cluster_id"), dtype=np.int64)
        r = get_broadcast(ref)
        pos = np.searchsorted(r, cid)
        is_root = (pos < len(r)) & (r[np.minimum(pos, max(len(r) - 1, 0))]
                                    == cid) if len(r) else \
            np.zeros(len(cid), dtype=bool)
        return pa.table({
            "record_id": t.column("record_id"),
            "cluster_le_ok": pa.array(cid <= rid),
            "root_self_ok": pa.array(is_root)})

    return mapped.map_batches(check, batch_format="pyarrow",
                              zero_copy_batch=True)


SQL_MATCH_MERGE_DOCUMENTS = """
SELECT doc_id AS record_id, TRUE AS cluster_le_ok, TRUE AS root_self_ok
FROM documents
"""


def q_hits_events(sf_dir: str):
    """HITS hubs & authorities (stages/graph.py::hits) over the same
    bipartite user → event_type graph as pagerank_events: 8 L1-normalized
    iterations on the broadcast fast path (2 streaming passes per
    iteration, zero shuffles). VALUE-EXACT vs a DuckDB twin that unrolls
    the same iterations as chained CTEs; both sides quantize to 1e-9,
    absorbing float summation order (the pagerank idiom)."""
    from ..stages.graph import hits

    ev = _pq(sf_dir, "events", ["user_id", "event_type"]).map_batches(
        lambda t: pa.table({
            "src": pc.binary_join_element_wise(
                pa.array(["u"] * t.num_rows),
                pc.cast(t.column("user_id"), pa.string()), ""),
            "dst": pc.binary_join_element_wise(
                pa.array(["t"] * t.num_rows), t.column("event_type"), "")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return hits(ev, iters=8).map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "hub_e9": pc.cast(pc.round(pc.multiply(
                t.column("hub"), pa.scalar(1e9))), pa.int64()),
            "auth_e9": pc.cast(pc.round(pc.multiply(
                t.column("auth"), pa.scalar(1e9))), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)


def _hits_sql(iters: int = 8) -> str:
    """Unrolled fixed-iteration HITS twin of stages/graph.py::hits (same
    update: a ← Aᵀh L1-normalized, h ← Aa L1-normalized; multi-edges per
    occurrence; h init 1/N). Chained CTEs, one (ar, a, hr, h) quad per
    iteration — recursive CTEs can't aggregate over the recursive
    relation."""
    parts = ["""
WITH edges AS MATERIALIZED (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS src, 't' || event_type AS dst
  FROM events),
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
h0 AS MATERIALIZED (
  SELECT node, 1.0 / (SELECT COUNT(*) FROM nodes) AS v FROM nodes)"""]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(f""",
ar{k} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(h.v) AS s
  FROM edges e JOIN h{p} h ON h.node = e.src GROUP BY e.dst),
a{k} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN (SELECT SUM(s) FROM ar{k}) > 0
              THEN COALESCE(r.s, 0.0) / (SELECT SUM(s) FROM ar{k})
              ELSE COALESCE(r.s, 0.0) END AS v
  FROM nodes n LEFT JOIN ar{k} r USING (node)),
hr{k} AS MATERIALIZED (
  SELECT e.src AS node, SUM(a.v) AS s
  FROM edges e JOIN a{k} a ON a.node = e.dst GROUP BY e.src),
h{k} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN (SELECT SUM(s) FROM hr{k}) > 0
              THEN COALESCE(r.s, 0.0) / (SELECT SUM(s) FROM hr{k})
              ELSE COALESCE(r.s, 0.0) END AS v
  FROM nodes n LEFT JOIN hr{k} r USING (node))""")
    parts.append(f"""
SELECT n.node,
       CAST(ROUND(h{iters}.v * 1e9) AS BIGINT) AS hub_e9,
       CAST(ROUND(a{iters}.v * 1e9) AS BIGINT) AS auth_e9
FROM nodes n JOIN h{iters} ON h{iters}.node = n.node
JOIN a{iters} ON a{iters}.node = n.node""")
    return "".join(parts)


def q_basket_lift_events(sf_dir: str):
    """Association mining (support / lift) over user baskets of event
    types (stages/behavior.py::market_basket_pairs): one bucket exchange
    with a vectorized triangular pair expansion per basket, one skinny
    pair groupby, item counts broadcast. Integer-exact rationals
    (support_e9, lift_e9 by truncation) — hash-exact vs the distinct
    self-join twin."""
    from ..stages.behavior import market_basket_pairs

    ev = _pq(sf_dir, "events", ["user_id", "event_type"])
    return market_basket_pairs(ev, key="user_id", item="event_type")


SQL_BASKET_LIFT_EVENTS = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS HUGEINT) AS nu FROM d),
s AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS c FROM d
      GROUP BY event_type),
p AS (SELECT d1.event_type AS a, d2.event_type AS b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM d d1 JOIN d d2 ON d1.user_id = d2.user_id
                         AND d1.event_type < d2.event_type
      GROUP BY 1, 2)
SELECT p.a, p.b, p.c_ab,
       CAST((p.c_ab * CAST(1000000000 AS HUGEINT)) // n.nu AS BIGINT)
           AS support_e9,
       CAST((n.nu * p.c_ab * 1000000000) // (sa.c * sb.c) AS BIGINT)
           AS lift_e9
FROM p
CROSS JOIN n
JOIN s sa ON sa.event_type = p.a
JOIN s sb ON sb.event_type = p.b
"""


def q_k_anonymity_events(sf_dir: str):
    """k-anonymity audit (Sweeney 2002) of the events table under the
    quasi-identifier (user_id, event_type, hour-of-day): the GROUP-SIZE
    HISTOGRAM (size -> number of QI groups, rows covered) — k-anonymity
    holds at k iff no histogram mass sits below k, and the shape says how
    far the release is from it. Histogram (not an at-risk row list) so
    the result is never empty at any scale: an empty Dataset loses its
    schema and the driver compare can't see the column names. Two
    groupbys, both vectorized."""
    from ray.data.aggregate import Count, Sum

    ev = _pq(sf_dir, "events", ["user_id", "event_type", "ts"])

    def qi(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "event_type": t.column("event_type"),
            "hour": pc.cast(pc.hour(t.column("ts")), pa.int64())})

    agg = (ev.map_batches(qi, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(["user_id", "event_type", "hour"]).aggregate(Count()))
    hist = (agg.map_batches(
        lambda t: pa.table({"n": t.column("count()"),
                            "one": pa.array(np.ones(t.num_rows,
                                                    dtype=np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n").aggregate(Sum("one")))
    return hist.map_batches(
        lambda t: pa.table({
            "n": t.column("n"),
            "groups": t.column("sum(one)"),
            "rows": pc.multiply(t.column("n"), t.column("sum(one)"))}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_K_ANONYMITY_EVENTS = """
WITH g AS (SELECT user_id, event_type,
                  CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2, 3)
SELECT n, CAST(COUNT(*) AS BIGINT) AS groups,
       CAST(n * COUNT(*) AS BIGINT) AS rows
FROM g GROUP BY n
"""


def q_forward_fill_events(sf_dir: str):
    """Per-user forward fill (LOCF) of the last purchase amount over the
    event stream (stages/temporal.py::forward_fill): value is observed
    only on 'purchase' rows; every later row carries the most recent
    purchase cents forward, rows before a user's first purchase stay
    NULL. One bucket exchange, vectorized maximum.accumulate fill with a
    per-user segment barrier — hash-exact vs DuckDB's
    last_value(IGNORE NULLS) window twin."""
    from ..stages.temporal import forward_fill

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type",
                                "value"])
    obs = ev.map_batches(
        lambda t: pa.table({
            "event_id": t.column("event_id"),
            "ts": t.column("ts"),
            "user_id": t.column("user_id"),
            "v": pc.if_else(pc.equal(t.column("event_type"), "purchase"),
                            _cents(t.column("value")),
                            pa.nulls(t.num_rows, type=pa.int64()))}),
        batch_format="pyarrow", zero_copy_batch=True)
    filled = forward_fill(obs, key="user_id", order_cols=["ts", "event_id"],
                          val="v", out_col="filled_cents")
    return filled.map_batches(
        lambda t: t.select(["event_id", "user_id", "filled_cents"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_FORWARD_FILL_EVENTS = """
SELECT event_id, user_id,
       last_value(CASE WHEN event_type = 'purchase'
                       THEN CAST(ROUND(value * 100) AS BIGINT) END
                  IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS filled_cents
FROM events
"""


def q_assortativity_events(sf_dir: str):
    """Degree assortativity coefficient (Newman '02) of the user-
    interaction graph — same edge derivation as triangle_count_events
    (stages/graph.py::assortativity). Over the symmetrized edge list the
    Pearson sqrt cancels, so r is an exact integer rational; r_e9 uses
    sign-aware truncation matching DuckDB's `//`. One degree exchange +
    one combiner pass; single-row output."""
    from ..stages.behavior import consecutive_pairs
    from ..stages.graph import assortativity

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    edges = consecutive_pairs(ev, key="event_type", ts="ts", tie="event_id",
                              val="user_id")
    edges = edges.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("src"), t.column("dst"))),
        batch_format="pyarrow", zero_copy_batch=True)
    return assortativity(edges)


SQL_ASSORTATIVITY_EVENTS = """
WITH raw AS (SELECT user_id AS src,
                    lead(user_id) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) AS dst
             FROM events QUALIFY dst IS NOT NULL AND dst != user_id),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node),
sym AS (SELECT da.deg AS du, db.deg AS dv
        FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
        UNION ALL
        SELECT db.deg, da.deg
        FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m,
             CAST(SUM(du) AS HUGEINT) AS sx,
             CAST(SUM(du*du) AS HUGEINT) AS sxx,
             CAST(SUM(du*dv) AS HUGEINT) AS sxy
      FROM sym)
SELECT CAST(m AS BIGINT) AS m, CAST(sx AS BIGINT) AS sx,
       CAST(sxx AS BIGINT) AS sxx, CAST(sxy AS BIGINT) AS sxy,
       CASE WHEN (m*sxx - sx*sx) != 0 THEN
            CAST(((m*sxy - sx*sx) * 1000000000) // (m*sxx - sx*sx)
                 AS BIGINT)
       END AS r_e9
FROM s
"""


def q_grouped_regression_lineitem(sf_dir: str):
    """Grouped simple OLS regression (extendedprice on quantity, dollars,
    per returnflag) from INTEGER-EXACT sufficient statistics — the same
    six co-moment partials as grouped_corr_lineitem, so the combiner merge
    is order-independent. Final coefficients are exact integer rationals,
    quantized to e9 with TRUNCATION toward zero (DuckDB's `//` truncates;
    Python's floors — sign-aware abs/restore makes both sides identical):
      slope_e9     = trunc((n·Σxy − Σx·Σy)·1e9 / (n·Σxx − Σx²))
      intercept_e9 = trunc((Σy·D − N·Σx)·1e9 / (n·D)),  N/D = slope
      r2_e9        = trunc(slope_e9 · slope_yx_e9 / 1e9)  (product of the
                     two quantized regression slopes — r² = b_xy·b_yx;
                     quantizing each factor first keeps every intermediate
                     inside HUGEINT, which N²·1e9 would overflow).
    Driver never sees rows — the fold is per group over the aggregated
    k-row table (Python big ints; the SQL twin does the same in
    HUGEINT)."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        f = t.column("l_returnflag")
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        x = np.asarray(_cents(t.column("l_quantity"))) // 100
        y = np.asarray(_cents(t.column("l_extendedprice"))) // 100
        enc = pc.dictionary_encode(f)
        codes = np.asarray(enc.indices, dtype=np.int64)
        k = len(enc.dictionary)

        def bc(w):
            return pa.array(np.bincount(codes, weights=w, minlength=k)
                            .astype(np.int64))

        return pa.table({
            "l_returnflag": enc.dictionary,
            "n": pa.array(np.bincount(codes, minlength=k).astype(np.int64)),
            "sx": bc(x), "sy": bc(y), "sxx": bc(x * x), "syy": bc(y * y),
            "sxy": bc(x * y)})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("l_returnflag")
           .aggregate(Sum("n"), Sum("sx"), Sum("sy"), Sum("sxx"),
                      Sum("syy"), Sum("sxy")))

    def _tdiv(a: int, b: int) -> int:
        # truncation toward zero, matching DuckDB's integer //
        s = -1 if (a < 0) != (b < 0) else 1
        return s * (abs(a) // abs(b))

    def finish(t: pa.Table) -> pa.Table:
        cols = {c: t.column(f"sum({c})").to_pylist()
                for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        slope, intercept, r2 = [], [], []
        for n, sx, sy, sxx, syy, sxy in zip(*(cols[c] for c in
                                              ("n", "sx", "sy", "sxx",
                                               "syy", "sxy"))):
            num = n * sxy - sx * sy
            den_x = n * sxx - sx * sx
            den_y = n * syy - sy * sy
            if den_x == 0 or den_y == 0:
                slope.append(None); intercept.append(None); r2.append(None)
                continue
            b_e9 = _tdiv(num * 10**9, den_x)
            byx_e9 = _tdiv(num * 10**9, den_y)
            slope.append(b_e9)
            intercept.append(_tdiv((sy * den_x - num * sx) * 10**9,
                                   n * den_x))
            r2.append(_tdiv(b_e9 * byx_e9, 10**9))
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "n": pa.array(cols["n"], type=pa.int64()),
            "slope_e9": pa.array(slope, type=pa.int64()),
            "intercept_e9": pa.array(intercept, type=pa.int64()),
            "r2_e9": pa.array(r2, type=pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_GROUPED_REGRESSION_LINEITEM = """
WITH b AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity*100) AS BIGINT) // 100 AS x,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) // 100 AS y
  FROM lineitem),
s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x*x) AS HUGEINT) AS sxx,
         CAST(SUM(y*y) AS HUGEINT) AS syy,
         CAST(SUM(x*y) AS HUGEINT) AS sxy
  FROM b GROUP BY l_returnflag),
c AS (
  SELECT l_returnflag, n,
         (n*sxy - sx*sy) AS num,
         (n*sxx - sx*sx) AS den_x,
         (n*syy - sy*sy) AS den_y,
         sx, sy
  FROM s)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CAST((num * 1000000000) // den_x AS BIGINT) AS slope_e9,
       CAST(((sy*den_x - num*sx) * 1000000000) // (n*den_x) AS BIGINT)
           AS intercept_e9,
       CAST((((num * 1000000000) // den_x)
             * ((num * 1000000000) // den_y)) // 1000000000 AS BIGINT)
           AS r2_e9
FROM c
"""


def q_average_precision_events(sf_dir: str):
    """Exact distributed average precision (step-interpolated PR-AUC) of
    the event value as a 'purchase' classifier score
    (pipelines/eval.py::average_precision): same combiner + distinct-score
    groupby shape as roc_auc_events; precision per threshold is per-term
    quantized (prec_e9 = floor(cum_tp*1e9/cum_n)) so the numerator is an
    order-independent integer sum — hash-exact vs the HUGEINT window
    twin."""
    from .eval import average_precision

    ev = _pq(sf_dir, "events", ["event_type", "value"])
    scored = ev.map_batches(
        lambda t: pa.table({
            "score": _cents(t.column("value")),
            "lab": pc.equal(t.column("event_type"), "purchase")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return average_precision(scored, score_col="score", label_col="lab")


SQL_AVERAGE_PRECISION_EVENTS = """
WITH t AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS score,
                  (event_type = 'purchase') AS lab FROM events),
s AS (SELECT score,
             CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(SUM(CASE WHEN lab THEN 0 ELSE 1 END) AS BIGINT) AS nn
      FROM t GROUP BY score),
c AS (SELECT np, nn,
             SUM(np) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumtp,
             SUM(np + nn) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn
      FROM s)
SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
       CAST(SUM(nn) AS BIGINT) AS n_neg,
       CAST((SUM(np * ((cumtp * CAST(1000000000 AS HUGEINT)) // cumn))
             + SUM(np) // 2) // SUM(np) AS BIGINT) AS ap_e9
FROM c
"""


def q_calibration_bins_events(sf_dir: str):
    """Reliability-diagram bins (pipelines/eval.py::calibration_bins) of a
    deterministic pseudo-score s = event_id % 1000 (scaled to [0,1] as
    s/999) against the 'purchase' label: 10 bins, per-bin observed
    positive rate (frac_pos_e9) vs mean predicted score (mean_score_e9),
    both floor-quantized integers — the table a calibration plot / ECE
    reads. One combiner pass + a 10-row groupby."""
    from .eval import calibration_bins

    ev = _pq(sf_dir, "events", ["event_id", "event_type"])
    scored = ev.map_batches(
        lambda t: pa.table({
            "score": pa.array(
                np.asarray(t.column("event_id"), dtype=np.int64) % 1000),
            "lab": pc.equal(t.column("event_type"), "purchase")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return calibration_bins(scored, score_col="score", label_col="lab",
                            score_max=999, num_bins=10)


SQL_CALIBRATION_BINS_EVENTS = """
WITH t AS (SELECT (event_id % 1000) AS s,
                  (event_type = 'purchase') AS lab FROM events),
b AS (SELECT s * 10 // 1000 AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(s) AS BIGINT) AS sum_score
      FROM t GROUP BY 1)
SELECT bin, n, n_pos,
       CAST((n_pos * CAST(1000000000 AS HUGEINT)) // n AS BIGINT)
           AS frac_pos_e9,
       CAST((sum_score * CAST(1000000000 AS HUGEINT)) // (999 * n)
            AS BIGINT) AS mean_score_e9
FROM b WHERE n > 0
"""


def q_ece_events(sf_dir: str):
    """Expected calibration error over the calibration_bins_events table
    (pipelines/eval.py::expected_calibration_error): the n-weighted mean
    of |observed − predicted| per bin, ece_e9 = floor(Σ n_b·|Δ_b| / N),
    folded in Python ints over the 10-row bin table — hash-exact vs the
    nested-aggregate twin."""
    from ..functions.rayutil import collect_table
    from .eval import expected_calibration_error

    bins = q_calibration_bins_events(sf_dir)
    tab = collect_table(bins, pa.schema(
        [("bin", pa.int64()), ("n", pa.int64()), ("n_pos", pa.int64()),
         ("frac_pos_e9", pa.int64()), ("mean_score_e9", pa.int64())]))
    return expected_calibration_error(tab)


SQL_ECE_EVENTS = """
WITH t AS (SELECT (event_id % 1000) AS s,
                  (event_type = 'purchase') AS lab FROM events),
b AS (SELECT s * 10 // 1000 AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(s) AS BIGINT) AS sum_score
      FROM t GROUP BY 1),
q AS (SELECT n,
             CAST((n_pos * CAST(1000000000 AS HUGEINT)) // n AS BIGINT)
                 AS fp,
             CAST((sum_score * CAST(1000000000 AS HUGEINT)) // (999 * n)
                  AS BIGINT) AS ms
      FROM b WHERE n > 0)
SELECT CAST(SUM(n) AS BIGINT) AS n,
       CAST(SUM(n * ABS(fp - ms)) // SUM(n) AS BIGINT) AS ece_e9
FROM q
"""


QUERIES = {
    "blocking_frontier_transcripts": q_blocking_frontier_transcripts,
    "blocking_frontier_part": q_blocking_frontier_part,
    "pagerank_weighted_events": q_pagerank_weighted_events,
    "grouped_means_events": q_grouped_means_events,
    "attribution_events": q_attribution_events,
    "autocorr_events": q_autocorr_events,
    "top_paths_events": q_top_paths_events,
    "twa_events": q_twa_events,
    "hierarchy_flatten_part": q_hierarchy_flatten_part,
    "pca_embeddings": q_pca_embeddings,
    "blb_ci_events": q_blb_ci_events,
    "one_to_one_part": q_one_to_one_part,
    "mutual_info_events": q_mutual_info_events,
    "ks_drift_documents": q_ks_drift_documents,
    "ctfidf_labels": q_ctfidf_labels,
    "fs_explain_transcripts": q_fs_explain_transcripts,
    "bridge_edges_events": q_bridge_edges_events,
    "spearman_lineitem": q_spearman_lineitem,
    "chi2_events": q_chi2_events,
    "benford_events": q_benford_events,
    "scd2_events": q_scd2_events,
    "longest_streak_events": q_longest_streak_events,
    "cumulative_distinct_events": q_cumulative_distinct_events,
    "psi_drift_documents": q_psi_drift_documents,
    "gini_events": q_gini_events,
    "isotonic_events": q_isotonic_events,
    "match_merge_documents": q_match_merge_documents,
    "hits_events": q_hits_events,
    "basket_lift_events": q_basket_lift_events,
    "k_anonymity_events": q_k_anonymity_events,
    "forward_fill_events": q_forward_fill_events,
    "assortativity_events": q_assortativity_events,
    "clustering_coef_events": q_clustering_coef_events,
    "grouped_regression_lineitem": q_grouped_regression_lineitem,
    "average_precision_events": q_average_precision_events,
    "calibration_bins_events": q_calibration_bins_events,
    "ece_events": q_ece_events,
    "adamic_adar_events": q_adamic_adar_events,
    "mad_outliers_events": q_mad_outliers_events,
    "bpe_train_documents": q_bpe_train_documents,
    "bpe_token_count_documents": q_bpe_token_count_documents,
    "roc_auc_events": q_roc_auc_events,
    "lineitem_agg": q_lineitem_agg,
    "tpch_q3_style": q_tpch_q3_style,
    "corpus_prep_documents": q_corpus_prep_documents,
    "top_customers": q_top_customers,
    "customers_per_nation": q_customers_per_nation,
    "events_reconstruct": q_events_reconstruct,
    "grouped_topk_events": q_grouped_topk_events,
    "sessionize_events": q_sessionize_events,
    "asof_join_events_orders": q_asof_join_events_orders,
    "asof_forward_events_orders": q_asof_forward_events_orders,
    "range_join_events": q_range_join_events,
    "rolling_window_events": q_rolling_window_events,
    "window_functions_events": q_window_functions_events,
    "moving_sum_events": q_moving_sum_events,
    "string_agg_events": q_string_agg_events,
    "ranked_events": q_ranked_events,
    "latest_event_per_user": q_latest_event_per_user,
    "unpivot_events_per_user": q_unpivot_events_per_user,
    "session_agg_events": q_session_agg_events,
    "tumbling_window_events": q_tumbling_window_events,
    "customers_no_urgent_orders": q_customers_no_urgent_orders,
    "revenue_by_mktsegment": q_revenue_by_mktsegment,
    "customer_big_order_counts": q_customer_big_order_counts,
    "nation_customer_supplier_pairs": q_nation_customer_supplier_pairs,
    "user_activity_full_outer": q_user_activity_full_outer,
    "region_nation_cross": q_region_nation_cross,
    "grouped_variance_lineitem": q_grouped_variance_lineitem,
    "grouped_corr_lineitem": q_grouped_corr_lineitem,
    "interval_overlap_events": q_interval_overlap_events,
    "mode_event_type_per_user": q_mode_event_type_per_user,
    "rollup_lineitem": q_rollup_lineitem,
    "cube_lineitem": q_cube_lineitem,
    "customers_with_big_events": q_customers_with_big_events,
    "pagerank_events": q_pagerank_events,
    "diff_corpora_documents": q_diff_corpora_documents,
    "json_props_agg_events": q_json_props_agg_events,
    "profile_events": q_profile_events,
    "histogram_lineitem": q_histogram_lineitem,
    "prepare_corpus_report": q_prepare_corpus_report,
    "lm_quality_documents": q_lm_quality_documents,
    "sample_k_events_per_user": q_sample_k_events_per_user,
    "partitioned_sink_roundtrip": q_partitioned_sink_roundtrip,
    "budget_sample_documents": q_budget_sample_documents,
    "stratified_sample_documents": q_stratified_sample_documents,
    "distinct_users_per_event_type": q_distinct_users_per_event_type,
    "approx_distinct_users": q_approx_distinct_users,
    "percent_rank_documents": q_percent_rank_documents,
    "quantile_bucket_documents": q_quantile_bucket_documents,
    "collect_set_events": q_collect_set_events,
    "pivot_events_per_user": q_pivot_events_per_user,
    "chunk_documents": q_chunk_documents,
    "scrub_pii_documents": q_scrub_pii_documents,
    "tfidf_topk_documents": q_tfidf_topk_documents,
    "bm25_topk_documents": q_bm25_topk_documents,
    "bottomk_sample_documents": q_bottomk_sample_documents,
    "dup_passages_documents": q_dup_passages_documents,
    "dup_ratio_documents": q_dup_ratio_documents,
    "agreement_lang_id_documents": q_agreement_lang_id_documents,
    "grouped_quantiles_lineitem": q_grouped_quantiles_lineitem,
    "grouped_quantiles_hist_lineitem": q_grouped_quantiles_hist_lineitem,
    "approx_quantiles_lineitem": q_approx_quantiles_lineitem,
    "top_terms_documents": q_top_terms_documents,
    "top_bigrams_documents": q_top_bigrams_documents,
    "pmi_bigrams_documents": q_pmi_bigrams_documents,
    "entropy_event_type_per_user": q_entropy_event_type_per_user,
    "global_median_lineitem": q_global_median_lineitem,
    "pack_sequences_documents": q_pack_sequences_documents,
    "union_sum": q_union_sum,
    "sample_lineitem": q_sample_lineitem,
    "sentence_split_documents": q_sentence_split_documents,
    "extract_tokens_documents": q_extract_tokens_documents,
    "exact_dedup_documents": q_exact_dedup_documents,
    "dup_pairs_documents": q_dup_pairs_documents,
    "ngram_jaccard_pairs_documents": q_ngram_jaccard_pairs_documents,
    "containment_pairs_documents": q_containment_pairs_documents,
    "cross_dedup_documents": q_cross_dedup_documents,
    "minhash_dedup_documents": q_minhash_dedup_documents,
    "simhash_documents": q_simhash_documents,
    "simhash_dedup_documents": q_simhash_dedup_documents,
    "embedding_near_dup": q_embedding_near_dup,
    "cosine_pairs_embeddings": q_cosine_pairs_embeddings,
    "knn_graph_embeddings": q_knn_graph_embeddings,
    "knn_graph_ivf_embeddings": q_knn_graph_ivf_embeddings,
    "pq_encode_embeddings": q_pq_encode_embeddings,
    "pq_ann_topk_embeddings": q_pq_ann_topk_embeddings,
    "ivfpq_ann_topk_embeddings": q_ivfpq_ann_topk_embeddings,
    "levenshtein_pairs_part": q_levenshtein_pairs_part,
    "jw_pairs_part": q_jw_pairs_part,
    "ann_topk_embeddings": q_ann_topk_embeddings,
    "ann_topk_lsh_embeddings": q_ann_topk_lsh_embeddings,
    "ann_topk_ivf_embeddings": q_ann_topk_ivf_embeddings,
    "kmeans_embeddings": q_kmeans_embeddings,
    "label_centroids_embeddings": q_label_centroids_embeddings,
    "train_split_documents": q_train_split_documents,
    "leakage_safe_split_documents": q_leakage_safe_split_documents,
    "normalize_documents": q_normalize_documents,
    "token_count_documents": q_token_count_documents,
    "quality_counts_documents": q_quality_counts_documents,
    "quality_classifier_documents": q_quality_classifier_documents,
    "gru_embed_documents": q_gru_embed_documents,
    "lang_id_documents": q_lang_id_documents,
    "fingerprint_documents": q_fingerprint_documents,
    "snm_pairs_documents": q_snm_pairs_documents,
    "snm_multipass_documents": q_snm_multipass_documents,
    "canopy_assign_documents": q_canopy_assign_documents,
    "weighted_sample_documents": q_weighted_sample_documents,
    "shuffle_export_documents": q_shuffle_export_documents,
    "grouped_median_events": q_grouped_median_events,
    "soundex_blocks_documents": q_soundex_blocks_documents,
    "funnel_events": q_funnel_events,
    "funnel_window_events": q_funnel_window_events,
    "cohort_retention_events": q_cohort_retention_events,
    "transition_matrix_events": q_transition_matrix_events,
    "skyline_lineitem": q_skyline_lineitem,
    "triangle_count_events": q_triangle_count_events,
    "kcore_lineitem": q_kcore_lineitem,
    "mixture_sample_documents": q_mixture_sample_documents,
    "textstats_documents": q_textstats_documents,
    "multimodal_features": q_multimodal_features,
    "linkage_clusters": q_linkage_clusters,
    "linkage_edges": q_linkage_edges,
    "incremental_link_transcripts": q_incremental_link,
    "blocking_metrics_transcripts": q_blocking_metrics,
    "entity_summary_transcripts": q_entity_summary,
    "train_pair_scorer_transcripts": q_train_pair_scorer,
    "fellegi_sunter_transcripts": q_fellegi_sunter_transcripts,
    "linkage_em_transcripts": q_linkage_em_transcripts,
    "merge_stores_transcripts": q_merge_stores_transcripts,
    "fs_review_pairs_transcripts": q_fs_review_pairs_transcripts,
    "semantic_dedup_embeddings": q_semantic_dedup_embeddings,
    "heavy_hitters_exact_documents": q_heavy_hitters_exact_documents,
    "drop_boilerplate_documents": q_drop_boilerplate_documents,
    "best_match_per_record": q_best_match_per_record,
    "conversation_windows": q_conversation_windows,
    "decontaminate_documents": q_decontaminate_documents,
    "decontaminate_bloom_documents": q_decontaminate_bloom_documents,
    "heavy_hitters_documents": q_heavy_hitters_documents,
    "cms_heavy_hitters_documents": q_cms_heavy_hitters_documents,
    "repetition_documents": q_repetition_documents,
    "context_windows_events": q_context_windows_events,
}

ORACLE_SQL = {
    "pagerank_weighted_events": _pagerank_weighted_sql(),
    "grouped_means_events": SQL_GROUPED_MEANS_EVENTS,
    "attribution_events": SQL_ATTRIBUTION_EVENTS,
    "autocorr_events": SQL_AUTOCORR_EVENTS,
    "top_paths_events": SQL_TOP_PATHS_EVENTS,
    "twa_events": SQL_TWA_EVENTS,
    "hierarchy_flatten_part": SQL_HIERARCHY_FLATTEN_PART,
    "mutual_info_events": SQL_MUTUAL_INFO_EVENTS,
    "ks_drift_documents": SQL_KS_DRIFT_DOCUMENTS,
    "ctfidf_labels": SQL_CTFIDF_LABELS,
    "spearman_lineitem": SQL_SPEARMAN_LINEITEM,
    "chi2_events": SQL_CHI2_EVENTS,
    "benford_events": SQL_BENFORD_EVENTS,
    "scd2_events": SQL_SCD2_EVENTS,
    "longest_streak_events": SQL_LONGEST_STREAK_EVENTS,
    "cumulative_distinct_events": SQL_CUMULATIVE_DISTINCT_EVENTS,
    "psi_drift_documents": SQL_PSI_DRIFT_DOCUMENTS,
    "gini_events": SQL_GINI_EVENTS,
    "hits_events": _hits_sql(),
    "basket_lift_events": SQL_BASKET_LIFT_EVENTS,
    "k_anonymity_events": SQL_K_ANONYMITY_EVENTS,
    "forward_fill_events": SQL_FORWARD_FILL_EVENTS,
    "assortativity_events": SQL_ASSORTATIVITY_EVENTS,
    "clustering_coef_events": SQL_CLUSTERING_COEF_EVENTS,
    "grouped_regression_lineitem": SQL_GROUPED_REGRESSION_LINEITEM,
    "average_precision_events": SQL_AVERAGE_PRECISION_EVENTS,
    "calibration_bins_events": SQL_CALIBRATION_BINS_EVENTS,
    "ece_events": SQL_ECE_EVENTS,
    "adamic_adar_events": SQL_ADAMIC_ADAR_EVENTS,
    "mad_outliers_events": SQL_MAD_OUTLIERS_EVENTS,
    "roc_auc_events": SQL_ROC_AUC_EVENTS,
    "lineitem_agg": SQL_LINEITEM_AGG,
    "tpch_q3_style": SQL_TPCH_Q3_STYLE,
    "corpus_prep_documents": _corpus_prep_sql(),
    "top_customers": SQL_TOP_CUSTOMERS,
    "customers_per_nation": SQL_CUSTOMERS_PER_NATION,
    "events_reconstruct": SQL_EVENTS_RECONSTRUCT,
    "grouped_topk_events": SQL_GROUPED_TOPK_EVENTS,
    "sessionize_events": SQL_SESSIONIZE_EVENTS,
    "asof_join_events_orders": SQL_ASOF_JOIN_EVENTS_ORDERS,
    "asof_forward_events_orders": SQL_ASOF_FORWARD_EVENTS_ORDERS,
    "range_join_events": SQL_RANGE_JOIN_EVENTS,
    "rolling_window_events": SQL_ROLLING_WINDOW_EVENTS,
    "window_functions_events": SQL_WINDOW_FUNCTIONS_EVENTS,
    "moving_sum_events": SQL_MOVING_SUM_EVENTS,
    "string_agg_events": SQL_STRING_AGG_EVENTS,
    "ranked_events": SQL_RANKED_EVENTS,
    "latest_event_per_user": SQL_LATEST_EVENT_PER_USER,
    "unpivot_events_per_user": SQL_UNPIVOT_EVENTS_PER_USER,
    "session_agg_events": SQL_SESSION_AGG_EVENTS,
    "tumbling_window_events": SQL_TUMBLING_WINDOW_EVENTS,
    "customers_no_urgent_orders": SQL_CUSTOMERS_NO_URGENT_ORDERS,
    "revenue_by_mktsegment": SQL_REVENUE_BY_MKTSEGMENT,
    "customer_big_order_counts": SQL_CUSTOMER_BIG_ORDER_COUNTS,
    "nation_customer_supplier_pairs": SQL_NATION_CUSTOMER_SUPPLIER_PAIRS,
    "user_activity_full_outer": SQL_USER_ACTIVITY_FULL_OUTER,
    "region_nation_cross": SQL_REGION_NATION_CROSS,
    "grouped_variance_lineitem": SQL_GROUPED_VARIANCE_LINEITEM,
    "grouped_corr_lineitem": SQL_GROUPED_CORR_LINEITEM,
    "interval_overlap_events": SQL_INTERVAL_OVERLAP_EVENTS,
    "mode_event_type_per_user": SQL_MODE_EVENT_TYPE_PER_USER,
    "rollup_lineitem": SQL_ROLLUP_LINEITEM,
    "cube_lineitem": SQL_CUBE_LINEITEM,
    "customers_with_big_events": SQL_CUSTOMERS_WITH_BIG_EVENTS,
    "diff_corpora_documents": SQL_DIFF_CORPORA_DOCUMENTS,
    "json_props_agg_events": SQL_JSON_PROPS_AGG_EVENTS,
    "profile_events": SQL_PROFILE_EVENTS,
    "histogram_lineitem": SQL_HISTOGRAM_LINEITEM,
    "sample_k_events_per_user": SQL_SAMPLE_K_EVENTS_PER_USER,
    "partitioned_sink_roundtrip": SQL_PARTITIONED_SINK_ROUNDTRIP,
    "budget_sample_documents": SQL_BUDGET_SAMPLE_DOCUMENTS,
    "stratified_sample_documents": SQL_STRATIFIED_SAMPLE_DOCUMENTS,
    "distinct_users_per_event_type": SQL_DISTINCT_USERS_PER_EVENT_TYPE,
    "approx_distinct_users": SQL_APPROX_DISTINCT_USERS,
    "percent_rank_documents": SQL_PERCENT_RANK_DOCUMENTS,
    "quantile_bucket_documents": SQL_QUANTILE_BUCKET_DOCUMENTS,
    "collect_set_events": SQL_COLLECT_SET_EVENTS,
    "pivot_events_per_user": SQL_PIVOT_EVENTS_PER_USER,
    "chunk_documents": SQL_CHUNK_DOCUMENTS,
    "scrub_pii_documents": SQL_SCRUB_PII_DOCUMENTS,
    "tfidf_topk_documents": SQL_TFIDF_TOPK_DOCUMENTS,
    "bm25_topk_documents": SQL_BM25_TOPK_DOCUMENTS,
    "bottomk_sample_documents": SQL_BOTTOMK_SAMPLE_DOCUMENTS,
    "snm_pairs_documents": SQL_SNM_PAIRS_DOCUMENTS,
    "snm_multipass_documents": SQL_SNM_MULTIPASS_DOCUMENTS,
    "canopy_assign_documents": SQL_CANOPY_ASSIGN_DOCUMENTS,
    "weighted_sample_documents": SQL_WEIGHTED_SAMPLE_DOCUMENTS,
    "shuffle_export_documents": SQL_SHUFFLE_EXPORT_DOCUMENTS,
    "grouped_median_events": SQL_GROUPED_MEDIAN_EVENTS,
    "soundex_blocks_documents": _sql_soundex_blocks(),
    "funnel_events": SQL_FUNNEL_EVENTS,
    "funnel_window_events": SQL_FUNNEL_WINDOW_EVENTS,
    "cohort_retention_events": SQL_COHORT_RETENTION_EVENTS,
    "transition_matrix_events": SQL_TRANSITION_MATRIX_EVENTS,
    "skyline_lineitem": SQL_SKYLINE_LINEITEM,
    "triangle_count_events": SQL_TRIANGLE_COUNT_EVENTS,
    "kcore_lineitem": _sql_kcore_lineitem(),
    "mixture_sample_documents": _sql_mixture_sample_documents(),
    "dup_passages_documents": SQL_DUP_PASSAGES_DOCUMENTS,
    "dup_ratio_documents": SQL_DUP_RATIO_DOCUMENTS,
    "drop_boilerplate_documents": SQL_DROP_BOILERPLATE_DOCUMENTS,
    "heavy_hitters_exact_documents": SQL_HEAVY_HITTERS_EXACT_DOCUMENTS,
    "agreement_lang_id_documents": _sql_agreement_lang_id(),
    "grouped_quantiles_lineitem": SQL_GROUPED_QUANTILES_LINEITEM,
    "grouped_quantiles_hist_lineitem": SQL_GROUPED_QUANTILES_LINEITEM,
    "top_terms_documents": SQL_TOP_TERMS_DOCUMENTS,
    "top_bigrams_documents": SQL_TOP_BIGRAMS_DOCUMENTS,
    "pmi_bigrams_documents": SQL_PMI_BIGRAMS_DOCUMENTS,
    "entropy_event_type_per_user": SQL_ENTROPY_EVENT_TYPE_PER_USER,
    "global_median_lineitem": SQL_GLOBAL_MEDIAN_LINEITEM,
    "pack_sequences_documents": SQL_PACK_SEQUENCES_DOCUMENTS,
    "train_split_documents": SQL_TRAIN_SPLIT_DOCUMENTS,
    "union_sum": SQL_UNION_SUM,
    "sample_lineitem": SQL_SAMPLE_LINEITEM,
    "sentence_split_documents": SQL_SENTENCE_SPLIT_DOCUMENTS,
    "extract_tokens_documents": SQL_EXTRACT_TOKENS_DOCUMENTS,
    "exact_dedup_documents": SQL_EXACT_DEDUP_DOCUMENTS,
    "dup_pairs_documents": SQL_DUP_PAIRS_DOCUMENTS,
    "ngram_jaccard_pairs_documents": SQL_NGRAM_JACCARD_PAIRS_DOCUMENTS,
    "cross_dedup_documents": SQL_CROSS_DEDUP_DOCUMENTS,
    "containment_pairs_documents": SQL_CONTAINMENT_PAIRS_DOCUMENTS,
    "ann_topk_embeddings": SQL_ANN_TOPK_EMBEDDINGS,
    "cosine_pairs_embeddings": SQL_COSINE_PAIRS_EMBEDDINGS,
    "knn_graph_embeddings": SQL_KNN_GRAPH_EMBEDDINGS,
    "levenshtein_pairs_part": SQL_LEVENSHTEIN_PAIRS_PART,
    "jw_pairs_part": SQL_JW_PAIRS_PART,
    "label_centroids_embeddings": SQL_LABEL_CENTROIDS_EMBEDDINGS,
    "normalize_documents": SQL_NORMALIZE_DOCUMENTS,
    "token_count_documents": SQL_TOKEN_COUNT_DOCUMENTS,
    "quality_counts_documents": SQL_QUALITY_COUNTS_DOCUMENTS,
    "quality_classifier_documents": SQL_QUALITY_CLASSIFIER_DOCUMENTS,
    "lang_id_documents": _lang_sql(),
    "textstats_documents": _textstats_sql(),
    "context_windows_events": _context_windows_sql(),
    "conversation_windows": _conversation_windows_sql(),
    "decontaminate_documents": SQL_DECONTAMINATE_DOCUMENTS,
    "repetition_documents": SQL_REPETITION_DOCUMENTS,
    "pagerank_events": _pagerank_sql(),
    "lm_quality_documents": SQL_LM_QUALITY_DOCUMENTS,
    "approx_quantiles_lineitem": _approx_quantiles_sql(),
    "prepare_corpus_report": _prep_report_sql(),
    "isotonic_events": SQL_ISOTONIC_EVENTS,
    "bpe_token_count_documents": SQL_BPE_TOKEN_COUNT_DOCUMENTS,
    "one_to_one_part": SQL_ONE_TO_ONE_PART,
    "fs_explain_transcripts": SQL_FS_EXPLAIN_TRANSCRIPTS,
    "match_merge_documents": SQL_MATCH_MERGE_DOCUMENTS,
    "blocking_frontier_transcripts": SQL_BLOCKING_FRONTIER_TRANSCRIPTS,
    "blocking_frontier_part": SQL_BLOCKING_FRONTIER_PART,
}
