"""Registry segment: auto-split from pipelines/queries.py (round 5).
Shared helpers in ._common; the public dicts live in pipelines.queries."""
from ._common import *  # noqa: F401,F403
from .text import _lang_sql  # noqa: F401


def q_range_join_events(sf_dir: str):
    """Attribution-window range join: every purchase within 1 hour at-or-after
    a view by the same user. One bucket exchange + one vectorized composite
    searchsorted per bucket (stages/temporal.py::range_join)."""
    from ...stages.temporal import range_join

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
    from ...stages.temporal import rolling_window_agg

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
    from ...stages.temporal import partitioned_window

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
    from ...stages.temporal import partitioned_window

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
    from ...stages.temporal import grouped_string_agg

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
    from ...stages.dedup import keep_latest

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
    from ...stages.temporal import grouped_rank

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
    from ...stages.temporal import sessionize

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
    from ...stages.joins import semi_anti_join

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

    from ...stages.joins import cogroup_inner_join

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
    from ...stages.joins import cogroup_join_multi

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
    from ...stages.joins import cogroup_join_multi

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
    from ...stages.temporal import interval_overlap_self

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
    from ...functions.rayutil import bucketed_group_apply, segment_starts

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
    from ...stages.rollup import rollup_sum

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
    from ...stages.rollup import cube_sum

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

    from ...stages.joins import cogroup_join_multi

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
    from ...stages.sampling import budget_sample

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

    from ...sources.sinks import read_partitioned, write_partitioned

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
    from ...stages.sampling import sample_k_per_group

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
    from ...stages.textstats import lm_score

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
    from ...stages.profile import histogram_fixed

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
    from ...pipelines.prep import prepare_corpus

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
    from ...stages.sketches import _qs_nbins

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
    from ...stages.profile import profile_table

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

    from ...stages.cleaning import json_scalar_field

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
    from ...stages.dedup import diff_corpora

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
    from ...stages.graph import pagerank

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


