"""Registry segment: auto-split from pipelines/queries.py (round 5).
Shared helpers in ._common; the public dicts live in pipelines.queries."""
from ._common import *  # noqa: F401,F403


def q_snm_pairs_documents(sf_dir: str):
    """Sorted-neighborhood blocking (Hernandez-Stolfo SIGMOD'95): candidate
    pairs within a window of 8 positions under ORDER BY (12-char lowercased
    text prefix, doc_id). Distributed: sampled range-partition boundaries ->
    exact dense global rank -> rank-chunk pairing with <= (window-1)/chunk
    ghost replication (stages/neighborhood.py)."""
    from ...stages.neighborhood import sorted_neighborhood_pairs

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
    from ...stages.neighborhood import sorted_neighborhood_pairs

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

    from ...stages.canopy import canopy_assign

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
    from ...stages.sampling import weighted_bottomk

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
    from ...stages.sampling import shuffle_shard_assign

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
    from ...stages.selection import grouped_median

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
    from ...functions.phonetic import soundex_codes

    docs = _pq(sf_dir, "documents", ["text"])

    def code(t: pa.Table) -> pa.Table:
        return pa.table({"code": soundex_codes(t.column("text"))})

    agg = (docs.map_batches(code, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("code").aggregate(Count()))
    return agg.map_batches(lambda t: t.rename_columns(["code", "cnt"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def _sql_soundex_blocks() -> str:
    from ...functions.phonetic import soundex_sql
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
    from ...stages.behavior import funnel_counts

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
    from ...stages.behavior import cohort_retention

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
    from ...stages.behavior import transition_counts

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
    from ...stages.behavior import skyline2d

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
    from ...stages.behavior import consecutive_pairs
    from ...stages.graph import triangle_count

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
    from ...stages.graph import k_core

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
    from ...stages.sampling import mixture_sample

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
    from ...stages.behavior import funnel_counts

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
    from ...functions.rayutil import global_topk
    from ...stages.behavior import consecutive_pairs
    from ...stages.graph import adamic_adar

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
    from ...stages.selection import grouped_mad_outliers

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
    prunes the tail in-cluster, max_vocab fails loudly).

    Oracle: the 64-merge count is asserted exactly (one row per rank —
    SQL range(64); an undersized corpus that exhausts pairs early would
    mismatch loudly) and each merge's WELL-FORMEDNESS is verified and
    emitted as a boolean: left and right are each a single alphabet
    character or the concatenation of an EARLIER merge — the structural
    invariant of a valid BPE merge sequence. The merge choices
    themselves (iterative argmax) are pinned in tests/test_tokenizer.py
    against a from-scratch recount reference."""
    from ...stages.tokenizer import bpe_train

    docs = _pq(sf_dir, "documents", ["text"])
    merges = bpe_train(docs, "text", 64, min_count=2)
    lefts = merges.column("left").to_pylist()
    rights = merges.column("right").to_pylist()
    produced: set = set()
    ok = []
    for l, r in zip(lefts, rights):
        ok.append((len(l) == 1 or l in produced)
                  and (len(r) == 1 or r in produced))
        produced.add(l + r)
    return pa.table({
        "rank": merges.column("rank"),
        "well_formed": pa.array(ok, type=pa.bool_())})


SQL_BPE_TRAIN_DOCUMENTS = """
SELECT CAST(r AS BIGINT) AS rank, TRUE AS well_formed
FROM range(64) t(r)
"""


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
    from ...stages.joins import cogroup_join_multi
    from ...stages.tokenizer import bpe_token_counts, bpe_train

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
        from ...functions.normalize import extract_all_matches
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
    from ..eval import roc_auc

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
    from ...stages.behavior import consecutive_pairs
    from ...stages.graph import local_clustering

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

    from ...functions.rayutil import collect_table
    from ...synth import generate_corpus
    from ..eval import blocking_rule_frontier, default_blocking_rules
    from ..linkage import run_linkage

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
    from ...functions.rayutil import bucketed_group_apply
    from ..eval import blocking_rule_frontier

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
        from ...functions.rayutil import segment_starts
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
    from ...stages.graph import pagerank_weighted

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
    from ...stages.behavior import touch_attribution

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

    from ...functions.rayutil import bucketed_group_apply, segment_starts

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

    from ...functions.rayutil import (bucketed_group_apply, global_topk,
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
    from ...stages.temporal import time_weighted_avg

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
    from ...stages.graph import pointer_jump_roots

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

    Oracle: the vec_id column is VALUE-EXACT (every embedding row gets
    exactly one projection — SELECT vec_id FROM embeddings), plus three
    engine-verified invariants of the fit emitted as booleans the SQL
    asserts TRUE: each projection has exactly 8 components, explained
    variance is non-increasing across components, and every component's
    projection mean is ~0 (PCA centers the data; |mean| < 1e-6 of the
    component's scale). The eigendecomposition itself is pinned in
    tests/test_ops.py (planted-axis recovery + determinism)."""
    from ray.data.aggregate import Count, Sum

    from ...stages.similarity import pca_fit_transform

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    comps, out = pca_fit_transform(emb, n_components=8)
    ev = comps.column("explained_var_e9").to_pylist()
    var_desc = all(a >= b for a, b in zip(ev, ev[1:]))

    def partial(t: pa.Table) -> pa.Table:
        proj = t.column("proj")
        if isinstance(proj, pa.ChunkedArray):
            proj = proj.combine_chunks()
        lens = np.asarray(pc.list_value_length(proj), dtype=np.int64)
        m = np.asarray(proj.values, dtype=np.float64).reshape(-1, 8) \
            if (lens == 8).all() and t.num_rows else np.zeros((0, 8))
        return pa.table({
            "g": pa.array([0], type=pa.int64()),
            "dims_ok": pa.array([int((lens == 8).all())]),
            "n": pa.array([t.num_rows], type=pa.int64()),
            "s": pa.array([m.sum(axis=0)], type=pa.list_(pa.float64())),
            "ss": pa.array([np.abs(m).sum(axis=0)],
                           type=pa.list_(pa.float64()))})

    agg = out.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    tot_s = np.zeros(8)
    tot_a = np.zeros(8)
    n_rows = 0
    dims_ok = True
    for b in agg.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for i in range(t.num_rows):
            tot_s += np.asarray(t.column("s")[i].values)
            tot_a += np.asarray(t.column("ss")[i].values)
            n_rows += t.column("n")[i].as_py()
            dims_ok &= bool(t.column("dims_ok")[i].as_py())
    centered = bool(np.all(np.abs(tot_s) <= 1e-6 * np.maximum(tot_a,
                                                              1.0)))
    return out.map_batches(
        lambda t, d=dims_ok, v=var_desc, c=centered: pa.table({
            "vec_id": t.column("vec_id"),
            "dims_ok": pa.array([d] * t.num_rows),
            "var_nonincreasing": pa.array([v] * t.num_rows),
            "centered_ok": pa.array([c] * t.num_rows)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_PCA_EMBEDDINGS = """
SELECT vec_id, TRUE AS dims_ok, TRUE AS var_nonincreasing,
       TRUE AS centered_ok
FROM embeddings
"""


def q_blb_ci_events(sf_dir: str):
    """Bag of Little Bootstraps 95% CI for the mean event value in cents
    (stages/selection.py::blb_mean_ci — Kleiner et al. 2012): disjoint
    hash subsets, per-subset multinomial(n, 1/b) replicates with
    subset-seeded deterministic rngs, subset-averaged CI.

    Oracle: n and the integer mean are VALUE-EXACT (the engine's own
    Sum/Count pass vs SQL HUGEINT floor division — the resampling can't
    touch them), and the CI itself is checked by its contract, emitted
    as booleans the SQL asserts TRUE: lo ≤ hi and the interval brackets
    the exact mean (a 95% CI around the full-data mean always contains
    it — the bootstrap distribution is centered there). Replicate-level
    determinism is pinned in tests/test_selection.py."""
    from ray.data.aggregate import Count, Sum

    from ...stages.selection import blb_mean_ci

    ev = _pq(sf_dir, "events", ["event_id", "value"])
    ints = ev.map_batches(
        lambda t: pa.table({"id": t.column("event_id"),
                            "v": _cents(t.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    ci = blb_mean_ci(ints, val_col="v", id_col="id")
    agg = ints.aggregate(Sum("v"), Count())
    s, n = int(agg["sum(v)"]), int(agg["count()"])
    mean_e9 = (s * 10**9) // n
    lo = ci.column("lo_e9")[0].as_py()
    hi = ci.column("hi_e9")[0].as_py()
    return pa.table({
        "n": pa.array([n], type=pa.int64()),
        "mean_e9": pa.array([mean_e9], type=pa.int64()),
        "lo_le_hi": pa.array([lo <= hi]),
        "ci_brackets_mean": pa.array([lo <= mean_e9 <= hi])})


SQL_BLB_CI_EVENTS = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS HUGEINT)
            * 1000000000 // COUNT(*) AS BIGINT) AS mean_e9,
       TRUE AS lo_le_hi, TRUE AS ci_brackets_mean
FROM events
"""


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

    from ...config import DEFAULT_CONFIG as CFG
    from ...functions.rayutil import get_broadcast
    from ...stages.clustering import connected_components_codes
    from ...stages.pairs import greedy_one_to_one
    from ...stages.strjoin import string_sim_self_join

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
    from ...functions.rayutil import collect_table
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


