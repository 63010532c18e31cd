"""Registry segment: auto-split from pipelines/queries.py (round 5).
Shared helpers in ._common; the public dicts live in pipelines.queries."""
from ._common import *  # noqa: F401,F403
from .flagship import transcripts_from_events  # noqa: F401


def q_mutual_info_events(sf_dir: str):
    """Mutual information between event_type and hour-of-day — the
    information-theoretic association measure next to chi2_events'
    significance test. Counts exact via the same joint groupby; MI =
    Σ (o/n)·ln(o·n/(r·c)) over non-zero cells, quantized to 1e-9 after
    the sum (the entropy-oracle idiom — ≤ type×hour cells, f64 error
    ~1e-15 against the grid). One row (n, mi_e9)."""
    from ray.data.aggregate import Count

    from ...functions.rayutil import collect_table

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

    from ...functions.rayutil import collect_table

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
    from ...stages.retrieval import ctfidf_topk

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

    from ..eval import fs_explain_pairs
    from ..linkage import run_linkage

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
    the int-coded CC fast path, cluster attach by broadcast.

    Oracle: the distinct-edge count is VALUE-EXACT (SQL reproduces the
    consecutive-pair derivation with a lag window), and the bridge SET
    is verified against an independent naive driver Tarjan over the
    collected deduped edge list (fixture-scale only — bounded by the
    distinct user-adjacency pairs, not the events), emitted as one
    boolean the SQL asserts TRUE. Bridge semantics also pinned on hand
    graphs (path/cycle/barbell) in tests/test_behavior.py."""
    import ray as _ray

    from ...config import DEFAULT_CONFIG as CFG
    from ...functions.rayutil import get_broadcast
    from ...stages.behavior import consecutive_pairs
    from ...stages.clustering import bridge_edges, connected_components_codes

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
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    got = bridge_edges(dedup)

    from ...functions.rayutil import collect_table
    et = collect_table(dedup, pa.schema([
        ("cluster_id", pa.int64()), ("id_a", pa.int64()),
        ("id_b", pa.int64())]))
    n_edges = et.num_rows
    # naive iterative Tarjan bridge-finding over the collected edges
    adj: dict = {}
    for a, b in zip(et.column("id_a").to_pylist(),
                    et.column("id_b").to_pylist()):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    disc: dict = {}
    low: dict = {}
    want: set = set()
    timer = [0]
    for root in adj:
        if root in disc:
            continue
        stack = [(root, None, iter(adj[root]))]
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        skipped = {root: False}
        while stack:
            v, parent, it = stack[-1]
            adv = False
            for w in it:
                if w == parent and not skipped[v]:
                    skipped[v] = True  # one parent edge only (multi-
                    continue           # edges were deduped upstream)
                if w in disc:
                    low[v] = min(low[v], disc[w])
                else:
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    skipped[w] = False
                    stack.append((w, v, iter(adj[w])))
                    adv = True
                    break
            if not adv:
                stack.pop()
                if parent is not None:
                    low[parent] = min(low[parent], low[v])
                    if low[v] > disc[parent]:
                        want.add((min(parent, v), max(parent, v)))
    gt = collect_table(got, pa.schema([
        ("cluster_id", pa.int64()), ("id_a", pa.int64()),
        ("id_b", pa.int64())]))
    have = set(zip(gt.column("id_a").to_pylist(),
                   gt.column("id_b").to_pylist()))
    return pa.table({
        "n_edges": pa.array([n_edges], type=pa.int64()),
        "bridges_match_naive": pa.array([have == want])})


SQL_BRIDGE_EDGES_EVENTS = """
WITH seq AS (
  SELECT user_id,
         lag(user_id) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS prev
  FROM events),
e AS (
  SELECT LEAST(prev, user_id) AS a, GREATEST(prev, user_id) AS b
  FROM seq WHERE prev IS NOT NULL AND prev <> user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges, TRUE AS bridges_match_naive
FROM (SELECT DISTINCT a, b FROM e)
"""


def q_spearman_lineitem(sf_dir: str):
    """Spearman rank correlation of quantity vs extendedprice (dollars)
    with exact average-rank ties (stages/selection.py::spearman): two
    distinct-value groupbys feed broadcast rank maps at 2× integer scale,
    one combiner pass sums integer co-moments, and only the final rho is
    float — one fixed-shape f64 expression over six integer sums (the
    grouped_corr idiom), hash-exact vs the window twin."""
    from ...stages.selection import spearman

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

    from ...functions.rayutil import collect_table

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
    from ...stages.temporal import scd2_intervals

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
    from ...stages.temporal import longest_streak

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
    from ...stages.temporal import cumulative_distinct

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

    from ...functions.rayutil import collect_table

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
    from ..eval import isotonic_fit

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

    from ...functions.rayutil import get_broadcast
    from ...stages.swoosh import match_merge

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
    from ...stages.joins import cogroup_join_multi
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
    from ...functions.rayutil import collect_table
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
    from ...stages.graph import hits

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
    from ...stages.behavior import market_basket_pairs

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
    from ...stages.temporal import forward_fill

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
    from ...stages.behavior import consecutive_pairs
    from ...stages.graph import assortativity

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
    from ..eval import average_precision

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
    from ..eval import calibration_bins

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
    from ...functions.rayutil import collect_table
    from ..eval import expected_calibration_error

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


