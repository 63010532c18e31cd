"""Registry segment: auto-split from pipelines/queries.py (round 5).
Shared helpers in ._common; the public dicts live in pipelines.queries."""
from ._common import *  # noqa: F401,F403
from .flagship import transcripts_from_events  # noqa: F401
from .text import _lang_sql  # noqa: F401


def q_customers_with_big_events(sf_dir: str):
    """Bloom-prefiltered semi join (stages/joins.py::bloom_semi_anti):
    customers with any event of value > 200 — the Bloom probe (no false
    negatives) shrinks the exact semi-join exchange from |customers| to
    ~|matches|, broadcasting m/8 bytes instead of the key set. EXACT
    result; value-hash-checked against the EXISTS oracle."""
    from ...stages.joins import bloom_semi_anti

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

    from ...stages.joins import broadcast_inner_join
    from ...functions.rayutil import collect_table

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
    from ...stages.sampling import stratified_sample

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
    from ...functions.rayutil import bucketed_group_apply, segment_starts

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
    from ...functions.rayutil import collect_table
    from ...stages.sketches import grouped_approx_distinct

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
    from ...stages.selection import percentile_rank

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
    from ...stages.temporal import grouped_collect_set

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
    from ...stages.selection import quantile_bucketize

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
    from ...stages.rollup import unpivot

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
    from ...stages.packing import chunk_documents

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
    from ...stages.cleaning import scrub_pii

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
    from ...stages.retrieval import tfidf_topk

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
    from ...stages.retrieval import bm25_topk

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
    from ...stages.sampling import bottomk_sample

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
    from ...stages.dedup import dup_passages

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
    from ...stages.dedup import flag_contaminated

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

    Oracle: the exact-heavy-hitter COUNT is VALUE-EXACT (the
    heavy_hitters_exact SQL twin's HAVING cnt·64 > N subquery), and the
    two Misra-Gries GUARANTEES are verified engine-side against the
    exact recount and emitted as booleans the SQL asserts TRUE: no lost
    heavy hitter (every exact φ=1/64 heavy hitter's hash appears among
    the ≤64 MG candidates) and the bound est ≤ true ≤ est + max_err
    for each of them."""
    from ...functions.shingles import string_hash_u64
    from ...stages.sketches import heavy_hitter_terms, heavy_hitters_exact

    ds = _pq(sf_dir, "documents", ["text"])
    mg = heavy_hitter_terms(ds, text_col="text", k=64)
    exact = heavy_hitters_exact(_pq(sf_dir, "documents", ["text"]),
                                text_col="text", k=64)
    mg_map = dict(zip(mg.column("token_hash").to_pylist(),
                      zip(mg.column("est_count").to_pylist(),
                          mg.column("max_err").to_pylist())))
    toks = exact.column("token")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    hashes = (np.asarray(string_hash_u64(toks), dtype=np.uint64)
              if exact.num_rows else np.empty(0, dtype=np.uint64))
    all_found = True
    bounds_ok = True
    for h, cnt in zip(hashes.tolist(), exact.column("cnt").to_pylist()):
        e = mg_map.get(h)
        if e is None:
            all_found = False
            continue
        est, err = e
        bounds_ok &= est <= cnt <= est + err
    return pa.table({
        "n_exact_hh": pa.array([exact.num_rows], type=pa.int64()),
        "all_hh_found": pa.array([all_found]),
        "bounds_ok": pa.array([bounds_ok])})


SQL_HEAVY_HITTERS_DOCUMENTS = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS token FROM documents
), tot AS (SELECT count(*) AS n FROM toks)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_hh, TRUE AS all_hh_found,
       TRUE AS bounds_ok
FROM (SELECT token FROM toks, tot GROUP BY token, tot.n
      HAVING count(*) * 64 > tot.n)
"""


def q_cms_heavy_hitters_documents(sf_dir: str):
    """Composed sketch pipeline: Misra-Gries finds WHICH tokens are frequent
    (lower bounds), a Count-Min sketch answers point queries (upper bounds)
    — together each heavy hitter gets a [mg_lower, cms_upper] interval that
    provably brackets the true count. Both sketches are one streaming pass
    each with O(k) / O(depth x width) state per batch; nothing shuffles.

    Oracle: the exact φ=1/64 heavy-hitter COUNT is VALUE-EXACT (the
    heavy_hitters_exact SQL subquery) and the composed bracket guarantee
    is verified engine-side against the exact recount, emitted as a
    boolean the SQL asserts TRUE: mg_lower ≤ true count ≤ cms_upper for
    every exact heavy hitter. Per-sketch guarantees also pinned in
    tests (test_misra_gries_bounds, test_count_min_guarantees)."""
    from ...functions.shingles import string_hash_u64
    from ...stages.sketches import (cms_query, count_min_terms,
                                    heavy_hitter_terms,
                                    heavy_hitters_exact)

    ds = _pq(sf_dir, "documents", ["text"])
    hh = heavy_hitter_terms(ds, text_col="text", k=64)
    sketch = count_min_terms(_pq(sf_dir, "documents", ["text"]),
                             text_col="text", depth=4, width=4096)
    exact = heavy_hitters_exact(_pq(sf_dir, "documents", ["text"]),
                                text_col="text", k=64)
    lower = dict(zip(hh.column("token_hash").to_pylist(),
                     hh.column("est_count").to_pylist()))
    toks = exact.column("token")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    hashes = (np.asarray(string_hash_u64(toks), dtype=np.uint64)
              if exact.num_rows else np.empty(0, dtype=np.uint64))
    uppers = cms_query(sketch, hashes)
    brackets_ok = all(
        lower.get(h, 0) <= cnt <= up
        for h, cnt, up in zip(hashes.tolist(),
                              exact.column("cnt").to_pylist(),
                              uppers.astype("int64").tolist()))
    return pa.table({
        "n_exact_hh": pa.array([exact.num_rows], type=pa.int64()),
        "brackets_ok": pa.array([bool(brackets_ok)])})


SQL_CMS_HEAVY_HITTERS_DOCUMENTS = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS token FROM documents
), tot AS (SELECT count(*) AS n FROM toks)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_hh, TRUE AS brackets_ok
FROM (SELECT token FROM toks, tot GROUP BY token, tot.n
      HAVING count(*) * 64 > tot.n)
"""



def q_decontaminate_bloom_documents(sf_dir: str):
    """Bloom-filter decontamination (stages/sketches.py::bloom_decontaminate):
    same benchmark split as decontaminate_documents but the benchmark gram
    set is a 10-bits/gram Bloom sketch (OR-merged per-batch partials,
    broadcast once) instead of the exact gram array — the 100-TB path when
    the held-out side is itself large.

    Oracle: doc_id VALUE-EXACT (the corpus split is doc_id %% 50 <> 0 —
    plain SQL) + the Bloom guarantee verified per row against the
    engine's EXACT decontamination pass (flag_contaminated, itself
    value-hash-exact in decontaminate_documents): no false negatives —
    every exactly-contaminated doc is Bloom-flagged; false positives
    are allowed (probabilistic by design), so the emitted boolean is
    NOT(exact AND NOT bloom)."""
    from ...stages.joins import cogroup_join_multi
    from ...stages.dedup import flag_contaminated
    from ...stages.sketches import bloom_decontaminate

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
                                  text_col="text").map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "bloom": t.column("contaminated")}),
        batch_format="pyarrow", zero_copy_batch=True)
    exact = flag_contaminated(corpus, bench, id_col="doc_id",
                              text_col="text").map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "exact": t.column("contaminated")}),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = cogroup_join_multi(
        flagged, exact, key="doc_id", left_cols=["bloom"],
        right_cols=["exact"],
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("bloom", pa.bool_())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("exact", pa.bool_())]))
    return joined.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "no_false_negative": pc.or_(
                t.column("bloom"),
                pc.invert(t.column("exact")))}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_DECONTAMINATE_BLOOM_DOCUMENTS = """
SELECT doc_id, TRUE AS no_false_negative
FROM documents WHERE doc_id % 50 <> 0
"""


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
    from ...stages.dedup import ngram_repetition

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
    from ...stages.dedup import dup_ratio

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
    from ...stages.dedup import drop_high_dup_ratio

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
    from ...stages.sketches import heavy_hitters_exact

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
    components (stages/similarity.py::semantic_dedup). Oracle (round
    5): record_id VALUE-EXACT vs the embeddings id set + the shared
    min-id clustering invariants (_cluster_check_view); planted-
    duplicate recovery and the LSH-path equivalence on verified pairs
    are pinned in tests."""
    from ...stages.similarity import semantic_dedup

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return _cluster_check_view(semantic_dedup(
        ds, threshold=0.99, n_clusters=8, iters=4))


def q_fellegi_sunter_transcripts(sf_dir: str):
    """UNSUPERVISED Fellegi-Sunter m/u/lambda estimation via EM over the
    flagship's blocking candidates (pipelines/eval.py::fellegi_sunter_em;
    Fellegi & Sunter 1969, Winkler 1988 — the Splink-style ER parameter
    learner, the unsupervised sibling of train_pair_scorer). The JW gate is
    disabled (threshold=0) so the sim features are ungated; EM's only
    distributed work is ONE pattern-count pass.

    Oracle: the (feature, level) row grid is VALUE-EXACT (3 features ×
    5 levels — a SQL VALUES cross join), plus engine-verified model
    invariants asserted TRUE by the SQL: every m/u probability in
    (0, 1], each feature's m and u distributions sum to 1 (1e-9
    tolerance), and λ ∈ (0, 1). The fitted values (float fixpoint) are
    pinned by the planted-mixture recovery test."""
    import dataclasses

    from ..eval import fellegi_sunter_em
    from ..linkage import run_linkage

    ungated = dataclasses.replace(CFG, threshold=0.0)
    out = run_linkage(transcripts_from_events(sf_dir), ungated)
    fit = fellegi_sunter_em(
        out["edges"], feature_cols=("sim_jaccard", "sim_jw", "sim_emb"),
        cuts=(0.3, 0.5, 0.7, 0.9))
    m = np.asarray(fit.column("m_prob"), dtype=np.float64)
    u = np.asarray(fit.column("u_prob"), dtype=np.float64)
    feats = fit.column("feature").to_pylist()
    in_range = bool(((m > 0) & (m <= 1) & (u > 0) & (u <= 1)).all())
    sums_ok = True
    for f in set(feats):
        sel = np.array([x == f for x in feats])
        sums_ok &= abs(m[sel].sum() - 1.0) < 1e-9
        sums_ok &= abs(u[sel].sum() - 1.0) < 1e-9
    lam = fit.column("lambda_match")[0].as_py()
    return pa.table({
        "feature": fit.column("feature"), "level": fit.column("level"),
        "probs_in_range": pa.array([in_range] * fit.num_rows),
        "dists_sum_to_one": pa.array([bool(sums_ok)] * fit.num_rows),
        "lambda_in_01": pa.array([bool(0.0 < lam < 1.0)]
                                 * fit.num_rows)})


SQL_FELLEGI_SUNTER_TRANSCRIPTS = """
SELECT f AS feature, CAST(l AS BIGINT) AS level, TRUE AS probs_in_range,
       TRUE AS dists_sum_to_one, TRUE AS lambda_in_01
FROM (VALUES ('sim_jaccard'), ('sim_jw'), ('sim_emb')) t(f)
CROSS JOIN range(5) r(l)
"""


def q_linkage_em_transcripts(sf_dir: str):
    """END-TO-END UNSUPERVISED linkage: the flagship pipeline with the
    match decision LEARNED by Fellegi-Sunter EM instead of the fixed
    weighted-score threshold (run_linkage's ``match_rule`` seam +
    eval.fs_match_rule — fit is one pattern-count pass over the candidate
    edges, decision is a posterior pattern filter).

    Oracle: same as linkage_clusters — the record universe is
    SQL-derivable, so record_id is VALUE-EXACT plus the shared min-id
    clustering invariants; the EM decision quality is gated by
    tests/test_pipeline.py::test_fs_em_match_rule_f1_gate
    (F1 ≥ 0.98, precision ≥ 0.999)."""
    import dataclasses

    from ..eval import fs_match_rule
    from ..linkage import run_linkage

    ungated = dataclasses.replace(CFG, threshold=0.0)
    out = run_linkage(transcripts_from_events(sf_dir), ungated,
                      match_rule=fs_match_rule())
    return _cluster_check_view(out["clusters"].map_batches(
        lambda t: t.select(["record_id", "cluster_id"]),
        batch_format="pyarrow", zero_copy_batch=True))


def q_fs_review_pairs_transcripts(sf_dir: str):
    """Clerical-review queue (pipelines/eval.py::fs_review_pairs): FS-EM
    posterior in the ambiguous band, deterministic bottom-k-by-hash sample
    with posterior_e6 + feature columns — the Fellegi-Sunter 1969 third
    region / Splink review export.

    Identity oracle (the EM fixpoint and the LSH pair set are not
    SQL-derivable): one emitted row of booleans the SQL asserts TRUE —
    every queued pair's posterior lies inside the requested band
    (e6-scaled), the queue respects the k cap, and ids are canonical
    (id_a < id_b). Queue determinism is pinned in tests."""
    import dataclasses

    from ..eval import fs_review_pairs
    from ..linkage import run_linkage

    ungated = dataclasses.replace(CFG, threshold=0.0)
    out = run_linkage(transcripts_from_events(sf_dir), ungated)
    q = fs_review_pairs(out["edges"], band=(0.02, 0.98), k=100)
    post = np.asarray(q.column("posterior_e6"), dtype=np.int64)
    in_band = bool(((post >= 20_000) & (post <= 980_000)).all())
    ordered = bool(pc.all(pc.less(q.column("id_a"),
                                  q.column("id_b"))).as_py()
                   if q.num_rows else True)
    return pa.table({
        "in_band": pa.array([in_band]),
        "k_capped": pa.array([q.num_rows <= 100]),
        "ids_ordered_ok": pa.array([ordered])})


SQL_FS_REVIEW_PAIRS_TRANSCRIPTS = """
SELECT TRUE AS in_band, TRUE AS k_capped, TRUE AS ids_ordered_ok
"""


def q_agreement_lang_id_documents(sf_dir: str):
    """Partition-agreement eval of the lang-ID classifier: B-cubed P/R/F1
    (Bagga & Baldwin '98, THE standard entity-resolution cluster metric)
    and Adjusted Rand Index between the predicted-language partition of
    documents and the labeled `lang` partition — one all-integer row
    (pipelines/eval.py::partition_agreement), bit-exact vs SQL including
    the floor/truncation conventions."""
    from ...stages.textstats import lang_id
    from ..eval import partition_agreement

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

    from ...functions.rayutil import collect_table
    from ...stages.joins import broadcast_semi_anti, cogroup_inner_join

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
    from ...functions.rayutil import global_topk
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
    from ...functions.normalize import token_counts
    from ...functions.rayutil import grouped_min
    from ...stages.dedup import flag_contaminated
    from ...stages.packing import chunk_documents
    from ...stages.textstats import lang_id

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

