"""Registry segment: auto-split from pipelines/queries.py (round 5).
Shared helpers in ._common; the public dicts live in pipelines.queries."""
from ._common import *  # noqa: F401,F403


def q_exact_dedup_documents(sf_dir: str):
    from ...stages.dedup import exact_dedup
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
    from ...functions.rayutil import bucketed_group_apply, segment_starts

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
    from ...stages.simjoin import similarity_self_join
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
    from ...stages.simjoin import containment_self_join
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
    from ...stages.simjoin import similarity_cross_join

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
    """MinHash/LSH near-dedup over documents. Oracle (round 5): the
    record_id column is VALUE-EXACT vs the documents id set, plus the
    shared min-id clustering invariants (_cluster_check_view) asserted
    TRUE by the SQL; the LSH/verify semantics are pinned in tests vs
    the DuckDB Jaccard cross-check."""
    from ...stages.dedup import near_dedup_minhash
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return _cluster_check_view(near_dedup_minhash(
        ds, id_col="doc_id", text_col="text", cfg=CFG, threshold=0.7))


SQL_DEDUP_CLUSTER_CHECK_DOCUMENTS = """
SELECT CAST(doc_id AS VARCHAR) AS record_id, TRUE AS cluster_le_ok,
       TRUE AS root_self_ok
FROM documents
"""

SQL_DEDUP_CLUSTER_CHECK_EMBEDDINGS = """
SELECT CAST(vec_id AS VARCHAR) AS record_id, TRUE AS cluster_le_ok,
       TRUE AS root_self_ok
FROM embeddings
"""


def q_simhash_documents(sf_dir: str):
    """64-bit SimHash per document. Oracle: doc_id VALUE-EXACT (one
    hash per document) + non-null flag; hash semantics (chunk blocks,
    hamming) pinned in tests."""
    from ...stages.dedup import SimHashStage
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(SimHashStage("text"), batch_format="pyarrow",
                          zero_copy_batch=True).map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "simhash_ok": pc.is_valid(t.column("simhash"))}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_SIMHASH_DOCUMENTS = """
SELECT doc_id, TRUE AS simhash_ok FROM documents
"""


def q_simhash_dedup_documents(sf_dir: str):
    """SimHash near-dedup (hamming ≤ 3 via 16-bit chunk pigeonhole
    blocking). Oracle: record_id VALUE-EXACT + shared min-id clustering
    invariants (_cluster_check_view)."""
    from ...stages.dedup import near_dedup_simhash
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return _cluster_check_view(near_dedup_simhash(
        ds, id_col="doc_id", text_col="text"))


def q_embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-dup via sign-LSH buckets. Oracle:
    record_id VALUE-EXACT vs embeddings + shared min-id clustering
    invariants (_cluster_check_view)."""
    from ...stages.similarity import embedding_near_dup
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return _cluster_check_view(embedding_near_dup(
        ds, threshold=0.99, n_planes=6))


def q_knn_graph_embeddings(sf_dir: str):
    """EXACT kNN graph (every row's top-5 cosine neighbors) — the primitive
    under SemDeDup/diversity curation, in its auditable brute-force form.
    VALUE-EXACT ranking incl. k-boundary ties: integer-quantized components
    make dot/norms exact, cos = dot/sqrt(na*nb) is one exact-input IEEE
    sqrt+divide, identical in numpy and DuckDB
    (stages/similarity.py::knn_graph_exact)."""
    from ...stages.similarity import knn_graph_exact
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
    per-row top-k merge). Recall vs the exact graph pinned >= 0.9 in tests
    on clustered fixtures (stages/similarity.py::knn_graph_ivf).

    Structural oracle: every vector's home cell + probes yield ≥ k
    candidates on this data (deterministic), so the (vec_id, rank 1..5)
    grid is VALUE-EXACT with a per-row non-null neighbor boolean."""
    from ...stages.similarity import knn_graph_ivf
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_graph_ivf(ds, k=5, n_cells=16, nprobe=4)
    return _topk_grid_view(out, qid_col="vec_id", nid_col="neighbor_id")


def q_pq_encode_embeddings(sf_dir: str):
    """Product-quantize the embedding column: 64-dim float32 -> 8 uint8
    codes (32x compression; Jegou et al. TPAMI'11). Codebooks train on a
    seeded driver-side sample, ship once; encode is one stateless
    map_batches. Oracle: vec_id VALUE-EXACT (every row encodes) + a
    per-row boolean asserting the code is 8 valid uint8 entries; the
    codebook quality (reconstruction error, recall) is pinned in pytest
    (stages/pq.py) — k-means itself is not SQL-expressible."""
    from ...stages.pq import pq_encode, pq_train
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = pq_train(ds, m=8, n_codes=256, sample_size=2048, seed=42)
    return pq_encode(ds, books).map_batches(
        lambda t: pa.table({
            "vec_id": t.column("vec_id"),
            "code_ok": pc.and_(
                pc.is_valid(t.column("code")),
                pc.equal(pc.list_value_length(t.column("code")), 8))}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_PQ_ENCODE_EMBEDDINGS = """
SELECT vec_id, TRUE AS code_ok FROM embeddings
"""


def q_pq_ann_topk_embeddings(sf_dir: str):
    """ANN over PQ codes via asymmetric distance computation — search
    WITHOUT decompression: per query one (m, n_codes) table, per batch m
    uint8 gathers + a sum. Top-10 for the 5 lowest vec_ids.

    Structural oracle: ADC scans every row, so each query returns a
    FULL contiguous top-10 — the (query_id, rank) grid is VALUE-EXACT
    (5 lowest vec_ids × ranks 1..10 in SQL) with a per-row non-null
    neighbor boolean; which neighbors fill the grid is the approximate
    part, pinned by the shortlist-recall tests on clustered fixtures
    (stages/pq.py::pq_ann_topk)."""
    from ...functions.rayutil import global_topk
    from ...stages.pq import pq_ann_topk, pq_encode, pq_train
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = pq_train(ds, m=8, n_codes=256, sample_size=2048, seed=42)
    enc = pq_encode(ds, books)
    qt = global_topk(ds, [("vec_id", "ascending")], 5)
    queries = {"ids": qt.column("vec_id").to_numpy().astype(np.int64),
               "vecs": np.stack([np.asarray(v, dtype=np.float64)
                                 for v in qt.column("embedding").to_pylist()])}
    out = pq_ann_topk(enc, queries, books, k=10)
    return _topk_grid_view(out)


def q_ivfpq_ann_topk_embeddings(sf_dir: str):
    """IVF-PQ ANN (the canonical billion-scale index: coarse cells + PQ on
    residuals, ADC within probed cells — Jegou et al. TPAMI'11 SectionV).
    Top-10 for the 5 lowest vec_ids at nprobe=4.

    Structural oracle: the (query_id, rank) grid is VALUE-EXACT (the
    probed cells hold ≥ k rows on this data at every sf — deterministic,
    so the grid is stable) + per-row non-null neighbor boolean; the
    neighbor quality is pinned by the shortlist-recall tests
    (stages/pq.py::ivfpq_build/ivfpq_ann_topk)."""
    from ...functions.rayutil import global_topk
    from ...stages.pq import ivfpq_ann_topk, ivfpq_build
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    enc, index = ivfpq_build(ds, n_cells=16, m=8, n_codes=256,
                             sample_size=2048, seed=42)
    qt = global_topk(ds, [("vec_id", "ascending")], 5)
    queries = {"ids": qt.column("vec_id").to_numpy().astype(np.int64),
               "vecs": np.stack([np.asarray(v, dtype=np.float64)
                                 for v in qt.column("embedding").to_pylist()])}
    out = ivfpq_ann_topk(enc, queries, index, k=10, nprobe=4)
    return _topk_grid_view(out)


def q_cosine_pairs_embeddings(sf_dir: str):
    """Exact cosine-threshold all-pairs join (the exact baseline companion
    to the LSH near-dup scale path). VALUE-EXACT: components quantized to
    integers, dot/norms exact in float64, threshold evaluated as the same
    left-associated expression the SQL twin uses
    (stages/similarity.py::cosine_pairs_exact)."""
    from ...stages.similarity import cosine_pairs_exact
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
    from ...stages.strjoin import string_sim_self_join
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
    from ...stages.strjoin import string_sim_self_join
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
    from ...stages.similarity import ann_topk
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    from ...functions.rayutil import global_topk
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

