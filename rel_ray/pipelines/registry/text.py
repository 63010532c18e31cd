"""Registry segment: auto-split from pipelines/queries.py (round 5).
Shared helpers in ._common; the public dicts live in pipelines.queries."""
from ._common import *  # noqa: F401,F403


def q_ann_topk_lsh_embeddings(sf_dir: str):
    """Scale-path ANN: sign-LSH bucketed search. Structural oracle:
    the (query_id, rank 1..10) grid is VALUE-EXACT (the multi-table
    bucket union holds ≥ k candidates on this data, deterministically)
    with a per-row non-null neighbor boolean; recall is the traded
    quantity and is pinned on clustered fixtures in tests."""
    from ...stages.similarity import ann_topk_lsh
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    from ...functions.rayutil import global_topk
    qt = global_topk(ds, [("vec_id", "ascending")], 5)
    queries = {"ids": qt.column("vec_id").to_numpy().astype(np.int64),
               "vecs": np.stack([np.asarray(v, dtype=np.float64)
                                 for v in qt.column("embedding").to_pylist()])}
    return _topk_grid_view(ann_topk_lsh(ds, queries, k=10))


def q_ann_topk_ivf_embeddings(sf_dir: str):
    """IVF ANN: spherical-kmeans cells + nprobe probing. Structural
    oracle: the (query_id, rank 1..10) grid is VALUE-EXACT with a
    per-row non-null neighbor boolean; recall (the lossy part) is
    pinned ≥ 0.9 on clustered fixtures in tests."""
    from ...stages.similarity import ann_topk_ivf
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    from ...functions.rayutil import global_topk
    qt = global_topk(ds, [("vec_id", "ascending")], 5)
    queries = {"ids": qt.column("vec_id").to_numpy().astype(np.int64),
               "vecs": np.stack([np.asarray(v, dtype=np.float64)
                                 for v in qt.column("embedding").to_pylist()])}
    return _topk_grid_view(ann_topk_ivf(ds, queries, k=10, n_cells=32,
                                        nprobe=6))


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means over the full embedding table
    (stages/similarity.py::kmeans): per-iteration streaming pass emitting
    O(k x dim) partial sums per batch, maximin deterministic init. Output:
    (vec_id, cluster) assignments. Oracle: vec_id VALUE-EXACT (every
    row is assigned) + cluster ∈ [0, 16) per row; blob recovery,
    inertia monotonicity and determinism are pinned in
    tests/test_ops.py::test_kmeans_recovers_blobs (the iteration is
    not SQL-expressible)."""
    from ...stages.similarity import kmeans

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    assigns, _C, _inertia = kmeans(ds, n_clusters=16, iters=5)
    return assigns.map_batches(
        lambda t: pa.table({
            "vec_id": t.column("vec_id"),
            "cluster_in_range": pc.and_(
                pc.greater_equal(t.column("cluster"), 0),
                pc.less(t.column("cluster"), 16))}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_KMEANS_EMBEDDINGS = """
SELECT vec_id, TRUE AS cluster_in_range FROM embeddings
"""



def q_label_centroids_embeddings(sf_dir: str):
    """Per-label embedding centroid (integer-exact partial sums; combiner
    → tiny merge groupby — the vectors never shuffle)."""
    from ...stages.similarity import grouped_centroids
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
    (near-dup train/test contamination).

    Oracle: record_id VALUE-EXACT (every doc assigned exactly once) +
    two engine-verified invariants asserted TRUE by the SQL: the split
    label is one of train/val/test, and NO near-dup cluster straddles
    splits — checked distributedly by comparing the distinct
    cluster count against the distinct (cluster, split) count."""
    from ...functions.shingles import string_hash_u64
    from ...stages.dedup import near_dedup_minhash

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    clusters = near_dedup_minhash(ds, id_col="doc_id", text_col="text",
                                  cfg=CFG, threshold=0.7)

    def split(t: pa.Table) -> pa.Table:
        h = np.asarray(string_hash_u64(t.column("cluster_id"))) % np.uint64(10)
        lab = np.where(h < 8, "train", np.where(h == 8, "val", "test"))
        return pa.table({"record_id": t.column("record_id"),
                         "cluster_id": t.column("cluster_id"),
                         "split": pa.array(lab, type=pa.string())})

    out = clusters.map_batches(split, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    n_clusters = out.groupby("cluster_id").count().count()
    n_pairs = out.groupby(["cluster_id", "split"]).count().count()
    no_straddle = n_clusters == n_pairs
    return out.map_batches(
        lambda t, ns=no_straddle: pa.table({
            "record_id": t.column("record_id"),
            "split_valid": pc.is_in(
                t.column("split"),
                value_set=pa.array(["train", "val", "test"])),
            "no_cluster_straddle": pa.array([ns] * t.num_rows)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_LEAKAGE_SAFE_SPLIT_DOCUMENTS = """
SELECT CAST(doc_id AS VARCHAR) AS record_id, TRUE AS split_valid,
       TRUE AS no_cluster_straddle
FROM documents
"""


def q_normalize_documents(sf_dir: str):
    from ...functions.normalize import simple_normalize
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
    from ...functions.normalize import token_counts
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
    from ...stages.inference import quality_classifier

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
    zero-copy byte tokens from the Arrow buffers. Oracle: doc_id
    VALUE-EXACT (one embedding per document) + a per-row boolean
    asserting every component is finite; the float embeddings
    themselves have no SQL equivalent — determinism and
    batch-invariance are pinned in tests/test_inference.py."""
    from ...stages.inference import gru_encode

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def embed(t: pa.Table) -> pa.Table:
        emb = gru_encode(t.column("text"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "emb_finite": pa.array(np.isfinite(emb).all(axis=1)),
        })

    return ds.map_batches(embed, batch_format="pyarrow", zero_copy_batch=True)


SQL_GRU_EMBED_DOCUMENTS = """
SELECT doc_id, TRUE AS emb_finite FROM documents
"""


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
    from ...stages.textstats import lang_id
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
    """Winnowing fingerprint count + order-sensitive doc hash. Oracle:
    doc_id VALUE-EXACT (one fingerprint row per document) + per-row
    boolean asserting a valid non-null doc hash and a non-negative
    fingerprint count bounded by the text length (a winnow emits at
    most one print per position); hash/winnow semantics are pinned in
    tests."""
    from ...stages.textstats import fingerprint_winnow, rolling_text_hash
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        prints = fingerprint_winnow(text)
        nfp = pc.cast(pc.list_value_length(prints), pa.int64())
        ok = pc.and_(pc.is_valid(rolling_text_hash(text)),
                     pc.and_(pc.greater_equal(nfp, 0),
                             pc.less_equal(nfp, pc.cast(
                                 pc.utf8_length(text), pa.int64()))))
        return pa.table({"doc_id": t.column("doc_id"),
                         "fp_ok": ok})

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


SQL_FINGERPRINT_DOCUMENTS = """
SELECT doc_id, TRUE AS fp_ok FROM documents
"""


def q_textstats_documents(sf_dir: str):
    """Full text-analysis column set. The float columns are single IEEE-754
    double operations over integer counts (divisions, *4.0, min, +, /3.0),
    which numpy and DuckDB round identically — so the oracle is VALUE-EXACT.
    doc_hash (splitmix-chained, not SQL-expressible) is excluded here; it is
    exercised by fingerprint_documents."""
    from ...stages.textstats import TextStats
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
    """Multimodal decode + frame-sample over REAL encoded payloads: the
    media parquet carries actual 24-bit BMP / baseline JPEG images and
    16-bit PCM WAV tones, decoded by the pure-numpy codecs
    (stages/multimodal + stages/jpeg — known-answer pinned in
    tests/test_ops.py). Written once per sf_dir under /tmp, then
    read_parquet → actor-pool decode (small batches for binary
    payloads) → per-frame explode by duration metadata.

    Oracle: (media_id, kind) are VALUE-EXACT — the deterministic
    generator's id grid and even/odd kind rule are plain SQL — plus two
    per-row contract booleans asserted TRUE: every decoded feature mean
    lies in [0, 1] and the frame count is non-negative. The decoded
    pixel/sample values are pinned by the codec known-answer tests."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from ...stages.multimodal import (decode_stage, frame_sample_stage,
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

    from ...functions.rayutil import collect_table, dict_lookup, get_broadcast_dict
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
                               zero_copy_batch=True).map_batches(
        lambda t: pa.table({
            "media_id": t.column("media_id"),
            "kind": t.column("kind"),
            "feat_mean_in_01": pc.and_(
                pc.greater_equal(t.column("feat_mean"), 0.0),
                pc.less_equal(t.column("feat_mean"), 1.0)),
            "n_frames_nonneg": pc.greater_equal(t.column("n_frames"),
                                                0)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_MULTIMODAL_FEATURES = """
SELECT CAST(r AS BIGINT) AS media_id,
       CASE WHEN r % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
       TRUE AS feat_mean_in_01, TRUE AS n_frames_nonneg
FROM range(256) t(r)
"""


# ---------------------------------------------------------------------------
# the flagship linkage pipeline over a transcripts-shaped table derived
# deterministically from the events table (BASELINE.json:input_hint shape)
# ---------------------------------------------------------------------------

