"""Similarity search over embedding columns (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every ``map_batches`` task reads the same object-store copy
(never re-shipped per batch); each batch does one numpy matmul and emits only
its local top-k per query, so the final groupby-top-k reduce sees
O(k · num_batches) rows, not the full score matrix.

Scale path: sign-LSH bucketing (random hyperplanes) — candidates share a
bucket with the query; brute-force within buckets only.

Embedding cosine near-dup: same machinery, pairs within buckets with
cosine ≥ τ → connected components.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..config import DEFAULT_CONFIG, PipelineConfig
from .clustering import connected_components


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    e = batch.column(col)
    if isinstance(e, pa.ChunkedArray):
        e = e.combine_chunks()
    vals = np.asarray(e.values, dtype=np.float64)
    n = len(e)
    return vals.reshape(n, -1)


def _l2_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BatchTopK:
    """Actor-pool stage: per-batch cosine top-k against the broadcast queries.

    The query matrix is fetched from the object store ONCE per actor in
    __init__ (broadcast pattern), not per batch.
    """

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.query_ids = q["ids"]
        self.q = _l2_normalize(np.asarray(q["vecs"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _l2_normalize(_embedding_matrix(batch, self.vec_col))
        ids = np.asarray(batch.column(self.id_col))
        sims = self.q @ m.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_sim = [], [], []
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        for qi in range(sims.shape[0]):
            cand = idx[qi]
            out_q.append(np.full(k, self.query_ids[qi]))
            out_id.append(ids[cand])
            out_sim.append(sims[qi, cand])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
            "cosine": pa.array(np.concatenate(out_sim), type=pa.float64()),
        })


def ann_topk(ds, queries: dict, *, k: int = 10, id_col: str = "vec_id",
             vec_col: str = "embedding", concurrency: int = 2,
             batch_size: int = 4096):
    """Brute-force cosine top-k. queries = {"ids": [...], "vecs": ndarray}.

    Returns (query_id, vec_id, rank) with rank 1..k, ties broken by vec_id —
    rank-only output keeps the result oracle-comparable across float widths.
    """
    queries_ref = ray.put(queries)
    local = ds.map_batches(
        BatchTopK, fn_constructor_args=(queries_ref, k, id_col, vec_col),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)

    def final_topk(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), ("vec_id", "ascending")])
        g = g.slice(0, k)
        return pa.table({
            "query_id": g.column("query_id"),
            "vec_id": g.column("vec_id"),
            "rank": pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64)),
        })

    return local.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


def _lsh_planes(dim: int, n_tables: int, n_planes: int, seed: int) -> np.ndarray:
    """(n_tables, dim, n_planes) hyperplanes — one narrow table per band.

    Banded like the MinHash 21×3 design: P(candidate | cos=s) =
    1 - (1 - p(s)^n_planes)^n_tables with p(s) = 1 - arccos(s)/π, so recall
    for high-similarity pairs stays near 1 while each table's 2^n_planes
    buckets keep candidate groups small."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, dim, n_planes))


def _sign_keys(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n_tables, n) int64 bucket keys: table_idx in the high bits, sign
    pattern in the low bits."""
    n_tables, _, n_planes = planes.shape
    out = np.empty((n_tables, len(m)), dtype=np.int64)
    for t in range(n_tables):
        signs = (m @ planes[t]) > 0  # (n, p)
        key = np.zeros(len(m), dtype=np.int64)
        for j in range(n_planes):
            key |= signs[:, j].astype(np.int64) << j
        out[t] = key | (np.int64(t) << np.int64(n_planes))
    return out


def ann_topk_lsh(ds, queries: dict, *, k: int = 10, n_planes: int = 8,
                 n_tables: int = 8, id_col: str = "vec_id",
                 vec_col: str = "embedding", seed: int = 42,
                 batch_size: int = 4096):
    """Scale-path ANN: multi-table sign-LSH candidate filter + local top-k.

    No bucket is ever materialized: the query key set (n_tables × nq keys)
    is broadcast via ``ray.put``; every corpus batch computes its own keys,
    keeps only rows colliding with a query in ≥1 table (vectorized isin),
    scores candidates locally and emits its per-query local top-k — the
    final reduce sees O(k · batches) rows exactly like the brute-force path.
    Recall is tunable via (n_planes, n_tables) and measured in
    tests/test_ops.py::test_ann_lsh_recall (≥0.9 @ k=10 on the fixture).
    Designed for small-to-moderate query sets (the nq-wide match matrix is
    per-batch); for huge query sets use ann_topk or an IVF partition.
    """
    q_vecs = _l2_normalize(np.asarray(queries["vecs"], dtype=np.float64))
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first.column(vec_col)[0].as_py())
    planes = _lsh_planes(dim, n_tables, n_planes, seed)
    q_keys = _sign_keys(q_vecs, planes)  # (T, nq)
    state_ref = ray.put({"planes": planes, "q_keys": q_keys,
                         "q_vecs": q_vecs,
                         "q_ids": np.asarray(queries["ids"], dtype=np.int64)})

    def local_candidates(batch: pa.Table) -> pa.Table:
        from ..functions.rayutil import get_broadcast

        st = get_broadcast(state_ref)
        m = _l2_normalize(_embedding_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col))
        keys = _sign_keys(m, st["planes"])  # (T, n)
        nq = st["q_keys"].shape[1]
        # (n, nq): row i is a candidate for query q iff they collide in >=1 table
        cand = np.zeros((len(m), nq), dtype=bool)
        for t in range(st["planes"].shape[0]):
            cand |= keys[t][:, None] == st["q_keys"][t][None, :]
        ri, qi = np.nonzero(cand)
        if len(ri) == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        sims = np.einsum("ij,ij->i", m[ri], st["q_vecs"][qi])
        # local top-k per query: lexsort by (query, -sim, id), keep first k
        order = np.lexsort((ids[ri], -sims, qi))
        qs, vs, ss = qi[order], ids[ri][order], sims[order]
        pos = np.arange(len(qs)) - np.concatenate(
            [[0], np.cumsum(np.bincount(qs, minlength=nq))])[qs]
        keep = pos < k
        return pa.table({
            "query_id": pa.array(st["q_ids"][qs[keep]], type=pa.int64()),
            "vec_id": pa.array(vs[keep], type=pa.int64()),
            "cosine": pa.array(ss[keep], type=pa.float64()),
        })

    local = ds.map_batches(local_candidates, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size)

    def final_topk(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), ("vec_id", "ascending")])
        g = g.slice(0, k)
        return pa.table({
            "query_id": g.column("query_id"),
            "vec_id": g.column("vec_id"),
            "rank": pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64)),
        })

    return local.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


def embedding_near_dup(ds, *, threshold: float = 0.95, n_planes: int = 8,
                       n_tables: int = 8, dim: int | None = None,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       num_partitions: int = 8,
                       cfg: PipelineConfig = DEFAULT_CONFIG, seed: int = 42,
                       window: int = 64, max_pairs_per_block: int = 4096,
                       counters=None):
    """Embedding-cosine near-dup: banded multi-table sign-LSH blocks →
    WINDOWED in-block pairs (pairs.window_pair_indices — O(n·W), star
    bridges keep components connected) → cosine ≥ τ verify → connected
    components. Returns (record_id, cluster_id).

    Blocks are processed through the engine's bucketed shuffle-reduce, never
    a per-distinct-key map_groups, and no whole bucket is materialized as a
    candidate matrix. Skew capping is the windowed pairing itself (bounded
    pairs per block); nothing is dropped silently — pair-count reduction vs
    all-pairs is reported through `counters` (rayutil.DropCounter).
    """
    if dim is None:
        first = ds.take_batch(1, batch_format="pyarrow")
        dim = len(first.column(vec_col)[0].as_py())
    planes_ref = ray.put(_lsh_planes(dim, n_tables, n_planes, seed))

    def explode(batch: pa.Table) -> pa.Table:
        from ..functions.rayutil import get_broadcast

        planes = get_broadcast(planes_ref)
        m = _l2_normalize(_embedding_matrix(batch, vec_col)).astype(np.float32)
        keys = _sign_keys(m.astype(np.float64), planes)  # (T, n)
        n = len(m)
        n_t = keys.shape[0]
        row_idx = np.tile(np.arange(n, dtype=np.int64), n_t)
        ids = pc.cast(batch.column(id_col), pa.string())
        return pa.table({
            "block_key": pa.array(keys.reshape(-1)),
            "record_id": ids.take(pa.array(row_idx)),
            # float32 list payload: the vector must ride the shuffle for
            # in-block verification; halve the bytes vs float64
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(m[row_idx].reshape(-1)), dim),
        })

    blocks = ds.map_batches(explode, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _cosine_block_cc(
        ds, blocks, threshold=threshold, window=window,
        max_pairs_per_block=max_pairs_per_block, id_col=id_col, cfg=cfg,
        num_partitions=num_partitions, counters=counters,
        counter_name="embedding_lsh_pairs_windowed_away")


def _cosine_block_cc(ds, blocks, *, threshold: float, window: int,
                     max_pairs_per_block: int, id_col: str,
                     cfg: PipelineConfig, num_partitions: int,
                     counters=None, counter_name: str = "pairs_windowed_away"):
    """Shared back half of the embedding near-dup family: a `blocks` dataset
    (block_key, record_id, vec float32 list) → windowed in-block candidate
    pairs → exact cosine ≥ τ verify → pair dedup → connected components with
    singletons attached. Used by both the sign-LSH (`embedding_near_dup`)
    and the k-means (`semantic_dedup`) blocking fronts."""
    from ..functions.rayutil import bucketed_group_apply, segment_starts
    from .pairs import window_pair_indices

    def _empty_edges() -> pa.Table:
        return pa.table({"id_a": pa.array([], type=pa.string()),
                         "id_b": pa.array([], type=pa.string())})

    def pair_bucket(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return _empty_edges()
        starts = segment_starts(bucket.column("block_key"))
        lens = np.diff(np.append(starts, n))
        multi = np.nonzero(lens >= 2)[0]
        if len(multi) == 0:
            return _empty_edges()
        vecs = bucket.column("vec")
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        mat = np.asarray(vecs.values, dtype=np.float32).reshape(n, -1)
        xs_all, ys_all = [], []
        windowed_away = 0
        for si in multi:
            s, ln = int(starts[si]), int(lens[si])
            xs, ys = window_pair_indices(ln, window, max_pairs_per_block)
            windowed_away += ln * (ln - 1) // 2 - len(xs)
            xs_all.append(s + xs)
            ys_all.append(s + ys)
        if windowed_away > 0 and counters is not None:
            counters.add(counter_name, windowed_away)
        xi = np.concatenate(xs_all)
        yi = np.concatenate(ys_all)
        sims = np.einsum("ij,ij->i", mat[xi], mat[yi])
        hit = sims >= np.float32(threshold)
        ids = bucket.column("record_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"id_a": ids.take(pa.array(xi[hit])),
                         "id_b": ids.take(pa.array(yi[hit]))})

    raw_edges = bucketed_group_apply(
        blocks, "block_key", pair_bucket,
        num_buckets=cfg.num_buckets,
        sort_cols=[("record_id", "ascending")])

    from .pairs import _dedup_bucket
    edges = bucketed_group_apply(
        raw_edges, "id_a", _dedup_bucket,
        num_buckets=cfg.num_buckets,
        sort_cols=[("id_b", "ascending")])

    from .dedup import attach_singleton_clusters
    nodes = ds.map_batches(
        lambda t: pa.table({"record_id": pc.cast(t.column(id_col), pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True)
    cc = connected_components(nodes, edges, cfg, num_partitions,
                              include_singletons=False)
    return attach_singleton_clusters(ds, id_col, cc, cfg=cfg,
                                     num_partitions=num_partitions)


def semantic_dedup(ds, *, threshold: float = 0.92, n_clusters: int = 32,
                   iters: int = 6, id_col: str = "vec_id",
                   vec_col: str = "embedding", num_partitions: int = 8,
                   cfg: PipelineConfig = DEFAULT_CONFIG, window: int = 64,
                   max_pairs_per_block: int = 4096, counters=None):
    """SemDeDup-style semantic deduplication (Abbas et al., arXiv
    2303.09540): k-means over L2-normalized embeddings partitions the space,
    then near-duplicates are resolved WITHIN clusters only — cosine ≥ τ
    verify → connected components → (record_id, cluster_id), min-id
    survivor rule downstream, identical output contract to
    ``embedding_near_dup``.

    Versus the sign-LSH front: k-means blocks adapt to the data's density
    (LSH planes are data-oblivious), at the price of the centroid-training
    passes. Blocking is ONE partition per point (no multi-table union), so
    recall across a cluster boundary is 0 by construction — the published
    trade-off; raise ``n_clusters`` slower than O(n) so clusters stay big
    enough, or use ``embedding_near_dup`` when boundary recall matters.

    Scale shape: centroids come from the existing out-of-core ``kmeans``
    (per-batch partial sums; deterministic maximin init), ride to workers as
    ONE broadcast object; assignment+explode is a single stateless pass, and
    the pair/verify/CC back half is the same bucketed machinery as the LSH
    path (`_cosine_block_cc`) — no all-pairs blowup, windowed caps counted
    via ``counters``."""
    from ..functions.rayutil import get_broadcast

    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first.column(vec_col)[0].as_py())

    def normalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], type=pa.string()),
                vec_col: pa.array([], type=pa.list_(pa.float32(), dim)),
            })
        m = _l2_normalize(_embedding_matrix(t, vec_col)).astype(np.float32)
        return pa.table({
            id_col: pc.cast(t.column(id_col), pa.string()),
            vec_col: pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1)), dim),
        })

    normed = ds.map_batches(normalize, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    _, cents, _ = kmeans(normed, n_clusters=n_clusters, iters=iters,
                         id_col=id_col, vec_col=vec_col)
    c_ref = ray.put(_l2_normalize(np.asarray(cents, dtype=np.float64))
                    .astype(np.float32))

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "block_key": pa.array([], type=pa.int64()),
                "record_id": pa.array([], type=pa.string()),
                "vec": pa.array([], type=pa.list_(pa.float32(), dim)),
            })
        C = get_broadcast(c_ref)
        m = _embedding_matrix(batch, vec_col).astype(np.float32)
        assign = np.argmax(m @ C.T, axis=1).astype(np.int64)
        return pa.table({
            "block_key": pa.array(assign),
            "record_id": pc.cast(batch.column(id_col), pa.string()),
            "vec": batch.column(vec_col),
        })

    blocks = normed.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True)
    return _cosine_block_cc(
        normed, blocks, threshold=threshold, window=window,
        max_pairs_per_block=max_pairs_per_block, id_col=id_col, cfg=cfg,
        num_partitions=num_partitions, counters=counters,
        counter_name="semantic_dedup_pairs_windowed_away")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partitioned scale path
# ---------------------------------------------------------------------------

def _spherical_kmeans(sample: np.ndarray, n_cells: int, iters: int = 10,
                      seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample (the IVF
    'train' step; sample is small — O(sample × dim), never the dataset)."""
    rng = np.random.default_rng(seed)
    X = _l2_normalize(np.asarray(sample, dtype=np.float64))
    n_cells = min(n_cells, len(X))
    C = X[rng.choice(len(X), size=n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        acc = np.zeros_like(C)
        np.add.at(acc, assign, X)
        counts = np.bincount(assign, minlength=n_cells)
        nz = counts > 0
        C[nz] = acc[nz] / counts[nz, None]
        C = _l2_normalize(C)
    return C


def ann_topk_ivf(ds, queries: dict, *, k: int = 10, n_cells: int = 32,
                 nprobe: int = 4, sample_size: int = 2048,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 seed: int = 42, batch_size: int = 4096):
    """IVF ANN: coarse-quantize the corpus into n_cells centroid cells; each
    query probes its nprobe nearest cells and only rows assigned to a probed
    cell are scored.

    Like ann_topk_lsh, no cell is ever materialized as a group: centroids +
    probed-cell set are broadcast once (ray.put), every batch assigns its own
    rows (one matmul + argmax), drops non-probed rows, and emits per-query
    local top-k; the reduce sees O(k · batches) rows. The probed-cell set is
    the UNION over queries — extra candidates only raise recall. Recall is
    tuned by (n_cells, nprobe) and measured in tests (≥0.9 @ k=10).
    """
    from ..functions.rayutil import get_broadcast
    from .sampling import bottomk_vector_sample

    sample = bottomk_vector_sample(ds, id_col=id_col, vec_col=vec_col,
                                   k=sample_size)
    C = _spherical_kmeans(sample, n_cells, seed=seed)
    q_vecs = _l2_normalize(np.asarray(queries["vecs"], dtype=np.float64))
    np_probe = min(nprobe, len(C))
    probe = np.argpartition(-(q_vecs @ C.T), np_probe - 1,
                            axis=1)[:, :np_probe]
    state_ref = ray.put({
        "C": C, "cells": np.unique(probe),
        "q_vecs": q_vecs,
        "q_ids": np.asarray(queries["ids"], dtype=np.int64)})

    def local_candidates(batch: pa.Table) -> pa.Table:
        st = get_broadcast(state_ref)
        m = _l2_normalize(_embedding_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col))
        assign = np.argmax(m @ st["C"].T, axis=1)
        mask = np.isin(assign, st["cells"])
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64())})
        if not mask.any():
            return empty
        m2, ids2 = m[mask], ids[mask]
        sims = st["q_vecs"] @ m2.T
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        nq = sims.shape[0]
        return pa.table({
            "query_id": pa.array(np.repeat(st["q_ids"], kk), type=pa.int64()),
            "vec_id": pa.array(ids2[idx.ravel()], type=pa.int64()),
            "cosine": pa.array(
                sims[np.repeat(np.arange(nq), kk), idx.ravel()],
                type=pa.float64())})

    local = ds.map_batches(local_candidates, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size)

    def final_topk(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), ("vec_id", "ascending")])
        g = g.slice(0, k)
        return pa.table({
            "query_id": g.column("query_id"),
            "vec_id": g.column("vec_id"),
            "rank": pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64)),
        })

    return local.groupby("query_id").map_groups(final_topk,
                                                batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Grouped vector centroids (per-label embedding mean, combiner pattern)
# ---------------------------------------------------------------------------

def grouped_centroids(ds, *, group_col: str = "label",
                      vec_col: str = "embedding", scale: int = 1_000_000,
                      batch_size: int = 8192):
    """Per-group vector centroid as integer-exact partial sums.

    Output (long format): one row per (group, dim) with
    ``sum_scaled`` = sum over the group of round(component * scale) and
    ``n`` = group size; centroid component = sum_scaled / (scale * n).

    Combiner pattern (same shape as the repo's count→normalize
    aggregations): each batch reduces its rows to O(groups_in_batch × dim)
    partial-sum rows with ONE np.add.at over the whole (rows × dim) matrix,
    so the groupby that merges partials only sees tiny tables — no
    all-to-all over the vectors themselves. Components are integer-scaled
    BEFORE summation, making the result order-independent (int64 addition
    is associative) and DuckDB-oracle-exact — the same trick as
    queries._cents. REL parity anchor: the mean-embedding-per-entity step
    of REL's embedding store build (REL:src/REL/generate_train_test.py
    entity-vector aggregation analog).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column(vec_col)
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table({
                "group": pa.array([], type=pa.int64()),
                "dim": pa.array([], type=pa.int64()),
                "sum_scaled": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64())})
        # float32 → float64 BEFORE scaling so the arithmetic matches a SQL
        # oracle's CAST(v AS DOUBLE) * scale; pc.round matches DuckDB ROUND
        vals = pc.cast(e.values, pa.float64())
        scaled = np.asarray(
            pc.cast(pc.round(pc.multiply(vals, float(scale))), pa.int64()))
        d = len(scaled) // n
        groups = np.asarray(pc.cast(batch.column(group_col), pa.int64()))
        uniq, inv = np.unique(groups, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, scaled.reshape(n, d))
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        g = len(uniq)
        return pa.table({
            "group": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), g)),
            "sum_scaled": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(counts, d))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)
    agg = partials.groupby(["group", "dim"]).aggregate(
        Sum("sum_scaled"), Sum("n"))
    return agg.map_batches(
        lambda t: t.rename_columns(["group", "dim", "sum_scaled", "n"]),
        batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Distributed k-means (full-table Lloyd's — not the IVF driver-sample train)
# ---------------------------------------------------------------------------

def kmeans(ds, *, n_clusters: int = 8, iters: int = 10,
           id_col: str = "vec_id", vec_col: str = "embedding",
           batch_size: int = 4096):
    """Out-of-core Lloyd's k-means over the whole embedding table.

    Each iteration is ONE streaming pass: every batch assigns its rows to the
    nearest centroid (one ``(rows × k)`` squared-L2 matrix via the expanded
    dot-product identity, argmin) and emits a PARTIAL — one row per nonempty
    cell: (cell, count, per-dim sums) — so the driver merges
    O(k × dim × batches) floats per pass, never the vectors themselves
    (same combiner shape as grouped_centroids). Centroids are ``ray.put``
    once per iteration and read via the per-process broadcast cache. Init is
    deterministic farthest-point (maximin) over the `sample_size` rows with
    the smallest `id_col` — order-independent of block layout and spread
    across the data (k-smallest-ids alone can land every seed in one blob).
    Re-reading the dataset once per iteration is inherent to out-of-core
    Lloyd's; pass a materialized/checkpointed dataset to avoid re-running
    upstream stages.

    Returns (assignments dataset: (id_col, cluster:int64), centroids:
    np.ndarray (k × dim), inertia: list of per-iteration float sums).
    """
    from ..functions.rayutil import collect_table, get_broadcast, global_topk

    # deterministic init sample: smallest ids via tiny top-k reduce (no
    # sort shuffle), then maximin seed selection on the driver
    sample_size = max(1024, n_clusters)
    seed_tab = global_topk(
        ds.map_batches(lambda t: t.select([id_col, vec_col]),
                       batch_format="pyarrow", zero_copy_batch=True),
        [(id_col, "ascending")], sample_size).sort_by(id_col)
    S = _embedding_matrix(seed_tab, vec_col).astype(np.float64)
    n_clusters = min(n_clusters, len(S))
    chosen = [0]
    d2min = np.einsum("ij,ij->i", S - S[0], S - S[0])
    for _ in range(1, n_clusters):
        nxt = int(np.argmax(d2min))
        chosen.append(nxt)
        dn = np.einsum("ij,ij->i", S - S[nxt], S - S[nxt])
        np.minimum(d2min, dn, out=d2min)
    C = S[chosen].copy()
    k, dim = C.shape

    part_schema = pa.schema([("cell", pa.int64()), ("n", pa.int64()),
                             ("inertia", pa.float64()),
                             ("sums", pa.list_(pa.float64()))])

    def make_partial(cref):
        def partial(batch: pa.Table) -> pa.Table:
            cc = get_broadcast(cref)
            m = _embedding_matrix(batch, vec_col).astype(np.float64)
            if m.shape[0] == 0:
                return part_schema.empty_table()
            # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2 ; ||x||^2 constant per
            # row for the argmin but needed for inertia
            xx = np.einsum("ij,ij->i", m, m)
            d2 = xx[:, None] - 2.0 * (m @ cc.T) + np.einsum(
                "ij,ij->i", cc, cc)[None, :]
            assign = np.argmin(d2, axis=1)
            best = np.maximum(d2[np.arange(len(assign)), assign], 0.0)
            uniq, inv = np.unique(assign, return_inverse=True)
            sums = np.zeros((len(uniq), m.shape[1]), dtype=np.float64)
            np.add.at(sums, inv, m)
            counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
            inert = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(inert, inv, best)
            return pa.table({
                "cell": pa.array(uniq.astype(np.int64)),
                "n": pa.array(counts),
                "inertia": pa.array(inert),
                "sums": pa.array(list(sums), type=pa.list_(pa.float64())),
            })
        return partial

    inertia_log = []
    for _ in range(iters):
        cref = ray.put(C)
        parts = collect_table(
            ds.map_batches(make_partial(cref), batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size),
            part_schema)
        cells = np.asarray(parts.column("cell"))
        ns = np.asarray(parts.column("n"))
        sums_flat = np.asarray(parts.column("sums").combine_chunks().values)
        sums = sums_flat.reshape(len(cells), dim)
        acc = np.zeros((k, dim), dtype=np.float64)
        np.add.at(acc, cells, sums)
        counts = np.bincount(cells, weights=ns, minlength=k)
        nz = counts > 0
        C = np.where(nz[:, None], acc / np.maximum(counts, 1)[:, None], C)
        inertia_log.append(float(np.asarray(parts.column("inertia")).sum()))

    cref = ray.put(C)

    def assign_only(batch: pa.Table) -> pa.Table:
        cc = get_broadcast(cref)
        m = _embedding_matrix(batch, vec_col).astype(np.float64)
        ids = batch.column(id_col)
        if m.shape[0] == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "cluster": pa.array([], type=pa.int64())})
        d2 = -2.0 * (m @ cc.T) + np.einsum("ij,ij->i", cc, cc)[None, :]
        return pa.table({id_col: ids,
                         "cluster": pa.array(
                             np.argmin(d2, axis=1).astype(np.int64))})

    assigns = ds.map_batches(assign_only, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=batch_size)
    return assigns, C, inertia_log


# ---------------------------------------------------------------------------
# exact cosine-threshold pair join (integer-quantized, oracle-comparable)
# ---------------------------------------------------------------------------

def _quantize_embeddings(m: np.ndarray, scale: int) -> np.ndarray:
    """floor(x*scale + 0.5) — identical single-rounding semantics to the SQL
    twin ``FLOOR(CAST(x AS DOUBLE)*scale + 0.5)`` (NOT numpy's banker's
    round / DuckDB's away-from-zero ROUND, which disagree at exact .5)."""
    q = np.floor(m * float(scale) + 0.5)
    if np.abs(q).max(initial=0.0) > 128:
        raise ValueError(
            "quantized component exceeds 128; lower `scale` so the integer "
            "dot/norm bound (64*128^2 < 2^53) holds for the exact compare")
    return q


def cosine_pairs_exact(ds, *, threshold_permyriad: int = 3500,
                       scale: int = 100, id_col: str = "vec_id",
                       vec_col: str = "embedding", batch_size: int = 4096,
                       concurrency: int = 4, max_rows: int = 500_000):
    """All-pairs cosine >= tp/10000 over integer-quantized embeddings —
    the EXACT baseline companion to the LSH `embedding_near_dup` scale path
    (same pattern as `ann_topk` vs `ann_topk_lsh`).

    Exactness without float-boundary flakiness: components are quantized to
    integers (floor(x*scale+0.5)); dot products and squared norms are then
    integer-valued and computed EXACTLY in float64 BLAS (every partial sum
    < 2^53, and integer float64 additions are exact in any order, so matmul
    summation order cannot matter). The threshold test
    ``cos >= tp/1e4  <=>  dot > 0 and (1e4*dot)^2 >= tp^2 * na * nb``
    is evaluated as the same left-associated float64 expression the SQL twin
    uses, so both engines round identically at the (documented, quantized)
    decision boundary.

    Broadcast bound: the quantized matrix rides the object store once via
    ``ray.put`` (never re-shipped per batch); `max_rows` guards the driver
    collect. Beyond it, use `embedding_near_dup` — at 100 TB an exact
    all-pairs join is O(n^2) no matter the engine.

    Returns (id_a, id_b, dot_q:int64) with id_a < id_b.
    """
    from ..functions.rayutil import collect_table, get_broadcast

    def quant(t: pa.Table) -> pa.Table:
        m = _embedding_matrix(t, vec_col)
        q = _quantize_embeddings(m, scale)
        n, dim_b = q.shape
        # variable-size list carrier: concat-safe even when a batch is
        # empty (a fixed-size list pins list_size=0 there and poisons the
        # concat) — same hardening as knn_graph_exact
        offs = pa.array(np.arange(n + 1, dtype=np.int32) * dim_b)
        return pa.table({
            "vid": pc.cast(t.column(id_col), pa.int64()),
            "q": pa.ListArray.from_arrays(offs, pa.array(q.reshape(-1))),
        })

    qds = ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True,
                         batch_size=batch_size)
    qtab = collect_table(
        qds, pa.schema([("vid", pa.int64()),
                        ("q", pa.list_(pa.float64()))]))
    if qtab.num_rows > max_rows:
        raise ValueError(
            f"cosine_pairs_exact: {qtab.num_rows} rows exceed the broadcast "
            f"cap {max_rows}; use embedding_near_dup (LSH) at this scale")
    if qtab.num_rows == 0:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "dot_q": pa.array([], type=pa.int64())})
        return ds.map_batches(lambda t: empty, batch_format="pyarrow",
                              zero_copy_batch=True)
    ids_all = np.asarray(qtab.column("vid"), dtype=np.int64)
    qcol = qtab.column("q")
    if isinstance(qcol, pa.ChunkedArray):
        qcol = qcol.combine_chunks()
    dim = len(qcol.values) // qtab.num_rows
    Q = np.asarray(qcol.values, dtype=np.float64).reshape(-1, dim)
    ref = ray.put({"ids": ids_all, "Q": Q, "norms": np.einsum("ij,ij->i", Q, Q)})

    tp2 = float(threshold_permyriad) * float(threshold_permyriad)

    def pairs(t: pa.Table) -> pa.Table:
        b = get_broadcast(ref)
        m = _embedding_matrix(t, vec_col)
        qm = _quantize_embeddings(m, scale)
        my_ids = np.asarray(pc.cast(t.column(id_col), pa.int64()))
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "dot_q": pa.array([], type=pa.int64())})
        if qm.shape[0] == 0:
            return empty
        dot = qm @ b["Q"].T                      # exact integer-valued f64
        na = np.einsum("ij,ij->i", qm, qm)       # (nb,)
        lhs = 10000.0 * dot
        lhs = lhs * lhs                          # (1e4*dot)^2, left-assoc
        rhs = (tp2 * na)[:, None] * b["norms"][None, :]
        cond = (dot > 0) & (lhs >= rhs) & (my_ids[:, None] < b["ids"][None, :])
        bi, oj = np.nonzero(cond)
        if len(bi) == 0:
            return empty
        return pa.table({"id_a": pa.array(my_ids[bi]),
                         "id_b": pa.array(b["ids"][oj]),
                         "dot_q": pa.array(dot[bi, oj].astype(np.int64))})

    return ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


# ---------------------------------------------------------------------------
# kNN-graph construction (every row's top-k neighbors over the whole corpus)
# ---------------------------------------------------------------------------


def knn_graph_exact(ds, *, k: int = 5, scale: int = 100,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    batch_size: int = 4096, concurrency: int = 4,
                    max_rows: int = 500_000):
    """EXACT kNN graph by brute-force cosine over integer-quantized
    embeddings — the primitive under SemDeDup, diversity curation and
    duplicate-cluster mining, in its auditable baseline form (the scale
    companion is `knn_graph_ivf`, same split as `ann_topk` / `ann_topk_ivf`
    and `cosine_pairs_exact` / `embedding_near_dup`).

    Exact cross-engine ranking: quantized components make dot products and
    squared norms integer-valued, hence exact in float64 in any summation
    order (every partial < 2^53, see `cosine_pairs_exact`);
    ``cos = dot / sqrt(na·nb)`` is then ONE exact-input IEEE sqrt + divide,
    bit-identical in numpy and the SQL twin, so the (cos DESC, neighbor ASC)
    ranking — including ties at the k-boundary — agrees exactly.

    Scale shape: the quantized corpus matrix rides the object store once
    (`ray.put`, cap-guarded by ``max_rows``); each batch is one BLAS matmul
    + a stable argsort row-block — O(n·k) rows leave the workers. Beyond
    the cap an exact all-pairs ranking is O(n²) no matter the engine; use
    the IVF path.

    Returns (vec_id, neighbor_id, rank, dot_q) with rank in 1..k.
    """
    from ..functions.rayutil import collect_table, get_broadcast

    def quant(t: pa.Table) -> pa.Table:
        m = _embedding_matrix(t, vec_col)
        q = _quantize_embeddings(m, scale)
        n, dim_b = q.shape
        # variable-size list carrier: concat-safe across batches even when
        # some batch is empty (a fixed-size list would pin list_size=0 there
        # and poison the concat)
        offs = pa.array(np.arange(n + 1, dtype=np.int32) * dim_b)
        return pa.table({
            "vid": pc.cast(t.column(id_col), pa.int64()),
            "q": pa.ListArray.from_arrays(offs, pa.array(q.reshape(-1))),
        })

    qds = ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True,
                         batch_size=batch_size)
    qtab = collect_table(
        qds, pa.schema([("vid", pa.int64()),
                        ("q", pa.list_(pa.float64()))]))
    if qtab.num_rows > max_rows:
        raise ValueError(
            f"knn_graph_exact: {qtab.num_rows} rows exceed the broadcast "
            f"cap {max_rows}; use knn_graph_ivf at this scale")
    empty_out = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "neighbor_id": pa.array([], type=pa.int64()),
                          "rank": pa.array([], type=pa.int64()),
                          "dot_q": pa.array([], type=pa.int64())})
    if qtab.num_rows == 0:
        return ds.map_batches(lambda t: empty_out, batch_format="pyarrow",
                              zero_copy_batch=True)
    ids_all = np.asarray(qtab.column("vid"), dtype=np.int64)
    qcol = qtab.column("q")
    if isinstance(qcol, pa.ChunkedArray):
        qcol = qcol.combine_chunks()
    dim = len(qcol.values) // qtab.num_rows
    Q = np.asarray(qcol.values, dtype=np.float64).reshape(-1, dim)
    # pre-sort the broadcast side by id so a STABLE argsort on -cos
    # tie-breaks by neighbor id for free (both engines rank (cos DESC,
    # neighbor ASC))
    order = np.argsort(ids_all)
    ids_all, Q = ids_all[order], Q[order]
    norms = np.einsum("ij,ij->i", Q, Q)
    ref = ray.put({"ids": ids_all, "Q": Q, "norms": norms})

    def topk(t: pa.Table) -> pa.Table:
        b = get_broadcast(ref)
        empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "neighbor_id": pa.array([], type=pa.int64()),
                          "rank": pa.array([], type=pa.int64()),
                          "dot_q": pa.array([], type=pa.int64())})
        m = _embedding_matrix(t, vec_col)
        if m.shape[0] == 0:
            return empty
        qm = _quantize_embeddings(m, scale)
        my_ids = np.asarray(pc.cast(t.column(id_col), pa.int64()))
        dot = qm @ b["Q"].T                        # exact integer-valued f64
        na = np.einsum("ij,ij->i", qm, qm)
        cos = dot / np.sqrt(na[:, None] * b["norms"][None, :])
        cos[my_ids[:, None] == b["ids"][None, :]] = -np.inf   # exclude self
        kk = min(k, cos.shape[1] - 1)
        if kk <= 0:
            return empty
        idx = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(cos.shape[0]), kk)
        cols = idx.ravel()
        keep = cos[rows, cols] > -np.inf           # groups smaller than k+1
        return pa.table({
            "vec_id": pa.array(np.repeat(my_ids, kk)[keep]),
            "neighbor_id": pa.array(b["ids"][cols][keep]),
            "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int64),
                                     cos.shape[0])[keep]),
            "dot_q": pa.array(dot[rows, cols][keep].astype(np.int64))})

    return ds.map_batches(topk, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


def knn_graph_ivf(ds, *, k: int = 5, n_cells: int = 32, nprobe: int = 4,
                  sample_size: int = 2048, id_col: str = "vec_id",
                  vec_col: str = "embedding", seed: int = 42,
                  batch_size: int = 4096, num_buckets: int = 128):
    """Approximate kNN graph at scale: IVF-bucketed self-join. Centroids are
    trained on a driver-side sample and broadcast; every row is shipped once
    as a BASE record to its home cell and ``nprobe`` times as a QUERY record
    to its nearest cells, then each cell scores its queries against its
    bases (one BLAS per cell segment) and a per-row top-k reduce merges the
    ≤ k·nprobe candidates. A base row lives in exactly ONE home cell, so a
    (query, neighbor) pair is generated at most once — the reduce needs no
    dedup. Recall tuned by (n_cells, nprobe); pinned ≥ 0.9 @ k in tests vs
    `knn_graph_exact`.

    Exchange cost: (1 + nprobe) copies of each (normalized) vector through
    one bucketed exchange keyed by cell — the standard IVF-join cost, linear
    in rows, independent of corpus-wide pair counts. Nothing is ever
    all-pairs; cell fan-in is bounded by the centroid balance of the data
    (spherical k-means on an L2-normalized sample).

    Returns (vec_id, neighbor_id, rank, cosine) with rank in 1..k.
    """
    from ..functions.rayutil import bucketed_group_apply, get_broadcast, segment_starts
    from .sampling import bottomk_vector_sample

    sample = bottomk_vector_sample(ds, id_col=id_col, vec_col=vec_col,
                                   k=sample_size)
    if sample.shape[0] == 0:  # empty corpus -> empty graph, not a crash
        empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "neighbor_id": pa.array([], type=pa.int64()),
                          "rank": pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        return ds.map_batches(lambda t: empty, batch_format="pyarrow",
                              zero_copy_batch=True)
    C = _spherical_kmeans(sample, n_cells, seed=seed)
    cref = ray.put(C)

    def route(t: pa.Table) -> pa.Table:
        Cb = get_broadcast(cref)
        m = _l2_normalize(_embedding_matrix(t, vec_col))
        n = m.shape[0]
        empty = pa.table({"cell": pa.array([], type=pa.int64()),
                          "role": pa.array([], type=pa.int8()),
                          "vid": pa.array([], type=pa.int64()),
                          "vec": pa.array([], type=pa.list_(pa.float32()))})
        if n == 0:
            return empty
        ids = np.asarray(pc.cast(t.column(id_col), pa.int64()))
        sims = m @ Cb.T
        npb = min(nprobe, Cb.shape[0])
        probe = np.argpartition(-sims, npb - 1, axis=1)[:, :npb]
        home = np.argmax(sims, axis=1)
        f32 = m.astype(np.float32)
        dim = f32.shape[1]
        # base copy (home cell) + nprobe query copies
        cells = np.concatenate([home, probe.ravel()])
        roles = np.concatenate([np.zeros(n, dtype=np.int8),
                                np.ones(n * npb, dtype=np.int8)])
        vids = np.concatenate([ids, np.repeat(ids, npb)])
        vecs = np.concatenate([f32, np.repeat(f32, npb, axis=0)])
        return pa.table({
            "cell": pa.array(cells.astype(np.int64)),
            "role": pa.array(roles),
            "vid": pa.array(vids),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), dim)})

    routed = ds.map_batches(route, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)

    def cell_topk(bucket: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "neighbor_id": pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        n = bucket.num_rows
        if n == 0:
            return empty
        starts = segment_starts(bucket.column("cell"))
        lens = np.diff(np.append(starts, n))
        vcol = bucket.column("vec")
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        dim = vcol.type.list_size
        mat = np.asarray(vcol.values, dtype=np.float64).reshape(n, dim)
        roles = np.asarray(bucket.column("role"), dtype=np.int8)
        vids = np.asarray(bucket.column("vid"), dtype=np.int64)
        out_q, out_n, out_c = [], [], []
        for si in range(len(starts)):
            s, ln = int(starts[si]), int(lens[si])
            r = roles[s:s + ln]
            B = mat[s:s + ln][r == 0]
            Qm = mat[s:s + ln][r == 1]
            bids = vids[s:s + ln][r == 0]
            qids = vids[s:s + ln][r == 1]
            if len(B) == 0 or len(Qm) == 0:
                continue
            sims = Qm @ B.T
            sims[qids[:, None] == bids[None, :]] = -np.inf
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk] \
                if sims.shape[1] > kk else \
                np.tile(np.arange(sims.shape[1]), (sims.shape[0], 1))
            rows = np.repeat(np.arange(sims.shape[0]), idx.shape[1])
            cols = idx.ravel()
            keep = sims[rows, cols] > -np.inf
            out_q.append(qids[rows[keep]])
            out_n.append(bids[cols[keep]])
            out_c.append(sims[rows, cols][keep])
        if not out_q:
            return empty
        return pa.table({"vec_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "cosine": pa.array(np.concatenate(out_c))})

    cands = bucketed_group_apply(routed, "cell", cell_topk,
                                 num_buckets=num_buckets,
                                 sort_cols=[("role", "ascending"),
                                            ("vid", "ascending")])

    def reduce_topk(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "neighbor_id": pa.array([], type=pa.int64()),
                          "rank": pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        if n == 0:
            return empty
        # bucket-sorted by (vec_id, -cosine? no: cosine asc) — re-rank per
        # segment with a stable descending sort on cosine, ties by neighbor
        starts = np.asarray(segment_starts(bucket.column("vec_id")))
        lens = np.diff(np.append(starts, n))
        vids = np.asarray(bucket.column("vec_id"), dtype=np.int64)
        nids = np.asarray(bucket.column("neighbor_id"), dtype=np.int64)
        cs = np.asarray(bucket.column("cosine"), dtype=np.float64)
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        order = np.lexsort((nids, -cs, seg))
        # the sort is grouped by segment (primary key), so segment
        # boundaries are unchanged: sorted slot j sits at within-segment
        # position j - start_of_segment
        pos_sorted = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        sel = pos_sorted < k
        o = order[sel]
        return pa.table({"vec_id": pa.array(vids[o]),
                         "neighbor_id": pa.array(nids[o]),
                         "rank": pa.array(pos_sorted[sel] + 1),
                         "cosine": pa.array(cs[o])})

    return bucketed_group_apply(cands, "vec_id", reduce_topk,
                                num_buckets=num_buckets,
                                sort_cols=[("cosine", "ascending")])


def pca_fit_transform(ds, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", n_components: int = 8):
    """Distributed PCA (Pearson 1901 / the covariance-eigendecomposition
    route): project every embedding onto the top ``n_components``
    principal axes — the dimensionality-reduction step before clustering
    or cheap ANN, and the standard embedding-drift visualizer.

    Scale shape: the d×d covariance needs ONE streaming combiner pass
    (per-batch partial n, Σx, ΣxᵀX as a d- and d×d-grid — d is the
    embedding dim, driver-safe); the eigendecomposition is a driver
    ``eigh`` on the d×d matrix; the projection is a second streaming
    map against the broadcast component matrix. Rows never accumulate
    anywhere. Determinism: eigh of a fixed matrix is deterministic, and
    each component's sign is fixed by forcing its largest-|.|
    coordinate positive. Returns (components, out_ds):
    ``components`` a pa.Table (component, explained_var_e9) and
    ``out_ds`` a Dataset (id_col, proj: list<float>)."""
    import ray as _ray

    from ray.data.aggregate import Sum

    from ..functions.rayutil import collect_table, get_broadcast

    def partial(t: pa.Table) -> pa.Table:
        m = _embedding_matrix(t, vec_col)
        return pa.table({
            "g": pa.array([0], type=pa.int64()),
            "n": pa.array([m.shape[0]], type=pa.int64()),
            "sx": pa.array([m.sum(axis=0)],
                           type=pa.list_(pa.float64())),
            "sxx": pa.array([(m.T @ m).ravel()],
                            type=pa.list_(pa.float64()))})

    def fold(t: pa.Table) -> pa.Table:
        n = int(np.asarray(t.column("n")).sum())
        sx = np.stack([np.asarray(t.column("sx")[i].values)
                       for i in range(t.num_rows)]).sum(axis=0)
        sxx = np.stack([np.asarray(t.column("sxx")[i].values)
                        for i in range(t.num_rows)]).sum(axis=0)
        return pa.table({
            "g": pa.array([0], type=pa.int64()),
            "n": pa.array([n], type=pa.int64()),
            "sx": pa.array([sx], type=pa.list_(pa.float64())),
            "sxx": pa.array([sxx], type=pa.list_(pa.float64()))})

    # worker-level pre-fold (batches of partial rows), then driver merge
    folded = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .map_batches(fold, batch_format="pyarrow", batch_size=32))
    tab = collect_table(folded, None)
    n = int(np.asarray(tab.column("n")).sum())
    if n == 0:
        raise ValueError("pca_fit_transform: empty input")
    sx = np.stack([np.asarray(tab.column("sx")[i].values)
                   for i in range(tab.num_rows)]).sum(axis=0)
    sxx_f = np.stack([np.asarray(tab.column("sxx")[i].values)
                      for i in range(tab.num_rows)]).sum(axis=0)
    d = len(sx)
    mean = sx / n
    cov = sxx_f.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order]            # d × k
    evals_k = np.maximum(evals[order], 0.0)
    # sign fix: largest-|.| coordinate of each component positive
    flip = np.sign(comps[np.abs(comps).argmax(axis=0),
                         np.arange(comps.shape[1])])
    comps = comps * flip[None, :]
    total_var = max(float(np.maximum(evals, 0.0).sum()), 1e-300)
    comp_tab = pa.table({
        "component": pa.array(np.arange(len(order), dtype=np.int64)),
        "explained_var_e9": pa.array(
            np.floor(evals_k / total_var * 1e9 + 0.5).astype(np.int64))})
    ref = _ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        mu, w = get_broadcast(ref)
        m = _embedding_matrix(t, vec_col)
        p = (m - mu[None, :]) @ w
        return pa.table({
            id_col: t.column(id_col),
            "proj": pa.array(list(p.astype(np.float32)),
                             type=pa.list_(pa.float32()))})

    return comp_tab, ds.map_batches(project, batch_format="pyarrow",
                                    zero_copy_batch=True)
