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


class SignLSHBuckets:
    """Scale path: bucket vectors by the sign pattern of h random hyperplanes.

    Hyperplanes are derived from the seed in __init__ (once per actor);
    vectors in the same bucket are ANN candidates. Emits (bucket, id, vec…)."""

    def __init__(self, dim: int, n_planes: int, seed: int, id_col: str, vec_col: str):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch, self.vec_col)
        signs = (m @ self.planes) > 0  # (n, p)
        bucket = np.zeros(len(m), dtype=np.int64)
        for j in range(signs.shape[1]):
            bucket |= signs[:, j].astype(np.int64) << j
        return pa.table({
            "bucket": pa.array(bucket),
            "vec_id": batch.column(self.id_col),
            self.vec_col: batch.column(self.vec_col),
        })


def ann_topk_lsh(ds, queries: dict, *, k: int = 10, n_planes: int = 6,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 seed: int = 42):
    """Scale-path ANN: sign-LSH bucket the corpus; each query searches only
    its own bucket (plus nothing else — recall traded for a 2^n_planes
    candidate reduction). Returns (query_id, vec_id, rank) like ann_topk."""
    import numpy as np

    q_vecs = _l2_normalize(np.asarray(queries["vecs"], dtype=np.float64))
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first.column(vec_col)[0].as_py())
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    def bucket_of(m: np.ndarray) -> np.ndarray:
        signs = (m @ planes) > 0
        out = np.zeros(len(m), dtype=np.int64)
        for j in range(signs.shape[1]):
            out |= signs[:, j].astype(np.int64) << j
        return out

    q_buckets = bucket_of(q_vecs)
    by_bucket: dict[int, list[int]] = {}
    for qi, b in enumerate(q_buckets):
        by_bucket.setdefault(int(b), []).append(qi)

    bucketed = ds.map_batches(
        SignLSHBuckets, fn_constructor_args=(dim, n_planes, seed, id_col, vec_col),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 2))

    query_ids = np.asarray(queries["ids"])

    def search(group: pa.Table) -> pa.Table:
        b = int(group.column("bucket")[0].as_py())
        qis = by_bucket.get(b, [])
        if not qis:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "rank": pa.array([], type=pa.int64())})
        m = _l2_normalize(_embedding_matrix(group, vec_col))
        ids = np.asarray(group.column("vec_id"))
        out_q, out_v, out_r = [], [], []
        for qi in qis:
            sims = m @ q_vecs[qi]
            order = np.lexsort((ids, -sims))[:k]
            out_q.append(np.full(len(order), query_ids[qi]))
            out_v.append(ids[order])
            out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
            "rank": pa.array(np.concatenate(out_r), type=pa.int64()),
        })

    def search_fn(group: pa.Table) -> pa.Table:
        return search(group)

    return bucketed.groupby("bucket").map_groups(search_fn, batch_format="pyarrow")


def embedding_near_dup(ds, *, threshold: float = 0.95, n_planes: int = 8,
                       dim: int | None = None, id_col: str = "vec_id",
                       vec_col: str = "embedding", num_partitions: int = 8,
                       cfg: PipelineConfig = DEFAULT_CONFIG, seed: int = 42):
    """Embedding-cosine near-dup: sign-LSH buckets → in-bucket cosine ≥ τ
    pairs → connected components. Returns (record_id, cluster_id)."""
    if dim is None:
        first = ds.take_batch(1, batch_format="pyarrow")
        dim = len(first.column(vec_col)[0].as_py())
    bucketed = ds.map_batches(
        SignLSHBuckets, fn_constructor_args=(dim, n_planes, seed, id_col, vec_col),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=2)

    def pair_gen(group: pa.Table) -> pa.Table:
        m = _l2_normalize(_embedding_matrix(group, vec_col))
        ids = np.asarray(group.column("vec_id"))
        order = np.argsort(ids)
        m, ids = m[order], ids[order]
        cap = min(len(ids), 1024)
        m, ids = m[:cap], ids[:cap]
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= threshold
        return pa.table({
            "id_a": pa.array(ids[iu[hit]].astype(str)),
            "id_b": pa.array(ids[ju[hit]].astype(str)),
        })

    edges = bucketed.groupby("bucket").map_groups(pair_gen, batch_format="pyarrow")
    nodes = ds.map_batches(
        lambda t: pa.table({"record_id": pc.cast(t.column(id_col), pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True)
    return connected_components(nodes, edges, cfg, num_partitions)
