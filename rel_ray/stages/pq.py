"""Product quantization (PQ) for embedding compression + ADC search.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor Search"
(IEEE TPAMI 2011): split each d-dim vector into ``m`` contiguous subvectors,
k-means each subspace into ``n_codes`` centroids (a codebook), and store a
vector as its m uint8 centroid ids — d·4 bytes → m bytes (e.g. 64-dim f32 =
256 B → 8 B at m=8, 32×). Searches run WITHOUT decompression via asymmetric
distance computation (ADC): a query precomputes an (m, n_codes) table of
subspace distances, and a database vector's approximate squared L2 distance
is m table lookups summed.

Why this is a first-class 100-TB op: a trillion-row embedding column is
storage- and bandwidth-bound; PQ codes ride the object store 32× cheaper,
broadcast codebooks are a few MB regardless of corpus size, and ADC turns
every per-batch scan into integer gathers + one reduce — the standard
scale path when even IVF cell lists are too big to hold as floats.

Scale shape: codebooks train on a driver-side SAMPLE (O(sample·d), never
the dataset), ship once via ``ray.put``; encode and ADC are stateless
``map_batches`` passes (one (nb, n_codes) distance matrix per subspace per
batch — vectorized, no per-row Python); the ADC top-k reduce sees
O(k·batches) rows, identical to `similarity.ann_topk`.

Determinism: seeded sample + seeded Lloyd's on the driver → identical
codebooks, codes and ranks on every run/cluster size (the codes query is
rows-only for the oracle because SQL cannot express k-means, but the op
itself is bit-reproducible; pytest pins reconstruction error and recall).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .similarity import _embedding_matrix


def _lloyd(X: np.ndarray, n_codes: int, iters: int, rng) -> np.ndarray:
    """Plain L2 k-means on the driver (PQ codebooks are Euclidean — unlike
    `similarity._spherical_kmeans`, subvectors are not normalized)."""
    n = len(X)
    k = min(n_codes, n)
    C = X[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for j in range(k):
            sel = assign == j
            if sel.any():
                C[j] = X[sel].mean(axis=0)
    if k < n_codes:  # tiny corpora: pad by repeating so codes stay uint8-valid
        C = np.concatenate([C, np.repeat(C[:1], n_codes - k, axis=0)])
    return C


def pq_train(ds, *, m: int = 8, n_codes: int = 256, sample_size: int = 2048,
             iters: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", seed: int = 42) -> np.ndarray:
    """Train PQ codebooks on a seeded Knuth-hash bottom-k id sample
    (unbiased on sorted corpora, reproducible — sampling.py::
    bottomk_vector_sample): returns (m, n_codes, d//m) float64.
    d must be divisible by m. n_codes ≤ 256 keeps codes uint8."""
    from .sampling import bottomk_vector_sample

    if n_codes > 256:
        raise ValueError("n_codes > 256 would not fit uint8 codes")
    X = bottomk_vector_sample(ds, id_col=id_col, vec_col=vec_col,
                              k=sample_size)
    if X.shape[0] == 0:
        raise ValueError("pq_train: cannot train codebooks on an empty "
                         "corpus/sample")
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    return np.stack([_lloyd(X[:, s * dsub:(s + 1) * dsub], n_codes, iters, rng)
                     for s in range(m)])


def pq_encode(ds, codebooks: np.ndarray, *, id_col: str = "vec_id",
              vec_col: str = "embedding", batch_size: int = 4096):
    """(id, vec) → (id, code: fixed list<uint8>[m]). One broadcast of the
    codebooks; per batch, one (nb, n_codes) distance matrix per subspace."""
    from ..functions.rayutil import get_broadcast

    cref = ray.put(np.ascontiguousarray(codebooks))
    m, n_codes, dsub = codebooks.shape

    def enc(t: pa.Table) -> pa.Table:
        C = get_broadcast(cref)
        X = _embedding_matrix(t, vec_col)
        nb = X.shape[0]
        if nb == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array([], type=pa.uint8()), m)})
        codes = np.empty((nb, m), dtype=np.uint8)
        for s in range(m):
            sub = X[:, s * dsub:(s + 1) * dsub]
            # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2; argmin drops ||x||^2
            d = (C[s] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ C[s].T)
            codes[:, s] = np.argmin(d, axis=1).astype(np.uint8)
        return pa.table({
            id_col: pc.cast(t.column(id_col), pa.int64()),
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), m)})

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def pq_reconstruct(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Decode (n, m) uint8 codes back to (n, d) vectors (test/debug aid)."""
    m, _, dsub = codebooks.shape
    return np.concatenate(
        [codebooks[s][codes[:, s]] for s in range(m)], axis=1)


def pq_ann_topk(encoded_ds, queries: dict, codebooks: np.ndarray, *,
                k: int = 10, id_col: str = "vec_id",
                batch_size: int = 8192):
    """ADC top-k over PQ CODES (never decompressing): per query one
    (m, n_codes) subspace-distance table, per batch m uint8 gathers + a
    sum; smallest approximate squared-L2 wins. queries = {"ids", "vecs"}.

    Contract: a SHORTLIST generator (the standard PQ search recipe is
    ADC-shortlist → exact re-rank on the fetched originals): inside a
    tight cluster ADC reorders near-equidistant neighbors by design, so
    ask for 2-4× the final k — the pytest pin is exact-top-k ⊆ ADC-top-3k.

    Returns (query_id, vec_id, rank, adist) rank 1..k, ties by vec_id.
    Same O(k·batches) reduce shape as `similarity.ann_topk`."""
    from ..functions.rayutil import get_broadcast

    m, n_codes, dsub = codebooks.shape
    q_vecs = np.asarray(queries["vecs"], dtype=np.float64)
    # per-query ADC tables: tab[q, s, c] = ||q_sub - C[s,c]||^2
    tabs = np.empty((len(q_vecs), m, n_codes))
    for s in range(m):
        sub = q_vecs[:, s * dsub:(s + 1) * dsub]
        tabs[:, s, :] = (((sub[:, None, :] - codebooks[s][None, :, :]) ** 2)
                         .sum(axis=2))
    ref = ray.put({"tabs": tabs,
                   "qids": np.asarray(queries["ids"], dtype=np.int64)})

    def local(t: pa.Table) -> pa.Table:
        st = get_broadcast(ref)
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "vec_id": pa.array([], type=pa.int64()),
                          "adist": pa.array([], type=pa.float64())})
        nb = t.num_rows
        if nb == 0:
            return empty
        ccol = t.column("code")
        if isinstance(ccol, pa.ChunkedArray):
            ccol = ccol.combine_chunks()
        codes = np.asarray(ccol.values, dtype=np.uint8).reshape(nb, m)
        ids = np.asarray(pc.cast(t.column(id_col), pa.int64()))
        tabs_b = st["tabs"]
        nq = tabs_b.shape[0]
        # dist[q, row] = sum_s tabs[q, s, codes[row, s]]
        dist = np.zeros((nq, nb))
        for s in range(m):
            dist += tabs_b[:, s, :][:, codes[:, s]]
        kk = min(k, nb)
        idx = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(nq), kk)
        cols = idx.ravel()
        return pa.table({
            "query_id": pa.array(np.repeat(st["qids"], kk)),
            "vec_id": pa.array(ids[cols]),
            "adist": pa.array(dist[rows, cols])})

    local_ds = encoded_ds.map_batches(local, batch_format="pyarrow",
                                      zero_copy_batch=True,
                                      batch_size=batch_size)

    def final_topk(group: pa.Table) -> pa.Table:
        g = group.sort_by([("adist", "ascending"), ("vec_id", "ascending")])
        g = g.slice(0, k)
        return pa.table({
            "query_id": g.column("query_id"),
            "vec_id": g.column("vec_id"),
            "rank": pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64)),
            "adist": g.column("adist")})

    return local_ds.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pyarrow")


def ivfpq_build(ds, *, n_cells: int = 32, m: int = 8, n_codes: int = 256,
                sample_size: int = 2048, iters: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                seed: int = 42):
    """Build the canonical billion-scale ANN index (IVF-PQ, Jégou et al.
    TPAMI 2011 §V): coarse k-means cells + PQ codebooks trained on the
    RESIDUALS (vector − its cell centroid) — residual distributions are
    tighter than raw vectors, so the same code budget quantizes finer.

    Returns (encoded_ds, index) where encoded_ds = (id, cell, code) — one
    int64 + one uint8[m] per row, 100-TB-friendly — and index = {"C":
    coarse centroids, "books": residual codebooks} (driver-side, a few MB
    regardless of corpus size; broadcast by the search)."""
    import ray as _ray

    from ..functions.rayutil import get_broadcast

    from .sampling import bottomk_vector_sample

    X = bottomk_vector_sample(ds, id_col=id_col, vec_col=vec_col,
                              k=sample_size)
    if X.shape[0] == 0:
        raise ValueError("ivfpq_build: empty corpus/sample")
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    rng = np.random.default_rng(seed)
    C = _lloyd(X, n_cells, iters, rng)            # coarse cells (L2)
    assign = np.argmin(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2),
                       axis=1)
    R = X - C[assign]                              # train books on residuals
    dsub = d // m
    books = np.stack([_lloyd(R[:, s * dsub:(s + 1) * dsub], n_codes, iters,
                             rng) for s in range(m)])
    index = {"C": C, "books": books}
    iref = _ray.put(index)

    def enc(t: pa.Table) -> pa.Table:
        idx = get_broadcast(iref)
        Cb, Bb = idx["C"], idx["books"]
        Xb = _embedding_matrix(t, vec_col)
        nb = Xb.shape[0]
        if nb == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "cell": pa.array([], type=pa.int64()),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array([], type=pa.uint8()), m)})
        dc = ((Xb[:, None, :] - Cb[None, :, :]) ** 2).sum(axis=2)
        cell = np.argmin(dc, axis=1)
        Rb = Xb - Cb[cell]
        codes = np.empty((nb, m), dtype=np.uint8)
        for s in range(m):
            sub = Rb[:, s * dsub:(s + 1) * dsub]
            dmat = ((Bb[s] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ Bb[s].T))
            codes[:, s] = np.argmin(dmat, axis=1).astype(np.uint8)
        return pa.table({
            id_col: pc.cast(t.column(id_col), pa.int64()),
            "cell": pa.array(cell.astype(np.int64)),
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), m)})

    encoded = ds.map_batches(enc, batch_format="pyarrow",
                             zero_copy_batch=True)
    return encoded, index


def ivfpq_ann_topk(encoded_ds, queries: dict, index: dict, *, k: int = 10,
                   nprobe: int = 4, id_col: str = "vec_id",
                   batch_size: int = 8192):
    """IVF-PQ search: each query probes its nprobe nearest cells and scores
    only rows in those cells, via per-(query, cell) ADC tables over the
    RESIDUAL codebooks (the table for cell c folds in the query-to-centroid
    offset: tab[s, code] = ||(q − C[c])_s − books[s, code]||²). Rows outside
    every probed cell are skipped by a vectorized mask — the scan stays one
    streaming pass over the uint8 codes, O(k·batches) rows to the reduce.

    Shortlist contract as `pq_ann_topk`: ask for 2-4× the re-rank k."""
    from ..functions.rayutil import get_broadcast

    C, books = index["C"], index["books"]
    m, n_codes, dsub = books.shape
    q_vecs = np.asarray(queries["vecs"], dtype=np.float64)
    nq = len(q_vecs)
    npb = min(nprobe, len(C))
    dc = ((q_vecs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(dc, axis=1, kind="stable")[:, :npb]   # (nq, npb)
    # per (query, probed cell) residual ADC tables: (nq, npb, m, n_codes)
    tabs = np.empty((nq, npb, m, n_codes))
    for qi in range(nq):
        for pj in range(npb):
            r = q_vecs[qi] - C[probe[qi, pj]]
            for s in range(m):
                sub = r[s * dsub:(s + 1) * dsub]
                tabs[qi, pj, s, :] = ((books[s] - sub[None, :]) ** 2).sum(axis=1)
    ref = ray.put({"tabs": tabs, "probe": probe,
                   "qids": np.asarray(queries["ids"], dtype=np.int64)})

    def local(t: pa.Table) -> pa.Table:
        st = get_broadcast(ref)
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "vec_id": pa.array([], type=pa.int64()),
                          "adist": pa.array([], type=pa.float64())})
        nb = t.num_rows
        if nb == 0:
            return empty
        ccol = t.column("code")
        if isinstance(ccol, pa.ChunkedArray):
            ccol = ccol.combine_chunks()
        codes = np.asarray(ccol.values, dtype=np.uint8).reshape(nb, m)
        cells = np.asarray(t.column("cell"), dtype=np.int64)
        ids = np.asarray(pc.cast(t.column(id_col), pa.int64()))
        out_q, out_i, out_d = [], [], []
        for qi in range(len(st["qids"])):
            # rows in any of this query's probed cells, tagged with WHICH
            # probe slot (its ADC table differs per cell)
            slot = np.full(nb, -1, dtype=np.int64)
            for pj in range(st["probe"].shape[1]):
                slot[cells == st["probe"][qi, pj]] = pj
            sel = np.flatnonzero(slot >= 0)
            if len(sel) == 0:
                continue
            tab = st["tabs"][qi]                       # (npb, m, n_codes)
            d = np.zeros(len(sel))
            sc = codes[sel]
            sl = slot[sel]
            for s in range(m):
                d += tab[sl, s, sc[:, s]]
            kk = min(k, len(sel))
            top = np.argpartition(d, kk - 1)[:kk] if len(sel) > kk \
                else np.arange(len(sel))
            out_q.append(np.full(len(top), st["qids"][qi]))
            out_i.append(ids[sel[top]])
            out_d.append(d[top])
        if not out_q:
            return empty
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_i)),
                         "adist": pa.array(np.concatenate(out_d))})

    local_ds = encoded_ds.map_batches(local, batch_format="pyarrow",
                                      zero_copy_batch=True,
                                      batch_size=batch_size)

    def final_topk(group: pa.Table) -> pa.Table:
        g = group.sort_by([("adist", "ascending"), ("vec_id", "ascending")])
        g = g.slice(0, k)
        return pa.table({
            "query_id": g.column("query_id"),
            "vec_id": g.column("vec_id"),
            "rank": pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64)),
            "adist": g.column("adist")})

    return local_ds.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pyarrow")
