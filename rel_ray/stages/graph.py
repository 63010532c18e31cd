"""Distributed PageRank: power iteration expressed as Dataset exchanges.

Published algorithm: Brin & Page (WWW 1998), standard damped formulation
with uniform dangling-mass redistribution:

    r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + dangling_mass/N)

REL parity anchor: REL's *global* disambiguation step scores candidate
coherence over the mention-entity graph (REL:src/REL/mulrel_ranker.py::
MulRelRanker forward — pairwise entity votes); PageRank is the canonical
batch form of such graph-structured score propagation, and the iterative
shape here (skinny rank table re-joined to a static edge table) is exactly
how an entity-coherence pass runs at corpus scale.

Two paths, same engine doctrine as the flagship's rep map:

* Broadcast fast path (node count <= ``broadcast_max_rows``, the normal
  case — rank state is 16 B/node): endpoints are dictionary-coded ONCE
  into a materialized int-code edge table; each iteration is ONE
  streaming map over the coded edges (per-batch ``np.add.at`` partial
  contribution vectors against the broadcast rank vector) plus a driver
  merge of O(batches) partial vectors. Zero per-iteration shuffles.
* Co-group fallback (node set too large to broadcast): the EDGE table is
  hash-bucketed once per iteration by src via the engine's cogroup join,
  contributions aggregate through one skinny groupby(dst), and the rank
  table is materialized per iteration (loop-carried state; unbounded
  lazy lineage would re-execute every prior round). Per-iteration driver
  work is one streaming scalar reduce (dangling mass).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pagerank(edges, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 10,
             num_buckets: int = 64, broadcast_max_rows: int = 2_000_000):
    """edges: Dataset with string/int columns ``src``, ``dst`` (multi-edges
    count once per occurrence, SQL-style). Returns Dataset (node, rank)
    over the union of endpoints; ranks sum to 1.
    """
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import cogroup_inner_join

    # node universe = distinct endpoints (one skinny exchange)
    srcs = edges.map_batches(lambda t: pa.table({"node": t.column(src)}),
                             batch_format="pyarrow", zero_copy_batch=True)
    dsts = edges.map_batches(lambda t: pa.table({"node": t.column(dst)}),
                             batch_format="pyarrow", zero_copy_batch=True)
    nodes = srcs.union(dsts).map_batches(
        lambda t: pa.table({"node": pc.unique(
            t.column("node").combine_chunks()
            if isinstance(t.column("node"), pa.ChunkedArray)
            else t.column("node"))}),
        batch_format="pyarrow", zero_copy_batch=True).groupby(
        "node").count().map_batches(
        lambda t: pa.table({"node": t.column("node")}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n = nodes.count()
    if n == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.string()),
            "rank": pa.array([], type=pa.float64())}))

    if n <= broadcast_max_rows:
        return _pagerank_broadcast(edges, nodes, n, src=src, dst=dst,
                                   damping=damping, iters=iters)

    outdeg = edges.groupby(src).aggregate(Count()).map_batches(
        lambda t: t.rename_columns(["node", "outdeg"]),
        batch_format="pyarrow", zero_copy_batch=True)
    # ranks carry outdeg (0 for dangling) so each iteration needs no extra join
    ranks = cogroup_inner_join(
        nodes.map_batches(
            lambda t, r=1.0 / n: pa.table({
                "node": t.column("node"),
                "rank": pa.array(np.full(t.num_rows, r))}),
            batch_format="pyarrow", zero_copy_batch=True),
        outdeg, key="node", right_cols=["outdeg"], how="left",
        num_buckets=num_buckets).map_batches(
        lambda t: pa.table({
            "node": t.column("node"), "rank": t.column("rank"),
            "outdeg": pc.fill_null(pc.cast(t.column("outdeg"), pa.int64()),
                                   0)}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    for _ in range(iters):
        dangling = ranks.map_batches(
            lambda t: pa.table({"m": pc.if_else(
                pc.equal(t.column("outdeg"), 0), t.column("rank"),
                pa.nulls(t.num_rows, type=pa.float64()))}),
            batch_format="pyarrow", zero_copy_batch=True).sum("m") or 0.0
        base = (1.0 - damping) / n + damping * dangling / n

        contrib = cogroup_inner_join(
            edges.map_batches(
                lambda t: pa.table({"node": t.column(src),
                                    "dst": t.column(dst)}),
                batch_format="pyarrow", zero_copy_batch=True),
            ranks, key="node", right_cols=["rank", "outdeg"],
            num_buckets=num_buckets)
        summed = contrib.map_batches(
            lambda t: pa.table({
                "node": t.column("dst"),
                "c": pc.divide(t.column("rank"),
                               pc.cast(t.column("outdeg"), pa.float64()))}),
            batch_format="pyarrow", zero_copy_batch=True).groupby(
            "node").aggregate(Sum("c"))
        summed = summed.map_batches(
            lambda t: t.rename_columns(["node", "c"]),
            batch_format="pyarrow", zero_copy_batch=True)
        # nodes with no in-edges keep only the base term (null c -> 0)
        ranks = cogroup_inner_join(
            ranks.map_batches(
                lambda t: t.select(["node", "outdeg"]),
                batch_format="pyarrow", zero_copy_batch=True),
            summed, key="node", right_cols=["c"], how="left",
            num_buckets=num_buckets).map_batches(
            lambda t, b=base: pa.table({
                "node": t.column("node"),
                "rank": pc.add(pc.multiply(
                    pc.fill_null(t.column("c"), 0.0), damping), b),
                "outdeg": t.column("outdeg")}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        # loop-carried cogroup outputs carry left+right block counts —
        # without compaction blocks double per iteration, and the
        # retained plan DAG slows every execution even at stable block
        # counts (measured in the HITS twin of this loop; see
        # rayutil.sever_lineage)
        if ranks.num_blocks() > 2 * num_buckets:
            ranks = ranks.repartition(num_buckets).materialize()
        from ..functions.rayutil import sever_lineage
        ranks = sever_lineage(ranks)

    return ranks.map_batches(lambda t: t.select(["node", "rank"]),
                             batch_format="pyarrow", zero_copy_batch=True)


def _pagerank_broadcast(edges, nodes, n: int, *, src: str, dst: str,
                        damping: float, iters: int):
    """Broadcast fast path: rank state lives as one ray.put float64 vector;
    endpoints are dictionary-coded once into a materialized int64 edge
    table, and each iteration is one streaming pass emitting SPARSE
    per-batch contribution partials (distinct dst codes + sums) that the
    driver merges — zero per-iteration shuffles."""
    import ray as _ray
    import ray.data as rd

    from ..functions.rayutil import collect_table, get_broadcast

    node_type = nodes.schema().base_schema.field("node").type
    node_tab = collect_table(nodes, pa.schema([("node", node_type)]))
    node_arr = node_tab.column("node")
    if isinstance(node_arr, pa.ChunkedArray):
        node_arr = node_arr.combine_chunks()
    node_ref = _ray.put(node_arr)

    def code(t: pa.Table) -> pa.Table:
        na = get_broadcast(node_ref)
        return pa.table({
            "s": pc.cast(pc.index_in(t.column(src), value_set=na),
                         pa.int64()),
            "d": pc.cast(pc.index_in(t.column(dst), value_set=na),
                         pa.int64())})

    coded = edges.map_batches(code, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("s"), dtype=np.int64)
        uniq, cnt = np.unique(s, return_counts=True)
        return pa.table({"idx": pa.array([uniq], type=pa.list_(pa.int64())),
                         "val": pa.array([cnt.astype(np.float64)],
                                         type=pa.list_(pa.float64()))})

    def merge_sparse(ds) -> np.ndarray:
        # worker-level pre-fold: combine up to 16 sparse partial rows into
        # one before anything reaches the driver (same associativity
        # argument as sketches.fold_grid_partials)
        def local(t: pa.Table) -> pa.Table:
            idxs, vals = [], []
            for row in range(t.num_rows):
                idxs.append(np.asarray(t.column("idx")[row].values))
                vals.append(np.asarray(t.column("val")[row].values))
            if not idxs:
                return t
            cat_i = np.concatenate(idxs)
            cat_v = np.concatenate(vals)
            uniq, inv = np.unique(cat_i, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(sums, inv, cat_v)
            return pa.table({
                "idx": pa.array([uniq], type=pa.list_(pa.int64())),
                "val": pa.array([sums], type=pa.list_(pa.float64()))})

        out = np.zeros(n, dtype=np.float64)
        for b in ds.map_batches(local, batch_format="pyarrow",
                                zero_copy_batch=True,
                                batch_size=16).iter_batches(
                                    batch_format="pyarrow"):
            t = pa.table(b)
            for row in range(t.num_rows):
                np.add.at(out, np.asarray(t.column("idx")[row].values),
                          np.asarray(t.column("val")[row].values))
        return out

    deg = merge_sparse(coded.map_batches(deg_partial, batch_format="pyarrow",
                                         zero_copy_batch=True))

    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = float(r[deg == 0].sum())
        base = (1.0 - damping) / n + damping * dangling / n
        rdiv = np.where(deg > 0, r / np.maximum(deg, 1.0), 0.0)
        rdiv_ref = _ray.put(rdiv)

        def contrib_partial(t: pa.Table, ref=rdiv_ref) -> pa.Table:
            v = get_broadcast(ref)
            s = np.asarray(t.column("s"), dtype=np.int64)
            d_ = np.asarray(t.column("d"), dtype=np.int64)
            uniq, inv = np.unique(d_, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(sums, inv, v[s])
            return pa.table({
                "idx": pa.array([uniq], type=pa.list_(pa.int64())),
                "val": pa.array([sums], type=pa.list_(pa.float64()))})

        contrib = merge_sparse(coded.map_batches(
            contrib_partial, batch_format="pyarrow", zero_copy_batch=True))
        r = damping * contrib + base

    return rd.from_arrow(pa.table({"node": node_arr,
                                   "rank": pa.array(r)}))


def _simple_undirected(edges, src: str, dst: str):
    """Canonical UNDIRECTED SIMPLE edge set (u < v, self-loops dropped,
    multi-edges deduped through one groupby exchange) from any directed /
    duplicated int-id edge list."""
    def canon(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(src), pa.int64())
        b = pc.cast(t.column(dst), pa.int64())
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        tab = pa.table({"u": lo, "v": hi})
        return tab.filter(pc.not_equal(tab.column("u"), tab.column("v")))

    return (edges.map_batches(canon, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby(["u", "v"]).count()
            .map_batches(lambda t: t.select(["u", "v"]),
                         batch_format="pyarrow", zero_copy_batch=True))


def _closed_triangles(edges, *, src: str, dst: str, num_buckets: int,
                      broadcast_max_rows: int, wedge_limit: int):
    """Shared plan behind :func:`triangle_count` and
    :func:`local_clustering`: returns ``(closed, degrees, bits)`` where
    ``closed`` is a Dataset with ONE row per triangle, columns
    ``s`` (the wedge center — the triangle's lowest-ordered vertex) and
    ``pair`` = (a << bits) | b, the closing oriented edge; ``degrees`` is
    the (node, deg) Dataset of the simple undirected graph; ``closed`` is
    None when the graph is empty.

    Exact global triangle count of the UNDIRECTED simple graph induced
    by ``edges`` (int node ids; self-loops dropped, multi-edges deduped).

    Degree-ordered node iterator (Schank & Wagner, WEA 2005; the
    MapReduce form is Suri & Vassilvitskii, WWW 2011): orient every edge
    from its lower-(degree, id) endpoint to the higher; each triangle is
    then counted exactly once, as a wedge at its lowest-ordered vertex
    closed by one oriented edge. Orientation bounds every out-degree by
    O(sqrt(m)), so the wedge exchange is O(m^1.5) worst case and far less
    on real graphs — a hub's wedges are charged to its low-degree
    neighbors, which is precisely why this survives skew at 100 TB where
    the naive neighbor self-join explodes.

    Plan: dedup edges (one exchange) -> degree table (skinny exchange) ->
    orientation via broadcast degree lookup (searchsorted against a
    sorted node array; cogroup fallback past ``broadcast_max_rows``) ->
    wedge generation per source segment (one bucket exchange, vectorized
    variable-length pair expansion, no per-node Python) -> bucketed semi
    join of wedges against oriented edges.
    """
    import ray as _ray

    from ..functions.rayutil import (bucketed_group_apply, collect_table,
                                     get_broadcast, segment_starts)
    from ..stages.joins import cogroup_inner_join, semi_anti_join

    uniq_edges = _simple_undirected(edges, src, dst).materialize()
    # consumed 3x: degrees, orientation, closure

    def endpoints(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            t.column("u").combine_chunks() if isinstance(t.column("u"), pa.ChunkedArray) else t.column("u"),
            t.column("v").combine_chunks() if isinstance(t.column("v"), pa.ChunkedArray) else t.column("v")])
        return pa.table({"node": both})

    degrees = (uniq_edges.map_batches(endpoints, batch_format="pyarrow",
                                      zero_copy_batch=True)
               .groupby("node").count()
               .map_batches(lambda t: t.rename_columns(["node", "deg"]),
                            batch_format="pyarrow", zero_copy_batch=True)
               .materialize())
    n_nodes = degrees.count()
    if n_nodes == 0:
        return None, degrees, 0
    max_id = int(degrees.max("node"))
    min_id = int(degrees.min("node"))
    if min_id < 0:
        raise ValueError("triangle_count requires non-negative node ids")
    bits = max(max_id.bit_length(), 1)
    if 2 * bits > 62:
        raise ValueError("node id span too wide for the int64 composite "
                         "pair key — re-code node ids densely first")

    if n_nodes <= broadcast_max_rows:
        deg_tab = collect_table(degrees, pa.schema(
            [("node", pa.int64()), ("deg", pa.int64())])
        ).sort_by([("node", "ascending")])
        deg_ref = _ray.put((np.asarray(deg_tab.column("node"),
                                       dtype=np.int64),
                            np.asarray(deg_tab.column("deg"),
                                       dtype=np.int64)))

        def orient(t: pa.Table) -> pa.Table:
            nodes, deg = get_broadcast(deg_ref)
            u = np.asarray(t.column("u"), dtype=np.int64)
            v = np.asarray(t.column("v"), dtype=np.int64)
            du = deg[np.searchsorted(nodes, u)]
            dv = deg[np.searchsorted(nodes, v)]
            u_first = (du < dv) | ((du == dv) & (u < v))
            return pa.table({
                "s": pa.array(np.where(u_first, u, v)),
                "d": pa.array(np.where(u_first, v, u)),
                "deg_d": pa.array(np.where(u_first, dv, du))})

        oriented = uniq_edges.map_batches(orient, batch_format="pyarrow",
                                          zero_copy_batch=True)
    else:
        e1 = cogroup_inner_join(
            uniq_edges.map_batches(
                lambda t: t.rename_columns(["node", "v"]),
                batch_format="pyarrow", zero_copy_batch=True),
            degrees, key="node", right_cols=["deg"],
            num_buckets=num_buckets).map_batches(
            lambda t: t.rename_columns(["u", "node", "deg_u"]),
            batch_format="pyarrow", zero_copy_batch=True)
        e2 = cogroup_inner_join(e1, degrees, key="node",
                                right_cols=["deg"],
                                num_buckets=num_buckets)

        def orient2(t: pa.Table) -> pa.Table:
            u = np.asarray(t.column("u"), dtype=np.int64)
            v = np.asarray(t.column("node"), dtype=np.int64)
            du = np.asarray(t.column("deg_u"), dtype=np.int64)
            dv = np.asarray(t.column("deg"), dtype=np.int64)
            u_first = (du < dv) | ((du == dv) & (u < v))
            return pa.table({
                "s": pa.array(np.where(u_first, u, v)),
                "d": pa.array(np.where(u_first, v, u)),
                "deg_d": pa.array(np.where(u_first, dv, du))})

        oriented = e2.map_batches(orient2, batch_format="pyarrow",
                                  zero_copy_batch=True)

    oriented = oriented.materialize()  # consumed 2x: wedges + closure keys

    def wedge_pairs(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        empty = pa.table({"s": pa.array([], type=pa.int64()),
                          "pair": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        d = np.asarray(bucket.column("d"), dtype=np.int64)
        s_col = np.asarray(bucket.column("s"), dtype=np.int64)
        starts = np.asarray(segment_starts(bucket.column("s")))
        lens = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        left_counts = np.repeat(lens, lens) - 1 - pos
        total = int(left_counts.sum())
        if total == 0:
            return empty
        if total > wedge_limit:
            raise ValueError(
                f"wedge bucket of {total} pairs exceeds wedge_limit="
                f"{wedge_limit}; raise num_buckets")
        left_idx = np.repeat(np.arange(n, dtype=np.int64), left_counts)
        block_starts = np.cumsum(left_counts) - left_counts
        k = (np.arange(total, dtype=np.int64)
             - np.repeat(block_starts, left_counts))
        right_idx = left_idx + k + 1
        # rows within a segment are (deg_d, d)-sorted, so d[left] precedes
        # d[right] in orientation order — the composite matches the
        # oriented closing edge's (s, d) layout exactly
        return pa.table({"s": pa.array(s_col[left_idx]),
                         "pair": pa.array(
                             (d[left_idx] << bits) | d[right_idx])})

    wedges = bucketed_group_apply(
        oriented, "s", wedge_pairs, num_buckets=num_buckets,
        sort_cols=[("deg_d", "ascending"), ("d", "ascending")])

    def edge_key(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("s"), dtype=np.int64)
        d = np.asarray(t.column("d"), dtype=np.int64)
        return pa.table({"pair": pa.array((s << bits) | d)})

    edge_keys = oriented.map_batches(edge_key, batch_format="pyarrow",
                                     zero_copy_batch=True)
    closed = semi_anti_join(wedges, edge_keys, key="pair",
                            num_buckets=num_buckets)
    return closed, degrees, bits


def triangle_count(edges, *, src: str = "src", dst: str = "dst",
                   num_buckets: int = 128,
                   broadcast_max_rows: int = 2_000_000,
                   wedge_limit: int = 50_000_000) -> int:
    """Exact global triangle count — see :func:`_closed_triangles` for the
    degree-ordered plan (Schank & Wagner '05 / Suri & Vassilvitskii '11).
    Returns the scalar count."""
    closed, _, _ = _closed_triangles(
        edges, src=src, dst=dst, num_buckets=num_buckets,
        broadcast_max_rows=broadcast_max_rows, wedge_limit=wedge_limit)
    return 0 if closed is None else closed.count()


def local_clustering(edges, *, src: str = "src", dst: str = "dst",
                     num_buckets: int = 128,
                     broadcast_max_rows: int = 2_000_000,
                     wedge_limit: int = 50_000_000):
    """Per-node local clustering coefficient of the undirected simple
    graph: coef(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — Watts & Strogatz
    (Nature 1998). The ER reading: a mention block whose co-occurrence
    neighborhood has high clustering is one entity; low clustering flags
    a conflated block worth splitting.

    Built on :func:`_closed_triangles`: each closed triangle (s; a, b)
    credits all three vertices (one flat_map to 3 rows, one skinny
    groupby), per-node counts then LEFT-join the degree table via one
    cogroup exchange — nodes in no triangle keep tri=0. coef_e9 =
    trunc(2·tri·1e9 / (deg·(deg−1))), integer, NULL when deg < 2 —
    hash-exact vs a SQL twin. Returns a Dataset
    (node, tri, deg, coef_e9)."""
    from ..stages.joins import cogroup_join_multi

    closed, degrees, bits = _closed_triangles(
        edges, src=src, dst=dst, num_buckets=num_buckets,
        broadcast_max_rows=broadcast_max_rows, wedge_limit=wedge_limit)
    if closed is None:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "tri": pa.array([], type=pa.int64()),
            "deg": pa.array([], type=pa.int64()),
            "coef_e9": pa.array([], type=pa.int64())}))
    mask = (1 << bits) - 1

    def endpoints3(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("s"), dtype=np.int64)
        pair = np.asarray(t.column("pair"), dtype=np.int64)
        return pa.table({"node": pa.array(
            np.concatenate([s, pair >> bits, pair & mask]))})

    tri = (closed.map_batches(endpoints3, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("node").count()
           .map_batches(lambda t: t.rename_columns(["node", "tri"]),
                        batch_format="pyarrow", zero_copy_batch=True))

    joined = cogroup_join_multi(
        degrees, tri, key="node", left_cols=["deg"], right_cols=["tri"],
        num_buckets=num_buckets, how="left",
        left_schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("tri", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        deg = np.asarray(t.column("deg"), dtype=np.int64)
        tri_c = t.column("tri")
        if isinstance(tri_c, pa.ChunkedArray):
            tri_c = tri_c.combine_chunks()
        tri_v = np.asarray(tri_c.fill_null(0), dtype=np.int64)
        if tri_v.size and int(tri_v.max()) >= 2**62 // 10**9:
            raise ValueError(
                "local_clustering: a node's triangle count "
                f"({int(tri_v.max())}) would overflow the int64 e9 "
                "quantization (2·tri·1e9 ≥ 2^63) — a fully-clustered "
                "hub with degree ≳ 96k; quantize coarser")
        possible = deg * (deg - 1)  # 2x the pair count
        with np.errstate(divide="ignore", invalid="ignore"):
            coef = np.where(possible > 0,
                            2 * tri_v * 10**9 // np.maximum(possible, 1),
                            0)
        return pa.table({
            "node": t.column("node"),
            "tri": pa.array(tri_v),
            "deg": pa.array(deg),
            "coef_e9": pa.array(coef, type=pa.int64(),
                                mask=possible <= 0)})

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def k_core(edges, k: int, *, src: str = "src", dst: str = "dst",
           num_buckets: int = 64, max_rounds: int = 200,
           broadcast_max_rows: int = 2_000_000):
    """k-core of the undirected simple graph: the maximal subgraph in which
    every node has degree >= k (Seidman, Social Networks 1983). Returns a
    Dataset (node:int64, deg:int64) — the core's members with their
    WITHIN-CORE degree.

    Synchronous peeling: each round drops every node whose current degree
    is < k, then re-derives degrees on the surviving edge set; peeling is
    confluent (removal order never changes the fixpoint), which is what
    makes the result oracle-comparable against an unrolled-SQL twin.

    Scale shape: per round one SKINNY degree groupby + one edge filter —
    via a broadcast keep-set (one streaming pass) while the surviving node
    count fits ``broadcast_max_rows``, else two bucketed semi joins
    (stages/joins.semi_anti_join) on u then v. Edge state is materialized
    per round (loop-carried; lineage must not re-execute prior rounds) and
    only SHRINKS. Driver never holds edges — only the node-level keep set,
    and only on the broadcast path.
    """
    import ray as _ray

    from ..functions.rayutil import collect_table, get_broadcast
    from ..stages.joins import semi_anti_join

    ed = _simple_undirected(edges, src, dst).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        u = t.column("u")
        v = t.column("v")
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        return pa.table({"node": pa.concat_arrays([u, v])})

    empty = pa.table({"node": pa.array([], type=pa.int64()),
                      "deg": pa.array([], type=pa.int64())})
    for _ in range(max_rounds):
        if ed.count() == 0:
            import ray.data as rd
            return rd.from_arrow(empty)
        deg = (ed.map_batches(endpoints, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("node").count()
               .map_batches(lambda t: t.rename_columns(["node", "deg"]),
                            batch_format="pyarrow", zero_copy_batch=True)
               .materialize())
        n_bad = deg.map_batches(
            lambda t: t.filter(pc.less(t.column("deg"), pa.scalar(k))),
            batch_format="pyarrow", zero_copy_batch=True).count()
        if n_bad == 0:
            return deg
        keep = deg.map_batches(
            lambda t: pa.table({"node": t.filter(
                pc.greater_equal(t.column("deg"),
                                 pa.scalar(k))).column("node")}),
            batch_format="pyarrow", zero_copy_batch=True)
        n_keep = deg.count() - n_bad
        if n_keep <= broadcast_max_rows:
            keep_tab = collect_table(
                keep, pa.schema([("node", pa.int64())]))
            keep_ref = _ray.put(np.sort(np.asarray(keep_tab.column("node"),
                                                   dtype=np.int64)))

            def filt(t: pa.Table, ref=keep_ref) -> pa.Table:
                ks = get_broadcast(ref)
                if len(ks) == 0:
                    return t.slice(0, 0)
                u = np.asarray(t.column("u"), dtype=np.int64)
                v = np.asarray(t.column("v"), dtype=np.int64)
                iu = np.searchsorted(ks, u)
                iv = np.searchsorted(ks, v)
                ok = ((iu < len(ks)) & (ks[np.minimum(iu, len(ks) - 1)] == u)
                      & (iv < len(ks))
                      & (ks[np.minimum(iv, len(ks) - 1)] == v))
                return t.filter(pa.array(ok))

            ed = ed.map_batches(filt, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
        else:
            ed = semi_anti_join(
                ed.map_batches(lambda t: t.rename_columns(["node", "v"]),
                               batch_format="pyarrow", zero_copy_batch=True),
                keep, key="node", num_buckets=num_buckets).map_batches(
                lambda t: t.rename_columns(["u", "node"]),
                batch_format="pyarrow", zero_copy_batch=True)
            ed = semi_anti_join(ed, keep, key="node",
                                num_buckets=num_buckets).map_batches(
                lambda t: t.rename_columns(["u", "v"]),
                batch_format="pyarrow", zero_copy_batch=True).materialize()
        # loop-carried state: drop the retained plan DAG so per-round
        # executor bookkeeping stays flat (rayutil.sever_lineage)
        from ..functions.rayutil import sever_lineage
        ed = sever_lineage(ed)
    raise RuntimeError(f"k_core did not converge in {max_rounds} rounds")


def adamic_adar(edges, *, src: str = "src", dst: str = "dst",
                num_buckets: int = 128, wedge_limit: int = 50_000_000,
                max_degree: int | None = None,
                predict_new_only: bool = True):
    """Adamic–Adar link prediction over the undirected simple graph induced
    by ``edges`` (Adamic & Adar, Social Networks 2003): for every node pair
    (u < v) sharing at least one neighbor, emit the common-neighbor count
    ``cn`` (exact int) and the AA score  sum_w 1/ln(deg(w))  over common
    neighbors w, quantized to 1e-9 units (``aa_e9``, the engine's e9 idiom
    — each per-neighbor weight is floor-rounded BEFORE summation, so the
    sum is an order-independent integer and hash-exact vs a SQL twin).

    REL parity anchor: REL's coherence step votes between candidate
    entities through shared context (REL:src/REL/mulrel_ranker.py); AA is
    the canonical shared-neighbor affinity used the same way for
    entity-graph link prediction at corpus scale.

    Plan (all exchanges skinny): dedup to the simple graph (one exchange)
    -> adjacency in both directions (stream, 2m rows) -> ONE bucket
    exchange grouping adjacency by the shared neighbor w; deg(w) is simply
    w's segment length, so no degree table and no broadcast is needed —
    per segment, vectorized pair expansion emits (pair_key, wt) where
    wt = floor(1e9/ln(deg_w) + 0.5) -> groupby(pair) Sum/Count (second
    skinny exchange) -> optional anti join against the existing edge set
    (link prediction proposes NEW links only).

    Skew: wedges at w cost deg(w)^2 — inherent to exact AA. ``max_degree``
    (if set) skips hub segments above it, the standard documented
    approximation; ``wedge_limit`` hard-fails a bucket rather than OOM.
    Node ids must be non-negative and fit the (2*bits<=62) composite key.
    """
    from ..functions.rayutil import bucketed_group_apply, segment_starts
    from ..stages.joins import semi_anti_join

    uniq_edges = _simple_undirected(edges, src, dst).materialize()
    # consumed 2x: adjacency + (optionally) the anti-join key set

    import ray.data as rd

    if uniq_edges.count() == 0:
        return rd.from_arrow(pa.table({
            "u": pa.array([], type=pa.int64()),
            "v": pa.array([], type=pa.int64()),
            "cn": pa.array([], type=pa.int64()),
            "aa_e9": pa.array([], type=pa.int64())}))
    mx = uniq_edges.max("v")  # v is the greater endpoint of every edge
    if uniq_edges.min("u") < 0:
        raise ValueError("adamic_adar requires non-negative node ids")
    bits = max(int(mx).bit_length(), 1)
    if 2 * bits > 62:
        raise ValueError("node id span too wide for the int64 composite "
                         "pair key — re-code node ids densely first")

    def both_dirs(t: pa.Table) -> pa.Table:
        u = t.column("u")
        v = t.column("v")
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        return pa.table({"w": pa.concat_arrays([u, v]),
                         "nbr": pa.concat_arrays([v, u])})

    adj = uniq_edges.map_batches(both_dirs, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def wedge_weighted(bucket: pa.Table) -> pa.Table:
        empty = pa.table({"pair": pa.array([], type=pa.int64()),
                          "wt": pa.array([], type=pa.int64())})
        n = bucket.num_rows
        if n == 0:
            return empty
        nbr = np.asarray(bucket.column("nbr"), dtype=np.int64)
        starts = np.asarray(segment_starts(bucket.column("w")))
        lens = np.diff(np.append(starts, n))
        if max_degree is not None:
            keep = lens <= max_degree
            if not keep.all():
                sel = np.repeat(keep, lens)
                nbr = nbr[sel]
                lens = lens[keep]
                starts = np.cumsum(lens) - lens
                n = int(lens.sum())
                if n == 0:
                    return empty
        # per-row position within its segment; pairs (i<j) within segments
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        left_counts = np.repeat(lens, lens) - 1 - pos
        total = int(left_counts.sum())
        if total == 0:
            return empty
        if total > wedge_limit:
            raise ValueError(
                f"adamic_adar wedge bucket of {total} pairs exceeds "
                f"wedge_limit={wedge_limit}; raise num_buckets or set "
                f"max_degree")
        left_idx = np.repeat(np.arange(n, dtype=np.int64), left_counts)
        block_starts = np.cumsum(left_counts) - left_counts
        k = (np.arange(total, dtype=np.int64)
             - np.repeat(block_starts, left_counts))
        right_idx = left_idx + k + 1
        # neighbors are sorted ascending within a segment, so
        # nbr[left] < nbr[right] — (lo, hi) canonical by construction
        wt_seg = np.floor(1e9 / np.log(lens.astype(np.float64))
                          + 0.5).astype(np.int64)  # lens >= 2 here
        seg_of_pair = np.repeat(np.arange(len(lens), dtype=np.int64),
                                lens * (lens - 1) // 2)
        return pa.table({
            "pair": pa.array((nbr[left_idx] << bits) | nbr[right_idx]),
            "wt": pa.array(wt_seg[seg_of_pair])})

    from ray.data.aggregate import Count, Sum

    pairs = bucketed_group_apply(adj, "w", wedge_weighted,
                                 num_buckets=num_buckets,
                                 sort_cols=[("nbr", "ascending")])
    scored = (pairs.groupby("pair").aggregate(Count(), Sum("wt"))
              .map_batches(
        lambda t: pa.table({"pair": t.column("pair"),
                            "cn": t.column("count()"),
                            "aa_e9": t.column("sum(wt)")}),
        batch_format="pyarrow", zero_copy_batch=True))

    if predict_new_only:
        def edge_key(t: pa.Table) -> pa.Table:
            u = np.asarray(t.column("u"), dtype=np.int64)
            v = np.asarray(t.column("v"), dtype=np.int64)
            return pa.table({"pair": pa.array((u << bits) | v)})

        edge_keys = uniq_edges.map_batches(edge_key, batch_format="pyarrow",
                                           zero_copy_batch=True)
        scored = semi_anti_join(scored, edge_keys, key="pair", anti=True,
                                num_buckets=num_buckets)

    mask = (1 << bits) - 1

    def decode(t: pa.Table) -> pa.Table:
        p = np.asarray(t.column("pair"), dtype=np.int64)
        return pa.table({"u": pa.array(p >> bits),
                         "v": pa.array(p & mask),
                         "cn": t.column("cn"),
                         "aa_e9": t.column("aa_e9")})

    return scored.map_batches(decode, batch_format="pyarrow",
                              zero_copy_batch=True)


def assortativity(edges, *, src: str = "src", dst: str = "dst",
                  num_buckets: int = 128,
                  broadcast_max_rows: int = 2_000_000) -> pa.Table:
    """Degree assortativity coefficient (Newman, Phys. Rev. Lett. 2002):
    the Pearson correlation of endpoint degrees over the DIRECTED-both-
    ways edge list of the undirected simple graph. Positive r — hubs link
    hubs (a conflated-entity smell in a linkage graph); negative r — hubs
    link leaves (the usual mention-to-entity shape).

    INTEGER-EXACT: over the symmetrized list the x and y marginals are
    identical, so the sqrt in Pearson's r cancels —
    r = (m·Σxy − (Σx)²) / (m·Σxx − (Σx)²), an exact integer rational,
    emitted as r_e9 with sign-aware truncation (matching DuckDB's `//`).

    Scale shape: degree table via one skinny exchange; degree attach via
    broadcast searchsorted under ``broadcast_max_rows``, else two cogroup
    joins; then ONE combiner pass of 5 int partials and a single-row
    groupby. The driver folds one row in Python big ints (int64 partials
    hold to ~10^14 edge-degree products per batch; the global fold is
    arbitrary precision). Returns ONE row (m, sx, sxx, sxy, r_e9)."""
    import ray as _ray

    from ray.data.aggregate import Sum

    from ..functions.rayutil import collect_table, get_broadcast
    from ..stages.joins import cogroup_inner_join

    uniq_edges = _simple_undirected(edges, src, dst).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            t.column("u").combine_chunks()
            if isinstance(t.column("u"), pa.ChunkedArray) else t.column("u"),
            t.column("v").combine_chunks()
            if isinstance(t.column("v"), pa.ChunkedArray) else t.column("v")])
        return pa.table({"node": both})

    degrees = (uniq_edges.map_batches(endpoints, batch_format="pyarrow",
                                      zero_copy_batch=True)
               .groupby("node").count()
               .map_batches(lambda t: t.rename_columns(["node", "deg"]),
                            batch_format="pyarrow", zero_copy_batch=True)
               .materialize())
    n_nodes = degrees.count()
    if n_nodes == 0:
        return pa.table({"m": pa.array([0], type=pa.int64()),
                         "sx": pa.array([0], type=pa.int64()),
                         "sxx": pa.array([0], type=pa.int64()),
                         "sxy": pa.array([0], type=pa.int64()),
                         "r_e9": pa.array([None], type=pa.int64())})

    if n_nodes <= broadcast_max_rows:
        deg_tab = collect_table(degrees, pa.schema(
            [("node", pa.int64()), ("deg", pa.int64())])
        ).sort_by([("node", "ascending")])
        deg_ref = _ray.put((np.asarray(deg_tab.column("node"),
                                       dtype=np.int64),
                            np.asarray(deg_tab.column("deg"),
                                       dtype=np.int64)))

        def attach(t: pa.Table) -> pa.Table:
            nodes, deg = get_broadcast(deg_ref)
            u = np.asarray(t.column("u"), dtype=np.int64)
            v = np.asarray(t.column("v"), dtype=np.int64)
            return pa.table({"du": pa.array(deg[np.searchsorted(nodes, u)]),
                             "dv": pa.array(deg[np.searchsorted(nodes, v)])})

        deg_edges = uniq_edges.map_batches(attach, batch_format="pyarrow",
                                           zero_copy_batch=True)
    else:
        e1 = cogroup_inner_join(
            uniq_edges.map_batches(
                lambda t: t.rename_columns(["node", "v"]),
                batch_format="pyarrow", zero_copy_batch=True),
            degrees, key="node", right_cols=["deg"],
            num_buckets=num_buckets).map_batches(
            lambda t: t.rename_columns(["u", "node", "du"]),
            batch_format="pyarrow", zero_copy_batch=True)
        e2 = cogroup_inner_join(e1, degrees, key="node",
                                right_cols=["deg"],
                                num_buckets=num_buckets)
        deg_edges = e2.map_batches(
            lambda t: pa.table({"du": t.column("du"),
                                "dv": t.column("deg")}),
            batch_format="pyarrow", zero_copy_batch=True)

    def partial(t: pa.Table) -> pa.Table:
        du = np.asarray(t.column("du"), dtype=np.int64)
        dv = np.asarray(t.column("dv"), dtype=np.int64)
        # symmetrized: each undirected edge contributes (du,dv) and (dv,du)
        return pa.table({
            "g": pa.array([0], type=pa.int64()),
            "m": pa.array([2 * len(du)], type=pa.int64()),
            "sx": pa.array([int(du.sum() + dv.sum())], type=pa.int64()),
            "sxx": pa.array([int((du * du).sum() + (dv * dv).sum())],
                            type=pa.int64()),
            "sxy": pa.array([int(2 * (du * dv).sum())], type=pa.int64())})

    agg = (deg_edges.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
           .groupby("g").aggregate(Sum("m"), Sum("sx"), Sum("sxx"),
                                   Sum("sxy")))
    tab = collect_table(agg, pa.schema(
        [("g", pa.int64()), ("sum(m)", pa.int64()), ("sum(sx)", pa.int64()),
         ("sum(sxx)", pa.int64()), ("sum(sxy)", pa.int64())]))
    m = int(tab.column("sum(m)")[0].as_py())
    sx = int(tab.column("sum(sx)")[0].as_py())
    sxx = int(tab.column("sum(sxx)")[0].as_py())
    sxy = int(tab.column("sum(sxy)")[0].as_py())
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    if den == 0:
        r_e9 = None
    else:
        sgn = -1 if (num < 0) != (den < 0) else 1
        r_e9 = sgn * ((abs(num) * 10**9) // abs(den))
    return pa.table({"m": pa.array([m], type=pa.int64()),
                     "sx": pa.array([sx], type=pa.int64()),
                     "sxx": pa.array([sxx], type=pa.int64()),
                     "sxy": pa.array([sxy], type=pa.int64()),
                     "r_e9": pa.array([r_e9], type=pa.int64())})


def hits(edges, *, src: str = "src", dst: str = "dst", iters: int = 8,
         num_buckets: int = 64, broadcast_max_rows: int = 2_000_000):
    """HITS hubs & authorities (Kleinberg, JACM 1999), L1-normalized each
    half-step: a ← A·h / ‖·‖₁, h ← Aᵀ·a / ‖·‖₁ per iteration (multi-edges
    count per occurrence, matching the SQL twin). The ER reading over the
    bipartite mention→entity graph: authority ranks entities by how many
    strong mentions point at them; hub ranks mentions by how decisively
    they point at strong entities — REL's prior·coherence decomposition.

    Same two-path doctrine as :func:`pagerank`:

    * Broadcast fast path (≤ ``broadcast_max_rows`` nodes): endpoints
      dictionary-coded once into a materialized int-edge table; each
      half-step is ONE streaming pass emitting sparse per-batch partial
      sums merged on the driver — zero per-iteration shuffles, 2·iters
      passes total.
    * Co-group fallback: per half-step, one cogroup join of the edge
      table against the skinny state table + one groupby; the L1 norm is
      a streaming scalar reduce. State is materialized per step
      (loop-carried lineage).

    Returns Dataset (node, hub, auth); each vector sums to 1 (or is all
    zero when that side has no edges)."""
    import ray as _ray
    import ray.data as rd

    from ray.data.aggregate import Sum

    from ..functions.rayutil import collect_table, get_broadcast
    from ..stages.joins import cogroup_inner_join

    srcs = edges.map_batches(lambda t: pa.table({"node": t.column(src)}),
                             batch_format="pyarrow", zero_copy_batch=True)
    dsts = edges.map_batches(lambda t: pa.table({"node": t.column(dst)}),
                             batch_format="pyarrow", zero_copy_batch=True)
    nodes = srcs.union(dsts).map_batches(
        lambda t: pa.table({"node": pc.unique(
            t.column("node").combine_chunks()
            if isinstance(t.column("node"), pa.ChunkedArray)
            else t.column("node"))}),
        batch_format="pyarrow", zero_copy_batch=True).groupby(
        "node").count().map_batches(
        lambda t: pa.table({"node": t.column("node")}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n = nodes.count()
    if n == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.string()),
            "hub": pa.array([], type=pa.float64()),
            "auth": pa.array([], type=pa.float64())}))

    if n <= broadcast_max_rows:
        node_type = nodes.schema().base_schema.field("node").type
        node_tab = collect_table(nodes, pa.schema([("node", node_type)]))
        node_arr = node_tab.column("node")
        if isinstance(node_arr, pa.ChunkedArray):
            node_arr = node_arr.combine_chunks()
        node_ref = _ray.put(node_arr)

        def code(t: pa.Table) -> pa.Table:
            na = get_broadcast(node_ref)
            return pa.table({
                "s": pc.cast(pc.index_in(t.column(src), value_set=na),
                             pa.int64()),
                "d": pc.cast(pc.index_in(t.column(dst), value_set=na),
                             pa.int64())})

        coded = edges.map_batches(code, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

        def merge_sparse(ds) -> np.ndarray:
            def local(t: pa.Table) -> pa.Table:
                idxs, vals = [], []
                for row in range(t.num_rows):
                    idxs.append(np.asarray(t.column("idx")[row].values))
                    vals.append(np.asarray(t.column("val")[row].values))
                if not idxs:
                    return t
                cat_i = np.concatenate(idxs)
                cat_v = np.concatenate(vals)
                uniq, inv = np.unique(cat_i, return_inverse=True)
                sums = np.zeros(len(uniq), dtype=np.float64)
                np.add.at(sums, inv, cat_v)
                return pa.table({
                    "idx": pa.array([uniq], type=pa.list_(pa.int64())),
                    "val": pa.array([sums], type=pa.list_(pa.float64()))})

            out = np.zeros(n, dtype=np.float64)
            for b in ds.map_batches(local, batch_format="pyarrow",
                                    zero_copy_batch=True,
                                    batch_size=16).iter_batches(
                                        batch_format="pyarrow"):
                t = pa.table(b)
                for row in range(t.num_rows):
                    np.add.at(out,
                              np.asarray(t.column("idx")[row].values),
                              np.asarray(t.column("val")[row].values))
            return out

        def propagate(vec: np.ndarray, from_col: str,
                      to_col: str) -> np.ndarray:
            ref = _ray.put(vec)

            def partial(t: pa.Table, ref=ref) -> pa.Table:
                v = get_broadcast(ref)
                f = np.asarray(t.column(from_col), dtype=np.int64)
                g = np.asarray(t.column(to_col), dtype=np.int64)
                uniq, inv = np.unique(g, return_inverse=True)
                sums = np.zeros(len(uniq), dtype=np.float64)
                np.add.at(sums, inv, v[f])
                return pa.table({
                    "idx": pa.array([uniq], type=pa.list_(pa.int64())),
                    "val": pa.array([sums], type=pa.list_(pa.float64()))})

            return merge_sparse(coded.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True))

        h = np.full(n, 1.0 / n)
        a = np.zeros(n)
        for _ in range(iters):
            a = propagate(h, "s", "d")
            sa = a.sum()
            if sa > 0:
                a = a / sa
            h = propagate(a, "d", "s")
            sh = h.sum()
            if sh > 0:
                h = h / sh
        return rd.from_arrow(pa.table({
            "node": node_arr, "hub": pa.array(h), "auth": pa.array(a)}))

    # --- cogroup fallback: state is a skinny (node, h, a) table ---
    state = nodes.map_batches(
        lambda t, r=1.0 / n: pa.table({
            "node": t.column("node"),
            "h": pa.array(np.full(t.num_rows, r)),
            "a": pa.array(np.zeros(t.num_rows))}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def half_step(state, val_col: str, out_col: str, key_from: str,
                  key_to: str):
        # contributions: join edges (keyed by key_from) to state[val_col],
        # sum at key_to, L1-normalize, left-join back onto state
        contrib = cogroup_inner_join(
            edges.map_batches(
                lambda t: pa.table({"node": t.column(key_from),
                                    "other": t.column(key_to)}),
                batch_format="pyarrow", zero_copy_batch=True),
            state, key="node", right_cols=[val_col],
            num_buckets=num_buckets)
        summed = contrib.map_batches(
            lambda t: pa.table({"node": t.column("other"),
                                "c": t.column(val_col)}),
            batch_format="pyarrow", zero_copy_batch=True).groupby(
            "node").aggregate(Sum("c")).map_batches(
            lambda t: t.rename_columns(["node", "c"]),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        total = summed.map_batches(
            lambda t: pa.table({"c": t.column("c")}),
            batch_format="pyarrow", zero_copy_batch=True).sum("c") or 0.0
        keep = "a" if out_col == "h" else "h"
        return cogroup_inner_join(
            state.map_batches(
                lambda t: t.select(["node", keep]),
                batch_format="pyarrow", zero_copy_batch=True),
            summed, key="node", right_cols=["c"], how="left",
            num_buckets=num_buckets).map_batches(
            lambda t, tot=total: pa.table({
                "node": t.column("node"),
                "h": (pc.divide(pc.fill_null(t.column("c"), 0.0), tot)
                      if tot > 0 else pc.fill_null(t.column("c"), 0.0))
                if out_col == "h" else t.column("h"),
                "a": (pc.divide(pc.fill_null(t.column("c"), 0.0), tot)
                      if tot > 0 else pc.fill_null(t.column("c"), 0.0))
                if out_col == "a" else t.column("a")}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

    from ..functions.rayutil import sever_lineage

    for _ in range(iters):
        state = half_step(state, "h", "a", src, dst)   # a ← Aᵀh
        state = half_step(state, "a", "h", dst, src)   # h ← Aa
        # loop-carried cogroup outputs carry left+right block counts, so
        # blocks double per round (measured: 3→7→15→31 on a 12-node
        # graph) — compact whenever the count drifts past the exchange
        # width, and sever the retained plan DAG every round (without it
        # wall time still grows ~2.5x/iter at stable block counts; see
        # rayutil.sever_lineage for the measurements)
        if state.num_blocks() > 2 * num_buckets:
            state = state.repartition(num_buckets).materialize()
        state = sever_lineage(state)
    return state.map_batches(
        lambda t: t.select(["node", "h", "a"]).rename_columns(
            ["node", "hub", "auth"]),
        batch_format="pyarrow", zero_copy_batch=True)


def pointer_jump_roots(parents, *, node_col: str = "node",
                       parent_col: str = "parent",
                       num_buckets: int = 64,
                       broadcast_max_rows: int = 2_000_000,
                       max_rounds: int = 64):
    """Flatten a parent-pointer forest to (node, root, depth) — pointer
    jumping / path doubling (Wyllie 1979, the classic PRAM list-ranking
    primitive): each round every node's pointer jumps to its pointer's
    pointer and distances add, so an h-deep chain resolves in ⌈log₂ h⌉
    rounds instead of h sequential joins. The hierarchy-flattening op
    (org charts, category trees, reply chains) a recursive CTE runs
    row-at-a-time.

    Contract: ``parents`` has one row per node; a ROOT points to itself.
    Broadcast fast path under ``broadcast_max_rows``: the (node, parent)
    arrays collect to the driver and double vectorized (O(n log h) numpy,
    the FastSV-style honest-cap idiom); past the cap, each round is ONE
    cogroup join of the state table against itself keyed by the current
    pointer, with per-round block compaction + lineage severing (the
    iterative-loop hygiene measured in this module). Returns a Dataset
    (node, root, depth:int64)."""
    import ray.data as rd

    from ..functions.rayutil import collect_table, sever_lineage
    from ..stages.joins import cogroup_inner_join

    n_nodes = parents.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "root": pa.array([], type=pa.int64()),
            "depth": pa.array([], type=pa.int64())}))

    if n_nodes <= broadcast_max_rows:
        tab = collect_table(parents, pa.schema(
            [(node_col, pa.int64()), (parent_col, pa.int64())])
        ).sort_by([(node_col, "ascending")])
        nodes = np.asarray(tab.column(node_col), dtype=np.int64)
        par = np.asarray(tab.column(parent_col), dtype=np.int64)
        idx = np.searchsorted(nodes, par)
        if (idx >= len(nodes)).any() or not np.array_equal(
                nodes[np.minimum(idx, len(nodes) - 1)], par):
            raise ValueError("parent id missing from the node set")
        ptr = idx
        self_idx = np.arange(len(nodes), dtype=np.int64)
        depth = (ptr != self_idx).astype(np.int64)
        for _ in range(max_rounds):
            moving = ptr[ptr] != ptr
            if not moving.any():
                break
            depth = depth + np.where(ptr != self_idx, depth[ptr], 0)
            ptr = ptr[ptr]
        else:
            raise RuntimeError(
                f"pointer_jump_roots: no fixpoint in {max_rounds} rounds")
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes),
            "root": pa.array(nodes[ptr]),
            "depth": pa.array(depth)}))

    state = parents.map_batches(
        lambda t: pa.table({
            "node": pc.cast(t.column(node_col), pa.int64()),
            "ptr": pc.cast(t.column(parent_col), pa.int64()),
            "depth": pc.cast(pc.not_equal(t.column(node_col),
                                          t.column(parent_col)),
                             pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    for _ in range(max_rounds):
        joined = cogroup_inner_join(
            state.map_batches(
                lambda t: pa.table({"node": t.column("node"),
                                    "__p": t.column("ptr"),
                                    "depth": t.column("depth")}),
                batch_format="pyarrow", zero_copy_batch=True).map_batches(
                lambda t: t.rename_columns(["orig", "node", "d0"]),
                batch_format="pyarrow", zero_copy_batch=True),
            state.map_batches(
                lambda t: t.select(["node", "ptr", "depth"]),
                batch_format="pyarrow", zero_copy_batch=True),
            key="node", right_cols=["ptr", "depth"],
            num_buckets=num_buckets, how="left")

        def advance(t: pa.Table) -> pa.Table:
            # same contract as the broadcast path: a pointer that
            # resolves to no node row is a broken input, not a row to
            # silently drop (the left join surfaces it as a null ptr)
            if pc.any(pc.is_null(t.column("ptr"))).as_py():
                raise ValueError("parent id missing from the node set")
            return pa.table({
                "node": t.column("orig"),
                "ptr": t.column("ptr"),
                "depth": pc.add(t.column("d0"),
                                pc.if_else(
                                    pc.not_equal(t.column("node"),
                                                 t.column("ptr")),
                                    t.column("depth"),
                                    pa.scalar(0, type=pa.int64())))})

        new = joined.map_batches(advance, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
        # convergence: stop when the state stops changing (every row
        # appears twice in old ∪ new)
        changed = (state.union(new).groupby(["node", "ptr", "depth"])
                   .count().map_batches(
            lambda t: t.filter(pc.equal(t.column("count()"), 1)),
            batch_format="pyarrow", zero_copy_batch=True).count())
        if new.num_blocks() > 2 * num_buckets:
            new = new.repartition(num_buckets).materialize()
        state = sever_lineage(new)
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"pointer_jump_roots: no fixpoint in {max_rounds} rounds")
    return state.map_batches(
        lambda t: t.rename_columns(["node", "root", "depth"]),
        batch_format="pyarrow", zero_copy_batch=True)


def pagerank_weighted(edges, *, src: str = "src", dst: str = "dst",
                      weight: str = "w", damping: float = 0.85,
                      iters: int = 10, num_buckets: int = 64,
                      broadcast_max_rows: int = 2_000_000):
    """Edge-weighted PageRank: contributions split proportionally to
    edge weight, r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)·w(u,v)/W_out(u) +
    dangling/N) — the strength-aware variant (an interaction graph's
    edges are rarely equal). Non-negative integer weights; zero-weight
    edges contribute nothing; a node whose out-weight sums to zero is
    dangling.

    Same two-path doctrine as :func:`pagerank`; the broadcast fast path
    codes endpoints once and carries the weight column through the
    sparse per-batch partials. Returns Dataset (node, rank)."""
    import ray as _ray
    import ray.data as rd

    from ..functions.rayutil import collect_table, get_broadcast

    srcs = edges.map_batches(lambda t: pa.table({"node": t.column(src)}),
                             batch_format="pyarrow", zero_copy_batch=True)
    dsts = edges.map_batches(lambda t: pa.table({"node": t.column(dst)}),
                             batch_format="pyarrow", zero_copy_batch=True)
    nodes = srcs.union(dsts).map_batches(
        lambda t: pa.table({"node": pc.unique(
            t.column("node").combine_chunks()
            if isinstance(t.column("node"), pa.ChunkedArray)
            else t.column("node"))}),
        batch_format="pyarrow", zero_copy_batch=True).groupby(
        "node").count().map_batches(
        lambda t: pa.table({"node": t.column("node")}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n = nodes.count()
    if n == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.string()),
            "rank": pa.array([], type=pa.float64())}))
    if n > broadcast_max_rows:
        return _pagerank_weighted_cogroup(
            edges, nodes, n, src=src, dst=dst, weight=weight,
            damping=damping, iters=iters, num_buckets=num_buckets)

    node_type = nodes.schema().base_schema.field("node").type
    node_tab = collect_table(nodes, pa.schema([("node", node_type)]))
    node_arr = node_tab.column("node")
    if isinstance(node_arr, pa.ChunkedArray):
        node_arr = node_arr.combine_chunks()
    node_ref = _ray.put(node_arr)

    def code(t: pa.Table) -> pa.Table:
        na = get_broadcast(node_ref)
        return pa.table({
            "s": pc.cast(pc.index_in(t.column(src), value_set=na),
                         pa.int64()),
            "d": pc.cast(pc.index_in(t.column(dst), value_set=na),
                         pa.int64()),
            "w": pc.cast(t.column(weight), pa.float64())})

    coded = edges.map_batches(code, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def merge_sparse(ds) -> np.ndarray:
        out = np.zeros(n, dtype=np.float64)
        for b in ds.iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            for row in range(t.num_rows):
                np.add.at(out, np.asarray(t.column("idx")[row].values),
                          np.asarray(t.column("val")[row].values))
        return out

    def wout_partial(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("s"), dtype=np.int64)
        w = np.asarray(t.column("w"), dtype=np.float64)
        uniq, inv = np.unique(s, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, w)
        return pa.table({
            "idx": pa.array([uniq], type=pa.list_(pa.int64())),
            "val": pa.array([sums], type=pa.list_(pa.float64()))})

    wout = merge_sparse(coded.map_batches(wout_partial,
                                          batch_format="pyarrow",
                                          zero_copy_batch=True))
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = float(r[wout == 0].sum())
        base = (1.0 - damping) / n + damping * dangling / n
        rdiv = np.where(wout > 0, r / np.maximum(wout, 1e-300), 0.0)
        ref = _ray.put(rdiv)

        def contrib(t: pa.Table, ref=ref) -> pa.Table:
            v = get_broadcast(ref)
            s = np.asarray(t.column("s"), dtype=np.int64)
            d_ = np.asarray(t.column("d"), dtype=np.int64)
            w = np.asarray(t.column("w"), dtype=np.float64)
            uniq, inv = np.unique(d_, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(sums, inv, v[s] * w)
            return pa.table({
                "idx": pa.array([uniq], type=pa.list_(pa.int64())),
                "val": pa.array([sums], type=pa.list_(pa.float64()))})

        r = damping * merge_sparse(coded.map_batches(
            contrib, batch_format="pyarrow", zero_copy_batch=True)) + base
    return rd.from_arrow(pa.table({"node": node_arr, "rank": pa.array(r)}))


def _pagerank_weighted_cogroup(edges, nodes, n: int, *, src: str,
                               dst: str, weight: str, damping: float,
                               iters: int, num_buckets: int):
    """Distributed fallback past ``broadcast_max_rows`` — the mirror of
    :func:`pagerank`'s cogroup loop carrying W_out instead of outdeg:
    ranks ride (node, rank, wout); each iteration is one edge⋈rank
    cogroup, one skinny groupby of per-edge contributions
    rank·w/W_out (zero-weight edges contribute nothing), and one left
    attach back onto the rank state, with the same per-round block
    compaction + lineage severing hygiene."""
    from ray.data.aggregate import Sum

    from ..functions.rayutil import sever_lineage
    from ..stages.joins import cogroup_inner_join

    wsum = edges.map_batches(
        lambda t: pa.table({"node": t.column(src),
                            "w": pc.cast(t.column(weight),
                                         pa.float64())}),
        batch_format="pyarrow", zero_copy_batch=True).groupby(
        "node").aggregate(Sum("w")).map_batches(
        lambda t: t.rename_columns(["node", "wout"]),
        batch_format="pyarrow", zero_copy_batch=True)
    ranks = cogroup_inner_join(
        nodes.map_batches(
            lambda t, r=1.0 / n: pa.table({
                "node": t.column("node"),
                "rank": pa.array(np.full(t.num_rows, r))}),
            batch_format="pyarrow", zero_copy_batch=True),
        wsum, key="node", right_cols=["wout"], how="left",
        num_buckets=num_buckets).map_batches(
        lambda t: pa.table({
            "node": t.column("node"), "rank": t.column("rank"),
            "wout": pc.fill_null(t.column("wout"), 0.0)}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    for _ in range(iters):
        dangling = ranks.map_batches(
            lambda t: pa.table({"m": pc.if_else(
                pc.equal(t.column("wout"), 0.0), t.column("rank"),
                pa.nulls(t.num_rows, type=pa.float64()))}),
            batch_format="pyarrow", zero_copy_batch=True).sum("m") or 0.0
        base = (1.0 - damping) / n + damping * dangling / n

        contrib = cogroup_inner_join(
            edges.map_batches(
                lambda t: pa.table({
                    "node": t.column(src), "dst": t.column(dst),
                    "w": pc.cast(t.column(weight), pa.float64())}),
                batch_format="pyarrow", zero_copy_batch=True),
            ranks, key="node", right_cols=["rank", "wout"],
            num_buckets=num_buckets)
        summed = contrib.map_batches(
            lambda t: pa.table({
                "node": t.column("dst"),
                "c": pc.if_else(
                    pc.greater(t.column("w"), 0.0),
                    pc.divide(pc.multiply(t.column("rank"),
                                          t.column("w")),
                              t.column("wout")),
                    pa.scalar(0.0))}),
            batch_format="pyarrow", zero_copy_batch=True).groupby(
            "node").aggregate(Sum("c")).map_batches(
            lambda t: t.rename_columns(["node", "c"]),
            batch_format="pyarrow", zero_copy_batch=True)
        ranks = cogroup_inner_join(
            ranks.map_batches(
                lambda t: t.select(["node", "wout"]),
                batch_format="pyarrow", zero_copy_batch=True),
            summed, key="node", right_cols=["c"], how="left",
            num_buckets=num_buckets).map_batches(
            lambda t, b=base: pa.table({
                "node": t.column("node"),
                "rank": pc.add(pc.multiply(
                    pc.fill_null(t.column("c"), 0.0), damping), b),
                "wout": t.column("wout")}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        if ranks.num_blocks() > 2 * num_buckets:
            ranks = ranks.repartition(num_buckets).materialize()
        ranks = sever_lineage(ranks)

    return ranks.map_batches(lambda t: t.select(["node", "rank"]),
                             batch_format="pyarrow", zero_copy_batch=True)
