"""S7: transitive clustering — iterative min-label propagation over shuffles.

REL analog: the *global* coherence model (``REL:src/REL/mulrel_ranker.py``,
Le & Titov ment-norm iterations) plus the ``with_coref`` heuristic — a joint
assignment consistent across records becomes connected components over
accepted edges.

Algorithm (deterministic, join-free — rel_ray.functions.rayutil documents why
``Dataset.join`` is avoided): label(v) := v initially; each round:

  pass 1  bucketed co-group on node: each node's label row meets its
          adjacency rows; messages (dst=nbr, label) + the self message are
          emitted with vectorized segment ops (no per-node Python);
  pass 2  ``groupby(dst).min(label)`` — a native vectorized aggregate;
  convergence: |old ∩ new| via a count-aggregate on the unioned label sets.

Only edge-touched ("active") nodes iterate — isolated records join as
singleton clusters at the end. Star bridges from pair generation keep
component diameters small; `max_cc_iters` is a loud-failure cap. Labels are
re-materialized per round — O(#active representatives), not O(input).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import PipelineConfig
from ..functions.rayutil import bucketed_group_apply, segment_starts

_EMPTY_STR = ""


def _undirect(edges):
    """edges (id_a,id_b) → symmetric (node, nbr, label="") message topology."""
    def expand(t: pa.Table) -> pa.Table:
        empty = pa.array([_EMPTY_STR] * (2 * t.num_rows), type=pa.string())
        node = pa.concat_tables([
            pa.table({"node": t.column("id_a"), "nbr": t.column("id_b")}),
            pa.table({"node": t.column("id_b"), "nbr": t.column("id_a")}),
        ])
        return node.append_column("label", empty)
    return edges.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def _propagate_bucket(bucket: pa.Table) -> pa.Table:
    """Vectorized pass 1 over one bucket sorted by (node, nbr): each segment's
    first row is the node's label row (nbr == "" sorts first); broadcast its
    label to every adjacency row plus one self message."""
    n = bucket.num_rows
    if n == 0:
        return pa.table({"dst": pa.array([], type=pa.string()),
                         "label": pa.array([], type=pa.string()),
                         "selfm": pa.array([], type=pa.int8())})
    node = bucket.column("node")
    nbr = bucket.column("nbr")
    label = bucket.column("label")
    if isinstance(nbr, pa.ChunkedArray):
        nbr = nbr.combine_chunks()
    starts = segment_starts(node)
    lens = np.diff(np.append(starts, n))
    starts_arr = pa.array(starts)
    first_nbr = nbr.take(starts_arr)
    if not pc.all(pc.equal(first_nbr, _EMPTY_STR)).as_py():
        raise ValueError("edge endpoint without a label row — active-node "
                         "initialization contract violated")
    seg_label = label.take(starts_arr)
    seg_idx = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
    is_msg = np.asarray(pc.not_equal(nbr, _EMPTY_STR))
    dst_msg = nbr.filter(pa.array(is_msg))
    lbl_msg = seg_label.take(pa.array(seg_idx[is_msg]))
    dst_self = node.take(starts_arr)
    n_msg = int(is_msg.sum())
    return pa.table({
        "dst": pa.concat_arrays([dst_msg.combine_chunks()
                                 if isinstance(dst_msg, pa.ChunkedArray) else dst_msg,
                                 dst_self.combine_chunks()
                                 if isinstance(dst_self, pa.ChunkedArray) else dst_self]),
        "label": pa.concat_arrays([lbl_msg.combine_chunks()
                                   if isinstance(lbl_msg, pa.ChunkedArray) else lbl_msg,
                                   seg_label.combine_chunks()
                                   if isinstance(seg_label, pa.ChunkedArray) else seg_label]),
        # the self message carries the node's CURRENT label — flagging it
        # lets the min fold detect label changes in the same pass (the
        # former separate union+groupby convergence check was a full extra
        # exchange per round, measured at 5x the propagate cost)
        "selfm": pa.array(np.concatenate([
            np.zeros(n_msg, dtype=np.int8),
            np.ones(len(starts), dtype=np.int8)])),
    })


def _min_changed_bucket(bucket: pa.Table) -> pa.Table:
    """Pass 2 over one bucket sorted by (dst, label): per dst segment emit
    the min label plus a changed flag (min != the self message's label —
    min-label propagation is monotone non-increasing, so != means <)."""
    n = bucket.num_rows
    if n == 0:
        return pa.table({"node": pa.array([], type=pa.string()),
                         "label": pa.array([], type=pa.string()),
                         "chg": pa.array([], type=pa.int64())})
    dst = bucket.column("dst")
    label = bucket.column("label")
    if isinstance(label, pa.ChunkedArray):
        label = label.combine_chunks()
    starts = np.asarray(segment_starts(dst))
    selfm = np.asarray(bucket.column("selfm"), dtype=np.int8)
    self_pos = np.flatnonzero(selfm == 1)
    if len(self_pos) != len(starts):
        raise ValueError("label-prop contract: expected exactly one self "
                         "message per destination node")
    min_label = label.take(pa.array(starts))
    self_label = label.take(pa.array(self_pos))
    chg = pc.cast(pc.not_equal(min_label, self_label), pa.int64())
    return pa.table({"node": dst.take(pa.array(starts)),
                     "label": min_label, "chg": chg})


def connected_components(
    nodes,
    edges,
    cfg: PipelineConfig,
    num_partitions: int = 0,
    *,
    include_singletons: bool = True,
) -> "ray.data.Dataset":
    """nodes: Dataset with `record_id`; edges: Dataset with `id_a`,`id_b`.

    Returns Dataset (record_id, cluster_id), cluster_id = min record_id in the
    component. Vertices with no edges stay singleton clusters (REL anti-join
    analog: unlinked mentions, SURVEY §2.4). With
    ``include_singletons=False`` only edge-touched nodes are returned —
    downstream expand_clusters defaults missing reps to themselves, saving a
    full set-difference pass over the node table.
    """
    topo = _undirect(edges).materialize()
    all_nodes = nodes.map_batches(
        lambda t: pa.table({"node": t.column("record_id")}),
        batch_format="pyarrow", zero_copy_batch=True)
    if include_singletons:
        all_nodes = all_nodes.materialize()

    n_topo = topo.count()
    if n_topo == 0:
        if not include_singletons:
            return ray.data.from_arrow(pa.table({
                "record_id": pa.array([], type=pa.string()),
                "cluster_id": pa.array([], type=pa.string())}))
        return all_nodes.map_batches(
            lambda t: pa.table({"record_id": t.column("node"),
                                "cluster_id": t.column("node")}),
            batch_format="pyarrow", zero_copy_batch=True)

    if n_topo <= cfg.cc_local_max_edges:
        # small-graph fast path: after exact pre-clustering + thresholding the
        # representative graph is usually tiny relative to the corpus; the
        # distributed loop's per-round scheduling overhead would dominate.
        # A driver-side union-find gives the identical (min-label) answer in
        # one pass; the distributed loop below remains the path for graphs
        # that exceed the driver's memory budget.
        return _local_components(all_nodes, topo, include_singletons)

    active = topo.groupby("node").count().map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "label": t.column("node")}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_active = active.count()

    # Round structure (round-5 rework, measured at 6M turns / 32 CPUs:
    # 482 s -> see BENCH.md):
    #   1. propagate: one bucketed exchange emits every neighbor message
    #      plus a FLAGGED self message carrying the old label;
    #   2. min-fold: one bucketed exchange computes each node's new min
    #      label AND the changed flag in the same pass — the former
    #      union+groupby convergence check was a third full exchange per
    #      round measured at 5x the propagate cost;
    #   3. shortcut (SV pointer jumping): label' = label[label] via one
    #      cogroup hop — effective propagation distance DOUBLES per
    #      round, so diameter-d components converge in O(log d) rounds
    #      instead of d (a 20-deep coref chain took 14 of the 15 allowed
    #      rounds before; the cap is now a ~2^15-diameter backstop).
    import os as _os
    import time as _time

    from ..functions.rayutil import sever_lineage
    from ..stages.joins import cogroup_inner_join
    _prof = _os.environ.get("REL_RAY_PROFILE")
    done = False
    for _round in range(cfg.max_cc_iters):
        _t0 = _time.time()
        as_union_rows = active.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "nbr": pa.array([_EMPTY_STR] * t.num_rows, type=pa.string()),
                "label": t.column("label")}),
            batch_format="pyarrow", zero_copy_batch=True)
        msgs = bucketed_group_apply(
            as_union_rows.union(topo), "node", _propagate_bucket,
            num_buckets=cfg.num_buckets, sort_cols=[("nbr", "ascending")])
        new = bucketed_group_apply(
            msgs, "dst", _min_changed_bucket,
            num_buckets=cfg.num_buckets,
            sort_cols=[("label", "ascending")]).materialize()
        changed = new.sum("chg") or 0
        _t1 = _time.time()
        if changed == 0:
            # stable under neighbor-min => fixpoint; drop the flag column
            active = sever_lineage(new.map_batches(
                lambda t: t.select(["node", "label"]),
                batch_format="pyarrow", zero_copy_batch=True)
                .materialize())
            done = True
            if _prof:
                import sys as _sys
                print(f"[cc-round] {_round}: propagate+min "
                      f"{_t1 - _t0:.1f}s changed 0 (converged)",
                      file=_sys.stderr, flush=True)
            break
        lab_pairs = new.map_batches(
            lambda t: pa.table({"node": t.column("label"),
                                "orig": t.column("node"),
                                "olabel": t.column("label")}),
            batch_format="pyarrow", zero_copy_batch=True)
        jumped = cogroup_inner_join(
            lab_pairs,
            new.map_batches(lambda t: t.select(["node", "label"]),
                            batch_format="pyarrow", zero_copy_batch=True),
            key="node", right_cols=["label"], how="left",
            num_buckets=cfg.num_buckets)
        active = jumped.map_batches(
            lambda t: pa.table({
                "node": t.column("orig"),
                "label": pc.min_element_wise(
                    pc.coalesce(t.column("label"), t.column("olabel")),
                    t.column("olabel"))}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        # every round's two bucketed exchanges + the shortcut join emit
        # ~(input + topo) blocks, so the loop-carried state DOUBLES its
        # block count per round if left alone (measured 72->1692 blocks
        # in 4 rounds at constant rows, with geometric wall growth from
        # pure per-block task overhead) — compact before the next round
        if active.num_blocks() > 128:
            active = active.repartition(64).materialize()
        active = sever_lineage(active)
        if _prof:
            import sys as _sys
            print(f"[cc-round] {_round}: propagate+min {_t1 - _t0:.1f}s "
                  f"shortcut {_time.time() - _t1:.1f}s "
                  f"changed {changed} blocks {active.num_blocks()} "
                  f"rows {active.count()}",
                  file=_sys.stderr, flush=True)
    if not done:
        raise RuntimeError(
            f"connected_components did not converge in {cfg.max_cc_iters} "
            "rounds — with pointer-jumping that is a component diameter "
            f"past ~2^{cfg.max_cc_iters}; raise cfg.max_cc_iters")

    if not include_singletons:
        return active.map_batches(
            lambda t: pa.table({"record_id": t.column("node"),
                                "cluster_id": t.column("label")}),
            batch_format="pyarrow", zero_copy_batch=True)

    # passive nodes (no incident edge) are singleton clusters: vectorized set
    # difference via union + count
    passive = (
        all_nodes.union(active.map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow",
            zero_copy_batch=True))
        .groupby("node").count()
        .map_batches(
            lambda t: (lambda f: pa.table({"node": f.column("node"),
                                           "label": f.column("node")}))(
                t.filter(pc.equal(t.column("count()"), 1))),
            batch_format="pyarrow", zero_copy_batch=True))

    return active.union(passive).map_batches(
        lambda t: pa.table({"record_id": t.column("node"),
                            "cluster_id": t.column("label")}),
        batch_format="pyarrow", zero_copy_batch=True)


def _fastsv(ca: "np.ndarray", cb: "np.ndarray", n: int) -> "np.ndarray":
    """Vectorized min-label propagation over compact-coded edges (FastSV-
    style edge scatter-min + pointer doubling, O(log n) rounds of O(m)
    numpy work). Fixpoint parent[i] == min compact index in i's component.

    The endpoint layout never changes between rounds: sort it ONCE and do
    each round's scatter-min as gather + minimum.reduceat (buffered C)
    instead of np.minimum.at (unbuffered, ~10× slower per element)."""
    parent = np.arange(n, dtype=np.int64)
    idx = np.concatenate([ca, cb])
    order_e = np.argsort(idx, kind="stable")
    idx_sorted = idx[order_e]
    seg = np.flatnonzero(
        np.concatenate(([True], idx_sorted[1:] != idx_sorted[:-1])))
    touched = idx_sorted[seg]
    for _ in range(64):
        mn = np.minimum(parent[ca], parent[cb])
        before = parent
        parent = parent.copy()
        vals = np.concatenate([mn, mn])[order_e]
        parent[touched] = np.minimum(parent[touched],
                                     np.minimum.reduceat(vals, seg))
        while True:
            nl = parent[parent]
            if np.array_equal(nl, parent):
                break
            parent = nl
        if np.array_equal(parent, before):
            break
    else:  # pragma: no cover — min-propagation converges in <= log2(n) rounds
        raise RuntimeError("local components did not converge in 64 rounds")
    return parent


def connected_components_codes(edges, cfg: PipelineConfig):
    """Int-coded CC fast path: ``edges`` has int64 ``id_a``/``id_b`` CODE
    columns whose numeric order mirrors record_id order (the record_id-
    sorted rep table), so min-code labels ARE min-record_id labels.

    Collects the directed edge list to the driver (8 B/endpoint — 4-8×
    leaner than the string ids the general path dictionary-encodes) with
    an early size abort, and runs the shared _fastsv kernel over
    np.unique-compacted codes. Returns a driver pa.Table
    (code:int64, cluster_code:int64) covering edge-touched codes only
    (the include_singletons=False contract), or None when the topology
    exceeds cfg.cc_local_max_edges — caller falls back to the general
    distributed path on decoded ids.
    """
    cap = max(cfg.cc_local_max_edges // 2, 1)
    ca_parts, cb_parts, total = [], [], 0
    for b in edges.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        ca_parts.append(np.asarray(t.column("id_a"), dtype=np.int64))
        cb_parts.append(np.asarray(t.column("id_b"), dtype=np.int64))
        total += t.num_rows
        if total > cap:
            return None
    if total == 0:
        return pa.table({"code": pa.array([], type=pa.int64()),
                         "cluster_code": pa.array([], type=pa.int64())})
    ca = np.concatenate(ca_parts)
    cb = np.concatenate(cb_parts)
    nodes = np.unique(np.concatenate([ca, cb]))
    parent = _fastsv(np.searchsorted(nodes, ca),
                     np.searchsorted(nodes, cb), len(nodes))
    return pa.table({"code": pa.array(nodes),
                     "cluster_code": pa.array(nodes[parent])})


def _local_components(all_nodes, topo, include_singletons=True) -> "ray.data.Dataset":
    """Driver-side union-find over the (small) symmetric topology; singleton
    nodes (when requested) resolved distributed via union+count set difference."""
    import ray.data as rd

    edge_tab = pa.concat_tables(
        [pa.table(b).select(["node", "nbr"])
         for b in topo.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    # integer-encode node ids once so min-index root == min-id root. Both
    # steps are C, not Python-per-element — this function sits on the
    # DRIVER's critical path (the Amdahl serial term of the flagship):
    # (1) Arrow dictionary_encode + a sort of the UNIQUE ids replaces
    #     np.unique over millions of Python string objects;
    # (2) vectorized min-label propagation (FastSV-style edge scatter-min +
    #     pointer doubling, O(log n) rounds of O(m) numpy work) replaces the
    #     per-edge Python union-find loop. Fixpoint label == component-min
    #     index — identical output, measured ~10× faster at 10^6 edges.
    m = len(edge_tab)

    def _flat(col):
        # ChunkedArray.combine_chunks() returns a plain Array (pyarrow >= 14)
        return (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                else col)

    both = pa.concat_arrays([_flat(edge_tab.column("node")),
                             _flat(edge_tab.column("nbr"))])
    enc = pc.dictionary_encode(both)
    order = pc.sort_indices(enc.dictionary)
    uniq = enc.dictionary.take(order)
    rank = np.empty(len(order), dtype=np.int64)
    rank[np.asarray(order, dtype=np.int64)] = np.arange(len(order))
    codes = rank[np.asarray(enc.indices, dtype=np.int64)]
    ca, cb = codes[:m], codes[m:]
    parent = _fastsv(ca, cb, len(uniq))
    labels = pa.table({
        "record_id": uniq,
        "cluster_id": uniq.take(pa.array(parent)),
    })
    active_ds = rd.from_arrow(labels.rename_columns(["node", "label"]))
    if not include_singletons:
        return active_ds.map_batches(
            lambda t: t.rename_columns(["record_id", "cluster_id"]),
            batch_format="pyarrow", zero_copy_batch=True)

    passive = (
        all_nodes.union(active_ds.map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow",
            zero_copy_batch=True))
        .groupby("node").count()
        .map_batches(
            lambda t: (lambda f: pa.table({"node": f.column("node"),
                                           "label": f.column("node")}))(
                t.filter(pc.equal(t.column("count()"), 1))),
            batch_format="pyarrow", zero_copy_batch=True))
    return active_ds.union(passive).map_batches(
        lambda t: pa.table({"record_id": t.column("node"),
                            "cluster_id": t.column("label")}),
        batch_format="pyarrow", zero_copy_batch=True)


# optional per-rep confidence columns propagated through cluster expansion
# (name → (arrow type, default)); see pipelines/linkage._cluster_conf_table
_CONF_COLS = {"best_score": (pa.float32(), 0.0), "n_links": (pa.int32(), 0)}


def expand_clusters(records_with_rep, rep_clusters, num_partitions: int = 0,
                    *, num_buckets: int = 64,
                    broadcast_max_rows: int = 2_000_000):
    """Every record inherits its exact-group representative's cluster.

    The rep→cluster map is small by construction (one row per representative
    that touched an edge); it is broadcast via ray.put and applied in a
    stateless map_batches — reps missing from the map are singletons and
    cluster to themselves. Above `broadcast_max_rows` a bucketed co-group of
    the records table runs instead. When `rep_clusters` carries the optional
    confidence columns (best_score / n_links) they are propagated to every
    member record, defaulting to 0 for edge-untouched reps.
    """
    import ray as _ray

    from ..functions.rayutil import collect_table, dict_lookup, get_broadcast_dict

    rc = rep_clusters.materialize()
    extras = [c for c in _CONF_COLS if c in rc.schema().names]
    if rc.count() > broadcast_max_rows:
        return _expand_clusters_cogroup(records_with_rep, rc, extras,
                                        num_buckets=num_buckets)
    # broadcast the Arrow table; workers build the dict once per process
    _schema = pa.schema([("record_id", pa.string()),
                         ("cluster_id", pa.string())]
                        + [(c, _CONF_COLS[c][0]) for c in extras])
    ref = _ray.put(collect_table(rc, _schema).select(
        ["record_id", "cluster_id", *extras]))

    def attach(t: pa.Table) -> pa.Table:
        d = get_broadcast_dict(ref, "record_id", "cluster_id")
        out = {
            "record_id": t.column("record_id"),
            "cluster_id": dict_lookup(t.column("rep_id"), d,
                                      default_to_key=True),
        }
        for c in extras:
            typ, dflt = _CONF_COLS[c]
            cd = get_broadcast_dict(ref, "record_id", c)
            out[c] = dict_lookup(t.column("rep_id"), cd, default=dflt,
                                 value_type=typ)
        return pa.table(out)

    return records_with_rep.map_batches(attach, batch_format="pyarrow",
                                        zero_copy_batch=True)


def _expand_clusters_cogroup(records_with_rep, rep_clusters, extras=(), *,
                             num_buckets: int = 64):
    """Fallback for giant rep graphs: bucketed co-group on rep_id (cluster
    rows sort first in each segment; members take the segment head's cluster
    and confidence columns, defaulting to self/0 for singleton segments)."""
    extras = list(extras)

    def member_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        out = {"key": t.column("rep_id"),
               "payload": t.column("record_id")}
        for c in extras:
            typ, dflt = _CONF_COLS[c]
            out[c] = pa.array([dflt] * n, type=typ)
        out["side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(out)

    def cluster_side(t: pa.Table) -> pa.Table:
        out = {"key": t.column("record_id"),
               "payload": t.column("cluster_id")}
        for c in extras:
            out[c] = pc.cast(t.column(c), _CONF_COLS[c][0])
        out["side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(out)

    members = records_with_rep.map_batches(member_side, batch_format="pyarrow",
                                           zero_copy_batch=True)
    crows = rep_clusters.map_batches(cluster_side, batch_format="pyarrow",
                                     zero_copy_batch=True)

    def assign(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table(
                {"record_id": pa.array([], type=pa.string()),
                 "cluster_id": pa.array([], type=pa.string()),
                 **{c: pa.array([], type=_CONF_COLS[c][0]) for c in extras}})
        starts = segment_starts(bucket.column("key"))
        lens = np.diff(np.append(starts, n))
        side = np.asarray(bucket.column("side"))
        payload = bucket.column("payload")
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        seg_has_cluster = side[starts] == 1  # cluster rows sort first (desc)
        key_col = bucket.column("key")
        if isinstance(key_col, pa.ChunkedArray):
            key_col = key_col.combine_chunks()
        has = pa.array(seg_has_cluster)
        sa = pa.array(starts)
        seg_cluster = pc.if_else(has, payload.take(sa), key_col.take(sa))
        seg_idx = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        member_mask = side == 0
        take_idx = pa.array(seg_idx[member_mask])
        rec = payload.filter(pa.array(member_mask))
        out = {"record_id": rec, "cluster_id": seg_cluster.take(take_idx)}
        for c in extras:
            typ, dflt = _CONF_COLS[c]
            col = bucket.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            seg_val = pc.if_else(has, col.take(sa), pa.scalar(dflt, typ))
            out[c] = seg_val.take(take_idx)
        return pa.table(out)

    return bucketed_group_apply(
        members.union(crows), "key", assign,
        num_buckets=num_buckets, sort_cols=[("side", "descending")])


def bridge_edges(edges, *, cluster_col: str = "cluster_id",
                 src: str = "id_a", dst: str = "id_b",
                 max_cluster_edges: int = 100_000,
                 num_buckets: int = 64):
    """Bridges (cut edges) of each cluster's internal graph — Tarjan's
    low-link bridge finding (Tarjan 1974). The ER repair primitive: a
    linkage cluster held together by ONE low-confidence edge is a merge
    candidate for clerical review; dropping a bridge splits the entity,
    dropping a non-bridge never does. Input rows: (cluster, u, v); output
    rows: the subset that are bridges, same columns.

    Scale shape: one bucket exchange on the cluster id — every cluster's
    edges land in one bucket call. Within a bucket the DFS is per
    CLUSTER, not per row, and entity clusters are small by construction
    (block caps upstream bound them); a cluster wider than
    ``max_cluster_edges`` raises rather than silently degrading — split
    it upstream (it is almost certainly conflated) before asking for its
    bridges. The DFS is iterative (no recursion limit)."""
    from ..functions.rayutil import bucketed_group_apply, segment_starts

    def per_bucket(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return bucket
        import numpy as np
        starts = np.asarray(segment_starts(bucket.column(cluster_col)))
        lens = np.diff(np.append(starts, n))
        if lens.max(initial=0) > max_cluster_edges:
            raise ValueError(
                f"cluster with {int(lens.max())} edges exceeds "
                f"max_cluster_edges={max_cluster_edges} — conflated "
                f"cluster; split upstream before bridge analysis")
        ua = bucket.column(src)
        va = bucket.column(dst)
        if isinstance(ua, pa.ChunkedArray):
            ua = ua.combine_chunks()
        if isinstance(va, pa.ChunkedArray):
            va = va.combine_chunks()
        keep = np.zeros(n, dtype=bool)
        for s0, ln in zip(starts, lens):
            us = ua.slice(s0, ln).to_pylist()
            vs = va.slice(s0, ln).to_pylist()
            adj: dict = {}
            for i, (x, y) in enumerate(zip(us, vs)):
                if x == y:
                    continue
                adj.setdefault(x, []).append((y, i))
                adj.setdefault(y, []).append((x, i))
            disc: dict = {}
            low: dict = {}
            timer = 0
            for root in adj:
                if root in disc:
                    continue
                # iterative Tarjan: stack of (node, parent_edge, iterator)
                stack = [(root, -1, iter(adj[root]))]
                disc[root] = low[root] = timer
                timer += 1
                while stack:
                    node, pedge, it = stack[-1]
                    advanced = False
                    for nxt, eidx in it:
                        if eidx == pedge:
                            continue
                        if nxt not in disc:
                            disc[nxt] = low[nxt] = timer
                            timer += 1
                            stack.append((nxt, eidx, iter(adj[nxt])))
                            advanced = True
                            break
                        low[node] = min(low[node], disc[nxt])
                    if not advanced:
                        stack.pop()
                        if stack:
                            parent = stack[-1][0]
                            low[parent] = min(low[parent], low[node])
                            if low[node] > disc[parent]:
                                keep[s0 + pedge] = True
        return bucket.filter(pa.array(keep))

    return bucketed_group_apply(edges, cluster_col, per_bucket,
                                num_buckets=num_buckets)
