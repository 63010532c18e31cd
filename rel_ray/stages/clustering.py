"""S7: transitive clustering — iterative min-label propagation over shuffles.

REL analog: the *global* coherence model (``REL:src/REL/mulrel_ranker.py``,
Le & Titov ment-norm iterations) plus the ``with_coref`` heuristic — a joint
assignment consistent across records becomes connected components over
accepted edges.

Algorithm (deterministic, join-free — see rel_ray.functions.rayutil for why
``Dataset.join`` is avoided): label(v) := v initially; each round is two
sort-shuffle groupbys over the union of the label table and the static
undirected topology:

  pass 1  groupby(node):  the group holds the node's single label row plus
          its adjacency rows → emit (dst=nbr, label) messages + the
          (dst=node, label, is_self) row
  pass 2  groupby(dst):   new = min(labels seen); old = the is_self row's
          label; emit (node, new, changed)

``sum(changed) == 0`` stops the loop. Because pair generation emits star
bridges (stages/pairs.py), component diameters are small and the loop
converges in a handful of rounds; `max_cc_iters` is a loud-failure cap.
Labels are re-materialized per round — O(#representatives), not O(input).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import PipelineConfig

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


def _propagate(group: pa.Table) -> pa.Table:
    """pass 1: one group per ACTIVE node — broadcast its label to neighbors.

    The group holds the node's single label row (nbr == "") plus its
    adjacency rows; emits one message per neighbor plus the self message.
    """
    labels = group.column("label")
    is_label_row = pc.not_equal(labels, _EMPTY_STR)
    label = pc.filter(labels, is_label_row)[0].as_py()
    nbrs = pc.filter(group.column("nbr"), pc.invert(is_label_row))
    if isinstance(nbrs, pa.ChunkedArray):
        nbrs = nbrs.combine_chunks()
    n = len(nbrs) + 1
    dst = pa.concat_arrays([nbrs, pa.array([group.column("node")[0].as_py()])])
    return pa.table({
        "dst": dst,
        "label": pa.array([label] * n, type=pa.string()),
    })


def connected_components(
    nodes,
    edges,
    cfg: PipelineConfig,
    num_partitions: int = 0,
) -> "ray.data.Dataset":
    """nodes: Dataset with `record_id`; edges: Dataset with `id_a`,`id_b`.

    Returns Dataset (record_id, cluster_id) where cluster_id = min record_id
    in the component. Vertices with no edges stay singleton clusters
    (REL anti-join analog: unlinked mentions, SURVEY §2.4) and never enter
    the loop: only edge-touched ("active") nodes iterate, so per-group Python
    in pass 1 is bounded by the candidate-edge structure, not the corpus.
    Pass 2 (groupby-min) and convergence counting are fully vectorized.
    """
    topo = _undirect(edges).materialize()
    all_nodes = nodes.map_batches(
        lambda t: pa.table({"node": t.column("record_id")}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    if topo.count() == 0:
        return all_nodes.map_batches(
            lambda t: pa.table({"record_id": t.column("node"),
                                "cluster_id": t.column("node")}),
            batch_format="pyarrow", zero_copy_batch=True)

    # active = distinct edge-touched nodes; initial label(v) = v
    active = topo.groupby("node").count().map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "label": t.column("node")}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_active = active.count()

    done = False
    for _ in range(cfg.max_cc_iters):
        as_union_rows = active.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "nbr": pa.array([_EMPTY_STR] * t.num_rows, type=pa.string()),
                "label": t.column("label")}),
            batch_format="pyarrow", zero_copy_batch=True)
        msgs = as_union_rows.union(topo).groupby("node").map_groups(
            _propagate, batch_format="pyarrow")
        new = msgs.groupby("dst").min("label").map_batches(
            lambda t: t.rename_columns(["node", "label"]),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        # vectorized convergence count: a (node,label) row present in BOTH old
        # and new appears twice in the union → unchanged
        common = (
            active.union(new).groupby(["node", "label"]).count()
            .map_batches(lambda t: t.filter(pc.equal(t.column("count()"), 2)),
                         batch_format="pyarrow", zero_copy_batch=True)
            .count())
        active = new
        if n_active - common == 0:
            done = True
            break
    if not done:
        raise RuntimeError(
            f"connected_components did not converge in {cfg.max_cc_iters} rounds — "
            "component diameter exceeds the star-bridge design assumption")

    # passive nodes (no incident edge) are singleton clusters: union all nodes
    # with active nodes; count==1 ⇒ passive (vectorized set difference)
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


def expand_clusters(records_with_rep, rep_clusters, num_partitions: int = 0):
    """Every record inherits its exact-group representative's cluster.

    Join-free co-group on rep_id: side M = (key=rep_id, payload=record_id),
    side C = (key=rep record_id, payload=cluster_id); one sort-shuffle.
    """
    members = records_with_rep.map_batches(
        lambda t: pa.table({
            "key": t.column("rep_id"),
            "payload": t.column("record_id"),
            "is_cluster_row": pa.array(np.zeros(t.num_rows, dtype=bool))}),
        batch_format="pyarrow", zero_copy_batch=True)
    crows = rep_clusters.map_batches(
        lambda t: pa.table({
            "key": t.column("record_id"),
            "payload": t.column("cluster_id"),
            "is_cluster_row": pa.array(np.ones(t.num_rows, dtype=bool))}),
        batch_format="pyarrow", zero_copy_batch=True)

    def assign(group: pa.Table) -> pa.Table:
        mask = group.column("is_cluster_row")
        cluster = pc.filter(group.column("payload"), mask)
        member_ids = pc.filter(group.column("payload"), pc.invert(mask))
        if len(cluster) == 0 or len(member_ids) == 0:
            return pa.table({"record_id": pa.array([], type=pa.string()),
                             "cluster_id": pa.array([], type=pa.string())})
        cid = cluster[0].as_py()
        return pa.table({
            "record_id": member_ids,
            "cluster_id": pa.array([cid] * len(member_ids), type=pa.string()),
        })

    return members.union(crows).groupby("key").map_groups(
        assign, batch_format="pyarrow")
