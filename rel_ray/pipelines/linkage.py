"""The flagship pipeline: transcripts → clusters (SURVEY §3.5 lifecycle).

Stage graph (the wide records table is shuffled exactly once):

  read_parquet(transcripts)
    → conversation_stage          [conv_id]   bucketed sort-shuffle #1;
                                              mention detection + ctx windows
                                              + coref scan run in-bucket
    → records_stage                           stateless filter/project
    → grouped_min(mention_norm)               skinny bucketed aggregate →
                                              rep map, broadcast via ray.put
    → reps → blocking → pairs     [block_key] bucketed shuffles over skinny
                                              pair rows (windowed, capped)
    → scoring_stage                           task-pool map_batches with
                                              per-process scorer state
    → coref edges                             broadcast-map resolution
    → connected_components                    driver union-find (small graph)
                                              or bucketed label propagation
    → cluster expansion                       broadcast rep→cluster map

Every broadcast step has a bucketed co-group fallback guarded by
broadcast_max_rows for vocabularies too large for the object store. Never
calls ray.init (driver contract).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages.blocking import blocking_stage, exact_precluster, records_stage
from ..stages.clustering import connected_components, expand_clusters
from ..stages.conversation import conversation_stage
from ..stages.normalize import mention_stage
from ..stages.pairs import pairs_stage
from ..stages.scoring import scoring_stage


def _coref_edges(records, reps, num_partitions: int = 0, *,
                 broadcast_max_rows: int = 2_000_000, num_buckets: int = 64):
    """with_coref analog: (rep(coref_prev), rep(record)) forced-match edges.

    The source side's rep is already a record column (rep_id); only the
    TARGET mention needs rep resolution. The mention→rep map is the (small)
    representative table, so it is broadcast once via ray.put and applied in
    a stateless map_batches — no corpus-wide shuffle. Above
    `broadcast_max_rows` the resolution falls back to a bucketed co-group.
    """
    import numpy as np

    import ray as _ray

    n_reps = reps.count()
    if n_reps > broadcast_max_rows:
        return _coref_edges_cogroup(records, num_buckets=num_buckets)

    lookup: dict[str, str] = {}
    for b in reps.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        lookup.update(zip(t.column("mention_norm").to_pylist(),
                          t.column("record_id").to_pylist()))
    ref = _ray.put(lookup)

    from ..functions.rayutil import get_broadcast

    def resolve(t: pa.Table) -> pa.Table:
        rows = t.filter(pc.not_equal(t.column("coref_prev_mn"), ""))
        if rows.num_rows == 0:
            return pa.table({"id_a": pa.array([], type=pa.string()),
                             "id_b": pa.array([], type=pa.string())})
        table = get_broadcast(ref)
        rep_b = rows.column("rep_id")
        rep_a = pa.array([table.get(mn, "") for mn in
                          rows.column("coref_prev_mn").to_pylist()],
                         type=pa.string())
        lo = pc.min_element_wise(rep_a, rep_b)
        hi = pc.max_element_wise(rep_a, rep_b)
        out = pa.table({"id_a": lo, "id_b": hi})
        out = out.filter(pc.not_equal(out.column("id_a"), ""))
        return out.filter(pc.not_equal(out.column("id_a"), out.column("id_b")))

    return records.map_batches(resolve, batch_format="pyarrow",
                               zero_copy_batch=True)


def _coref_edges_cogroup(records, *, num_buckets: int = 64):
    """Fallback for giant mention vocabularies: bucketed co-group on the
    coref target's record_id (target rows sort first; sources take the
    segment head's rep)."""
    import numpy as np

    from ..functions.rayutil import bucketed_group_apply, segment_starts

    targets = records.map_batches(
        lambda t: pa.table({"key": t.column("record_id"),
                            "rep": t.column("rep_id"),
                            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8))}),
        batch_format="pyarrow", zero_copy_batch=True)

    def source_fn(t: pa.Table) -> pa.Table:
        out = pa.table({"key": t.column("coref_prev"),
                        "rep": t.column("rep_id"),
                        "side": pa.array(np.ones(t.num_rows, dtype=np.int8))})
        return out.filter(pc.not_equal(out.column("key"), ""))
    sources = records.map_batches(source_fn, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def emit_edges(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({"id_a": pa.array([], type=pa.string()),
                             "id_b": pa.array([], type=pa.string())})
        starts = segment_starts(bucket.column("key"))
        lens = np.diff(np.append(starts, n))
        side = np.asarray(bucket.column("side"))
        rep = bucket.column("rep")
        if isinstance(rep, pa.ChunkedArray):
            rep = rep.combine_chunks()
        seg_has_target = side[starts] == 0
        seg_target_rep = rep.take(pa.array(starts))
        seg_idx = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        src_mask = (side == 1) & seg_has_target[seg_idx]
        rep_src = rep.filter(pa.array(src_mask))
        rep_tgt = seg_target_rep.take(pa.array(seg_idx[src_mask]))
        lo = pc.min_element_wise(rep_src, rep_tgt)
        hi = pc.max_element_wise(rep_src, rep_tgt)
        out = pa.table({"id_a": lo, "id_b": hi})
        return out.filter(pc.not_equal(out.column("id_a"), out.column("id_b")))

    return bucketed_group_apply(
        targets.union(sources), "key", emit_edges,
        num_buckets=num_buckets, sort_cols=[("side", "ascending")])


def run_linkage(
    transcripts,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    num_partitions: int = 16,
    broadcast_max_rows: int = 2_000_000,
):
    """Returns dict of lazily-composed Datasets:
    records / pairs / edges / clusters.

    Broadcast fast path (mention vocabulary ≤ broadcast_max_rows, the normal
    case after exact pre-clustering): the rep map (mention_norm → min
    record_id) lives as one broadcast dict; reps, coref edges and cluster
    expansion all derive from it with stateless map_batches — the wide
    records table is shuffled exactly once (the conversation stage). Larger
    vocabularies fall back to the bucketed co-group stages.
    """
    import ray as _ray
    import ray.data as rd

    # mentions are derived inside the conversation buckets (post-shuffle):
    # the conv_id exchange carries only the six raw transcript columns
    turns = conversation_stage(transcripts, cfg)
    # one materialization of the wide records — the conversation shuffle runs
    # exactly once; everything after is skinny aggregates + broadcast lookups
    # coalesce: the bucket groupby emits ~num_buckets small blocks; merging
    # to ~64 keeps downstream per-task overhead low across the three passes
    # that re-read records0
    records0 = records_stage(turns, cfg).repartition(64).materialize()

    from ..functions.rayutil import grouped_min
    rep_map = grouped_min(records0, "mention_norm", "record_id",
                          num_buckets=cfg.num_buckets).materialize()

    if rep_map.count() > broadcast_max_rows:
        return _run_linkage_cogroup(records0, turns, cfg, num_partitions)

    _empty_rep = pa.table({"mention_norm": pa.array([], type=pa.string()),
                           "record_id": pa.array([], type=pa.string())})
    rep_tab = pa.concat_tables(
        [_empty_rep] + [pa.table(b)
                        for b in rep_map.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    rep_dict = dict(zip(rep_tab.column("mention_norm").to_pylist(),
                        rep_tab.column("record_id").to_pylist()))
    rep_ref = _ray.put(rep_dict)

    from ..functions.rayutil import get_broadcast

    def attach_rep(t: pa.Table) -> pa.Table:
        table = get_broadcast(rep_ref)
        return t.append_column(
            "rep_id",
            pa.array([table[m] for m in t.column("mention_norm").to_pylist()],
                     type=pa.string()))

    records = records0.map_batches(attach_rep, batch_format="pyarrow",
                                   zero_copy_batch=True)

    # split the in-memory reps table into many blocks — a single block would
    # serialize the whole blocking/pairing fan-out into one task
    rep_sel = rep_tab.select(["record_id", "mention_norm"])
    chunk = max(1024, rep_sel.num_rows // 64 + 1)
    reps = rd.from_arrow([rep_sel.slice(i, chunk)
                          for i in range(0, max(rep_sel.num_rows, 1), chunk)])

    blocks = blocking_stage(reps, cfg)
    pairs = pairs_stage(blocks, cfg, num_partitions)
    # materialize edges: consumed twice (match filter + user output)
    edges = scoring_stage(pairs, cfg).materialize()

    matched = edges.map_batches(
        lambda t: t.filter(t.column("is_match")).select(["id_a", "id_b"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def coref_resolve(t: pa.Table) -> pa.Table:
        rows = t.filter(pc.not_equal(t.column("coref_prev_mn"), ""))
        if rows.num_rows == 0:
            return pa.table({"id_a": pa.array([], type=pa.string()),
                             "id_b": pa.array([], type=pa.string())})
        table = get_broadcast(rep_ref)
        rep_b = pa.array([table[m] for m in
                          rows.column("mention_norm").to_pylist()],
                         type=pa.string())
        rep_a = pa.array([table.get(mn, "") for mn in
                          rows.column("coref_prev_mn").to_pylist()],
                         type=pa.string())
        lo = pc.min_element_wise(rep_a, rep_b)
        hi = pc.max_element_wise(rep_a, rep_b)
        out = pa.table({"id_a": lo, "id_b": hi})
        out = out.filter(pc.not_equal(out.column("id_a"), ""))
        return out.filter(pc.not_equal(out.column("id_a"), out.column("id_b")))

    coref = records0.map_batches(coref_resolve, batch_format="pyarrow",
                                 zero_copy_batch=True)
    all_edges = matched.union(coref)

    rep_clusters = connected_components(reps, all_edges, cfg, num_partitions,
                                        include_singletons=False)

    # cluster expansion: rep→cluster is small (edge-touched reps only);
    # compose with the rep dict so records0 maps straight to clusters
    rc = rep_clusters.materialize()
    cl_dict: dict[str, str] = {}
    for b in rc.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        cl_dict.update(zip(t.column("record_id").to_pylist(),
                           t.column("cluster_id").to_pylist()))
    cl_ref = _ray.put(cl_dict)

    def to_cluster(t: pa.Table) -> pa.Table:
        reps_l = get_broadcast(rep_ref)
        cls = get_broadcast(cl_ref)
        out = []
        for m in t.column("mention_norm").to_pylist():
            r = reps_l[m]
            out.append(cls.get(r, r))
        return pa.table({"record_id": t.column("record_id"),
                         "cluster_id": pa.array(out, type=pa.string())})

    clusters = records0.map_batches(to_cluster, batch_format="pyarrow",
                                    zero_copy_batch=True)
    return {
        "turns": turns,
        "records": records,
        "pairs": pairs,
        "edges": edges,
        "clusters": clusters,
    }


def _run_linkage_cogroup(records0, turns, cfg: PipelineConfig,
                         num_partitions: int):
    """Shuffle-based path for mention vocabularies too large to broadcast."""
    records = exact_precluster(records0, cfg, num_partitions).materialize()

    reps = records.map_batches(
        lambda t: t.filter(pc.equal(t.column("record_id"), t.column("rep_id"))).select(
            ["record_id", "mention_norm"]),
        batch_format="pyarrow", zero_copy_batch=True)

    blocks = blocking_stage(reps, cfg)
    pairs = pairs_stage(blocks, cfg, num_partitions)
    edges = scoring_stage(pairs, cfg).materialize()

    matched = edges.map_batches(
        lambda t: t.filter(t.column("is_match")).select(["id_a", "id_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    all_edges = matched.union(_coref_edges(records, reps, num_partitions))

    rep_clusters = connected_components(reps, all_edges, cfg, num_partitions,
                                        include_singletons=False)
    clusters = expand_clusters(records, rep_clusters, num_partitions,
                               num_buckets=cfg.num_buckets)
    return {
        "turns": turns,
        "records": records,
        "pairs": pairs,
        "edges": edges,
        "clusters": clusters,
    }
