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
from ..stages.blocking import exact_precluster, records_stage
from ..stages.clustering import (connected_components,
                                 connected_components_codes, expand_clusters)
from ..stages.conversation import conversation_stage
from ..stages.pairs import pairs_stage
from ..stages.scoring import scoring_stage

from ..functions.rayutil import phase_timer as _phase_timer


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

    from ..functions.rayutil import collect_table, dict_lookup, get_broadcast_dict

    rep_schema = pa.schema([("mention_norm", pa.string()),
                            ("record_id", pa.string())])
    ref = _ray.put(collect_table(reps, rep_schema).select(
        ["mention_norm", "record_id"]))

    def resolve(t: pa.Table) -> pa.Table:
        rows = t.filter(pc.not_equal(t.column("coref_prev_mn"), ""))
        if rows.num_rows == 0:
            return pa.table({"id_a": pa.array([], type=pa.string()),
                             "id_b": pa.array([], type=pa.string())})
        table = get_broadcast_dict(ref, "mention_norm", "record_id")
        rep_b = rows.column("rep_id")
        rep_a = dict_lookup(rows.column("coref_prev_mn"), table, default="")
        lo = pc.min_element_wise(rep_a, rep_b)
        hi = pc.max_element_wise(rep_a, rep_b)
        out = pa.table({"id_a": lo, "id_b": hi})
        out = out.filter(pc.not_equal(out.column("id_a"), ""))
        return out.filter(pc.not_equal(out.column("id_a"), out.column("id_b")))

    return records.map_batches(resolve, batch_format="pyarrow",
                               zero_copy_batch=True)


_CONF_SCHEMA = pa.schema([("record_id", pa.string()),
                          ("best_score", pa.float32()),
                          ("n_links", pa.int32())])


def _edge_confidence(matched_edges, num_buckets: int = 512):
    """Per-representative confidence from the MATCHED edges (REL conf_ed
    analog, REL:src/REL/utils.py::process_results — the score of the chosen
    assignment): best accepted-edge score + accepted-edge degree. Operates
    on the matched subset only — the full candidate-edge set is orders of
    magnitude larger and shuffling it for a confidence column was a measured
    28 s regression at 3.6M turns. Skinny bucketed argmax."""
    import numpy as np

    from ..functions.rayutil import bucketed_group_apply, segment_starts

    def explode(t: pa.Table) -> pa.Table:
        score = pc.cast(t.column("score"), pa.float32())
        return pa.concat_tables([
            pa.table({"rec": t.column("id_a"), "score": score}),
            pa.table({"rec": t.column("id_b"), "score": score}),
        ])

    both = matched_edges.map_batches(explode, batch_format="pyarrow",
                                     zero_copy_batch=True)

    def agg(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            # derive the id type from the bucket: the coded path runs this
            # aggregate over int64 rep codes, the plug-in path over strings
            return pa.table({
                "record_id": pa.array([], type=bucket.column("rec").type),
                "best_score": pa.array([], type=pa.float32()),
                "n_links": pa.array([], type=pa.int32())})
        starts = segment_starts(bucket.column("rec"))
        lens = np.diff(np.append(starts, n)).astype(np.int32)
        sa = pa.array(starts)
        return pa.table({
            "record_id": bucket.column("rec").take(sa),
            "best_score": bucket.column("score").take(sa),  # sorted desc
            "n_links": pa.array(lens),
        })

    return bucketed_group_apply(both, "rec", agg, num_buckets=num_buckets,
                                sort_cols=[("score", "descending")])


def _dense_cluster_arrays(cl_codes: pa.Table, matched_scored,
                          vocab_n: int):
    """Coded twin of ``_cluster_conf_table``, as three DENSE vocab-length
    numpy arrays (cluster_code:int64 defaulting to self — singleton reps
    are their own cluster — plus best_score:float32 / n_links:int32
    defaulting to 0): built with vectorized scatters from the coded
    rep→cluster map and the coded per-rep confidence aggregate, then
    broadcast once. Workers index them directly (to_cluster), so no string
    table and no per-process Python dict ever exists on this path."""
    import numpy as np

    from ..functions.rayutil import collect_table

    conf_schema = pa.schema([("record_id", pa.int64()),
                             ("best_score", pa.float32()),
                             ("n_links", pa.int32())])
    conf_tab = collect_table(_edge_confidence(matched_scored), conf_schema)
    cluster_code = np.arange(vocab_n, dtype=np.int64)
    cluster_code[np.asarray(cl_codes.column("code"), dtype=np.int64)] = \
        np.asarray(cl_codes.column("cluster_code"), dtype=np.int64)
    bs = np.zeros(vocab_n, dtype=np.float32)
    nl = np.zeros(vocab_n, dtype=np.int32)
    cc = np.asarray(conf_tab.column("record_id"), dtype=np.int64)
    bs[cc] = np.asarray(conf_tab.column("best_score"), dtype=np.float32)
    nl[cc] = np.asarray(conf_tab.column("n_links"), dtype=np.int32)
    return cluster_code, bs, nl


def _cluster_conf_table(rep_clusters, matched_edges) -> pa.Table:
    """Driver-side merge of the (small) rep→cluster map with per-rep
    matched-edge confidence: (record_id, cluster_id, best_score, n_links),
    nulls filled (cluster defaults to self, confidence to 0)."""
    from ..functions.rayutil import collect_table

    cl_schema = pa.schema([("record_id", pa.string()),
                           ("cluster_id", pa.string())])
    cl_tab = collect_table(rep_clusters, cl_schema)
    conf_tab = collect_table(_edge_confidence(matched_edges), _CONF_SCHEMA)
    # pa.Table.join is the in-process Acero join on two SMALL driver tables —
    # not Ray's Dataset.join (avoided engine-wide, see functions/rayutil.py)
    merged = cl_tab.join(conf_tab, keys="record_id", join_type="full outer")
    rid = merged.column("record_id")
    return pa.table({
        "record_id": rid,
        "cluster_id": pc.coalesce(merged.column("cluster_id"), rid),
        "best_score": pc.fill_null(
            pc.cast(merged.column("best_score"), pa.float32()),
            pa.scalar(0.0, pa.float32())),
        "n_links": pc.fill_null(pc.cast(merged.column("n_links"), pa.int32()),
                                pa.scalar(0, pa.int32())),
    })


def _cluster_conf_ds(rep_clusters, matched_edges, *, num_buckets: int = 256):
    """Distributed twin of ``_cluster_conf_table`` for the large-vocabulary
    path: full-outer co-group of the rep→cluster map with the per-rep edge
    confidence — NO driver collection anywhere (the broadcast fast path's
    premise "this table is small" is exactly what the fallback can't
    assume). Both sides are unique per record_id so the join is 1:1; nulls
    fill to self-cluster / zero-confidence, matching the driver-side twin
    byte for byte."""
    from ..stages.joins import cogroup_join_multi

    merged = cogroup_join_multi(
        rep_clusters, _edge_confidence(matched_edges, num_buckets),
        key="record_id", left_cols=["cluster_id"],
        right_cols=["best_score", "n_links"], num_buckets=num_buckets,
        how="full",
        left_schema=pa.schema([("record_id", pa.string()),
                               ("cluster_id", pa.string())]),
        right_schema=_CONF_SCHEMA)

    def fill(t: pa.Table) -> pa.Table:
        rid = t.column("record_id")
        return pa.table({
            "record_id": rid,
            "cluster_id": pc.coalesce(t.column("cluster_id"), rid),
            "best_score": pc.fill_null(
                pc.cast(t.column("best_score"), pa.float32()),
                pa.scalar(0.0, pa.float32())),
            "n_links": pc.fill_null(pc.cast(t.column("n_links"), pa.int32()),
                                    pa.scalar(0, pa.int32())),
        })

    return merged.map_batches(fill, batch_format="pyarrow",
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


def _match_filtered(edges, match_rule, id_cols=("id_a", "id_b")):
    """(matched, matched_scored) edge views under the match decision.

    ``match_rule`` is the linkage's DECISION seam: None keeps the scorer's
    ``is_match`` column (score >= cfg.threshold); otherwise it is a factory
    called ONCE with the materialized edges dataset (it may run its own
    passes, e.g. the Fellegi-Sunter EM fit in eval.fs_match_rule) and must
    return a per-batch boolean-filter fn over the edge columns (in the
    default coded path the identifier columns are int64 ``code_a/code_b``;
    the similarity/score columns are unchanged).

    ``id_cols`` names the identifier pair in ``edges``; outputs are always
    renamed to (id_a, id_b[, score]) so downstream confidence/CC stages are
    layout-agnostic."""
    if match_rule is None:
        def fltr(t: pa.Table):
            return t.column("is_match")
    else:
        fltr = match_rule(edges)
    a, b = id_cols
    matched = edges.map_batches(
        lambda t: t.filter(fltr(t)).select([a, b])
        .rename_columns(["id_a", "id_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    matched_scored = edges.map_batches(
        lambda t: t.filter(fltr(t)).select([a, b, "score"])
        .rename_columns(["id_a", "id_b", "score"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return matched, matched_scored


def run_linkage(
    transcripts,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    num_partitions: int = 16,
    broadcast_max_rows: int = 2_000_000,
    scorer=None,
    scorer_kwargs: dict | None = None,
    match_rule=None,
):
    """Returns dict of lazily-composed Datasets:
    records / pairs / edges / clusters.

    ``scorer``/``scorer_kwargs``: optional protocols.PairScorer plug-in
    class forwarded to scoring_stage (actor-pool scheduled — model load
    once per actor); see rel_ray/examples/model_scorer.py.
    ``match_rule``: optional match-DECISION plug-in replacing the fixed
    score-threshold rule — see ``_match_filtered`` and
    ``eval.fs_match_rule`` (the unsupervised Fellegi-Sunter decision).

    Broadcast fast path (mention vocabulary ≤ broadcast_max_rows, the normal
    case after exact pre-clustering): the rep map (mention_norm → min
    record_id) lives as one broadcast dict; reps, coref edges and cluster
    expansion all derive from it with stateless map_batches — the wide
    records table is shuffled exactly once (the conversation stage). Larger
    vocabularies fall back to the bucketed co-group stages.
    """
    import dataclasses

    import ray as _ray
    import ray.data as rd

    from ..functions.rayutil import adaptive_buckets

    # size every bucket exchange to the corpus: parquet-read count() is a
    # metadata fast path, and 512 buckets over a 100k-turn input is pure
    # per-group machinery cost (~15-20 ms/group in Ray 2.49). At >=1M turns
    # this leaves cfg unchanged.
    cfg = dataclasses.replace(
        cfg, num_buckets=adaptive_buckets(transcripts.count(),
                                          cfg.num_buckets))

    # mentions are derived inside the conversation buckets (post-shuffle):
    # the conv_id exchange carries only the six raw transcript columns.
    # The locality path's one driver collect (block-spanning conv hashes,
    # boundary-sized) honors the same low-memory regime as everything else:
    # broadcast_max_rows=0 forces the classic driver-free exchange.
    turns = conversation_stage(
        transcripts, cfg,
        max_span_convs=min(4_000_000, broadcast_max_rows))
    # one materialization of the wide records — the conversation shuffle runs
    # exactly once; everything after is skinny aggregates + broadcast lookups
    with _phase_timer("records0_materialize"):
        records0 = records_stage(turns, cfg).materialize()
    # The bucket groupby emits at most ~num_buckets blocks (≤512), which the
    # downstream passes amortize fine; the former unconditional
    # repartition(64) was a measured 27 s tax at 14.5M turns / 8 CPUs
    # (43.2 s → 70.1 s records0 wall: RepartitionReduce runs as a SINGLE
    # task that re-copies the whole table serially — a fixed cost that is
    # proportionally worst at low CPU counts, i.e. exactly what the
    # cluster-scaling criterion measures). Coalesce only a pathological
    # block explosion.
    if records0.num_blocks() > 1024:  # pragma: no cover - defensive
        with _phase_timer("records0_coalesce"):
            records0 = records0.repartition(256).materialize()

    from ..functions.rayutil import adaptive_buckets, grouped_min
    with _phase_timer("rep_map_materialize"):
        rep_map = grouped_min(
            records0, "mention_norm", "record_id",
            num_buckets=adaptive_buckets(records0.count(),
                                         cfg.num_buckets)).materialize()

    if rep_map.count() > broadcast_max_rows:
        return _run_linkage_cogroup(records0, turns, cfg, num_partitions,
                                    broadcast_max_rows=broadcast_max_rows,
                                    scorer=scorer,
                                    scorer_kwargs=scorer_kwargs,
                                    match_rule=match_rule)

    from ..functions.rayutil import (collect_table, dict_lookup,
                                     get_broadcast, get_broadcast_dict)

    _rep_schema = pa.schema([("mention_norm", pa.string()),
                             ("record_id", pa.string())])
    with _phase_timer("collect_rep_map"):
        rep_tab = collect_table(rep_map, _rep_schema)
    # sort by record_id so a row's POSITION is an order-preserving int64
    # code for its rep: the blocking/pair exchanges then move 16 B coded
    # rows instead of the two fat strings, and every downstream sort/min/
    # window decision on codes is bit-identical to the string ordering
    # (the sort is driver-side but vocabulary-sized — already paid by the
    # collect above)
    rep_tab = rep_tab.sort_by([("record_id", "ascending")]).combine_chunks()
    # row position as the rep's int64 code (order-preserving: the table is
    # record_id-sorted) — broadcast alongside the strings so any stage can
    # map mention_norm -> code without re-deriving positions
    import numpy as _np

    rep_tab = rep_tab.append_column(
        "rep_code", pa.array(_np.arange(rep_tab.num_rows, dtype=_np.int64)))
    # driver-built mention_norm -> code hash index (collision-checked, so
    # exact for the closed vocabulary); broadcast READY so workers pay no
    # per-process build at all. None -> workers fall back to the sorted-U
    # string index (get_broadcast_str_index), still dict-free.
    from ..functions.rayutil import build_hash_str_index
    mn_idx = build_hash_str_index(rep_tab.column("mention_norm"),
                                  rep_tab.column("rep_code"))
    mn_idx_ref = _ray.put(mn_idx)

    def _mn_codes(col):
        from ..functions.rayutil import (get_broadcast_str_index,
                                         hash_str_index_lookup,
                                         str_index_lookup)
        hidx = get_broadcast(mn_idx_ref)
        if hidx is not None:
            return hash_str_index_lookup(col, hidx, default=-1)
        sidx = get_broadcast_str_index(rep_ref, "mention_norm", "rep_code")
        return str_index_lookup(col, sidx, default=-1)
    # broadcast the zero-copy Arrow TABLE; each worker builds the Python dict
    # once per process (get_broadcast_dict) — the O(vocabulary) dict build
    # runs on the workers in parallel, not on the driver's critical path
    rep_ref = _ray.put(rep_tab)

    def attach_rep(t: pa.Table) -> pa.Table:
        d = get_broadcast_dict(rep_ref, "mention_norm", "record_id")
        return t.append_column(
            "rep_id", dict_lookup(t.column("mention_norm"), d))

    records = records0.map_batches(attach_rep, batch_format="pyarrow",
                                   zero_copy_batch=True)

    # split the in-memory reps table into many blocks — a single block would
    # serialize the whole blocking/pairing fan-out into one task.
    # coded layout for the default scorer (a plug-in PairScorer gets the
    # documented string layout of protocols.PairScorer)
    import numpy as _np

    coded = scorer is None
    rep_sel = (rep_tab if coded
               else rep_tab.select(["record_id", "mention_norm"]))
    chunk = max(1024, rep_sel.num_rows // 64 + 1)
    reps = rd.from_arrow([rep_sel.slice(i, chunk)
                          for i in range(0, max(rep_sel.num_rows, 1), chunk)])

    from ..stages.salting import salted_blocking
    blocks = salted_blocking(reps, cfg,
                             est_rows=rep_sel.num_rows * cfg.bands,
                             coded=coded)
    pairs = pairs_stage(blocks, cfg, num_partitions, coded=coded)
    # materialize edges: consumed twice (match filter + user output). In the
    # coded path the materialized table keeps int64 code_a/code_b — strings
    # reappear only in the user-facing views below, so the match filter,
    # confidence aggregate and connected components all move 8 B codes
    with _phase_timer("score_edges_materialize"):
        edges_mat = scoring_stage(pairs, cfg, scorer=scorer,
                                  scorer_kwargs=scorer_kwargs,
                                  decode_ref=rep_ref if coded else None,
                                  keep_codes=coded).materialize()

    if coded:
        # API surface keeps the documented string layout; the decodes run
        # only if a consumer actually reads the pairs/edges outputs
        def _decode_pairs(t: pa.Table) -> pa.Table:
            tab = get_broadcast(rep_ref)
            rid = tab.column("record_id")
            mn = tab.column("mention_norm")
            ca, cb = t.column("code_a"), t.column("code_b")
            return pa.table({"id_a": rid.take(ca), "id_b": rid.take(cb),
                             "mn_a": mn.take(ca), "mn_b": mn.take(cb)})

        pairs = pairs.map_batches(_decode_pairs, batch_format="pyarrow",
                                  zero_copy_batch=True)

        def _decode_edges(t: pa.Table) -> pa.Table:
            tab = get_broadcast(rep_ref)
            rid = tab.column("record_id")
            cols = {"id_a": rid.take(t.column("code_a")),
                    "id_b": rid.take(t.column("code_b"))}
            for c in t.column_names:
                if c not in ("code_a", "code_b"):
                    cols[c] = t.column(c)
            return pa.table(cols)

        edges = edges_mat.map_batches(_decode_edges, batch_format="pyarrow",
                                      zero_copy_batch=True)
    else:
        edges = edges_mat

    matched, matched_scored = _match_filtered(
        edges_mat, match_rule,
        id_cols=("code_a", "code_b") if coded else ("id_a", "id_b"))

    def coref_resolve(t: pa.Table) -> pa.Table:
        # coded path: emit rep CODES (order-preserving ints — min/max over
        # codes == min/max over record_ids); string path for plug-in scorers
        rows = t.filter(pc.not_equal(t.column("coref_prev_mn"), ""))
        if coded:
            if rows.num_rows == 0:
                return pa.table({"id_a": pa.array([], type=pa.int64()),
                                 "id_b": pa.array([], type=pa.int64())})
            # driver-broadcast hash index (sorted-U fallback), NOT a
            # Python dict: the per-process dict build was the measured
            # consume-phase floor (17.3 s vs 1.1 s warm at 32 CPUs)
            rep_b = _mn_codes(rows.column("mention_norm"))
            rep_a = _mn_codes(rows.column("coref_prev_mn"))
            import numpy as _np2
            lo = pa.array(_np2.minimum(rep_a, rep_b))
            hi = pa.array(_np2.maximum(rep_a, rep_b))
            out = pa.table({"id_a": lo, "id_b": hi})
            out = out.filter(pc.greater_equal(out.column("id_a"),
                                              pa.scalar(0, pa.int64())))
        else:
            if rows.num_rows == 0:
                return pa.table({"id_a": pa.array([], type=pa.string()),
                                 "id_b": pa.array([], type=pa.string())})
            d = get_broadcast_dict(rep_ref, "mention_norm", "record_id")
            rep_b = dict_lookup(rows.column("mention_norm"), d)
            rep_a = dict_lookup(rows.column("coref_prev_mn"), d, default="")
            lo = pc.min_element_wise(rep_a, rep_b)
            hi = pc.max_element_wise(rep_a, rep_b)
            out = pa.table({"id_a": lo, "id_b": hi})
            out = out.filter(pc.not_equal(out.column("id_a"), ""))
        return out.filter(pc.not_equal(out.column("id_a"), out.column("id_b")))

    coref = records0.map_batches(coref_resolve, batch_format="pyarrow",
                                 zero_copy_batch=True)
    all_edges = matched.union(coref)

    def _codes_to_ids(t: pa.Table) -> pa.Table:
        tab = get_broadcast(rep_ref)
        rid = tab.column("record_id")
        cols = {"id_a": rid.take(t.column("id_a")),
                "id_b": rid.take(t.column("id_b"))}
        for c in t.column_names:
            if c not in ("id_a", "id_b"):
                cols[c] = t.column(c)
        return pa.table(cols)

    with _phase_timer("connected_components"):
        cl_codes = (connected_components_codes(all_edges, cfg)
                    if coded else None)
        if cl_codes is None:
            # plug-in scorer (string edges) or a topology too large for the
            # driver: the general path (distributed label propagation above
            # cc_local_max_edges)
            if coded:
                all_edges = all_edges.map_batches(
                    _codes_to_ids, batch_format="pyarrow",
                    zero_copy_batch=True)
                matched_scored = matched_scored.map_batches(
                    _codes_to_ids, batch_format="pyarrow",
                    zero_copy_batch=True)
            rep_clusters = connected_components(reps, all_edges, cfg,
                                                num_partitions,
                                                include_singletons=False)

    # cluster expansion: rep→cluster (+ per-rep edge confidence) is small
    # (edge-touched reps only); compose with the rep dict so records0 maps
    # straight to clusters
    with _phase_timer("collect_rep_clusters"):
        if cl_codes is not None:
            cl_ref = _ray.put(_dense_cluster_arrays(
                cl_codes, matched_scored, rep_tab.num_rows))
        else:
            cl_ref = _ray.put(_cluster_conf_table(rep_clusters,
                                                  matched_scored))

    coded_cl = cl_codes is not None

    def to_cluster(t: pa.Table) -> pa.Table:
        if coded_cl:
            # pure-C path: one searchsorted string lookup (mention_norm ->
            # rep code), then three dense-array gathers + one Arrow take
            # for the cluster-id string — no Python dict anywhere
            codes = _mn_codes(t.column("mention_norm"))
            if len(codes) and codes.min() < 0:
                raise RuntimeError(
                    "mention_norm missing from the rep vocabulary — "
                    "records0 and rep_map diverged")
            cluster_code, bs_arr, nl_arr = get_broadcast(cl_ref)
            rid = get_broadcast(rep_ref).column("record_id")
            ccode = cluster_code[codes]
            return pa.table({
                "record_id": t.column("record_id"),
                "cluster_id": rid.take(pa.array(ccode)),
                "best_score": pa.array(bs_arr[codes]),
                "n_links": pa.array(nl_arr[codes]),
            })
        reps_d = get_broadcast_dict(rep_ref, "mention_norm", "record_id")
        cls_d = get_broadcast_dict(cl_ref, "record_id", "cluster_id")
        bs_d = get_broadcast_dict(cl_ref, "record_id", "best_score")
        nl_d = get_broadcast_dict(cl_ref, "record_id", "n_links")
        r = dict_lookup(t.column("mention_norm"), reps_d)
        # reps missing from the cluster map are singletons → themselves
        c = dict_lookup(r, cls_d, default_to_key=True)
        return pa.table({
            "record_id": t.column("record_id"),
            "cluster_id": c,
            "best_score": dict_lookup(r, bs_d, default=0.0,
                                      value_type=pa.float32()),
            "n_links": dict_lookup(r, nl_d, default=0,
                                   value_type=pa.int32()),
        })

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
                         num_partitions: int, *,
                         broadcast_max_rows: int = 2_000_000,
                         scorer=None, scorer_kwargs: dict | None = None,
                         match_rule=None):
    """Shuffle-based path for mention vocabularies too large to broadcast.

    Driver-free end to end: the rep→cluster + confidence merge runs as a
    distributed full-outer co-group (``_cluster_conf_ds``) and cluster
    expansion inherits the caller's broadcast budget — with
    ``broadcast_max_rows=0`` no table of any size is ever collected to the
    driver (byte-identical clusters to the broadcast path; see
    tests/test_pipeline.py::test_linkage_cogroup_fallback_driver_free)."""
    with _phase_timer("cg_exact_precluster"):
        records = exact_precluster(
            records0, cfg, num_partitions,
            broadcast_max_rows=broadcast_max_rows).materialize()

    reps = records.map_batches(
        lambda t: t.filter(pc.equal(t.column("record_id"), t.column("rep_id"))).select(
            ["record_id", "mention_norm"]),
        batch_format="pyarrow", zero_copy_batch=True)

    from ..stages.salting import salted_blocking
    blocks = salted_blocking(reps, cfg,
                             est_rows=records.count() * cfg.bands)
    pairs = pairs_stage(blocks, cfg, num_partitions)
    with _phase_timer("cg_score_edges"):
        edges = scoring_stage(pairs, cfg, scorer=scorer,
                              scorer_kwargs=scorer_kwargs).materialize()

    matched, matched_scored = _match_filtered(edges, match_rule)
    all_edges = matched.union(_coref_edges(
        records, reps, num_partitions,
        broadcast_max_rows=broadcast_max_rows,
        num_buckets=cfg.num_buckets))

    with _phase_timer("cg_connected_components"):
        rep_clusters = connected_components(
            reps, all_edges, cfg, num_partitions,
            include_singletons=False).materialize()
    rep_conf = _cluster_conf_ds(rep_clusters, matched_scored,
                                num_buckets=cfg.num_buckets)
    clusters = expand_clusters(records, rep_conf, num_partitions,
                               num_buckets=cfg.num_buckets,
                               broadcast_max_rows=broadcast_max_rows)
    return {
        "turns": turns,
        "records": records,
        "pairs": pairs,
        "edges": edges,
        "clusters": clusters,
    }


def entity_summary(clusters, records, *, num_buckets: int = 64):
    """User-facing entity table: one row per cluster —
    (cluster_id, n_records, n_convs, top_form). REL parity: the
    aggregate view of REL's per-mention output tuples
    (REL:src/REL/utils.py::process_results), i.e. "the entity list".

    ONE bucketed exchange over clusters⋈records; inside each bucket all
    three stats are computed vectorized over the cluster-sorted segments:
    distinct conversations = unique (segment, conv-code) composites,
    top surface form = counted (segment, mention-code) composites
    argmaxed by a single lexsort with a rank-mapped LEXICOGRAPHIC
    tiebreak (dictionary codes are not in string order).
    """
    import numpy as np

    from ..functions.rayutil import bucketed_group_apply, segment_starts
    from ..stages.joins import cogroup_inner_join

    recs = records.map_batches(
        lambda t: t.select(["record_id", "conv_id", "mention_norm"]),
        batch_format="pyarrow", zero_copy_batch=True)
    cls = clusters.map_batches(
        lambda t: t.select(["record_id", "cluster_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = cogroup_inner_join(cls, recs, key="record_id",
                                right_cols=["conv_id", "mention_norm"])

    def summarize(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({
                "cluster_id": pa.array([], type=pa.string()),
                "n_records": pa.array([], type=pa.int64()),
                "n_convs": pa.array([], type=pa.int64()),
                "top_form": pa.array([], type=pa.string())})
        starts = np.asarray(segment_starts(bucket.column("cluster_id")))
        lens = np.diff(np.append(starts, n))
        seg_of = np.repeat(np.arange(len(starts), dtype=np.int64), lens)

        def enc(col):
            a = bucket.column(col)
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            e = pc.dictionary_encode(a)
            return (np.asarray(e.indices, dtype=np.int64), e.dictionary)

        ccode, _ = enc("conv_id")
        big = np.int64(1) << 32
        n_convs = np.bincount(
            np.unique(seg_of * big + ccode) >> 32, minlength=len(starts))

        mcode, mdict = enc("mention_norm")
        pairs, cnts = np.unique(seg_of * big + mcode, return_counts=True)
        pseg, pmen = pairs >> 32, pairs & (big - 1)
        rank = np.empty(len(mdict), dtype=np.int64)
        rank[np.argsort(np.asarray(mdict, dtype=object))] = \
            np.arange(len(mdict))
        order = np.lexsort((rank[pmen], -cnts, pseg))
        heads = order[np.searchsorted(pseg[order], np.arange(len(starts)))]
        kc = bucket.column("cluster_id")
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        return pa.table({
            "cluster_id": kc.take(pa.array(starts)),
            "n_records": pa.array(lens.astype(np.int64)),
            "n_convs": pa.array(n_convs.astype(np.int64)),
            "top_form": mdict.take(pa.array(pmen[heads]))})

    return bucketed_group_apply(joined, "cluster_id", summarize,
                                num_buckets=num_buckets)
