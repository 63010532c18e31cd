"""The flagship pipeline: transcripts → clusters (SURVEY §3.5 lifecycle).

Stage graph (shuffle keys in brackets):

  read_parquet(transcripts)
    → normalize_stage                              (stateless mb)
    → conversation_stage         [conv_id]         (shuffle #1)
    → records_stage                                (stateless mb)
    → exact_precluster           [mention_norm]    (shuffle #2: gb-Min + join)
    → reps → blocking_stage                        (stateless mb)
    → pairs_stage                [block_key, pair] (shuffles #3–#4)
    → scoring_stage                                (actor pool)
    → + coref edges              [coref_prev]      (join)
    → connected_components       [node] ×R         (iterative, reps only)
    → expand_clusters            [rep_id]          (join)

Never calls ray.init (driver contract). Nothing materializes the full input;
the only mid-pipeline materializations are the label table of the iterative
CC loop and the small rep/edge tables it loops over.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages.blocking import blocking_stage, exact_precluster, records_stage
from ..stages.clustering import connected_components, expand_clusters
from ..stages.conversation import conversation_stage
from ..stages.normalize import normalize_stage
from ..stages.pairs import pairs_stage
from ..stages.scoring import scoring_stage


def _coref_edges(records, num_partitions: int = 0):
    """with_coref analog: (rep(coref_prev), rep(record)) forced-match edges.

    Join-free co-group on the coref target's record_id: side T rows carry each
    record's own rep (key=record_id); side S rows carry the *referring*
    record's rep (key=coref_prev). One sort-shuffle groupby.
    """
    targets = records.map_batches(
        lambda t: pa.table({"key": t.column("record_id"),
                            "rep": t.column("rep_id"),
                            "is_source": pa.array([False] * t.num_rows)}),
        batch_format="pyarrow", zero_copy_batch=True)

    def source_fn(t: pa.Table) -> pa.Table:
        out = pa.table({"key": t.column("coref_prev"),
                        "rep": t.column("rep_id"),
                        "is_source": pa.array([True] * t.num_rows)})
        return out.filter(pc.not_equal(out.column("key"), ""))
    sources = records.map_batches(source_fn, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def emit_edges(group: pa.Table) -> pa.Table:
        src_mask = group.column("is_source")
        reps_src = pc.filter(group.column("rep"), src_mask)
        reps_tgt = pc.filter(group.column("rep"), pc.invert(src_mask))
        if len(reps_src) == 0 or len(reps_tgt) == 0:
            return pa.table({"id_a": pa.array([], type=pa.string()),
                             "id_b": pa.array([], type=pa.string())})
        tgt = reps_tgt[0].as_py()  # record_id keys are unique -> exactly one
        tgt_arr = pa.array([tgt] * len(reps_src), type=pa.string())
        lo = pc.min_element_wise(reps_src, tgt_arr)
        hi = pc.max_element_wise(reps_src, tgt_arr)
        out = pa.table({"id_a": lo, "id_b": hi})
        return out.filter(pc.not_equal(out.column("id_a"), out.column("id_b")))

    return targets.union(sources).groupby("key").map_groups(
        emit_edges, batch_format="pyarrow")


def run_linkage(
    transcripts,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    num_partitions: int = 16,
):
    """Returns dict of lazily-composed Datasets:
    records / pairs / edges / clusters."""
    turns = normalize_stage(transcripts, cfg)
    turns = conversation_stage(turns, cfg)
    records = records_stage(turns, cfg)
    records = exact_precluster(records, cfg, num_partitions).materialize()

    reps = records.map_batches(
        lambda t: t.filter(pc.equal(t.column("record_id"), t.column("rep_id"))).select(
            ["record_id", "mention_norm"]),
        batch_format="pyarrow", zero_copy_batch=True)

    blocks = blocking_stage(reps, cfg)
    pairs = pairs_stage(blocks, cfg, num_partitions)
    # materialize edges: splits the plan so the scorer actor pool and the CC
    # loop's join/groupby aggregators never compete inside one execution, and
    # `edges` is consumed twice (match filter + user output) without recompute
    edges = scoring_stage(pairs, cfg).materialize()

    matched = edges.map_batches(
        lambda t: t.filter(t.column("is_match")).select(["id_a", "id_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    all_edges = matched.union(_coref_edges(records, num_partitions))

    rep_clusters = connected_components(reps, all_edges, cfg, num_partitions)
    clusters = expand_clusters(records, rep_clusters, num_partitions)
    return {
        "turns": turns,
        "records": records,
        "pairs": pairs,
        "edges": edges,
        "clusters": clusters,
    }
