"""Checkpointed flagship pipeline: run_linkage split into resumable stages.

Stage granularity = the expensive shuffle boundaries:
  S_records : read → normalize → conversation → records → exact_precluster
  S_edges   : blocking → pairs → scoring (the actor-pool stage)
  S_clusters: coref edges ∪ matched edges → CC → expand

A killed run resumes by fingerprint: completed stages are read back from
per-partition Parquet, only missing stages recompute (north_rule contract;
test: tests/test_resume.py asserts byte-identical output and zero recompute).
"""

from __future__ import annotations

import os

import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..state.manifest import CheckpointContext
from ..stages.blocking import blocking_stage, exact_precluster, records_stage
from ..stages.clustering import connected_components, expand_clusters
from ..stages.conversation import conversation_stage
from ..stages.pairs import pairs_stage
from ..stages.scoring import scoring_stage
from .linkage import _coref_edges


def _input_fingerprint(input_path: str) -> str:
    """Input lineage token: path + per-file (size, mtime_ns) — no full read.

    mtime_ns catches same-size content edits (easy with fixed-width records)
    that a size-only proxy would silently resume past with stale checkpoints.
    """
    import hashlib

    def _stat(p: str) -> bytes:
        st = os.stat(p)
        return f"{st.st_size}:{st.st_mtime_ns}".encode()

    h = hashlib.sha256(input_path.encode())
    if os.path.isdir(input_path):
        for name in sorted(os.listdir(input_path)):
            h.update(name.encode())
            h.update(_stat(os.path.join(input_path, name)))
    elif os.path.exists(input_path):
        h.update(_stat(input_path))
    return h.hexdigest()[:20]


def run_linkage_checkpointed(
    input_path: str,
    ckpt_dir: str | None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
):
    """Returns (clusters_dataset, lineage: list[dict])."""
    import ray.data as rd

    ctx = CheckpointContext(ckpt_dir, cfg.fingerprint())
    in_fp = _input_fingerprint(input_path)

    def build_records():
        tr = rd.read_parquet(input_path)
        turns = conversation_stage(tr, cfg)
        # materialize before preclustering: the rep-map aggregate would
        # otherwise re-execute the conversation shuffle
        recs = records_stage(turns, cfg).materialize()
        return exact_precluster(recs, cfg)

    s_records = ctx.run_stage("records", [in_fp], build_records)

    def build_edges():
        reps = s_records.dataset.map_batches(
            lambda t: t.filter(pc.equal(t.column("record_id"),
                                        t.column("rep_id"))).select(
                ["record_id", "mention_norm"]),
            batch_format="pyarrow", zero_copy_batch=True)
        return scoring_stage(pairs_stage(blocking_stage(reps, cfg), cfg), cfg)

    s_edges = ctx.run_stage("edges", [s_records.fingerprint], build_edges)

    def build_clusters():
        reps = s_records.dataset.map_batches(
            lambda t: t.filter(pc.equal(t.column("record_id"),
                                        t.column("rep_id"))).select(
                ["record_id", "mention_norm"]),
            batch_format="pyarrow", zero_copy_batch=True)
        matched = s_edges.dataset.map_batches(
            lambda t: t.filter(t.column("is_match")).select(["id_a", "id_b"]),
            batch_format="pyarrow", zero_copy_batch=True)
        all_edges = matched.union(_coref_edges(s_records.dataset, reps))
        rep_clusters = connected_components(reps, all_edges, cfg,
                                            include_singletons=False)
        from .linkage import _cluster_conf_table
        matched_scored = s_edges.dataset.map_batches(
            lambda t: t.filter(t.column("is_match")).select(
                ["id_a", "id_b", "score"]),
            batch_format="pyarrow", zero_copy_batch=True)
        rep_conf = rd.from_arrow(
            _cluster_conf_table(rep_clusters, matched_scored))
        return expand_clusters(s_records.dataset, rep_conf,
                               num_buckets=cfg.num_buckets)

    s_clusters = ctx.run_stage(
        "clusters", [s_records.fingerprint, s_edges.fingerprint], build_clusters)
    ctx.write_lineage()
    return s_clusters.dataset, ctx.lineage


def near_dedup_checkpointed(
    input_path: str,
    ckpt_dir: str | None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    threshold: float = 0.7,
):
    """Checkpointed/resumable MinHash near-dedup over a documents parquet —
    same stage semantics as stages.dedup.near_dedup_minhash, same manifest
    machinery as run_linkage_checkpointed: each stage writes per-partition
    Parquet + a fingerprinted manifest; a rerun skips completed stages
    (kill-after-stage resume for the 100-TB dedup job, not just linkage).

    Returns (clusters_dataset, lineage).
    """
    import dataclasses

    import ray.data as rd

    from ..stages.dedup import JaccardVerifier, _as_records

    cfg = dataclasses.replace(cfg, num_perm=64, bands=16, band_rows=4,
                              shingle_unit="word")
    ctx = CheckpointContext(ckpt_dir,
                            f"{cfg.fingerprint()}:dedup:{threshold}")
    in_fp = _input_fingerprint(input_path)

    def build_records():
        ds = rd.read_parquet(input_path)
        recs = _as_records(ds, id_col=id_col, text_col=text_col, cfg=cfg)
        return exact_precluster(recs, cfg)

    s_records = ctx.run_stage("records", [in_fp], build_records)

    def _reps():
        return s_records.dataset.map_batches(
            lambda t: t.filter(pc.equal(t.column("record_id"),
                                        t.column("rep_id"))).select(
                ["record_id", "mention_norm"]),
            batch_format="pyarrow", zero_copy_batch=True)

    def build_matched():
        pairs = pairs_stage(blocking_stage(_reps(), cfg), cfg)
        verifier = JaccardVerifier(cfg, threshold)
        edges = pairs.map_batches(lambda t: verifier(t),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  batch_size=cfg.batch_size)
        return edges.map_batches(
            lambda t: t.filter(t.column("is_match")).select(["id_a", "id_b"]),
            batch_format="pyarrow", zero_copy_batch=True)

    s_matched = ctx.run_stage("matched", [s_records.fingerprint],
                              build_matched)

    def build_clusters():
        rep_clusters = connected_components(_reps(), s_matched.dataset, cfg,
                                            include_singletons=False)
        return expand_clusters(s_records.dataset, rep_clusters,
                               num_buckets=cfg.num_buckets)

    s_clusters = ctx.run_stage(
        "clusters", [s_records.fingerprint, s_matched.fingerprint],
        build_clusters)
    ctx.write_lineage()
    return s_clusters.dataset, ctx.lineage
