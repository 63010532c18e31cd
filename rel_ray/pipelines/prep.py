"""End-to-end training-data preparation pipeline (the second flagship,
for the training-data mandate): documents in → clean, deduped,
decontaminated, chunked corpus out — every stage an existing engine
operator, the whole chain CHECKPOINTED per stage via state/manifest
(kill-resume skips finished stages, same contract as the linkage
pipeline) and finishable with the resumable sharded sink.

Stage chain (rows counted per stage in the returned report):

  1. filter      lang-ID == keep_lang AND token count >= min_tokens
  2. lm_filter   char-bigram LM score >= the corpus's q-quantile
                 (threshold from the mergeable quantile sketch — one
                 extra streaming pass, bounded memory at any scale)
  3. dedup       exact (grouped_min on text) then MinHash/LSH near-dup
                 representatives only
  4. decontam    word-n-gram overlap vs the benchmark set dropped
  5. chunk       overlapping token windows (RAG shape)

REL parity anchor: this is the corpus-statistics/store-build lifecycle
(REL:src/REL/wikipedia_yago_freq.py + generate_train_test.py) recast as
a data-prep DAG; every stage streams and the only exchanges are the two
skinny dedup aggregates.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig


def prepare_corpus(
    docs,
    benchmark,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    keep_lang: str = "en",
    min_tokens: int = 20,
    lm_quantile: float = 0.05,
    near_threshold: float = 0.7,
    near_mode: str = "minhash",
    chunk_size: int = 50,
    stride: int = 40,
    ckpt_dir: str | None = None,
    out_dir: str | None = None,
):
    """Returns {"chunks": Dataset, "report": pa.Table(stage, rows),
    "lineage": [...]}; with ``out_dir`` the chunks are also written via
    the resumable sharded sink and the write summary is included."""
    import numpy as np

    from ..functions.normalize import token_counts
    from ..functions.rayutil import grouped_min
    from ..state.manifest import CheckpointContext
    from ..stages.dedup import (flag_contaminated, near_dedup_exact,
                                near_dedup_minhash)
    from ..stages.packing import chunk_documents
    from ..stages.sketches import quantile_sketch, sketch_quantile
    from ..stages.textstats import lang_id, lm_score
    from ..stages.joins import semi_anti_join

    mgr = CheckpointContext(ckpt_dir, cfg.fingerprint()
                       if hasattr(cfg, "fingerprint") else "prep")

    def build_filtered():
        def keep(t: pa.Table) -> pa.Table:
            mask = pc.and_(
                pc.equal(lang_id(t.column(text_col)), keep_lang),
                pc.greater_equal(token_counts(t.column(text_col)),
                                 pa.scalar(min_tokens, pa.int32())))
            return t.select([id_col, text_col]).filter(mask)
        return docs.map_batches(keep, batch_format="pyarrow",
                                zero_copy_batch=True)

    s_filtered = mgr.run_stage("prep_filtered", [], build_filtered)

    def build_lm():
        from ..stages.textstats import bigram_counts

        counts = bigram_counts(s_filtered.dataset, text_col=text_col)
        # threshold from the bounded-memory quantile sketch over the
        # POSITIVE integer view of the score (shift+scale; monotone).
        # eps and shift are sized so the sketch's RELATIVE bin width
        # (2*eps*value) stays well under the score distribution's spread
        # in the shifted domain — at shift 16 and eps=5e-4 the bin width
        # near typical scores is ~0.013 log2 units
        EPS = 0.0005
        scored_ids = lm_score(s_filtered.dataset, id_col=id_col,
                              text_col=text_col, counts=counts)
        shifted = scored_ids.map_batches(
            lambda t: pa.table({"v": pa.array(np.maximum(
                ((np.asarray(t.column("lm_logprob")) + 16.0) * 1000.0)
                .astype(np.int64), 0))}),
            batch_format="pyarrow", zero_copy_batch=True)
        sk = quantile_sketch(shifted, val_col="v", eps=EPS)
        cut = sketch_quantile(sk, lm_quantile, EPS) / 1000.0 - 16.0
        # score WITH text carried through -> pure streaming filter; no
        # driver-side keep-id collection (that list is O(corpus) at scale)
        scored = lm_score(s_filtered.dataset, id_col=id_col,
                          text_col=text_col, counts=counts,
                          carry_cols=[text_col])
        return scored.map_batches(
            lambda t, c=cut: t.filter(pc.greater_equal(
                t.column("lm_logprob"), c)).select([id_col, text_col]),
            batch_format="pyarrow", zero_copy_batch=True)

    s_lm = mgr.run_stage("prep_lm_filter", [s_filtered.fingerprint],
                         build_lm)

    def build_dedup():
        exact = grouped_min(s_lm.dataset, text_col, id_col, num_buckets=64)
        # grouped_min output: (text, doc_id); near-dup over the exact reps
        exact_named = exact.map_batches(
            lambda t: pa.table({id_col: t.column(id_col),
                                text_col: t.column(text_col)}),
            batch_format="pyarrow", zero_copy_batch=True)
        if near_mode == "exact":
            # deterministic AllPairs path (near_threshold as an exact
            # integer ratio) — pure function of the data, so the whole
            # funnel is SQL-oracle-checkable; LSH stays the default for
            # low thresholds / huge shingle sets
            from fractions import Fraction
            frac = Fraction(near_threshold).limit_denominator(1000)
            clusters = near_dedup_exact(
                exact_named, id_col=id_col, text_col=text_col, cfg=cfg,
                tau_num=frac.numerator, tau_den=frac.denominator)
        else:
            clusters = near_dedup_minhash(exact_named, id_col=id_col,
                                          text_col=text_col, cfg=cfg,
                                          threshold=near_threshold)
        # survivors = cluster representatives; keep their text via the
        # BUCKETED semi join (no driver-side id collection — the rep list
        # is O(corpus) at scale). near_dedup ids are strings; cast back.
        reps = clusters.map_batches(
            lambda t: pa.table({id_col: pc.cast(t.filter(pc.equal(
                t.column("record_id"), t.column("cluster_id")))
                .column("record_id"), pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        return semi_anti_join(exact_named, reps, key=id_col)

    s_dedup = mgr.run_stage("prep_dedup",
                            [s_lm.fingerprint, f"near={near_mode}"],
                            build_dedup)

    def build_clean():
        flagged = flag_contaminated(s_dedup.dataset, benchmark, id_col=id_col,
                                    text_col=text_col)
        return flagged.map_batches(
            lambda t: t.filter(pc.invert(t.column("contaminated")))
            .select([id_col, text_col]),
            batch_format="pyarrow", zero_copy_batch=True)

    s_clean = mgr.run_stage("prep_decontam", [s_dedup.fingerprint],
                            build_clean)

    def build_chunks():
        return chunk_documents(s_clean.dataset, id_col=id_col,
                               text_col=text_col, chunk_size=chunk_size,
                               stride=stride)

    s_chunks = mgr.run_stage("prep_chunks", [s_clean.fingerprint],
                             build_chunks)

    report_rows = [("input", docs.count()),
                   ("filtered", s_filtered.rows),
                   ("lm_filtered", s_lm.rows),
                   ("deduped", s_dedup.rows),
                   ("decontaminated", s_clean.rows),
                   ("chunks", s_chunks.rows)]
    out = {"chunks": s_chunks.dataset,
           "report": pa.table({
               "stage": pa.array([r[0] for r in report_rows]),
               "rows": pa.array([r[1] for r in report_rows],
                                type=pa.int64())}),
           "lineage": mgr.lineage}
    if out_dir:
        from ..sources.sinks import write_partitioned
        out["write"] = write_partitioned(s_chunks.dataset, out_dir,
                                         key_col=id_col)
    return out
