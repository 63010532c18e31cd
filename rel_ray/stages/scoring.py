"""S6: pairwise scoring — the actor-pool stage.

REL analog: the local ED score of ``REL:src/REL/mulrel_ranker.py::MulRelRanker``
(ctx-embedding similarity + prior feature → FFN). Here three features per
candidate pair:

  * exact char-n-gram Jaccard (set feature — the p(e|m)-ish cheap prior),
  * Jaro-Winkler on the normalized surface forms (edit feature),
  * a hashing-trick embedding head: each shingle hashes to a 64-bit word whose
    bits are a ±1 sign vector; a mention's embedding is the sum of its shingle
    sign vectors and the feature is the cosine between the two mention
    embeddings (the deterministic, artifact-free analog of REL's
    GloVe/Wikipedia2Vec similarity, ``REL:src/REL/db/generic.py::GenericLookup.emb``).

Stateful setup (permutation params, feature weights) happens once per actor in
``__init__``; ``__call__`` is per-batch and vectorized except the per-pair
Jaro-Winkler / set-intersection loops, which run only on LSH-pruned pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.shingles import char_ngram_codes, unique_shingle_sets
from ..functions.strsim import jaro_winkler


def _sign_embed(codes: np.ndarray, row_splits: np.ndarray) -> np.ndarray:
    """(n, 64) float32 embeddings: sum of per-shingle ±1 sign vectors."""
    n = len(row_splits) - 1
    bits = np.unpackbits(codes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    signs = bits.astype(np.float32) * 2.0 - 1.0  # (total, 64)
    out = np.zeros((n, 64), dtype=np.float32)
    lens = row_splits[1:] - row_splits[:-1]
    nonempty = np.nonzero(lens > 0)[0]
    if len(nonempty):
        out[nonempty] = np.add.reduceat(signs, row_splits[:-1][nonempty], axis=0)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


class PairScorer:
    """Callable class for ``map_batches(PairScorer, concurrency=N)``."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def _features(self, mn: pa.Array) -> tuple[pa.ListArray, np.ndarray]:
        codes, splits = char_ngram_codes(mn, self.cfg.shingle_k)
        uniq = unique_shingle_sets(codes, splits)
        ucodes = np.asarray(uniq.values, dtype=np.uint64)
        usplits = np.asarray(uniq.offsets, dtype=np.int64)
        emb = _sign_embed(ucodes, usplits)
        return uniq, emb

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        mn_a = batch.column("mn_a")
        mn_b = batch.column("mn_b")
        if isinstance(mn_a, pa.ChunkedArray):
            mn_a = mn_a.combine_chunks()
        if isinstance(mn_b, pa.ChunkedArray):
            mn_b = mn_b.combine_chunks()

        set_a, emb_a = self._features(mn_a)
        set_b, emb_b = self._features(mn_b)
        sim_emb = np.einsum("ij,ij->i", emb_a, emb_b).astype(np.float32)

        va = np.asarray(set_a.values, dtype=np.uint64)
        sa = np.asarray(set_a.offsets, dtype=np.int64)
        vb = np.asarray(set_b.values, dtype=np.uint64)
        sb = np.asarray(set_b.offsets, dtype=np.int64)
        sim_j = np.zeros(n, dtype=np.float32)
        for i in range(n):
            a = va[sa[i] : sa[i + 1]]
            b = vb[sb[i] : sb[i + 1]]
            la, lb = len(a), len(b)
            if la and lb:
                inter = len(np.intersect1d(a, b, assume_unique=True))
                sim_j[i] = inter / (la + lb - inter)

        a_list = mn_a.to_pylist()
        b_list = mn_b.to_pylist()
        sim_jw = np.fromiter(
            (jaro_winkler(x, y) for x, y in zip(a_list, b_list)),
            dtype=np.float32, count=n)

        score = (cfg.w_jaccard * sim_j + cfg.w_jw * sim_jw + cfg.w_emb * sim_emb).astype(
            np.float32)
        return pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "sim_jaccard": pa.array(sim_j),
                "sim_jw": pa.array(sim_jw),
                "sim_emb": pa.array(sim_emb),
                "score": pa.array(score),
                "is_match": pa.array(score >= np.float32(cfg.threshold)),
            }
        )


def scoring_stage(pairs, cfg: PipelineConfig):
    # autoscaling pool (1, N): under CPU pressure (shuffle aggregator actors
    # from neighboring joins share the node) a fixed-size pool can starve the
    # rest of the plan; min=1 keeps the pipeline always able to progress
    return pairs.map_batches(
        PairScorer,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
        concurrency=(1, cfg.scorer_concurrency),
    )
