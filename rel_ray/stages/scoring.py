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
    """(n, 64) float32 embeddings: sum of per-shingle ±1 sign vectors.

    The float32 reduceat formulation is the measured winner: an int32
    column-cumsum + boundary-difference variant (bit-identical output) read
    33 ms vs 21 ms per 4096-pair batch — reduceat's per-segment re-reduce
    beats materializing the (total+1, 64) cumsum matrix here."""
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


def encode_pair_strings(mn_a: pa.Array, mn_b: pa.Array, cfg: PipelineConfig):
    """Dictionary-encode both sides of a pair batch together and shingle each
    DISTINCT string once (reps of hot entities appear in many pairs).

    Returns (idx_a, idx_b, ucodes, usplits): per-pair indices into the
    distinct-string shingle sets (sorted-unique codes, ragged via usplits).
    """
    import pyarrow.compute as pc

    n = len(mn_a)
    both = pa.concat_arrays([mn_a, mn_b])
    enc = pc.dictionary_encode(both)
    idx = np.asarray(enc.indices, dtype=np.int64)
    uniq_strings = enc.dictionary
    if cfg.shingle_unit == "word":
        from ..functions.shingles import word_ngram_codes
        codes, splits = word_ngram_codes(uniq_strings, cfg.shingle_k)
    else:
        codes, splits = char_ngram_codes(uniq_strings, cfg.shingle_k)
    uniq = unique_shingle_sets(codes, splits)
    return (idx[:n], idx[n:],
            np.asarray(uniq.values, dtype=np.uint64),
            np.asarray(uniq.offsets, dtype=np.int64))


def pairwise_overlap(idx_a: np.ndarray, idx_b: np.ndarray,
                     ucodes: np.ndarray, usplits: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized exact (intersection, union) sizes for every pair as int64:
    gather both sides' sorted-unique shingle sets, ONE single-key sort,
    adjacent-equal count per pair — no per-pair Python loop.

    The 64-bit shingle codes are rank-relabeled against the batch's distinct
    shingle pool (one np.unique over ucodes) so the per-pair multiset sort
    runs on a single composite int64 key ``pair_id * m + rank`` via
    ``np.sort`` instead of a two-key ``np.lexsort`` over (uint64, int64) —
    measured 20 ms → ~6 ms per 4096-pair batch, identical counts (any sort
    realization yields the same adjacent-duplicate tally).

    Integer counts let callers apply a threshold predicate with exact integer
    arithmetic (``den*inter >= num*union``) so a DuckDB oracle computing the
    same distinct-set counts hash-matches bit-for-bit."""
    n = len(idx_a)
    set_lens = usplits[1:] - usplits[:-1]
    la, lb = set_lens[idx_a], set_lens[idx_b]

    uq = np.unique(ucodes)
    m = len(uq) + 1
    if n * m >= (1 << 62):  # pragma: no cover - composite-key overflow guard
        raise ValueError("pair batch too large for composite-key overlap — "
                         "reduce batch_size")
    # the sort is the bandwidth-bound hot spot of the whole scorer phase;
    # when pair_id*m + rank fits int32 (the common case at batch 4096),
    # halving the key width cuts the bytes the sort moves — measured 0.52
    # → 0.42 µs/pair on a 22-shingle/pair batch, counts identical
    dt = np.int32 if n * m < (1 << 31) else np.int64
    ranks = np.searchsorted(uq, ucodes).astype(dt)

    def _ragged_gather(side_idx: np.ndarray, lens: np.ndarray) -> np.ndarray:
        total = int(lens.sum())
        if total == 0:
            return np.empty(0, dtype=dt)
        starts = usplits[:-1][side_idx]
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens)
        return ranks[np.repeat(starts, lens) + pos]

    pair_ids = np.concatenate([
        np.repeat(np.arange(n, dtype=dt), la),
        np.repeat(np.arange(n, dtype=dt), lb)])
    key = pair_ids * dt(m) + np.concatenate([_ragged_gather(idx_a, la),
                                             _ragged_gather(idx_b, lb)])
    key.sort()  # introsort: 7× the stable merge here, order is irrelevant
    dup_pos = np.nonzero(key[1:] == key[:-1])[0]
    inter = np.bincount(key[dup_pos] // dt(m), minlength=n).astype(np.int64)
    union = (la + lb - inter).astype(np.int64)
    return inter, union


def pairwise_jaccard(idx_a: np.ndarray, idx_b: np.ndarray,
                     ucodes: np.ndarray, usplits: np.ndarray) -> np.ndarray:
    """Vectorized exact Jaccard for every pair (see pairwise_overlap)."""
    inter, union = pairwise_overlap(idx_a, idx_b, ucodes, usplits)
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(union > 0, inter / union, 0.0).astype(np.float32)


class PairScorer:
    """Callable class for ``map_batches(PairScorer, concurrency=N)``."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        # per-actor state (REL model-load analog): a DuckDB connection gives a
        # vectorized C++ jaro_winkler_similarity (~60× the pure-python loop;
        # verified bit-identical to functions.strsim.jaro_winkler on non-empty
        # strings). threads=1 keeps the actor inside its CPU allocation.
        try:
            import duckdb

            self._con = duckdb.connect()
            self._con.execute("PRAGMA threads=1")
        except Exception:  # pragma: no cover - duckdb is a baked-in dep
            self._con = None

    def _jw_batch(self, a: pa.Array, b: pa.Array) -> np.ndarray:
        if self._con is not None:
            t = pa.table({"a": a, "b": b})
            self._con.register("jw_in", t)
            out = self._con.execute(
                "SELECT jaro_winkler_similarity(a, b) AS s FROM jw_in").arrow()
            self._con.unregister("jw_in")
            return np.asarray(out.column("s"), dtype=np.float32)
        return np.fromiter(
            (jaro_winkler(x, y) for x, y in zip(a.to_pylist(), b.to_pylist())),
            dtype=np.float32, count=len(a))

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        mn_a = batch.column("mn_a")
        mn_b = batch.column("mn_b")
        if isinstance(mn_a, pa.ChunkedArray):
            mn_a = mn_a.combine_chunks()
        if isinstance(mn_b, pa.ChunkedArray):
            mn_b = mn_b.combine_chunks()

        idx_a, idx_b, ucodes, usplits = encode_pair_strings(mn_a, mn_b, cfg)
        if cfg.emb_head == "gru":
            # batched GRU head (REL MulRelRanker GRU analog): encode each
            # DISTINCT surface form once per batch, gather per pair
            import pyarrow.compute as pc

            from .inference import gru_encode
            enc = pc.dictionary_encode(pa.concat_arrays([mn_a, mn_b]))
            gidx = np.asarray(enc.indices, dtype=np.int64)
            emb = gru_encode(enc.dictionary, dim=cfg.gru_dim,
                             seed=cfg.gru_seed)
            sim_emb = np.einsum("ij,ij->i", emb[gidx[:n]],
                                emb[gidx[n:]]).astype(np.float32)
        else:
            emb = _sign_embed(ucodes, usplits)
            sim_emb = np.einsum(
                "ij,ij->i", emb[idx_a], emb[idx_b]).astype(np.float32)
        sim_j = pairwise_jaccard(idx_a, idx_b, ucodes, usplits)

        # Jaro-Winkler is the expensive per-pair feature: gate it EXACTLY.
        # sim_j and sim_emb are already computed, so the pair's maximum
        # possible score (with sim_jw = 1.0) is
        # w_jaccard*sim_j + w_jw + w_emb*sim_emb; when that ceiling is below
        # the match threshold, no JW value can flip the decision and scoring
        # it 0 changes no is_match outcome — zero false negatives by
        # construction, no tuned constant. Measured on 333k real candidate
        # pairs: 12.4% pass this gate vs 32.3% for the old sim_j>=0.12
        # heuristic — exact AND ~2.6x cheaper.
        sim_jw = np.zeros(n, dtype=np.float32)
        ceiling = (cfg.w_jaccard * sim_j + np.float32(cfg.w_jw)
                   + cfg.w_emb * sim_emb)
        candidates = np.nonzero(ceiling >= np.float32(cfg.threshold))[0]
        if len(candidates):
            ci = pa.array(candidates)
            sim_jw[candidates] = self._jw_batch(mn_a.take(ci), mn_b.take(ci))

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


# per-worker-process scorer cache: Ray reuses worker processes across tasks,
# so stateful setup (duckdb connection, permutation params) happens once per
# process — the amortization an actor pool would give, WITHOUT the pool.
# Measured on 1.06M pairs @ 8 CPUs: task pool 3.5 s, autoscaling actor pool
# (1,16) 7.5 s, fixed pool (8) 4.5 s — the autoscaler's ramp-up serializes
# the stage. Task-pool scheduling is also elastic across cluster sizes.
_SCORER_CACHE: dict[str, PairScorer] = {}


def make_score_fn(cfg: PipelineConfig, decode_ref=None, keep_codes=False):
    """``decode_ref``: broadcast handle of the record_id-SORTED rep table
    (record_id, mention_norm). When set and the batch arrives in the coded
    (code_a, code_b) layout, the two int64 code columns are decoded back to
    id/mention strings with two vectorized takes against the broadcast
    table — the pair exchanges upstream moved 16 B rows, and the strings
    reappear only here, inside the compute stage, never on an exchange.

    ``keep_codes``: emit ``code_a``/``code_b`` (int64) in PLACE of the
    string ``id_a``/``id_b`` — the downstream match filter, confidence
    aggregate and connected components then run entirely on 8-byte codes
    (the rep table is record_id-sorted, so min-code == min-record_id and
    the min-label clustering semantics are unchanged); strings reappear
    only in user-facing views."""
    key = cfg.fingerprint()

    def score_pairs(batch: pa.Table) -> pa.Table:
        scorer = _SCORER_CACHE.get(key)
        if scorer is None:
            scorer = _SCORER_CACHE.setdefault(key, PairScorer(cfg))
        codes = None
        if decode_ref is not None and "code_a" in batch.schema.names:
            from ..functions.rayutil import get_broadcast

            tab = get_broadcast(decode_ref)
            rid = tab.column("record_id")
            mn = tab.column("mention_norm")
            ca = batch.column("code_a")
            cb = batch.column("code_b")
            codes = (ca, cb)
            batch = pa.table({"id_a": rid.take(ca), "id_b": rid.take(cb),
                              "mn_a": mn.take(ca), "mn_b": mn.take(cb)})
        out = scorer(batch)
        if keep_codes and codes is not None:
            # scorer output is 1:1 with input rows (no filter/reorder)
            out = out.drop_columns(["id_a", "id_b"])
            out = out.add_column(0, "code_a", codes[0])
            out = out.add_column(1, "code_b", codes[1])
        return out

    return score_pairs


def scoring_stage(pairs, cfg: PipelineConfig, scorer=None,
                  scorer_kwargs: dict | None = None, decode_ref=None,
                  keep_codes=False):
    """Score candidate pairs into edges.

    ``scorer`` is the protocols.PairScorer plug-in seam: pass a callable
    CLASS (pairs batch in → edges batch out) and it is scheduled as an
    autoscaling ACTOR pool — ``__init__`` (model load, artifact read) runs
    once per actor, ``__call__`` per batch. The default engine scorer stays
    on the task pool with per-process state (measured faster for its cheap
    setup — see _SCORER_CACHE note); a real model's load cost is exactly
    what the actor pool amortizes. Worked example:
    rel_ray/examples/model_scorer.py."""
    if scorer is not None:
        return pairs.map_batches(
            scorer,
            fn_constructor_kwargs=scorer_kwargs or {},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
            concurrency=(1, cfg.scorer_concurrency),
        )
    return pairs.map_batches(
        make_score_fn(cfg, decode_ref, keep_codes=keep_codes),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )
