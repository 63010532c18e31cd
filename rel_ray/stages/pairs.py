"""S4–S5: candidate pair generation within blocks, capped + deduped.

REL analog: the candidate set per mention, capped like the p(e|m) top-100 /
PreRank top-7 (``REL:src/REL/mulrel_ranker.py::PreRank``).

Skew policy (SURVEY §4.3): per-block *windowed* pairing instead of all-pairs —
members sorted by record_id are paired all-vs-all inside overlapping windows,
plus star bridges from each window head to the block head. Pair count is
O(n·W) not O(n²); connectivity (and therefore clustering recall) is preserved
through the bridge chain, and the component diameter stays ≤4 so the
label-propagation loop converges in a handful of rounds.

Execution: bucketed shuffle-reduce (rayutil.bucketed_group_apply) — LSH keys
hash into `cfg.num_buckets` buckets, one callback per bucket; singleton key
segments (the vast majority of band keys) are skipped by a vectorized length
filter, and Python touches only real multi-member blocks.
"""

from __future__ import annotations

import functools
import itertools

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.rayutil import bucketed_group_apply, segment_starts


@functools.lru_cache(maxsize=4096)
def window_pair_indices(n: int, cap: int, max_pairs: int) -> tuple:
    """Deterministic windowed pair index arrays (xs, ys) for an n-member block.

    Overlapping windows of width w chain the block; star bridges from index 0
    to each window head keep the component diameter ≤4. Cached per (n,cap,max)
    — block-size distributions are heavy-tailed, so the cache hit rate is high.
    """
    w = min(cap, max(2, (2 * max_pairs) // max(n, 1)))
    xs: list[int] = []
    ys: list[int] = []
    step = max(1, w - 1)
    for start in range(0, n - 1, step):
        hi = min(n, start + w)
        for x, y in itertools.combinations(range(start, hi), 2):
            xs.append(x)
            ys.append(y)
        if start > 0:
            xs.append(0)
            ys.append(start)
    return np.asarray(xs, dtype=np.int64), np.asarray(ys, dtype=np.int64)


class PairGen:
    """Bucket callback: emits canonical candidate pairs for every multi-member
    block-key segment in the bucket (input sorted by (block_key, record_id)).

    Vectorized emission: per segment only two cached index arrays are offset;
    a single Arrow `take` per bucket materializes all pair payloads.
    """

    def __init__(self, cfg: PipelineConfig, coded: bool = False):
        self.cfg = cfg
        self.coded = coded

    def __call__(self, bucket: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = bucket.num_rows
        if n == 0:
            return _empty_pairs(self.coded)
        starts = segment_starts(bucket.column("block_key"))
        lens = np.diff(np.append(starts, n))
        multi = np.nonzero(lens >= 2)[0]
        if len(multi) == 0:
            return _empty_pairs(self.coded)
        xs_all: list[np.ndarray] = []
        ys_all: list[np.ndarray] = []
        for si in multi:
            s, ln = int(starts[si]), int(lens[si])
            xs, ys = window_pair_indices(ln, cfg.block_cap, cfg.max_pairs_per_block)
            xs_all.append(xs + s)
            ys_all.append(ys + s)
        xi = pa.array(np.concatenate(xs_all))
        yi = pa.array(np.concatenate(ys_all))
        if self.coded:
            # code order == record_id order (order-preserving codes), so
            # x < y stays canonical and the emitted pair set is identical
            codes = bucket.column("rep_code")
            return pa.table({"code_a": codes.take(xi),
                             "code_b": codes.take(yi)})
        payload = bucket.select(["record_id", "mention_norm"])
        a = payload.take(xi)
        b = payload.take(yi)
        # sorted by record_id within each segment → x < y is canonical; the
        # same record cannot appear twice under one block key
        return pa.table({
            "id_a": a.column("record_id"),
            "id_b": b.column("record_id"),
            "mn_a": a.column("mention_norm"),
            "mn_b": b.column("mention_norm"),
        })


def _empty_pairs(coded: bool = False) -> pa.Table:
    if coded:
        return pa.table({"code_a": pa.array([], type=pa.int64()),
                         "code_b": pa.array([], type=pa.int64())})
    return pa.table(
        {
            "id_a": pa.array([], type=pa.string()),
            "id_b": pa.array([], type=pa.string()),
            "mn_a": pa.array([], type=pa.string()),
            "mn_b": pa.array([], type=pa.string()),
        }
    )


def _dedup_bucket(bucket: pa.Table) -> pa.Table:
    """Adjacent-duplicate filter over a bucket sorted by (id_a, id_b); the
    same pair emitted from different LSH bands carries identical payload, so
    keeping the first occurrence is an exact dedup. Works on the coded
    (code_a, code_b) layout too — integer equality instead of string."""
    import pyarrow.compute as pc

    n = bucket.num_rows
    if n < 2:
        return bucket
    ka, kb = (("code_a", "code_b") if "code_a" in bucket.schema.names
              else ("id_a", "id_b"))
    a = bucket.column(ka)
    b = bucket.column(kb)
    keep = np.ones(n, dtype=bool)
    same_a = np.asarray(pc.equal(a.slice(1), a.slice(0, n - 1)))
    same_b = np.asarray(pc.equal(b.slice(1), b.slice(0, n - 1)))
    keep[1:] = ~(same_a & same_b)
    return bucket.filter(pa.array(keep))


def pairs_stage(blocks, cfg: PipelineConfig, num_partitions: int = 0,
                *, coded: bool = False):
    """blocks → canonical deduped candidate pairs.

    1. Bucketed PairGen (windowed, capped) — one Python call per bucket,
       vectorized pair emission.
    2. Band dedup: bucketed by id_a (duplicates of a pair always share id_a),
       adjacent-duplicate filter after the in-bucket (id_a, id_b) sort.
       Measured 10× faster than a multi-string-key Min-aggregate groupby.
    ``coded=True``: blocks carry int64 rep_code instead of the two strings
    (see BlockKeys) — both exchanges here move 16 B rows instead of fat
    strings, and the sorts compare ints. `num_partitions` kept for API
    stability; unused.
    """
    if coded:
        pairs = bucketed_group_apply(
            blocks, "block_key", PairGen(cfg, coded=True),
            num_buckets=cfg.num_buckets,
            sort_cols=[("rep_code", "ascending")])
        return bucketed_group_apply(
            pairs, "code_a", _dedup_bucket,
            num_buckets=cfg.num_buckets,
            sort_cols=[("code_b", "ascending")])
    pairs = bucketed_group_apply(
        blocks, "block_key", PairGen(cfg),
        num_buckets=cfg.num_buckets,
        sort_cols=[("record_id", "ascending")])
    return bucketed_group_apply(
        pairs, "id_a", _dedup_bucket,
        num_buckets=cfg.num_buckets,
        sort_cols=[("id_b", "ascending")])


def greedy_one_to_one(scored_pairs, *, block_col: str,
                      a_col: str = "id_a", b_col: str = "id_b",
                      score_col: str = "score",
                      max_block_pairs: int = 100_000,
                      num_buckets: int = 64):
    """Uniqueness-constrained linkage: within each block, accept pairs
    greedily by (score desc, id_a asc, id_b asc), skipping any pair whose
    endpoint is already matched — each record ends up in AT MOST one
    accepted pair. The classic 1:1 ER mode (one customer record may
    merge with at most one registry record); greedy on sorted weights is
    the standard deterministic heuristic (1/2-approximation to
    maximum-weight matching — Avis 1983), and determinism is the
    property the pipeline contract needs.

    One bucket exchange on ``block_col``; the greedy scan is per BLOCK
    (block caps upstream bound block sizes; ``max_block_pairs`` raises
    loudly past that). Output = accepted subset, input schema."""
    from ..functions.rayutil import segment_starts as _segstarts

    def per_bucket(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return bucket
        starts = np.asarray(_segstarts(bucket.column(block_col)))
        lens = np.diff(np.append(starts, n))
        if lens.max(initial=0) > max_block_pairs:
            raise ValueError(
                f"block with {int(lens.max())} pairs exceeds "
                f"max_block_pairs={max_block_pairs}")
        a = bucket.column(a_col)
        b = bucket.column(b_col)
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        keep = np.zeros(n, dtype=bool)
        for s0, ln in zip(starts, lens):
            used: set = set()
            for i in range(s0, s0 + ln):  # rows pre-sorted by the
                x = a[i].as_py()          # exchange's (score desc, ids)
                y = b[i].as_py()
                if x in used or y in used:
                    continue
                used.add(x)
                used.add(y)
                keep[i] = True
        return bucket.filter(pa.array(keep))

    return bucketed_group_apply(
        scored_pairs, block_col, per_bucket, num_buckets=num_buckets,
        sort_cols=[(score_col, "descending"), (a_col, "ascending"),
                   (b_col, "ascending")])
