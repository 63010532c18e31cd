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

import itertools

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.rayutil import bucketed_group_apply, segment_starts
from ray.data.aggregate import Min


def window_pairs(n: int, cap: int, max_pairs: int) -> list[tuple[int, int]]:
    """Deterministic windowed pair index list for a block of n members.

    Overlapping windows of width w chain the block; star bridges from index 0
    to each window head keep the component diameter ≤4.
    """
    w = min(cap, max(2, (2 * max_pairs) // max(n, 1)))
    out: list[tuple[int, int]] = []
    step = max(1, w - 1)
    for start in range(0, n - 1, step):
        hi = min(n, start + w)
        out.extend(itertools.combinations(range(start, hi), 2))
        if start > 0:
            out.append((0, start))
    return out


class PairGen:
    """Bucket callback: emits canonical candidate pairs for every multi-member
    block-key segment in the bucket (input sorted by (block_key, record_id))."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, bucket: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = bucket.num_rows
        if n == 0:
            return _empty_pairs()
        starts = segment_starts(bucket.column("block_key"))
        lens = np.diff(np.append(starts, n))
        multi = np.nonzero(lens >= 2)[0]
        if len(multi) == 0:
            return _empty_pairs()
        rid_col = bucket.column("record_id")
        mn_col = bucket.column("mention_norm")
        ia: list[str] = []
        ib: list[str] = []
        ma: list[str] = []
        mb: list[str] = []
        for si in multi:
            s, ln = int(starts[si]), int(lens[si])
            rids = rid_col.slice(s, ln).to_pylist()
            mns = mn_col.slice(s, ln).to_pylist()
            for x, y in window_pairs(ln, cfg.block_cap, cfg.max_pairs_per_block):
                # sorted by record_id within the segment → x < y is canonical;
                # the same record cannot appear twice under one block key
                ia.append(rids[x])
                ib.append(rids[y])
                ma.append(mns[x])
                mb.append(mns[y])
        return pa.table({
            "id_a": pa.array(ia, type=pa.string()),
            "id_b": pa.array(ib, type=pa.string()),
            "mn_a": pa.array(ma, type=pa.string()),
            "mn_b": pa.array(mb, type=pa.string()),
        })


def _empty_pairs() -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], type=pa.string()),
            "id_b": pa.array([], type=pa.string()),
            "mn_a": pa.array([], type=pa.string()),
            "mn_b": pa.array([], type=pa.string()),
        }
    )


def pairs_stage(blocks, cfg: PipelineConfig, num_partitions: int = 0):
    """blocks → canonical deduped candidate pairs.

    1. Bucketed PairGen (windowed, capped) — one Python call per bucket.
    2. Band dedup: the same pair from different bands carries identical
       payload, so groupby(id_a,id_b) + Min aggregates is an exact first()
       (vectorized sort-based aggregate, no per-group Python).
    `num_partitions` kept for API stability; unused.
    """
    pairs = bucketed_group_apply(
        blocks, "block_key", PairGen(cfg),
        num_buckets=cfg.num_buckets,
        sort_cols=[("record_id", "ascending")])
    deduped = pairs.groupby(["id_a", "id_b"]).aggregate(Min("mn_a"), Min("mn_b"))
    return deduped.map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "mn_a", "mn_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
