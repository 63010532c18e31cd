"""Hot-block-key salting — explicit skew handling for the pair exchange.

Exact pre-clustering (blocking.py) already collapses identical surface
forms, so a hot block key is an LSH band key shared by MANY *distinct*
mentions — a crowded band ("generic-syllable" keys) that at web scale can
hold millions of rows. Pair COUNT per block is already bounded (windowed
pairing, `pairs.window_pair_indices`), but task BALANCE is not: the bucketed
exchange routes every row of a key to ONE bucket task, so a single hot key
makes a single straggler/OOM task. REL never meets this (its candidate sets
are capped per mention, ``REL:src/REL/mention_detection.py::
MentionDetectionBase.get_candidates``); a 10^12-turn corpus does.

Scheme (sample → split → bridge), all deterministic (splitmix64, no RNG):

1. **detect** — a 1-in-`hot_sample_mod` sample of the blocking INPUT (reps)
   runs through the same band-key stage, so detection pays 1/mod of the
   MinHash work, not a second full pass. Per-batch `value_counts` partials →
   one skinny groupby-sum → keys with estimated count ≥ `hot_key_min` are
   hot. The hot set is tiny by construction and is broadcast (`ray.put`).
2. **split** — a hot key k is rewritten to splitmix64(k ⊕ C·(shard+1)) with
   shard = h(record_id) % n_shards and n_shards = ceil(est / hot_key_min)
   capped at `hot_max_shards`: each shard is an independent windowed, capped
   block that lands in its own bucket with ~hot_key_min rows.
3. **bridge** — rows whose independent hash bits satisfy
   (h >> 32) % bridge_mod == 0 (expected `hot_bridge_per_shard` rows per
   shard) are DUPLICATED into a bridge block splitmix64(k ⊕ C·(n_shards+1));
   windowed pairing inside the bridge block chains the shards back into one
   connected component. P[a shard has no bridge row] ≈ e^-hot_bridge_per_shard
   (≈ 3·10⁻⁴ at the default 8), and only for keys where the pair cap is
   already lossy by design.

Duplicate pairs across shard/bridge blocks are removed by the existing band
dedup; key collisions after remixing merely merge two blocks (extra
candidate pairs, never lost ones). Connectivity equivalence with the
unsalted path is asserted in tests/test_ops.py.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.hashing import splitmix64
from ..functions.shingles import string_hash_u64

# mixing constant for shard/bridge key derivation (golden-ratio odd constant,
# same family as splitmix64's increment)
_SALT_C = np.uint64(0x9E3779B97F4A7C15)


def sample_rows(ds, id_col: str, mod: int):
    """Deterministic 1-in-`mod` row sample keyed on splitmix64(h(id))."""

    def keep(t: pa.Table) -> pa.Table:
        col = t.column(id_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = splitmix64(string_hash_u64(col))
        return t.filter(pa.array(h % np.uint64(mod) == 0))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def hot_key_table(sampled_blocks, cfg: PipelineConfig,
                  *, key_col: str = "block_key",
                  max_hot_keys: int = 65536) -> pa.Table:
    """(key, n_shards, bridge_mod) for keys estimated ≥ cfg.hot_key_min rows.

    Input is the block stage applied to a 1-in-`hot_sample_mod` sample;
    per-batch value_counts partials keep the merge groupby skinny.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        vc = pc.value_counts(t.column(key_col))
        return pa.table({key_col: vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    # a key needs ≥ hot_key_min/sample_mod sampled rows to qualify; prune
    # singleton sampled keys before the exchange (the vast majority)
    min_cnt = max(2, cfg.hot_key_min // cfg.hot_sample_mod // 2)
    counts = (sampled_blocks
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(key_col).aggregate(Sum("cnt", alias_name="cnt")))
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("cnt"), min_cnt)),
        batch_format="pyarrow", zero_copy_batch=True).take_all()

    keys, shards, bmods = [], [], []
    for r in hot[:max_hot_keys]:
        est = int(r["cnt"]) * cfg.hot_sample_mod
        if est < cfg.hot_key_min:
            continue
        ns = min(cfg.hot_max_shards,
                 max(2, math.ceil(est / cfg.hot_key_min)))
        keys.append(int(r[key_col]))
        shards.append(ns)
        bmods.append(max(1, est // (ns * cfg.hot_bridge_per_shard)))
    return pa.table({
        "key": pa.array(keys, type=pa.int64()),
        "n_shards": pa.array(shards, type=pa.int64()),
        "bridge_mod": pa.array(bmods, type=pa.int64()),
    })


def salt_blocks(blocks, hot_tab: pa.Table, *, key_col: str = "block_key",
                id_col: str = "record_id"):
    """Rewrite hot keys to shard keys and append bridge-duplicate rows.

    The hot table is broadcast once (`ray.put`) and cached per worker
    process; per batch the lookup is one np.searchsorted over the sorted hot
    keys — no per-row Python.
    """
    import ray as _ray

    from ..functions.rayutil import get_broadcast

    order = pc.sort_indices(hot_tab.column("key"))
    hot_sorted = hot_tab.take(order)
    ref = _ray.put({
        "keys": np.asarray(hot_sorted.column("key"), dtype=np.int64),
        "shards": np.asarray(hot_sorted.column("n_shards"), dtype=np.int64),
        "bmod": np.asarray(hot_sorted.column("bridge_mod"), dtype=np.int64),
    })
    def salt(t: pa.Table) -> pa.Table:
        h_tab = get_broadcast(ref)
        hkeys = h_tab["keys"]
        col = t.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        k = np.asarray(col, dtype=np.int64)
        pos = np.searchsorted(hkeys, k)
        pos_c = np.minimum(pos, len(hkeys) - 1) if len(hkeys) else pos
        hit = (hkeys[pos_c] == k) if len(hkeys) else np.zeros(len(k), bool)
        if not hit.any():
            return t
        hi = np.nonzero(hit)[0]
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        taken = ids.take(pa.array(hi))
        if pa.types.is_integer(ids.type):
            # coded layout (rep_code int64): mix the code directly
            h = splitmix64(np.asarray(taken, dtype=np.int64).view(np.uint64))
        else:
            h = splitmix64(string_hash_u64(taken))
        ns = h_tab["shards"][pos_c[hi]].astype(np.uint64)
        shard = h % ns
        ku_hit = k.view(np.uint64)[hi]
        with np.errstate(over="ignore"):
            salted = splitmix64(ku_hit ^ (_SALT_C * (shard + np.uint64(1))))
            bridge_key = splitmix64(ku_hit ^ (_SALT_C * (ns + np.uint64(1))))
        out = k.copy()
        out[hi] = salted.view(np.int64)
        ci = t.schema.get_field_index(key_col)
        rewritten = t.set_column(ci, key_col, pa.array(out, type=pa.int64()))

        bmod = h_tab["bmod"][pos_c[hi]].astype(np.uint64)
        bmask = (h >> np.uint64(32)) % bmod == 0
        if not bmask.any():
            return rewritten
        bi = hi[bmask]
        bridges = t.take(pa.array(bi)).set_column(
            ci, key_col,
            pa.array(bridge_key[bmask].view(np.int64), type=pa.int64()))
        return pa.concat_tables([rewritten, bridges])

    return blocks.map_batches(salt, batch_format="pyarrow",
                              zero_copy_batch=True)


def salted_blocking(reps, cfg: PipelineConfig, *, est_rows: int | None = None,
                    coded: bool = False):
    """blocking_stage + hot-key salting, gated by corpus size.

    `est_rows` is the caller's row-count estimate for the blocks table
    (reps × bands); when it is below cfg.hot_key_min no key can be hot and
    both the detection pass and the salt map are skipped entirely — small
    corpora pay nothing. When the estimate is unknown (None) detection runs.
    Detection itself samples the blocking INPUT 1-in-`hot_sample_mod`, so it
    costs ~1/mod of one blocking pass plus one skinny groupby.
    """
    from .blocking import blocking_stage

    blocks = blocking_stage(reps, cfg, coded=coded)
    if not cfg.salt_hot_keys:
        return blocks
    if est_rows is not None and est_rows < cfg.hot_key_min:
        return blocks
    sampled = sample_rows(reps, "record_id", cfg.hot_sample_mod)
    hot = hot_key_table(blocking_stage(sampled, cfg), cfg)
    if hot.num_rows == 0:
        return blocks
    return salt_blocks(blocks, hot,
                       id_col="rep_code" if coded else "record_id")
