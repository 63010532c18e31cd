"""S3–S4: exact pre-clustering + MinHash/LSH blocking (candidate selection).

REL analog: ``REL:src/REL/mention_detection.py::MentionDetectionBase
.get_candidates`` — a surface-form→candidates prior lookup, capped top-K.
Here candidates are *generated*: records sharing an LSH band key are candidates.

Scale design (SURVEY §4.3):
  1. Exact pre-clustering FIRST: records grouped by identical ``mention_norm``;
     only one representative per exact group enters blocking/pairing. Hot
     entities whose canonical form repeats 10^6× collapse to one rep. The
     rep assignment is a bucketed shuffle-reduce with vectorized segment ops
     (see rel_ray.functions.rayutil) — no per-key Python, no join.
  2. Blocks carry only (block_key, record_id, mention_norm): the payload a
     pair needs is re-derivable from mention_norm, so pairs stay string-only
     and band dedup is an adjacent-duplicate filter.
  3. Singleton blocks (the vast majority of band keys) are skipped by a
     vectorized segment-length filter inside the pair-generation bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import schemas
from ..config import PipelineConfig
from ..functions.shingles import band_keys, char_ngram_codes, minhash_signatures


def records_stage(ds, cfg: PipelineConfig):
    """Mention-bearing turns only, with linkage-relevant columns."""
    def keep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch.column("mention_norm"), ""))
        return t.select(
            ["record_id", "conv_id", "turn_idx", "role", "mention", "mention_norm",
             "ctx_before", "ctx_after", "coref_prev", "coref_prev_mn"]
        )
    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=cfg.batch_size)


def exact_precluster(records, cfg: PipelineConfig, num_partitions: int = 0,
                     *, broadcast_max_rows: int = 2_000_000):
    """Attach rep_id = min(record_id) among records with identical mention_norm.

    The rep map (mention_norm → min record_id) is computed by a vectorized
    groupby-Min over a two-column PROJECTION — never by shuffling the wide
    records table (measured: the wide-row sort-shuffle cost 14 s at 2.1M
    records where the skinny aggregate + broadcast costs ~2 s). The map is
    broadcast via ray.put and attached in a stateless map_batches; above
    `broadcast_max_rows` distinct mentions it falls back to a bucketed
    co-group of the wide table. `num_partitions` kept for API compat; unused.
    """
    import ray as _ray

    from ..functions.rayutil import adaptive_buckets, grouped_min
    # materialize first: the rep-map aggregate AND the attach pass below both
    # consume records; count() on the materialized set is free and sizes the
    # bucket exchange to the data (512 buckets on a 5k-row table is pure
    # per-group machinery cost — see adaptive_buckets)
    records = records.materialize()
    nb = adaptive_buckets(records.count(), cfg.num_buckets)
    rep_map = grouped_min(records, "mention_norm", "record_id",
                          num_buckets=nb).materialize()
    if rep_map.count() > broadcast_max_rows:
        return _exact_precluster_cogroup(records, cfg)

    lookup: dict[str, str] = {}
    for b in rep_map.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        lookup.update(zip(t.column("mention_norm").to_pylist(),
                          t.column("record_id").to_pylist()))
    ref = _ray.put(lookup)

    from ..functions.rayutil import get_broadcast

    def attach(t: pa.Table) -> pa.Table:
        table = get_broadcast(ref)
        reps = pa.array([table[m] for m in t.column("mention_norm").to_pylist()],
                        type=pa.string())
        return t.append_column("rep_id", reps)

    return records.map_batches(attach, batch_format="pyarrow",
                               zero_copy_batch=True)


def _exact_precluster_cogroup(records, cfg: PipelineConfig):
    """Fallback for giant mention vocabularies: bucketed shuffle-reduce of the
    wide records table keyed by mention_norm."""
    from ..functions.rayutil import bucketed_group_apply, segment_starts

    def attach_rep(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return bucket.append_column("rep_id",
                                        pa.array([], type=pa.string()))
        starts = segment_starts(bucket.column("mention_norm"))
        lens = np.diff(np.append(starts, n))
        reps = bucket.column("record_id").take(pa.array(starts))
        rep_col = reps.take(
            pa.array(np.repeat(np.arange(len(starts), dtype=np.int64), lens)))
        return bucket.append_column("rep_id", rep_col)

    return bucketed_group_apply(
        records, "mention_norm", attach_rep,
        num_buckets=cfg.num_buckets,
        sort_cols=[("record_id", "ascending")])


def _extra_rule_keys(mn: pa.Array, cfg: PipelineConfig
                     ) -> tuple[list, list]:
    """Salted-hash block keys for cfg.extra_blocking_rules (the rules the
    blocking-frontier report measures — eval.py::blocking_rule_frontier —
    wired into the engine as UNION candidates next to the LSH bands).
    Returns per-rule (uint64 key arrays, int64 row-index arrays); empty
    rule values are excluded (the engine-wide empty-block sentinel), and
    each rule's hash is salted so e.g. soundex('smith') and a band key
    can never alias into one block."""
    from ..functions.shingles import string_hash_u64

    ek: list = []
    er: list = []
    for ri, rule in enumerate(cfg.extra_blocking_rules):
        if rule == "soundex":
            from ..functions.phonetic import soundex_codes
            kcol = soundex_codes(mn)
        elif rule == "first_token":
            kcol = pc.list_element(pc.split_pattern(mn, " "), 0)
        elif rule == "prefix3":
            kcol = pc.utf8_slice_codeunits(mn, 0, 3)
        elif rule == "first_char":
            kcol = pc.utf8_slice_codeunits(mn, 0, 1)
        else:
            raise ValueError(
                f"unknown extra_blocking_rules entry {rule!r} — "
                "expected soundex/first_token/prefix3/first_char")
        kcol = pc.fill_null(kcol, "")
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        valid = np.asarray(pc.not_equal(kcol, ""))
        h = string_hash_u64(kcol)
        salt = np.uint64(
            ((ri + 1) * 0x9E3779B97F4A7C15 ^ cfg.seed)
            & 0xFFFFFFFFFFFFFFFF)
        hk = h ^ salt
        hk[hk == np.uint64(0)] = np.uint64(1)  # keep off the sentinel
        rows = np.nonzero(valid)[0].astype(np.int64)
        ek.append(hk[rows])
        er.append(rows)
    return ek, er


class BlockKeys:
    """map_batches: reps → exploded (block_key, record_id, mention_norm) rows.

    Vectorized over the Arrow string buffers: shingle → MinHash → band keys,
    then per-record unique keys exploded with a single `take`.

    ``coded=True`` (the linkage fast path): the input carries an int64
    ``rep_code`` (the rep's position in the record_id-SORTED broadcast rep
    table) and the output is (block_key, rep_code) — 16 B/row instead of
    the ~50-70 B of the two strings. Code order == record_id string order
    by construction, so every downstream sort/min/window decision is
    bit-identical; the scorer decodes codes back to strings from the same
    broadcast table (stages/scoring.make_score_fn).
    """

    def __init__(self, cfg: PipelineConfig, coded: bool = False):
        self.cfg = cfg
        self.coded = coded

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        mn = batch.column("mention_norm")
        if isinstance(mn, pa.ChunkedArray):
            mn = mn.combine_chunks()
        if cfg.shingle_unit == "word":
            from ..functions.shingles import word_ngram_codes
            codes, splits = word_ngram_codes(mn, cfg.shingle_k)
        else:
            codes, splits = char_ngram_codes(mn, cfg.shingle_k)
        sig = minhash_signatures(codes, splits, cfg.num_perm, cfg.seed)
        keys = band_keys(sig, cfg.bands, cfg.band_rows, cfg.seed)  # (n, bands)

        n = keys.shape[0]
        keys_sorted = np.sort(keys, axis=1)
        uniq_mask = np.ones_like(keys_sorted, dtype=bool)
        uniq_mask[:, 1:] = keys_sorted[:, 1:] != keys_sorted[:, :-1]
        uniq_mask &= keys_sorted != np.uint64(0)  # 0 = empty-text sentinel
        lens = uniq_mask.sum(axis=1)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        block_key = keys_sorted[uniq_mask]

        if cfg.extra_blocking_rules:
            ek, er = _extra_rule_keys(mn, cfg)
            block_key = np.concatenate([block_key] + ek)
            row_idx = np.concatenate([row_idx] + er)

        # int64 bit-view: Ray's hash-shuffle keys don't support uint64
        bk = pa.array(block_key.view(np.int64), type=pa.int64())
        if self.coded:
            codes = batch.column("rep_code").take(pa.array(row_idx))
            return pa.table({"block_key": bk, "rep_code": codes})
        taken = batch.select(["record_id", "mention_norm"]).take(pa.array(row_idx))
        return pa.table(
            {
                "block_key": bk,
                "record_id": taken.column("record_id"),
                "mention_norm": taken.column("mention_norm"),
            }
        )


def blocking_stage(reps, cfg: PipelineConfig, *, coded: bool = False):
    return reps.map_batches(BlockKeys(cfg, coded), batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=cfg.batch_size)
