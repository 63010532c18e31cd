"""S1: conversation reconstruction — the engine's first shuffle (key=conv_id).

REL analog: a document is an ordered token stream with per-mention 100-word
context windows (``REL:src/REL/mention_detection.py::find_mentions``); here a
conversation is reconstructed by an **in-group** sort (never a global
``ds.sort``), then per-turn context windows (previous/next `ctx_turns` turns,
capped chars), then the multi-mention explosion (one record per detected
mention span — find_mentions parity) and the `with_coref` analog
(``REL:src/REL/training_datasets.py::with_coref``): a later mention whose
tokens all match an earlier mention's tokens (exact or dotted-prefix)
inherits a deterministic coref edge via `coref_prev`.

Execution: bucketed shuffle-reduce (rayutil.bucketed_group_apply) keyed by
conv_id, sorted by (conv_id, turn_idx, ts, role) — the deterministic total
order (SURVEY §2.9). Context windows are vectorized shifts with
segment-boundary masks; only the order-sensitive coref scan is a Python loop,
and it runs once per bucket over numpy-extracted arrays, not once per
conversation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.rayutil import bucketed_group_apply, segment_starts


def _token_subset_match(later: list[str], earlier: list[str]) -> bool:
    """Every token of `later` matches some token of `earlier` (exact, or
    abbreviated 'marv.' prefix-match); honorifics ignored on the later side."""
    for t in later:
        if t in ("dr", "prof", "ms", "mr", "mrs"):
            continue
        ok = False
        for e in earlier:
            if t == e or (t.endswith(".") and e.startswith(t[:-1])):
                ok = True
                break
        if not ok:
            return False
    return True


def _shifted(col: pa.Array, shift: int, seg_id: np.ndarray) -> pa.Array:
    """Value `shift` rows away, "" when it crosses a segment boundary."""
    n = len(col)
    idx = np.arange(n, dtype=np.int64) + shift
    valid = (idx >= 0) & (idx < n)
    src = np.where(valid, idx, 0)
    valid &= seg_id[src] == seg_id
    taken = col.take(pa.array(src))
    return pc.if_else(pa.array(valid), taken, pa.scalar("", type=pa.string()))


class ReconstructConversation:
    """Bucket callback over conv_id buckets sorted by the total turn order."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, bucket: pa.Table) -> pa.Table:
        # input: RAW turn rows sorted by (conv_id, turn_idx, ts, role).
        # Pipeline inside the bucket: turn-level context windows → mention
        # explosion (one record per mention span) → order-sensitive coref
        # scan over mention records. Mention detection runs HERE, after the
        # shuffle: the conversation exchange is the engine's biggest byte
        # mover and must not carry derivable columns.
        from .normalize import MentionTurns

        cfg = self.cfg
        n = bucket.num_rows
        if n == 0:
            out = MentionTurns(cfg)(bucket)
            for c in ("ctx_before", "ctx_after", "coref_prev", "coref_prev_mn"):
                out = out.append_column(c, pa.array([], type=pa.string()))
            return out
        starts = segment_starts(bucket.column("conv_id"))
        lens = np.diff(np.append(starts, n))
        seg_id = np.repeat(np.arange(len(starts), dtype=np.int64), lens)

        text = bucket.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()

        # context windows: join of the ctx_turns neighboring turns' text,
        # capped at ctx_chars (before: keep the suffix; after: the prefix)
        before_parts = [_shifted(text, -k, seg_id)
                        for k in range(cfg.ctx_turns, 0, -1)]
        after_parts = [_shifted(text, k, seg_id)
                       for k in range(1, cfg.ctx_turns + 1)]
        ctx_before = before_parts[0]
        for p in before_parts[1:]:
            ctx_before = pc.binary_join_element_wise(ctx_before, p, " ")
        ctx_after = after_parts[0]
        for p in after_parts[1:]:
            ctx_after = pc.binary_join_element_wise(ctx_after, p, " ")
        ctx_before = pc.utf8_slice_codeunits(
            pc.utf8_trim_whitespace(ctx_before), start=-cfg.ctx_chars)
        ctx_after = pc.utf8_slice_codeunits(
            pc.utf8_trim_whitespace(ctx_after), start=0, stop=cfg.ctx_chars)

        bucket = bucket.append_column("ctx_before", ctx_before)
        bucket = bucket.append_column("ctx_after", ctx_after)

        # mention explosion: one record per mention span, in (turn, span)
        # order — conv_id segments stay contiguous, so the coref scan below
        # recomputes boundaries on the exploded rows
        exploded = MentionTurns(cfg)(bucket)
        m = exploded.num_rows

        # with_coref: order-sensitive scan per conversation segment. Both the
        # earlier record's id AND its mention string are recorded — the
        # mention lets coref edges resolve to representatives via a broadcast
        # map instead of a corpus-wide co-group (stages/linkage).
        ex_starts = segment_starts(exploded.column("conv_id"))
        mentions = exploded.column("mention_norm").to_pylist()
        rids = exploded.column("record_id").to_pylist()
        coref_prev = [""] * m
        coref_prev_mn = [""] * m
        seg_starts_set = set(ex_starts.tolist())
        seen: list[tuple[list[str], str, str]] = []
        for i in range(m):
            if i in seg_starts_set:
                seen = []
            mn = mentions[i]
            if not mn:
                continue
            toks = mn.split(" ")
            for etoks, erid, emn in reversed(seen):
                if etoks != toks and _token_subset_match(toks, etoks):
                    coref_prev[i] = erid
                    coref_prev_mn[i] = emn
                    break
            seen.append((toks, rids[i], mn))

        out = exploded
        out = out.append_column("coref_prev", pa.array(coref_prev, type=pa.string()))
        out = out.append_column("coref_prev_mn",
                                pa.array(coref_prev_mn, type=pa.string()))
        return out


_SORT_COLS = [("turn_idx", "ascending"), ("ts", "ascending"),
              ("role", "ascending")]


def conversation_stage(ds, cfg: PipelineConfig, *, locality: bool = True,
                       span_row_share_fallback: float = 0.3,
                       max_span_convs: int = 4_000_000):
    """Conversation reconstruction, locality-aware.

    Real transcript corpora are written conversation-contiguously (one
    writer appends whole conversations to a shard), so after a parquet read
    almost every conversation already sits entirely inside ONE block — the
    engine's biggest byte-mover (the conv_id sort-exchange of the full raw
    text) is then avoidable for all but the handful of conversations that
    straddle a block boundary. This stage proves containment instead of
    assuming it:

    1. materialize the input (pins block boundaries so passes 2–3 see the
       exact same blocks pass 1 counted — block identity is load-bearing);
    2. one SKINNY pass: per block, (conv_hash → local row count), reduced by
       a bucketed exchange over ~#convs 16-byte rows. A conversation is
       block-contained iff sum == max (all its rows in one block). Hash
       collisions can only promote contained→spanning (counts merge), never
       the reverse — the spanning side groups on the true conv_id string,
       so collisions cost bytes, not correctness;
    3. block-contained conversations reconstruct block-locally (an in-block
       Arrow sort + the same callback, ZERO exchange); the spanning rows —
       boundary-sized on contiguous layouts — go through the original
       bucketed sort-exchange, and the two outputs union.

    Adversarial (conversation-shuffled) layouts degrade gracefully: if the
    spanning rows exceed ``span_row_share_fallback`` of the corpus (or the
    spanning vocabulary exceeds ``max_span_convs``, the collect guard), the
    stage runs the classic full exchange on the already-materialized input —
    one skinny counting pass of overhead, nothing lost. ``locality=False``
    forces the classic path (the equivalence test pins both paths
    byte-identical on the same shuffled input)."""
    cb = ReconstructConversation(cfg)
    if not locality:
        return bucketed_group_apply(ds, "conv_id", cb,
                                    num_buckets=cfg.num_buckets,
                                    sort_cols=_SORT_COLS)

    import ray as _ray

    from ..functions.rayutil import (adaptive_buckets, collect_table,
                                     get_broadcast)
    from ..functions.rayutil import phase_timer as _phase_timer
    from ..functions.shingles import string_hash_u64

    order = [("conv_id", "ascending")] + _SORT_COLS
    with _phase_timer("conv_input_materialize"):
        mat = ds.materialize()
    total = mat.count()
    if total == 0:
        return mat.map_batches(lambda t: cb(t), batch_format="pyarrow")

    def conv_block_counts(t: pa.Table) -> pa.Table:
        col = t.column("conv_id")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u, c = np.unique(string_hash_u64(col), return_counts=True)
        return pa.table({"ch": pa.array(u.view(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    counts = mat.map_batches(conv_block_counts, batch_size=None,
                             batch_format="pyarrow", zero_copy_batch=True)

    # A hash spans blocks iff it appears in >1 (block, count) row, i.e.
    # sum-over-blocks != max-over-blocks. NOT a ray groupby: ~#convs tiny
    # groups hit Ray's per-group hash-aggregate overhead (measured 258 s at
    # 1.9M convs / 8 CPUs); a bucketed exchange + one sort + two reduceat
    # chains per bucket does the identical reduction in ~2 s.
    def span_of_bucket(t: pa.Table) -> pa.Table:
        ch = np.asarray(t.column("ch"), dtype=np.int64)  # bucket-sorted
        n = np.asarray(t.column("n"), dtype=np.int64)
        starts = np.flatnonzero(np.diff(ch, prepend=ch[0] - 1)) \
            if len(ch) else np.empty(0, dtype=np.int64)
        sums = np.add.reduceat(n, starts) if len(ch) else n
        maxs = np.maximum.reduceat(n, starts) if len(ch) else n
        keep = sums != maxs
        return pa.table({"ch": pa.array(ch[starts][keep]),
                         "sum_n": pa.array(sums[keep])})

    with _phase_timer("conv_span_count"):
        span = bucketed_group_apply(
            counts, "ch", span_of_bucket,
            num_buckets=adaptive_buckets(total, cfg.num_buckets)).materialize()
        n_span_convs = span.count()
    if n_span_convs == 0:
        # fully block-contained corpus: zero exchange, zero driver collect
        return mat.map_batches(
            lambda t: cb(t.sort_by(order)), batch_size=None,
            batch_format="pyarrow", zero_copy_batch=True)
    if n_span_convs > max_span_convs:
        return bucketed_group_apply(mat, "conv_id", cb,
                                    num_buckets=cfg.num_buckets,
                                    sort_cols=_SORT_COLS)
    span_tab = collect_table(
        span, pa.schema([("ch", pa.int64()), ("sum_n", pa.int64())]))
    span_rows = int(pc.sum(span_tab.column("sum_n")).as_py() or 0)
    if span_rows > span_row_share_fallback * total:
        return bucketed_group_apply(mat, "conv_id", cb,
                                    num_buckets=cfg.num_buckets,
                                    sort_cols=_SORT_COLS)
    span_h = np.sort(
        np.asarray(span_tab.column("ch"), dtype=np.int64).view(np.uint64))
    sref = _ray.put(span_h)

    def span_mask(t: pa.Table) -> np.ndarray | None:
        sh = get_broadcast(sref)
        if len(sh) == 0:
            return None
        col = t.column("conv_id")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = string_hash_u64(col)
        pos = np.minimum(np.searchsorted(sh, h), len(sh) - 1)
        return sh[pos] == h

    def local_reconstruct(t: pa.Table) -> pa.Table:
        m = span_mask(t)
        if m is not None and m.any():
            t = t.filter(pa.array(~m))
        return cb(t.sort_by(order))

    local = mat.map_batches(local_reconstruct, batch_size=None,
                            batch_format="pyarrow", zero_copy_batch=True)
    if span_rows == 0:
        return local

    def spanning_only(t: pa.Table) -> pa.Table:
        m = span_mask(t)
        return t.filter(pa.array(m))

    boundary = mat.map_batches(spanning_only, batch_size=None,
                               batch_format="pyarrow", zero_copy_batch=True)
    exchanged = bucketed_group_apply(
        boundary, "conv_id", cb,
        num_buckets=adaptive_buckets(span_rows, cfg.num_buckets),
        sort_cols=_SORT_COLS)
    return local.union(exchanged)
