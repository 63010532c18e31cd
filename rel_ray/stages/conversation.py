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


def conversation_stage(ds, cfg: PipelineConfig):
    return bucketed_group_apply(
        ds, "conv_id", ReconstructConversation(cfg),
        num_buckets=cfg.num_buckets,
        sort_cols=[("turn_idx", "ascending"), ("ts", "ascending"),
                   ("role", "ascending")])
