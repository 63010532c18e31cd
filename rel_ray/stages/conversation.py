"""S1: conversation reconstruction — the engine's first shuffle (key=conv_id).

REL analog: a document is an ordered token stream with per-mention 100-word
context windows (``REL:src/REL/mention_detection.py::find_mentions``); here a
conversation is reconstructed by an **in-group** sort (never a global
``ds.sort``): `groupby(conv_id).map_groups(sort_by (turn_idx, ts, role))`,
then per-turn context windows (previous/next `ctx_turns` turns, capped chars)
and the `with_coref` analog (``REL:src/REL/training_datasets.py::with_coref``):
a later mention whose tokens all match an earlier mention's tokens (exact or
dotted-prefix) inherits a deterministic coref edge via `coref_prev`.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig


def _token_subset_match(later: list[str], earlier: list[str]) -> bool:
    """Every token of `later` matches some token of `earlier` (exact, or
    abbreviated 'marv.' prefix-match); honorifics ignored on the later side."""
    for t in later:
        if t in ("dr", "prof", "ms", "mr"):
            continue
        ok = False
        for e in earlier:
            if t == e or (t.endswith(".") and e.startswith(t[:-1])):
                ok = True
                break
        if not ok:
            return False
    return True


class ReconstructConversation:
    """map_groups callable over groupby(conv_id); group tables are small by
    construction (conversations have bounded turns — SURVEY §7 hard-list #6)."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, group: pa.Table) -> pa.Table:
        g = group.sort_by(
            [("turn_idx", "ascending"), ("ts", "ascending"), ("role", "ascending")]
        )
        n = g.num_rows
        texts = g.column("text").to_pylist()
        mentions = g.column("mention_norm").to_pylist()
        rids = g.column("record_id").to_pylist()
        k, cap = self.cfg.ctx_turns, self.cfg.ctx_chars

        ctx_before = [" ".join(texts[max(0, i - k) : i])[-cap:] for i in range(n)]
        ctx_after = [" ".join(texts[i + 1 : i + 1 + k])[:cap] for i in range(n)]

        coref_prev = [""] * n
        seen: list[tuple[list[str], str]] = []  # (tokens, record_id) of earlier mentions
        for i in range(n):
            m = mentions[i]
            if not m:
                continue
            toks = m.split(" ")
            for etoks, erid in reversed(seen):
                if etoks != toks and _token_subset_match(toks, etoks):
                    coref_prev[i] = erid
                    break
            seen.append((toks, rids[i]))

        g = g.append_column("ctx_before", pa.array(ctx_before, type=pa.string()))
        g = g.append_column("ctx_after", pa.array(ctx_after, type=pa.string()))
        g = g.append_column("coref_prev", pa.array(coref_prev, type=pa.string()))
        return g


def conversation_stage(ds, cfg: PipelineConfig):
    recon = ReconstructConversation(cfg)

    def reconstruct_conversation(group: pa.Table) -> pa.Table:
        return recon(group)

    return ds.groupby("conv_id").map_groups(
        reconstruct_conversation, batch_format="pyarrow"
    )
