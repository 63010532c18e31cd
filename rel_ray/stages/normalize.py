"""S2: stateless normalization + mention detection over zero-copy Arrow batches.

Replaces REL's in-process normalize + NER step
(``REL:src/REL/utils.py::preprocess_mention``, ``REL:src/REL/ner/``): all
kernels are pyarrow.compute; raw ``text`` is carried untouched.

Multi-mention semantics (REL parity:
``REL:src/REL/mention_detection.py::MentionDetection.find_mentions`` returns
EVERY mention of a document): ``MentionTurns`` EXPLODES each turn into one
record per detected mention span — ``record_id = f"{conv}#{turn:05d}#{span:03d}"``
— so a turn "ask Marva Hollen and Tobias Quent" yields two records. Turns with
no mention keep one record with ``mention == ""`` (span 000) so turn-level
consumers see every turn; ``records_stage`` filters those before linkage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.normalize import (
    MENTION_PATTERN,
    char_counts,
    extract_all_matches,
    normalize_mentions,
    normalize_strings,
    token_counts,
)


def record_ids(conv_id, turn_idx, span_idx=None) -> pa.Array:
    """record_id = f"{conv_id}#{turn_idx:05d}[#{span_idx:03d}]" — string-sortable."""
    padded = pc.utf8_lpad(pc.cast(turn_idx, pa.string()), width=5, padding="0")
    rid = pc.binary_join_element_wise(conv_id, padded, "#")
    if span_idx is not None:
        span = pc.utf8_lpad(pc.cast(span_idx, pa.string()), width=3, padding="0")
        rid = pc.binary_join_element_wise(rid, span, "#")
    return rid


class MentionTurns:
    """map_batches callable: turn rows → EXPLODED mention records.

    One output row per detected mention (all input columns repeated via one
    vectorized ``take``), plus span_idx / mention / mention_norm / record_id.
    Zero-mention turns emit a single row with mention == "".
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        text = batch.column("text")
        ml = extract_all_matches(text, MENTION_PATTERN)
        lens = np.asarray(pc.list_value_length(ml), dtype=np.int64)
        out_lens = np.maximum(lens, 1)  # zero-mention turns keep one "" row
        total = int(out_lens.sum())
        row_idx = np.repeat(np.arange(n, dtype=np.int64), out_lens)
        starts = np.cumsum(out_lens) - out_lens
        span = np.arange(total, dtype=np.int64) - np.repeat(starts, out_lens)
        real = span < lens[row_idx]  # False only for the "" placeholder rows
        mention_np = np.full(total, "", dtype=object)
        mention_np[real] = np.asarray(pc.list_flatten(ml), dtype=object)
        mention = pa.array(mention_np, type=pa.string())

        out = batch.take(pa.array(row_idx))
        out = out.append_column("span_idx", pa.array(span.astype(np.int32)))
        out = out.append_column("mention", mention)
        out = out.append_column("mention_norm",
                                normalize_mentions(mention, nfkc=self.cfg.nfkc))
        out = out.append_column(
            "record_id",
            record_ids(out.column("conv_id"), out.column("turn_idx"),
                       out.column("span_idx")))
        return out


class NormalizeTurns:
    """map_batches callable: turn-level text stats + the mention explosion."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        out = batch
        out = out.append_column("text_norm", normalize_strings(text, nfkc=self.cfg.nfkc))
        out = out.append_column("n_chars", char_counts(text))
        out = out.append_column("n_tokens", token_counts(text))
        return MentionTurns(self.cfg)(out)


def normalize_stage(ds, cfg: PipelineConfig):
    return ds.map_batches(
        NormalizeTurns(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )


def mention_stage(ds, cfg: PipelineConfig):
    """Mention detection + explosion only (no text stats)."""
    return ds.map_batches(
        MentionTurns(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )
