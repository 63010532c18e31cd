"""S2: stateless normalization + mention detection over zero-copy Arrow batches.

Replaces REL's in-process normalize + NER step
(``REL:src/REL/utils.py::preprocess_mention``, ``REL:src/REL/ner/``): all
kernels are pyarrow.compute; raw ``text`` is carried untouched.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.normalize import (
    char_counts,
    extract_mentions,
    normalize_mentions,
    normalize_strings,
    token_counts,
)


def record_ids(conv_id: pa.ChunkedArray | pa.Array, turn_idx: pa.ChunkedArray | pa.Array) -> pa.Array:
    """record_id = f"{conv_id}#{turn_idx:05d}" — sorts correctly as a string."""
    padded = pc.utf8_lpad(pc.cast(turn_idx, pa.string()), width=5, padding="0")
    return pc.binary_join_element_wise(conv_id, padded, "#")


class NormalizeTurns:
    """map_batches callable: transcripts batch → turns_norm batch (+ mention cols)."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        mention = extract_mentions(text)
        out = batch
        out = out.append_column("text_norm", normalize_strings(text, nfkc=self.cfg.nfkc))
        out = out.append_column("n_chars", char_counts(text))
        out = out.append_column("n_tokens", token_counts(text))
        out = out.append_column("mention", mention)
        out = out.append_column("mention_norm",
                                normalize_mentions(mention, nfkc=self.cfg.nfkc))
        out = out.append_column(
            "record_id", record_ids(batch.column("conv_id"), batch.column("turn_idx"))
        )
        return out


def normalize_stage(ds, cfg: PipelineConfig):
    return ds.map_batches(
        NormalizeTurns(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )


class MentionTurns:
    """Linkage-path variant of NormalizeTurns: only the columns the linkage
    pipeline consumes (mention detection + record ids). text_norm / token
    counts are NOT computed — they would ride through the conversation
    shuffle (the engine's biggest byte mover) unused.
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        mention = extract_mentions(text)
        out = batch
        out = out.append_column("mention", mention)
        out = out.append_column("mention_norm",
                                normalize_mentions(mention, nfkc=self.cfg.nfkc))
        out = out.append_column(
            "record_id", record_ids(batch.column("conv_id"), batch.column("turn_idx"))
        )
        return out


def mention_stage(ds, cfg: PipelineConfig):
    return ds.map_batches(
        MentionTurns(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )
