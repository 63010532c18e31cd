"""User-extension surface (SURVEY §2.10).

REL analogs: the pluggable NER tagger (any object with a flair-compatible
``predict``) and the ED ``config`` dict. Here the extension points are
structural typing Protocols — any callable class with the right batch
signature plugs into the corresponding stage without subclassing:

  * a custom Blocker replaces ``stages.blocking.BlockKeys`` in
    ``blocking_stage`` (e.g. phonetic keys, sorted-neighborhood keys);
  * a custom PairScorer replaces ``stages.scoring.PairScorer`` in
    ``make_score_fn`` (e.g. a real embedding model loaded per process);
  * a custom MentionDetector replaces ``stages.normalize.MentionTurns``
    (e.g. a model-based NER once an artifact is available).

All receive/return ``pyarrow.Table`` batches — the stage machinery (task
pools, bucketed shuffles, checkpointing) is unchanged.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import pyarrow as pa


@runtime_checkable
class BatchTransform(Protocol):
    """Any per-batch Arrow transform usable in map_batches."""

    def __call__(self, batch: pa.Table) -> pa.Table: ...


@runtime_checkable
class Blocker(Protocol):
    """records batch (record_id, mention_norm, …) →
    exploded (block_key:int64, record_id, mention_norm) candidate rows."""

    def __call__(self, batch: pa.Table) -> pa.Table: ...


@runtime_checkable
class PairScorer(Protocol):
    """pairs batch (id_a, id_b, mn_a, mn_b) →
    edges batch (id_a, id_b, …sims…, score:float32, is_match:bool)."""

    def __call__(self, batch: pa.Table) -> pa.Table: ...


@runtime_checkable
class MentionDetector(Protocol):
    """transcripts batch → batch + (mention, mention_norm, record_id)."""

    def __call__(self, batch: pa.Table) -> pa.Table: ...
