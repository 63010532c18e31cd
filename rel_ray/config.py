"""Pipeline configuration — one frozen dataclass carrying every knob and the seed.

This is the engine analog of REL's ED ``config`` dict
(``REL:src/REL/entity_disambiguation.py`` — mode/model_path/hyperparams): every
tunable lives in one place, is hashable into checkpoint fingerprints
(see rel_ray.state.manifest), and is deterministic (no wall-clock anywhere).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # --- global determinism ---
    seed: int = 42

    # --- normalization (REL:src/REL/utils.py::preprocess_mention analog) ---
    nfkc: bool = True

    # --- shingling / MinHash / LSH blocking (REL candidate-selection analog:
    #     REL:src/REL/mention_detection.py::MentionDetectionBase.get_candidates) ---
    shingle_k: int = 3
    shingle_unit: str = "char"  # "char" (short mention strings) | "word" (documents)
    num_perm: int = 63          # K minhash permutations = bands * band_rows
    # S-curve knee near s≈0.35: P(co-block)=0.94 at s=0.5 (weakest intra-
    # entity variant pairs) but only 0.07 at s=0.15 (syllable-overlap noise
    # between distinct entities). r=2 put the knee at s≈0.2 and flooded the
    # pair stage ~7× at 10^4-entity scale (measured).
    bands: int = 21
    band_rows: int = 3
    # additional deterministic blocking rules UNIONED with the LSH bands
    # (each adds one salted-hash block key per record; recall can only go
    # up, pairs_stage dedups overlap). The menu and their cost/coverage
    # numbers come from the blocking-rule frontier report
    # (pipelines/eval.py::blocking_rule_frontier — on the labeled fixture
    # soundex covers typo-class variants the char-3-gram bands can miss
    # at the steep 21x3 knee). Options: "soundex", "first_token",
    # "prefix3", "first_char".
    extra_blocking_rules: tuple = ()

    # --- skew control (REL top-100-candidates cap analog:
    #     REL:src/REL/wikipedia_yago_freq.py) ---
    block_cap: int = 128        # max window width inside a block
    max_pairs_per_block: int = 4096
    # hot-key salting (stages/salting.py): keys estimated above hot_key_min
    # rows split into ≤ hot_max_shards bridge-linked shard blocks, detected
    # from a 1-in-hot_sample_mod deterministic sample of the blocking input
    salt_hot_keys: bool = True
    hot_key_min: int = 50_000
    hot_max_shards: int = 64
    hot_sample_mod: int = 64
    hot_bridge_per_shard: int = 8

    # --- conversation / context (REL 100-word ctx window analog) ---
    ctx_turns: int = 2
    ctx_chars: int = 240

    # --- pair scoring (REL:src/REL/mulrel_ranker.py local score analog) ---
    w_jaccard: float = 0.45
    w_jw: float = 0.35
    w_emb: float = 0.20
    # calibrated on the labels 'calib' split (eval.fit_threshold): fitted
    # optima across seeds land at 0.33–0.40 with F1=1.0 and the margin
    # extends past 0.52 (test F1 ≈ 1.0 there too); 0.52 sits mid-margin
    threshold: float = 0.52
    emb_dim: int = 64
    # similarity head: "sign" = hashing-trick shingle sign-vectors (default);
    # "gru" = batched byte-level GRU encoder (stages/inference.py — the REL
    # MulRelRanker GRU-head analog, deterministic seeded weights)
    emb_head: str = "sign"
    gru_dim: int = 32
    gru_seed: int = 1234

    # --- transitive clustering (REL global-coherence analog) ---
    max_cc_iters: int = 15
    # rep graphs with ≤ this many (directed) topology rows solve driver-side
    # (union-find); larger graphs run the distributed label-propagation loop.
    # Sized to DRIVER MEMORY, not caution: the coded path streams 8 B/endpoint
    # (clustering.connected_components_codes), so 50M topology rows is a
    # ~400 MB transient on the driver vs an iterative multi-round bucketed
    # exchange that is orders of magnitude slower — the old 2M default was
    # string-era sizing and put a measured 10×-wall cliff in the middle of
    # the flagship's data-scaling curve (29M-turn corpus, 2-CPU leg).
    cc_local_max_edges: int = 50_000_000

    # --- execution ---
    batch_size: int = 4096
    scorer_concurrency: int = 16  # autoscaling actor-pool max (min stays 1)
    # reducer count for bucketed shuffle-reduce stages (scale with cluster
    # size / input volume; each bucket must fit in a worker's heap).
    # Measured: too FEW buckets stalls Ray's range partitioner on the
    # low-cardinality sort key (64 buckets → 27 s noop shuffle of 3.6M rows;
    # 1024 → 6.6 s); too many adds per-bucket task overhead at small scale.
    num_buckets: int = 512

    def fingerprint(self) -> str:
        """Stable hash of the config for checkpoint-manifest lineage."""
        blob = json.dumps(dataclasses.asdict(self), sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


DEFAULT_CONFIG = PipelineConfig()
