"""Worked ``protocols.PairScorer`` plug-in: a neural pair-match model
loaded ONCE PER ACTOR and applied per Arrow batch.

This is the REL-parity seam for users with real model artifacts (REL's
``mulrel_ranker.py`` loads a trained torch MulRelRanker checkpoint and
scores candidate pairs; REL module anchors per SURVEY.md §0). The engine
ships deterministic analogs by default — this example shows how to plug an
actual learned model into the same stage machinery:

    from rel_ray.examples.model_scorer import ModelPairScorer, save_demo_weights
    path = save_demo_weights("/tmp/scorer.npz")         # or a real checkpoint
    out = run_linkage(transcripts, cfg,
                      scorer=ModelPairScorer,
                      scorer_kwargs={"weights_path": path})

Scheduling contract (see stages/scoring.py::scoring_stage): when a
``scorer`` class is passed, the stage runs it as an autoscaling ACTOR pool
(``concurrency=(1, cfg.scorer_concurrency)``) — ``__init__`` (the expensive
artifact read / model build) executes once per actor process, ``__call__``
once per batch. That is exactly the economics a real checkpoint needs; the
engine's built-in scorer keeps its cheaper task-pool path.

Torch is OPTIONAL: the forward pass is a two-layer MLP expressed in numpy,
and when ``torch`` is importable the same weights are loaded into an
``nn.Module`` instead (``use_torch=True`` forces it; the default
auto-detects). Both paths are bit-comparable at float32 for this
architecture, and the numpy path keeps the example runnable and TESTED in
environments without torch (this container has none).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig

# feature vector per pair: [char-shingle jaccard, length ratio, exact-eq]
_FEAT_DIM = 3
_HIDDEN = 8


def make_demo_weights(seed: int = 2026) -> dict[str, np.ndarray]:
    """A small hand-calibrated MLP (3 → 8 → 1) that monotonically maps the
    pair features to a match probability. Hidden units are jittered copies
    of a jaccard-dominant direction, so the model is a smooth, learned-
    looking surface with a decision boundary near jaccard ≈ 0.5 — good
    enough to drive the full pipeline to high F1 on the synthetic corpus,
    while remaining a pure construction (no external artifact, per the
    no-external-data rule). A real user replaces this with np.load/torch.load."""
    rng = np.random.default_rng(seed)
    w1 = np.tile(np.array([[8.0], [1.0], [4.0]], dtype=np.float32),
                 (1, _HIDDEN))
    w1 = w1 + rng.normal(0, 0.05, size=(_FEAT_DIM, _HIDDEN)).astype(np.float32)
    b1 = np.linspace(-4.5, -3.5, _HIDDEN).astype(np.float32)
    w2 = np.full((_HIDDEN, 1), 2.0 / _HIDDEN, dtype=np.float32)
    b2 = np.array([-1.0], dtype=np.float32)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2}


def save_demo_weights(path: str, seed: int = 2026) -> str:
    """Write the demo checkpoint as .npz — the artifact a real deployment
    would ship; ModelPairScorer.__init__ reads it once per actor."""
    np.savez(path, **make_demo_weights(seed))
    return path if path.endswith(".npz") else path + ".npz"


class ModelPairScorer:
    """protocols.PairScorer: pairs batch (id_a, id_b, mn_a, mn_b) →
    edges batch (id_a, id_b, sim_jaccard, sim_jw, sim_emb, score, is_match).

    The output schema matches the engine scorer's so every downstream stage
    (match filter, confidence merge, eval) is untouched.
    """

    def __init__(self, weights_path: str | None = None,
                 threshold: float = 0.5, use_torch: bool | None = None,
                 cfg: PipelineConfig = DEFAULT_CONFIG):
        # ---- once-per-actor setup: read the artifact, build the model ----
        if weights_path:
            with np.load(weights_path) as z:
                w = {k: z[k].astype(np.float32) for k in
                     ("w1", "b1", "w2", "b2")}
        else:
            w = make_demo_weights()
        self.threshold = np.float32(threshold)
        self.cfg = cfg
        if use_torch is None:
            try:
                import torch  # noqa: F401
                use_torch = True
            except ImportError:
                use_torch = False
        if use_torch:
            import torch

            class _Mlp(torch.nn.Module):
                def __init__(self, w):
                    super().__init__()
                    self.l1 = torch.nn.Linear(_FEAT_DIM, _HIDDEN)
                    self.l2 = torch.nn.Linear(_HIDDEN, 1)
                    with torch.no_grad():
                        self.l1.weight.copy_(torch.from_numpy(w["w1"].T))
                        self.l1.bias.copy_(torch.from_numpy(w["b1"]))
                        self.l2.weight.copy_(torch.from_numpy(w["w2"].T))
                        self.l2.bias.copy_(torch.from_numpy(w["b2"]))

                def forward(self, x):
                    return torch.sigmoid(
                        self.l2(torch.relu(self.l1(x)))).squeeze(-1)

            self._model = _Mlp(w).eval()
            torch.set_num_threads(1)  # stay inside the actor's CPU slot

            def forward(x: np.ndarray) -> np.ndarray:
                with torch.no_grad():
                    return self._model(
                        torch.from_numpy(x)).numpy().astype(np.float32)
        else:
            def forward(x: np.ndarray) -> np.ndarray:
                h = np.maximum(x @ w["w1"] + w["b1"], 0.0)
                z = (h @ w["w2"] + w["b2"]).ravel()
                return (1.0 / (1.0 + np.exp(-z))).astype(np.float32)

        self._forward = forward

    def _features(self, mn_a: pa.Array, mn_b: pa.Array) -> np.ndarray:
        """Vectorized pair features via the engine's shared shingle kernels
        (each DISTINCT surface form is shingled once per batch)."""
        import pyarrow.compute as pc

        from ..stages.scoring import encode_pair_strings, pairwise_jaccard

        idx_a, idx_b, ucodes, usplits = encode_pair_strings(
            mn_a, mn_b, self.cfg)
        jac = pairwise_jaccard(idx_a, idx_b, ucodes, usplits)
        la = np.asarray(pc.utf8_length(mn_a), dtype=np.float32)
        lb = np.asarray(pc.utf8_length(mn_b), dtype=np.float32)
        ratio = np.minimum(la, lb) / np.maximum(np.maximum(la, lb), 1.0)
        eq = np.asarray(pc.equal(mn_a, mn_b), dtype=np.float32)
        return np.stack([jac, ratio, eq], axis=1).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mn_a = batch.column("mn_a")
        mn_b = batch.column("mn_b")
        if isinstance(mn_a, pa.ChunkedArray):
            mn_a = mn_a.combine_chunks()
        if isinstance(mn_b, pa.ChunkedArray):
            mn_b = mn_b.combine_chunks()
        x = self._features(mn_a, mn_b)
        prob = self._forward(x)
        return pa.table({
            "id_a": batch.column("id_a"),
            "id_b": batch.column("id_b"),
            "sim_jaccard": pa.array(x[:, 0]),
            "sim_jw": pa.array(np.zeros(len(prob), dtype=np.float32)),
            "sim_emb": pa.array(x[:, 1]),
            "score": pa.array(prob),
            "is_match": pa.array(prob >= self.threshold),
        })
