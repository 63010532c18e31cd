"""protocols.PairScorer plug-in seam: the worked model example
(rel_ray/examples/model_scorer.py) must slot into the unmodified stage
machinery and drive the flagship to high F1."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rel_ray.config import DEFAULT_CONFIG
from rel_ray.examples.model_scorer import (ModelPairScorer, make_demo_weights,
                                           save_demo_weights)


def _pairs_batch() -> pa.Table:
    return pa.table({
        "id_a": pa.array(["a1", "a2", "a3", "a4"]),
        "id_b": pa.array(["b1", "b2", "b3", "b4"]),
        "mn_a": pa.array(["acme corporation", "john smith",
                          "acme corporation", ""]),
        "mn_b": pa.array(["acme corp", "completely different",
                          "acme corporation", ""]),
    })


def test_model_scorer_batch_contract(tmp_path):
    """Checkpoint round-trip + output schema + decision sanity: identical
    strings match, unrelated strings don't; batch-size invariance."""
    path = save_demo_weights(str(tmp_path / "scorer.npz"))
    scorer = ModelPairScorer(weights_path=path)
    out = scorer(_pairs_batch())
    assert out.schema.names == ["id_a", "id_b", "sim_jaccard", "sim_jw",
                                "sim_emb", "score", "is_match"]
    m = dict(zip(out.column("id_a").to_pylist(),
                 out.column("is_match").to_pylist()))
    assert m["a3"] is True      # exact equality
    assert m["a2"] is False     # unrelated
    assert m["a4"] is False     # empty strings never match

    # splitting the batch must not change any row's score (per-batch state
    # like the shared dictionary-encode must not leak across rows)
    full = out.column("score").to_pylist()
    halves = [scorer(_pairs_batch().slice(0, 2)),
              scorer(_pairs_batch().slice(2, 2))]
    split = sum((h.column("score").to_pylist() for h in halves), [])
    assert np.allclose(full, split, atol=0.0)


def test_model_scorer_numpy_weights_deterministic():
    w1 = make_demo_weights()
    w2 = make_demo_weights()
    for k in w1:
        assert np.array_equal(w1[k], w2[k])


@pytest.mark.usefixtures("ray_session")
def test_model_scorer_plugs_into_linkage(tiny_corpus, tmp_path):
    """End-to-end: run_linkage(scorer=ModelPairScorer) — the actor pool
    loads the checkpoint once per actor and the pipeline reaches F1 ≥ 0.95
    on the synthetic corpus with the DEMO model (the engine's native
    scorer gate stays at 0.99; a hand-built MLP clearing 0.95 proves the
    seam, not the model)."""
    from rel_ray.pipelines.eval import pairwise_f1
    from rel_ray.pipelines.linkage import run_linkage

    path = save_demo_weights(str(tmp_path / "scorer.npz"))
    tr = rd.from_arrow(tiny_corpus["transcripts"])
    out = run_linkage(tr, DEFAULT_CONFIG, num_partitions=2,
                      scorer=ModelPairScorer,
                      scorer_kwargs={"weights_path": path})
    labels = rd.from_arrow(tiny_corpus["labels"])
    res = pairwise_f1(out["clusters"], labels, split="test",
                      num_partitions=2)
    assert res["f1"] >= 0.95, res


def test_model_scorer_torch_parity_if_available(tmp_path):
    """When torch exists the same weights must score identically to the
    numpy forward (skipped in torch-less environments like this one)."""
    pytest.importorskip("torch")
    path = save_demo_weights(str(tmp_path / "scorer.npz"))
    a = ModelPairScorer(weights_path=path, use_torch=True)(_pairs_batch())
    b = ModelPairScorer(weights_path=path, use_torch=False)(_pairs_batch())
    assert np.allclose(a.column("score").to_pylist(),
                       b.column("score").to_pylist(), atol=1e-6)
