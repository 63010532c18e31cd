"""Batched model-inference stages (rel_ray/stages/inference.py): the linear
quality classifier (actor-pool, broadcast weights) and the byte-level GRU
encoder (the REL MulRelRanker GRU-head analog)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rel_ray.stages.inference import (
    DEFAULT_BIAS,
    DEFAULT_WEIGHTS,
    LinearClassifier,
    gru_encode,
    quality_classifier,
    text_features,
)


def _docs_table():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "the cat and the dog sat in the yard for hours with joy",
            "!!! ??? ... ###",
            "",
            "a b c",
        ]),
    })


def test_linear_classifier_known_answer():
    t = _docs_table()
    out = LinearClassifier()(t)
    feats = text_features(t.column("text"))
    want = (DEFAULT_WEIGHTS["n_tokens"] * feats["n_tokens"]
            + DEFAULT_WEIGHTS["n_stop"] * feats["n_stop"]
            + DEFAULT_WEIGHTS["n_punct"] * feats["n_punct"]
            + DEFAULT_BIAS)
    assert out.column("logit").to_pylist() == want.tolist()
    assert out.column("is_keep").to_pylist() == (want >= 0).tolist()
    # doc 1: 13 tokens, 5 stopword hits ("the"x3,"and","in","for","with"=7?)
    # pin the first row fully by hand: tokens=13, punct=0
    feats0 = {k: v[0] for k, v in feats.items()}
    assert feats0["n_tokens"] == 13 and feats0["n_punct"] == 0
    assert out.column("logit")[0].as_py() == (
        13 + 8 * feats0["n_stop"] - 30)
    # pure-punctuation doc must be dropped, empty doc too
    keep = out.column("is_keep").to_pylist()
    assert keep[1] is False and keep[2] is False


@pytest.mark.usefixtures("ray_session")
def test_quality_classifier_actor_pool_custom_weights():
    ds = rd.from_arrow(_docs_table())
    out = quality_classifier(ds, weights={"n_tokens": 2, "n_stop": 0,
                                          "n_punct": 0}, bias=-6,
                             concurrency=(1, 2))
    tab = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")],
        promote_options="default").sort_by("doc_id")
    # logit = 2*n_tokens - 6
    assert tab.column("logit").to_pylist() == [2 * 13 - 6, 2 * 4 - 6,
                                               -6, 2 * 3 - 6]
    assert tab.column("is_keep").to_pylist() == [True, True, False, True]


def test_gru_encode_deterministic_and_normalized():
    s = pa.array(["marva hollen", "tobias quent", "x", ""])
    a = gru_encode(s)
    b = gru_encode(s)
    np.testing.assert_array_equal(a, b)
    norms = np.linalg.norm(a, axis=1)
    np.testing.assert_allclose(norms[:3], 1.0, rtol=1e-5)
    assert norms[3] == 0.0  # empty string → zero vector
    # distinct strings get distinct encodings
    assert not np.allclose(a[0], a[1])


def test_gru_encode_batch_invariant():
    """A string's encoding must not depend on what shares its batch (the
    padding mask freezes finished rows)."""
    alone = gru_encode(pa.array(["marva hollen"]))
    crowd = gru_encode(pa.array(
        ["marva hollen", "a much longer string that forces extra timesteps",
         "", "zz"]))
    # float32 matmul reduction order varies with batch shape (BLAS kernel
    # choice), so allow a few ULPs of absolute slack — the invariant under
    # test is the padding mask, not bit-identical arithmetic.
    np.testing.assert_allclose(alone[0], crowd[0], rtol=1e-5, atol=1e-6)


def test_gru_encode_truncation_and_unicode():
    long = "x" * 500
    trunc = gru_encode(pa.array([long]), max_len=48)
    head = gru_encode(pa.array([long[:48]]), max_len=48)
    np.testing.assert_allclose(trunc[0], head[0], rtol=1e-5, atol=1e-6)
    # multi-byte codepoints: byte-level tokens, no decode errors, stable
    uni = gru_encode(pa.array(["Čapek 東京 émile", "Čapek 東京 émile"]))
    np.testing.assert_array_equal(uni[0], uni[1])
    assert np.isfinite(uni).all()


def test_gru_encode_sliced_array_offsets():
    """Zero-copy buffer reads must honor a non-zero array offset."""
    base = pa.array(["aaa", "bbb", "marva hollen", "ccc"])
    sliced = base.slice(2, 2)
    np.testing.assert_allclose(
        gru_encode(sliced)[0],
        gru_encode(pa.array(["marva hollen"]))[0], rtol=1e-5, atol=1e-6)


def test_scorer_gru_head():
    """cfg.emb_head='gru' swaps the similarity head: identical surface forms
    score sim_emb == 1, and the scorer still emits the full schema."""
    import dataclasses

    from rel_ray.config import DEFAULT_CONFIG
    from rel_ray.stages.scoring import PairScorer

    cfg = dataclasses.replace(DEFAULT_CONFIG, emb_head="gru")
    batch = pa.table({
        "id_a": pa.array(["a1", "a2"]),
        "id_b": pa.array(["b1", "b2"]),
        "mn_a": pa.array(["marva hollen", "marva hollen"]),
        "mn_b": pa.array(["marva hollen", "tobias quent"]),
    })
    out = PairScorer(cfg)(batch)
    sim = out.column("sim_emb").to_pylist()
    assert sim[0] == pytest.approx(1.0, abs=1e-5)
    assert sim[1] < sim[0]
    assert out.column("is_match").to_pylist()[0] is True
