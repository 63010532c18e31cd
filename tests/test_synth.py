"""Fixture-generator correctness: determinism, schema, noise calibration."""

import numpy as np
import pyarrow as pa

from rel_ray import schemas
from rel_ray.functions.shingles import char_ngram_codes, exact_jaccard_sorted
from rel_ray.synth import _make_entities, generate_corpus


def test_schema_and_determinism(tiny_corpus):
    c = tiny_corpus
    schemas.assert_schema(c["transcripts"], schemas.TRANSCRIPTS, allow_extra=False)
    schemas.assert_schema(c["gold_clusters"], schemas.GOLD_CLUSTERS, allow_extra=False)
    schemas.assert_schema(c["labels"], schemas.LABELS, allow_extra=False)
    c2 = generate_corpus(seed=42, n_convs=60)
    assert c2["transcripts"].equals(c["transcripts"])
    assert c2["labels"].equals(c["labels"])


def test_turn_rows_shuffled_but_complete(tiny_corpus):
    t = tiny_corpus["transcripts"]
    conv = t.column("conv_id").to_pylist()
    idx = t.column("turn_idx").to_pylist()
    per_conv = {}
    for c, i in zip(conv, idx):
        per_conv.setdefault(c, []).append(i)
    # complete 0..n-1 per conversation, and at least one conversation stored unsorted
    any_unsorted = False
    for c, ids in per_conv.items():
        assert sorted(ids) == list(range(len(ids)))
        if ids != sorted(ids):
            any_unsorted = True
    assert any_unsorted


def test_labels_have_both_classes_and_splits(tiny_corpus):
    lab = tiny_corpus["labels"]
    same = lab.column("same_entity").to_pylist()
    split = lab.column("split").to_pylist()
    assert any(same) and not all(same)
    assert "calib" in split and "test" in split
    # canonical ordering
    for a, b in zip(lab.column("id_a").to_pylist(), lab.column("id_b").to_pylist()):
        assert a < b


def test_noise_calibration_margin():
    """The fixture must be solvable BY DESIGN under the shipped scorer
    (SURVEY §7 hard-list #5): every intra-entity (variant, canonical) pair
    must score above the match threshold, and every cross-entity pair —
    including the deliberately-confusable same-family-name entities and ALL
    their variant combinations — must score below it. Checked with the
    engine's own feature kernels (Jaccard + JW + sign-embedding), not a raw
    single-feature proxy: confusables overlap in raw Jaccard on purpose."""
    from rel_ray.config import DEFAULT_CONFIG as cfg
    from rel_ray.functions.normalize import normalize_mentions
    from rel_ray.functions.strsim import jaro_winkler
    from rel_ray.stages.scoring import (
        _sign_embed,
        encode_pair_strings,
        pairwise_jaccard,
    )

    def scores(pairs):
        a = pa.array([normalize_mentions(pa.array([x]))[0].as_py()
                      for x, _ in pairs])
        b = pa.array([normalize_mentions(pa.array([y]))[0].as_py()
                      for _, y in pairs])
        ia, ib, uc, us = encode_pair_strings(a, b, cfg)
        emb = _sign_embed(uc, us)
        se = np.einsum("ij,ij->i", emb[ia], emb[ib])
        sj = pairwise_jaccard(ia, ib, uc, us)
        jw = np.array([jaro_winkler(x.as_py(), y.as_py())
                       for x, y in zip(a, b)])
        return cfg.w_jaccard * sj + cfg.w_jw * jw + cfg.w_emb * se

    for seed in (0, 42):
        rng = np.random.default_rng(seed)
        ents = _make_entities(rng, 60)
        # intra: every variant links to the canonical hub form (transitivity
        # closes variant-variant pairs)
        intra = [(e["variants"][0], v) for e in ents for v in e["variants"][1:]]
        inter = [(va, vb)
                 for i in range(len(ents)) for j in range(i + 1, len(ents))
                 for va in ents[i]["variants"] for vb in ents[j]["variants"]]
        si, so = scores(intra), scores(inter)
        assert si.min() >= cfg.threshold, (seed, si.min())
        assert so.max() < cfg.threshold, (seed, so.max())
