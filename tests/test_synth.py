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
    """Intra-entity variant similarity must clear inter-entity similarity
    (SURVEY §7 hard-list #5) — checked on the variant registry directly."""
    rng = np.random.default_rng(0)
    ents = _make_entities(rng, 40)

    def shingle_set(s: str):
        codes, _ = char_ngram_codes(pa.array([s.lower()]), 3)
        return np.unique(codes)

    intra, inter = [], []
    for e in ents:
        canon = shingle_set(e["variants"][0])
        for v in e["variants"][1:]:
            # the margin that matters: every variant links to the canonical
            # hub form (transitivity closes variant-variant pairs)
            intra.append(exact_jaccard_sorted(canon, shingle_set(v)))
    for i in range(0, 39):
        for j in range(i + 1, min(i + 4, 40)):
            a = shingle_set(ents[i]["variants"][0])
            b = shingle_set(ents[j]["variants"][0])
            inter.append(exact_jaccard_sorted(a, b))
    assert min(intra) > max(inter) + 0.1, (min(intra), max(inter))
