"""Known-answer unit tests for the vectorized kernels (FIXTURES.md §A.5)."""

import numpy as np
import pyarrow as pa
import pytest

from rel_ray.functions.hashing import U64_MAX, splitmix64
from rel_ray.functions.normalize import (
    extract_mentions,
    normalize_strings,
    simple_normalize,
    token_counts,
)
from rel_ray.functions.shingles import (
    band_keys,
    char_ngram_codes,
    exact_jaccard_sorted,
    minhash_signatures,
    unique_shingle_sets,
)
from rel_ray.functions.strsim import jaro_winkler


def test_splitmix64_deterministic():
    x = np.arange(5, dtype=np.uint64)
    a, b = splitmix64(x), splitmix64(x)
    assert (a == b).all()
    assert len(np.unique(a)) == 5


def test_char_ngram_codes_layout():
    arr = pa.array(["abcd", "", "ab", None, "abcd"])
    codes, splits = char_ngram_codes(arr, 3)
    assert splits.tolist() == [0, 2, 2, 3, 3, 5]
    # identical strings → identical shingles
    assert (codes[0:2] == codes[3:5]).all()


def test_minhash_identical_and_empty():
    arr = pa.array(["the quick brown fox", "", "the quick brown fox"])
    codes, splits = char_ngram_codes(arr, 3)
    sig = minhash_signatures(codes, splits, 16, seed=42)
    assert (sig[0] == sig[2]).all()
    assert (sig[1] == U64_MAX).all()


def test_minhash_estimates_jaccard():
    a = "marvok teldrin sent the draft"
    b = "marvok teldrin approved the draft"
    arr = pa.array([a, b])
    codes, splits = char_ngram_codes(arr, 3)
    sets = unique_shingle_sets(codes, splits)
    s0 = np.asarray(sets[0].values)
    s1 = np.asarray(sets[1].values)
    true_j = exact_jaccard_sorted(np.sort(s0), np.sort(s1))
    sig = minhash_signatures(codes, splits, 256, seed=7)
    est = (sig[0] == sig[1]).mean()
    assert abs(est - true_j) < 0.12


def test_band_keys_collide_iff_band_equal():
    arr = pa.array(["abcdefgh", "abcdefgh", "zzzzzzzz"])
    codes, splits = char_ngram_codes(arr, 3)
    sig = minhash_signatures(codes, splits, 8, seed=42)
    keys = band_keys(sig, 4, 2, seed=42)
    assert (keys[0] == keys[1]).all()
    assert not (keys[0] == keys[2]).any()
    # empty text → all-zero sentinel keys
    c2, s2 = char_ngram_codes(pa.array([""]), 3)
    k2 = band_keys(minhash_signatures(c2, s2, 8, 42), 4, 2, 42)
    assert (k2 == 0).all()


def test_unique_shingle_sets_sorted_unique():
    arr = pa.array(["aaaa", "abab"])
    codes, splits = char_ngram_codes(arr, 3)
    sets = unique_shingle_sets(codes, splits)
    v0 = np.asarray(sets[0].values)
    assert len(v0) == 1  # 'aaa','aaa' dedupes
    v1 = np.asarray(sets[1].values)
    assert (np.diff(v1.astype(np.uint64).view(np.uint64)) > 0).all()


def test_jaro_winkler_reference_values():
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-2)
    assert jaro_winkler("", "x") == 0.0
    assert jaro_winkler("same", "same") == 1.0


def test_normalize_strings():
    out = normalize_strings(pa.array(["  Hello\t WORLD ", "ﬁne"]))
    assert out.to_pylist() == ["hello world", "fine"]
    out2 = simple_normalize(pa.array(["  A  B "]))
    assert out2.to_pylist() == ["a b"]


def test_token_counts():
    assert token_counts(pa.array(["a b  c", "", "   ", "one"])).to_pylist() == [3, 0, 0, 1]


def test_extract_mentions():
    got = extract_mentions(
        pa.array(["ping Marvok Teldrin today", "no caps", "Dr Gwen Hald spoke", ""])
    )
    assert got.to_pylist() == ["Marvok Teldrin", "", "Dr Gwen Hald", ""]


def test_word_ngram_codes_layout():
    from rel_ray.functions.shingles import word_ngram_codes

    arr = pa.array(["the quick brown fox", "the quick brown fox",
                    "fox brown quick the", "", "one two", "single", None, "  "])
    codes, splits = word_ngram_codes(arr, 3)
    assert splits.tolist() == [0, 2, 4, 6, 6, 7, 8, 8, 8]
    assert (codes[splits[0]:splits[1]] == codes[splits[1]:splits[2]]).all()
    s0 = set(codes[splits[0]:splits[1]].tolist())
    s2 = set(codes[splits[2]:splits[3]].tolist())
    assert not (s0 & s2)  # word order matters


def test_string_hash_u64_deterministic_and_distinct():
    from rel_ray.functions.shingles import string_hash_u64

    a = string_hash_u64(pa.array(["abc", "abd", "abc", "", "ab"]))
    b = string_hash_u64(pa.array(["abc", "abd", "abc", "", "ab"]))
    assert (a == b).all()
    assert a[0] == a[2] and a[0] != a[1] and a[4] != a[0]


def test_protocols_structural():
    from rel_ray.config import DEFAULT_CONFIG
    from rel_ray.protocols import Blocker, MentionDetector, PairScorer
    from rel_ray.stages.blocking import BlockKeys
    from rel_ray.stages.normalize import MentionTurns
    from rel_ray.stages.scoring import PairScorer as ScorerImpl

    assert isinstance(BlockKeys(DEFAULT_CONFIG), Blocker)
    assert isinstance(ScorerImpl(DEFAULT_CONFIG), PairScorer)
    assert isinstance(MentionTurns(DEFAULT_CONFIG), MentionDetector)


def test_sigmoid_softmax():
    from rel_ray.functions.strsim import sigmoid, softmax

    assert sigmoid(0.0) == pytest.approx(0.5)
    s = softmax(np.array([[1.0, 2.0, 3.0]]))
    assert s.sum() == pytest.approx(1.0)
    assert s[0, 2] > s[0, 1] > s[0, 0]


def test_extract_all_matches_known_answers():
    from rel_ray.functions.normalize import MENTION_PATTERN, extract_all_matches

    got = extract_all_matches(
        pa.array(["ask Marva Hollen and Tobias Quent now",
                  "no caps here", "", "Solo", "A B and C", None]),
        MENTION_PATTERN).to_pylist()
    assert got == [["Marva Hollen", "Tobias Quent"], [], [], ["Solo"],
                   ["A B", "C"], []]
    # generic pattern: lowercase token runs
    toks = extract_all_matches(pa.array(["aaa bbbb cc ddddd"]),
                               r"[a-z]{4,}").to_pylist()
    assert toks == [["bbbb", "ddddd"]]


def test_pairwise_jaccard_matches_per_pair_reference():
    """The whole-batch lexsort Jaccard == the per-pair sorted-set reference."""
    from rel_ray.config import DEFAULT_CONFIG
    from rel_ray.stages.scoring import encode_pair_strings, pairwise_jaccard

    mn_a = pa.array(["marvok teldrin", "marvok teldrin", "abc", "", "x y z"])
    mn_b = pa.array(["marvok teldrin", "marvok tedlrin", "zzz", "abc", "x y"])
    idx_a, idx_b, ucodes, usplits = encode_pair_strings(mn_a, mn_b, DEFAULT_CONFIG)
    got = pairwise_jaccard(idx_a, idx_b, ucodes, usplits)
    for i in range(len(mn_a)):
        ca, sa = char_ngram_codes(mn_a.slice(i, 1), DEFAULT_CONFIG.shingle_k)
        cb, sb = char_ngram_codes(mn_b.slice(i, 1), DEFAULT_CONFIG.shingle_k)
        ua = unique_shingle_sets(ca, sa)
        ub = unique_shingle_sets(cb, sb)
        ref = exact_jaccard_sorted(
            np.asarray(ua.values, dtype=np.uint64),
            np.asarray(ub.values, dtype=np.uint64))
        assert got[i] == pytest.approx(ref, abs=1e-7)


def test_string_digest128_lanes_independent_and_null_distinct():
    import numpy as np
    import pyarrow as pa

    from rel_ray.functions.shingles import (string_digest128_hex,
                                            string_hash_u128)

    strs = ["", "a", "b", "ab", "ba", "abc", "abc ", " abc", "a" * 500,
            "a" * 499 + "b", "Zoë 🎉", "Zoe"]
    h1, h2 = string_hash_u128(pa.array(strs))
    # lanes differ (h2 is not a function applied to h1's collisions) and
    # all digests of distinct strings are distinct
    assert len(set(zip(h1.tolist(), h2.tolist()))) == len(strs)
    assert not np.array_equal(h1, h2)

    dig = string_digest128_hex(pa.array(["x", None, "", "x"]))
    vals = dig.to_pylist()
    assert vals[0] == vals[3] and len(vals[0]) == 32
    assert vals[1] == "null" and vals[2] != "null" and vals[2] != vals[0]

    # determinism across calls and across chunking layouts
    chunked = pa.chunked_array([pa.array(strs[:5]), pa.array(strs[5:])])
    again = string_digest128_hex(chunked.combine_chunks()).to_pylist()
    assert again == string_digest128_hex(pa.array(strs)).to_pylist()


class TestHashStrIndex:
    def test_roundtrip_and_default(self):
        import numpy as np
        from rel_ray.functions.rayutil import (build_hash_str_index,
                                               hash_str_index_lookup)
        keys = pa.array([f"mention {i}" for i in range(1000)])
        codes = pa.array(np.arange(1000, dtype=np.int64) * 7)
        idx = build_hash_str_index(keys, codes)
        assert idx is not None
        col = pa.array(["mention 3", "NOT PRESENT", "mention 999",
                        "mention 3"])
        out = hash_str_index_lookup(col, idx, default=-1)
        assert out.tolist() == [21, -1, 6993, 21]

    def test_duplicate_keys_refused(self):
        import numpy as np
        from rel_ray.functions.rayutil import build_hash_str_index
        keys = pa.array(["a", "b", "a"])
        assert build_hash_str_index(keys, pa.array([0, 1, 2])) is None

    def test_empty(self):
        import numpy as np
        from rel_ray.functions.rayutil import (build_hash_str_index,
                                               hash_str_index_lookup)
        idx = build_hash_str_index(pa.array([], type=pa.string()),
                                   pa.array([], type=pa.int64()))
        assert idx is not None
        out = hash_str_index_lookup(pa.array(["x"]), idx, default=-9)
        assert out.tolist() == [-9]
        assert hash_str_index_lookup(pa.array([], type=pa.string()),
                                     idx).tolist() == []


class TestSortedStrIndex:
    def test_lookup_matches_dict(self):
        import numpy as np
        from rel_ray.functions.rayutil import (get_broadcast_str_index,
                                               str_index_lookup)
        tab = pa.table({"k": pa.array(["zz", "aa", "mm"]),
                        "code": pa.array([2, 0, 1], type=pa.int64())})
        idx = get_broadcast_str_index(tab, "k", "code")
        out = str_index_lookup(pa.array(["mm", "aa", "nope", "zz"]), idx,
                               default=-1)
        assert out.tolist() == [1, 0, -1, 2]
