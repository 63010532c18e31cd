"""Property-based kernel tests (hypothesis) — no Ray needed.

Each vectorized kernel is checked against a naive per-row reference
implementation or an algebraic invariant on arbitrary unicode inputs.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rel_ray.functions.hashing import splitmix64
from rel_ray.functions.normalize import normalize_strings
from rel_ray.functions.shingles import (
    band_keys,
    char_ngram_codes,
    exact_jaccard_sorted,
    minhash_signatures,
    string_hash_u64,
    unique_shingle_sets,
)
from rel_ray.functions.strsim import jaro_winkler

texts = st.lists(st.text(max_size=40), min_size=1, max_size=20)


def _naive_char_ngrams(s: str, k: int) -> list[int]:
    """Byte-level k-gram packing reference (matches the kernel's contract)."""
    b = s.encode("utf-8")
    if len(b) == 0:
        return []
    grams = [b[i : i + k] for i in range(len(b) - k + 1)] if len(b) >= k else [b]
    out = []
    for g in grams:
        v = np.uint64(0)
        with np.errstate(over="ignore"):
            for byte in g:
                v = (v << np.uint64(8)) | np.uint64(byte)
        out.append(int(splitmix64(v)[()]))
    return out


@settings(max_examples=60, deadline=None)
@given(texts, st.integers(min_value=2, max_value=5))
def test_char_ngram_codes_matches_naive(rows, k):
    arr = pa.array(rows, type=pa.string())
    codes, splits = char_ngram_codes(arr, k=k)
    for i, s in enumerate(rows):
        got = codes[splits[i] : splits[i + 1]].tolist()
        assert got == _naive_char_ngrams(s, k), (s, k)


@settings(max_examples=50, deadline=None)
@given(texts)
def test_minhash_equal_text_equal_signature(rows):
    # duplicate every row; signatures must agree pairwise and be permutation
    # independent of shingle order (min over a set)
    arr = pa.array(rows + rows, type=pa.string())
    codes, splits = char_ngram_codes(arr, k=3)
    sig = minhash_signatures(codes, splits, num_perm=16, seed=11)
    n = len(rows)
    assert np.array_equal(sig[:n], sig[n:])
    # empty rows are all-sentinel; non-empty are not
    for i, s in enumerate(rows):
        if not s.encode("utf-8"):
            assert (sig[i] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()


@settings(max_examples=50, deadline=None)
@given(texts)
def test_band_keys_equal_sig_equal_keys(rows):
    arr = pa.array(rows + rows, type=pa.string())
    codes, splits = char_ngram_codes(arr, k=3)
    sig = minhash_signatures(codes, splits, num_perm=12, seed=3)
    keys = band_keys(sig, bands=4, rows=3, seed=5)
    n = len(rows)
    assert np.array_equal(keys[:n], keys[n:])
    for i, s in enumerate(rows):
        if not s.encode("utf-8"):
            assert (keys[i] == 0).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=30),
                         max_size=15), min_size=1, max_size=8))
def test_unique_shingle_sets_matches_np_unique(rowsets):
    codes = np.array([c for row in rowsets for c in row], dtype=np.uint64)
    splits = np.cumsum([0] + [len(r) for r in rowsets]).astype(np.int64)
    uniq = unique_shingle_sets(codes, splits)
    assert len(uniq) == len(rowsets)
    for i, row in enumerate(rowsets):
        expect = np.unique(np.array(row, dtype=np.uint64)).tolist()
        assert uniq[i].as_py() == expect


@settings(max_examples=60, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=100), max_size=20),
       st.sets(st.integers(min_value=0, max_value=100), max_size=20))
def test_exact_jaccard_sorted_matches_set_math(a, b):
    ja = exact_jaccard_sorted(np.array(sorted(a), dtype=np.uint64),
                              np.array(sorted(b), dtype=np.uint64))
    if not a and not b:
        expect = 0.0  # kernel convention: empty shingle sets never match
    else:
        expect = len(a & b) / len(a | b)
    assert abs(ja - expect) < 1e-9


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=20), st.text(max_size=20))
def test_jaro_winkler_properties(s1, s2):
    v = jaro_winkler(s1, s2)
    assert 0.0 <= v <= 1.0
    assert abs(jaro_winkler(s2, s1) - v) < 1e-12  # symmetric
    if s1:
        assert jaro_winkler(s1, s1) == 1.0


@settings(max_examples=50, deadline=None)
@given(texts)
def test_normalize_strings_idempotent(rows):
    arr = pa.array(rows, type=pa.string())
    once = normalize_strings(arr)
    twice = normalize_strings(once)
    assert once.to_pylist() == twice.to_pylist()


@settings(max_examples=50, deadline=None)
@given(texts)
def test_string_hash_consistent_with_equality(rows):
    arr = pa.array(rows, type=pa.string())
    h = string_hash_u64(arr)
    byval = {}
    for i, s in enumerate(rows):
        if s in byval:
            assert h[i] == h[byval[s]]
        else:
            byval[s] = i


def _naive_winnow(s: str, k: int, window: int) -> list[int]:
    """Textbook Schleimer et al. winnowing, one string at a time."""
    codes = _naive_char_ngrams(s, k)
    if not codes:
        return []
    if len(codes) <= window:
        mins = [min(codes)]
    else:
        mins = [min(codes[i : i + window])
                for i in range(len(codes) - window + 1)]
    u64 = np.array(sorted(set(mins)), dtype=np.uint64)
    return u64.view(np.int64).tolist()


@settings(max_examples=60, deadline=None)
@given(texts, st.integers(min_value=2, max_value=6),
       st.integers(min_value=2, max_value=6))
def test_fingerprint_winnow_matches_naive(rows, k, window):
    from rel_ray.stages.textstats import fingerprint_winnow

    arr = pa.array(rows, type=pa.string())
    fp = fingerprint_winnow(arr, k=k, window=window)
    for i, s in enumerate(rows):
        assert fp[i].as_py() == _naive_winnow(s, k, window), (s, k, window)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "c", "dd", "e e", ""]),
                min_size=1, max_size=30))
def test_dict_lookup_matches_python_dict(rows):
    from rel_ray.functions.rayutil import dict_lookup

    mapping = {"a": "1", "b": "2", "dd": "3", "e e": "4"}
    col = pa.array(rows, type=pa.string())
    # default_to_key: missing keys map to themselves
    got = dict_lookup(col, mapping, default_to_key=True).to_pylist()
    assert got == [mapping.get(r, r) for r in rows]
    # explicit default
    got = dict_lookup(col, mapping, default="x").to_pylist()
    assert got == [mapping.get(r, "x") for r in rows]
    # strict mode raises on any missing key
    if any(r not in mapping for r in rows):
        import pytest as _pytest
        with _pytest.raises(KeyError):
            dict_lookup(col, mapping)


_JKEY = st.sampled_from(["k", "key2", "x", "a_b"])
_JVAL = st.one_of(
    st.integers(-10**9, 10**9),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(alphabet=st.characters(
        blacklist_characters='"\\', blacklist_categories=("Cs", "Cc")),
        max_size=12))


@settings(max_examples=80, deadline=None)
@given(st.lists(st.dictionaries(_JKEY, _JVAL, max_size=4), min_size=1,
                max_size=20), _JKEY)
def test_json_scalar_field_matches_json_loads(objs, field):
    import json

    from rel_ray.stages.cleaning import json_scalar_field

    col = pa.array([json.dumps(o, ensure_ascii=False) for o in objs],
                   type=pa.string())
    got = json_scalar_field(col, field).to_pylist()
    for g, o in zip(got, objs):
        if field not in o:
            assert g is None
        else:
            v = o[field]
            if isinstance(v, str):
                assert g == v
            elif isinstance(v, bool):
                assert g == ("true" if v else "false")
            else:
                # numeric: text round-trips through the same json repr
                assert g == json.dumps(v)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="ab c", max_size=8), min_size=1,
                max_size=15))
def test_byte_pairs_matches_naive(rows):
    from rel_ray.stages.textstats import _byte_pairs

    col = pa.array(rows, type=pa.string())
    codes, row_of = _byte_pairs(col)
    want = []
    for i, s in enumerate(rows):
        b = s.encode()
        want += [((b[j] << 8) | b[j + 1], i) for j in range(len(b) - 1)]
    assert sorted(zip(codes.tolist(), row_of.tolist())) == sorted(want)
