"""Sorted-neighborhood blocking, phonetic keys, weighted sampling
(round-3 operator additions)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd

from rel_ray.functions.phonetic import soundex_codes, soundex_one
from rel_ray.stages.neighborhood import (global_rank, prefix_u64,
                                         sorted_neighborhood_pairs)
from rel_ray.stages.sampling import _KNUTH, _MOD, weighted_bottomk


# ---------------------------------------------------------------------------
# prefix_u64
# ---------------------------------------------------------------------------

@given(st.lists(st.text(min_size=0, max_size=20), min_size=0, max_size=50))
@settings(max_examples=80, deadline=None)
def test_prefix_u64_monotone(strings):
    """The proxy must be monotone (non-strict) in byte-lexicographic order."""
    ordered = sorted(strings, key=lambda s: s.encode())
    p = prefix_u64(pa.array(ordered, type=pa.string()))
    assert (np.diff(p.astype(np.float64)) >= 0).all() if len(p) > 1 else True


def test_prefix_u64_slice_offset_and_empty():
    base = pa.array(["zzz", "abc", "", "q" * 30])
    sliced = base.slice(1, 3)
    np.testing.assert_array_equal(prefix_u64(sliced),
                                  prefix_u64(pa.array(["abc", "", "q" * 30])))
    assert prefix_u64(pa.array([], type=pa.string())).shape == (0,)
    # all-empty strings: data buffer may be absent
    assert (prefix_u64(pa.array(["", ""])) == 0).all()


# ---------------------------------------------------------------------------
# global rank + SNM pairs vs a naive reference
# ---------------------------------------------------------------------------

def _naive_snm(ids, keys, window):
    order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
    pairs = set()
    for pos_a in range(len(order)):
        for pos_b in range(pos_a + 1, min(pos_a + window, len(order))):
            pairs.add((ids[order[pos_a]], ids[order[pos_b]]))
    return pairs


@pytest.mark.usefixtures("ray_session")
def test_global_rank_matches_argsort():
    rng = np.random.default_rng(7)
    n = 500
    ids = rng.permutation(n).astype(np.int64)
    keys = ["k%03d" % v for v in rng.integers(0, 60, n)]  # heavy key ties
    ds = rd.from_arrow(pa.table({"id": ids, "key": keys})).repartition(7)
    out = pa.concat_tables(
        pa.table(b) for b in global_rank(ds, key_col="key", id_col="id",
                                         num_buckets=5)
        .iter_batches(batch_format="pyarrow"))
    got = dict(zip(out.column("id").to_pylist(), out.column("rk").to_pylist()))
    order = sorted(range(n), key=lambda i: (keys[i], ids[i]))
    for rk, i in enumerate(order):
        assert got[int(ids[i])] == rk


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("window,chunk", [(2, 16), (5, 16), (8, 512)])
def test_snm_pairs_match_naive(window, chunk):
    rng = np.random.default_rng(11)
    n = 300
    ids = rng.permutation(10_000)[:n].astype(np.int64)
    keys = ["p%02d" % v for v in rng.integers(0, 40, n)]
    ds = rd.from_arrow(pa.table({"id": ids, "key": keys})).repartition(5)
    out = pa.concat_tables(
        pa.table(b) for b in sorted_neighborhood_pairs(
            ds, id_col="id", key_col="key", window=window,
            num_buckets=4, chunk=chunk).iter_batches(batch_format="pyarrow"))
    got = set(zip(out.column("id_a").to_pylist(),
                  out.column("id_b").to_pylist()))
    want = _naive_snm(ids.tolist(), keys, window)
    assert got == want
    assert len(got) == out.num_rows  # no duplicate emission across chunks


# ---------------------------------------------------------------------------
# soundex
# ---------------------------------------------------------------------------

def test_soundex_canonical_cases():
    # the canonical published examples (NARA soundex spec)
    for name, code in [("Robert", "R163"), ("Rupert", "R163"),
                       ("Ashcraft", "A261"), ("Ashcroft", "A261"),
                       ("Tymczak", "T522"), ("Pfister", "P236"),
                       ("Honeyman", "H555"), ("Washington", "W252"),
                       ("Lee", "L000"), ("Gutierrez", "G362"),
                       ("Jackson", "J250"), ("", ""), ("123", ""),
                       ("  van Dyk", "V500")]:  # first alpha token only
        assert soundex_one(name) == code, name


@given(st.lists(st.text(max_size=24), min_size=0, max_size=40))
@settings(max_examples=60, deadline=None)
def test_soundex_codes_matches_scalar(strings):
    got = soundex_codes(pa.array(strings, type=pa.string())).to_pylist()
    assert got == [soundex_one(s) for s in strings]


def test_soundex_codes_nulls():
    got = soundex_codes(pa.array(["Robert", None, "x"])).to_pylist()
    assert got == ["R163", "", "X000"]


def test_soundex_sql_matches_kernel():
    """The generated DuckDB translate/replace chain must agree with the
    Python kernel on every token shape (the oracle-parity contract)."""
    import duckdb

    from rel_ray.functions.phonetic import soundex_sql

    vals = ["Robert", "Ashcraft", "Tymczak", "Pfister", "Honeyman", "Hollen",
            "Wwwww", "Aeiou", "hhhh", "", "42", "  spaced out", "x" * 30,
            "McDonald", "O'Brien", "van-der-Berg", "BBBBBBBBBBBBBBBBBB"]
    con = duckdb.connect()
    con.register("t", pa.table({"s": pa.array(vals, type=pa.string())}))
    sql = f"SELECT {soundex_sql('s')} AS c FROM t"
    got = [r[0] for r in con.execute(sql).fetchall()]
    assert got == [soundex_one(v) for v in vals]


# ---------------------------------------------------------------------------
# weighted bottom-k sampling
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_weighted_bottomk_matches_naive():
    rng = np.random.default_rng(3)
    n, k = 400, 25
    ids = rng.permutation(100_000)[:n].astype(np.int64)
    w = rng.integers(1, 500, n).astype(np.int64)
    u = ((ids % _MOD) * _KNUTH % _MOD + 0.5) / float(_MOD)
    key = -np.log(u) / w
    want = set(ids[np.lexsort((ids, key))][:k].tolist())
    ds = rd.from_arrow(pa.table({"id": ids, "w": w})).repartition(6)
    out = weighted_bottomk(ds, id_col="id", weight_col="w", k=k,
                           carry_cols=["w"])
    assert set(out.column("id").to_pylist()) == want
    assert out.column_names == ["id", "w"]


@pytest.mark.usefixtures("ray_session")
def test_weighted_bottomk_rejects_nonpositive():
    ds = rd.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64()),
                                 "w": pa.array([1, 0], pa.int64())}))
    with pytest.raises(Exception):
        weighted_bottomk(ds, id_col="id", weight_col="w", k=1)
