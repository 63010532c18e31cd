"""String-similarity self-joins (stages/strjoin.py) and the exact
cosine-threshold pair join (stages/similarity.py::cosine_pairs_exact):
engine output vs naive local references."""

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds) -> pa.Table:
    tabs = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs, promote_options="default")


def _naive_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


NAMES = ["red bolt", "red bott", "red bolts", "blue bolt", "hot gear",
         "hot gears", "red bolt", "hot gear", "rad bolt", "x"]


def test_levenshtein_self_join_matches_naive(ray_session):
    import ray

    ids = list(range(10, 10 + len(NAMES)))
    ds = ray.data.from_arrow(pa.table({"rid": pa.array(ids, type=pa.int64()),
                                       "name": pa.array(NAMES)}))
    from rel_ray.stages.strjoin import string_sim_self_join

    out = _collect(string_sim_self_join(
        ds, id_col="rid", text_col="name", metric="levenshtein",
        threshold=2, score_col="dist", num_buckets=4))
    got = {(a, b): d for a, b, d in zip(out.column("id_a").to_pylist(),
                                        out.column("id_b").to_pylist(),
                                        out.column("dist").to_pylist())}
    want = {}
    for i in range(len(NAMES)):
        for j in range(i + 1, len(NAMES)):
            d = _naive_lev(NAMES[i], NAMES[j])
            if d <= 2:
                want[(ids[i], ids[j])] = d
    assert got == want
    # sanity: same-form pairs present with dist 0, near pairs with 1/2
    assert want[(10, 16)] == 0  # the two "red bolt" records
    assert want[(10, 11)] == 1  # red bolt / red bott


def test_jw_self_join_blocked(ray_session):
    import duckdb
    import ray

    ids = list(range(len(NAMES)))
    ds = ray.data.from_arrow(pa.table({"rid": pa.array(ids, type=pa.int64()),
                                       "name": pa.array(NAMES)}))
    from rel_ray.stages.strjoin import string_sim_self_join

    out = _collect(string_sim_self_join(
        ds, id_col="rid", text_col="name", metric="jaro_winkler",
        threshold=0.9, score_col="jw", num_buckets=4))
    got = {(a, b): s for a, b, s in zip(out.column("id_a").to_pylist(),
                                        out.column("id_b").to_pylist(),
                                        out.column("jw").to_pylist())}
    con = duckdb.connect()
    want = {}
    for i in range(len(NAMES)):
        for j in range(i + 1, len(NAMES)):
            if NAMES[i][:1] != NAMES[j][:1]:
                continue  # declared first-char blocking
            s = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                            [NAMES[i], NAMES[j]]).fetchone()[0]
            if s >= 0.9:
                want[(ids[i], ids[j])] = s
    assert got == want


def test_distinct_strings_cap(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table(
        {"name": pa.array([f"n{i}" for i in range(64)])}))
    from rel_ray.stages.strjoin import distinct_strings

    with pytest.raises(ValueError, match="max_vocab"):
        distinct_strings(ds, "name", max_vocab=10)
    v = distinct_strings(ds, "name", max_vocab=64)
    assert v.num_rows == 64


def test_cosine_pairs_exact_matches_bruteforce(ray_session):
    import ray

    rng = np.random.default_rng(7)
    n, dim = 120, 16
    base = rng.standard_normal((n, dim)).astype(np.float32)
    # plant near-duplicate pairs
    base[50] = base[10] + 0.01 * rng.standard_normal(dim).astype(np.float32)
    base[51] = base[11]
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(base.reshape(-1)), dim),
    })
    ds = ray.data.from_arrow(tab)
    from rel_ray.stages.similarity import cosine_pairs_exact

    tp = 9000
    out = _collect(cosine_pairs_exact(ds, threshold_permyriad=tp, scale=20,
                                      batch_size=32))
    got = set(zip(out.column("id_a").to_pylist(),
                  out.column("id_b").to_pylist()))
    # naive reference over the SAME quantization
    q = np.floor(base.astype(np.float64) * 20.0 + 0.5)
    norms = np.einsum("ij,ij->i", q, q)
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            dot = float(q[i] @ q[j])
            if dot > 0 and (10000.0 * dot) * (10000.0 * dot) >= \
                    (float(tp * tp) * norms[i]) * norms[j]:
                want.add((i, j))
    assert got == want
    assert (10, 50) in got and (11, 51) in got


def test_cosine_pairs_exact_scale_guard(ray_session):
    import ray

    tab = pa.table({
        "vec_id": pa.array([0, 1], type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(np.array([300.0, 0.0, 0.0, 300.0], dtype=np.float32)), 2),
    })
    ds = ray.data.from_arrow(tab)
    from rel_ray.stages.similarity import cosine_pairs_exact

    with pytest.raises(Exception, match="quantized component"):
        _collect(cosine_pairs_exact(ds, scale=100))


def test_interval_overlap_self(ray_session):
    import ray

    # key 1: [0,10],[5,15],[10,20],[30,40] — inclusive-end semantics:
    # (a,b), (b,c) overlap; (a,c) touch at 10 (inclusive => pair); d alone.
    # key 2: same times, isolated from key 1.
    tab = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
        "rid": pa.array([4, 3, 2, 1, 9, 8], type=pa.int64()),
        "s": pa.array([0, 5, 10, 30, 0, 100], type=pa.int64()),
        "e": pa.array([10, 15, 20, 40, 50, 120], type=pa.int64()),
    })
    ds = ray.data.from_arrow(tab)
    from rel_ray.stages.temporal import interval_overlap_self

    out = _collect(interval_overlap_self(
        ds, key="k", id_col="rid", start="s", end="e", num_buckets=4))
    got = set(zip(out.column("k").to_pylist(),
                  out.column("id_a").to_pylist(),
                  out.column("id_b").to_pylist()))
    assert got == {(1, 3, 4), (1, 2, 3), (1, 2, 4)}


def test_interval_overlap_cap_counts_drops(ray_session):
    import ray

    n = 20
    tab = pa.table({
        "k": pa.array([1] * n, type=pa.int64()),
        "rid": pa.array(list(range(n)), type=pa.int64()),
        "s": pa.array([0] * n, type=pa.int64()),
        "e": pa.array([100] * n, type=pa.int64()),
    })
    ds = ray.data.from_arrow(tab)
    from rel_ray.stages.temporal import interval_overlap_self

    out = _collect(interval_overlap_self(
        ds, key="k", id_col="rid", start="s", end="e", num_buckets=2,
        max_matches=3))
    # every row keeps at most 3 forward matches; full join would be C(20,2)
    assert out.num_rows == sum(min(3, n - 1 - i) for i in range(n))


def test_string_sim_join_empty_input(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "rid": pa.array([], type=pa.int64()),
        "name": pa.array([], type=pa.string())}))
    from rel_ray.stages.strjoin import string_sim_self_join

    out = _collect(string_sim_self_join(
        ds, id_col="rid", text_col="name", metric="levenshtein",
        threshold=2, score_col="dist", num_buckets=2))
    assert out.num_rows == 0
