"""exact_kth (stages/selection.py): histogram-refinement selection vs
numpy sort, including multi-round ranges and negative values."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(vals):
    import ray

    return ray.data.from_arrow(
        pa.table({"v": pa.array(np.asarray(vals, dtype=np.int64))})
    ).repartition(4)


def test_exact_kth_matches_sort(ray_session):
    from rel_ray.stages.selection import exact_kth

    rng = np.random.default_rng(3)
    vals = rng.integers(-10**6, 10**6, size=5000)
    vals[100:200] = 777  # duplicates
    ds = _ds(vals)
    s = np.sort(vals)
    # force multiple refinement rounds with a tiny exact_span
    for k in (1, 2, 2500, 2501, 4999, 5000):
        assert exact_kth(ds, "v", k, exact_span=64) == s[k - 1]


def test_exact_kth_huge_range(ray_session):
    from rel_ray.stages.selection import exact_kth

    vals = np.array([-(2**62), -5, 0, 3, 2**62, 2**62 - 1, 7, 7],
                    dtype=np.int64)
    ds = _ds(vals)
    s = np.sort(vals)
    for k in range(1, len(vals) + 1):
        assert exact_kth(ds, "v", k, exact_span=4) == s[k - 1]


def test_exact_kth_out_of_range(ray_session):
    from rel_ray.stages.selection import exact_kth

    ds = _ds([1, 2, 3])
    with pytest.raises(ValueError):
        exact_kth(ds, "v", 4)


class TestMixtureRates:
    def test_binding_source_kept_whole(self):
        from rel_ray.stages.sampling import mixture_rates
        # src b is binding (small count, big weight): kept at 10000
        r = mixture_rates({"a": 1000, "b": 10}, {"a": 1, "b": 1})
        assert r["b"] == 10000
        assert r["a"] == 100  # 10/1000 of a to match 1:1

    def test_proportions_follow_weights(self):
        from rel_ray.stages.sampling import mixture_rates
        r = mixture_rates({"a": 1000, "b": 1000}, {"a": 1, "b": 3})
        # expected kept: a ~ 1000*r_a/10000, b ~ 1000*r_b/10000 in 1:3
        # floor composition: C = 1000*10000//3 = 3333333; b -> 9999 (one
        # permyriad under whole), a -> 3333 — exactly the SQL twin's floors
        assert r["b"] == 9999 and r["a"] == 3333

    def test_missing_weighted_source_empties(self):
        from rel_ray.stages.sampling import mixture_rates
        assert mixture_rates({"a": 100}, {"a": 1, "ghost": 1}) == {"a": 0}

    def test_unweighted_source_dropped(self):
        from rel_ray.stages.sampling import mixture_rates
        r = mixture_rates({"a": 100, "junk": 500}, {"a": 1})
        assert "junk" not in r


def test_percentile_rank_matches_naive(ray_session):
    """percentile_rank == (#rows with smaller value)/(n-1), ties sharing the
    group-min rank (ANSI PERCENT_RANK), incl. duplicates and a cap error."""
    import ray.data as rd

    from rel_ray.stages.selection import percentile_rank

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 50, 400)
    t = pa.table({"doc_id": pa.array(range(400), type=pa.int64()),
                  "n_chars": pa.array(vals, type=pa.int64())})
    out = percentile_rank(rd.from_arrow(t), value_col="n_chars",
                          keep_cols=["doc_id"])
    got = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        bt = pa.table(b)
        got.update(zip(bt.column("doc_id").to_pylist(),
                       bt.column("pct_rank").to_pylist()))
    order = np.sort(vals)
    for i, v in enumerate(vals):
        expected = np.searchsorted(order, v, side="left") / (400 - 1)
        assert got[i] == expected, (i, v, got[i], expected)

    with pytest.raises(ValueError, match="distinct values exceed"):
        percentile_rank(rd.from_arrow(t), value_col="n_chars",
                        max_distinct=3)


def test_grouped_median_matches_naive(ray_session):
    import ray.data as rd

    from rel_ray.stages.selection import grouped_median

    rng = np.random.default_rng(11)
    g = rng.integers(0, 17, 600)
    v = rng.normal(0, 100, 600)
    v[rng.random(600) < 0.05] = np.nan  # nulls must be ignored
    t = pa.table({"g": pa.array(g, type=pa.int64()),
                  "v": pa.array([None if np.isnan(x) else float(x)
                                 for x in v], type=pa.float64())})
    out = grouped_median(rd.from_arrow(t).repartition(5),
                         group_col="g", val_col="v", out_col="med",
                         num_buckets=8)
    got = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        bt = pa.table(b)
        got.update(zip(bt.column("g").to_pylist(),
                       bt.column("med").to_pylist()))
    for grp in np.unique(g):
        vals = np.sort(v[(g == grp) & ~np.isnan(v)])
        n = len(vals)
        if n == 0:
            assert grp not in got
            continue
        exp = (vals[(n - 1) // 2] + vals[n // 2]) / 2.0
        assert got[grp] == exp, (grp, got[grp], exp)


def test_grouped_median_single_and_empty(ray_session):
    import ray.data as rd

    from rel_ray.stages.selection import grouped_median

    t = pa.table({"g": pa.array([1, 2, 2], type=pa.int64()),
                  "v": pa.array([5.0, 1.0, 2.0], type=pa.float64())})
    out = grouped_median(rd.from_arrow(t), group_col="g", val_col="v")
    rows = {r["g"]: r["median_val"] for b in
            out.iter_batches(batch_format="pyarrow")
            for r in pa.table(b).to_pylist()}
    assert rows == {1: 5.0, 2: 1.5}

    empty = pa.table({"g": pa.array([], type=pa.int64()),
                      "v": pa.array([], type=pa.float64())})
    out0 = grouped_median(rd.from_arrow(empty), group_col="g", val_col="v")
    total = sum(pa.table(b).num_rows
                for b in out0.iter_batches(batch_format="pyarrow"))
    assert total == 0


def test_quantile_bucketize_matches_naive(ray_session):
    import ray.data as rd

    from rel_ray.stages.selection import quantile_bucketize

    rng = np.random.default_rng(21)
    vals = rng.integers(0, 40, 500)   # heavy ties
    t = pa.table({"doc_id": pa.array(range(500), type=pa.int64()),
                  "n_chars": pa.array(vals, type=pa.int64())})
    out = quantile_bucketize(rd.from_arrow(t).repartition(4),
                             value_col="n_chars", n_buckets=10,
                             keep_cols=["doc_id"])
    got = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        bt = pa.table(b)
        got.update(zip(bt.column("doc_id").to_pylist(),
                       bt.column("bucket").to_pylist()))
    order = np.sort(vals)
    for i, v in enumerate(vals):
        pct = np.searchsorted(order, v, side="left") / (500 - 1)
        exp = min(int(np.floor(pct * 10)), 9)
        assert got[i] == exp, (i, v, got[i], exp)
    # tied values always share a bucket; every bucket 0..9 non-empty here
    bucket_of = {}
    for i, v in enumerate(vals):
        bucket_of.setdefault(v, set()).add(got[i])
    assert all(len(s) == 1 for s in bucket_of.values())
    assert set(got.values()) == set(range(10))


class TestMadOutliers:
    @staticmethod
    def _naive(rows, k=3):
        """rows: (g, i, x). Hampel flag via exact fractions (2x/4x scale)."""
        from collections import defaultdict
        import statistics
        by_g = defaultdict(list)
        for g, _, x in rows:
            by_g[g].append(x)
        med2 = {g: int(2 * statistics.median(v)) for g, v in by_g.items()}
        d2_by_g = defaultdict(list)
        for g, _, x in rows:
            d2_by_g[g].append(abs(2 * x - med2[g]))
        mad4 = {g: int(2 * statistics.median(v))
                for g, v in d2_by_g.items()}
        return sorted((g, i, x) for g, i, x in rows
                      if 2 * abs(2 * x - med2[g]) > k * mad4[g])

    def _run(self, rows, **kw):
        import ray.data as rd

        from rel_ray.stages.selection import grouped_mad_outliers
        t = pa.table({"g": pa.array([r[0] for r in rows]),
                      "i": pa.array([r[1] for r in rows], type=pa.int64()),
                      "x": pa.array([r[2] for r in rows], type=pa.int64())})
        out = grouped_mad_outliers(rd.from_arrow(t), group_col="g",
                                   val_col="x", keep_cols=["i"],
                                   num_buckets=4, **kw)
        return sorted((r.g, int(r.i), int(r.x))
                      for r in out.to_pandas().itertuples())

    def test_matches_naive_random(self, ray_session):
        rng = np.random.RandomState(3)
        rows = [(f"g{int(rng.randint(3))}", i, int(v))
                for i, v in enumerate(rng.randint(-50, 2000, size=400))]
        # plant gross outliers
        rows += [("g0", 1000, 10**9), ("g1", 1001, -10**9)]
        got = self._run(rows)
        assert got == self._naive(rows)
        assert ("g0", 1000, 10**9) in got and ("g1", 1001, -10**9) in got

    def test_even_odd_groups_and_zero_mad(self, ray_session):
        # g_even: 4 values (median averages middles); g_const: MAD=0 so
        # ANY deviation flags; g_odd: exact middle
        rows = [("e", 0, 1), ("e", 1, 2), ("e", 2, 3), ("e", 3, 1000),
                ("c", 4, 7), ("c", 5, 7), ("c", 6, 7), ("c", 7, 8),
                ("o", 8, 1), ("o", 9, 5), ("o", 10, 9)]
        assert self._run(rows) == self._naive(rows)

    def test_cogroup_fallback_matches_broadcast(self, ray_session):
        rng = np.random.RandomState(11)
        rows = [(f"g{int(rng.randint(5))}", i, int(v))
                for i, v in enumerate(rng.randint(0, 300, size=300))]
        rows += [("g2", 900, 10**7)]
        assert (self._run(rows, broadcast_max_rows=0)
                == self._run(rows) == self._naive(rows))


class TestSpearman:
    def test_matches_scipy_free_reference(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from rel_ray.stages.selection import spearman
        rng = np.random.RandomState(31)
        x = rng.randint(0, 20, size=500)
        y = (x * 3 + rng.randint(0, 30, size=500)).astype(np.int64)

        def avg_ranks(v):
            order = np.argsort(v, kind="stable")
            r = np.empty(len(v), dtype=np.float64)
            sv = v[order]
            i = 0
            while i < len(sv):
                j = i
                while j < len(sv) and sv[j] == sv[i]:
                    j += 1
                r[order[i:j]] = (i + j + 1) / 2.0
                i = j
            return r

        rx, ry = avg_ranks(x), avg_ranks(y)
        expected = np.corrcoef(rx, ry)[0, 1]
        t = spearman(rd.from_arrow(pa.table({
            "x": pa.array(x, type=pa.int64()),
            "y": pa.array(y, type=pa.int64())})), x_col="x", y_col="y")
        assert abs(t.column("spearman")[0].as_py() - expected) < 1e-12

    def test_perfect_monotone_is_one(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from rel_ray.stages.selection import spearman
        t = spearman(rd.from_arrow(pa.table({
            "x": pa.array([1, 2, 3, 4], type=pa.int64()),
            "y": pa.array([10, 20, 40, 80], type=pa.int64())})),
            x_col="x", y_col="y")
        assert abs(t.column("spearman")[0].as_py() - 1.0) < 1e-12


class TestBlb:
    def test_ci_brackets_true_mean_and_deterministic(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from rel_ray.stages.selection import blb_mean_ci
        rng = np.random.RandomState(5)
        vals = rng.randint(0, 1000, size=4000).astype(np.int64)
        t = pa.table({"id": pa.array(np.arange(4000, dtype=np.int64)),
                      "v": pa.array(vals)})
        out1 = blb_mean_ci(rd.from_arrow(t), val_col="v", id_col="id")
        out2 = blb_mean_ci(rd.from_arrow(t), val_col="v", id_col="id")
        lo = out1.column("lo_e9")[0].as_py() / 1e9
        hi = out1.column("hi_e9")[0].as_py() / 1e9
        mean = vals.mean()
        assert lo < mean < hi
        # interval is tight-ish for n=4000 (sd/sqrt(n) ~ 4.5)
        assert hi - lo < 40
        # deterministic across runs
        for c in ("mean_e9", "lo_e9", "hi_e9"):
            assert out1.column(c)[0].as_py() == out2.column(c)[0].as_py()

    def test_empty(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from rel_ray.stages.selection import blb_mean_ci
        t = pa.table({"id": pa.array([], type=pa.int64()),
                      "v": pa.array([], type=pa.int64())})
        out = blb_mean_ci(rd.from_arrow(t), val_col="v", id_col="id")
        assert out.column("n")[0].as_py() == 0
