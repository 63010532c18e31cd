"""Hand-answer tests for the behavioral-analytics stages (funnel, cohort
retention, Markov transitions, skyline) and the triangle counter.

The oracle sweep (scripts/check_oracle.py) pins these operators value-exact
vs DuckDB at sf scale; these tests pin the EDGE semantics the synthetic
tables can't exercise — unreached funnel steps, ties, duplicate skyline
points, disconnected / triangle-free graphs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rel_ray.stages.behavior import (cohort_retention, consecutive_pairs,
                                     funnel_counts, skyline2d,
                                     transition_counts)
from rel_ray.stages.graph import triangle_count


def _events(rows):
    """rows: list of (user, ts, type, event_id)."""
    return rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows], type=pa.string()),
        "event_id": pa.array([r[3] for r in rows], type=pa.int64()),
    }))


def _df(ds):
    import pandas as pd
    import pyarrow as pa
    tabs = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tabs:
        return pd.DataFrame()
    return pa.concat_tables(tabs, promote_options="default").to_pandas()


class TestFunnel:
    def test_order_matters(self, ray_session):
        # u1 does a,b,c in order; u2 does c before a,b (never completes);
        # u3 only a
        ev = _events([(1, 10, "a", 1), (1, 20, "b", 2), (1, 30, "c", 3),
                      (2, 5, "c", 4), (2, 10, "a", 5), (2, 20, "b", 6),
                      (3, 1, "a", 7)])
        out = _df(funnel_counts(ev, ["a", "b", "c"], key="user_id",
                                ts="ts", type_col="event_type",
                                num_buckets=4))
        assert out["users"].tolist() == [3, 2, 1]

    def test_tie_at_same_ts_counts(self, ray_session):
        # b at the SAME ts as a: >= semantics reaches step 2
        ev = _events([(1, 10, "a", 1), (1, 10, "b", 2)])
        out = _df(funnel_counts(ev, ["a", "b"], key="user_id", ts="ts",
                                type_col="event_type", num_buckets=2))
        assert out["users"].tolist() == [1, 1]

    def test_unreached_steps_zero(self, ray_session):
        ev = _events([(1, 10, "a", 1)])
        out = _df(funnel_counts(ev, ["a", "x", "y"], key="user_id",
                                ts="ts", type_col="event_type",
                                num_buckets=2))
        assert out["users"].tolist() == [1, 0, 0]
        assert out["step_idx"].tolist() == [1, 2, 3]


class TestCohortRetention:
    def test_gaps_and_cohorts(self, ray_session):
        # period=10: u1 first at p0, active p0,p2; u2 first at p1 only
        ev = _events([(1, 1, "a", 1), (1, 25, "a", 2), (1, 27, "a", 3),
                      (2, 15, "a", 4)])
        out = _df(cohort_retention(ev, key="user_id", ts="ts",
                                   period_us=10, num_buckets=4))
        got = set(map(tuple, out.values.tolist()))
        assert got == {(0, 0, 1), (0, 2, 1), (1, 0, 1)}


class TestTransitions:
    def test_no_cross_user_pairs(self, ray_session):
        ev = _events([(1, 1, "a", 1), (1, 2, "b", 2),
                      (2, 3, "b", 3), (2, 4, "a", 4)])
        out = _df(transition_counts(ev, key="user_id", ts="ts",
                                    tie="event_id", type_col="event_type",
                                    num_buckets=4))
        got = {(r.from_type, r.to_type): (r.cnt, r.share)
               for r in out.itertuples()}
        assert got == {("a", "b"): (1, 1.0), ("b", "a"): (1, 1.0)}

    def test_share_sums_to_one_per_source(self, ray_session):
        ev = _events([(1, i, t, i) for i, t in
                      enumerate("aabab" * 4)])
        out = _df(transition_counts(ev, key="user_id", ts="ts",
                                    tie="event_id", type_col="event_type",
                                    num_buckets=2))
        sums = out.groupby("from_type")["share"].sum()
        assert np.allclose(sums.values, 1.0)


class TestSkyline:
    def test_duplicates_kept_dominated_dropped(self, ray_session):
        t = pa.table({"x": pa.array([1, 1, 3, 3, 2], type=pa.int64()),
                      "y": pa.array([5, 5, 2, 1, 2], type=pa.int64())})
        out = _df(skyline2d(rd.from_arrow(t), x="x", y="y"))
        got = sorted(map(tuple, out.values.tolist()))
        # (1,5) twice (duplicates mutually non-dominating), (3,2) on the
        # frontier; (3,1) dominated by (3,2); (2,2) dominated by (3,2)
        assert got == [(1, 5), (1, 5), (3, 2)]

    def test_empty(self, ray_session):
        t = pa.table({"x": pa.array([], type=pa.int64()),
                      "y": pa.array([], type=pa.int64())})
        assert _df(skyline2d(rd.from_arrow(t), x="x", y="y")).empty


class TestTriangles:
    def _edges(self, pairs):
        return rd.from_arrow(pa.table({
            "src": pa.array([p[0] for p in pairs], type=pa.int64()),
            "dst": pa.array([p[1] for p in pairs], type=pa.int64())}))

    def test_k4_has_four(self, ray_session):
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        assert triangle_count(self._edges(k4), num_buckets=4) == 4

    def test_multi_edges_self_loops_direction_ignored(self, ray_session):
        e = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
        assert triangle_count(self._edges(e), num_buckets=4) == 1

    def test_triangle_free(self, ray_session):
        # path + star: no triangles
        e = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13)]
        assert triangle_count(self._edges(e), num_buckets=4) == 0

    def test_empty(self, ray_session):
        assert triangle_count(self._edges([]), num_buckets=2) == 0


class TestConsecutivePairs:
    def test_leads_within_key_only(self, ray_session):
        ev = _events([(7, 1, "k", 1), (8, 2, "k", 2), (9, 3, "k", 3),
                      (5, 4, "j", 4)])
        out = _df(consecutive_pairs(ev, key="event_type", ts="ts",
                                    tie="event_id", val="user_id",
                                    num_buckets=2))
        got = sorted(map(tuple, out.values.tolist()))
        assert got == [(7, 8), (8, 9)]


class TestKCore:
    def _edges(self, pairs):
        return rd.from_arrow(pa.table({
            "src": pa.array([p[0] for p in pairs], type=pa.int64()),
            "dst": pa.array([p[1] for p in pairs], type=pa.int64())}))

    def test_cascade_peel(self, ray_session):
        from rel_ray.stages.graph import k_core
        # K4 on {1,2,3,4} plus a tail 4-5-6: k=3 peels 6 (deg 1), then 5,
        # then 4's extra edge is gone but 4 keeps deg 3 in the K4
        e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
        out = _df(k_core(self._edges(e), 3, num_buckets=4))
        got = sorted(map(tuple, out.values.tolist()))
        assert got == [(1, 3), (2, 3), (3, 3), (4, 3)]

    def test_empty_core(self, ray_session):
        from rel_ray.stages.graph import k_core
        e = [(1, 2), (2, 3), (3, 1)]  # triangle: 2-core yes, 3-core no
        assert _df(k_core(self._edges(e), 3, num_buckets=2)).empty
        out = _df(k_core(self._edges(e), 2, num_buckets=2))
        assert sorted(out["node"].tolist()) == [1, 2, 3]

    def test_semi_join_fallback_matches_broadcast(self, ray_session):
        from rel_ray.stages.graph import k_core
        e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6),
             (6, 7), (7, 8), (8, 6)]
        a = _df(k_core(self._edges(e), 3, num_buckets=4))
        b = _df(k_core(self._edges(e), 3, num_buckets=4,
                       broadcast_max_rows=0))
        assert sorted(map(tuple, a.values.tolist())) == \
            sorted(map(tuple, b.values.tolist()))


class TestFunnelWindow:
    def test_window_gates_transition(self, ray_session):
        # u1: a@10 -> b@15 (within window 10); u2: a@10 -> b@25 (outside)
        ev = _events([(1, 10, "a", 1), (1, 15, "b", 2),
                      (2, 10, "a", 3), (2, 25, "b", 4)])
        out = _df(funnel_counts(ev, ["a", "b"], key="user_id", ts="ts",
                                type_col="event_type", num_buckets=2,
                                window=10))
        assert out["users"].tolist() == [2, 1]

    def test_step_one_unconstrained(self, ray_session):
        ev = _events([(1, 1_000_000, "a", 1), (1, 1_000_001, "b", 2)])
        out = _df(funnel_counts(ev, ["a", "b"], key="user_id", ts="ts",
                                type_col="event_type", num_buckets=2,
                                window=5))
        assert out["users"].tolist() == [1, 1]

    def test_earliest_chain_not_best_chain(self, ray_session):
        # min-ts chaining is the defined (SQL) semantics: u1's EARLIEST a
        # is at 0, whose window misses b@100; the later a@95 would reach
        # it, but the chain pins t1 = min ts — count stays 0
        ev = _events([(1, 0, "a", 1), (1, 95, "a", 2), (1, 100, "b", 3)])
        out = _df(funnel_counts(ev, ["a", "b"], key="user_id", ts="ts",
                                type_col="event_type", num_buckets=2,
                                window=10))
        assert out["users"].tolist() == [1, 0]


class TestAdamicAdar:
    def _edges(self, pairs):
        return rd.from_arrow(pa.table({
            "src": pa.array([p[0] for p in pairs], type=pa.int64()),
            "dst": pa.array([p[1] for p in pairs], type=pa.int64())}))

    @staticmethod
    def _naive(pairs, new_only=True):
        import math
        from collections import defaultdict
        adj = defaultdict(set)
        for a, b in pairs:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        edge = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
        out = {}
        nodes = sorted(adj)
        for i, u in enumerate(nodes):
            for v in nodes[i + 1:]:
                common = adj[u] & adj[v]
                if not common:
                    continue
                if new_only and (u, v) in edge:
                    continue
                aa = sum(int(math.floor(1e9 / math.log(len(adj[w])) + 0.5))
                         for w in common)
                out[(u, v)] = (len(common), aa)
        return out

    def _run(self, pairs, **kw):
        from rel_ray.stages.graph import adamic_adar
        df = _df(adamic_adar(self._edges(pairs), num_buckets=4, **kw))
        return {(int(r.u), int(r.v)): (int(r.cn), int(r.aa_e9))
                for r in df.itertuples()}

    def test_path_predicts_endpoints(self, ray_session):
        # path 1-2-3: only new pair is (1,3) via w=2 (deg 2)
        got = self._run([(1, 2), (2, 3)])
        assert got == self._naive([(1, 2), (2, 3)])
        assert list(got) == [(1, 3)]
        assert got[(1, 3)][0] == 1

    def test_matches_naive_random(self, ray_session):
        rng = np.random.RandomState(7)
        pairs = [(int(a), int(b))
                 for a, b in rng.randint(0, 30, size=(120, 2))]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert self._run(pairs) == self._naive(pairs)

    def test_include_existing_edges(self, ray_session):
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
        got = self._run(pairs, predict_new_only=False)
        assert got == self._naive(pairs, new_only=False)
        assert (1, 2) in got  # existing edge scored too

    def test_max_degree_skips_hub(self, ray_session):
        # star around 0 plus a path 1-2-3; hub 0 has degree 5
        star = [(0, i) for i in range(1, 6)]
        pairs = star + [(1, 2), (2, 3)]
        got = self._run(pairs, max_degree=4)
        # hub wedges dropped: only w=2 (deg 3: nbrs 0,1,3) contributes
        naive_nohub = {k: v for k, v in self._naive(pairs).items()}
        import math
        w2 = int(math.floor(1e9 / math.log(3) + 0.5))
        assert got[(1, 3)] == (1, w2)
        assert all(k in naive_nohub for k in got)

    def test_empty(self, ray_session):
        assert self._run([]) == {}
        assert self._run([(5, 5)]) == {}


class TestLocalClustering:
    def _edges(self, pairs):
        return rd.from_arrow(pa.table({
            "src": pa.array([p[0] for p in pairs], type=pa.int64()),
            "dst": pa.array([p[1] for p in pairs], type=pa.int64())}))

    def test_triangle_plus_pendant(self, ray_session):
        from rel_ray.stages.graph import local_clustering
        # K3 on {1,2,3} plus pendant 3-4
        e = [(1, 2), (2, 3), (1, 3), (3, 4)]
        df = _df(local_clustering(self._edges(e), num_buckets=4)) \
            .sort_values("node").reset_index(drop=True)
        assert df["node"].tolist() == [1, 2, 3, 4]
        assert df["tri"].tolist() == [1, 1, 1, 0]
        assert df["deg"].tolist() == [2, 2, 3, 1]
        # coef: 1.0, 1.0, 2*1/(3*2)=1/3, NULL (deg<2)
        assert df["coef_e9"].tolist()[:3] == [10**9, 10**9,
                                              2 * 10**9 // 6]
        assert df["coef_e9"].isna().tolist() == [False, False, False, True]

    def test_k4_all_ones(self, ray_session):
        from rel_ray.stages.graph import local_clustering
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        df = _df(local_clustering(self._edges(k4), num_buckets=4))
        assert sorted(df["coef_e9"]) == [10**9] * 4
        assert sorted(df["tri"]) == [3] * 4

    def test_empty(self, ray_session):
        from rel_ray.stages.graph import local_clustering
        assert _df(local_clustering(self._edges([]), num_buckets=2)).empty


class TestAssortativity:
    def _edges(self, pairs):
        return rd.from_arrow(pa.table({
            "src": pa.array([p[0] for p in pairs], type=pa.int64()),
            "dst": pa.array([p[1] for p in pairs], type=pa.int64())}))

    def test_star_is_minus_one(self, ray_session):
        from rel_ray.stages.graph import assortativity
        # star K1,4: perfectly disassortative, r = -1
        t = assortativity(self._edges([(0, i) for i in range(1, 5)]),
                          num_buckets=4)
        assert t.column("r_e9")[0].as_py() == -10**9

    def test_regular_graph_undefined(self, ray_session):
        from rel_ray.stages.graph import assortativity
        # cycle C4: all degrees equal -> zero variance, r undefined
        t = assortativity(self._edges([(0, 1), (1, 2), (2, 3), (3, 0)]),
                          num_buckets=4)
        assert t.column("r_e9")[0].as_py() is None
        assert t.column("m")[0].as_py() == 8

    def test_matches_naive_pearson(self, ray_session):
        import numpy as np
        from rel_ray.stages.graph import assortativity
        rng = np.random.RandomState(3)
        pairs = set()
        while len(pairs) < 40:
            a, b = rng.randint(0, 15, size=2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)
        deg = {}
        for a, b in pairs:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        xs = [deg[a] for a, b in pairs] + [deg[b] for a, b in pairs]
        ys = [deg[b] for a, b in pairs] + [deg[a] for a, b in pairs]
        r = np.corrcoef(xs, ys)[0, 1]
        t = assortativity(self._edges(pairs), num_buckets=4)
        got = t.column("r_e9")[0].as_py() / 1e9
        assert abs(got - r) < 1e-6


class TestMarketBasket:
    def test_known_answer(self, ray_session):
        from rel_ray.stages.behavior import market_basket_pairs
        # baskets: u1={x,y}, u2={x,y}, u3={x,z}, u4={y}
        t = pa.table({
            "u": pa.array([1, 1, 1, 2, 2, 3, 3, 4], type=pa.int64()),
            "it": pa.array(["x", "y", "x", "x", "y", "x", "z", "y"])})
        df = _df(market_basket_pairs(rd.from_arrow(t), key="u", item="it",
                                     num_buckets=2)) \
            .sort_values(["a", "b"]).reset_index(drop=True)
        # N=4, c_x=3, c_y=3, c_z=1; pairs: (x,y)=2, (x,z)=1
        assert df[["a", "b"]].values.tolist() == [["x", "y"], ["x", "z"]]
        assert df["c_ab"].tolist() == [2, 1]
        assert df["support_e9"].tolist() == [2 * 10**9 // 4, 10**9 // 4]
        assert df["lift_e9"].tolist() == [
            4 * 2 * 10**9 // (3 * 3), 4 * 1 * 10**9 // (3 * 1)]

    def test_wide_basket_guard(self, ray_session):
        from rel_ray.stages.behavior import market_basket_pairs
        import pytest as _pt
        t = pa.table({
            "u": pa.array([1] * 5, type=pa.int64()),
            "it": pa.array([f"i{j}" for j in range(5)])})
        with _pt.raises(Exception, match="max_items_per_key"):
            _df(market_basket_pairs(rd.from_arrow(t), key="u", item="it",
                                    num_buckets=1, max_items_per_key=3))


class TestHits:
    def _edges(self, pairs):
        return rd.from_arrow(pa.table({
            "src": pa.array([p[0] for p in pairs]),
            "dst": pa.array([p[1] for p in pairs])}))

    def test_star_authorities(self, ray_session):
        from rel_ray.stages.graph import hits
        # all hubs point at one authority
        df = _df(hits(self._edges([("h1", "x"), ("h2", "x"), ("h3", "x")]),
                      iters=4)).set_index("node")
        assert abs(df.loc["x", "auth"] - 1.0) < 1e-12
        for h in ("h1", "h2", "h3"):
            assert abs(df.loc[h, "hub"] - 1.0 / 3) < 1e-12
            assert df.loc[h, "auth"] == 0.0

    def test_paths_agree(self, ray_session):
        from rel_ray.stages.graph import hits
        import numpy as np
        rng = np.random.RandomState(9)
        pairs = [(f"s{rng.randint(6)}", f"d{rng.randint(6)}")
                 for _ in range(30)]
        fast = _df(hits(self._edges(pairs), iters=5)) \
            .set_index("node").sort_index()
        slow = _df(hits(self._edges(pairs), iters=5,
                        broadcast_max_rows=0, num_buckets=4)) \
            .set_index("node").sort_index()
        assert list(fast.index) == list(slow.index)
        assert np.allclose(fast["hub"], slow["hub"], atol=1e-9)
        assert np.allclose(fast["auth"], slow["auth"], atol=1e-9)

    def test_empty(self, ray_session):
        from rel_ray.stages.graph import hits
        assert _df(hits(self._edges([]), iters=2)).empty


class TestBridges:
    def _ds(self, rows):
        return rd.from_arrow(pa.table({
            "cluster_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "id_a": pa.array([r[1] for r in rows], type=pa.int64()),
            "id_b": pa.array([r[2] for r in rows], type=pa.int64())}))

    def test_path_cycle_barbell(self, ray_session):
        from rel_ray.stages.clustering import bridge_edges
        rows = (
            # cluster 1: path 1-2-3 -> both edges are bridges
            [(1, 1, 2), (1, 2, 3)] +
            # cluster 2: triangle -> no bridges
            [(2, 10, 11), (2, 11, 12), (2, 10, 12)] +
            # cluster 3: barbell: triangle a + bridge + triangle b
            [(3, 20, 21), (3, 21, 22), (3, 20, 22),
             (3, 22, 30), (3, 30, 31), (3, 31, 32), (3, 30, 32)])
        df = _df(bridge_edges(self._ds(rows), num_buckets=2)) \
            .sort_values(["cluster_id", "id_a", "id_b"]) \
            .reset_index(drop=True)
        got = list(map(tuple, df[["cluster_id", "id_a", "id_b"]].values))
        assert got == [(1, 1, 2), (1, 2, 3), (3, 22, 30)]

    def test_cluster_cap_raises(self, ray_session):
        from rel_ray.stages.clustering import bridge_edges
        import pytest as _pt
        rows = [(1, i, i + 1) for i in range(10)]
        with _pt.raises(Exception, match="max_cluster_edges"):
            _df(bridge_edges(self._ds(rows), num_buckets=1,
                             max_cluster_edges=5))


class TestPointerJump:
    def _parents(self, pairs):
        return rd.from_arrow(pa.table({
            "node": pa.array([p[0] for p in pairs], type=pa.int64()),
            "parent": pa.array([p[1] for p in pairs], type=pa.int64())}))

    CASE = [(0, 0), (1, 0), (2, 1), (3, 2), (4, 2), (10, 10), (11, 10),
            (12, 11), (13, 12), (14, 13), (15, 14)]
    WANT = {0: (0, 0), 1: (0, 1), 2: (0, 2), 3: (0, 3), 4: (0, 3),
            10: (10, 0), 11: (10, 1), 12: (10, 2), 13: (10, 3),
            14: (10, 4), 15: (10, 5)}

    def _check(self, df):
        got = {int(r.node): (int(r.root), int(r.depth))
               for r in df.itertuples()}
        assert got == self.WANT

    def test_broadcast_path(self, ray_session):
        from rel_ray.stages.graph import pointer_jump_roots
        self._check(_df(pointer_jump_roots(self._parents(self.CASE))))

    def test_cogroup_path_agrees(self, ray_session):
        from rel_ray.stages.graph import pointer_jump_roots
        self._check(_df(pointer_jump_roots(
            self._parents(self.CASE), broadcast_max_rows=0,
            num_buckets=4)))

    def test_missing_parent_raises(self, ray_session):
        from rel_ray.stages.graph import pointer_jump_roots
        import pytest as _pt
        with _pt.raises(Exception, match="missing"):
            _df(pointer_jump_roots(self._parents([(1, 99)])))

    def test_missing_parent_raises_on_cogroup_path(self, ray_session):
        """The distributed path must validate the same contract the
        broadcast path does — a dangling parent id is a loud error on
        BOTH paths, never silently-missing output rows."""
        from rel_ray.stages.graph import pointer_jump_roots
        import pytest as _pt
        with _pt.raises(Exception, match="missing"):
            _df(pointer_jump_roots(self._parents([(1, 99), (2, 1)]),
                                   broadcast_max_rows=0, num_buckets=4))


class TestAttribution:
    def test_first_last_touch_windows(self, ray_session):
        from rel_ray.stages.behavior import touch_attribution
        # user 1: clicks at t=1(id10),3(id11),5(id12); buys at t=6(id20)
        #   window 4 -> clicks in [2,6] = ids 11,12 -> first 11, last 12
        # user 1: buys at t=20(id21) -> window [16,20] empty -> nulls
        # user 2: click at t=7(id30); buys at t=7(id40) -> same-ts click
        #   included -> first=last=30
        rows = [
            (1, 1, "click", 10), (1, 3, "click", 11), (1, 5, "click", 12),
            (1, 6, "buy", 20), (1, 20, "buy", 21),
            (2, 7, "click", 30), (2, 7, "buy", 40)]
        t = pa.table({
            "u": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "eid": pa.array([r[3] for r in rows], type=pa.int64()),
            "et": pa.array([r[2] for r in rows])})
        out = _df(touch_attribution(
            rd.from_arrow(t), key="u", ts="ts", tie="eid", type_col="et",
            touch_type="click", convert_type="buy", window_us=4,
            num_buckets=1)).sort_values("convert_id") \
            .reset_index(drop=True)
        assert out["convert_id"].tolist() == [20, 21, 40]
        assert out["first_touch"].tolist()[0] == 11
        assert out["last_touch"].tolist()[0] == 12
        assert out["first_touch"].isna().tolist() == [False, True, False]
        assert out["first_touch"].tolist()[2] == 30
        assert out["last_touch"].tolist()[2] == 30
