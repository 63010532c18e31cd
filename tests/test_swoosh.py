"""Match-merge ER (stages/swoosh.py): merge-closure semantics vs a naive
sequential R-Swoosh reference (greedy fixpoint — order-independent under
ICAR, so any greedy order is THE answer)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rel_ray.stages.swoosh import match_merge


def _naive_partition(token_sets: dict, theta: int) -> set:
    """Sequential R-Swoosh under union-merge: greedy merge until fixpoint.
    Returns a frozenset of frozensets of record ids."""
    sets = {i: set(s) for i, s in token_sets.items()}
    members = {i: {i} for i in token_sets}
    changed = True
    while changed:
        changed = False
        keys = sorted(sets)
        for ai in range(len(keys)):
            for bi in range(ai + 1, len(keys)):
                a, b = keys[ai], keys[bi]
                if len(sets[a] & sets[b]) >= theta:
                    sets[a] |= sets.pop(b)
                    members[a] |= members.pop(b)
                    changed = True
                    break
            if changed:
                break
    return frozenset(frozenset(m) for m in members.values())


def _to_ds(token_sets: dict):
    ids, toks = [], []
    for i, s in token_sets.items():
        for t in sorted(s):
            ids.append(i)
            toks.append(t)
    return rd.from_arrow(pa.table({
        "record_id": pa.array(ids, type=pa.int64()),
        "token": pa.array(toks)}))


def _partition_of(ds) -> set:
    df = ds.to_pandas()
    groups = df.groupby("cluster_id")["record_id"].apply(set)
    return frozenset(frozenset(g) for g in groups)


class TestMatchMerge:
    def test_merge_closure_beats_pairwise(self, ray_session):
        # r3 shares <theta tokens with each of r1, r2 individually but
        # >=theta with their merge: only match-merge unions all three.
        recs = {1: {"n:A", "p:P1", "e:E3"},
                2: {"n:A", "p:P1", "e:E2"},
                3: {"n:Y", "p:P9", "e:E2", "x:E3"}}
        recs[3] = {"n:Y", "p:P9", "e:E2", "e:E3"}  # same-field variants
        out = match_merge(_to_ds(recs), theta=2, num_buckets=2)
        part = _partition_of(out)
        assert part == frozenset({frozenset({1, 2, 3})})
        # sanity: the pairwise match graph alone would NOT link r3
        assert len(recs[1] & recs[3]) < 2 and len(recs[2] & recs[3]) < 2

    def test_matches_naive_on_random_data(self, ray_session):
        rng = np.random.RandomState(17)
        recs = {}
        for i in range(14):
            k = rng.randint(2, 5)
            recs[i] = {f"t{v}" for v in rng.choice(10, size=k,
                                                   replace=False)}
        for theta in (2, 3):
            out = match_merge(_to_ds(recs), theta=theta, num_buckets=4)
            assert _partition_of(out) == _naive_partition(recs, theta)

    def test_no_matches_identity(self, ray_session):
        recs = {1: {"a", "b"}, 2: {"c", "d"}, 3: {"e", "f"}}
        out = match_merge(_to_ds(recs), theta=2, num_buckets=2)
        assert _partition_of(out) == frozenset(
            frozenset({i}) for i in recs)

    def test_token_cap_drops_hot_token(self, ray_session):
        from rel_ray.functions.rayutil import DropCounter
        # every record shares the hot token h; pairs via h alone would
        # link everything at theta=1, but the cap drops h entirely
        recs = {i: {"h", f"u{i}"} for i in range(6)}
        counters = DropCounter("test_swoosh_cap")
        out = match_merge(_to_ds(recs), theta=1, num_buckets=2,
                          max_clusters_per_token=3, counters=counters)
        assert _partition_of(out) == frozenset(
            frozenset({i}) for i in recs)
        tot = counters.totals(expect_keys=("swoosh_tokens_over_cap",),
                              timeout_s=30.0)
        assert tot["swoosh_tokens_over_cap"] >= 1

    def test_cluster_id_is_min_member(self, ray_session):
        recs = {5: {"a", "b"}, 9: {"a", "b"}, 2: {"x", "y"}}
        df = match_merge(_to_ds(recs), theta=2, num_buckets=2).to_pandas()
        m = dict(zip(df["record_id"], df["cluster_id"]))
        assert m[5] == 5 and m[9] == 5 and m[2] == 2
