"""Per-stage tests over Ray Datasets (SURVEY §5.2 #2)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from rel_ray.config import DEFAULT_CONFIG, PipelineConfig
from rel_ray.stages.blocking import BlockKeys, exact_precluster, records_stage
from rel_ray.stages.clustering import connected_components
from rel_ray.stages.conversation import conversation_stage
from rel_ray.stages.normalize import normalize_stage
from rel_ray.stages.pairs import PairGen
from rel_ray.stages.scoring import PairScorer


@pytest.mark.usefixtures("ray_session")
def test_normalize_preserves_raw_text(tiny_corpus):
    tr = rd.from_arrow(tiny_corpus["transcripts"])
    out = normalize_stage(tr, DEFAULT_CONFIG)
    tbl = pa.concat_tables(pa.table(b) for b in out.iter_batches(batch_format="pyarrow"))
    # explosion invariant: >= one record per turn (multi-mention turns add rows)
    assert tbl.num_rows >= tiny_corpus["transcripts"].num_rows
    # per-row invariant: raw text untouched (BASELINE.json:input_hint);
    # every span record of a turn carries the turn's original text
    orig = dict(zip(
        pc.binary_join_element_wise(
            tiny_corpus["transcripts"].column("conv_id"),
            pc.utf8_lpad(pc.cast(tiny_corpus["transcripts"].column("turn_idx"),
                                 pa.string()), width=5, padding="0"), "#").to_pylist(),
        tiny_corpus["transcripts"].column("text").to_pylist()))
    got = dict(zip(
        [r.rsplit("#", 1)[0] for r in tbl.column("record_id").to_pylist()],
        tbl.column("text").to_pylist()))
    assert got == orig
    lower = tbl.column("text_norm").to_pylist()
    assert all(s == s.lower() for s in lower)


@pytest.mark.usefixtures("ray_session")
def test_conversation_ordering_and_ctx():
    cfg = PipelineConfig(ctx_turns=1, ctx_chars=100)
    rows = {
        "conv_id": ["c1"] * 4,
        "turn_idx": np.array([2, 0, 3, 1], dtype=np.int32),
        "role": ["assistant", "user", "user", "assistant"],
        "text": ["t2", "t0", "t3", "t1"],
        "tool": [""] * 4,
        "ts": pa.array([200, 0, 300, 100], type=pa.timestamp("us")),
    }
    ds = rd.from_arrow(pa.table(rows))
    out = conversation_stage(ds, cfg)
    tbl = pa.concat_tables(pa.table(b) for b in out.iter_batches(batch_format="pyarrow"))
    tbl = tbl.sort_by([("turn_idx", "ascending")])
    assert tbl.column("ctx_before").to_pylist() == ["", "t0", "t1", "t2"]
    assert tbl.column("ctx_after").to_pylist() == ["t1", "t2", "t3", ""]


@pytest.mark.usefixtures("ray_session")
def test_coref_prev_token_subset():
    cfg = DEFAULT_CONFIG
    rows = {
        "conv_id": ["c1"] * 3,
        "turn_idx": np.array([0, 1, 2], dtype=np.int32),
        "role": ["user", "assistant", "user"],
        "text": ["ping Marvok Teldrin today", "ok nothing here",
                 "ask Teldrin about it"],
        "tool": [""] * 3,
        "ts": pa.array([0, 1, 2], type=pa.timestamp("us")),
    }
    ds = rd.from_arrow(pa.table(rows))
    out = conversation_stage(ds, cfg)
    tbl = pa.concat_tables(pa.table(b) for b in out.iter_batches(batch_format="pyarrow"))
    tbl = tbl.sort_by([("turn_idx", "ascending")])
    assert tbl.column("coref_prev").to_pylist() == ["", "", "c1#00000#000"]


@pytest.mark.usefixtures("ray_session")
def test_multi_mention_explosion():
    """A turn naming two entities yields TWO records (find_mentions parity)."""
    cfg = DEFAULT_CONFIG
    rows = {
        "conv_id": ["c1"] * 2,
        "turn_idx": np.array([0, 1], dtype=np.int32),
        "role": ["user", "assistant"],
        "text": ["ask Marva Hollen and Tobias Quent about the budget",
                 "no entities here"],
        "tool": [""] * 2,
        "ts": pa.array([0, 1], type=pa.timestamp("us")),
    }
    ds = rd.from_arrow(pa.table(rows))
    out = conversation_stage(ds, cfg)
    tbl = pa.concat_tables(pa.table(b) for b in out.iter_batches(batch_format="pyarrow"))
    tbl = tbl.sort_by([("record_id", "ascending")])
    assert tbl.column("record_id").to_pylist() == [
        "c1#00000#000", "c1#00000#001", "c1#00001#000"]
    assert tbl.column("mention").to_pylist() == [
        "Marva Hollen", "Tobias Quent", ""]
    # both span records keep the turn's raw text + identical ctx windows
    assert tbl.column("text").to_pylist()[0] == tbl.column("text").to_pylist()[1]
    assert tbl.column("ctx_after").to_pylist()[0] == "no entities here"
    assert tbl.column("ctx_after").to_pylist()[1] == "no entities here"


def test_block_keys_dedup_and_sentinel():
    cfg = DEFAULT_CONFIG
    batch = pa.table({
        "record_id": ["r1", "r2", "r3"],
        "mention_norm": ["marvok teldrin", "marvok teldrin", ""],
    })
    out = BlockKeys(cfg)(batch)
    assert out.column("record_id").to_pylist().count("r3") == 0
    k1 = {k for k, r in zip(out.column("block_key").to_pylist(),
                            out.column("record_id").to_pylist()) if r == "r1"}
    k2 = {k for k, r in zip(out.column("block_key").to_pylist(),
                            out.column("record_id").to_pylist()) if r == "r2"}
    assert k1 == k2 and len(k1) <= cfg.bands
    assert 0 not in k1


def test_pairgen_windowed_bounded_and_connected():
    cfg = PipelineConfig(block_cap=8, max_pairs_per_block=40)
    n = 100
    g = pa.table({
        "block_key": pa.array([1] * n, type=pa.int64()),
        "record_id": [f"r{i:04d}" for i in range(n)],
        "mention_norm": ["x"] * n,
    })
    out = PairGen(cfg)(g)
    n_pairs = out.num_rows
    assert n_pairs < n * 9  # bounded O(n·W), far below n(n-1)/2 = 4950
    # connectivity: union-find over emitted pairs must give one component
    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in zip(out.column("id_a").to_pylist(), out.column("id_b").to_pylist()):
        ra, rb = find(int(a[1:])), find(int(b[1:]))
        if ra != rb:
            parent[ra] = rb
    assert len({find(i) for i in range(n)}) == 1
    for a, b in zip(out.column("id_a").to_pylist(), out.column("id_b").to_pylist()):
        assert a < b


def test_pair_scorer_features():
    cfg = DEFAULT_CONFIG
    batch = pa.table({
        "id_a": ["a", "b", "c"],
        "id_b": ["x", "y", "z"],
        "mn_a": ["marvok teldrin", "marvok teldrin", "marvok teldrin"],
        "mn_b": ["marvok teldrin", "marvok tedlrin", "quolbeth naship"],
    })
    out = PairScorer(cfg)(batch)
    s = out.column("score").to_pylist()
    assert s[0] == pytest.approx(1.0, abs=1e-5)
    assert s[0] > s[1] > s[2]
    assert out.column("is_match").to_pylist()[:2] == [True, True]
    assert not out.column("is_match").to_pylist()[2]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("local_max", [2_000_000, 0])
def test_connected_components_hand_graphs(local_max):
    # local_max=0 forces the distributed label-propagation loop; the default
    # takes the driver-side union-find fast path — results must be identical
    import dataclasses
    cfg = dataclasses.replace(DEFAULT_CONFIG, cc_local_max_edges=local_max)
    nodes = rd.from_items([{"record_id": x} for x in
                           ["a", "b", "c", "d", "e", "f", "g"]])
    # chain a-b-c, pair d-e (duplicate edge), singleton f, g
    edges = rd.from_items([
        {"id_a": "a", "id_b": "b"},
        {"id_a": "b", "id_b": "c"},
        {"id_a": "d", "id_b": "e"},
        {"id_a": "d", "id_b": "e"},
    ])
    out = connected_components(nodes, edges, cfg, num_partitions=2)
    got = {r["record_id"]: r["cluster_id"] for r in out.take_all()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d",
                   "f": "f", "g": "g"}


@pytest.mark.usefixtures("ray_session")
def test_exact_precluster_rep_assignment(tiny_corpus):
    cfg = DEFAULT_CONFIG
    tr = rd.from_arrow(tiny_corpus["transcripts"])
    recs = records_stage(conversation_stage(tr, cfg), cfg)
    out = exact_precluster(recs, cfg, num_partitions=2)
    tbl = pa.concat_tables(pa.table(b) for b in out.iter_batches(batch_format="pyarrow"))
    by_mention = {}
    for m, r, rep in zip(tbl.column("mention_norm").to_pylist(),
                         tbl.column("record_id").to_pylist(),
                         tbl.column("rep_id").to_pylist()):
        by_mention.setdefault(m, set()).add(rep)
    # one rep per distinct mention string, and it is the min record_id
    for m, reps in by_mention.items():
        assert len(reps) == 1
    group_min = {}
    for m, r in zip(tbl.column("mention_norm").to_pylist(),
                    tbl.column("record_id").to_pylist()):
        group_min[m] = min(group_min.get(m, r), r)
    for m, reps in by_mention.items():
        assert reps == {group_min[m]}


def _collect_sorted(out) -> pa.Table:
    tbl = pa.concat_tables(
        pa.table(b) for b in out.iter_batches(batch_format="pyarrow"))
    return tbl.sort_by([("record_id", "ascending")])


@pytest.mark.usefixtures("ray_session")
def test_conversation_locality_equivalence(small_corpus):
    """The locality-aware conversation stage must be byte-identical to the
    classic full sort-exchange on every layout: conversation-contiguous with
    block-boundary straddlers (mixed local+exchange path), fully shuffled
    (spanning-share fallback), and forced-classic."""
    cfg = PipelineConfig(num_buckets=8)
    tr = small_corpus["transcripts"]

    # contiguous layout, 7 blocks → ~6 boundary-straddling conversations
    contig = tr.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    ds_contig = rd.from_arrow(contig).repartition(7)
    want = _collect_sorted(conversation_stage(ds_contig, cfg, locality=False))
    got = _collect_sorted(conversation_stage(ds_contig, cfg, locality=True))
    assert got.equals(want)

    # adversarial layout: rows shuffled across blocks → most conversations
    # span blocks → the span-share guard must route to the classic path
    idx = np.random.default_rng(7).permutation(tr.num_rows)
    ds_shuf = rd.from_arrow(tr.take(pa.array(idx))).repartition(7)
    got_shuf = _collect_sorted(conversation_stage(ds_shuf, cfg, locality=True))
    assert got_shuf.equals(want)

    # collect-guard fallback (max_span_convs=0 forbids the driver collect)
    got_guard = _collect_sorted(
        conversation_stage(ds_contig, cfg, locality=True, max_span_convs=0))
    assert got_guard.equals(want)


class TestGreedyOneToOne:
    def test_greedy_matching(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from rel_ray.stages.pairs import greedy_one_to_one
        t = pa.table({
            "blk": pa.array([1] * 4 + [2], type=pa.int64()),
            "id_a": pa.array(["a", "a", "b", "c", "x"]),
            "id_b": pa.array(["p", "q", "p", "q", "y"]),
            "score": pa.array([0.9, 0.8, 0.7, 0.6, 0.5])})
        out = greedy_one_to_one(rd.from_arrow(t), block_col="blk",
                                num_buckets=1).to_pandas() \
            .sort_values(["blk", "id_a"]).reset_index(drop=True)
        # a-p (0.9) accepted; a-q and b-p blocked; c-q (0.6) accepted
        got = list(map(tuple, out[["id_a", "id_b"]].values))
        assert got == [("a", "p"), ("c", "q"), ("x", "y")]

    def test_tie_determinism(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from rel_ray.stages.pairs import greedy_one_to_one
        t = pa.table({
            "blk": pa.array([1, 1], type=pa.int64()),
            "id_a": pa.array(["a", "a"]),
            "id_b": pa.array(["q", "p"]),
            "score": pa.array([0.5, 0.5])})
        out = greedy_one_to_one(rd.from_arrow(t), block_col="blk",
                                num_buckets=1).to_pandas()
        # equal scores: (id_a, id_b) ascending wins -> a-p
        assert out["id_b"].tolist() == ["p"]
