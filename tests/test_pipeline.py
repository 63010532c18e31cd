"""End-to-end golden gate: pairwise F1 ≥ 0.99 on labeled same-block pairs
(BASELINE.json:metric), plus blocking-recall and determinism checks."""

import pyarrow as pa
import pytest

import ray.data as rd

from rel_ray.config import DEFAULT_CONFIG
from rel_ray.pipelines.eval import pairwise_f1
from rel_ray.pipelines.linkage import run_linkage


@pytest.fixture(scope="module")
def linkage_result(ray_session, small_corpus):
    tr = rd.from_arrow(small_corpus["transcripts"])
    out = run_linkage(tr, DEFAULT_CONFIG, num_partitions=4)
    return {**out, "clusters": out["clusters"].materialize()}


def test_pairwise_f1_gate(linkage_result, small_corpus):
    labels = rd.from_arrow(small_corpus["labels"])
    res = pairwise_f1(linkage_result["clusters"], labels, split="test",
                      num_partitions=4)
    assert res["n_pairs"] > 1000
    assert res["f1"] >= 0.99, res


def test_all_gold_records_clustered(linkage_result, small_corpus):
    gold = small_corpus["gold_clusters"]
    got = {r["record_id"] for r in linkage_result["clusters"].take_all()}
    missing = set(gold.column("record_id").to_pylist()) - got
    assert not missing


def test_cluster_ids_are_min_member(linkage_result):
    rows = linkage_result["clusters"].take_all()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["record_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)


def test_extra_blocking_rules_f1_neutral_or_better(ray_session,
                                                   small_corpus):
    """The blocking-frontier report's best extra rule (soundex) wired in
    via cfg.extra_blocking_rules must not hurt the gate: unioned block
    keys only ADD candidate pairs, so recall (and with the exact scorer,
    F1) is neutral-or-better vs the LSH-only baseline."""
    import dataclasses

    labels = rd.from_arrow(small_corpus["labels"])
    tr = rd.from_arrow(small_corpus["transcripts"])
    base = pairwise_f1(
        run_linkage(tr, DEFAULT_CONFIG,
                    num_partitions=4)["clusters"].materialize(),
        labels, split="test", num_partitions=4)
    cfg = dataclasses.replace(DEFAULT_CONFIG,
                              extra_blocking_rules=("soundex",))
    with_rule = pairwise_f1(
        run_linkage(tr, cfg,
                    num_partitions=4)["clusters"].materialize(),
        labels, split="test", num_partitions=4)
    assert with_rule["recall"] >= base["recall"]
    assert with_rule["f1"] >= 0.99, (base, with_rule)


def test_empty_input_pipeline(ray_session):
    """Regression: a fully-empty transcripts table must flow through the
    whole pipeline (caught once by the verify probe: concat_tables([]))."""
    import ray.data as rd

    from rel_ray import schemas

    empty = pa.table({f.name: pa.array([], type=f.type)
                      for f in schemas.TRANSCRIPTS})
    out = run_linkage(rd.from_arrow(empty), DEFAULT_CONFIG, num_partitions=2)
    assert out["clusters"].count() == 0
    assert out["edges"].count() == 0


def test_cogroup_fallback_paths_equivalent(ray_session, tiny_corpus):
    """The broadcast fast path and the bucketed co-group fallback (used when
    the mention vocabulary exceeds the object-store budget) must produce
    identical clusters."""
    import ray.data as rd

    tr = rd.from_arrow(tiny_corpus["transcripts"])
    fast = run_linkage(tr, DEFAULT_CONFIG, num_partitions=2)
    slow = run_linkage(tr, DEFAULT_CONFIG, num_partitions=2,
                       broadcast_max_rows=0)
    f = {r["record_id"]: r["cluster_id"] for r in fast["clusters"].take_all()}
    s = {r["record_id"]: r["cluster_id"] for r in slow["clusters"].take_all()}
    assert f == s and len(f) > 0


def test_distributed_cc_pipeline_equivalent(ray_session, tiny_corpus):
    """Forcing the distributed label-propagation loop (cc_local_max_edges=0)
    must give the same clusters as the driver union-find fast path."""
    import dataclasses

    import ray.data as rd

    tr = rd.from_arrow(tiny_corpus["transcripts"])
    fast = run_linkage(tr, DEFAULT_CONFIG, num_partitions=2)
    cfg2 = dataclasses.replace(DEFAULT_CONFIG, cc_local_max_edges=0)
    dist = run_linkage(tr, cfg2, num_partitions=2)
    f = {r["record_id"]: r["cluster_id"] for r in fast["clusters"].take_all()}
    d = {r["record_id"]: r["cluster_id"] for r in dist["clusters"].take_all()}
    assert f == d and len(f) > 0


def test_gru_head_f1_gate(ray_session, tiny_corpus):
    """The optional GRU similarity head (cfg.emb_head='gru',
    stages/inference.py) must hold the F1 gate end-to-end — it replaces
    only the sim_emb feature; blocking and the other two features are
    unchanged."""
    import dataclasses

    cfg = dataclasses.replace(DEFAULT_CONFIG, emb_head="gru")
    tr = rd.from_arrow(tiny_corpus["transcripts"])
    out = run_linkage(tr, cfg, num_partitions=4)
    labels = rd.from_arrow(tiny_corpus["labels"])
    res = pairwise_f1(out["clusters"], labels, split="test",
                      num_partitions=4)
    assert res["f1"] >= 0.99, res


@pytest.mark.usefixtures("ray_session")
def test_entity_summary():
    import numpy as np
    from rel_ray.pipelines.linkage import entity_summary

    # hand-built clusters/records: cluster A = r1,r2,r3 over 2 convs with
    # forms x,x,y (mode x); cluster B = r4 singleton
    clusters = rd.from_arrow(pa.table({
        "record_id": pa.array(["r1", "r2", "r3", "r4"]),
        "cluster_id": pa.array(["A", "A", "A", "B"])}))
    records = rd.from_arrow(pa.table({
        "record_id": pa.array(["r1", "r2", "r3", "r4"]),
        "conv_id": pa.array(["c1", "c1", "c2", "c3"]),
        "mention_norm": pa.array(["x", "x", "y", "z"])}))
    out = pa.concat_tables([pa.table(b) for b in entity_summary(
        clusters, records).iter_batches(batch_format="pyarrow")])
    rows = {r["cluster_id"]: r for r in out.to_pylist()}
    assert rows["A"]["n_records"] == 3 and rows["A"]["n_convs"] == 2
    assert rows["A"]["top_form"] == "x"
    assert rows["B"] == {"cluster_id": "B", "n_records": 1,
                         "n_convs": 1, "top_form": "z"}

    # tie on counts -> lexicographically smaller form wins
    records2 = rd.from_arrow(pa.table({
        "record_id": pa.array(["r1", "r2", "r3", "r4"]),
        "conv_id": pa.array(["c1", "c1", "c2", "c3"]),
        "mention_norm": pa.array(["zz", "aa", "zz", "aa"])}))
    clusters2 = rd.from_arrow(pa.table({
        "record_id": pa.array(["r1", "r2", "r3", "r4"]),
        "cluster_id": pa.array(["A", "A", "A", "A"])}))
    out2 = pa.concat_tables([pa.table(b) for b in entity_summary(
        clusters2, records2).iter_batches(batch_format="pyarrow")])
    assert out2.to_pylist()[0]["top_form"] == "aa"


def test_linkage_cogroup_fallback_driver_free(ray_session, tiny_corpus,
                                              monkeypatch):
    """Round-3 gate: with broadcast_max_rows=0 (and the distributed CC loop
    forced) the large-vocabulary fallback must never collect a table to the
    driver — the conf merge runs as a distributed full-outer co-group — and
    must produce byte-identical cluster rows (ids AND confidence columns)
    to the broadcast fast path."""
    import dataclasses

    import ray.data as rd

    import rel_ray.functions.rayutil as rayutil

    tr = rd.from_arrow(tiny_corpus["transcripts"])
    fast = run_linkage(tr, DEFAULT_CONFIG, num_partitions=2)
    f = {r["record_id"]: (r["cluster_id"], round(r["best_score"], 5),
                          r["n_links"])
         for r in fast["clusters"].take_all()}

    def no_collect(*a, **k):
        raise AssertionError(
            "collect_table called in the driver-free fallback path")

    monkeypatch.setattr(rayutil, "collect_table", no_collect)
    cfg2 = dataclasses.replace(DEFAULT_CONFIG, cc_local_max_edges=0)
    slow = run_linkage(tr, cfg2, num_partitions=2, broadcast_max_rows=0)
    s = {r["record_id"]: (r["cluster_id"], round(r["best_score"], 5),
                          r["n_links"])
         for r in slow["clusters"].take_all()}
    assert f == s and len(f) > 0


def test_fs_em_match_rule_f1_gate(ray_session, small_corpus):
    """The UNSUPERVISED Fellegi-Sunter decision (eval.fs_match_rule plugged
    into run_linkage's match_rule seam) must reach the same F1 bar as the
    tuned heuristic threshold — no labels anywhere in the loop."""
    import dataclasses

    from rel_ray.pipelines.eval import fs_match_rule

    ungated = dataclasses.replace(DEFAULT_CONFIG, threshold=0.0)
    tr = rd.from_arrow(small_corpus["transcripts"])
    out = run_linkage(tr, ungated, num_partitions=4,
                      match_rule=fs_match_rule())
    labels = rd.from_arrow(small_corpus["labels"])
    res = pairwise_f1(out["clusters"], labels, split="test",
                      num_partitions=4)
    assert res["n_pairs"] > 1000
    # unsupervised gate: within half a point of the tuned heuristic's 0.99
    # (measured 0.993 here / 0.987 on the seed-7 fixture), never a false
    # positive on either fixture
    assert res["precision"] >= 0.999, res
    assert res["f1"] >= 0.98, res
