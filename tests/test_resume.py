"""M7 resume tests (SURVEY §5.2 #5): kill-after-stage simulation — a resumed
run must produce byte-identical clusters while skipping completed stages;
stale checkpoints (changed config) must be recomputed, not reused."""

import dataclasses
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rel_ray.config import DEFAULT_CONFIG
from rel_ray.pipelines.checkpointed import run_linkage_checkpointed


@pytest.fixture(scope="module")
def corpus_path(ray_session, tiny_corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("resume")
    p = str(d / "transcripts.parquet")
    pq.write_table(tiny_corpus["transcripts"], p)
    return p


def _sorted_table(ds) -> pa.Table:
    tabs = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(tabs, promote_options="default")
    return t.sort_by([("record_id", "ascending")])


def test_resume_after_kill_is_identical_and_skips(corpus_path, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    ds1, lin1 = run_linkage_checkpointed(corpus_path, ckpt, DEFAULT_CONFIG)
    t1 = _sorted_table(ds1)
    assert [r["resumed"] for r in lin1] == [False, False, False]

    # simulate a crash after the edges stage: downstream checkpoint lost
    shutil.rmtree(os.path.join(ckpt, "clusters"))
    ds2, lin2 = run_linkage_checkpointed(corpus_path, ckpt, DEFAULT_CONFIG)
    t2 = _sorted_table(ds2)
    assert [r["resumed"] for r in lin2] == [True, True, False]
    assert t1.equals(t2)  # byte-identical output

    # full resume: everything skips
    ds3, lin3 = run_linkage_checkpointed(corpus_path, ckpt, DEFAULT_CONFIG)
    assert [r["resumed"] for r in lin3] == [True, True, True]
    assert _sorted_table(ds3).equals(t1)


def test_stale_checkpoint_recomputed_on_config_change(corpus_path, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    run_linkage_checkpointed(corpus_path, ckpt, DEFAULT_CONFIG)
    cfg2 = dataclasses.replace(DEFAULT_CONFIG, threshold=0.9)
    _, lin = run_linkage_checkpointed(corpus_path, ckpt, cfg2)
    # config fingerprint changed → no stage may reuse the old checkpoints
    assert [r["resumed"] for r in lin] == [False, False, False]


def test_lineage_written(corpus_path, tmp_path):
    ckpt = str(tmp_path / "ckpt3")
    run_linkage_checkpointed(corpus_path, ckpt, DEFAULT_CONFIG)
    with open(os.path.join(ckpt, "_lineage.json")) as f:
        lineage = json.load(f)
    assert {r["stage"] for r in lineage} == {"records", "edges", "clusters"}
    for r in lineage:
        assert r["rows"] > 0 and "fingerprint" in r


def test_near_dedup_checkpointed_resume(ray_session, tmp_path):
    from rel_ray.pipelines.checkpointed import near_dedup_checkpointed

    docs = pa.table({
        "doc_id": pa.array(list(range(8)), type=pa.int64()),
        "text": [
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",   # near-dup of 0
            "alpha beta gamma delta epsilon zeta eta theta",  # exact dup of 0
            "one two three four five six seven eight",
            "nine ten eleven twelve thirteen fourteen fifteen sixteen",
            "one two three four five six seven nine",         # near-dup of 3
            "completely different words in this document here",
            "",
        ]})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(docs, p)
    ckpt = str(tmp_path / "ckpt_dedup")

    ds1, lin1 = near_dedup_checkpointed(p, ckpt, threshold=0.7)
    t1 = _sorted_table(ds1)
    assert [r["resumed"] for r in lin1] == [False, False, False]
    clusters = dict(zip(t1.column("record_id").to_pylist(),
                        t1.column("cluster_id").to_pylist()))
    assert clusters["0"] == clusters["1"] == clusters["2"]
    assert clusters["3"] == clusters["5"]
    assert clusters["4"] != clusters["3"]

    # crash after matched stage
    shutil.rmtree(os.path.join(ckpt, "clusters"))
    ds2, lin2 = near_dedup_checkpointed(p, ckpt, threshold=0.7)
    assert [r["resumed"] for r in lin2] == [True, True, False]
    assert _sorted_table(ds2).equals(t1)

    # changed threshold: stale, full recompute
    _, lin3 = near_dedup_checkpointed(p, ckpt, threshold=0.9)
    assert [r["resumed"] for r in lin3] == [False, False, False]


@pytest.mark.usefixtures("ray_session")
def test_write_partitioned_resume(tmp_path):
    import json
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rel_ray.sources.sinks import read_partitioned, write_partitioned

    out = str(tmp_path / "sink")
    t = pa.table({"k": pa.array(np.arange(1000) % 37, type=pa.int64()),
                  "v": pa.array(np.arange(1000), type=pa.int64())})
    res1 = write_partitioned(rd.from_arrow(t).repartition(4), out,
                             key_col="k", num_shards=8)
    assert res1["rows_written"] == 1000 and not res1["skipped"]

    # simulate a killed run: one shard loses its marker AND files
    # (unfinished), the rest keep markers (finished)
    victim = sorted(res1["written"])[0]
    vdir = os.path.join(out, f"__shard={victim}")
    os.remove(os.path.join(vdir, "_done.json"))
    for f in os.listdir(vdir):
        os.remove(os.path.join(vdir, f))

    res2 = write_partitioned(rd.from_arrow(t).repartition(4), out,
                             key_col="k", num_shards=8)
    # only the victim is rewritten; everything else is skipped
    assert res2["written"] == [victim]
    assert set(res2["skipped"]) == set(res1["written"]) - {victim}

    back = pa.concat_tables([pa.table(b) for b in read_partitioned(out)
                             .iter_batches(batch_format="pyarrow")])
    assert back.num_rows == 1000
    assert sorted(back.column("v").to_pylist()) == list(range(1000))
    assert "__shard" not in back.column_names
    # markers carry accurate per-shard lineage
    man = json.load(open(os.path.join(vdir, "_done.json")))
    assert man["rows"] > 0 and man["files"] and man["bytes"] > 0


@pytest.mark.usefixtures("ray_session")
def test_prepare_corpus_resume(tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rel_ray.pipelines.prep import prepare_corpus

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.map_batches(
        lambda t: t.filter(pa.array(
            np.asarray(t.column("doc_id")) % 50 == 0))
        .select(["doc_id", "text"]),
        batch_format="pyarrow", zero_copy_batch=True)
    ck = str(tmp_path / "prep_ck")
    out1 = prepare_corpus(docs, bench, ckpt_dir=ck)
    rep1 = out1["report"].to_pylist()
    assert not any(s.get("resumed") for s in out1["lineage"])

    # second run: every stage resumes from checkpoint, identical report
    out2 = prepare_corpus(docs, bench, ckpt_dir=ck)
    assert out2["report"].to_pylist() == rep1
    assert all(s.get("resumed") for s in out2["lineage"])

    # funnel is monotone and non-trivial
    rows = {r["stage"]: r["rows"] for r in rep1}
    assert rows["input"] >= rows["filtered"] >= rows["lm_filtered"] \
        >= rows["deduped"] >= rows["decontaminated"] > 0
    assert rows["chunks"] >= rows["decontaminated"]


@pytest.mark.usefixtures("ray_session")
def test_write_partitioned_param_mismatch_fails_loudly(tmp_path):
    # regression (round-3 advice): resuming with different routing params
    # than the run that wrote the _done markers would silently drop rows;
    # the sink manifest must reject it
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from rel_ray.sources.sinks import write_partitioned

    out = str(tmp_path / "sink")
    t = pa.table({"k": pa.array(np.arange(100) % 7, type=pa.int64()),
                  "v": pa.array(np.arange(100), type=pa.int64())})
    write_partitioned(rd.from_arrow(t), out, key_col="k", num_shards=8)
    with _pytest.raises(ValueError, match="resume mismatch"):
        write_partitioned(rd.from_arrow(t), out, key_col="k", num_shards=4)
    with _pytest.raises(ValueError, match="resume mismatch"):
        write_partitioned(rd.from_arrow(t), out, key_col="v", num_shards=8)
