import pyarrow.parquet as pq
import pytest

from rel_ray.sources.readers import from_items_transcripts, read_transcripts


@pytest.mark.usefixtures("ray_session")
def test_read_transcripts_schema_check(tiny_corpus, tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(tiny_corpus["transcripts"], p)
    ds = read_transcripts(p)
    assert ds.count() == tiny_corpus["transcripts"].num_rows
    # pruned read
    ds2 = read_transcripts(p, columns=["conv_id", "turn_idx", "text"])
    assert set(ds2.take_batch(1, batch_format="pyarrow").column_names) == {
        "conv_id", "turn_idx", "text"}


@pytest.mark.usefixtures("ray_session")
def test_read_transcripts_wrong_schema_fails(tmp_path):
    import pyarrow as pa

    p = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({"conv_id": pa.array([1, 2])}), p)
    with pytest.raises(AssertionError):
        read_transcripts(p)


@pytest.mark.usefixtures("ray_session")
def test_from_items_transcripts():
    rows = [dict(conv_id="c1", turn_idx=0, role="user", text="hi Bob Ray",
                 tool="", ts=0),
            dict(conv_id="c1", turn_idx=1, role="assistant", text="ok",
                 tool="", ts=1)]
    ds = from_items_transcripts(rows)
    assert ds.count() == 2


@pytest.mark.usefixtures("ray_session")
def test_conll_reader_and_labels(tmp_path):
    """AIDA/CoNLL-style import: gold mentions parsed with span-aligned record
    ids; labels pair same-document mentions with same_entity from gold ids."""
    import pyarrow as pa

    from rel_ray.sources.conll import conll_labels, parse_conll_text, read_conll

    conll = "\n".join([
        "-DOCSTART- (doc1 NEWS)",
        "The",
        "meeting",
        "with",
        "Marva\tB\tMarva Hollen\tMarva_Hollen",
        "Hollen\tI\tMarva Hollen\tMarva_Hollen",
        "and",
        "Tobias\tB\tTobias Quent\tTobias_Quent",
        "Quent\tI\tTobias Quent\tTobias_Quent",
        "went",
        "well",
        "",
        "Hollen\tB\tHollen\tMarva_Hollen",
        "agreed",
        "-DOCSTART- (doc2 SPORT)",
        "Quent\tB\tQuent\tTobias_Quent",
        "scored",
    ])
    t = parse_conll_text(conll)
    assert t.column("mention").to_pylist() == [
        "Marva Hollen", "Tobias Quent", "Hollen", "Quent"]
    assert t.column("record_id").to_pylist() == [
        "doc1#00000#000", "doc1#00000#001", "doc1#00000#002",
        "doc2#00000#000"]
    assert t.column("gold_entity").to_pylist() == [
        "Marva_Hollen", "Tobias_Quent", "Marva_Hollen", "Tobias_Quent"]

    p = tmp_path / "shard0.conll"
    p.write_text(conll)
    import ray.data as rd  # noqa: F401
    ds = read_conll(str(p))
    recs = pa.concat_tables(
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    assert recs.num_rows == 4
    assert recs.column("mention_norm").to_pylist()[0] == "marva hollen"

    labels = pa.concat_tables(
        pa.table(b) for b in
        conll_labels(ds).iter_batches(batch_format="pyarrow"))
    got = {(r["id_a"], r["id_b"]): r["same_entity"]
           for r in labels.to_pylist()}
    # doc1 has 3 mentions -> 3 pairs; doc2 has 1 -> none
    key = lambda a, b: tuple(sorted((a, b)))
    assert len(got) == 3
    assert got[key("shard0.conll#doc1#00000#000", "shard0.conll#doc1#00000#002")] is True
    assert got[key("shard0.conll#doc1#00000#000", "shard0.conll#doc1#00000#001")] is False


@pytest.mark.usefixtures("ray_session")
def test_link_records_interactive():
    """The point-lookup convenience wrapper: rows in, clusters table out."""
    from rel_ray.sources.readers import link_records

    ts = 1_700_000_000_000_000
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "ask Marva Hollen about it", "tool": "", "ts": ts},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "Marva Hollen agreed", "tool": "", "ts": ts + 1},
        {"conv_id": "c2", "turn_idx": 0, "role": "user",
         "text": "ping Tobias Quent today", "tool": "", "ts": ts + 2},
    ]
    t = link_records(rows)
    cl = dict(zip(t.column("record_id").to_pylist(),
                  t.column("cluster_id").to_pylist()))
    assert cl["c1#00000#000"] == cl["c1#00001#000"]
    assert cl["c2#00000#000"] != cl["c1#00000#000"]
    assert set(t.column_names) == {"record_id", "cluster_id", "best_score",
                                   "n_links"}
