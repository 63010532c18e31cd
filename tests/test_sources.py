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
