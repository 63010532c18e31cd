"""Sources (SURVEY §2.1): schema-validated Parquet readers with column
pruning, plus the tiny in-memory path used by tests.

REL analogs: the HTTP JSON request reader (``REL:src/REL/server.py``) becomes
`from_items_transcripts` (batch engine — no serving path); the SQLite stores
(``REL:src/REL/db/base.py``) are replaced by Parquet everywhere.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from .. import schemas


def read_transcripts(path: str, *, columns: list[str] | None = None):
    """Read a transcripts table (BASELINE.json:input_hint shape).

    Column pruning at the read (never load all columns for a narrow
    transform); schema asserted on the first block so a wrong input fails
    loudly before a full pipeline run.
    """
    ds = rd.read_parquet(path, columns=columns)
    first = ds.take_batch(1, batch_format="pyarrow")
    want = [f for f in schemas.TRANSCRIPTS
            if columns is None or f.name in columns]
    schemas.assert_schema(first, pa.schema(want))
    return ds


def read_table(sf_dir: str, name: str, *, columns: list[str] | None = None):
    """Read one of the driver fixture tables with column pruning."""
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def read_transcripts_jsonl(path: str):
    """Read transcripts from JSON-lines files (the REL HTTP-request payload
    shape, ``REL:src/REL/server.py``, as a batch source). ``ray.data.
    read_json`` streams and parallelizes per file/block like the Parquet
    reader; columns are cast to the canonical TRANSCRIPTS schema (ts parsed
    from ISO-8601 strings) so every downstream stage sees identical types
    regardless of source format."""
    ds = rd.read_json(path)

    def canon(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = t.column("ts")
        if not pa.types.is_timestamp(ts.type):
            ts = pc.strptime(pc.cast(ts, pa.string()),
                             format="%Y-%m-%dT%H:%M:%S", unit="us")
        ts = pc.cast(ts, pa.timestamp("us"))  # JSON auto-parse yields [s]
        cols = {f.name: (ts if f.name == "ts"
                         else pc.cast(t.column(f.name), f.type))
                for f in schemas.TRANSCRIPTS}
        return pa.table(cols)

    out = ds.map_batches(canon, batch_format="pyarrow")
    first = out.take_batch(1, batch_format="pyarrow")
    schemas.assert_schema(first, schemas.TRANSCRIPTS)
    return out


def read_documents_csv(path: str):
    """Read an (doc_id, text) documents table from CSV — the lowest-common-
    denominator interchange format; schema-asserted like the other sources."""
    ds = rd.read_csv(path)

    def canon(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "text": pc.cast(t.column("text"), pa.string()),
        })

    return ds.map_batches(canon, batch_format="pyarrow")


def from_items_transcripts(rows: list[dict]):
    """Tiny in-memory transcripts source (tests / examples)."""
    arrays = {f.name: [] for f in schemas.TRANSCRIPTS}
    for r in rows:
        for f in schemas.TRANSCRIPTS:
            arrays[f.name].append(r[f.name])
    table = pa.table(
        {f.name: pa.array(arrays[f.name], type=f.type) for f in schemas.TRANSCRIPTS})
    return rd.from_arrow(table)


def link_records(rows: list[dict], cfg=None) -> pa.Table:
    """Interactive convenience (REL server-analog for a BATCH engine,
    ``REL:src/REL/server.py``): a handful of in-memory transcript rows →
    the full linkage pipeline → one driver-side clusters table
    (record_id, cluster_id, best_score, n_links). For real corpora read
    Parquet and consume ``run_linkage`` outputs as streaming Datasets —
    this wrapper materializes and is meant for exploration and tests."""
    from ..config import DEFAULT_CONFIG
    from ..pipelines.linkage import run_linkage

    out = run_linkage(from_items_transcripts(rows), cfg or DEFAULT_CONFIG)
    tabs = [pa.table(b)
            for b in out["clusters"].iter_batches(batch_format="pyarrow")]
    if not tabs:
        from .. import schemas as _s
        return _s.CLUSTERS.empty_table()
    return pa.concat_tables(tabs, promote_options="default")
