"""Resumable partitioned Parquet sink.

The north-rule output contract made explicit: results land as ONE
DIRECTORY PER KEY SHARD (hive-style ``__shard=N/``) with a per-shard
``_done.json`` marker (rows, bytes, files), so a killed run restarts and
SKIPS every finished shard — the skip happens as a filter BEFORE the
write, so finished shards' rows never re-enter the sink execution at all.
Partial shards (files but no marker) are cleaned and rewritten — markers
are written only after the shard's files are fully on disk, so a marker
is proof of completeness.

Complements ``state/manifest.py::run_stage`` (stage-level all-or-nothing
resume with lineage): use run_stage between pipeline stages, and this
sink for the final user-facing output where per-shard granularity matters
(a 100-TB write that dies at 97% resumes with 3% of the work).

REL parity anchor: REL writes its stores in one shot (REL:src/REL/
db/base.py create); sharded resumable output is the batch-engine
replacement.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


def _shard_dirs(out_dir: str) -> dict[int, str]:
    if not os.path.isdir(out_dir):
        return {}
    out = {}
    for name in os.listdir(out_dir):
        if name.startswith("__shard="):
            out[int(name.split("=", 1)[1])] = os.path.join(out_dir, name)
    return out


def write_partitioned(ds, out_dir: str, *, key_col: str,
                      num_shards: int = 64) -> dict:
    """Write ``ds`` under ``out_dir/__shard=N/`` (N = engine hash of
    ``key_col`` mod num_shards — same-key rows always co-locate).
    Returns {"written": [...], "skipped": [...], "rows_written": n}.
    """
    import numpy as np

    from ..functions.rayutil import _bucket_of

    os.makedirs(out_dir, exist_ok=True)
    # Routing params are part of the on-disk contract: a resume with a
    # different num_shards/key_col would route keys differently while the
    # _done markers still claim completeness -> silent row loss. Persist
    # them on first write, fail loudly on mismatch ever after.
    manifest_path = os.path.join(out_dir, "_sink_manifest.json")
    params = {"num_shards": int(num_shards), "key_col": key_col}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prior = json.load(f)
        if prior != params:
            raise ValueError(
                f"write_partitioned resume mismatch at {out_dir}: sink was "
                f"written with {prior}, resume requested {params}; rerun "
                f"with the original params or use a fresh out_dir")
    else:
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(params, f)
        os.replace(tmp, manifest_path)

    finished, partial = [], []
    for shard, path in _shard_dirs(out_dir).items():
        if os.path.exists(os.path.join(path, "_done.json")):
            finished.append(shard)
        else:
            partial.append(shard)
            shutil.rmtree(path)  # incomplete from a killed run: rewrite

    fin = set(finished)

    def add_shard(t: pa.Table) -> pa.Table:
        sh = np.asarray(_bucket_of(
            t.column(key_col).combine_chunks()
            if isinstance(t.column(key_col), pa.ChunkedArray)
            else t.column(key_col), num_shards))
        t = t.append_column("__shard", pa.array(sh))
        if fin:
            keep = ~np.isin(sh, list(fin))
            t = t.filter(pa.array(keep))
        return t

    pending = ds.map_batches(add_shard, batch_format="pyarrow",
                             zero_copy_batch=True)
    pending.write_parquet(out_dir, partition_cols=["__shard"])

    written, rows_written = [], 0
    for shard, path in _shard_dirs(out_dir).items():
        marker = os.path.join(path, "_done.json")
        if os.path.exists(marker):
            continue
        files = sorted(f for f in os.listdir(path)
                       if f.endswith(".parquet"))
        rows = sum(pq.read_metadata(os.path.join(path, f)).num_rows
                   for f in files)
        size = sum(os.path.getsize(os.path.join(path, f)) for f in files)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"shard": shard, "rows": rows, "bytes": size,
                       "files": files}, f)
        os.replace(tmp, marker)  # atomic: marker ⇒ shard complete
        written.append(shard)
        rows_written += rows
    return {"written": sorted(written), "skipped": sorted(finished),
            "rows_written": rows_written}


def read_partitioned(out_dir: str):
    """Read a write_partitioned output back (drops the __shard column)."""
    import ray.data as rd

    # file_extensions is REQUIRED here: without it the _done.json markers
    # make Ray's default reader silently yield an empty dataset
    ds = rd.read_parquet(out_dir, file_extensions=["parquet"])

    def drop(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in ("__shard",)
                               if c in t.column_names])

    return ds.map_batches(drop, batch_format="pyarrow",
                          zero_copy_batch=True)
