"""M7: checkpoint / resume with per-partition lineage manifests.

north_rule: "resumable from checkpoint with per-partition lineage + metrics".
REL has no equivalent (a crashed run restarts, SURVEY §4.1) — this layer is
new design:

  * every checkpointed stage writes partitioned Parquet under
    ``<ckpt_dir>/<stage>/`` plus a ``_manifest.json`` carrying the stage
    fingerprint = sha256(config fingerprint, stage name, upstream
    fingerprints, code version) and row counters;
  * on resume, a stage whose manifest fingerprint matches is READ BACK from
    Parquet instead of recomputed — stale checkpoints (config/code/upstream
    changed) are detected by fingerprint mismatch and recomputed
    (SURVEY §7 hard-list #3: the fingerprint covers config + code + lineage);
  * counters (rows in/out, wall seconds) are lineage *data*, not logs.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass

# bump when stage semantics change — part of every fingerprint
CODE_VERSION = "1"


@dataclass
class StageResult:
    dataset: object          # ray.data.Dataset
    fingerprint: str
    resumed: bool
    rows: int
    wall_s: float


class CheckpointContext:
    """Carries the checkpoint dir + accumulated lineage for one pipeline run."""

    def __init__(self, ckpt_dir: str | None, cfg_fingerprint: str):
        self.ckpt_dir = ckpt_dir
        self.cfg_fingerprint = cfg_fingerprint
        self.lineage: list[dict] = []

    def stage_fingerprint(self, stage: str, upstream: list[str]) -> str:
        blob = json.dumps({
            "cfg": self.cfg_fingerprint,
            "stage": stage,
            "upstream": upstream,
            "code": CODE_VERSION,
        }, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:20]

    def run_stage(self, stage: str, upstream: list[str], build_fn) -> StageResult:
        """Execute (or resume) one checkpointed stage.

        build_fn: () -> ray.data.Dataset (lazy). When a valid checkpoint
        exists the dataset is read from Parquet and build_fn never runs.
        """
        import ray.data as rd

        fp = self.stage_fingerprint(stage, upstream)
        t0 = time.time()

        if self.ckpt_dir is None:
            ds = build_fn().materialize()
            rows = ds.count()
            rec = {"stage": stage, "fingerprint": fp, "resumed": False,
                   "rows": rows, "wall_s": round(time.time() - t0, 3),
                   "path": None}
            self.lineage.append(rec)
            return StageResult(ds, fp, False, rows, rec["wall_s"])

        stage_dir = os.path.join(self.ckpt_dir, stage)
        man_path = os.path.join(stage_dir, "_manifest.json")

        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            if man.get("fingerprint") == fp:
                ds = rd.read_parquet(man["data_dir"])
                rec = {"stage": stage, "fingerprint": fp, "resumed": True,
                       "rows": man["rows"], "wall_s": round(time.time() - t0, 3),
                       "path": man["data_dir"]}
                self.lineage.append(rec)
                return StageResult(ds, fp, True, man["rows"], rec["wall_s"])
            # stale checkpoint (config/code/upstream changed): recompute

        data_dir = os.path.join(stage_dir, "data")
        ds = build_fn()
        os.makedirs(stage_dir, exist_ok=True)
        # clear any stale partition files before rewriting
        if os.path.isdir(data_dir):
            import shutil
            shutil.rmtree(data_dir)
        ds.write_parquet(data_dir)
        if not os.path.isdir(data_dir) or not os.listdir(data_dir):
            # empty dataset: write_parquet emits no files — persist an
            # explicit zero-row file so resume reads get the right schema
            # instead of FileNotFoundError
            import pyarrow.parquet as _pq

            os.makedirs(data_dir, exist_ok=True)
            schema = ds.schema()
            base = getattr(schema, "base_schema", schema)
            _pq.write_table(base.empty_table(),
                            os.path.join(data_dir, "empty.parquet"))
        out = rd.read_parquet(data_dir)
        rows = out.count()
        # per-partition lineage: one entry per written parquet file
        partitions = []
        for name in sorted(os.listdir(data_dir)):
            p = os.path.join(data_dir, name)
            try:
                import pyarrow.parquet as pq
                nrows = pq.read_metadata(p).num_rows
            except Exception:
                nrows = -1
            partitions.append({"file": name, "bytes": os.path.getsize(p),
                               "rows": nrows})
        man = {"stage": stage, "fingerprint": fp, "rows": rows,
               "data_dir": data_dir, "cfg": self.cfg_fingerprint,
               "upstream": upstream, "code": CODE_VERSION,
               "wall_s": round(time.time() - t0, 3),
               "partitions": partitions}
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, man_path)  # atomic: a killed run never leaves a valid
        # manifest pointing at partial data
        rec = {**man, "resumed": False, "path": data_dir}
        self.lineage.append(rec)
        return StageResult(out, fp, False, rows, man["wall_s"])

    def write_lineage(self) -> str | None:
        if self.ckpt_dir is None:
            return None
        path = os.path.join(self.ckpt_dir, "_lineage.json")
        with open(path, "w") as f:
            json.dump(self.lineage, f, indent=1)
        return path
