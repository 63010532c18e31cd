"""Command-line entry point: ``python -m rel_ray <command> ...``.

Batch-engine analog of the reference's tooling surface
(REL:src/REL/server.py serving entry + REL:scripts/efficiency_test.py):
instead of an HTTP server, each command reads Parquet, runs a pipeline,
and writes partitioned Parquet.

This module OWNS a Ray session (guarded init) — the only places allowed
to do so besides bench.py and the test fixture.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


_OWNS_SESSION = False


def _ray_up(num_cpus: int | None):
    global _OWNS_SESSION
    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "ignore_reinit_error": True}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(address="local", **kw)
        _OWNS_SESSION = True
    return ray


def _write(ds, out_dir: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    n = ds.count()
    ds.write_parquet(out_dir)
    return n


def cmd_link(args) -> int:
    """transcripts parquet -> clusters (+ edges) parquet."""
    from .config import DEFAULT_CONFIG

    _ray_up(args.num_cpus)
    import ray.data as rd

    t0 = time.perf_counter()
    if args.ckpt:
        from .pipelines.checkpointed import run_linkage_checkpointed

        clusters, lineage = run_linkage_checkpointed(
            args.input, args.ckpt, DEFAULT_CONFIG)
        n = _write(clusters, os.path.join(args.out, "clusters"))
        summary = {"clusters_rows": n,
                   "stages_skipped": [s["stage"] for s in lineage
                                      if s.get("skipped")],
                   "wall_s": round(time.perf_counter() - t0, 3)}
    else:
        from .pipelines.linkage import run_linkage

        res = run_linkage(rd.read_parquet(args.input), DEFAULT_CONFIG)
        n = _write(res["clusters"], os.path.join(args.out, "clusters"))
        summary = {"clusters_rows": n,
                   "wall_s": round(time.perf_counter() - t0, 3)}
        if args.edges:
            summary["edges_rows"] = _write(
                res["edges"], os.path.join(args.out, "edges"))
    print(json.dumps(summary))
    return 0


def cmd_dedup(args) -> int:
    """documents parquet -> (id, cluster/rep) parquet, one of three methods."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    ds = rd.read_parquet(args.input)
    t0 = time.perf_counter()
    if args.method == "exact":
        from .stages.dedup import exact_dedup

        out = exact_dedup(ds, id_col=args.id_col, text_col=args.text_col)
    elif args.method == "minhash":
        if args.ckpt:
            from .pipelines.checkpointed import near_dedup_checkpointed

            out, _lineage = near_dedup_checkpointed(
                args.input, args.ckpt, id_col=args.id_col,
                text_col=args.text_col, threshold=args.threshold)
        else:
            from .config import DEFAULT_CONFIG
            from .stages.dedup import near_dedup_minhash

            out = near_dedup_minhash(ds, id_col=args.id_col,
                                     text_col=args.text_col,
                                     cfg=DEFAULT_CONFIG,
                                     threshold=args.threshold)
    else:
        from .stages.dedup import near_dedup_simhash

        out = near_dedup_simhash(ds, id_col=args.id_col,
                                 text_col=args.text_col,
                                 max_hamming=args.max_hamming)
    n = _write(out, args.out)
    print(json.dumps({"method": args.method, "rows": n,
                      "wall_s": round(time.perf_counter() - t0, 3)}))
    return 0


def cmd_synth(args) -> int:
    """Write the deterministic synthetic corpus (transcripts/labels/gold)."""
    from .synth import write_corpus

    paths = write_corpus(args.out, seed=args.seed, n_convs=args.n_convs)
    print(json.dumps(paths))
    return 0


def cmd_eval(args) -> int:
    """Pairwise F1 of a clusters parquet vs a labels parquet."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from .pipelines.eval import pairwise_f1

    m = pairwise_f1(rd.read_parquet(args.clusters),
                    rd.read_parquet(args.labels), split=args.split)
    print(json.dumps(m))
    return 0


def cmd_query(args) -> int:
    """Run one registered pipeline from the driver registry over an sf dir."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry

    qs = entry.queries()
    if args.name not in qs:
        print("available: " + " ".join(sorted(qs)), file=sys.stderr)
        return 2
    _ray_up(args.num_cpus)
    t0 = time.perf_counter()
    res = qs[args.name](args.sf_dir)
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, (pa.Table, pd.DataFrame)):
        n = len(res)
    else:
        n = res.count()
        if args.out:
            _write(res, args.out)
            res = None
    if args.out and res is not None:
        import pyarrow.parquet as pq

        os.makedirs(args.out, exist_ok=True)
        tab = pa.Table.from_pandas(res) if isinstance(res, pd.DataFrame) else res
        pq.write_table(tab, os.path.join(args.out, "part-0.parquet"))
    print(json.dumps({"query": args.name, "rows": n,
                      "wall_s": round(time.perf_counter() - t0, 3)}))
    return 0


def cmd_profile(args) -> int:
    """Profile a parquet table: per-column stats as one JSON line each."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from rel_ray.stages.profile import profile_table

    ds = rd.read_parquet(args.input)
    cols = (args.columns.split(",") if args.columns
            else [f.name for f in ds.schema().base_schema])
    out = profile_table(ds, columns=cols)
    for row in out.to_pylist():
        print(json.dumps(row))
    return 0


def cmd_diff(args) -> int:
    """Diff two corpus snapshots; prints status counts, optionally writes
    the per-id status table."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from rel_ray.stages.dedup import diff_corpora

    out = diff_corpora(rd.read_parquet(args.old), rd.read_parquet(args.new),
                       id_col=args.id_col, text_col=args.text_col)
    if args.out:
        _write(out, args.out)
        out = rd.read_parquet(args.out)
    counts = {r["status"]: r["count()"] for r in
              out.groupby("status").count().take_all()}
    print(json.dumps({"counts": counts}))
    return 0


def cmd_store(args) -> int:
    """Resolve a transcripts corpus and freeze its entity store
    (mention_norm → cluster_id parquet) — the artifact ``link-one``
    serves requests against."""
    from .config import DEFAULT_CONFIG

    _ray_up(args.num_cpus)
    import ray.data as rd

    from .pipelines.incremental import build_entity_store
    from .pipelines.linkage import run_linkage

    out = run_linkage(rd.read_parquet(args.input), DEFAULT_CONFIG)
    n = _write(build_entity_store(out), args.out)
    print(json.dumps({"store_rows": n, "out": args.out}))
    return 0


def cmd_link_one(args) -> int:
    """Request-level entry — the batch analog of REL's HTTP server
    (REL:src/REL/server.py): ONE conversation in (transcripts-shaped JSON
    lines), cluster assignments out as one JSON line per record on stdout.
    Reuses incremental_link against the frozen store, so repeated requests
    share the broadcast store and never re-resolve the base corpus."""
    from .config import DEFAULT_CONFIG

    _ray_up(args.num_cpus)
    import ray.data as rd

    from .pipelines.incremental import incremental_link
    from .sources.readers import read_transcripts_jsonl

    tr = read_transcripts_jsonl(args.request)
    store = rd.read_parquet(args.store)
    res = incremental_link(tr, store, DEFAULT_CONFIG)
    # request-level output: a single conversation's assignments are tiny
    # by definition — stdout JSON is the serving-response analog
    rows = sorted(res["assignments"].take_all(),
                  key=lambda r: r["record_id"])
    for r in rows:
        print(json.dumps({"record_id": r["record_id"],
                          "cluster_id": r["cluster_id"],
                          "matched_old": bool(r["matched_old"])}))
    print(json.dumps({"n_records": len(rows),
                      "n_matched_old": sum(bool(r["matched_old"])
                                           for r in rows)}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m rel_ray")
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--num-cpus", type=int, default=0,
                        help="ray.init num_cpus (0 = let Ray decide)")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("link", parents=[common],
                       help="record linkage over transcripts parquet")
    s.add_argument("input")
    s.add_argument("out")
    s.add_argument("--ckpt", default=None, help="checkpoint dir (resumable)")
    s.add_argument("--edges", action="store_true", help="also write edges")
    s.set_defaults(fn=cmd_link)

    s = sub.add_parser("dedup", parents=[common], help="document deduplication")
    s.add_argument("input")
    s.add_argument("out")
    s.add_argument("--method", choices=["exact", "minhash", "simhash"],
                   default="minhash")
    s.add_argument("--id-col", default="doc_id")
    s.add_argument("--text-col", default="text")
    s.add_argument("--threshold", type=float, default=0.8)
    s.add_argument("--max-hamming", type=int, default=3)
    s.add_argument("--ckpt", default=None,
                   help="checkpoint dir (minhash only, resumable)")
    s.set_defaults(fn=cmd_dedup)

    s = sub.add_parser("synth", help="write synthetic transcript corpus")
    s.add_argument("out")
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--n-convs", type=int, default=2000)
    s.set_defaults(fn=cmd_synth)

    s = sub.add_parser("eval", parents=[common], help="pairwise F1 of clusters vs labels")
    s.add_argument("clusters")
    s.add_argument("labels")
    s.add_argument("--split", default="test")
    s.set_defaults(fn=cmd_eval)

    s = sub.add_parser("query", parents=[common], help="run a registered driver query")
    s.add_argument("name")
    s.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    s.add_argument("--out", default=None)
    s.set_defaults(fn=cmd_query)

    s = sub.add_parser("profile", parents=[common],
                       help="per-column stats of a parquet table")
    s.add_argument("input")
    s.add_argument("--columns", default=None,
                   help="comma-separated (default: all)")
    s.set_defaults(fn=cmd_profile)

    s = sub.add_parser("store", parents=[common],
                       help="freeze an entity store from transcripts parquet")
    s.add_argument("input")
    s.add_argument("out")
    s.set_defaults(fn=cmd_store)

    s = sub.add_parser("link-one", parents=[common],
                       help="link one conversation (JSONL) against a frozen "
                            "entity store (REL server analog)")
    s.add_argument("request", help="transcripts-shaped JSON-lines file")
    s.add_argument("--store", required=True,
                   help="entity store parquet dir (from the store command)")
    s.set_defaults(fn=cmd_link_one)

    s = sub.add_parser("diff", parents=[common],
                       help="diff two corpus snapshots by id + text")
    s.add_argument("old")
    s.add_argument("new")
    s.add_argument("--id-col", default="doc_id")
    s.add_argument("--text-col", default="text")
    s.add_argument("--out", default=None)
    s.set_defaults(fn=cmd_diff)

    args = p.parse_args(argv)
    rc = args.fn(args)
    if _OWNS_SESSION:
        import ray

        if ray.is_initialized():
            ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
