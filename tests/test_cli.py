"""CLI entry point (`python -m rel_ray`) — in-process, reusing the session Ray.

Reference tooling analog: REL exposes a server entry + efficiency script
(REL:src/REL/server.py, REL:scripts/efficiency_test.py); the batch engine's
equivalent surface is this CLI.
"""

import json
import os

import pyarrow.parquet as pq

from rel_ray.__main__ import main


def test_cli_synth_then_link_then_eval(ray_session, tmp_path, capsys):
    corpus = str(tmp_path / "corpus")
    assert main(["synth", corpus, "--n-convs", "80", "--seed", "7"]) == 0
    paths = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(paths["transcripts"])

    out = str(tmp_path / "linked")
    assert main(["link", paths["transcripts"], out, "--edges"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["clusters_rows"] > 0

    tab = pq.read_table(os.path.join(out, "clusters"))
    assert {"record_id", "cluster_id"} <= set(tab.column_names)
    # every record exactly once
    assert tab.column("record_id").to_pandas().is_unique

    assert main(["eval", os.path.join(out, "clusters"),
                 paths["labels"]]) == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["f1"] >= 0.99


def test_cli_dedup_exact(ray_session, tmp_path, capsys):
    sf = os.environ.get("GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")
    out = str(tmp_path / "dedup")
    assert main(["dedup", os.path.join(sf, "documents.parquet"), out,
                 "--method", "exact"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] > 0


def test_cli_unknown_query_lists_available(ray_session, capsys):
    assert main(["query", "definitely_not_a_query"]) == 2
    err = capsys.readouterr().err
    assert "lineitem_agg" in err


def test_cli_profile_and_diff(ray_session, tmp_path, capsys):
    import json

    rc = main(["profile", "/root/testdata/sf0.001/nation.parquet",
               "--columns", "n_nationkey,n_name"])
    assert rc == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["column"] == "n_nationkey"
    assert lines[0]["min"] == "0" and lines[0]["n_distinct"] == 25

    rc = main(["diff", "/root/testdata/sf0.001/documents.parquet",
               "/root/testdata/sf0.001/documents.parquet"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert list(out["counts"]) == ["unchanged"]


def test_check_oracle_survives_injected_crash(tmp_path):
    # round-2 flake: a Ray-internal CHECK abort killed a 95-query sweep.
    # The parent/child split must resume past a hard child crash and
    # retry the in-flight query once in a fresh session.
    import os
    import subprocess
    import sys

    marker = str(tmp_path / "crashed_once")
    env = dict(os.environ,
               CHECK_ORACLE_INJECT_CRASH="top_customers",
               CHECK_ORACLE_INJECT_MARKER=marker)
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/check_oracle.py",
         "/root/testdata/sf0.001", "top_customers", "customers_per_nation"],
        capture_output=True, text=True, env=env, timeout=600)
    assert os.path.exists(marker)  # the injected crash actually fired
    assert "RETRY top_customers" in proc.stdout
    assert "2 pass, 0 fail" in proc.stdout
    assert proc.returncode == 0


def test_cli_store_then_link_one(ray_session, tmp_path, capsys):
    """REL server analog: freeze an entity store, then serve a single
    conversation as a JSONL request — shared surface forms attach to
    existing clusters (matched_old)."""
    corpus = str(tmp_path / "corpus")
    assert main(["synth", corpus, "--n-convs", "60", "--seed", "11"]) == 0
    paths = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    store = str(tmp_path / "store")
    assert main(["store", paths["transcripts"], store]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["store_rows"] > 0

    # request: the first conversation of the SAME corpus re-sent as JSONL
    # (every surface form already exists in the store -> all matched_old)
    tab = pq.read_table(paths["transcripts"])
    conv0 = tab.column("conv_id")[0].as_py()
    req = tab.filter(
        __import__("pyarrow.compute", fromlist=["equal"]).equal(
            tab.column("conv_id"), conv0))
    req_path = str(tmp_path / "request.jsonl")
    with open(req_path, "w") as f:
        for r in req.to_pylist():
            r["ts"] = r["ts"].strftime("%Y-%m-%dT%H:%M:%S")
            f.write(json.dumps(r) + "\n")

    assert main(["link-one", req_path, "--store", store]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    tail = lines[-1]
    assert tail["n_records"] == len(lines) - 1 > 0
    assert tail["n_matched_old"] == tail["n_records"]
    assert all("cluster_id" in r for r in lines[:-1])
