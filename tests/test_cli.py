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
