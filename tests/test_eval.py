"""Threshold calibration + pairwise-F1 harness tests."""

import pyarrow as pa
import pytest

import ray.data as rd

from rel_ray.config import DEFAULT_CONFIG
from rel_ray.pipelines.eval import fit_threshold, pairwise_f1
from rel_ray.pipelines.linkage import run_linkage


@pytest.fixture(scope="module")
def linkage(ray_session, tiny_corpus):
    tr = rd.from_arrow(tiny_corpus["transcripts"])
    out = run_linkage(tr, DEFAULT_CONFIG, num_partitions=2)
    return {
        "records": out["records"],
        "edges": out["edges"].materialize(),
        "clusters": out["clusters"].materialize(),
    }


def test_fit_threshold_with_rep_mapping(linkage, tiny_corpus):
    labels = rd.from_arrow(tiny_corpus["labels"])
    fit = fit_threshold(linkage["edges"], labels, linkage["records"],
                        split="calib")
    # a sane calibration: high F1 on calib, threshold inside the sweep range
    assert fit["f1"] > 0.95, fit
    assert 0.2 <= fit["threshold"] <= 0.9
    # the shipped default threshold must be compatible with the calibrated one
    assert abs(fit["threshold"] - DEFAULT_CONFIG.threshold) < 0.35


def test_pairwise_f1_splits_differ(linkage, tiny_corpus):
    labels = rd.from_arrow(tiny_corpus["labels"])
    test = pairwise_f1(linkage["clusters"], labels, split="test",
                       num_partitions=2)
    calib = pairwise_f1(linkage["clusters"], labels, split="calib",
                        num_partitions=2)
    assert test["n_pairs"] > 0 and calib["n_pairs"] > 0
    assert test["n_pairs"] != calib["n_pairs"]
    assert test["f1"] >= 0.99
