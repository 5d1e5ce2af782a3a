"""The worked corpus-pipeline example must run end-to-end and shrink
the corpus monotonically through its filter stages."""

from __future__ import annotations

import sys


def test_corpus_pipeline_example_runs(spark, sf_small, tmp_path):
    sys.path.insert(0, "/root/repo/examples")
    try:
        from corpus_pipeline import run
    finally:
        sys.path.pop(0)

    out = run(spark, sf_small, str(tmp_path / "shards"))
    c = out["counts"]
    # every filter stage can only shrink the corpus
    assert (
        c["input"]
        > c["after_url_hygiene"]
        >= c["after_quality"]
        > c["after_perplexity"]
        >= c["after_exact_dedup"]
        >= c["after_near_dedup"]
        >= c["after_decontamination"]
        >= c["after_mixing"]
        >= c["after_budget"]
        == c["final_docs"]
        > 0
    )
    assert c["total_pieces"] > 0 and c["final_tokens"] > 0
    assert c["shards"] >= 1
    # the topic-balance report covers every doc alive at that stage
    assert sum(c["topic_clusters"].values()) == c["after_decontamination"]
    m = out["manifest"]
    assert m["n_docs"] == c["final_docs"]
    assert sum(s["n_docs"] for s in m["shards"]) == m["n_docs"]


def test_causal_screening_example_runs(spark):
    """The EDM screening walkthrough must run end-to-end, screen out the
    uncoupled pair before the expensive stages, and recover the true
    directed couplings in its edge list."""
    sys.path.insert(0, "/root/repo/examples")
    try:
        from causal_screening import run
    finally:
        sys.path.pop(0)

    out = run(spark)
    # the echoed sensor (6, a scaled copy of 0) is dropped before any
    # EDM stage runs
    assert out["dropped_echo_sensors"] == [6]
    assert set(out["embedding"]) == set(range(6))
    assert set(out["survivors"]) <= set(range(6))
    # the screening keeps the coupled systems' members
    assert {0, 1, 2, 3} <= set(out["survivors"])
    drivers = {(d, r) for d, r, _ in out["edges"]}
    assert (0, 1) in drivers and (2, 3) in drivers
