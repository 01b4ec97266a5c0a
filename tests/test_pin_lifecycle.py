"""Reliable-mode pin lifecycle (round-10 advice): iterative operators
re-pin per superstep; in ``SPARK_GRAFT_PIN_MODE=reliable`` each pin is
a CacheManager persist entry, so superseded pins must be released or
a loop holds one DISK_ONLY dataset per iteration. These tests run the
iterative operators under reliable mode and assert (a) results equal
local mode and (b) the persistent-RDD census grows by at most the
FINAL pin, not one per superstep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


@pytest.fixture()
def chain_edges(spark):
    # 3 chains of 40 nodes each → 3 components, enough supersteps to
    # leak visibly (min-label propagation needs ~log2(40) rounds)
    rows = [
        (c * 1000 + i, c * 1000 + i + 1)
        for c in range(3)
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "u long, v long")


def test_reliable_cc_releases_superseded_pins(spark, chain_edges, monkeypatch):
    from weather_analysis_bigdata__spark.operators.components import (
        connected_components,
    )

    local = {
        (r.node, r.comp) for r in connected_components(chain_edges).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "reliable")
    before = _n_persistent(spark)
    out = connected_components(chain_edges)
    got = {(r.node, r.comp) for r in out.collect()}
    leaked = _n_persistent(spark) - before
    out.unpersist()
    assert got == local
    # the final labels pin is legitimately alive; every superseded
    # superstep pin must have been unpin()'d
    assert leaked <= 1, f"{leaked} persisted datasets left by the CC loop"


def test_reliable_pagerank_releases_superseded_pins(
    spark, chain_edges, monkeypatch
):
    from weather_analysis_bigdata__spark.operators.pagerank import (
        pagerank_fixed_point,
    )

    edges = chain_edges.select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        F.lit(1).cast("long").alias("w"),
    )
    local = {
        (r.node, r.rank_scaled)
        for r in pagerank_fixed_point(edges, iters=6).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "reliable")
    before = _n_persistent(spark)
    out = pagerank_fixed_point(edges, iters=6)
    got = {(r.node, r.rank_scaled) for r in out.collect()}
    leaked = _n_persistent(spark) - before
    out.unpersist()
    assert got == local
    # e + nodes + final ranks stay pinned (e/nodes feed every
    # iteration); the 6 superseded rank pins must be gone
    assert leaked <= 3, f"{leaked} persisted datasets left by pagerank"


def test_reliable_bpe_releases_superseded_pins(spark, monkeypatch):
    from weather_analysis_bigdata__spark.operators.bpe import train_bpe_merges

    docs = spark.createDataFrame(
        [(i, "the quick brown fox " * 3 + f"tail{i % 4}") for i in range(60)],
        "doc_id long, text string",
    )
    local = train_bpe_merges(docs, n_merges=6)
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "reliable")
    before = _n_persistent(spark)
    got = train_bpe_merges(docs, n_merges=6)
    leaked = _n_persistent(spark) - before
    assert got == local
    # only the final symbol state may remain pinned (words + every
    # superseded state released)
    assert leaked <= 1, f"{leaked} persisted datasets left by BPE train"
