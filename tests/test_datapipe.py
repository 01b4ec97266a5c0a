"""Operator-level invariants for queries_datapipe / the new operators.

The oracle harness proves value parity at sf0.01; these tests pin the
properties that parity alone can't see: partitioning-invariance of the
two-pass heavy-hitter scheme, PageRank mass conservation, and the
repetition filter's row-local plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.functions.textops import tokens
from weather_analysis_bigdata__spark.operators.heavyhitters import (
    frequent_tokens,
    mg_candidates,
)
from weather_analysis_bigdata__spark.operators.pagerank import (
    SCALE,
    pagerank_fixed_point,
)
from weather_analysis_bigdata__spark.sources.files import load_table


def _tok_df(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(F.explode(tokens("text")).alias("token"))


def test_heavy_hitters_partitioning_invariant(spark, sf_dir):
    """MG candidate sets differ across partitionings; the exact final
    answer must not."""
    tok = _tok_df(spark, sf_dir)
    a = {
        (r.token, r.cnt)
        for r in frequent_tokens(tok.repartition(2), "token", k=30).collect()
    }
    b = {
        (r.token, r.cnt)
        for r in frequent_tokens(tok.repartition(17), "token", k=30).collect()
    }
    assert a == b
    assert len(a) > 0


def test_mg_candidates_are_superset(spark, sf_dir):
    """Every true heavy hitter must appear among the MG candidates —
    the guarantee the exact recount relies on."""
    k = 30
    tok = _tok_df(spark, sf_dir).repartition(5)
    n = tok.count()
    truth = {
        r.token
        for r in tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * k > F.lit(n))
        .collect()
    }
    cands = {r.token for r in mg_candidates(tok, "token", k).collect()}
    assert truth <= cands


def test_mg_state_is_bounded(spark, sf_dir):
    """Each partition emits at most k-1 candidates (bounded memory)."""
    k = 10
    tok = _tok_df(spark, sf_dir).repartition(4)
    per_part = (
        mg_candidates(tok, "token", k)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r.n <= k - 1 for r in per_part)


def test_pagerank_mass_and_determinism(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = {r.node: r.rank_scaled for r in pagerank_fixed_point(edges, 3).collect()}
    # Exact fixed-point: a second run (different partitioning) is identical.
    ranks2 = {
        r.node: r.rank_scaled
        for r in pagerank_fixed_point(edges.repartition(7), 3).collect()
    }
    assert ranks == ranks2
    total = sum(ranks.values())
    # Mass ≈ SCALE: floor truncation only loses < 1 unit per edge per
    # superstep, and this graph has no dangling nodes.
    assert 0.97 * SCALE < total <= SCALE
    assert all(v > 0 for v in ranks.values())


def test_repetition_filter_is_shuffle_free(spark, sf_dir):
    from weather_analysis_bigdata__spark.queries_datapipe import (
        repetition_topgram_filter,
    )

    df = repetition_topgram_filter(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
