"""Invariant tests for the profiling / mergeable-aggregation operators
(queries_profiling.py). Cross-engine value equality is covered by the
DuckDB oracle gate; these pin the properties the oracle cannot see."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_estimate_bound_and_merge(spark, sf_dir):
    """The merged-sketch estimate must sit within the pinned 5% bound
    (the oracle only checks the boolean; here we check it is True for
    every group, i.e. the bound is actually achieved, not vacuous)."""
    from weather_analysis_bigdata__spark.queries_profiling import (
        hll_sketch_partition_merge,
    )

    rows = hll_sketch_partition_merge(spark, sf_dir).collect()
    assert rows and all(r.est_within_5pct for r in rows)
    assert all(r.n_shards >= 1 for r in rows)


def test_gini_bounds_and_partition_invariance(spark, sf_dir):
    """Gini ∈ [0, 1); all-distinct docs → gini = 1 - 1/N; result is
    invariant under repartitioning (row-local computation)."""
    from weather_analysis_bigdata__spark.queries_profiling import (
        token_gini_diversity,
    )

    df = token_gini_diversity(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.n_types <= r.n_tokens
        if r.n_types == r.n_tokens:  # all tokens distinct
            assert abs(r.gini - (1 - 1 / r.n_tokens)) < 1e-12
    a = {(r.doc_id, r.gini) for r in rows}
    b = {
        (r.doc_id, r.gini)
        for r in token_gini_diversity(spark, sf_dir)
        .repartition(17)
        .collect()
    }
    assert a == b


def test_winsorized_stats_ordering(spark, sf_dir):
    """p01 ≤ winsorized_mean ≤ p99, MAD ≥ 0, and the winsorized mean of
    a clamped column can never exceed the plain max."""
    from weather_analysis_bigdata__spark.queries_profiling import (
        winsorized_robust_stats,
    )

    rows = winsorized_robust_stats(spark, sf_dir).collect()
    assert len(rows) == 3  # A / N / R
    for r in rows:
        assert r.p01 <= r.winsorized_mean <= r.p99
        assert r.mad >= 0
        assert r.n_rows > 0


def test_partial_reagg_matches_direct(spark, sf_dir):
    """Merge-of-partials ≡ direct aggregation (the algebraic-merge
    contract), checked in-engine at a different SF than the oracle."""
    from weather_analysis_bigdata__spark.queries_profiling import (
        partial_reagg_monthly,
    )
    from weather_analysis_bigdata__spark.functions.deterministic import dec
    from weather_analysis_bigdata__spark.sources.files import load_table

    merged = {
        (r.event_type, r.month): (r.n_events, r.total_value, r.min_value, r.max_value)
        for r in partial_reagg_monthly(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    direct = {
        (r.event_type, r.month): (r.n, r.tv, r.mn, r.mx)
        for r in ev.groupBy(
            "event_type", F.date_trunc("month", "ts").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("tv"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert merged == direct


def test_table_profile_one_scan(spark, sf_dir):
    """The wide profile aggregate must come from a single scan of
    lineitem (one parquet scan node in the physical plan)."""
    from weather_analysis_bigdata__spark.queries_profiling import (
        table_profile_stats,
    )

    df = table_profile_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    rows = {r.column_name: r for r in df.collect()}
    assert set(rows) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
    }
    assert all(r.n_nulls == 0 for r in rows.values())
    assert rows["l_returnflag"].n_distinct == 3
