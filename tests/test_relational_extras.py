"""Error-bound tests for sketch aggregates (no SQL oracle by design)."""

from __future__ import annotations


def test_sketch_aggs_error_bounds(spark, sf_dir):
    from weather_analysis_bigdata__spark.registry import all_queries

    rows = all_queries()["sketch_approx_aggs"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_parts - r.exact_parts) <= 0.05 * r.exact_parts + 2
        # t-digest p50 within 2% of the exact median (relative to median)
        assert abs(r.approx_p50 - r.exact_p50) <= 0.02 * abs(r.exact_p50)
