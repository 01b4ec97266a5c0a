"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``weather_analysis_bigdata__spark``; this module
just adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weather_analysis_bigdata__spark.registry import all_queries
from weather_analysis_bigdata__spark.session import configure_for_oracle_parity


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_for_oracle_parity(spark)
    from weather_analysis_bigdata__spark.queries_reference import a1_group_multi_avg

    return a1_group_multi_avg(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_for_oracle_parity(spark)
        return fn(spark, sf_dir)

    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """ANSI SQL oracle for each query (DuckDB dialect-compatible)."""
    return {
        name: q.oracle_text()
        for name, q in all_queries().items()
        if q.oracle is not None
    }
