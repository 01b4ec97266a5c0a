"""Query registry: the contract between the engine and the driver.

Each :class:`Query` pairs a PySpark builder ``fn(spark, sf_dir) ->
DataFrame`` with an equivalent ANSI-SQL string the DuckDB oracle runs on
the same parquet tables. Registration order is preserved; names are
unique. ``__spark_entry__.py`` exposes this registry verbatim.

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash matches bit-for-bit):

- Aggregates over doubles are computed as exact DECIMAL sums cast back to
  DOUBLE (order-independent), or as min/max/count (naturally exact) —
  never as a bare floating SUM/AVG whose value depends on reduction order.
- Any LIMIT/top-k is fully tie-broken by a unique key.
- All computed columns are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_queries() -> dict[str, Query]:
    """Import all query modules and return the full registry."""
    # Imports are deferred so the registry module itself stays light.
    import weather_analysis_bigdata__spark.queries_reference  # noqa: F401
    import weather_analysis_bigdata__spark.queries_relational  # noqa: F401
    import weather_analysis_bigdata__spark.queries_llmops  # noqa: F401
    import weather_analysis_bigdata__spark.queries_streaming  # noqa: F401
    import weather_analysis_bigdata__spark.queries_pipeline  # noqa: F401
    import weather_analysis_bigdata__spark.queries_tpch  # noqa: F401
    import weather_analysis_bigdata__spark.queries_datapipe  # noqa: F401
    import weather_analysis_bigdata__spark.queries_profiling  # noqa: F401
    import weather_analysis_bigdata__spark.queries_ops  # noqa: F401

    return dict(_REGISTRY)
