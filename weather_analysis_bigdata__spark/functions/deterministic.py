"""Order-independent (deterministic) aggregate expressions.

Floating-point SUM/AVG depend on reduction order, so a parallel Spark
aggregate and a DuckDB oracle differ in the last bits — enough to break
an exact value-hash comparison and, worse, enough to make the *engine
itself* non-deterministic run-to-run at 1000-executor scale.

The fix: aggregate in exact DECIMAL arithmetic (associative and
commutative — any partial-aggregation tree yields the same value), then
cast the final result to DOUBLE. Averages divide the exact decimal sum
by the count in one IEEE double division, which is deterministic.

This costs one cast per row on the map side and keeps the whole pipeline
in whole-stage codegen (no UDFs). At 100 TB the partial/final aggregate
shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Cast to exact decimal. Inputs here are money/measure columns with
    ≤`scale` meaningful decimals; the cast is lossless for them.

    Precision 18 is deliberate: Spark's Decimal stays in its compact
    unscaled-Long representation (UnsafeRow inline, fast codegen) up to
    precision 18, and the sum accumulator decimal(28,s) has ample
    headroom. Measured on sf0.1: p=18 aggregates ≈1s, p=30 ≈2.4s, and
    p=14 hits a 70s+ overflow-checking path — do not lower this."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.DecimalType(precision, scale))


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM(double) → exact decimal sum, as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG(double): exact decimal sum / count, divided
    once in IEEE double arithmetic (deterministic on both engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


# ---- SQL mirrors (ANSI strings for the DuckDB oracle) ----------------


def sql_dec(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"CAST({expr} AS DECIMAL({precision},{scale}))"


def sql_dec2dbl(expr: str) -> str:
    """Correctly-rounded DECIMAL→DOUBLE for the DuckDB oracle.

    DuckDB's direct ``CAST(dec AS DOUBLE)`` converts the stored
    int64/int128 unscaled value to double and THEN divides by 10^scale
    — two roundings, which diverges from the correctly rounded value
    (and from Spark's BigDecimal.doubleValue, which is single-rounded)
    once the unscaled magnitude exceeds 2^53. Measured at sf0.1:
    SUM(l_extendedprice²) = 2224071148386123.1690 → direct cast gives
    …123.0, correct rounding gives …123.2 (the a8_pearson_corr
    last-ulp mismatch). The VARCHAR round-trip forces DuckDB through
    its correctly rounded string→double path, bit-matching Spark at
    every magnitude."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, scale: int = 2) -> str:
    return sql_dec2dbl(f"SUM({sql_dec(expr, scale)})")


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"
