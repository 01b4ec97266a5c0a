"""Vector (embedding) expressions: exact dot product, norm, cosine.

Embeddings are ``array<float>`` columns. A float dot product summed in
parallel is order-dependent in the last bits, and even an exact DECIMAL
sum diverges between engines at the final decimal→double cast (DuckDB
converts via hugeint × 10^-scale — two roundings, 10^-18 is inexact;
Spark's BigDecimal.doubleValue rounds once: measured 1-ulp cosine
drift). The portable exact form used here:

1. quantize each element float → double → DECIMAL(18,9) (both engines
   round the binary double identically — verified bit-exact),
2. scale to integers: xi = x·10^9 (exact, the decimal is integral),
3. dot = Σ xi·yi — every product < 10^18 fits a 64-bit long; the sum
   accumulates exactly (DECIMAL(38,0) on Spark, HUGEINT via list_sum on
   DuckDB),
4. one correctly-rounded integer→double cast, then divide by 1e18
   (exactly representable: 10^18 = 2^18·5^18, 5^18 < 2^53).

Result: bit-identical on Spark and DuckDB, and — the property that
matters at 1000-executor scale — independent of partitioning and
reduction order. All expressions are higher-order functions
(``zip_with``/``aggregate``) — JVM-side codegen, no UDFs, no explode:
a 64-dim dot product is one expression per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ELEM = T.DecimalType(18, 9)
_ACC = T.DecimalType(38, 0)
_SCALE = 1_000_000_000  # 10^9 per element → 10^18 per product
_SCALE_SQ = float(_SCALE) ** 2


def scaled_vec(col: Column | str) -> Column:
    """array<float> → array<long>: each element quantized to DECIMAL(18,9)
    and scaled by 10^9 (exact integer representation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: (x.cast("double").cast(_ELEM) * F.lit(_SCALE)).cast("long")
    )


def dot(a: Column, b: Column) -> Column:
    """Exact dot product of two scaled-int vectors → double.

    The exact sum is narrowed to a 64-bit long before the double cast:
    DuckDB's HUGEINT→DOUBLE conversion is off by 1 ulp for some negative
    values (measured), while BIGINT→DOUBLE rounds correctly on both
    engines. |Σ xi·yi| ≤ ‖a‖‖b‖·10^18 — fits 64 bits whenever the norm
    product is < 9.2 (embeddings are unit-norm; ample margin)."""
    prod = F.zip_with(a, b, lambda x, y: (x * y).cast(_ACC))
    s = F.aggregate(prod, F.lit(0).cast(_ACC), lambda acc, x: (acc + x).cast(_ACC))
    return s.cast("long").cast("double") / F.lit(_SCALE_SQ)


def norm(a: Column) -> Column:
    """Euclidean norm from the exact self-dot → double."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine similarity with precomputed norms (norms are computed once
    per vector, not once per pair — at N vectors × K candidates that's
    O(N·d) instead of O(N·K·d))."""
    return dot(a, b) / (norm_a * norm_b)


# ---- SQL mirrors (DuckDB list lambdas) --------------------------------

#: Element → scaled BIGINT (mirror of scaled_vec's per-element transform).
def _sql_ielem(x: str) -> str:
    return (
        f"CAST(CAST(CAST({x} AS DOUBLE) AS DECIMAL(18,9)) * {_SCALE} AS BIGINT)"
    )


def sql_dot(a: str, b: str) -> str:
    """DuckDB: exact dot of two FLOAT[] columns → DOUBLE. list_sum over
    BIGINT promotes to HUGEINT (exact); the BIGINT narrowing before the
    double cast mirrors :func:`dot` (HUGEINT→DOUBLE misrounds negatives)."""
    term = f"{_sql_ielem(f'{a}[i]')} * {_sql_ielem(f'{b}[i]')}"
    return (
        f"(CAST(CAST(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> {term})) AS BIGINT) AS DOUBLE) / {_SCALE_SQ!r})"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"
