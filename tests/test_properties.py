"""Property-based tests (hypothesis) for the engine's core invariants:
order/partitioning-independence of the deterministic aggregates, n-gram
construction correctness, and Silver imputation totality.

Each example spins a small Spark job, so example counts are kept low —
the properties are about structural invariants, not fuzzing volume.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

money = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)

# Each example runs Spark jobs (~seconds); keep counts small — these
# verify structural invariants, not fuzz coverage.
SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(values=st.lists(money, min_size=1, max_size=60))
@SET
def test_dsum_is_partitioning_invariant_and_exact(spark, values):
    from weather_analysis_bigdata__spark.functions.deterministic import dsum

    floats = [float(v) for v in values]
    exact = float(sum(Decimal(f"{v:.2f}") for v in floats))
    results = set()
    for n_part in (1, 3, 7):
        df = spark.createDataFrame(
            [(v,) for v in floats], "x double"
        ).repartition(n_part)
        got = df.agg(dsum("x").alias("s")).first().s
        results.add(got)
    assert results == {exact}


@given(tokens=st.lists(st.text(alphabet="abcdez", min_size=1, max_size=5),
                       min_size=0, max_size=12))
@SET
def test_word_ngrams_matches_python_reference(spark, tokens):
    from weather_analysis_bigdata__spark.functions.textops import word_ngrams

    expected = [" ".join(tokens[i:i + 3]) for i in range(max(0, len(tokens) - 2))]
    df = spark.createDataFrame([(tokens,)], "toks array<string>")
    got = df.select(word_ngrams(F.col("toks")).alias("g")).first().g
    assert got == expected


@given(
    tmin=st.one_of(st.none(), st.floats(-30, 20)),
    tmax=st.one_of(st.none(), st.floats(-10, 45)),
    tavg=st.one_of(st.none(), st.floats(-20, 30)),
    wind=st.one_of(st.none(), st.floats(0, 40)),
)
@SET
def test_silver_imputation_total_and_correct(spark, tmin, tmax, tavg, wind):
    """One-row pipeline: Silver must never emit nulls in imputed columns,
    and the avg-temperature repair must follow keep | (min+max)/2 | 0."""
    from weather_analysis_bigdata__spark.pipeline.schemas import (
        STATION_SCHEMA,
        WEATHER_WIDE_SCHEMA,
    )
    from weather_analysis_bigdata__spark.pipeline.silver import build_silver

    row = (
        "2024-03-01T00:00:00", "GHCND:TEST", 40.0, -70.0,
        None, None, None, tmax, tmin, tavg, wind, None, None, None,
    )
    bronze = spark.createDataFrame([row], WEATHER_WIDE_SCHEMA)
    dim = spark.createDataFrame(
        [("GHCND:TEST", "TEST STATION", 40.0, -70.0)], STATION_SCHEMA
    )
    out = build_silver(bronze, dim).first()
    assert out.avg_wind_speed is not None
    assert out.wind_direction_2min is not None
    assert out.fastest_2min_wind == 0.0
    assert out.weather_type_1 == "0"
    assert out.avg_temperature_rounded is not None
    if tavg is not None:
        assert out.avg_temperature_rounded == pytest.approx(round(tavg, 2), abs=1e-9)
    elif tmin is not None and tmax is not None:
        assert out.avg_temperature_rounded == pytest.approx(
            round((tmin + tmax) / 2, 2), abs=1e-9
        )
    else:
        assert out.avg_temperature_rounded == 0.0
    if wind is not None:
        assert out.avg_wind_speed == pytest.approx(wind)
    else:
        assert out.avg_wind_speed == 0.0  # whole group null → 0
