"""Bronze → Silver → Gold pipeline tests over the NOAA-shaped fixture
(SURVEY.md §5: unit + golden + property suites)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.fixtures import (
    DATATYPES,
    ROGUE_DATATYPE,
    STATIONS,
    noaa_long_rows,
    station_dim_rows,
)


@pytest.fixture(scope="module")
def long_df(spark):
    from weather_analysis_bigdata__spark.pipeline.schemas import NOAA_LONG_SCHEMA

    return spark.createDataFrame(noaa_long_rows(), NOAA_LONG_SCHEMA).cache()


@pytest.fixture(scope="module")
def station_dim(spark):
    from weather_analysis_bigdata__spark.pipeline.schemas import STATION_SCHEMA

    return spark.createDataFrame(station_dim_rows(), STATION_SCHEMA)


@pytest.fixture(scope="module")
def bronze(long_df):
    from weather_analysis_bigdata__spark.pipeline.bronze import build_bronze

    return build_bronze(long_df).cache()


@pytest.fixture(scope="module")
def silver(bronze, station_dim):
    from weather_analysis_bigdata__spark.pipeline.silver import build_silver

    return build_silver(bronze, station_dim).cache()


# ---------------------------------------------------------------- Bronze

def test_bronze_one_row_per_date_station(bronze):
    assert bronze.count() == bronze.select("date", "station").distinct().count()


def test_bronze_whitelist_filters_rogue_datatype(bronze):
    from weather_analysis_bigdata__spark.pipeline.schemas import COLUMNS_MAPPING

    expected = {"date", "station", "latitude", "longitude", *COLUMNS_MAPPING.values()}
    assert set(bronze.columns) == expected
    assert ROGUE_DATATYPE not in bronze.columns


def test_bronze_last_write_wins_on_duplicate_measurements(spark, bronze):
    """Duplicated TMAX measurements carry +100 at a higher seq — the
    pivot must keep the later (larger) value."""
    from tests.fixtures import _h, _value

    rows = {(r.date, r.station): r for r in bronze.collect()}
    checked = 0
    for sid, _n, _la, _lo in STATIONS:
        for year in (2023, 2024):
            for day in range(40):
                if _h(sid, year, day) % 7 == 0:
                    month, dom = day // 28 + 1, day % 28 + 1
                    date = f"{year}-{month:02d}-{dom:02d}T00:00:00"
                    got = rows[(date, sid)].max_temperature
                    assert got == pytest.approx(_value(sid, day, "TMAX") + 100.0)
                    checked += 1
    assert checked > 10


def test_bronze_dedup_idempotent(long_df, bronze):
    from weather_analysis_bigdata__spark.pipeline.bronze import build_bronze

    assert build_bronze(long_df).count() == bronze.count()


def test_bronze_types_match_declared_schema(bronze):
    types = dict(bronze.dtypes)
    assert types["wind_direction_2min"] == "int"
    assert types["weather_type_1"] == "string"
    assert types["max_temperature"] == "double"


# ---------------------------------------------------------------- Silver

def test_silver_column_contract(silver):
    from weather_analysis_bigdata__spark.pipeline.schemas import SILVER_COLUMNS

    assert tuple(silver.columns) == SILVER_COLUMNS


def test_silver_no_nulls_escape_imputed_columns(silver):
    for col in (
        "avg_wind_speed",
        "wind_direction_2min",
        "fastest_2min_wind",
        "weather_type_1",
        "avg_temperature_rounded",
        "year",
        "Date_1",
        "latitude",
        "longitude",
    ):
        assert silver.filter(F.col(col).isNull()).count() == 0, col


def test_silver_wind_impute_group_mean_then_zero(silver):
    """Station 0 reported no wind in 2023 → whole group null → 0."""
    sid = STATIONS[0][0]
    g = silver.filter((F.col("station") == sid) & (F.col("year") == 2023))
    assert g.count() > 0
    assert g.filter(F.col("avg_wind_speed") != 0.0).count() == 0
    # other groups: imputed values are the group mean → never negative
    assert silver.filter(F.col("avg_wind_speed") < 0).count() == 0


def test_silver_avg_temperature_derivation(silver):
    """When TAVG was missing but TMIN/TMAX present, the rounded value
    must equal round((min+max)/2, 2)."""
    rows = silver.filter(
        F.col("min_temperature").isNotNull() & F.col("max_temperature").isNotNull()
    ).collect()
    assert rows
    derivable = 0
    for r in rows:
        lo = min(r.min_temperature, r.max_temperature)
        hi = max(r.min_temperature, r.max_temperature)
        if lo - 0.005 <= r.avg_temperature_rounded <= hi + 0.005:
            derivable += 1
    # (rows where TAVG was reported may sit outside [min,max]; derived
    # ones cannot — require a healthy share inside the bounds)
    assert derivable > len(rows) * 0.3


def test_silver_weather_type_string_sentinel(silver):
    vals = {r.weather_type_1 for r in silver.select("weather_type_1").distinct().collect()}
    assert "0" in vals  # the INTENDED string fill (SURVEY §0)
    assert vals <= {"0", "1.0", "1"}


def test_silver_date_parse(silver):
    r = silver.select("date", "Date_1", "year").first()
    assert str(r.Date_1) == r.date[:10]
    assert r.year == int(r.date[:4])


# ------------------------------------------------------------------ Gold

def test_gold_per_station_series_ordered(silver):
    from weather_analysis_bigdata__spark.pipeline.gold import per_station_series

    sid = STATIONS[1][0]
    rows = per_station_series(silver, sid).collect()
    assert rows
    dates = [r.Date_1 for r in rows]
    assert dates == sorted(dates)


def test_gold_yearly_trend_and_corr_finite(silver):
    from weather_analysis_bigdata__spark.pipeline.gold import (
        precipitation_temperature_corr,
        yearly_trend,
    )

    t = yearly_trend(silver).first()
    assert t.slope is not None and t.intercept is not None
    c = precipitation_temperature_corr(silver).first()
    assert c.corr is None or -1.0 <= c.corr <= 1.0


def test_gold_station_month_mean_granularity(silver):
    from weather_analysis_bigdata__spark.pipeline.gold import (
        station_month_mean,
        station_month_year_mean,
    )

    sm = station_month_mean(silver, "avg_temperature_rounded")
    assert sm.count() == sm.select("station", "month").distinct().count()
    smy = station_month_year_mean(silver, "precipitation")
    assert smy.count() <= 4 * 2 * 12  # stations × years × months


def test_gold_station_remap(silver, station_dim):
    from weather_analysis_bigdata__spark.pipeline.gold import remap_station_names

    out = remap_station_names(silver.select("station").distinct(), station_dim)
    names = {r.station for r in out.collect()}
    assert names == {name for _sid, name, _la, _lo in STATIONS}
