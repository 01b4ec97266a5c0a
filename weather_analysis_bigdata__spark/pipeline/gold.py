"""Gold layer: every analytic the reference computes in pandas/numpy
after toPandas(), pushed into Spark so only plot-sized results cross the
driver boundary (SURVEY.md §3.3 — the reference ships ~27k rows per
station to the driver; at 100 TB that's fatal).

Each function returns a small aggregate DataFrame; rendering (plotly /
matplotlib in the reference, Weather_API.py:533-1012) is a thin consumer
of these outputs and deliberately out of engine scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_station_series(
    silver: DataFrame, station: str, cols: tuple[str, ...] = (
        "Date_1", "max_temperature", "min_temperature", "avg_temperature_rounded"
    )
) -> DataFrame:
    """Ordered time series for one station (Weather_API.py:522-529) —
    parameterized instead of five copy-pasted cells (F1/P2/O1)."""
    return (
        silver.filter(F.col("station") == station)
        .select(*cols)
        .orderBy("Date_1")
    )


def yearly_mean_temperature(silver: DataFrame) -> DataFrame:
    """Mean rounded temperature per year (Weather_API.py:981-984)."""
    return silver.groupBy("year").agg(
        F.avg("avg_temperature_rounded").alias("avg_temperature"),
        F.count(F.lit(1)).alias("n_days"),
    )


def station_month_mean(silver: DataFrame, value_col: str) -> DataFrame:
    """Station × calendar-month mean of a measure
    (Weather_API.py:1037-1042 temperature, :1093-1098 precipitation)."""
    return silver.groupBy(
        "station", F.month("Date_1").alias("month")
    ).agg(F.avg(value_col).alias(f"avg_{value_col}"))


def station_month_year_mean(silver: DataFrame, value_col: str) -> DataFrame:
    """Station × yyyy-MM mean (animated-map frames, Weather_API.py:846-875)."""
    return silver.groupBy(
        "station", F.date_format("Date_1", "yyyy-MM").alias("month_year")
    ).agg(F.avg(value_col).alias(f"avg_{value_col}"))


def precipitation_temperature_corr(silver: DataFrame) -> DataFrame:
    """Pearson correlation precipitation ↔ temperature
    (Weather_API.py:1171 pandas .corr → F.corr, stays distributed)."""
    return silver.agg(
        F.corr("precipitation", "avg_temperature_rounded").alias("corr")
    )


def yearly_trend(silver: DataFrame) -> DataFrame:
    """OLS degree-1 trend of yearly mean temperature over year
    (Weather_API.py:987-993 np.polyfit → regr_slope/regr_intercept over
    the yearly aggregate — two-level aggregation, all in Spark)."""
    yearly = yearly_mean_temperature(silver)
    return yearly.agg(
        F.regr_slope("avg_temperature", "year").alias("slope"),
        F.regr_intercept("avg_temperature", "year").alias("intercept"),
    )


def remap_station_names(df: DataFrame, mapping: DataFrame) -> DataFrame:
    """station id → display name via broadcast join (the scalable form of
    pandas .replace(station_mapping), Weather_API.py:1026-1033).

    Aliased explicitly: ``df`` often shares lineage with ``mapping``
    (the dim joined earlier in Silver), which otherwise trips Spark's
    ambiguous-self-join detection."""
    m = mapping.select(
        F.col("station_id").alias("__map_id"), F.col("name").alias("__map_name")
    )
    return (
        df.join(F.broadcast(m), df["station"] == m["__map_id"], "left")
        .withColumn("station", F.coalesce(F.col("__map_name"), F.col("station")))
        .drop("__map_id", "__map_name")
    )
