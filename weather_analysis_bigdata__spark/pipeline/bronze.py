"""Bronze layer: long→wide pivot + full-row dedup + schema enforcement.

Reference behavior reproduced (SURVEY.md §2.2 R1/R2):

- The notebook accumulates ``observations_dict[(date, station)]`` while
  paging the NOAA API (Weather_API.py:76-91) — a manual PIVOT with
  last-write-wins on duplicate (date, station, datatype) keys — then
  ``drop_duplicates`` on the materialized frame (Weather_API.py:117-120).
- Here the pivot is a single Spark hash aggregate with an explicit
  pivot-value list (no extra distinct scan — SURVEY §7.3), and
  last-write-wins is made *deterministic under any partitioning* with
  ``max_by(value, seq)`` over the ingest sequence number instead of an
  order-dependent ``last()``.

At 100 TB: one shuffle on (date, station); the pivot list is fixed at 10
columns so the aggregate state is tiny; output written as Parquet
partitioned by year for downstream partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.pipeline.schemas import COLUMNS_MAPPING


def pivot_long_to_wide(long_df: DataFrame) -> DataFrame:
    """NOAA long records (date, station, lat, lon, datatype, value, seq)
    → one wide row per (date, station).

    Only whitelisted datatypes survive (Weather_API.py:78); duplicate
    (date, station, datatype) measurements resolve to the highest-seq
    value (last-write-wins, deterministic).
    """
    keys = list(COLUMNS_MAPPING)
    pivoted = (
        long_df.filter(F.col("datatype").isin(keys))
        .groupBy("date", "station", "latitude", "longitude")
        .pivot("datatype", keys)
        .agg(F.max_by("value", "seq"))
    )
    renamed = pivoted
    for code, col in COLUMNS_MAPPING.items():
        renamed = renamed.withColumnRenamed(code, col)
    # Declared types (Weather_API.py:186-188): wind direction is integral
    # degrees; weather_type_1 is a categorical string flag.
    return renamed.withColumn(
        "wind_direction_2min", F.col("wind_direction_2min").cast("int")
    ).withColumn("weather_type_1", F.col("weather_type_1").cast("string"))


def dedup_full_rows(df: DataFrame) -> DataFrame:
    """Full-row dedup (Weather_API.py:119 drop_duplicates → dropDuplicates)."""
    return df.dropDuplicates()


def build_bronze(long_df: DataFrame) -> DataFrame:
    """Long-format ingest → deduplicated wide Bronze fact table."""
    return dedup_full_rows(pivot_long_to_wide(long_df))
