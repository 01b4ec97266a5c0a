"""Generic relational operator coverage (SURVEY.md §7.2 M4).

Operators the reference never uses but a complete engine must provide:
inner/semi/anti joins, set ops, windows, rollup, string functions,
having, subqueries, time-bucketed event aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.functions.deterministic import (
    davg,
    dec,
    dsum,
    sql_davg,
    sql_dec,
    sql_dsum,
)
from weather_analysis_bigdata__spark.registry import register
from weather_analysis_bigdata__spark.sources.files import load_table
