"""weather_analysis_bigdata__spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference repo ``Sricharan1997/Weather_Analysis-BigData-`` (a
Databricks medallion notebook over NOAA GHCND daily weather data;
see SURVEY.md), re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; no hand scheduling)
- Parquet-materialized Bronze/Silver/Gold layers with explicit schemas
- broadcast joins for dims, window-based imputation instead of agg self-joins
- LLM-data-pipeline extensions: dedup (exact/minhash/simhash/ngram/embedding),
  similarity search, text analysis, multimodal column plumbing, streaming.

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from weather_analysis_bigdata__spark.session import get_spark  # noqa: F401
