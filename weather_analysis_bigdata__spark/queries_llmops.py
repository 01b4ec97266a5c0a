"""LLM-data-pipeline operators (charter extensions, SURVEY.md §7.2 M5).

Deduplication (exact / minhash / simhash / n-gram Jaccard / embedding),
similarity search over embeddings, and text analysis over `documents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.registry import register
from weather_analysis_bigdata__spark.sources.files import load_table
