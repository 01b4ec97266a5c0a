"""Streaming queries exposed through the driver contract.

``streaming_tumbling_replay`` actually runs the Structured Streaming
engine (readStream → watermark → window agg → availableNow trigger →
memory sink) and returns the final state; its oracle is plain batch SQL
— passing proves stream/batch equivalence, the fundamental streaming
correctness property.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from weather_analysis_bigdata__spark.functions.deterministic import sql_dsum
from weather_analysis_bigdata__spark.registry import register


@register(
    "streaming_tumbling_replay",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Watermarked tumbling-window aggregation executed by the "
    "Structured Streaming engine (availableNow replay of the events "
    "parquet through readStream → memory sink), checked against batch "
    "SQL — stream/batch equivalence is the correctness gate. See "
    "streaming/windows.py for the watermark/state design.",
)
def streaming_tumbling_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.streaming.windows import replay_to_memory

    return replay_to_memory(spark, os.path.join(sf_dir, "events.parquet"))
