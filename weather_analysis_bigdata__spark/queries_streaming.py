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


@register(
    "streaming_sliding_replay",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
        AS b, value FROM events
    )
    SELECT b AS window_start, CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM assigned GROUP BY 1
    """,
    doc="Sliding-window (1h width / 30m slide) aggregation run by the "
    "Structured Streaming engine (availableNow replay → memory sink) "
    "and checked against the batch double-assignment SQL — the same "
    "stream≡batch equivalence gate as the tumbling query, now with "
    "overlapping-window state (horizon/slide windows live per key; "
    "still bounded by the watermark).",
)
def streaming_sliding_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from weather_analysis_bigdata__spark.streaming.windows import (
        replay_build_to_memory,
        sliding_agg,
    )

    schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField("n_events", T.LongType(), nullable=False),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    return replay_build_to_memory(
        spark, os.path.join(sf_dir, "events.parquet"), sliding_agg, schema
    )


@register(
    "streaming_static_join_replay",
    oracle=f"""
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events JOIN customer ON c_custkey = user_id + 1
    GROUP BY 1, 2
    """,
    doc="Stream ⋈ static enrichment: the events stream joined to the "
    "customer dimension (user_id+1 = c_custkey on this corpus) inside "
    "the streaming engine, then watermarked tumbling aggregation per "
    "market segment — replayed availableNow and checked against the "
    "batch join SQL. The static side broadcasts into each micro-batch "
    "(no stream-side shuffle before the agg); at 100 TB the dim "
    "refreshes per batch and the state stays (window × segment).",
)
def streaming_static_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from weather_analysis_bigdata__spark.sources.files import load_table
    from weather_analysis_bigdata__spark.streaming.windows import (
        replay_build_to_memory,
        stream_static_join_agg,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") - 1).alias("user_id"), "c_mktsegment"
    )
    schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("n_events", T.LongType(), nullable=False),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    return replay_build_to_memory(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        lambda ev: stream_static_join_agg(ev, dim),
        schema,
    )
