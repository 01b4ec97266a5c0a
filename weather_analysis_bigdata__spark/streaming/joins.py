"""Stream-stream interval join and streaming deduplication.

The two remaining stateful-operator classes after windowed aggregation
(streaming/windows.py) and custom session state (streaming/sessionize.py):

- **Stream-stream inner join with an event-time range condition** —
  click ⋈ purchase per user within a bounded horizon. Both sides are
  watermarked and the join condition bounds event time on both sides,
  so the state store provably evicts: each side retains only rows
  inside its watermark + join-horizon window (Spark derives the state
  watermark from the range condition — unbounded conditions would pin
  state forever).
- **Streaming deduplication** — ``dropDuplicatesWithinWatermark`` on
  the event key: exactly-once semantics over an at-least-once input
  (the classic Kafka-replay repair). State is one entry per key inside
  the watermark horizon, evicted as event time advances.

Both are exercised by availableNow replay into a memory sink and gated
on stream ≡ batch equality (the repo's standard streaming gate): the
join against the batch self-join SQL, the dedup against batch DISTINCT.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.streaming.windows import as_stream_dir, stream_events


def _sink(joined: DataFrame, name: str) -> DataFrame:
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return joined.sparkSession.table(name)


def interval_join_replay(
    spark: SparkSession,
    events_dir: str,
    horizon: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """click→purchase pairs per user within ``horizon``, streamed.

    Returns the raw joined pairs from the memory sink (append mode);
    callers aggregate batch-side.
    """
    name = f"ssj_{abs(hash((events_dir, horizon))) % 10**8}"
    events_dir = as_stream_dir(events_dir)
    base = stream_events(spark, events_dir)
    clicks = (
        base.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL {horizon}"
        ),
    )
    return _sink(joined, name)


def dedup_replay(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "365 days",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streamed exactly-once repair of an at-least-once input.

    ``dropDuplicatesWithinWatermark`` keeps per-key state for the
    watermark horizon — duplicates arriving in LATER micro-batches are
    still suppressed as long as they land inside the horizon (the test
    replays a duplicate in a separate file/batch to pin exactly that).
    """
    name = f"sdd_{abs(hash((events_dir, watermark))) % 10**8}"
    base = stream_events(spark, events_dir, max_files_per_trigger)
    deduped = base.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return _sink(deduped, name)
