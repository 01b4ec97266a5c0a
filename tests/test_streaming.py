"""Structured Streaming tests: batch-replay parity for the windowed
aggregation, and stateful sessionization across micro-batches."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_tumbling_replay_equals_batch(spark, sf_dir):
    from weather_analysis_bigdata__spark.sources.files import load_table
    from weather_analysis_bigdata__spark.streaming.windows import replay_to_memory

    streamed = replay_to_memory(spark, os.path.join(sf_dir, "events.parquet"))
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    s = {(r.window_start, r.event_type): r.n_events for r in streamed.collect()}
    b = {(r.window_start, r.event_type): r.n_events for r in batch.collect()}
    assert s == b


@pytest.fixture()
def time_split_events_dir(sf_dir):
    """events split into two time-ordered parquet files (micro-batch per
    file with maxFilesPerTrigger=1) — sessions must survive the split."""
    out = tempfile.mkdtemp(prefix=f"events_split_{uuid.uuid4().hex[:8]}_")
    src = os.path.join(sf_dir, "events.parquet")
    con = duckdb.connect()
    cutoff = con.sql(
        f"SELECT quantile_disc(ts, 0.5) FROM '{src}'"
    ).fetchone()[0]
    con.sql(
        f"COPY (SELECT event_id, ts, user_id, event_type, value FROM '{src}' "
        f"WHERE ts <= TIMESTAMP '{cutoff}' ORDER BY ts, event_id) "
        f"TO '{out}/a_part0.parquet' (FORMAT PARQUET)"
    )
    con.sql(
        f"COPY (SELECT event_id, ts, user_id, event_type, value FROM '{src}' "
        f"WHERE ts > TIMESTAMP '{cutoff}' ORDER BY ts, event_id) "
        f"TO '{out}/b_part1.parquet' (FORMAT PARQUET)"
    )
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_stateful_sessionize_matches_batch(spark, sf_dir, time_split_events_dir):
    from weather_analysis_bigdata__spark.registry import all_queries
    from weather_analysis_bigdata__spark.streaming.sessionize import (
        sessionize_stream,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(time_split_events_dir)
    )
    sink = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, round(r.sum_value, 2))
        for r in spark.table(sink).collect()
    }
    # Batch truth: all sessions; the stream only emits CLOSED sessions
    # (a later event arrived >gap after them), so compare that subset.
    batch_rows = all_queries()["events_sessionize_30m"].fn(spark, sf_dir).collect()
    batch_all = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, round(r.sum_value, 2))
        for r in batch_rows
    }
    last_session_end = {}
    for r in batch_rows:
        cur = last_session_end.get(r.user_id)
        if cur is None or r.session_end > cur:
            last_session_end[r.user_id] = r.session_end
    batch_closed = {
        k: v
        for k, v in batch_all.items()
        if k[2] != last_session_end[k[0]]  # the final session stays open
    }
    assert streamed == batch_closed
    assert len(streamed) > 100  # the stream actually closed sessions
