"""State-TTL boundedness: the watermark contract of streaming/__init__
made observable. Replays multi-batch input whose event time advances
past the watermark horizon and asserts the state store EVICTS (bounded
numRowsTotal, nonzero numRowsRemoved) instead of accumulating."""

from __future__ import annotations

import datetime
import os
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FILES = 10
KEYS_PER_FILE = 100
BASE = datetime.datetime(2024, 1, 1)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)


@pytest.fixture(scope="module")
def staged_dir(spark, tmp_path_factory):
    """File k carries 100 fresh keys on day k plus re-deliveries of half
    of file k-1's keys (1 day late — inside a 2-day horizon)."""
    d = str(tmp_path_factory.mktemp(f"ttl_{uuid.uuid4().hex[:6]}"))
    for k in range(N_FILES):
        day = BASE + datetime.timedelta(days=k)
        rows = [
            (k * KEYS_PER_FILE + i, day + datetime.timedelta(minutes=i), k)
            for i in range(KEYS_PER_FILE)
        ]
        if k > 0:  # late duplicates of the previous file's first half
            rows += [
                ((k - 1) * KEYS_PER_FILE + i, day, k)
                for i in range(KEYS_PER_FILE // 2)
            ]
        stage = os.path.join(d, f"stage{k}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(d, f"{k:03d}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + k * 100,) * 2)
    return d


def _run_stream(spark, df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


def _state_metrics(q):
    """(max numRowsTotal across batches, total numRowsRemoved)."""
    totals, removed = [], 0
    for p in q.recentProgress:
        for op in p["stateOperators"]:
            totals.append(op["numRowsTotal"])
            removed += op.get("numRowsRemoved", 0)
    assert totals, "no stateful batches observed"
    return max(totals), removed


def test_dedup_state_evicts_past_watermark(spark, staged_dir):
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_dir)
    )
    deduped = src.withWatermark("ts", "2 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = _run_stream(spark, deduped, f"ttl_dedup_{uuid.uuid4().hex[:8]}")
    out = spark.table(q.name)
    # semantics: every late duplicate arrived inside the horizon → suppressed
    assert out.count() == N_FILES * KEYS_PER_FILE
    assert out.select("event_id").distinct().count() == N_FILES * KEYS_PER_FILE

    max_state, removed = _state_metrics(q)
    # TTL bound: the plateau = horizon (2 days) + 1-batch watermark lag
    # + the in-flight batch ≈ 5 files' worth of keys — and stays there
    # no matter how long the stream runs (10 files here), instead of
    # accumulating all 1000 distinct keys.
    assert max_state <= 5.5 * KEYS_PER_FILE, max_state
    assert removed > 0  # eviction actually happened
    q.stop()


def test_windowed_agg_state_evicts_closed_windows(spark, staged_dir):
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_dir)
    )
    agg = (
        src.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "6 hours"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = _run_stream(spark, agg, f"ttl_win_{uuid.uuid4().hex[:8]}")
    max_state, removed = _state_metrics(q)
    # ~1 live 6h window per day-batch + horizon + watermark lag ⇒ a
    # handful, never the full 10-day window count accumulated unbounded
    assert max_state <= 12, max_state
    assert removed > 0
    q.stop()
