"""foreachBatch upsert: streaming aggregation into a batch-only sink.

The fourth production sink pattern after memory (tests), parquet file
sink (append-only landing), and stateful operators: when the target
supports only batch writes (a warehouse table, a key-value store), each
micro-batch is MERGED into the target inside ``foreachBatch`` — the
engine guarantees per-batch at-least-once with a batch_id for
idempotence, and the merge makes it exactly-once.

Here the target is a versioned parquet directory (v1, v2, …): each
batch reads the current version, full-merges the batch's per-key
partial aggregate, writes the next version — the file-based analogue of
``MERGE INTO target USING batch``. Partials accumulate as exact
DECIMAL sums, so the final table equals the batch aggregate bit-for-bit
regardless of how rows were split across micro-batches (the
stream ≡ batch gate the driver checks).

At 100 TB: the per-batch merge cost is O(target ∪ batch-keys); with a
real MERGE-capable table format only touched partitions rewrite.
State lives in the TARGET, not the state store — this is how unbounded
key spaces (user totals over years) stream without watermark eviction.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.streaming.windows import stream_events
from weather_analysis_bigdata__spark.session import pin_ephemeral


def foreachbatch_upsert_replay(
    spark: SparkSession, events_parquet: str, n_splits: int = 4
) -> DataFrame:
    """Replay events in ``n_splits`` micro-batches, foreachBatch-merging
    per-user running totals into a versioned parquet target; returns the
    final target (≡ the batch per-user aggregate)."""
    from weather_analysis_bigdata__spark.sources.files import _load_events

    run = uuid.uuid4().hex[:10]
    src_dir = tempfile.mkdtemp(prefix=f"fbu_src_{run}_")
    target_dir = tempfile.mkdtemp(prefix=f"fbu_tgt_{run}_")

    # split the source into n files so availableNow+maxFilesPerTrigger=1
    # actually exercises multiple sequential merges
    sf_dir = os.path.dirname(events_parquet)
    _load_events(spark, sf_dir).repartition(n_splits).write.mode(
        "overwrite"
    ).parquet(src_dir)

    base = stream_events(spark, src_dir, max_files_per_trigger=1)
    state = {"v": 0}

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # per-key partials as exact decimals (order/split independent)
        part = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).alias("dec_value"),
        )
        if state["v"] > 0:
            cur = spark.read.parquet(os.path.join(target_dir, f"v{state['v']}"))
            part = (
                cur.unionByName(part)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("dec_value").alias("dec_value"),
                )
            )
        part.write.mode("overwrite").parquet(
            os.path.join(target_dir, f"v{state['v'] + 1}")
        )
        state["v"] += 1

    q = (
        base.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(src_dir, "_ckpt"))
        .start()
    )
    q.awaitTermination(300)
    final = spark.read.parquet(os.path.join(target_dir, f"v{state['v']}"))
    out = final.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("dec_value").cast("double").alias("total_value"),
    ).transform(pin_ephemeral)
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(target_dir, ignore_errors=True)
    return out
