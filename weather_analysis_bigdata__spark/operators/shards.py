"""Training-shard writer: the endpoint of the data pipeline.

``write_training_shards`` materializes the deterministic token-budget
shard assignment (queries_ops.shard_assignment — the oracle-gated
two-pass packing) as parquet partitioned by ``shard_id``: each shard
directory holds whole documents, contiguous in doc_id order, summing to
~budget tokens — exactly what a pre-training loader mounts. At 100 TB
this is the same plan plus a larger budget: the write is one
partitioned sink after the assignment join, no extra shuffle beyond
the partitioning.

tests/test_ops.py pins the read-back contract: per-shard doc counts and
token sums equal the oracle-checked manifest query, and every document
appears exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.sources.files import load_table


def write_training_shards(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> DataFrame:
    """Write documents into token-budget shards under ``out_dir``
    (parquet, partitioned by shard_id); returns the read-back frame."""
    from weather_analysis_bigdata__spark.queries_ops import shard_assignment

    assign = shard_assignment(spark, sf_dir).select(
        "doc_id", "n_tokens", "shard_id"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "lang"
    )
    (
        docs.join(assign, "doc_id")
        .repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", "doc_id")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return spark.read.parquet(out_dir)
