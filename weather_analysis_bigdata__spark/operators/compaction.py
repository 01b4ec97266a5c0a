"""Small-file compaction for partitioned parquet layers.

The small-files problem is the classic lakehouse failure mode at scale:
streaming micro-batches and over-parallel writers leave thousands of
KB-sized files per partition, and every downstream scan pays
open/footer/seek costs per file until listing dominates the query. This
operator rewrites a partitioned dataset with (a) one shuffle keyed on
the partition column so each output partition is written by as few
tasks as possible, and (b) ``maxRecordsPerFile`` as the size governor —
the same two dials OPTIMIZE/compaction jobs in Delta/Iceberg turn.

Correctness contract (tests/test_layer_layout.py): row count, the
order-independent table fingerprint, and the partition layout all
survive compaction bit-for-bit; only the file count changes.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def data_files(path: str) -> list[str]:
    """All parquet data files under a dataset directory."""
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith("_")
    ]


def compact_partitioned(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    partition_col: str,
    max_records_per_file: int = 1_000_000,
) -> dict:
    """Rewrite ``src_dir`` (parquet partitioned by ``partition_col``)
    into ``dst_dir`` with per-partition file consolidation. Returns
    {files_before, files_after, n_rows}."""
    df = spark.read.parquet(src_dir)
    before = len(data_files(src_dir))
    (
        df.repartition(F.col(partition_col))
        .write.partitionBy(partition_col)
        .option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(dst_dir)
    )
    after = len(data_files(dst_dir))
    n_rows = spark.read.parquet(dst_dir).count()
    return {"files_before": before, "files_after": after, "n_rows": n_rows}
