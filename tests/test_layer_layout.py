"""Layer layout tests: partitioned Parquet writes and partition pruning
— the storage design that makes year-filters free at 100 TB (SURVEY §4).
"""

from __future__ import annotations

import io
import contextlib
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F


def test_partitioned_write_prunes_year_filter(spark, sf_dir):
    from weather_analysis_bigdata__spark.sources.files import load_table, write_parquet

    out = tempfile.mkdtemp(prefix=f"layer_{uuid.uuid4().hex[:8]}_")
    try:
        o = load_table(spark, sf_dir, "orders").withColumn(
            "o_year", F.year("o_orderdate")
        )
        write_parquet(o, out, partition_by=("o_year",))

        back = spark.read.parquet(out)
        filtered = back.filter(F.col("o_year") == 1995)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            filtered.explain("formatted")
        plan = buf.getvalue()
        # the year predicate must be a PartitionFilter on the scan (file
        # pruning), not a post-scan Filter
        assert "PartitionFilters" in plan
        assert any(
            "PartitionFilters" in line and "o_year" in line
            for line in plan.splitlines()
        ), plan
        # correctness of the round-trip
        expected = o.filter(F.col("o_year") == 1995).count()
        assert filtered.count() == expected
    finally:
        shutil.rmtree(out, ignore_errors=True)
