"""Bucketed-table co-located join: the storage-level shuffle eliminator.

At 100 TB the single biggest join cost is re-shuffling both fact tables
on the key; writing them `bucketBy(N, key)` + `sortBy(key)` makes every
subsequent equi-join on that key shuffle-FREE (bucket locality replaces
the exchange). This test pins that plan property end-to-end: write two
bucketed tables, join them, assert zero exchanges and result parity
with the plain join.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.plans.inspect import n_shuffles, plan_of
from weather_analysis_bigdata__spark.sources.files import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    o_tbl, l_tbl = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable(o_tbl)
    load_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable(l_tbl)
    yield o_tbl, l_tbl
    for t in (o_tbl, l_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketed_tables):
    o_tbl, l_tbl = bucketed_tables
    o = spark.table(o_tbl)
    li = spark.table(l_tbl)
    # Disable broadcast so the join strategy decision is about shuffles,
    # not table size (at 100 TB neither fact side broadcasts).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = plan_of(joined)
        # bucket-local sort-merge join: no exchange before the join; the
        # only shuffle is the final small aggregation
        assert n_shuffles(plan) <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # parity with the plain (shuffled) join
    plain = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
