"""Order-sensitivity classification enforcement (round-10 verdict
item 2): every streaming replay must carry an explicit answer to
"what happens when micro-batches arrive in a different order?", and
the order-free claims must survive an actual permuted delivery.

The table lives in streaming/order_sensitivity.py; this suite (a)
fails on any unclassified replay, and (b) runs permutation probes for
one representative of each mechanism class — complete-mode windowed
state, session-window merge state, keyed dedup state, and the
foreachBatch segment-union shape. The guarded sessionizer's
permutation tests live in test_streaming.py.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import duckdb
import pytest

from weather_analysis_bigdata__spark.streaming.order_sensitivity import (
    CLASSES,
    ORDER_DEFINED,
    ORDER_GUARDED,
    REPLAYS,
)


def test_every_streaming_replay_is_classified():
    """Zero unclassified replays — the registry is the ground truth,
    so a NEW streaming query cannot ship without an order-sensitivity
    entry (this test fails until it gets one)."""
    from weather_analysis_bigdata__spark.registry import all_queries

    registered = {n for n in all_queries() if n.startswith("streaming_")}
    unclassified = registered - set(REPLAYS)
    assert unclassified == set(), (
        f"streaming replays without an order-sensitivity entry: "
        f"{sorted(unclassified)} — classify them in "
        f"streaming/order_sensitivity.py"
    )
    # and no stale entries for replays that no longer exist (gated
    # entries document why they are absent from the registry)
    stale = {
        n
        for n, e in REPLAYS.items()
        if n not in registered and "gated" not in e
    }
    assert stale == set(), f"stale order-sensitivity entries: {sorted(stale)}"


def test_every_entry_is_complete():
    for name, e in REPLAYS.items():
        assert e["class"] in CLASSES, name
        assert e.get("why"), f"{name}: empty why"
        assert e.get("enforced_by"), f"{name}: no enforcing test/oracle"
        if e["class"] == ORDER_DEFINED:
            assert "batch" in e["why"].lower(), name
        if e["class"] == ORDER_GUARDED:
            assert "late" in e["why"].lower(), name


def _two_file_split(sf_dir: str, reverse: bool) -> str:
    """events split at the median ts into two files whose mtimes force
    the chosen delivery order."""
    src = os.path.join(sf_dir, "events.parquet")
    out = tempfile.mkdtemp(prefix=f"ord_{uuid.uuid4().hex[:8]}_")
    con = duckdb.connect()
    cutoff = con.sql(
        f"SELECT quantile_disc(ts, 0.5) FROM '{src}'"
    ).fetchone()[0]
    a = os.path.join(out, "early.parquet")
    b = os.path.join(out, "late.parquet")
    con.sql(
        f"COPY (SELECT * FROM '{src}' WHERE ts <= TIMESTAMP '{cutoff}') "
        f"TO '{a}' (FORMAT PARQUET)"
    )
    con.sql(
        f"COPY (SELECT * FROM '{src}' WHERE ts > TIMESTAMP '{cutoff}') "
        f"TO '{b}' (FORMAT PARQUET)"
    )
    t = 1_700_000_000
    first, second = (b, a) if reverse else (a, b)
    os.utime(first, (t, t))
    os.utime(second, (t + 2, t + 2))
    return out


def _replay_complete(spark, src_dir, build, max_files=1):
    from weather_analysis_bigdata__spark.streaming.windows import (
        stream_events,
    )

    sink = f"ord_{uuid.uuid4().hex[:8]}"
    q = (
        build(stream_events(spark, src_dir, max_files_per_trigger=max_files))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).collect()


def test_tumbling_complete_replay_is_order_free(spark, sf_dir):
    """The complete-mode mechanism claim, verified: permuted two-file
    delivery folds to bit-identical window aggregates (complete mode
    retains all state — nothing is watermark-dropped — and the
    count/decimal-sum fold is a commutative monoid)."""
    from weather_analysis_bigdata__spark.streaming.windows import tumbling_agg

    results = []
    for reverse in (False, True):
        d = _two_file_split(sf_dir, reverse)
        try:
            rows = _replay_complete(spark, d, tumbling_agg)
            results.append(
                {
                    (r.window_start, r.event_type): (r.n_events, r.sum_value)
                    for r in rows
                }
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
    assert results[0] == results[1]
    assert len(results[0]) > 100


def test_session_window_complete_replay_is_order_free(spark, sf_dir):
    """Session-window merge state: delivering the LATE half first
    makes the engine open late sessions, then merge/extend them as
    the early half arrives — complete mode never evicts, so the final
    merged sessions equal the in-order replay's exactly."""
    from pyspark.sql import functions as F

    def build(s):
        return (
            s.withWatermark("ts", "2 hours")
            .groupBy(
                "user_id", F.session_window("ts", "30 minutes").alias("sw")
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"),
                "n_events",
            )
        )

    results = []
    for reverse in (False, True):
        d = _two_file_split(sf_dir, reverse)
        try:
            rows = _replay_complete(spark, d, build)
            results.append(
                {
                    (r.user_id, r.session_start, r.session_end): r.n_events
                    for r in rows
                }
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
    assert results[0] == results[1]
    assert len(results[0]) > 100


def test_dedup_replay_duplicate_first_is_order_free(spark, sf_dir):
    """Keyed-dedup state under permutation: the REDELIVERED slice
    arriving before the originals must yield the same deduped totals
    (duplicates are value-identical, so first-seen-wins is
    order-free in value within the watermark horizon)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from weather_analysis_bigdata__spark.streaming.joins import dedup_replay

    src = os.path.join(sf_dir, "events.parquet")
    t = pq.read_table(src)
    mask = t["event_id"].to_numpy() % 5 == 0
    out = tempfile.mkdtemp(prefix=f"dedup_rev_{uuid.uuid4().hex[:8]}_")
    try:
        full = os.path.join(out, "full.parquet")
        dup = os.path.join(out, "redelivered.parquet")
        pq.write_table(t, full)
        pq.write_table(t.filter(pa.array(mask)), dup)
        # duplicate slice FIRST, originals second
        tt = 1_700_000_000
        os.utime(dup, (tt, tt))
        os.utime(full, (tt + 2, tt + 2))
        deduped = dedup_replay(spark, out, max_files_per_trigger=1)
        assert deduped.count() == t.num_rows
        assert deduped.select("event_id").distinct().count() == t.num_rows
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_minhash_segments_are_order_free(spark, sf_dir):
    """The foreachBatch segment-union mechanism, verified on the
    MinHash index maintainer: a permuted batching of the documents
    stream publishes different segment FILES but the unioned band
    table is row-identical (doc-local kernel + static hash family)."""
    from pyspark.sql import DataFrame

    from weather_analysis_bigdata__spark.operators.index_store import (
        read_replay_segments,
    )
    from weather_analysis_bigdata__spark.queries_llmops import _minhash_bands
    from weather_analysis_bigdata__spark.sources.files import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter("doc_id % 4 < 2")  # small, fast slice
    )
    schema = docs.schema

    def run(order_by_desc: bool) -> set:
        src_dir = tempfile.mkdtemp(prefix=f"mh_ord_{uuid.uuid4().hex[:6]}_")
        seg_dir = tempfile.mkdtemp(prefix=f"mh_seg_{uuid.uuid4().hex[:6]}_")
        try:
            # two single-file batches split by doc_id parity, delivery
            # order controlled by mtime
            parts = [
                docs.filter(f"doc_id % 2 = {p}").coalesce(1) for p in (0, 1)
            ]
            tt = 1_700_000_000
            for i, part in enumerate(parts):
                stage = os.path.join(src_dir, f"stage{i}")
                part.write.parquet(stage)
                f = next(
                    x for x in os.listdir(stage) if x.endswith(".parquet")
                )
                dst = os.path.join(src_dir, f"{i:03d}.parquet")
                shutil.copy(os.path.join(stage, f), dst)
                shutil.rmtree(stage)
                order = (1 - i) if order_by_desc else i
                os.utime(dst, (tt + 2 * order,) * 2)

            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
            )

            def publish(bdf: DataFrame, batch_id: int) -> None:
                _minhash_bands(bdf).select(
                    "doc_id", "band_id", "band_key"
                ).write.mode("overwrite").parquet(
                    os.path.join(seg_dir, f"seg_{batch_id}")
                )

            q = (
                stream.writeStream.foreachBatch(publish)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {
                (r.doc_id, r.band_id, r.band_key)
                for r in read_replay_segments(spark, seg_dir).collect()
            }
        finally:
            shutil.rmtree(src_dir, ignore_errors=True)
            shutil.rmtree(seg_dir, ignore_errors=True)

    fwd, rev = run(False), run(True)
    assert fwd == rev
    assert len(fwd) > 100
