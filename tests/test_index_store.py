"""operators/index_store.py contract: build-once, atomic publish,
race-safe concurrent builders."""

from __future__ import annotations

import os
import threading

from pyspark.sql import functions as F


def test_persisted_index_builds_once_and_serves_scans(spark, sf_dir, tmp_path, monkeypatch):
    from weather_analysis_bigdata__spark.operators import index_store

    monkeypatch.setattr(index_store, "_ROOT", str(tmp_path / "idx"))
    builds = []

    def build():
        builds.append(1)
        return spark.range(100).select(
            F.col("id"), (F.col("id") * 3).alias("v")
        )

    a = index_store.persisted_index(spark, sf_dir, "t1", build)
    b = index_store.persisted_index(spark, sf_dir, "t1", build)
    assert len(builds) == 1  # second call served from disk
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # the served plan is a parquet scan, not the build subtree
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan and "Range" not in plan


def test_persisted_index_concurrent_builders_race_safely(spark, sf_dir, tmp_path, monkeypatch):
    """Two threads racing to build the same index: exactly one copy is
    published, both readers see the same correct rows, no partial
    directory survives (the loser's temp dir is removed)."""
    from weather_analysis_bigdata__spark.operators import index_store

    monkeypatch.setattr(index_store, "_ROOT", str(tmp_path / "idx"))
    barrier = threading.Barrier(2)
    results, errors = [], []

    def build():
        return spark.range(50).select(F.col("id"), (F.col("id") + 7).alias("v"))

    def worker():
        try:
            barrier.wait(timeout=60)
            df = index_store.persisted_index(spark, sf_dir, "raced", build)
            results.append(sorted(map(tuple, df.collect())))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    ts = [threading.Thread(target=worker) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not errors, errors
    assert len(results) == 2 and results[0] == results[1]
    expected = sorted((i, i + 7) for i in range(50))
    assert results[0] == expected
    root = index_store.index_path(sf_dir, "raced")
    parent = os.path.dirname(root)
    leftovers = [d for d in os.listdir(parent) if d.startswith("raced.tmp-")]
    assert leftovers == []


def test_index_path_tracks_corpus_content(tmp_path):
    """Regenerating a corpus (same path, new bytes/mtime) must change
    the index path — stale indexes self-invalidate instead of serving
    wrong data after a testdata rebuild."""
    import time

    from weather_analysis_bigdata__spark.operators.index_store import (
        index_path,
    )

    d = tmp_path / "sfX"
    d.mkdir()
    (d / "t.parquet").write_bytes(b"aaaa")
    p1 = index_path(str(d), "idx")
    time.sleep(0.01)
    (d / "t.parquet").write_bytes(b"bbbbbb")  # regenerated corpus
    p2 = index_path(str(d), "idx")
    assert p1 != p2
