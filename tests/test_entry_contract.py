"""Smoke tests for the driver contract: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import importlib


def test_registry_shape():
    entry_mod = importlib.import_module("__spark_entry__")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 20
    # every oracle key is a query key
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_entry_runs(spark):
    entry_mod = importlib.import_module("__spark_entry__")
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "avg_qty" in df.columns


def test_all_queries_run_sf0001(spark, sf_dir):
    """Every registered query builds a plan and returns rows at sf0.001."""
    entry_mod = importlib.import_module("__spark_entry__")
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
