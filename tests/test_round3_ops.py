"""Tests for the round-3 operator batch (queries_round3)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registry():
    from weather_analysis_bigdata__spark.registry import all_queries

    return all_queries()


def _quant(x: float) -> int:
    """The repo's scaled-integer quantization (vectorops contract)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        (Decimal(repr(float(x))).quantize(Decimal("1.00000000"), ROUND_HALF_UP))
        * 100_000_000
    )


def test_binary_hamming_output_contract(spark, sf_dir, registry):
    rows = registry["sim_search_binary_hamming"].fn(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, 11))
    assert len({r.vec_id for r in rows}) == 10
    for r in rows:
        assert 0 <= r.hamming <= 64
        assert 1 <= r.ham_rank <= 50
    # cosine is DESC within the final ranking
    sims = [r.cosine_sim for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_binary_hamming_packed_bits_equal_naive(spark, sf_dir, registry):
    """The packed two-half XOR+popcount must equal the per-element sign
    comparison (the oracle's form) — checked directly in Python for the
    returned rows."""
    from weather_analysis_bigdata__spark.sources.files import load_table

    emb = {
        r.vec_id: list(r.embedding)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    q = emb[0]
    rows = registry["sim_search_binary_hamming"].fn(spark, sf_dir).collect()
    for r in rows:
        naive = sum(
            1 for a, b in zip(q, emb[r.vec_id]) if (a > 0) != (b > 0)
        )
        assert r.hamming == naive, r.vec_id


def test_matryoshka_funnel_contract(spark, sf_dir, registry):
    rows = registry["sim_search_matryoshka"].fn(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, 11))
    for r in rows:
        assert 1 <= r.prefix_rank <= 50
        assert -1.0 <= r.prefix_sim <= 1.0
        assert -1.0 <= r.cosine_sim <= 1.0
    # the recall audit column is boolean and at least partially True
    # (stage-1 candidates should catch SOME of the exact top-k)
    assert any(r.in_exact_topk for r in rows)


def test_temperature_mixture_is_deterministic_subsample(spark, sf_dir, registry):
    fn = registry["corpus_temperature_mixture"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b  # bit-identical reruns (reproducible data recipe)
    rows = fn(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    for r in rows:
        assert 0 <= r.n_selected <= r.n_docs
        # gate mirrors floor(min(1, share*N/(2 n_s)) * 2^20) exactly
        expect_gate = math.floor(
            min(1.0, r.target_share * total / (2 * r.n_docs)) * 2**20
        )
        assert r.gate == expect_gate
        # selection is the md5 gate: recompute one source's count
    src = rows[0]
    from weather_analysis_bigdata__spark.sources.files import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source") == src.source)
        .select("doc_id")
        .collect()
    )
    n_sel = sum(
        1
        for d in docs
        if int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:5], 16)
        < src.gate
    )
    assert n_sel == src.n_selected


def test_ivf_upsert_conserves_arrivals(spark, sf_dir, registry):
    """Every arriving vector lands in exactly one inverted list:
    Σ n_new = |arrivals| and n_after = n_before + n_new per list;
    Σ n_before = corpus size (the persisted index covers everything)."""
    from weather_analysis_bigdata__spark import queries_llmops as q
    from weather_analysis_bigdata__spark.sources.files import load_table

    rows = registry["ivf_index_upsert"].fn(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    n_arrivals = emb.filter(
        F.col("vec_id") % q._UPSERT_MOD == q._UPSERT_REM
    ).count()
    assert sum(r.n_new for r in rows) == n_arrivals
    assert sum(r.n_before for r in rows) == n_corpus
    for r in rows:
        assert r.n_after == r.n_before + r.n_new
        if r.n_new:
            assert r.min_new_vec_id >= 1000000
