"""Tests for the quality-ensemble + serving-economics batch
(queries_quality.py): BFD packer invariants (pure Python, fast),
ensemble vote consistency, agreement-matrix accounting, and the RAG
assembly's branch coverage."""

from __future__ import annotations

import pytest

from weather_analysis_bigdata__spark.queries_quality import (
    _BFD_BUDGET,
    _BFD_PLANTED,
    _RAG_BUDGET,
    _RAG_PLANT_ID_OFFSET,
    _bfd_audit,
    _bfd_pack,
)


# ---------------------------------------------------------------------------
# BFD packer: pure-Python invariants
# ---------------------------------------------------------------------------
def _mk_items(seed: int, n: int, lo: int, hi: int) -> list:
    """Deterministic pseudo-random item sizes (LCG — no random module,
    so the case set is pinned forever)."""
    x = seed
    out = []
    for i in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        out.append((i, lo + x % (hi - lo + 1)))
    return out


@pytest.mark.parametrize("seed,n", [(1, 40), (7, 97), (42, 200)])
def test_bfd_bins_within_budget(seed: int, n: int) -> None:
    items = _mk_items(seed, n, 10, 400)
    bins = _bfd_pack(items, _BFD_BUDGET)
    assert set(bins) == {d for d, _ in items}
    fill: dict = {}
    for d, sz in items:
        fill[bins[d]] = fill.get(bins[d], 0) + sz
    assert all(v <= _BFD_BUDGET for v in fill.values())
    # bin ids are contiguous from 0
    assert sorted(set(bins.values())) == list(range(len(fill)))


def test_bfd_oversize_items_isolated() -> None:
    items = _mk_items(3, 30, 10, 400) + [(-1, 600), (-2, 700)]
    bins = _bfd_pack(items, _BFD_BUDGET)
    for over in (-1, -2):
        companions = [d for d, b in bins.items() if b == bins[over]]
        assert companions == [over]


def test_bfd_no_worse_than_next_fit() -> None:
    """BFD must never use more bins than the naive next-fit packer
    (next-fit is a 2-approximation; BFD dominates it pointwise on any
    instance where items are placed greedily)."""
    for seed in (2, 11, 99):
        items = _mk_items(seed, 150, 10, 480)
        bfd_bins = max(_bfd_pack(items, _BFD_BUDGET).values()) + 1
        nf_bins, rem = 1, _BFD_BUDGET
        for _, sz in items:
            if sz <= rem:
                rem -= sz
            else:
                nf_bins += 1
                rem = _BFD_BUDGET - sz
        assert bfd_bins <= nf_bins


def test_bfd_audit_accounting() -> None:
    items = _mk_items(5, 60, 10, 400) + list(_BFD_PLANTED)
    a = _bfd_audit(0, items, _BFD_BUDGET)
    assert a["n_docs"] == 62
    assert a["n_oversize"] == 2
    assert a["total_tokens"] == sum(n for _, n in items)
    assert a["n_bins"] >= a["lb_bins"] >= 1
    assert a["extra_bins"] == a["n_bins"] - a["lb_bins"]
    # fill ppm is exact integer floor division
    assert a["fill_ppm"] == (1_000_000 * a["total_tokens"]) // (
        a["n_bins"] * _BFD_BUDGET
    )


def test_bfd_deterministic_under_input_order() -> None:
    items = _mk_items(13, 80, 10, 450)
    assert _bfd_pack(items, _BFD_BUDGET) == _bfd_pack(
        list(reversed(items)), _BFD_BUDGET
    )


# ---------------------------------------------------------------------------
# Spark-side: ensemble, agreement, RAG assembly (sf0.001)
# ---------------------------------------------------------------------------
def test_ensemble_vote_consistency(spark, sf_dir) -> None:
    from weather_analysis_bigdata__spark.queries_quality import (
        quality_ensemble_vote,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    rows = quality_ensemble_vote(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs  # every document gets a verdict
    for r in rows:
        votes = sum(
            int(r[f])
            for f in (
                "keep_quality",
                "keep_repetition",
                "keep_c4",
                "keep_perplexity",
            )
        )
        assert r["n_keep_votes"] == votes
        assert r["keep_majority"] == (votes >= 3)
        assert r["keep_unanimous"] == (votes == 4)
    # the ensemble must actually discriminate: both decisions occur
    kept = sum(1 for r in rows if r["keep_majority"])
    assert 0 < kept < n_docs


def test_agreement_matrix_accounting(spark, sf_dir) -> None:
    from weather_analysis_bigdata__spark.queries_quality import (
        quality_filter_agreement,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    rows = quality_filter_agreement(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == 6
    for r in rows:
        total = (
            r["n_both_keep"]
            + r["n_both_drop"]
            + r["n_drop_a_only"]
            + r["n_drop_b_only"]
        )
        assert total == n_docs
        denom = r["n_both_drop"] + r["n_drop_a_only"] + r["n_drop_b_only"]
        if denom:
            assert r["drop_jaccard_ppm"] == (
                1_000_000 * r["n_both_drop"]
            ) // denom
        else:
            assert r["drop_jaccard_ppm"] is None


def test_rag_assembly_branches(spark, sf_dir) -> None:
    from weather_analysis_bigdata__spark.queries_quality import (
        rag_context_assembly,
    )

    rows = {r["rank"]: r for r in rag_context_assembly(spark, sf_dir).collect()}
    statuses = {r["status"] for r in rows.values()}
    assert statuses == {"context", "near_dup", "over_budget"}
    # the planted echoes are caught and blamed on their source doc
    planted = [r for r in rows.values() if r["doc_id"] >= _RAG_PLANT_ID_OFFSET]
    assert len(planted) == 2
    for r in planted:
        assert r["status"] == "near_dup"
        assert r["near_dup_of"] == r["doc_id"] - _RAG_PLANT_ID_OFFSET
    # budget accounting: context rows fit, over_budget rows don't
    for r in rows.values():
        if r["status"] == "context":
            assert r["cum_tokens"] <= _RAG_BUDGET
        elif r["status"] == "over_budget":
            assert r["cum_tokens"] > _RAG_BUDGET
        else:
            assert r["cum_tokens"] is None


# ---------------------------------------------------------------------------
# MMR kernel: pure-Python positive controls + Spark-side contract
# ---------------------------------------------------------------------------
def test_mmr_defers_redundant_candidate() -> None:
    """Two near-identical high-relevance vectors: pure relevance would
    rank them 1-2; MMR must defer the duplicate below a less relevant
    but orthogonal candidate."""
    from weather_analysis_bigdata__spark.queries_quality import _mmr_select

    q = [1.0, 0.0]
    # all three equally relevant (rel = 0.9); 11 is an EXACT duplicate
    # of 10 (pairwise sim 1.0), 12 mirrors it (sim to 10 = 0.62).
    # With λ = 0.7: dup scores .7·.9 − .3·1 = .33, mirror scores
    # .7·.9 − .3·.62 = .444 — the duplicate is deferred to last.
    a = [0.9, 0.4358898943540673]
    m = [0.9, -0.4358898943540673]
    cands = [(1, 10, a), (2, 11, list(a)), (3, 12, m)]
    picked = _mmr_select(q, cands, 700_000, 3)
    order = [vid for _, vid, _, _ in picked]
    assert order == [10, 12, 11]


def test_mmr_ties_break_to_lower_vec_id() -> None:
    from weather_analysis_bigdata__spark.queries_quality import _mmr_select

    q = [1.0, 0.0]
    cands = [(1, 7, [1.0, 0.0]), (2, 3, [1.0, 0.0])]
    picked = _mmr_select(q, cands, 700_000, 2)
    assert [vid for _, vid, _, _ in picked][0] == 3


def test_mmr_spark_contract(spark, sf_dir) -> None:
    from weather_analysis_bigdata__spark.queries_quality import (
        _MMR_K_CAND,
        _MMR_K_OUT,
        rerank_mmr_diversify,
    )

    rows = rerank_mmr_diversify(spark, sf_dir).collect()
    assert [r["mmr_rank"] for r in sorted(rows, key=lambda r: r["mmr_rank"])] == list(
        range(1, _MMR_K_OUT + 1)
    )
    assert all(1 <= r["cand_rank"] <= _MMR_K_CAND for r in rows)
    # the first pick is always the most relevant candidate
    first = next(r for r in rows if r["mmr_rank"] == 1)
    assert first["cand_rank"] == 1
    assert first["rel_ppm"] == max(r["rel_ppm"] for r in rows)
