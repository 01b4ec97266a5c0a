"""Tests for the serving-refinement batch (queries_serving): the
refine rung, residual IVFADC, the PQ-variant recall audit, DSIR
importance resampling, and IVF tombstone compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registry():
    from weather_analysis_bigdata__spark.registry import all_queries

    return all_queries()


# ---------------------------------------------------------------------------
# Refine rung
# ---------------------------------------------------------------------------
def test_refine_topk_subset_of_adc_shortlist(spark, sf_dir, registry):
    """Stage-2 exact re-rank can only reorder the stage-1 shortlist —
    every refined result must appear in the ADC top-R for its query,
    and within a query the exact distances must be non-decreasing in
    rank."""
    from weather_analysis_bigdata__spark.queries_round4 import (
        _batch_adc_dists,
    )
    from weather_analysis_bigdata__spark.queries_serving import _R_REFINE
    from weather_analysis_bigdata__spark.functions.distributed import (
        grouped_topk,
    )

    refined = registry["ann_batch_ivfpq_refine_topk"].fn(spark, sf_dir)
    rows = refined.collect()
    short = {
        (r.query_id, r.neighbor_id)
        for r in grouped_topk(
            _batch_adc_dists(spark, sf_dir),
            ["query_id"],
            [F.col("adc_dist"), F.col("neighbor_id")],
            _R_REFINE,
        ).collect()
    }
    assert rows, "refine returned nothing"
    by_q: dict[int, list] = {}
    for r in rows:
        assert (r.query_id, r.neighbor_id) in short
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rn)
        dists = [r.dist for r in rs]
        assert dists == sorted(dists), f"query {q} not exact-ordered"


def test_variant_audit_refine_dominates_raw(spark, sf_dir, registry):
    """hits(refined) >= hits(raw) is a THEOREM: ADC top-k is a subset
    of the ADC top-R shortlist, and any truth item in the shortlist is
    by definition within the exact top-k of the shortlist. Also every
    variant's hits are within [0, possible] and possible is shared."""
    rows = {
        r.variant: r
        for r in registry["ann_pq_variant_recall_audit"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(rows) == {"pq_raw", "pq_raw_refined", "pq_residual"}
    possible = {r.possible for r in rows.values()}
    assert len(possible) == 1 and possible.pop() > 0
    for r in rows.values():
        assert 0 < r.hits <= r.possible
    assert rows["pq_raw_refined"].hits >= rows["pq_raw"].hits


def test_residual_adc_matches_explicit_recompute(spark, sf_dir):
    """Spot-check the residual ADC algebra end-to-end for one query:
    recompute one candidate's asymmetric distance from the persisted
    codebook/codes by hand and compare."""
    from weather_analysis_bigdata__spark.queries_serving import (
        _residual_adc_dists,
        _pqres_codebook,
        _pqres_dists,
    )
    from weather_analysis_bigdata__spark.queries_llmops import (
        _ivf_assign,
        _vpos,
    )
    from weather_analysis_bigdata__spark.queries_serving import _cent_pos
    from pyspark.sql import Window

    adc = _residual_adc_dists(spark, sf_dir)
    one = adc.orderBy("query_id", "neighbor_id").limit(1).collect()[0]
    qid, nid = one.query_id, one.neighbor_id

    # Hand recompute: candidate residual codes …
    rdists = _pqres_dists(spark, sf_dir).filter(F.col("vec_id") == nid)
    w = Window.partitionBy("vec_id", "sub").orderBy("d", "code")
    codes = {
        r.sub: r.code
        for r in rdists.select(
            "sub", "code", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .collect()
    }
    # … the candidate's list, the query's residual vs that list, and
    # the codebook entries the codes point at.
    part = (
        _ivf_assign(spark, sf_dir)
        .filter(F.col("cand_id") == nid)
        .collect()[0]
        .part_label
    )
    qvec = {
        r.pos: r.v_int
        for r in _vpos(spark, sf_dir).filter(F.col("vec_id") == qid).collect()
    }
    cent = {
        r.c_pos: r.c_int
        for r in _cent_pos(spark, sf_dir)
        .filter(F.col("c_label") == part)
        .collect()
    }
    rcb = {
        (r.sub, r.pos): r.rc_int
        for r in _pqres_codebook(spark, sf_dir).collect()
        if r.code == codes.get(r.sub)
    }
    expect = sum(
        (qvec[pos] - cent[pos] - rcb[(sub, pos)]) ** 2
        for (sub, pos) in rcb
    )
    assert int(one.adc_dec) == expect


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------
def test_dsir_selects_target_enriched_docs(spark, sf_dir, registry):
    """The selected top-N must be (a) structurally sound — dense 1..N
    ranks, distinct docs, non-increasing scores — and (b) ENRICHED in
    the target sources far beyond the 2/20 null rate (the whole point
    of importance resampling)."""
    from weather_analysis_bigdata__spark.queries_serving import (
        _DSIR_TARGET,
        _DSIR_TOPN,
    )

    rows = (
        registry["importance_resample_dsir"]
        .fn(spark, sf_dir)
        .orderBy("rank")
        .collect()
    )
    assert [r.rank for r in rows] == list(range(1, _DSIR_TOPN + 1))
    assert len({r.doc_id for r in rows}) == _DSIR_TOPN
    scores = [r.score_int for r in rows]
    assert scores == sorted(scores, reverse=True)
    n_target = sum(r.source in _DSIR_TARGET for r in rows)
    null_rate = _DSIR_TOPN * len(_DSIR_TARGET) / 20  # 20 sources
    assert n_target >= 2 * null_rate, (
        f"target sources not enriched: {n_target} of {_DSIR_TOPN} "
        f"(null {null_rate})"
    )


def test_dsir_llr_quantizer_shared_and_exact():
    """The quantizer both engines' paths share: integer counts in,
    integer LLRs out; zero-count buckets get exactly 0 (log 1 - log 1);
    monotone in the target count."""
    from weather_analysis_bigdata__spark.queries_serving import _dsir_llr

    llr, const = _dsir_llr({0: (9, 99), 1: (0, 50)})
    assert isinstance(llr[0], int) and isinstance(const, int)
    assert llr[2] == 0  # untouched bucket: log(1) - log(1)
    assert llr[0] == int(
        __import__("math").floor(
            1_000_000
            * (__import__("math").log(10) - __import__("math").log(100))
        )
    )
    llr2, _ = _dsir_llr({0: (20, 99), 1: (0, 50)})
    assert llr2[0] > llr[0]


# ---------------------------------------------------------------------------
# IVF compaction
# ---------------------------------------------------------------------------
def test_compact_report_invariants(spark, sf_dir, registry):
    """Conservation + branch semantics: purged + stored == before;
    compacted lists hold zero tombstones; uncompacted lists purge
    nothing; BOTH branches must occur (the mod-4 delete set straddles
    the 3/4 threshold)."""
    rows = registry["ivf_index_compact"].fn(spark, sf_dir).collect()
    assert rows
    branches = {r.compacted for r in rows}
    assert branches == {True, False}, f"one-sided compaction: {branches}"
    for r in rows:
        assert r.n_purged + r.n_rows_stored == r.n_before
        if r.compacted:
            assert r.n_tombstones_remaining == 0 and r.n_purged > 0
        else:
            assert r.n_purged == 0


def test_post_compact_serve_identical_to_post_delete(
    spark, sf_dir, registry
):
    """Compaction must not change a single serve result: the
    post-compact probe output equals the post-delete probe output
    row-for-row (they also share one oracle string by construction)."""
    a = sorted(
        map(
            tuple,
            registry["ivf_probe_topk_post_compact"]
            .fn(spark, sf_dir)
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            registry["ivf_probe_topk_post_delete"]
            .fn(spark, sf_dir)
            .collect(),
        )
    )
    assert a == b and len(a) > 0


def test_compacted_index_physically_smaller(spark, sf_dir):
    """The point of compaction is physical: compacted lists store
    exactly their live rows (dead rows are GONE from the persisted
    files, not flagged), and no stored row is both compacted-list and
    tombstoned."""
    from weather_analysis_bigdata__spark.queries_serving import (
        _ivf_compacted,
    )
    from weather_analysis_bigdata__spark.queries_llmops import _ivf_assign
    from weather_analysis_bigdata__spark.queries_round5 import _DELETE_MOD

    idx = _ivf_compacted(spark, sf_dir)
    assert idx.filter(
        F.col("list_compacted") & F.col("tombstoned")
    ).count() == 0
    n_idx = idx.count()
    n_orig = _ivf_assign(spark, sf_dir).count()
    n_purged = idx.filter(F.col("list_compacted")).count()
    # compacted lists contributed only live rows; the index must be
    # strictly smaller than the original assignment
    assert n_idx < n_orig
    # and dead ids from compacted lists are truly absent
    dead_in_compacted = idx.filter(
        F.col("list_compacted") & (F.col("cand_id") % _DELETE_MOD == 0)
    ).count()
    assert dead_in_compacted == 0
    assert n_purged > 0


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------
def test_decontaminate_finds_every_planted_leak(spark, sf_dir, registry):
    """Every planted excerpt donor (train doc with doc_id % 25 == 0)
    must be flagged with at least the excerpt's 3 shared 6-grams and a
    'dropped' verdict; all flagged docs must actually be train-split
    members."""
    from weather_analysis_bigdata__spark.queries_serving import (
        _DECON_PLANT_MOD,
        _DECON_DROP,
    )
    from weather_analysis_bigdata__spark.functions.textops import (
        hex15_to_long,
        md5s,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    rows = registry["benchmark_decontaminate"].fn(spark, sf_dir).collect()
    assert rows
    flagged = {r.doc_id: r for r in rows}
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (
            hex15_to_long(
                md5s(
                    F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
                )
            )
            % 100
        ).alias("bucket"),
    )
    train_ids = {r.doc_id for r in d.filter(F.col("bucket") < 80).collect()}
    donors = {i for i in train_ids if i % _DECON_PLANT_MOD == 0}
    assert donors, "corpus has no planted donors — test corpus changed?"
    for doc in donors:
        assert doc in flagged, f"planted leak {doc} not found"
        assert flagged[doc].n_shared_grams >= _DECON_DROP
        assert flagged[doc].dropped
    assert set(flagged) <= train_ids


# ---------------------------------------------------------------------------
# Training mix schedule
# ---------------------------------------------------------------------------
def test_mix_schedule_is_a_permutation_with_upweighted_density(
    spark, sf_dir, registry
):
    """positions are a dense 0..N-1 permutation; within any source the
    schedule preserves doc_id order; and the upweighted sources appear
    ~2x as densely in the first half as their corpus share."""
    from weather_analysis_bigdata__spark.queries_serving import (
        _DSIR_TARGET,
    )

    rows = (
        registry["training_mix_schedule"]
        .fn(spark, sf_dir)
        .orderBy("position")
        .collect()
    )
    n = len(rows)
    assert [r.position for r in rows] == list(range(n))
    assert len({r.doc_id for r in rows}) == n
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        ordered = sorted(rs, key=lambda r: r.position)
        ids = [r.doc_id for r in ordered]
        assert ids == sorted(ids), f"{src} not doc_id-ordered in schedule"
    # upweighted sources finish their stride twice as fast: all their
    # docs land in (roughly) the first half of the schedule
    for src in _DSIR_TARGET:
        if src in by_src:
            last = max(r.position for r in by_src[src])
            assert last < 0.6 * n, (
                f"{src} not front-loaded: last position {last} of {n}"
            )


# ---------------------------------------------------------------------------
# Streaming ANN serving
# ---------------------------------------------------------------------------
def test_streaming_serve_equals_batch_serve(spark, sf_dir, registry):
    """The streamed serve must reproduce ivf_probe_topk row-for-row —
    serving commutes with micro-batching (they also share one oracle
    string by construction)."""
    a = sorted(
        map(
            tuple,
            registry["streaming_ann_serve_replay"].fn(spark, sf_dir).collect(),
        )
    )
    b = sorted(
        map(tuple, registry["ivf_probe_topk"].fn(spark, sf_dir).collect())
    )
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# Training corpus manifest (capstone)
# ---------------------------------------------------------------------------
def test_manifest_respects_every_stage(spark, sf_dir, registry):
    """The manifest must contain no dropped-contaminated doc, no
    duplicate fingerprint, no non-positive DSIR score, and its
    positions must be a dense 0..N-1 permutation of a subset of the
    train split."""
    from weather_analysis_bigdata__spark.functions.textops import (
        md5s,
        normalized_text,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    rows = (
        registry["training_corpus_manifest"]
        .fn(spark, sf_dir)
        .orderBy("position")
        .collect()
    )
    assert rows
    n = len(rows)
    assert [r.position for r in rows] == list(range(n))
    ids = {r.doc_id for r in rows}
    assert len(ids) == n
    assert all(r.score_int > 0 for r in rows)
    # stage 2: nothing the decontamination report drops may survive
    dropped = {
        r.doc_id
        for r in registry["benchmark_decontaminate"].fn(spark, sf_dir).collect()
        if r.dropped
    }
    assert not (ids & dropped), f"contaminated docs leaked: {ids & dropped}"
    # stage 3: manifest docs have pairwise-distinct fingerprints
    fps = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(*ids))
        .select(md5s(normalized_text("text")).alias("fp"))
        .collect()
    )
    assert len({r.fp for r in fps}) == n


# ---------------------------------------------------------------------------
# Perplexity filter
# ---------------------------------------------------------------------------
def test_perplexity_filter_scores_and_branches(spark, sf_dir, registry):
    """Every document with >=1 bigram gets a score; both keep branches
    execute; the target sources' mean NLL is strictly below the
    non-target mean (the LM was trained on them); and one doc's score
    matches a from-scratch recompute through the persisted LM."""
    from weather_analysis_bigdata__spark.queries_serving import (
        _DSIR_TARGET,
        _plm_features,
        _plm_table,
    )

    rows = registry["perplexity_filter_bigram"].fn(spark, sf_dir).collect()
    assert rows
    kept = {r.kept for r in rows}
    assert kept == {True, False}, f"one-sided filter: {kept}"
    t = [r.nll_micro_avg for r in rows if r.source in _DSIR_TARGET]
    o = [r.nll_micro_avg for r in rows if r.source not in _DSIR_TARGET]
    assert t and o
    assert sum(t) / len(t) < sum(o) / len(o), (
        "target-trained LM does not prefer target sources"
    )
    # hand recompute one doc
    one = min(rows, key=lambda r: r.doc_id)
    lp = {
        r.bucket: r.lp_int for r in _plm_table(spark, sf_dir).collect()
    }
    buckets = [
        r.bucket
        for r in _plm_features(spark, sf_dir)
        .filter(F.col("doc_id") == one.doc_id)
        .collect()
    ]
    nll = -sum(lp[b] for b in buckets)
    assert one.n_bigrams == len(buckets)
    assert one.nll_micro_avg == nll // len(buckets)


def test_tertile_split_equal_population(spark, sf_dir, registry):
    """Tertiles are equal-population (SQL-standard split: earlier
    buckets larger by at most one), every doc appears exactly once,
    and the head's max NLL <= the middle's min <= the tail's min
    boundary ordering."""
    rows = registry["perplexity_tertile_split"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0 and len({r.doc_id for r in rows}) == n
    by_t: dict[str, list] = {}
    for r in rows:
        by_t.setdefault(r.tertile, []).append(r.nll_micro_avg)
    assert set(by_t) == {"head", "middle", "tail"}
    sizes = sorted(len(v) for v in by_t.values())
    assert sizes[-1] - sizes[0] <= 1
    assert max(by_t["head"]) <= min(by_t["tail"])
    assert max(by_t["head"]) <= max(by_t["middle"]) <= max(by_t["tail"])
