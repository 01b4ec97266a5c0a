"""Tests for the round-5 operator batch (queries_round5): perceptual
near-dup across image/audio modalities, banded Hamming matching, IVF
centroid refresh, capped hyperplane LSH."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registry():
    from weather_analysis_bigdata__spark.registry import all_queries

    return all_queries()


# ---------------------------------------------------------------------------
# banded_hamming_pairs: exact-recall property vs brute force
# ---------------------------------------------------------------------------
def test_banded_hamming_exact_recall(spark):
    """The pigeonhole band join must find EXACTLY the brute-force pairs
    within the radius — a theorem (t < B disjoint bands), checked on a
    seeded random hash set with a known near-dup structure."""
    from weather_analysis_bigdata__spark.operators.hamming import (
        banded_hamming_pairs,
    )

    rng = random.Random(42)
    base = [rng.getrandbits(48) for _ in range(30)]
    hashes = set(base)
    for h in base[:10]:  # planted near-dups at distances 1..3
        for _ in range(2):
            flip = 0
            for b in rng.sample(range(48), rng.randint(1, 3)):
                flip |= 1 << b
            hashes.add(h ^ flip)
    rows = [(1, h) for h in sorted(hashes)]
    df = spark.createDataFrame(rows, ["cls", "h"])
    got = {
        (r.h_a, r.h_b, r.hamming)
        for r in banded_hamming_pairs(
            df, ["cls"], "h", 48, 4, 3
        ).collect()
    }
    expect = set()
    hs = sorted(hashes)
    for i, a in enumerate(hs):
        for b in hs[i + 1 :]:
            d = bin(a ^ b).count("1")
            if d <= 3:
                expect.add((a, b, d))
    assert got == expect
    assert len(expect) >= 10  # the planted structure actually exists


def test_banded_hamming_rejects_bad_params(spark):
    from weather_analysis_bigdata__spark.operators.hamming import (
        banded_hamming_pairs,
    )

    df = spark.createDataFrame([(1, 5)], ["cls", "h"])
    with pytest.raises(ValueError):  # pigeonhole violated
        banded_hamming_pairs(df, ["cls"], "h", 48, 3, 3)
    with pytest.raises(ValueError):  # hash wider than a signed long
        banded_hamming_pairs(df, ["cls"], "h", 64, 8, 3)


# ---------------------------------------------------------------------------
# Image near-dup: groups ⊇ exact-phash groups
# ---------------------------------------------------------------------------
def test_image_near_dup_groups_superset_of_exact(spark, sf_dir, registry):
    """Every exact (phash, w, h) collision group must land in ONE
    near-dup group (the verdict's 'groups ⊇ exact groups'), and the
    near-dup pair edges must merge at least one pair of distinct
    exact groups (the radius actually buys something)."""
    groups = registry["multimodal_image_near_dup_groups"].fn(
        spark, sf_dir
    )
    per_hash = (
        groups.groupBy("w", "h", "phash")
        .agg(F.countDistinct("group_id").alias("n_groups"))
        .collect()
    )
    assert all(r.n_groups == 1 for r in per_hash)
    merged = (
        groups.groupBy("group_id")
        .agg(F.countDistinct("w", "h", "phash").alias("n_hashes"))
        .filter(F.col("n_hashes") > 1)
        .count()
    )
    assert merged > 0


def test_image_near_dup_pairs_within_radius(spark, sf_dir, registry):
    rows = registry["multimodal_image_near_dup"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r.hamming <= 3
        assert bin(r.phash_a ^ r.phash_b).count("1") == r.hamming
        assert r.phash_a < r.phash_b


# ---------------------------------------------------------------------------
# Audio fingerprint: real-decode kernel properties
# ---------------------------------------------------------------------------
def test_wav_fingerprint_gain_invariance(spark):
    """Scaling every sample by a positive gain preserves the
    energy-delta fingerprint (the design property that makes it a
    perceptual hash, not a checksum)."""
    import numpy as np

    from weather_analysis_bigdata__spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
        wav_fingerprint,
    )

    rng = np.random.default_rng(7)
    samples = rng.integers(-500, 500, size=73).astype(np.int64)
    loud = samples * 3  # still well inside int16
    df = spark.createDataFrame(
        [
            (0, bytearray(encode_wav_pcm16(samples))),
            (1, bytearray(encode_wav_pcm16(loud))),
        ],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: (r.n_frames, r.afp) for r in wav_fingerprint(df).collect()}
    assert out[0] == out[1]
    # and the decode round-trip is bit-exact
    sr, back = decode_wav_pcm16(encode_wav_pcm16(samples))
    assert sr == 8000 and (back == samples).all()


def test_wav_fingerprint_overflow_guard(spark):
    import numpy as np

    from weather_analysis_bigdata__spark.operators.multimodal import (
        encode_wav_pcm16,
        wav_fingerprint,
    )

    big = np.zeros(10 * 66, dtype=np.int64)  # 66 frames → 65 bits
    df = spark.createDataFrame(
        [(0, bytearray(encode_wav_pcm16(big)))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="wav_fingerprint"):
        wav_fingerprint(df).collect()


def test_ppm_phash_overflow_guard(spark):
    import numpy as np

    from weather_analysis_bigdata__spark.operators.multimodal import (
        encode_ppm,
        ppm_phash,
    )

    px = np.arange(3 * 8 * 8, dtype=np.int64) % 256  # 64 pixels > 63
    df = spark.createDataFrame(
        [(0, bytearray(encode_ppm(8, 8, px)))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="ppm_phash"):
        ppm_phash(df).collect()


def test_audio_near_dup_consistent_with_groups(spark, sf_dir, registry):
    """Near-dup pairs connect DISTINCT fingerprints only (exact dups
    are collapsed upstream), and every pair is within the radius."""
    pairs = registry["multimodal_audio_near_dup"].fn(spark, sf_dir).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r.afp_a < r.afp_b
        assert 1 <= r.hamming <= 2


# ---------------------------------------------------------------------------
# Recall FLOORS (round-4 verdict item 5): the audits now fail the suite
# if quality collapses, with a seeded-bug positive control proving the
# floor separates healthy from broken routing.
# ---------------------------------------------------------------------------
# Calibration at sf0.01 (recorded 2026-08-14): healthy 2-probe-of-10
# batch IVF measures mean recall@10 = 0.353 with 99/100 queries > 0;
# random routing would give ~0.2 (2 of 10 lists), and the seeded
# farthest-centroid bug below measures 0.076. The floors sit between
# the healthy and broken regimes.
_ANN_MEAN_RECALL_FLOOR = 0.25
_ANN_NONZERO_FRAC_FLOOR = 0.9


def test_ann_batch_recall_floor_gate(spark, sf_dir, registry):
    rows = registry["ann_batch_recall_audit"].fn(spark, sf_dir).collect()
    r10 = [r.recall_at_k for r in rows]
    assert sum(r10) / len(r10) >= _ANN_MEAN_RECALL_FLOOR
    assert (
        sum(1 for v in r10 if v > 0) / len(r10) >= _ANN_NONZERO_FRAC_FLOOR
    )


def test_ann_recall_floor_catches_seeded_routing_bug(spark, sf_dir):
    """Positive control: re-route every batch query to its FARTHEST
    centroids (the canonical sign-flip routing bug) and check the
    resulting recall falls BELOW the gate's floor — i.e. the floor
    actually separates healthy from broken, it isn't vacuously low."""
    from pyspark.sql import functions as F

    from weather_analysis_bigdata__spark.functions.distributed import (
        grouped_topk,
    )
    from weather_analysis_bigdata__spark.functions.vectorops import scaled_vec
    from weather_analysis_bigdata__spark.queries_llmops import (
        _ivf_assign,
        _ivf_centroids,
        _sqdist_col,
    )
    from weather_analysis_bigdata__spark.queries_round4 import (
        _BATCH_K,
        _BATCH_PROBES,
        _BATCH_QUERIES,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    cent = _ivf_centroids(spark, sf_dir)
    sv = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", scaled_vec("embedding").alias("sva")
    )
    q = sv.filter(F.col("vec_id") < _BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("sva").alias("q_sva")
    )
    ps = q.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "c_label",
        _sqdist_col(F.col("q_sva"), F.col("c_arr")).alias("dist"),
    )
    # THE BUG: order by -dist → farthest centroids probed
    probes = grouped_topk(
        ps, ["query_id"], [(-F.col("dist")), F.col("c_label")], _BATCH_PROBES
    ).select("query_id", F.col("c_label").alias("probe_label"))
    cands = (
        F.broadcast(probes)
        .join(
            _ivf_assign(spark, sf_dir),
            F.col("probe_label") == F.col("part_label"),
        )
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
    )
    pair = (
        cands.join(sv, F.col("cand_id") == F.col("vec_id"))
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "cand_id",
            _sqdist_col(F.col("q_sva"), F.col("sva")).alias("dist"),
        )
    )
    bug = grouped_topk(
        pair, ["query_id"], [F.col("dist"), F.col("cand_id")], _BATCH_K
    ).select("query_id", F.col("cand_id").alias("neighbor_id"))
    pairs_all = (
        sv.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            _sqdist_col(F.col("q_sva"), F.col("sva")).alias("dist"),
        )
    )
    exact = grouped_topk(
        pairs_all, ["query_id"], [F.col("dist"), F.col("cand_id")], _BATCH_K
    ).select("query_id", F.col("cand_id").alias("neighbor_id"))
    hits = exact.join(bug, ["query_id", "neighbor_id"]).count()
    bugged_mean = hits / (_BATCH_QUERIES * _BATCH_K)
    assert bugged_mean < _ANN_MEAN_RECALL_FLOOR


# Calibration at sf0.01: per-cluster pair_recall min 0.346 / mean 0.522;
# total (pair-weighted) recall ~0.5. A cap bug that dropped whole
# clusters would zero their rows and crash through these floors.
_SEM_MIN_RECALL_FLOOR = 0.25
_SEM_MEAN_RECALL_FLOOR = 0.4


def test_semdedup_cap_recall_floor_gate(spark, sf_dir, registry):
    rows = registry["dedup_semantic_cap_audit"].fn(spark, sf_dir).collect()
    pr = [r.pair_recall for r in rows]
    assert min(pr) >= _SEM_MIN_RECALL_FLOOR
    assert sum(pr) / len(pr) >= _SEM_MEAN_RECALL_FLOOR
    # loss algebra must stay internally consistent
    for r in rows:
        assert r.n_pairs_capped + r.n_pairs_lost == r.n_pairs_uncapped


# ---------------------------------------------------------------------------
# IVF centroid refresh: conservation + convergence sanity
# ---------------------------------------------------------------------------
def test_ivf_refresh_conservation(spark, sf_dir, registry):
    """The refresh report's flow algebra must balance: every vector is
    assigned before and after, and per-list n_after = n_before − out +
    in. Movement must be present (the training shortcut != the Lloyd
    mean) but small relative to vector norms (the lists were already
    near their centroids)."""
    rows = registry["ivf_centroid_refresh"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert sum(r.n_before for r in rows) == sum(r.n_after for r in rows)
    assert sum(r.n_out for r in rows) == sum(r.n_in for r in rows)
    for r in rows:
        assert r.n_after == r.n_before - r.n_out + r.n_in
        assert r.centroid_shift >= 0.0


def test_lsh_capped_bounds_candidates(spark, sf_dir, registry):
    """Every served neighbor must come from a capped slot, and every
    query served by the uncapped rung is still served by the capped
    one (the cap bounds work, it must not starve queries)."""
    from weather_analysis_bigdata__spark.queries_llmops import (
        _LSH_BUCKET_CAP,
    )

    capped = registry["sim_search_lsh_capped"].fn(spark, sf_dir).collect()
    assert all(1 <= r.neighbor_brank <= _LSH_BUCKET_CAP for r in capped)
    uncapped_q = {
        r.query_id
        for r in registry["sim_search_lsh"].fn(spark, sf_dir).collect()
    }
    capped_q = {r.query_id for r in capped}
    assert capped_q == uncapped_q


# ---------------------------------------------------------------------------
# Multimodal ingest router + two-sided banded Hamming join
# ---------------------------------------------------------------------------
def test_banded_hamming_join_exact_recall(spark):
    """The probe-vs-index band join must find exactly the brute-force
    matches within the radius, INCLUDING distance-0 exact matches."""
    import random

    from weather_analysis_bigdata__spark.operators.hamming import (
        banded_hamming_join,
    )

    rng = random.Random(9)
    corpus = sorted({rng.getrandbits(48) for _ in range(40)})
    probes = [corpus[0]]  # exact match
    for h in corpus[1:6]:  # near matches at 1..3
        flip = 0
        for b in rng.sample(range(48), rng.randint(1, 3)):
            flip |= 1 << b
        probes.append(h ^ flip)
    probes.append((~corpus[0]) & ((1 << 48) - 1))  # far miss
    left = spark.createDataFrame(
        [(1, h, i) for i, h in enumerate(probes)], ["cls", "h", "pid"]
    )
    right = spark.createDataFrame(
        [(1, h, i) for i, h in enumerate(corpus)], ["cls", "h", "rid"]
    )
    got = {
        (r.pid, r.rid, r.hamming)
        for r in banded_hamming_join(
            left, right, ["cls"], "h", 48, 4, 3,
            left_carry=("pid",), right_carry=("rid",),
        ).collect()
    }
    expect = {
        (pi, ri, bin(p ^ c).count("1"))
        for pi, p in enumerate(probes)
        for ri, c in enumerate(corpus)
        if bin(p ^ c).count("1") <= 3
    }
    assert got == expect
    assert any(d == 0 for (_, _, d) in expect)  # the exact match is in


def test_multimodal_router_contract(spark, sf_dir, registry):
    """Every arriving doc gets exactly one decision; the identical-text
    slice always drops as exact text; matched rows carry a corpus
    representative and a distance consistent with the decision."""
    rows = registry["corpus_ingest_router_multimodal"].fn(
        spark, sf_dir
    ).collect()
    ids = {r.new_doc_id for r in rows}
    assert len(rows) == len(ids)
    decisions = {r.decision for r in rows}
    assert decisions >= {"drop_exact_text"}  # slice 0 always present
    assert len(decisions) >= 3  # several gates fire on this corpus
    for r in rows:
        if r.new_doc_id < 2000000:  # the identical-text slice
            assert r.decision == "drop_exact_text"
        if r.decision == "keep":
            assert r.matched_doc_id is None and r.modality is None
        else:
            assert r.matched_doc_id is not None
            assert 0 <= r.matched_doc_id < 1000000  # a corpus doc
        if r.decision.startswith("drop_"):
            assert r.match_distance == 0
        if r.decision.startswith("link_"):
            assert r.match_distance >= 1


# ---------------------------------------------------------------------------
# Video modality: frame-hash near-dup + router evidence columns
# ---------------------------------------------------------------------------
def test_video_near_dup_shared_frames(spark, sf_dir, registry):
    """Every pair's shared-frame count is bounded by both videos' frame
    counts, and the df-cap keeps the candidate join off the viral
    boilerplate buckets (the frame-hash index shows ~80-video buckets
    that MUST NOT appear as pair sources)."""
    pairs = registry["multimodal_video_near_dup"].fn(spark, sf_dir).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert 2 <= r.n_shared_frames
        assert r.n_shared_frames <= min(r.n_frames_a, r.n_frames_b)
        assert r.doc_id_a < r.doc_id_b
    groups = registry["multimodal_video_frame_phash_groups"].fn(
        spark, sf_dir
    ).collect()
    assert max(g.n_videos for g in groups) > 10  # hot buckets exist...
    # ...and a capped join is why pair counts stay tiny despite them
    assert len(pairs) < 100


def test_multimodal_router_video_evidence(spark, sf_dir, registry):
    """The video gate's evidence column is populated even when an
    earlier gate wins precedence, and any video-decided row's distance
    equals frames-not-matched."""
    rows = registry["corpus_ingest_router_multimodal"].fn(
        spark, sf_dir
    ).collect()
    assert any(r.video_shared_frames is not None for r in rows)
    for r in rows:
        if r.decision == "drop_video_dup":
            assert r.match_distance == 0
        if r.decision in ("drop_video_dup", "link_video_near_dup"):
            assert r.modality == "video"
            assert r.video_shared_frames >= 2
        # evidence is independent of the winning gate
        if r.decision == "drop_exact_text":
            assert r.text_doc_id is not None


def test_lsh_cap_bounds_viral_bucket(spark):
    """Skew stress: plant 300 IDENTICAL vectors (one viral bucket —
    the failure mode the cap exists for) and verify the capped rung's
    candidate row count is bounded by N·cap while the uncapped
    bucket's pair term would be N·(N−1). Uses the same bucket/cap
    algebra as sim_search_lsh_capped on a synthetic frame."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from weather_analysis_bigdata__spark.queries_llmops import (
        _LSH_BUCKET_CAP,
    )

    n = 300
    df = spark.range(n).select(
        F.col("id").alias("vec_id"), F.lit(7).alias("bucket")
    )
    wb = Window.partitionBy("bucket").orderBy("vec_id")
    kept = df.select(
        "*", F.row_number().over(wb).alias("brank")
    ).filter(F.col("brank") <= _LSH_BUCKET_CAP)
    pairs = df.alias("a").join(
        kept.alias("b"),
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    )
    capped_count = pairs.count()
    assert capped_count <= n * _LSH_BUCKET_CAP
    assert capped_count == (
        _LSH_BUCKET_CAP * (_LSH_BUCKET_CAP - 1)
        + (n - _LSH_BUCKET_CAP) * _LSH_BUCKET_CAP
    )
    # the uncapped term on the same bucket would be N(N-1) = 89,700
    assert n * (n - 1) > capped_count * 40


def test_streaming_router_equals_batch(spark, sf_dir, registry):
    """Routing commutes with micro-batching: the stream-built decision
    segments must equal the batch router row-for-row."""
    key = lambda r: r.new_doc_id  # noqa: E731
    batch = sorted(
        registry["corpus_ingest_router_multimodal"].fn(spark, sf_dir)
        .collect(), key=key,
    )
    stream = sorted(
        registry["streaming_multimodal_router_replay"].fn(spark, sf_dir)
        .collect(), key=key,
    )
    assert [tuple(r) for r in batch] == [tuple(r) for r in stream]


def test_lloyd_objective_monotone(spark, sf_dir, registry):
    """Lloyd's theorem, empirically pinned: the clustering objective is
    non-increasing across iterations, and reassignment churn + centroid
    movement both shrink (the convergence signals a production retrain
    loop watches)."""
    rows = sorted(
        registry["ivf_lloyd_convergence"].fn(spark, sf_dir).collect(),
        key=lambda r: r.iteration,
    )
    assert [r.iteration for r in rows] == [0, 1, 2, 3]
    objs = [r.objective for r in rows]
    # floor-means are within 1e-8/dim of the exact minimizer; allow an
    # epsilon far below any real objective increase
    assert all(b <= a + 1e-6 for a, b in zip(objs, objs[1:]))
    assert objs[-1] < objs[0]  # it actually improved
    moved = [r.n_reassigned for r in rows[1:]]
    shift = [r.centroid_shift_total for r in rows[1:]]
    assert moved == sorted(moved, reverse=True)
    assert shift == sorted(shift, reverse=True)


def test_ivf_delete_tombstones_never_surface(spark, sf_dir, registry):
    """No deleted id appears in post-delete results; delete-report
    algebra balances; the pre-delete serve DID return ids that are now
    gone (the filter provably changed results)."""
    post = registry["ivf_probe_topk_post_delete"].fn(spark, sf_dir).collect()
    assert len(post) == 40
    assert all(r.neighbor_id % 4 != 0 for r in post)
    pre = registry["ivf_probe_topk"].fn(spark, sf_dir).collect()
    assert any(r.neighbor_id % 4 == 0 for r in pre)
    rep = registry["ivf_index_delete"].fn(spark, sf_dir).collect()
    for r in rep:
        assert r.n_before == r.n_deleted + r.n_after
        assert abs(r.live_fraction - r.n_after / r.n_before) < 1e-12


def test_consensus_groups_refine_single_modality_groups(
    spark, sf_dir, registry
):
    """Every consensus group lies inside ONE image group and ONE audio
    group (the composite key refines both partitions), and consensus
    is much rarer than either single modality."""
    cons = registry["multimodal_dedup_consensus"].fn(spark, sf_dir).collect()
    assert len(cons) > 0
    img = {
        (r.phash, r.w, r.h): r.n_images
        for r in registry["multimodal_image_phash_groups"]
        .fn(spark, sf_dir)
        .collect()
    }
    aud = {
        (r.sample_rate, r.n_frames, r.afp): r.n_docs
        for r in registry["multimodal_audio_fingerprint_groups"]
        .fn(spark, sf_dir)
        .collect()
    }
    n_cons_docs = 0
    for r in cons:
        assert r.n_docs <= img[(r.phash, r.w, r.h)]
        assert r.n_docs <= aud[(r.sample_rate, r.n_frames, r.afp)]
        n_cons_docs += r.n_docs
    n_img_dup_docs = sum(v for v in img.values() if v >= 2)
    assert n_cons_docs < n_img_dup_docs  # consensus is stricter
