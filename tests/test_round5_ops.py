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
