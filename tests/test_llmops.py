"""Unit tests for the LLM-data-pipeline operators (queries_llmops)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registry():
    from weather_analysis_bigdata__spark.registry import all_queries

    return all_queries()


def test_exact_hash_finds_injected_dups(spark, sf_dir, registry):
    rows = registry["dedup_exact_hash"].fn(spark, sf_dir).collect()
    dup_groups = [r for r in rows if r.n_copies >= 2]
    assert dup_groups, "injected exact duplicates must be detected"
    # every injected group keeps the ORIGINAL id as canonical (min)
    assert all(g.canonical_doc_id % 50 == 0 for g in dup_groups)
    assert all(g.canonical_doc_id < 1000000 for g in dup_groups)


def test_fingerprint_catches_case_and_whitespace(spark, sf_dir, registry):
    df = registry["dedup_fingerprint_normalized"].fn(spark, sf_dir)
    dups = df.filter(F.col("is_duplicate")).collect()
    assert dups, "perturbed copies (upper + trailing ws) must collide"
    assert all(r.doc_id >= 2000000 for r in dups)


def test_minhash_exact_dup_pairs_have_full_signature_match(spark, sf_dir, registry):
    rows = registry["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    injected = [r for r in rows if r.doc_id_2 == r.doc_id_1 + 1000000]
    assert injected, "exact-dup injected pairs must be LSH candidates"
    for r in injected:
        assert r.est_jaccard == 1.0
        assert r.n_shared_bands == 4


def test_jaccard_detects_injected_dups(spark, sf_dir, registry):
    rows = registry["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    got = {(r.doc_id_1, r.doc_id_2): r.jaccard for r in rows}
    injected = {k: v for k, v in got.items() if k[1] == k[0] + 1000000}
    assert injected
    assert all(v == 1.0 for v in injected.values())
    assert all(0.5 <= r.jaccard <= 1.0 for r in rows)


def test_simhash_identical_docs_share_hash(spark, sf_dir, registry):
    rows = registry["dedup_simhash"].fn(spark, sf_dir).collect()
    by_id = {r.doc_id: r.simhash for r in rows}
    for doc_id, sh in by_id.items():
        if doc_id >= 1000000:
            assert sh == by_id[doc_id - 1000000]
        assert 0 <= sh < 2**16


def test_topk_shape_and_bounds(spark, sf_dir, registry):
    rows = registry["sim_search_topk"].fn(spark, sf_dir).collect()
    per_query: dict[int, list] = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r)
        assert -1.0 - 1e-9 <= r.cosine_sim <= 1.0 + 1e-9
        assert r.neighbor_id != r.query_id
    for q, neighbors in per_query.items():
        assert len(neighbors) == 5
        sims = [r.cosine_sim for r in sorted(neighbors, key=lambda r: r.rn)]
        assert sims == sorted(sims, reverse=True)


def test_lsh_recall_vs_bruteforce_top1(spark, sf_dir, registry):
    """LSH is approximate, but a same-bucket top-1 must be a genuinely
    similar vector: its sim must be within the brute-force top-5 range."""
    brute = registry["sim_search_topk"].fn(spark, sf_dir).collect()
    brute_best = {}
    for r in brute:
        cur = brute_best.get(r.query_id)
        if cur is None or r.cosine_sim > cur:
            brute_best[r.query_id] = r.cosine_sim
    lsh = registry["sim_search_lsh"].fn(spark, sf_dir).collect()
    for r in lsh:
        if r.query_id in brute_best and r.rn == 1:
            assert r.cosine_sim <= brute_best[r.query_id] + 1e-12


def test_multimodal_metadata_matches_hashlib(spark, sf_dir, registry):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(20)
        .collect()
    }
    meta = {
        r.doc_id: r
        for r in registry["multimodal_decode_stub"].fn(spark, sf_dir).collect()
    }
    for doc_id, text in docs.items():
        h = hashlib.sha256(text.encode()).hexdigest()
        m = meta[doc_id]
        assert m.content_sha256 == h
        assert m.n_bytes == len(text.encode())
        assert m.fake_width == 16 + int(h[0:2], 16) % 240
        assert m.fake_height == 16 + int(h[2:4], 16) % 240
        assert m.n_frames == 1 + int(h[4:6], 16) % 8


def test_multimodal_decode_stubs_raise():
    from weather_analysis_bigdata__spark.operators import multimodal

    for fn in (
        multimodal.decode_image,
        multimodal.sample_video_frames,
        multimodal.extract_audio_features,
    ):
        with pytest.raises(NotImplementedError):
            fn(b"\x00\x01")


def test_quality_filter_is_subset(spark, sf_dir, registry):
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    kept = registry["text_quality_filter"].fn(spark, sf_dir)
    assert 0 < kept.count() <= total
    assert all(r.quality_score > 0.05 for r in kept.collect())


def test_token_stats_invariants(spark, sf_dir, registry):
    rows = registry["text_token_stats"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.n_distinct <= r.n_tokens
        assert 0.0 < r.type_token_ratio <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert r.avg_token_len > 0


def test_cosine_is_deterministic_across_partitionings(spark, sf_dir, registry):
    """The exact-decimal dot must be invariant to physical layout."""
    fn = registry["sim_search_topk"].fn
    a = {(r.query_id, r.neighbor_id): r.cosine_sim for r in fn(spark, sf_dir).collect()}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = {
            (r.query_id, r.neighbor_id): r.cosine_sim
            for r in fn(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b  # bitwise equality, not approx


def test_ivf_probe_distances_match_numpy(spark, sf_dir, registry):
    """Every reported IVF sq_dist must equal the numpy recomputation of
    the quantized-integer squared L2, and per-query ranks must be
    contiguous with nondecreasing distance."""
    import numpy as np

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def q8(v):  # quantize to 1e-8 like vectorops.scaled_vec
        return np.round(v * 1e8).astype(np.int64)

    rows = registry["ivf_probe_topk"].fn(spark, sf_dir).collect()
    per_query: dict[int, list] = {}
    for r in rows:
        assert r.neighbor_id != r.query_id
        d = q8(emb[r.query_id]) - q8(emb[r.neighbor_id])
        assert r.sq_dist == int((d * d).sum()) / 1e16
        per_query.setdefault(r.query_id, []).append(r)
    for neighbors in per_query.values():
        ranked = sorted(neighbors, key=lambda r: r.rn)
        assert [r.rn for r in ranked] == list(range(1, len(ranked) + 1))
        dists = [r.sq_dist for r in ranked]
        assert dists == sorted(dists)


def test_centroid_assignment_consistency(spark, sf_dir, registry):
    """The IVF coarse quantizer must produce one partition per vector,
    and embedding_centroids must emit exactly n_labels x dims rows."""
    cents = registry["embedding_centroids"].fn(spark, sf_dir).collect()
    labels = {r.label for r in cents}
    assert len(cents) == len(labels) * 64
    assign = registry["ivf_assign_nearest_centroid"].fn(spark, sf_dir).collect()
    assert len({r.vec_id for r in assign}) == len(assign)
    assert {r.assigned_label for r in assign} <= labels


def test_connected_components_operator_chain():
    """Min-label propagation on a synthetic graph: a 4-chain, a
    triangle, and an isolated edge — labels must be the min reachable
    id, found only via propagation for the chain."""
    from weather_analysis_bigdata__spark.operators.components import (
        connected_components,
    )
    from weather_analysis_bigdata__spark.session import get_spark

    spark = get_spark("test")
    edges = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40),  # chain: all -> 10
         (50, 60), (60, 70), (50, 70),  # triangle: all -> 50
         (80, 90)],                      # pair: -> 80
        "u BIGINT, v BIGINT",
    )
    got = {
        r.node: r.comp for r in connected_components(edges).collect()
    }
    assert got == {10: 10, 20: 10, 30: 10, 40: 10,
                   50: 50, 60: 50, 70: 50, 80: 80, 90: 80}


def test_dedup_components_cluster_via_propagation(spark, sf_dir, registry):
    """Every planted B/C copy must land in its base doc's component,
    and within a component exactly one row is canonical."""
    rows = registry["dedup_connected_components"].fn(spark, sf_dir).collect()
    comp_of = {r.doc_id: r.component_id for r in rows}
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    for comp, members in by_comp.items():
        assert sum(m.is_canonical for m in members) == 1
        assert min(m.doc_id for m in members) == comp
        for m in members:
            assert m.cluster_size == len(members)
    # non-vacuous: at least one multi-doc cluster resolved
    assert any(len(m) >= 2 for m in by_comp.values())
    # planted copies live in SOME cluster keyed by a smaller doc id
    assert any(did >= 3000000 and comp < did for did, comp in comp_of.items())


def test_bpe_matches_reference_implementation(spark, sf_dir):
    """The Spark BPE trainer must produce EXACTLY the merges an
    independent pure-Python BPE computes on the same corpus (same
    lowercase/whitespace normalization, same count-desc → pair-asc
    tie-break)."""
    import re
    from collections import Counter

    from weather_analysis_bigdata__spark.operators.bpe import train_bpe_merges
    from weather_analysis_bigdata__spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = train_bpe_merges(docs, n_merges=10)

    # Independent reference implementation (pure Python).
    word_freq = Counter()
    for r in docs.select("text").collect():
        for w in re.split(r"\s+", r.text.strip().lower()):
            if w:
                word_freq[w] += 1
    states = {w: tuple(w) for w in word_freq}
    expected = []
    for rank in range(1, 11):
        pairs = Counter()
        for w, syms in states.items():
            f = word_freq[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        expected.append((rank, left, right, n))
        merged = left + right
        new_states = {}
        for w, syms in states.items():
            out, pending = [], None
            for s in syms:
                if pending == left and s == right:
                    out.append(merged)
                    pending = None
                elif pending is None:
                    pending = s
                else:
                    out.append(pending)
                    pending = s
            if pending is not None:
                out.append(pending)
            new_states[w] = tuple(out)
        states = new_states
    assert got == expected


def test_bpe_apply_matches_reference(spark, sf_dir):
    """Applying the learned merges in Spark must yield exactly the
    per-document BPE token counts an independent Python tokenizer
    produces with the same merge list."""
    import re

    from weather_analysis_bigdata__spark.operators.bpe import (
        apply_bpe,
        train_bpe_merges,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs, n_merges=10)

    def py_tokenize(word):
        syms = list(word)
        for _, left, right, _ in merges:
            out, pending = [], None
            for s in syms:
                if pending == left and s == right:
                    out.append(left + right)
                    pending = None
                elif pending is None:
                    pending = s
                else:
                    out.append(pending)
                    pending = s
            if pending is not None:
                out.append(pending)
            syms = out
        return syms

    got = {
        r.doc_id: (r.n_chars_sym, r.n_bpe_tokens)
        for r in apply_bpe(docs.select("doc_id", "text"), merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        words = [w for w in re.split(r"\s+", r.text.strip().lower()) if w]
        before = sum(len(w) for w in words)
        after = sum(len(py_tokenize(w)) for w in words)
        assert got[r.doc_id] == (before, after), r.doc_id


def test_semdedup_capped_equals_uncapped_below_cap(spark, sf_dir, registry):
    """dedup_semantic_capped re-splits clusters above _SEMDEDUP_CAP; on
    this corpus every cluster is under the cap, so the capped output
    must be IDENTICAL to dedup_semantic_clustered — the equality the
    round-3 cap design promises (the split only changes results when
    it actually bounds a quadratic blow-up)."""
    uncapped = sorted(
        map(tuple, registry["dedup_semantic_clustered"].fn(spark, sf_dir).collect())
    )
    capped = sorted(
        map(tuple, registry["dedup_semantic_capped"].fn(spark, sf_dir).collect())
    )
    assert uncapped == capped
    assert len(capped) > 0


def test_semdedup_cap_splits_oversized_cluster(spark):
    """The split mechanics themselves, on a synthetic oversized cluster:
    with cap c and an n-row cluster, pair candidates drop from n(n-1)/2
    to sub-cluster-local pairs — the Σ ≤ N·cap/2 bound."""
    from pyspark.sql.window import Window

    from weather_analysis_bigdata__spark import queries_llmops as q

    cap = q._SEMDEDUP_CAP
    n = cap * 2 + 10  # forces 3 sub-clusters
    assign = spark.range(n).select(
        F.lit(0).alias("cluster"), F.col("id").alias("vec_id")
    )
    wsub = Window.partitionBy("cluster").orderBy("vec_id")
    sub = assign.withColumn(
        "subcl", F.floor((F.row_number().over(wsub) - 1) / cap).cast("long")
    )
    a, b = sub.alias("a"), sub.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.subcl") == F.col("b.subcl"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).count()
    expected = 2 * (cap * (cap - 1) // 2) + (10 * 9 // 2)
    assert pairs == expected
    assert pairs < n * (n - 1) // 2  # strictly below the quadratic
    assert pairs <= n * cap / 2  # the documented linear bound


def test_bpe_lazy_oracles_resolve_from_independent_generator():
    """The BPE queries' oracles are CALLABLES resolved from the current
    sf0.01 corpus by the independent generator
    (operators/bpe_reference.py) — oracle_text() must produce runnable
    VALUES SQL identical to a direct generator call, and the two
    implementations must stay import-independent (bpe_reference must
    not touch operators/bpe)."""
    import inspect

    from weather_analysis_bigdata__spark.operators import bpe_reference
    from weather_analysis_bigdata__spark.registry import _REGISTRY
    import weather_analysis_bigdata__spark.queries_llmops  # noqa: F401

    sf = "/root/testdata/sf0.01"
    train = _REGISTRY["bpe_train_merges"]
    apply_ = _REGISTRY["bpe_apply_tokenize"]
    assert callable(train.oracle) and callable(apply_.oracle)
    assert train.oracle_text() == bpe_reference.train_oracle_sql(sf)
    assert apply_.oracle_text() == bpe_reference.apply_oracle_sql(sf)
    assert "VALUES" in train.oracle_text()
    # independence: the reference module never imports the impl under test
    src = inspect.getsource(bpe_reference)
    assert "operators.bpe import" not in src and "from weather_analysis_bigdata__spark.operators.bpe " not in src
def test_minhash_bucket_cap_is_a_subset_cut_by_bucket_size(spark, sf_dir, registry):
    """The capped candidates are exactly the base candidates minus
    pairs whose every shared band sat in an oversized bucket: capped ⊆
    base, every surviving pair reports max_bucket_size ≤ cap, and on
    this corpus the cap genuinely BINDS (the tiny test corpus repeats
    texts, producing ≥4-doc buckets) — the cut is exercised, not
    vacuous."""
    base = {
        (r.doc_id_1, r.doc_id_2): (r.n_shared_bands, r.est_jaccard)
        for r in registry["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    capped_rows = registry["dedup_minhash_bucket_capped"].fn(spark, sf_dir).collect()
    from weather_analysis_bigdata__spark import queries_llmops as q

    for r in capped_rows:
        assert (r.doc_id_1, r.doc_id_2) in base
        assert r.max_bucket_size <= q._BUCKET_CAP
        # a kept pair's estimated jaccard is unchanged by the cut
        assert base[(r.doc_id_1, r.doc_id_2)][1] == r.est_jaccard
    # the cut binds exactly when an oversized bucket exists in the data
    from pyspark.sql import functions as F

    n_oversized = (
        q._minhash_bands(q._docs_with_dups(spark, sf_dir), q._MINHASH_K, q._LSH_BANDS)
        .groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > q._BUCKET_CAP)
        .count()
    )
    if n_oversized:
        assert len(capped_rows) < len(base)
    else:
        assert len(capped_rows) == len(base)


def test_minhash_bucket_cap_drops_oversized_bucket(spark):
    """Synthetic viral boilerplate: n identical docs collide in every
    band, bucket_size = n > cap ⇒ ALL their pairs are dropped, while a
    small near-dup group below the cap survives."""
    from weather_analysis_bigdata__spark import queries_llmops as q
    from weather_analysis_bigdata__spark.functions.distributed import (
        ranked_topk,  # noqa: F401  (ensures module import side-effect-free)
    )

    cap = q._BUCKET_CAP
    boiler = [(i, "the same license header text repeated verbatim here")
              for i in range(cap + 2)]  # bucket of cap+2 > cap
    pair = [(100, "completely different unique content alpha beta gamma delta"),
            (101, "completely different unique content alpha beta gamma delta")]
    docs = spark.createDataFrame(boiler + pair, "doc_id long, text string")
    bands_df = q._minhash_bands(docs, q._MINHASH_K, q._LSH_BANDS)
    from pyspark.sql import functions as F

    bsize = bands_df.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    kept = bands_df.join(
        bsize.filter(F.col("bucket_size") <= cap), ["band_id", "band_key"]
    )
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
        .collect()
    )
    got = {(r.d1, r.d2) for r in pairs}
    assert (100, 101) in got  # the small group survives
    assert all(d1 >= 100 for d1, _ in got)  # every boilerplate pair dropped
