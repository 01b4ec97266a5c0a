"""Invariant tests for queries_round2.py (the oracle hash covers
cross-engine equality; these pin the semantics the hash can't state)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_chunking_covers_every_token(spark, sf_dir):
    """Chunks tile each document: first chunk starts at 0, consecutive
    starts advance by the stride, the last chunk reaches the end, and
    every chunk except possibly the last is full-width."""
    from weather_analysis_bigdata__spark.queries_round2 import (
        _CHUNK_S,
        _CHUNK_W,
        chunk_documents_overlap,
    )
    from weather_analysis_bigdata__spark.functions.textops import tokens
    from weather_analysis_bigdata__spark.sources.files import load_table

    chunks = chunk_documents_overlap(spark, sf_dir)
    n_tok = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens("text")).alias("n"))
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("n_chunks").alias("n_chunks"),
            F.max(F.col("chunk_idx") * _CHUNK_S + F.col("chunk_len")).alias(
                "max_end"
            ),
            F.sum(
                F.when(F.col("chunk_len") < _CHUNK_W, 1).otherwise(0)
            ).alias("n_short"),
        )
        .join(n_tok, "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r.n_rows == r.n_chunks
        assert r.max_end == r.n  # last chunk ends exactly at the doc end
        assert r.n_short <= 1  # only the final chunk may be short


def test_chunk_overlap_is_w_minus_s(spark, sf_dir):
    """Adjacent full chunks share exactly W-S tokens (verified on token
    arrays, not just lengths)."""
    from weather_analysis_bigdata__spark.queries_round2 import _CHUNK_S, _CHUNK_W
    from weather_analysis_bigdata__spark.functions.textops import tokens
    from weather_analysis_bigdata__spark.sources.files import load_table

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= _CHUNK_W + _CHUNK_S)
        .limit(5)
        .collect()
    )
    assert d
    for row in d:
        c0 = row.toks[0:_CHUNK_W]
        c1 = row.toks[_CHUNK_S : _CHUNK_S + _CHUNK_W]
        assert c0[_CHUNK_S:] == c1[: _CHUNK_W - _CHUNK_S]


def test_tfidf_cosine_bounds_and_symmetric_vocab(spark, sf_dir):
    from weather_analysis_bigdata__spark.queries_round2 import tfidf_cosine_topk

    rows = tfidf_cosine_topk(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.n_shared_terms >= 1
        # Cauchy-Schwarz: cosine over the shared-term dot is ≤ 1.
        assert 0.0 < r.cosine <= 1.0 + 1e-12
    scores = [r.cosine for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_cluster_representative_is_argmax_quality(spark, sf_dir):
    """The representative of every cluster has the cluster's max token
    count (the planted chain means that is the C copy, NOT the min id),
    and dropped count is size-1."""
    from weather_analysis_bigdata__spark.queries_round2 import (
        dedup_cluster_representative,
    )

    rows = dedup_cluster_representative(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_dropped == r.cluster_size - 1
    # Planted chains (component rooted at a %50 doc whose copies kept
    # edges): the C copy (+50 filler tokens, id-shifted by 4_000_000)
    # must win on quality — i.e. the representative is NOT the min-id
    # component label a naive dedup would keep.
    winners = [r for r in rows if r.rep_doc_id >= 4_000_000]
    assert winners, "some planted C copy should win its cluster"
    # Full A–B–C chains (component = the original doc id): all three
    # members linked through B, and the C copy wins on token count even
    # though A holds the min id — quality, not min-id, picks the keeper.
    chains = [r for r in winners if r.component_id < 1_000_000]
    assert chains, "at least one full chain should resolve to its C copy"
    for r in chains:
        assert r.cluster_size >= 3
        assert r.rep_doc_id != r.component_id
        assert r.rep_doc_id == r.component_id + 4_000_000
