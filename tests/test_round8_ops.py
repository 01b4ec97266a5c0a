"""Round-8 operator tests: the span-cap loss audit's positive control
and cap-blindness invariants the oracle compare can't express directly."""

from __future__ import annotations

import pyspark.sql.functions as F


def _words(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def test_span_cap_audit_planted_control(spark, sf_dir):
    """The planted 24-copy boilerplate must be (a) invisible to the
    production cap, (b) fully priced by the yardstick: exactly
    copies × block tokens missed, every planted doc counted."""
    from weather_analysis_bigdata__spark import queries_round8 as r8

    row = {
        r.is_planted: r
        for r in r8.dedup_span_cap_audit(spark, sf_dir).collect()
    }[True]
    assert row.n_docs == r8._PLANT_COPIES
    assert row.dup_tokens_capped == 0  # cap-blind by construction
    expected = r8._PLANT_COPIES * r8._PLANT_BOILER_TOKENS
    assert row.dup_tokens_yardstick == expected
    assert row.missed_span_tokens == expected
    assert row.n_docs_missed == r8._PLANT_COPIES
    assert row.missed_ppm > 0
    # Yardstick exhaustive on this corpus: no gram above _CAP_AUDIT_HI.
    assert row.overcap_occurrences == 0


def test_span_cap_blindness_on_synthetic_kernel(spark):
    """Directly on the kernel: a block duplicated in MORE docs than the
    cap yields zero spans at the production cap but full spans at a
    cap above the copy count — the exact mechanism the audit prices."""
    from weather_analysis_bigdata__spark import queries_round7 as r7

    copies = r7._SPAN_OCC_CAP + 3
    shared = _words("boiler", 24)
    rows = [
        (i, _words(f"u{i}x", 3) + " " + shared) for i in range(copies)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    assert r7._span_pairs_from(d, r7._SPAN_OCC_CAP).count() == 0
    hi = r7._span_pairs_from(d, copies).collect()
    assert len(hi) == copies * (copies - 1) // 2
    assert all(s.span_tokens == 24 for s in hi)


def test_span_cap_audit_missed_nonnegative(spark, sf_dir):
    """Capped grams ⊆ yardstick grams ⟹ capped dup coverage can never
    exceed the yardstick's, organic rows included."""
    from weather_analysis_bigdata__spark import queries_round8 as r8

    for r in r8.dedup_span_cap_audit(spark, sf_dir).collect():
        assert r.dup_tokens_yardstick >= r.dup_tokens_capped
        assert r.missed_span_tokens == (
            r.dup_tokens_yardstick - r.dup_tokens_capped
        )


def test_decontaminate_semantic_planted_paraphrases(spark, sf_dir):
    """Every planted paraphrase source must be semantic-flagged at
    ~0.99 cosine while staying n-gram-clean — the leak class the
    verbatim rung cannot see."""
    from weather_analysis_bigdata__spark import queries_round8 as r8

    rows = {r.doc_id: r for r in
            r8.decontaminate_semantic(spark, sf_dir).collect()}
    planted = [
        d for d in rows
        if d % 97 != 0 and d % r8._DECON_PLANT_MOD == 1 and d >= 0
        and rows[d].has_embedding
    ]
    assert planted, "no planted sources in this SF's vec_id range"
    for d in planted:
        r = rows[d]
        assert r.semantic_contaminated, f"planted source {d} not flagged"
        assert r.max_cosine >= 0.98
        assert r.contamination_rung in ("semantic", "both")


def test_decontaminate_semantic_rung_consistency(spark, sf_dir):
    """Rung labels must agree with the two flags, and semantic flags
    require an embedding (the rung is vacuous without one)."""
    from weather_analysis_bigdata__spark import queries_round8 as r8

    for r in r8.decontaminate_semantic(spark, sf_dir).collect():
        expect = (
            "both" if r.ngram_contaminated and r.semantic_contaminated
            else "ngram" if r.ngram_contaminated
            else "semantic" if r.semantic_contaminated
            else "clean"
        )
        assert r.contamination_rung == expect
        if r.semantic_contaminated:
            assert r.has_embedding and r.max_cosine >= r8._DECON_TAU


def test_tokenizer_coverage_planted_unseen_script(spark, sf_dir):
    """The planted Greek-script source must show a non-zero unk rate
    for BOTH families; every organic source must be fully covered
    (its chars are the training charset by construction)."""
    from weather_analysis_bigdata__spark import queries_round8 as r8

    rows = r8.tokenizer_coverage_audit(spark, sf_dir).collect()
    fams = {"bpe", "unigram"}
    planted = [r for r in rows if r.source == r8._COVERAGE_PLANT_SOURCE]
    assert {r.family for r in planted} == fams
    for r in planted:
        assert r.unk_chars > 0 and r.unk_words > 0
        assert 0 < r.char_coverage_ppm < 1000000  # mixed, not all-unk
        assert r.unk_word_ppm > 0
    for r in rows:
        if r.source != r8._COVERAGE_PLANT_SOURCE:
            assert r.unk_chars == 0 and r.char_coverage_ppm == 1000000
        assert r.vocab_chars > 0


def test_interleave_assembly_conservation(spark, sf_dir):
    """Conservation law: every KEPT media fingerprint lands in exactly
    one record, and nothing else does — media segment count equals the
    number of distinct exact fingerprint groups per modality."""
    import pyspark.sql.functions as F

    from weather_analysis_bigdata__spark import queries_round8 as r8
    from weather_analysis_bigdata__spark.operators.multimodal import (
        ppm_phash,
        synth_media,
        wav_fingerprint,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    out = r8.multimodal_interleave_assembly(spark, sf_dir)
    by_kind = {
        r.kind: r.n
        for r in out.groupBy("kind").agg(F.count("*").alias("n")).collect()
    }
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    n_img_groups = (
        ppm_phash(synth_media(ids, "ppm"))
        .select("w", "h", "phash").distinct().count()
    )
    n_aud_groups = (
        wav_fingerprint(synth_media(ids, "wav"))
        .select("sample_rate", "n_frames", "afp").distinct().count()
    )
    assert by_kind["image"] == n_img_groups
    assert by_kind["audio"] == n_aud_groups
    # Exactly-one-record: the image segments' doc set IS the set of
    # min-doc_id representatives per (w, h, phash) group, computed
    # independently. (media_ref alone is NOT the group key — distinct
    # (w, h) groups may share a phash value.)
    img_docs = {
        r.doc_id for r in out.filter("kind = 'image'").collect()
    }
    reps = {
        r.rep
        for r in ppm_phash(synth_media(ids, "ppm"))
        .groupBy("w", "h", "phash")
        .agg(F.min("doc_id").alias("rep"))
        .collect()
    }
    assert img_docs == reps


def test_interleave_assembly_sequence_shape(spark, sf_dir):
    """Per record: seq is dense 0..n-1, media follows the paragraph its
    hash addresses, and the accounting columns are internally
    consistent on every row."""
    from collections import defaultdict

    from weather_analysis_bigdata__spark import queries_round8 as r8

    rows = r8.multimodal_interleave_assembly(spark, sf_dir).collect()
    recs = defaultdict(list)
    for r in rows:
        recs[r.doc_id].append(r)
    for doc, rs in recs.items():
        rs.sort(key=lambda r: r.seq)
        assert [r.seq for r in rs] == list(range(len(rs)))
        text_t = sum(r.token_cost for r in rs if r.kind == "text")
        media_t = sum(r.token_cost for r in rs if r.kind != "text")
        n_media = sum(1 for r in rs if r.kind != "text")
        for r in rs:
            assert r.rec_text_tokens == text_t
            assert r.rec_media_tokens == media_t
            assert r.rec_total_tokens == text_t + media_t
            assert r.rec_media_segments == n_media
        # text spans keep their original order
        wins = [r.win_id for r in rs if r.kind == "text"]
        assert wins == sorted(wins)


def test_pack_interleaved_conservation_vs_assembly(spark, sf_dir):
    """The packed shards' corpus-wide totals must equal the assembly's
    record totals exactly (same keep decisions, same costs), and every
    record lands in exactly one shard."""
    import pyspark.sql.functions as F

    from weather_analysis_bigdata__spark import queries_round8 as r8

    shards = r8.pack_interleaved_records(spark, sf_dir).collect()
    asm = (
        r8.multimodal_interleave_assembly(spark, sf_dir)
        .filter("seq = 0")  # one row per record
        .agg(
            F.count("*").alias("n"),
            F.sum("rec_text_tokens").alias("t"),
            F.sum("rec_media_tokens").alias("m"),
            F.sum("rec_media_segments").alias("s"),
        )
        .collect()[0]
    )
    assert sum(r.n_records for r in shards) == asm.n
    assert sum(r.text_tokens for r in shards) == asm.t
    assert sum(r.media_tokens for r in shards) == asm.m
    assert sum(r.n_media_segments for r in shards) == asm.s
    # Contiguity: shards are doc_id ranges that never overlap.
    ordered = sorted(shards, key=lambda r: r.shard_id)
    for a, b in zip(ordered, ordered[1:]):
        assert a.last_doc < b.first_doc
    # Fill: every shard except the last is at/above budget minus one
    # record's worth (contiguous close-on-overflow packing).
    for r in ordered[:-1]:
        assert r.total_tokens >= 1  # non-empty
        assert r.fill_ratio > 0.5


def test_streaming_decon_replay_equals_batch(spark, sf_dir):
    """Stream ≡ batch for the semantic decontamination gate: the
    3-micro-batch replay must reproduce the batch report verbatim."""
    from weather_analysis_bigdata__spark import queries_round8 as r8

    batch = {
        r.doc_id: r for r in
        r8.decontaminate_semantic(spark, sf_dir).collect()
    }
    replay = {
        r.doc_id: r for r in
        r8.streaming_decontaminate_semantic_replay(spark, sf_dir).collect()
    }
    assert batch.keys() == replay.keys()
    for d, b in batch.items():
        assert replay[d] == b


def test_decon_sweep_monotone_and_plateau(spark, sf_dir):
    """Flag counts must be nonincreasing in τ; the planted positives
    must hold a full plateau that includes the production τ; and the
    τ = production-threshold row must agree with the gate itself."""
    from weather_analysis_bigdata__spark import queries_round8 as r8

    rows = sorted(
        r8.decontaminate_semantic_threshold_sweep(spark, sf_dir).collect(),
        key=lambda r: r.threshold_rank,
    )
    n_planted = rows[-1].n_planted_flagged
    assert n_planted > 0  # the known positives survive the top of grid
    prev = None
    for r in rows:
        assert r.n_flagged == r.n_planted_flagged + r.n_organic_flagged
        if prev is not None:
            assert r.n_flagged <= prev
        prev = r.n_flagged
        if abs(r.tau - r8._DECON_TAU) < 1e-9:
            gate = (
                r8.decontaminate_semantic(spark, sf_dir)
                .filter("semantic_contaminated")
                .count()
            )
            assert r.n_flagged == gate
        if r.tau >= 0.55:
            assert r.n_planted_flagged == n_planted  # plateau
