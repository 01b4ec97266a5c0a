"""Tests for the corpus-hygiene batch (queries_hygiene): paragraph
dedup with a planted duplicate (positive control), epoch-shuffle
permutation properties, token-budget prefix algebra."""

from __future__ import annotations

import hashlib

import pytest


@pytest.fixture(scope="module")
def registry():
    from weather_analysis_bigdata__spark.registry import all_queries

    return all_queries()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_paragraph_dedup_removes_planted_shared_paragraph(spark):
    """A paragraph (8-token window) shared by two docs is removed from
    BOTH; unique paragraphs survive; fingerprints match the expected
    reconstruction exactly."""
    from weather_analysis_bigdata__spark.queries_hygiene import (
        paragraph_dedup,
    )

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    a_tail = "a1 a2 a3"
    b_own = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = spark.createDataFrame(
        [
            # doc 0: shared window then a ragged unique tail
            (0, f"{shared} {a_tail}"),
            # doc 1: unique full window, then the shared window
            (1, f"{b_own} {shared}"),
            # doc 2: entirely unique, shorter than one window
            (2, "c1 c2"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert rows[0].n_paras == 2 and rows[0].n_removed == 1
    assert rows[0].kept_tokens == 3
    assert rows[0].kept_fp == _md5(a_tail)
    assert rows[1].n_paras == 2 and rows[1].n_removed == 1
    assert rows[1].kept_fp == _md5(b_own)
    assert rows[2].n_paras == 1 and rows[2].n_removed == 0
    assert rows[2].kept_fp == _md5("c1 c2")


def test_paragraph_dedup_all_removed_doc_keeps_row(spark):
    """A doc whose every paragraph is shared still reports a row, with
    the md5 of the empty string as its fingerprint."""
    from weather_analysis_bigdata__spark.queries_hygiene import (
        paragraph_dedup,
    )

    shared = "x1 x2 x3 x4 x5 x6 x7 x8"
    docs = spark.createDataFrame(
        [(0, shared), (1, shared)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert len(rows) == 2
    for r in rows.values():
        assert r.n_removed == 1 and r.kept_tokens == 0
        assert r.kept_fp == _md5("")


def test_epoch_shuffle_is_permutation_and_deterministic(spark, sf_dir, registry):
    fn = registry["epoch_shuffle_order"].fn
    a = {r.epoch: r for r in fn(spark, sf_dir).collect()}
    b = {r.epoch: r for r in fn(spark, sf_dir).collect()}
    assert set(a) == {0, 1, 2}
    n = a[0].n_docs
    heads = set()
    for ep, r in a.items():
        # each epoch is a permutation 0..N-1
        assert r.n_docs == n
        assert r.n_ordinals == n
        assert r.min_ord == 0 and r.max_ord == n - 1
        assert len(r.head5.split(",")) == 5
        heads.add(r.head5)
        # bit-stable across runs
        assert b[ep].ord_checksum == r.ord_checksum
        assert b[ep].head5 == r.head5
    # epochs are DIFFERENT permutations (md5 keyed by epoch)
    assert len(heads) == 3


def test_token_budget_prefix_flags_are_prefixes(spark, sf_dir, registry):
    rows = sorted(
        registry["token_budget_pareto"].fn(spark, sf_dir).collect(),
        key=lambda r: r.pareto_rank,
    )
    grand = rows[0].grand_toks
    assert all(r.grand_toks == grand for r in rows)
    assert grand == sum(r.total_toks for r in rows)
    # cumulative sums rebuild exactly; ranks are dense from 1
    cum = 0
    for i, r in enumerate(rows, start=1):
        assert r.pareto_rank == i
        cum += r.total_toks
        assert r.cum_toks == cum
        assert r.share_ppm == r.total_toks * 1_000_000 // grand
        assert r.cum_share_ppm == r.cum_toks * 1_000_000 // grand
    # the p50/p90 heads are PREFIXES of the Pareto order, and minimal:
    # the last flagged row is the first whose cumulative crosses.
    for flag, num, den in (("in_p50_head", 1, 2), ("in_p90_head", 9, 10)):
        flags = [getattr(r, flag) for r in rows]
        k = sum(flags)
        assert flags == [1] * k + [0] * (len(rows) - k)
        assert rows[k - 1].cum_toks * den >= grand * num
        if k > 1:
            assert rows[k - 2].cum_toks * den < grand * num


def test_incremental_verdicts_by_planted_slice(spark, sf_dir, registry):
    """Re-submissions → duplicate, one-token edits → partial (full
    windows known, tail novel), synthetic docs → novel."""
    rows = registry["dedup_paragraph_incremental"].fn(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r.n_known + r.n_novel == r.n_paras
        if r.doc_id < 2000000:
            assert r.verdict == "duplicate" and r.n_novel == 0
        elif r.doc_id < 3000000:
            assert r.verdict == "novel" and r.n_known == 0
        else:
            assert r.verdict == "partial"
            assert r.n_novel >= 1 and r.n_known >= 1
    assert {r.verdict for r in rows} == {"duplicate", "partial", "novel"}


def test_streaming_paragraph_replay_equals_batch(spark, sf_dir, registry):
    a = {
        r.doc_id: (r.n_paras, r.n_known, r.n_novel, r.verdict)
        for r in registry["dedup_paragraph_incremental"]
        .fn(spark, sf_dir)
        .collect()
    }
    b = {
        r.doc_id: (r.n_paras, r.n_known, r.n_novel, r.verdict)
        for r in registry["streaming_paragraph_dedup_replay"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert a == b


def test_shard_manifest_tiles_token_axis(spark, sf_dir, registry):
    rows = sorted(
        registry["shard_manifest_fixed_tokens"].fn(spark, sf_dir).collect(),
        key=lambda r: r.shard_id,
    )
    assert rows[0].start_tok == 0
    for prev, cur in zip(rows, rows[1:]):
        # consecutive present shards tile exactly (a skipped id would
        # mean one doc spanned a whole budget — still tiles)
        assert cur.start_tok == prev.end_tok
        # a shard starts because the budget was crossed
        assert cur.start_tok >= cur.shard_id * 512
        assert prev.end_tok > prev.shard_id * 512
    for r in rows:
        assert r.end_tok - r.start_tok == r.shard_tokens
        assert r.n_docs >= 1
    total = sum(r.shard_tokens for r in rows)
    assert total == rows[-1].end_tok


def test_curriculum_anneal_shape(spark, sf_dir, registry):
    rows = registry["curriculum_anneal_schedule"].fn(
        spark, sf_dir
    ).collect()
    by = {(r.epoch, r.tertile): r for r in rows}
    assert set(by) == {(e, t) for e in (0, 1, 2) for t in (1, 2, 3)}
    for e in (0, 1, 2):
        # the anneal: epoch e keeps tertiles 1..3-e
        for t in (1, 2, 3):
            assert by[(e, t)].kept == (1 if t <= 3 - e else 0)
        # tertile populations are the ntile split (sizes differ by <=1)
        sizes = [by[(e, t)].n_docs for t in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1
        # quality key is tokens desc -> head outweighs tail
        toks = [by[(e, t)].sum_tokens for t in (1, 2, 3)]
        assert toks[0] >= toks[1] >= toks[2]
        # epoch axis replicates the same tertile table
        assert sizes == [by[(0, t)].n_docs for t in (1, 2, 3)]


def test_loader_resume_window_contract(spark, sf_dir, registry):
    fn = registry["loader_resume_window"].fn
    rows = sorted(fn(spark, sf_dir).collect(), key=lambda r: r.ordinal)
    assert [r.ordinal for r in rows] == list(range(100, 125))
    assert [r.batch_pos for r in rows] == list(range(25))
    # stateless: a re-run reproduces the identical batch
    again = sorted(fn(spark, sf_dir).collect(), key=lambda r: r.ordinal)
    assert [r.doc_id for r in rows] == [r.doc_id for r in again]
    # and it agrees with the FULL epoch-1 shuffle's ordinals
    from weather_analysis_bigdata__spark.queries_hygiene import (
        epoch_shuffle,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    full = {
        r.ordinal: r.doc_id
        for r in epoch_shuffle(
            load_table(spark, sf_dir, "documents").select("doc_id")
        )
        .filter("epoch = 1 AND ordinal >= 100 AND ordinal < 125")
        .collect()
    }
    assert {r.ordinal: r.doc_id for r in rows} == full


def test_pack_boundaries_fill_and_conservation(spark, sf_dir, registry):
    rows = sorted(
        registry["pack_concat_chunk_boundaries"].fn(spark, sf_dir).collect(),
        key=lambda r: r.seq_id,
    )
    # contiguous sequence ids from 0
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    # every sequence but the final ragged one is exactly full
    for r in rows[:-1]:
        assert r.filled_tokens == 256
    assert 0 < rows[-1].filled_tokens <= 256
    # token conservation: fills sum to the corpus token count
    from weather_analysis_bigdata__spark.functions.textops import tokens
    from weather_analysis_bigdata__spark.sources.files import load_table
    from pyspark.sql import functions as F

    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.sum(F.size(tokens(F.col("text")))).alias("t"))
        .collect()[0]
        .t
    )
    assert sum(r.filled_tokens for r in rows) == total
    # docs straddle sequences: more fragments than distinct docs overall
    assert sum(r.n_segments for r in rows) > max(
        r.n_docs for r in rows
    )


def test_postings_compact_decision_branches(spark, sf_dir, registry):
    rows = registry["postings_index_compact"].fn(spark, sf_dir).collect()
    assert rows
    flags = {r.compacted for r in rows}
    assert flags == {0, 1}  # both maintenance branches execute
    for r in rows:
        assert r.df_after == r.df_before + r.df_delta - r.df_removed
        assert r.df_after >= 0 and r.tf_after >= 0
        assert r.df_delta + r.df_removed >= 1  # touched terms only
        if r.df_before == 0:
            # brand-new terms always rewrite into the base
            assert r.compacted == 1 and r.df_removed == 0


def test_bloom_paragraph_dedup_dominance_and_false_drops(
    spark, sf_dir, registry
):
    """The Bloom form's guarantees, checked against the exact form at
    the corpus level: (a) dominance — every paragraph the exact form
    removes, the Bloom form removes too (no missed duplicates, per doc:
    n_removed_bloom >= n_removed_exact); (b) the approximation is real
    — the sketch is sized so false drops occur (audit n_false_drops >
    0); (c) docs untouched by either form keep identical fingerprints."""
    exact = {
        r.doc_id: r
        for r in registry["dedup_paragraph_corpus"].fn(spark, sf_dir).collect()
    }
    bloom = {
        r.doc_id: r
        for r in registry["dedup_paragraph_bloom"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(bloom)
    for did, e in exact.items():
        b = bloom[did]
        assert b.n_paras == e.n_paras
        assert b.n_removed >= e.n_removed, f"missed duplicate in doc {did}"
        if b.n_removed == e.n_removed:
            assert b.kept_fp == e.kept_fp
    audit = registry["dedup_paragraph_bloom_audit"].fn(spark, sf_dir).collect()[0]
    assert audit.no_missed_duplicates is True
    assert audit.n_false_drops > 0  # non-vacuous approximation
    assert audit.n_dropped_bloom == audit.n_dup_exact + audit.n_false_drops


def test_bloom_sketch_positive_control_forced_collision(spark):
    """Positive control for the false-drop mechanism itself: with a
    planted corpus and the REAL kernel run at sketch positions derived
    from the real hash, a duplicated paragraph must be dropped
    (dominance) — and the estimate for every unique paragraph is >= 1
    and >= its df (the invariant the audit's no_missed_duplicates
    encodes)."""
    from pyspark.sql import functions as F

    from weather_analysis_bigdata__spark.functions.textops import md5s
    from weather_analysis_bigdata__spark.queries_hygiene import (
        _pb_estimates,
        paragraphs,
    )

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = spark.createDataFrame(
        [(0, f"{shared} a1 a2 a3"), (1, f"b1 b2 b3 b4 b5 b6 b7 b8 {shared}")],
        "doc_id long, text string",
    )
    dp = (
        docs.select(
            "doc_id",
            F.posexplode(paragraphs(F.col("text"))).alias("win_id", "para"),
        )
        .select("doc_id", "para", md5s(F.col("para")).alias("pid"))
    )
    from weather_analysis_bigdata__spark.queries_hygiene import _pb_pos

    pcnt = (
        dp.select("doc_id", "pid")
        .distinct()
        .select(
            F.explode(
                F.array(*[_pb_pos(F.col("pid"), i) for i in range(3)])
            ).alias("pos")
        )
        .groupBy("pos")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    est = {r.pid: r.est_df for r in _pb_estimates(docs, pcnt).collect()}
    df = {
        r.pid: r.df
        for r in dp.groupBy("pid")
        .agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    }
    assert set(est) == set(df)
    for pid, d in df.items():
        assert est[pid] >= d  # dominance per paragraph
    import hashlib

    shared_pid = hashlib.md5(shared.encode()).hexdigest()
    assert df[shared_pid] == 2 and est[shared_pid] >= 2


def test_paragraph_near_dup_planted_edit_positive_control(
    spark, sf_dir, registry
):
    """The verdict ladder on the planted batch: exact re-submissions
    are 'exact' on every window; one-token-appended edits land 'near'
    on rewritten tail windows (the rows the exact-hash ladder calls
    'novel' — the whole point of the near rung); synthetic novel docs
    never classify 'exact'; and for near hits the best match must be a
    REAL corpus paragraph pid."""
    rows = registry["dedup_paragraph_near"].fn(spark, sf_dir).collect()
    by_slice = {"dup": [], "edited": [], "novel": []}
    for r in rows:
        if r.doc_id >= 3_000_000:
            by_slice["edited"].append(r)
        elif r.doc_id >= 2_000_000:
            by_slice["novel"].append(r)
        else:
            by_slice["dup"].append(r)
    assert all(r.verdict == "exact" for r in by_slice["dup"])
    assert all(r.verdict != "exact" for r in by_slice["novel"])
    # the edited docs' full windows are untouched -> exact
    assert any(r.verdict == "exact" for r in by_slice["edited"])
    near_hits = [r for r in by_slice["edited"] if r.verdict == "near"]
    assert near_hits, "no edited tail window collided - near rung dead"
    # near hits carry a deterministic best match with >= threshold votes
    from weather_analysis_bigdata__spark.queries_hygiene import _PN_MIN_SIG

    for r in near_hits:
        assert r.best_pid is not None
        assert r.best_shared_sig >= _PN_MIN_SIG
        assert r.n_near >= 1
    # cross-check one near hit against the original document's tail
    # paragraph: the edited doc doc_id+3_000_000 appends one token, so
    # its LAST window is a superset-edit of the original's last window.
    import hashlib

    from weather_analysis_bigdata__spark.queries_hygiene import paragraphs
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 13 == 1)
        .select("doc_id", F.col("text"))
        .withColumn("paras", paragraphs(F.col("text")))
        .select("doc_id", F.element_at("paras", -1).alias("tail"))
        .collect()
    )
    orig_tail_pid = {
        r.doc_id + 3_000_000: hashlib.md5(r.tail.encode()).hexdigest()
        for r in docs
    }
    matched = [
        r
        for r in near_hits
        if orig_tail_pid.get(r.doc_id) == r.best_pid
    ]
    assert matched, "no near hit points at its own original tail window"


def test_corpus_drift_tv_controls(spark, sf_dir, registry):
    """Negative control: a distribution has zero TV distance against
    itself (shares are deterministic floor-div ppm). Positive: the
    planted arriving batch (with its synthetic 'nv…' vocabulary)
    genuinely drifts, and the summary algebra is consistent."""
    from pyspark.sql import functions as F

    from weather_analysis_bigdata__spark.queries_hygiene import (
        _drift_shares,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    a = _drift_shares(docs).select("bucket", F.col("share_ppm").alias("x"))
    b = _drift_shares(docs).select("bucket", F.col("share_ppm").alias("y"))
    self_tv = (
        a.join(b, "bucket", "full")
        .agg(F.sum(F.abs(F.col("x") - F.col("y"))).alias("s"))
        .collect()[0]
        .s
    )
    assert self_tv == 0

    row = registry["corpus_drift_tv"].fn(spark, sf_dir).collect()[0]
    assert row.tv_ppm > 0, "planted batch must register drift"
    assert 0 < row.n_buckets <= 256
    assert 0 <= row.n_drifted_buckets <= row.n_buckets
    assert row.max_drift_ppm >= row.tv_ppm // row.n_buckets


def test_streaming_drift_monitor_slice_ordering(spark, sf_dir, registry):
    """Per-batch drift is keyed to slice identity (the oracle proves
    the values; this pins the reading): the exact-resubmission slice
    drifts least, the novel-vocabulary slice most — by a wide margin."""
    rows = sorted(
        registry["streaming_drift_monitor_replay"].fn(spark, sf_dir).collect(),
        key=lambda r: r.batch_id,
    )
    assert [r.batch_id for r in rows] == [0, 1, 2]
    resub, edited, novel = rows
    assert resub.tv_ppm < edited.tv_ppm < novel.tv_ppm
    assert novel.tv_ppm > 10 * resub.tv_ppm


def test_paragraph_kernel_edge_parity_with_jvm_form(spark):
    """Round-11 verdict item 5 (now committed as a pytest): the Arrow
    segmenter `arrow_paragraph_rows` must emit rows IDENTICAL to the
    JVM `posexplode(paragraphs(text))` form it replaced, including on
    the whitespace edge cases where a trim/\\s+ mismatch is possible —
    Spark trim strips U+0020 ONLY (control chars at the edges survive),
    Java-regex \\s is the ASCII set [ \\t\\n\\x0B\\f\\r]. This probe
    caught a real bug in the first kernel draft (Python str.strip()
    strips the whole Unicode space set). NULL text additionally must
    null-propagate (emit no rows) exactly like posexplode over a NULL
    array."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from weather_analysis_bigdata__spark.functions.textops import (
        arrow_paragraph_rows,
    )
    from weather_analysis_bigdata__spark.queries_hygiene import paragraphs

    texts = [
        "",  # empty string → [''] from Java split → 1 window
        " ",  # space-only: trimmed to '' → ['']
        "\t\n",  # whitespace-only but NOT space: trim keeps it
        "\x00ctl\x00",  # control chars at the edges survive trim
        "a\x0bb\fc\rd\ne f\tg",  # every ASCII \s separator class
        "  lead and trail  ",  # U+0020 runs at both edges
        "one two three four five six seven eight nine",  # ragged tail
        " ".join(f"t{i}" for i in range(25)),  # 3 full windows + tail
        None,  # NULL text: both forms emit no rows
        "x",  # single token
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("text", T.StringType(), True),
            ]
        ),
    )
    jvm = df.select(
        "doc_id", F.posexplode(paragraphs(F.col("text"))).alias("win_id", "para")
    )
    kernel = arrow_paragraph_rows(df, w=8)
    jvm_rows = sorted((r.doc_id, r.win_id, r.para) for r in jvm.collect())
    k_rows = sorted((r.doc_id, r.win_id, r.para) for r in kernel.collect())
    assert k_rows == jvm_rows
    assert jvm_rows, "probe degenerated: JVM form emitted nothing"
