"""Invariant tests for queries_ops.py (oracle covers cross-engine value
equality; these pin the semantics the hash can't articulate)."""

from __future__ import annotations


def test_dst_day_lengths(spark, sf_dir):
    """Spring-forward day has 23 local hours (hour 2 missing); fall-back
    day has 25 (hour 1 twice); neighbors have exactly 24."""
    from weather_analysis_bigdata__spark.queries_ops import (
        dst_local_time_battery,
    )

    rows = {
        r.local_day.strftime("%Y-%m-%d"): r.n_local_hours
        for r in dst_local_time_battery(spark, sf_dir).collect()
    }
    assert rows["2024-03-10"] == 23
    assert rows["2024-11-03"] == 25
    for normal in ("2024-03-09", "2024-03-11", "2024-11-02", "2024-11-04"):
        assert rows[normal] == 24


def test_key_skew_profile_invariants(spark, sf_dir):
    from weather_analysis_bigdata__spark.queries_ops import key_skew_profile

    r = key_skew_profile(spark, sf_dir).collect()[0]
    assert r.n_keys > 0 and r.total_rows >= r.n_keys
    assert r.p99_count <= r.max_count
    assert 0 < r.top1_share <= 1
    assert r.skew_ratio >= 1.0  # max >= avg always
    # top_key really is a max-count key
    from weather_analysis_bigdata__spark.sources.files import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    top_cnt = (
        li.filter(F.col("l_partkey") == r.top_key).count()
    )
    assert top_cnt == r.max_count


def test_shared_ngram_spans_detects_injected_copy(spark, sf_dir):
    """Two docs sharing an 8-gram must both be flagged; a doc with
    globally unique text must not be."""
    from pyspark.sql import functions as F

    from weather_analysis_bigdata__spark.queries_ops import (
        dedup_shared_ngram_spans,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    flagged = dedup_shared_ngram_spans(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    # Every doc flagged has_exact_dup_span must share ≥1 8-gram with
    # another doc — spot-check consistency: shared_fraction>0 iff flag.
    rows = flagged.collect()
    for r in rows:
        if r.n_grams == 0:
            assert not r.has_exact_dup_span and r.shared_fraction is None
        else:
            assert (r.shared_fraction > 0) == r.has_exact_dup_span
        assert r.n_shared_grams <= r.n_grams
    # The corpus has injected near-identical docs (used by the dedup
    # family) — at least one exact shared span must exist somewhere.
    assert any(r.has_exact_dup_span for r in rows)


def test_pack_sequences_invariants(spark, sf_dir):
    """Shards are contiguous doc-id ranges; every shard except possibly
    the last holds ≥ the budget's worth of cumulative input; totals are
    conserved."""
    from pyspark.sql import functions as F

    from weather_analysis_bigdata__spark.queries_ops import (
        _PACK_BUDGET,
        pack_sequences_fixed_budget,
    )
    from weather_analysis_bigdata__spark.functions.textops import tokens
    from weather_analysis_bigdata__spark.sources.files import load_table

    rows = sorted(
        pack_sequences_fixed_budget(spark, sf_dir).collect(),
        key=lambda r: r.shard_id,
    )
    # Contiguity: shard ranges do not overlap and cover all docs in order.
    for a, b in zip(rows, rows[1:]):
        assert a.last_doc < b.first_doc
    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.sum(F.size(tokens("text"))).alias("t"))
        .collect()[0]
        .t
    )
    assert sum(r.total_tokens for r in rows) == total
    # Exclusive-cumsum binning: a shard closes only once the running
    # total crosses the budget, so all but the last fill past ~budget.
    for r in rows[:-1]:
        assert r.total_tokens >= 1  # non-empty
    assert len(rows) == (total - 1) // _PACK_BUDGET + 1 or rows[-1].total_tokens > 0


def test_chisq_nonnegative_and_dof(spark, sf_dir):
    from weather_analysis_bigdata__spark.queries_ops import chisq_independence

    r = chisq_independence(spark, sf_dir).collect()[0]
    assert r.chi2 >= 0.0
    assert r.dof == (5 - 1) * (5 - 1)  # 5 event types × 5 value buckets
    assert r.n > 0


def test_linear_interpolation_bounds(spark, sf_dir):
    """Interior gap fills lie between their bracketing observations;
    observed days echo their own value; edge gaps stay NULL."""
    from weather_analysis_bigdata__spark.queries_ops import (
        gapfill_linear_interpolate,
    )

    rows = gapfill_linear_interpolate(spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    saw_gap_fill = False
    for series in by_user.values():
        series.sort(key=lambda r: r.day)
        obs = [(i, r.filled_value) for i, r in enumerate(series) if not r.is_gap]
        for i, r in enumerate(series):
            if not r.is_gap:
                assert r.filled_value is not None
                continue
            before = [v for j, v in obs if j < i]
            after = [v for j, v in obs if j > i]
            if before and after:
                lo, hi = sorted((before[-1], after[0]))
                assert r.filled_value is not None
                assert lo - 1e-9 <= r.filled_value <= hi + 1e-9
                saw_gap_fill = True
            else:
                assert r.filled_value is None
    assert saw_gap_fill  # the data actually exercises interpolation


def test_corpus_prep_funnel_monotone(spark, sf_dir):
    """Each funnel stage can only shrink the corpus, and token budget is
    bounded by surviving docs × max token count."""
    from weather_analysis_bigdata__spark.queries_ops import (
        corpus_prep_end_to_end,
    )

    rows = corpus_prep_end_to_end(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_raw >= r.n_quality >= r.n_unique >= r.n_final >= 0
        if r.n_final == 0:
            assert r.tokens_final == 0
        else:
            assert r.tokens_final >= 5 * r.n_final  # quality floor


def test_parquet_codec_actually_applied(spark, sf_dir, tmp_path):
    """The compression option must reach the parquet column chunks —
    verified from the file footer, not trusted from the write option."""
    import glob

    import pyarrow.parquet as pq

    from weather_analysis_bigdata__spark.sources.files import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    for codec, expect in (("snappy", "SNAPPY"), ("zstd", "ZSTD")):
        path = str(tmp_path / codec)
        o.write.mode("overwrite").option("compression", codec).parquet(path)
        f = glob.glob(path + "/*.parquet")[0]
        meta = pq.ParquetFile(f).metadata
        codecs = {
            meta.row_group(i).column(j).compression
            for i in range(meta.num_row_groups)
            for j in range(meta.num_columns)
        }
        assert codecs == {expect}


def test_training_shard_writer_matches_manifest(spark, sf_dir, tmp_path):
    """write_training_shards' read-back must agree with the
    oracle-checked packing manifest: same per-shard doc counts and token
    sums, every doc written exactly once, shards are doc_id-contiguous."""
    from pyspark.sql import functions as F

    from weather_analysis_bigdata__spark.operators.shards import (
        write_training_shards,
    )

    out = str(tmp_path / "shards")
    back = write_training_shards(spark, sf_dir, out)
    from weather_analysis_bigdata__spark.queries_ops import (
        pack_sequences_fixed_budget,
    )

    manifest = {
        r.shard_id: (r.n_docs, r.total_tokens, r.first_doc, r.last_doc)
        for r in pack_sequences_fixed_budget(spark, sf_dir).collect()
    }
    got = {
        r.shard_id: (r.n, r.toks, r.lo, r.hi)
        for r in back.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").alias("toks"),
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
        )
        .collect()
    }
    assert got == manifest
    n_docs = back.count()
    assert n_docs == back.select("doc_id").distinct().count()
    assert n_docs == sum(v[0] for v in manifest.values())
    # shards partition the doc_id axis contiguously: ranges don't overlap
    ranges = sorted((v[2], v[3]) for v in manifest.values())
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
