"""Round-9 tests: semantic controls the oracle compare can't express —
the CC over-merge audit's planted chain, and the realized-plan fixes
for the dead broadcast hint (postings upsert/compact)."""

from __future__ import annotations


def test_cc_overmerge_planted_control(spark, sf_dir):
    """The planted chain (cc_chained_docs: B = A + 25 filler tokens,
    C = A + 50) must surface as transitive over-merge: C lands in A's
    cluster via B although jaccard(A, C) < tau, so the planted group
    reports over-merged docs with non-zero token mass. A zero here
    means the audit itself is broken (the failing-gate role
    no_missed_duplicates plays for the Bloom audit)."""
    from weather_analysis_bigdata__spark.queries_round9 import (
        dedup_cc_overmerge_audit,
    )

    rows = {
        r.doc_group: r
        for r in dedup_cc_overmerge_audit(spark, sf_dir).collect()
    }
    assert set(rows) == {"planted", "organic"}
    p = rows["planted"]
    assert p.n_clusters > 0
    assert p.n_overmerged_docs > 0, "planted chain not detected"
    assert p.overmerged_tokens > 0
    assert 0 < p.overmerged_ppm <= 1_000_000
    # Over-merged docs are a subset of the group's non-rep docs.
    assert p.n_overmerged_docs <= p.n_nonrep_docs
    o = rows["organic"]
    assert o.n_overmerged_docs <= o.n_nonrep_docs


def test_cc_overmerge_matches_bruteforce(spark, sf_dir):
    """Independent recomputation: rebuild clusters and rep similarity
    with plain Python sets over the collected shingle table, and match
    the audit's counts exactly."""
    from weather_analysis_bigdata__spark.operators.components import (
        connected_components,
    )
    from weather_analysis_bigdata__spark.queries_llmops import (
        _shingles,
        cc_chained_docs,
        cc_jaccard_edges,
    )
    from weather_analysis_bigdata__spark.queries_round9 import (
        _CC_TAU_DEN,
        _CC_TAU_NUM,
        dedup_cc_overmerge_audit,
    )

    docs = cc_chained_docs(spark, sf_dir)
    comp = {
        r.node: r.comp
        for r in connected_components(cc_jaccard_edges(docs)).collect()
    }
    sh: dict = {}
    for r in _shingles(docs).collect():
        sh.setdefault(r.doc_id, set()).add(r.gram)
    ntok = {
        r.doc_id: len(r.text.split()) for r in docs.collect()
    }
    planted_cluster = {}
    for node, c in comp.items():
        planted_cluster[c] = planted_cluster.get(c, False) or node >= 3000000
    want = {
        g: {"nonrep": 0, "over": 0, "tokens": 0}
        for g in ("planted", "organic")
    }
    for node, c in comp.items():
        if node == c:
            continue
        g = "planted" if planted_cluster[c] else "organic"
        want[g]["nonrep"] += 1
        common = len(sh[node] & sh[c])
        union = len(sh[node]) + len(sh[c]) - common
        if _CC_TAU_DEN * common < _CC_TAU_NUM * union:
            want[g]["over"] += 1
            want[g]["tokens"] += ntok[node]

    got = {
        r.doc_group: r
        for r in dedup_cc_overmerge_audit(spark, sf_dir).collect()
    }
    for g in ("planted", "organic"):
        assert got[g].n_nonrep_docs == want[g]["nonrep"]
        assert got[g].n_overmerged_docs == want[g]["over"]
        assert got[g].overmerged_tokens == want[g]["tokens"]


def test_postings_upsert_no_dead_hint(spark, sf_dir):
    """The round-8 driver tail logged 'Hint (strategy=broadcast) is not
    supported: build left for left outer join' — the preserved (small)
    side of the postings left joins carried a broadcast hint Spark
    must ignore. The fixed shape (broadcast-semi filter + build-right
    broadcast left join) must realize ZERO sort-merge joins and keep
    the base dictionary un-shuffled."""
    from weather_analysis_bigdata__spark.registry import all_queries

    qs = all_queries()
    for name in ("postings_index_upsert", "postings_index_compact"):
        df = qs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" not in plan, name
        assert plan.count("BroadcastHashJoin") >= 2, name


def test_pca_incremental_update_equals_scratch(spark, sf_dir):
    """The additive-statistics contract: merging the persisted base
    moments with the delta slice's moments and re-solving must equal
    the from-scratch solve over the full corpus, loading for loading
    (exact integers — no tolerance)."""
    from weather_analysis_bigdata__spark.queries_round8b import (
        _pca_moments,
        _pca_power_solve,
        embedding_pca_top_component,
    )
    from weather_analysis_bigdata__spark.queries_round9 import (
        embedding_pca_incremental_update,
    )

    upd = {
        r.pos: r
        for r in embedding_pca_incremental_update(spark, sf_dir).collect()
    }
    scratch = {
        r.pos: r
        for r in embedding_pca_top_component(spark, sf_dir).collect()
    }
    assert set(upd) == set(scratch)
    for pos, row in scratch.items():
        assert upd[pos].loading_q == row.loading_q
        assert upd[pos].eigenvalue_q == row.eigenvalue_q
        assert upd[pos].n_vectors == row.n_vectors

    # Drift sanity: base is 4/5 of the corpus, so the updated
    # component must stay strongly aligned with the base one.
    drift = next(iter(upd.values())).drift_cos2_ppm
    assert 0 <= drift <= 1_000_000
    assert drift > 500_000, "4/5-corpus base should not flip direction"

    # Independent merge check in pure Python.
    gram_f, s_f, n_f = _pca_moments(spark, sf_dir)
    v_f, lam_f, _, _ = _pca_power_solve(gram_f, s_f, n_f)
    assert [upd[p].loading_q for p in range(len(v_f))] == v_f
    assert next(iter(upd.values())).eigenvalue_q == lam_f


def test_pack_efficiency_monotonicity(spark, sf_dir):
    """BFD must never use more bins than the greedy streaming packer
    (measured on every packer slice), both must respect the
    ceil-lower-bound, and the planted adversarial arrival (packer 0)
    must show a strict greedy > BFD gap — the positive control
    proving the audit prices order-sensitivity."""
    from weather_analysis_bigdata__spark.queries_round9 import (
        pack_efficiency_audit,
    )

    rows = pack_efficiency_audit(spark, sf_dir).collect()
    assert len(rows) == 8
    planted = [r for r in rows if r.has_planted]
    assert len(planted) == 1 and planted[0].packer_id == 0
    for r in rows:
        assert r.bfd_bins >= r.lb_bins
        assert r.greedy_bins >= r.bfd_bins
        assert r.bfd_fill_ppm >= r.greedy_fill_ppm
        assert r.bfd_gain_ppm == r.bfd_fill_ppm - r.greedy_fill_ppm
        assert 0 < r.bfd_fill_ppm <= 1_000_000
    p = planted[0]
    assert p.greedy_bins > p.bfd_bins, "planted adversarial order missed"
    assert p.bfd_gain_ppm > 0


def test_no_unbounded_following_frames():
    """Spark evaluates CURRENT ROW -> UNBOUNDED FOLLOWING frames in
    O(partition^2) (UnboundedFollowingWindowFunctionFrame re-scans to
    the partition end per row; measured 20k rows -> 8.7s, 40k -> 29.7s)
    — fatal under a hot key. Every forward fill must ride the fully
    reversed sort with the incremental backward frame instead. This
    guard greps the package so the frame cannot quietly return; oracle
    SQL (DuckDB, linear evaluation) is exempt by the string check
    running only on Python window-builder forms."""
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "weather_analysis_bigdata__spark",
    )
    offenders = []
    for root, _dirs, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path) as f:
                src = f.read()
            # The PySpark builder form: rowsBetween(currentRow,
            # unboundedFollowing) / rangeBetween(...). SQL strings are
            # oracle-side (DuckDB) and allowed.
            for m in re.finditer(
                r"(?:rows|range)Between\(\s*Window\.currentRow\s*,"
                r"\s*Window\.unboundedFollowing", src
            ):
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{path}:{line}")
    assert not offenders, (
        "O(partition^2) forward window frame reintroduced: "
        + ", ".join(offenders)
    )


def test_cc_incremental_paths(spark, sf_dir):
    """Every assignment path of the incremental clustering, via its
    planted controls: re-submissions attach to their originals'
    components; suffixed novels form singleton new clusters; the
    duplicated novel pair forms ONE new cluster labeled by the smaller
    id; the geometric bridge (D = base+P+Q between published
    singletons X = base+P, Y = base+Q) attaches with would_merge=true
    and exactly 2 existing components. Cluster-id stability: no
    output row may carry an assigned_component that rewrites a
    published label."""
    from weather_analysis_bigdata__spark.queries_round9 import (
        _MG_D_ID,
        _MG_X_ID,
        _PAIR_IDS,
        _cc_components_index,
        dedup_cc_incremental,
    )

    rows = {r.doc_id: r for r in dedup_cc_incremental(spark, sf_dir).collect()}
    comp = {
        r.node: r.comp for r in _cc_components_index(spark, sf_dir).collect()
    }

    resub = {d: r for d, r in rows.items() if 5_000_000 <= d < 6_000_000}
    assert resub, "no re-submissions in the batch"
    for d, r in resub.items():
        orig = d - 5_000_000
        assert not r.is_new_cluster
        assert r.n_corpus_neighbors >= 1
        # The original is a neighbor at jaccard 1.0, so the assigned
        # component can never exceed the original's published label.
        assert r.assigned_component <= comp.get(orig, orig)

    novel = {d: r for d, r in rows.items() if 6_000_000 <= d < 7_000_000}
    assert novel, "no novels in the batch"
    for d, r in novel.items():
        assert r.is_new_cluster
        assert r.assigned_component == d
        assert r.n_corpus_neighbors == 0

    a, b = sorted(_PAIR_IDS)
    assert rows[a].is_new_cluster and rows[b].is_new_cluster
    assert rows[a].assigned_component == a
    assert rows[b].assigned_component == a

    d = rows[_MG_D_ID]
    assert not d.is_new_cluster
    assert d.would_merge
    assert d.n_existing_components == 2
    assert d.assigned_component == _MG_X_ID

    # Stability, asserted path-by-path (the prior disjunction was a
    # tautology — attached rows satisfied `not is_new_cluster` and
    # new-cluster rows always carry a batch id, so the published-label
    # rewrite it claimed to guard could never fail it): new clusters
    # mint BATCH ids that never collide with a published label;
    # attachments reuse published labels or singleton corpus ids,
    # never a batch id.
    from weather_analysis_bigdata__spark.queries_round9 import (
        _cci_corpus_df,
    )

    published = set(comp.values())
    batch_ids = set(rows)
    corpus_ids = {
        r.doc_id
        for r in _cci_corpus_df(spark, sf_dir).select("doc_id").collect()
    }
    for r in rows.values():
        if r.is_new_cluster:
            assert r.assigned_component in batch_ids
            assert r.assigned_component not in published
        else:
            assert r.assigned_component in (published | corpus_ids)
            assert r.assigned_component not in batch_ids


def test_cc_incremental_stream_equals_batch(spark, sf_dir):
    """Exact row-set equality between the streaming replay and the
    one-shot batch assignment (the stream ≡ batch contract every
    replay in this repo carries)."""
    from weather_analysis_bigdata__spark.queries_round9 import (
        dedup_cc_incremental,
        streaming_cc_incremental_replay,
    )

    batch = {
        tuple(r) for r in dedup_cc_incremental(spark, sf_dir).collect()
    }
    stream = {
        tuple(r)
        for r in streaming_cc_incremental_replay(spark, sf_dir).collect()
    }
    assert batch == stream


def test_pca_update_stream_equals_batch(spark, sf_dir):
    """Moment accumulation commutes with micro-batching: the streamed
    update's rows must equal the one-shot batch update's exactly."""
    from weather_analysis_bigdata__spark.queries_round9 import (
        embedding_pca_incremental_update,
        streaming_embedding_pca_update_replay,
    )

    batch = {
        tuple(r)
        for r in embedding_pca_incremental_update(spark, sf_dir).collect()
    }
    stream = {
        tuple(r)
        for r in streaming_embedding_pca_update_replay(
            spark, sf_dir
        ).collect()
    }
    assert batch == stream
