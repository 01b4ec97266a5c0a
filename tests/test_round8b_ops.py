"""Round-8 continuation tests: t-closeness invariants the oracle
compare can't express, and semantic controls for the PCA solver."""

from __future__ import annotations

from collections import Counter, defaultdict


def test_t_closeness_matches_bruteforce(spark, sf_dir):
    """Independent recomputation: collect the raw customer rows and
    rebuild every class TVD with a direct per-distribution algorithm
    (no common-denominator trick) — the exact integer numerator and
    the flag must match the query's output row for row."""
    import math

    from weather_analysis_bigdata__spark.queries_round8b import (
        t_closeness_audit,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    raw = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_acctbal", "c_mktsegment"
    ).collect()
    global_counts: Counter = Counter()
    classes: dict = defaultdict(Counter)
    for r in raw:
        band = math.floor(r.c_acctbal / 1000.0)
        classes[(r.c_nationkey, band)][r.c_mktsegment] += 1
        global_counts[r.c_mktsegment] += 1
    n_total = sum(global_counts.values())

    out = {
        (r.c_nationkey, r.balance_band): r
        for r in t_closeness_audit(spark, sf_dir).collect()
    }
    assert set(out) == set(classes)
    for key, seg_counts in classes.items():
        k = sum(seg_counts.values())
        num = sum(
            abs(seg_counts.get(s, 0) * n_total - gs * k)
            for s, gs in global_counts.items()
        )
        row = out[key]
        assert row.k == k
        assert row.tvd_num_scaled == num
        assert row.t_risk == (5 * num > 4 * k * n_total)
        assert abs(row.tvd - num / (2 * k * n_total)) < 1e-12
        assert 0.0 <= row.tvd <= 1.0


def test_t_closeness_identical_class_is_zero(spark, sf_dir):
    """A class whose distribution equals the global one has TVD 0; the
    audit's minimum must be ≥ 0 and the flag must be monotone in tvd
    (every flagged class has strictly larger tvd than every unflagged
    one is NOT required — the flag is a fixed threshold — but no class
    may be flagged at tvd ≤ 0.4 or unflagged at tvd > 0.4)."""
    from weather_analysis_bigdata__spark.queries_round8b import (
        t_closeness_audit,
    )

    for r in t_closeness_audit(spark, sf_dir).collect():
        if r.t_risk:
            assert r.tvd > 0.4
        else:
            assert r.tvd <= 0.4 + 1e-15


def test_pca_solver_finds_planted_dominant_direction():
    """Semantic control for the power iteration: moments of a corpus
    whose variance is concentrated on one axis must yield loadings
    concentrated on that axis with variance-explained ≈ 1e6 ppm."""
    from weather_analysis_bigdata__spark.queries_round8b import (
        _PCA_DIM,
        _PCA_VSCALE,
        _pca_power_solve,
    )

    d = _PCA_DIM
    axis = 5
    # 200 synthetic vectors: x = ±1000·e_axis plus a small deterministic
    # ripple on the other coordinates (so no moment is exactly zero).
    vecs = []
    for t in range(200):
        v = [((t * 7 + i) % 3) - 1 for i in range(d)]
        v[axis] = 1000 if t % 2 == 0 else -1000
        vecs.append(v)
    n = len(vecs)
    s = [sum(v[i] for v in vecs) for i in range(d)]
    gram = [
        [sum(v[i] * v[j] for v in vecs) for j in range(d)] for i in range(d)
    ]
    loadings, lam_q, var_ppm, _k = _pca_power_solve(gram, s, n)
    top = max(range(d), key=lambda i: abs(loadings[i]))
    assert top == axis
    assert abs(loadings[axis]) >= _PCA_VSCALE  # the renormalized peak
    others = max(abs(loadings[i]) for i in range(d) if i != axis)
    assert others < abs(loadings[axis]) // 100
    assert lam_q > 0
    assert var_ppm > 990_000  # essentially all variance on the axis


def test_pca_solver_sign_canonicalization():
    """Negating every input vector must produce the SAME loadings —
    the sign rule (first nonzero component positive) makes the
    eigenvector orientation deterministic."""
    from weather_analysis_bigdata__spark.queries_round8b import (
        _PCA_DIM,
        _pca_power_solve,
    )

    d = _PCA_DIM
    vecs = [[((t + i) % 5) - 2 + (3 if i == 9 else 0) for i in range(d)]
            for t in range(50)]
    neg = [[-x for x in v] for v in vecs]

    def moments(vs):
        n = len(vs)
        s = [sum(v[i] for v in vs) for i in range(d)]
        g = [[sum(v[i] * v[j] for v in vs) for j in range(d)]
             for i in range(d)]
        return g, s, n

    la, lam_a, ppm_a, _ = _pca_power_solve(*moments(vecs))
    lb, lam_b, ppm_b, _ = _pca_power_solve(*moments(neg))
    assert la == lb  # covariance is negation-invariant; sign rule pins v
    assert lam_a == lam_b
    assert ppm_a == ppm_b
    first = next((x for x in la if x != 0), 0)
    assert first >= 0


def test_pca_query_output_invariants(spark, sf_dir):
    """Corpus-level invariants: one row per dimension, a non-zero
    loading vector at the fixed-point scale, positive eigenvalue, ppm
    within (0, 1e6], and the sign canonicalization applied."""
    from weather_analysis_bigdata__spark.queries_round8b import (
        _PCA_DIM,
        embedding_pca_top_component,
    )

    rows = sorted(
        embedding_pca_top_component(spark, sf_dir).collect(),
        key=lambda r: r.pos,
    )
    assert [r.pos for r in rows] == list(range(_PCA_DIM))
    assert len({r.eigenvalue_q for r in rows}) == 1
    assert rows[0].eigenvalue_q > 0
    assert 0 < rows[0].var_explained_ppm <= 1_000_000
    loadings = [r.loading_q for r in rows]
    assert any(x != 0 for x in loadings)
    first = next((x for x in loadings if x != 0), 0)
    assert first > 0
    assert len({r.n_vectors for r in rows}) == 1 and rows[0].n_vectors > 0


def test_pca_outlier_scores_invariants(spark, sf_dir):
    """Scorer invariants: one row per vector, cos² in [0, 1e6] ppm,
    flag exactly mirrors the threshold, and the flagged tail is
    strictly above every unflagged score."""
    from weather_analysis_bigdata__spark.queries_round8b import (
        _PCA_ALIGN_PPM,
        embedding_pca_outlier_scores,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    rows = embedding_pca_outlier_scores(spark, sf_dir).collect()
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vec
    assert len({r.vec_id for r in rows}) == n_vec
    flagged = [r.cos2_ppm for r in rows if r.axis_aligned]
    clean = [r.cos2_ppm for r in rows if not r.axis_aligned]
    assert flagged and clean  # the threshold discriminates
    assert min(flagged) > _PCA_ALIGN_PPM >= max(clean)
    for r in rows:
        assert 0 <= r.cos2_ppm <= 1_000_000
        assert r.axis_aligned == (r.cos2_ppm > _PCA_ALIGN_PPM)


def test_pca_drift_controls(spark, sf_dir):
    """The built-in controls must hold: the same-distribution resample
    slice passes, the label-shifted slice is flagged, and each row's
    flag mirrors the threshold exactly."""
    from weather_analysis_bigdata__spark.queries_round8b import (
        _PCA_DRIFT_PPM,
        embedding_pca_drift_direction,
    )

    rows = {r.slice: r for r in
            embedding_pca_drift_direction(spark, sf_dir).collect()}
    assert set(rows) == {"resample", "shifted"}
    assert not rows["resample"].direction_drifted
    assert rows["shifted"].direction_drifted
    assert rows["resample"].cos2_ppm > rows["shifted"].cos2_ppm
    for r in rows.values():
        assert 0 <= r.cos2_ppm <= 1_000_000
        assert r.direction_drifted == (r.cos2_ppm < _PCA_DRIFT_PPM)
        assert 0 < r.n_vectors


def test_pca_replay_equals_batch(spark, sf_dir):
    """Stream ≡ batch as a row-set equality, not just the oracle hash:
    the 3-micro-batch replay must reproduce the batch scorer's rows
    exactly (same persisted component, same kernel)."""
    from weather_analysis_bigdata__spark.queries_round8b import (
        embedding_pca_outlier_scores,
        streaming_embedding_pca_score_replay,
    )

    batch = {
        r.vec_id: (r.proj_q, r.cos2_ppm, r.axis_aligned)
        for r in embedding_pca_outlier_scores(spark, sf_dir).collect()
    }
    replay = {
        r.vec_id: (r.proj_q, r.cos2_ppm, r.axis_aligned)
        for r in streaming_embedding_pca_score_replay(
            spark, sf_dir
        ).collect()
    }
    assert replay == batch


def test_pca_top2_planted_two_directions():
    """Two planted variance directions at different strengths: the
    solver must rank them (component 1 = the strong axis, component 2
    = the medium axis), keep them orthogonal (self-audit ≈ 0), and
    order the variance shares."""
    from weather_analysis_bigdata__spark.queries_round8b import (
        _PCA_DIM,
        _pca_solve_top2,
    )

    d = _PCA_DIM
    strong, medium = 7, 23
    vecs = []
    for t in range(300):
        v = [((t * 11 + i) % 3) - 1 for i in range(d)]
        v[strong] = 2000 if t % 2 == 0 else -2000
        v[medium] = 800 if t % 3 == 0 else -400
        vecs.append(v)
    n = len(vecs)
    s = [sum(v[i] for v in vecs) for i in range(d)]
    gram = [
        [sum(v[i] * v[j] for v in vecs) for j in range(d)] for i in range(d)
    ]
    comps = {c: (ld, lam, var, orth)
             for c, ld, lam, var, orth in _pca_solve_top2(gram, s, n)}
    l1, lam1, var1, _ = comps[1]
    l2, lam2, var2, orth = comps[2]
    assert max(range(d), key=lambda i: abs(l1[i])) == strong
    assert max(range(d), key=lambda i: abs(l2[i])) == medium
    assert lam1 > lam2 > 0
    assert var1 > var2 > 0
    assert orth < 1000  # cos² < 0.1% — deflation removed component 1


def test_pca_top2_matches_top1_and_is_orthogonal(spark, sf_dir):
    """Component 1 of the top-2 query must equal the standalone top-
    component query's loadings (same solver path), and the shipped
    orthogonality audit must be small on the real corpus."""
    from weather_analysis_bigdata__spark.queries_round8b import (
        embedding_pca_top2_components,
        embedding_pca_top_component,
    )

    two = embedding_pca_top2_components(spark, sf_dir).collect()
    one = {
        r.pos: r.loading_q
        for r in embedding_pca_top_component(spark, sf_dir).collect()
    }
    c1 = {r.pos: r.loading_q for r in two if r.component == 1}
    assert c1 == one
    orth = {r.ortho_to_prev_ppm for r in two if r.component == 2}
    assert len(orth) == 1 and orth.pop() < 20_000  # cos² < 2%


def test_pca_arrow_moments_match_bruteforce(spark, sf_dir):
    """Round-11 optimization guard: the mapInArrow moment kernel
    (NumPy int64 QᵀQ per batch, one pass for Gram + column sums +
    count) must reproduce the moments a pure-Python brute force
    computes from the SAME quantized vectors — exact integer equality,
    every entry. Isolates the kernel: the quantization expression
    (_pca_qa_col) is shared by both sides, so a mismatch here is the
    kernel, not the quantization."""
    from pyspark.sql import functions as F

    from weather_analysis_bigdata__spark.queries_round8b import (
        _PCA_DIM,
        _pca_moments,
        _pca_qa_col,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    qa_rows = (
        load_table(spark, sf_dir, "embeddings")
        .select(_pca_qa_col().alias("qa"))
        .collect()
    )
    d = _PCA_DIM
    ref_g = [[0] * d for _ in range(d)]
    ref_s = [0] * d
    for r in qa_rows:
        q = r.qa
        for i in range(d):
            ref_s[i] += q[i]
            for j in range(i, d):
                ref_g[i][j] += q[i] * q[j]
    for i in range(d):
        for j in range(i):
            ref_g[i][j] = ref_g[j][i]

    gram, s, n = _pca_moments(spark, sf_dir)
    assert n == len(qa_rows)
    assert s == ref_s
    assert gram == ref_g


def test_asof_nearest_matches_bruteforce(spark, sf_dir):
    """Independent recomputation: for every event, scan the user's
    orders and pick the nearest by |Δt| with ties to backward (and to
    the family's (ts, kind, id) convention within equal timestamps).
    The query's pick, direction, and distance must match exactly."""
    from collections import defaultdict

    from weather_analysis_bigdata__spark.queries_round8b import (
        asof_join_nearest,
    )
    from weather_analysis_bigdata__spark.sources.files import load_table

    orders = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_custkey", "CAST(o_orderdate AS TIMESTAMP) AS ts", "o_orderkey"
        )
        .collect()
    ):
        orders[r.o_custkey].append((r.ts, r.o_orderkey))
    out = {r.event_id: r for r in asof_join_nearest(spark, sf_dir).collect()}
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    ).collect()
    assert len(out) == len(events)
    for ev in events:
        cands = orders.get(ev.user_id, [])
        row = out[ev.event_id]
        back = [(ts, k) for ts, k in cands if ts <= ev.ts]
        fwd = [(ts, k) for ts, k in cands if ts > ev.ts]
        # backward candidate: latest ts, then largest key (sort-order
        # convention); forward: earliest ts, then smallest key.
        pk = max(back, key=lambda x: (x[0], x[1])) if back else None
        nk = min(fwd, key=lambda x: (x[0], x[1])) if fwd else None
        if pk is None and nk is None:
            assert row.direction == "none"
            assert row.nearest_orderkey is None and row.dist_us is None
            continue
        pd = int((ev.ts - pk[0]).total_seconds() * 1e6) if pk else None
        nd = int((nk[0] - ev.ts).total_seconds() * 1e6) if nk else None
        if nk is None or (pk is not None and pd <= nd):
            assert (row.direction, row.nearest_orderkey, row.dist_us) == (
                "backward",
                pk[1],
                pd,
            )
        else:
            assert (row.direction, row.nearest_orderkey, row.dist_us) == (
                "forward",
                nk[1],
                nd,
            )
