"""Round-10 batch: the PCA oracle's shift-window headroom past 2^62
(round-9 verdict item 2 / advice #1) and the drift gate's loud,
symmetric failure on an empty probe slice (item 4 / advice #5).
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from weather_analysis_bigdata__spark.queries_round8b import (
    _PCA_DIM,
    _pca_drift_oracle,
    _pca_sql,
    embedding_pca_drift_direction,
    embedding_pca_top_component,
)


def _write_embeddings(path: str, n: int, dim0_amp: float, max_label: int):
    """A synthetic embeddings table (schema-identical to the testdata
    one): dim 0 alternates ±dim0_amp with an integer jitter (every
    value integer-valued, so float32 → DOUBLE → DECIMAL(18,8) is exact
    on both engines); the other 63 dims carry small deterministic
    residue so no column is constant."""
    rows = list(range(n))
    emb = []
    for r in rows:
        v = [0.0] * _PCA_DIM
        # Jitter bounded to +7 so the oracle's DECIMAL(18,8) × 1e8
        # quantization product stays inside DuckDB's 18-DIGIT decimal
        # multiply (|x|·1e16 < 1e18 caps |x| below 100 — the window
        # test gets past 2^62 via ROW COUNT, exactly how a real
        # 100 TB corpus would).
        v[0] = (dim0_amp + r % 8) * (1.0 if r % 2 == 0 else -1.0)
        for d in range(1, _PCA_DIM):
            v[d] = float((r * 7 + d * 3) % 13 - 6)
        emb.append(v)
    tbl = pa.table(
        {
            "vec_id": pa.array(rows, pa.int64()),
            "embedding": pa.array(
                emb, pa.list_(pa.float32())
            ),
            "label": pa.array(
                [r % (max_label + 1) for r in rows], pa.int32()
            ),
        }
    )
    pq.write_table(tbl, path)


def _duck(corpus_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{corpus_dir}/embeddings.parquet')"
    )
    return con


def test_pca_oracle_shift_window_past_2pow62(spark, tmp_path):
    """Round-9 advice #1 (fixed by _pca_pows(63) + the HUGEINT-cast
    comparison in the sh CTE; this is the done-criterion test): a
    moment set whose |M| max exceeds 2^62 — past the old hi=33 pows
    window, where the oracle's shift CTE went empty and every output
    column silently degraded to NULL — must now solve NON-NULL on both
    engines, bit-identically, making the doc's N ≈ 1e11 headroom claim
    checkable.

    The plant: dim-0 amplitude ~90 → qa₀ ≈ ±9e5, and with 4000
    alternating-sign rows M₀₀ = N·Σqa₀² − (Σqa₀)² ≈ 1.4e19 > 2^62 ≈
    4.6e18, needing shift_bits ≈ 34 > the old window's max of 32."""
    _write_embeddings(
        str(tmp_path / "embeddings.parquet"), n=4000, dim0_amp=90.0,
        max_label=9,
    )
    eng = {
        r["pos"]: r
        for r in embedding_pca_top_component(spark, str(tmp_path)).collect()
    }
    con = _duck(str(tmp_path))
    ora = {
        int(r[0]): r
        for r in con.execute(_pca_sql()).fetchall()
    }
    con.close()
    assert len(eng) == _PCA_DIM and len(ora) == _PCA_DIM
    k = eng[0]["shift_bits"]
    assert k >= 33, (
        f"shift_bits = {k}: the plant no longer exceeds the old 2^62 "
        "window — the test would pass vacuously; raise the amplitude"
    )
    for pos in range(_PCA_DIM):
        e, o = eng[pos], ora[pos]
        # Every oracle column non-NULL (the old failure mode), and
        # bit-identical to the engine.
        assert all(x is not None for x in o)
        assert (
            e["loading_q"],
            e["eigenvalue_q"],
            e["var_explained_ppm"],
            e["n_vectors"],
            e["shift_bits"],
        ) == (int(o[1]), int(o[2]), int(o[3]), int(o[4]), int(o[5]))
    # The component is the planted dim-0 axis.
    lead = max(eng.values(), key=lambda r: abs(r["loading_q"]))
    assert lead["pos"] == 0


def test_pca_drift_empty_probe_slice_fails_loudly(spark, tmp_path):
    """Round-9 advice #5: under a regenerated corpus that no longer
    populates a probe slice, the engine used to die with a bare
    KeyError while the oracle politely emitted a NULL row — an
    ASYMMETRIC failure. The contract is now explicit and tested: the
    engine refuses with a diagnostic naming the empty slice (fail
    loud beats fail null for a gate whose output feeds admission
    decisions), and the oracle's NULL degradation is pinned here so
    the asymmetry is documented behavior, not an accident."""
    # max_label=5 → no row satisfies the 'shifted' slice (label >= 8);
    # vec_id % 3 = 0 keeps 'resample' populated.
    _write_embeddings(
        str(tmp_path / "embeddings.parquet"), n=30, dim0_amp=5.0,
        max_label=5,
    )
    with pytest.raises(ValueError, match="shifted"):
        embedding_pca_drift_direction(spark, str(tmp_path))
    con = _duck(str(tmp_path))
    rows = {r[0]: r for r in con.execute(_pca_drift_oracle()).fetchall()}
    con.close()
    assert rows["shifted"][2] is None  # cos2_ppm degrades to NULL
    assert rows["resample"][2] is not None


def test_cc_recluster_merges_planted_bridge(spark, sf_dir):
    """Round-9 verdict item 3's positive control: the X/Y/D geometry
    (two published singletons bridged by the arriving D) must fold
    into EXACTLY ONE merged cluster — 2 published components, both
    docs re-homed to the new min label, the bridge doc counted, the
    planted marker set — and no other planted-bridge row exists."""
    from weather_analysis_bigdata__spark.queries_round9 import (
        _MG_D_ID,
        _MG_X_ID,
        _MG_Y_ID,
        dedup_cc_recluster_apply,
    )

    rows = dedup_cc_recluster_apply(spark, sf_dir).collect()
    planted = [r for r in rows if r.has_planted_bridge]
    assert len(planted) == 1
    p = planted[0]
    assert p.new_component == min(_MG_D_ID, _MG_X_ID, _MG_Y_ID)
    assert p.merged
    assert p.n_published_components == 2
    assert p.n_docs == 2  # X and Y
    assert p.n_bridge_docs == 1  # D
    assert p.n_relabeled_docs == 2  # both singletons re-homed


def test_cc_recluster_no_conflict_is_label_stable_noop(spark, sf_dir):
    """The negative control: a batch with no would_merge conflicts
    (novels only — zero corpus neighbors by construction) leaves the
    published clustering EXACTLY as it was: one row per published
    component, merged=false, zero re-homed docs, zero bridge docs,
    labels identical."""
    from weather_analysis_bigdata__spark.queries_round9 import (
        _NOVEL_MOD,
        _NOVEL_REM,
        _cc_components_index,
        _cci_batch_df,
        _recluster_report,
    )

    novels = _cci_batch_df(spark, sf_dir).filter(
        "doc_id >= 6000000 AND doc_id < 7000000"
    )
    assert novels.count() > 0
    rows = _recluster_report(spark, sf_dir, novels).collect()
    pub = {
        r.comp for r in _cc_components_index(spark, sf_dir).collect()
    }
    assert {r.new_component for r in rows} == pub
    for r in rows:
        assert not r.merged
        assert r.n_published_components == 1
        assert r.n_relabeled_docs == 0
        assert r.n_bridge_docs == 0
        assert not r.has_planted_bridge


def test_pin_mode_reliable_identical_results(spark, sf_dir, monkeypatch):
    """Round-9 verdict item 7: the pinning idiom's cluster-posture
    switch. t_closeness_audit is pin-heavy (the pinned class table
    feeds three consumers); the SPARK_GRAFT_PIN_MODE=reliable path
    (persist DISK_ONLY + count — recomputable after executor loss)
    must produce row-for-row identical results to the default
    non-reliable localCheckpoint path."""
    from weather_analysis_bigdata__spark.queries_round8b import (
        t_closeness_audit,
    )

    monkeypatch.delenv("SPARK_GRAFT_PIN_MODE", raising=False)
    base = {tuple(r) for r in t_closeness_audit(spark, sf_dir).collect()}
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "reliable")
    rel = {tuple(r) for r in t_closeness_audit(spark, sf_dir).collect()}
    assert base == rel
    assert len(base) > 0


def test_post_recluster_conflict_resolved(spark, sf_dir):
    """The lifecycle proof: under the v1 clustering the planted bridge
    doc D raises would_merge with 2 existing components; served from
    the RE-CLUSTERED v2 labels (X and Y folded into one cluster) the
    SAME batch's D attaches cleanly — and every other assignment is
    unchanged row-for-row."""
    from weather_analysis_bigdata__spark.queries_round9 import (
        _MG_D_ID,
        _MG_X_ID,
        _MG_Y_ID,
        dedup_cc_incremental,
    )
    from weather_analysis_bigdata__spark.queries_round10 import (
        dedup_cc_assign_post_recluster,
    )

    v1 = {r.doc_id: r for r in dedup_cc_incremental(spark, sf_dir).collect()}
    v2 = {
        r.doc_id: r
        for r in dedup_cc_assign_post_recluster(spark, sf_dir).collect()
    }
    assert set(v1) == set(v2)
    d1, d2 = v1[_MG_D_ID], v2[_MG_D_ID]
    assert d1.would_merge and d1.n_existing_components == 2
    assert not d2.would_merge
    assert d2.n_existing_components == 1
    assert d2.assigned_component == min(_MG_D_ID, _MG_X_ID, _MG_Y_ID)
    for doc_id, r in v1.items():
        if doc_id == _MG_D_ID:
            continue
        assert tuple(r) == tuple(v2[doc_id]), doc_id


def test_qnb_incremental_update_equals_served_model(spark, sf_dir):
    """Update ≡ rebuild, closed against the SERVING path: base ∪ delta
    IS the full train split, so the incrementally updated parameters
    must equal the persisted full-train model (qnb_quality256)
    row-for-row — and the delta must be non-empty with visible
    parameter drift."""
    from weather_analysis_bigdata__spark.queries_eval import _qnb_table
    from weather_analysis_bigdata__spark.queries_round10 import (
        quality_classifier_nb_incremental_update,
    )

    upd = quality_classifier_nb_incremental_update(spark, sf_dir).collect()
    served = {
        (r["label"], r["bucket"]): r["lp_int"]
        for r in _qnb_table(spark, sf_dir).collect()
    }
    assert len(upd) == len(served)
    assert upd[0]["n_delta_docs"] > 0
    assert any(r["lp_changed"] for r in upd)
    for r in upd:
        assert r["lp_updated"] == served[(r["label"], r["bucket"])], (
            r["label"],
            r["bucket"],
        )


def test_pca_testdata_plants_stay_inside_window(spark, sf_dir):
    """Guard the guard: the shipped corpus must still solve with a
    small shift (nowhere near the window edge), so the 2^62 test above
    is exercising headroom, not the normal path."""
    rows = embedding_pca_top_component(spark, sf_dir).collect()
    assert 0 <= rows[0]["shift_bits"] < 33
