"""Data-scaling EXPONENT probe for the heavy LLM-ops (round-2 verdict
item 7): the sf0.1 bench sits on a ~1 s/query scheduling floor that
would hide a residual quadratic term, so this tool builds synthetic
corpora at 1×/4×/10× the sf0.1 row count and fits per-query wall-time
exponents from the two largest sizes (where compute dominates the
floor).

Corpus construction (derived from the driver's sf0.1 parquet, written
under /tmp — testdata itself is never touched):

- documents ×m: replica r gets doc_id + r·10⁷ and every token suffixed
  with ``qr`` (r>0), so replicas are shingle-disjoint from each other
  and from the original — dedup candidate structure grows LINEARLY, the
  honest null model for "more independent data". Injected-duplicate
  logic inside the dedup queries keys on doc_id arithmetic and
  replicates per-shard, also linear.
- embeddings ×m: replica r gets vec_id + r·10⁷, the label kept (cluster
  structure grows with N — exactly SemDeDup's stress axis), and one
  coordinate deterministically perturbed so replicas are not exact
  copies. Query vectors (vec_id < 8) exist only in replica 0: fixed
  query load against a growing corpus, the serving scenario.

Expected shape: every bucketed/capped operator ≈ exponent 1; the
UNCAPPED SemDeDup is Σ|cluster|² with cluster sizes ∝ N/k, so its
honest exponent approaches 2 — the number dedup_semantic_capped
(pair work ≤ N·cap/2) exists to fix. Reporting both IS the point.

Usage: python tools/scale_exponent.py [--mults 1,4,10]
Prints one JSON line; PERF.md carries the table.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_scale"
SHIFT = 10_000_000

#: Round 4: the probe covers the FULL bench headline (round-3 verdict
#: item 4) — every headline query gets a measured exponent, not just
#: the 14 LLM-ops — plus the uncapped SemDeDup yardstick (not in the
#: headline anymore, but its honest ~quadratic exponent is the anchor
#: the capped twin is judged against, so it stays probed).
_EXTRA_PROBE = ["dedup_semantic_clustered"]
#: Scale-INDEPENDENT by construction (generates its own fixed-size
#: input regardless of sf_dir) — an exponent would measure nothing.
_PROBE_EXCLUDE = {"weather_rehearsal_e2e"}


def _probe_names() -> list[str]:
    from bench import HEADLINE

    names = [n for n in HEADLINE if n not in _PROBE_EXCLUDE]
    return names + [n for n in _EXTRA_PROBE if n not in names]


# --------------------------------------------------------------------------
# Zipf-skew mode (round-7 verdict item 5): the uniform replication above
# is shingle-disjoint by construction, so the cap-guarded families never
# see a hot key grow with N — precisely the regime their caps exist for.
# --skew plants power-law duplication whose head key count grows
# LINEARLY with the multiplier:
# - documents: 2% of every replica's docs (doc_id % 50 == 3) are padded
#   to an 8-token paragraph boundary with doc-unique filler, then a
#   fixed UNSUFFIXED 24-token hot block is appended — one hot paragraph
#   pid (df ≈ 0.02·N·m, 3 identical windows/doc) and 17 hot 8-grams
#   (occ far above the span cap), shared across replicas.
# - embeddings: ~1% of every replica's vectors ((vec_id-37) % 100 == 0,
#   vec_id ≥ 137 — never a query vector) are replaced by one fixed hot
#   vector with a 1e-6 row-unique perturbation — one hot LSH bucket /
#   centroid list growing with m.
# The probe then records wall-time exponents for the CAP-GUARDED
# families AND DuckDB value-hash checks on the skewed corpus itself.
# Health gates (measured, round 8): a capped family is healthy iff
# (a) hash_status OK — results stay oracle-exact under the hot key,
# (b) le_linear — the skew exponent stays ≤ ~1 (no super-linear
#     response to a linearly-growing head key), and
# (c) the skew/uniform wall-time ratio at each mult stays a small
#     constant factor (skew_overhead_*: the hot key's linear occupancy
#     share, ~1.1-1.35× here — a broken cap would give multiples).
# NOTE: skew exponent ≤ UNIFORM exponent is NOT a sound gate — the
# uniform exponents are deflated by the fixed scheduling/overhead
# floor (e.g. sim_search_lsh_capped reads 0.12 uniform), so adding any
# real linear work raises the measured exponent toward its true ~1
# even when the cap is doing its job. le_uniform is still recorded
# for transparency, with this confound documented.
_SKEW_PROBE = [
    "dedup_span_maximal_pairs",      # gram-occurrence cap
    "dedup_minhash_bucket_capped",   # band-bucket cap
    "sim_search_lsh_capped",         # hyperplane-bucket cap
    "dedup_paragraph_bloom",         # m-bounded sketch
    "dedup_paragraph_bloom_audit",   # dominance gate under skew
]

# --------------------------------------------------------------------------
# Hot-KEY join/window mode (round-8 verdict item 3): the Zipf mode above
# stresses the dedup/ANN caps; the join/window families' 100 TB behavior
# is governed instead by a hot user/entity key. --skew-join plants:
# - events: 10% of every replica's events (event_id % 10 == 7; the
#   shift is ≡ 0 mod 10, so the rule selects the same share per
#   replica) are reassigned to ONE user (user_id = 42) — the hot user's
#   event count grows linearly with the multiplier, stressing the
#   user-keyed window sorts (sessionize, the as-of union-merge family).
# - lineitem: 10% of every replica's lineitems (l_orderkey % 10 == 7)
#   are reassigned to ONE global order (l_orderkey = 7) — the hot
#   equi-join key salted_join_demo's salt exists to split.
# WHY 10%, not a production-shaped ~1%: skew hurts when the hot
# partition exceeds the per-core average, i.e. hot_share > 1/cores. A
# 1000-executor cluster hits that at 0.1%; this local[32] harness
# needs hot_share ≫ 1/32 ≈ 3% for the hot reducer to become the
# straggler at all — 10% makes it ~3× the average core's work, the
# same MECHANICS at a measurable ratio (measured at 1%: the hot task
# finished inside the scheduling floor and both forms tied).
# The probe records wall exponents + DuckDB value-hash checks ON the
# skewed corpus (same gates as the Zipf mode), plus the salted-vs-
# UNSALTED pair measured with broadcast disabled and AQE skew-split off
# (the 100 TB regime the manual salt is for: neither side broadcasts,
# bucketed layouts AQE can't re-split) — proving the cure beats the
# disease under the planted hot key.
# NOTE corpora cache by directory (skewjoin_x{m}); `rm -rf
# /tmp/spark_graft_scale/skewjoin_*` after changing the planting rule.
_SKEWJOIN_PROBE = [
    "asof_join_event_order",   # backward as-of: ONE user-keyed sort
    "asof_join_nearest",       # nearest as-of: same union-merge shape
    "asof_join_forward_tolerance",  # forward as-of (the O(p²)-frame fix)
    "events_sessionize_30m",   # user-keyed session window
    "salted_join_demo",        # the skew cure, vs its unsalted twin
    # round-10 (round-9 verdict item 8): the grouped-window family —
    # the remaining window consumers without a hot-key certification.
    "window_rank_topn",        # rank frame under a hot customer
    "gapfill_forward_fill",    # day-spine window under a hot user <= 5
    "gapfill_linear_interpolate",  # the reversed-frame fix, re-proven
]
_HOT_USER = 42
_HOT_EVENT_MOD, _HOT_EVENT_RES = 10, 7
#: Second hot user INSIDE the gapfill family's user_id <= 5 filter
#: (user 42 is invisible to it): a disjoint 10% slice of every
#: replica's events lands on user 3, so the gapfill scan's hot share
#: grows linearly while its day-spine window partition stays bounded —
#: the structural hot-key safety the probe certifies. The asof/
#: sessionize family now sees TWO hot users (20% planted mass), a
#: strictly harder version of the round-9 stress.
_HOT_USER2 = 3
_HOT_EVENT_MOD2, _HOT_EVENT_RES2 = 10, 3
#: Hot CUSTOMER for the orders-keyed rank window (window_rank_topn
#: partitions by o_custkey — the event/lineitem plants never reach it):
#: 10% of every replica's orders reassigned to one customer, so the
#: rank partition grows linearly with the multiplier.
_HOT_CUST = 42
_HOT_ORD_MOD, _HOT_ORD_RES = 10, 7
_HOT_ORDERKEY = 7
_HOT_LI_MOD, _HOT_LI_RES = 10, 7
_HOT_BLOCK = " ".join(f"hotblk{j:02d}" for j in range(24))
_HOT_DOC_MOD, _HOT_DOC_RES = 50, 3
_HOT_VEC_BASE = 537  # the donor vector every hot row copies
_PARA_W_SKEW = 8  # mirrors queries_hygiene._PARA_W


def _plant_hot_docs(doc_ids, texts):
    """Append the hot block (paragraph-aligned) to the chosen docs."""
    out = []
    for d, t in zip(doc_ids, texts):
        if d % _HOT_DOC_MOD != _HOT_DOC_RES:
            out.append(t)
            continue
        toks = t.split()
        pad = (-len(toks)) % _PARA_W_SKEW
        toks += [f"p{k}z{d}" for k in range(pad)]
        out.append(" ".join(toks) + " " + _HOT_BLOCK)
    return out


#: Fact tables replicated ×m with id-shifted keys (replicas reference
#: replica-local parents, so per-key structure grows linearly — the
#: honest null model for "more independent data"); dimension tables
#: (region/nation/supplier/part) are copied once, so fact-per-dim
#: fan-in grows with m — exactly what a fixed dim table looks like
#: under a growing fact at 100 TB. documents/embeddings keep their
#: bespoke replication (shingle-disjoint suffixes / perturbed vectors).
_SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
}
_DIM_TABLES = ("region", "nation", "supplier", "part")

TABLES = ("documents", "embeddings")


def _all_tables() -> tuple:
    return TABLES + tuple(_SHIFT_COLS) + _DIM_TABLES


def build_corpus(mult: int, skew: bool = False, hot_join: bool = False) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import shutil

    tag = "skewjoin_" if hot_join else ("skew_" if skew else "")
    out_dir = os.path.join(ROOT, f"{tag}x{mult}")
    if all(
        os.path.exists(os.path.join(out_dir, f"{t}.parquet"))
        for t in _all_tables()
    ):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    # Dimension tables: one copy (fact-per-dim fan-in grows with m).
    for t in _DIM_TABLES:
        shutil.copyfile(
            os.path.join(BASE_SF, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )

    # Fact tables: ×m replicas with id-shifted keys (arrow compute —
    # no python-list round trip; lineitem is 6M rows at x10).
    for t, shift_cols in _SHIFT_COLS.items():
        base = pq.read_table(os.path.join(BASE_SF, f"{t}.parquet"))
        chunks = [base]
        for r in range(1, mult):
            rep = base
            for c in shift_cols:
                idx = rep.schema.get_field_index(c)
                shifted = pc.add(rep[c], pa.scalar(r * SHIFT, rep.schema.field(c).type))
                rep = rep.set_column(idx, rep.schema.field(c), shifted)
            chunks.append(rep)
        tbl = pa.concat_tables(chunks)
        def _mod(col, m):
            # pyarrow ships no modulo kernel; keys are non-negative so
            # trunc-divide reconstruction is exact.
            return pc.subtract(col, pc.multiply(pc.divide(col, m), m))

        if hot_join and t == "events":
            # ~10% of every replica's events → ONE hot user, plus a
            # DISJOINT ~10% → the second hot user (3, inside the
            # gapfill family's user_id <= 5 filter).
            idx = tbl.schema.get_field_index("user_id")
            f = tbl.schema.field("user_id")
            hot = pc.equal(
                _mod(tbl["event_id"], pa.scalar(_HOT_EVENT_MOD, pa.int64())),
                pa.scalar(_HOT_EVENT_RES, pa.int64()),
            )
            hot2 = pc.equal(
                _mod(tbl["event_id"], pa.scalar(_HOT_EVENT_MOD2, pa.int64())),
                pa.scalar(_HOT_EVENT_RES2, pa.int64()),
            )
            u = pc.if_else(hot, pa.scalar(_HOT_USER, f.type), tbl["user_id"])
            u = pc.if_else(hot2, pa.scalar(_HOT_USER2, f.type), u)
            tbl = tbl.set_column(idx, f, u)
        if hot_join and t == "orders":
            # ~10% of every replica's orders → ONE hot customer (the
            # o_custkey-partitioned rank window's stress key).
            idx = tbl.schema.get_field_index("o_custkey")
            f = tbl.schema.field("o_custkey")
            hot = pc.equal(
                _mod(tbl["o_orderkey"], pa.scalar(_HOT_ORD_MOD, pa.int64())),
                pa.scalar(_HOT_ORD_RES, pa.int64()),
            )
            tbl = tbl.set_column(
                idx,
                f,
                pc.if_else(hot, pa.scalar(_HOT_CUST, f.type), tbl["o_custkey"]),
            )
        if hot_join and t == "lineitem":
            # ~10% of every replica's lineitems → ONE hot order key.
            idx = tbl.schema.get_field_index("l_orderkey")
            f = tbl.schema.field("l_orderkey")
            hot = pc.equal(
                _mod(tbl["l_orderkey"], pa.scalar(_HOT_LI_MOD, pa.int64())),
                pa.scalar(_HOT_LI_RES, pa.int64()),
            )
            tbl = tbl.set_column(
                idx,
                f,
                pc.if_else(hot, pa.scalar(_HOT_ORDERKEY, f.type), tbl["l_orderkey"]),
            )
        pq.write_table(
            tbl,
            os.path.join(out_dir, f"{t}.parquet"),
            row_group_size=65536,
        )

    docs = pq.read_table(os.path.join(BASE_SF, "documents.parquet"))
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    sources = docs["source"].to_pylist()
    d_chunks = []
    for r in range(mult):
        rep_ids = [d + r * SHIFT for d in doc_ids]
        if r == 0:
            if not skew:
                d_chunks.append(docs)
                continue
            new_text = list(texts)
        else:
            suff = f"q{r}"
            new_text = [
                " ".join(w + suff for w in t.split()) for t in texts
            ]
        if skew:
            new_text = _plant_hot_docs(rep_ids, new_text)
        d_chunks.append(
            pa.table(
                {
                    "doc_id": pa.array(rep_ids, type=pa.int64()),
                    "text": pa.array(new_text),
                    "lang": pa.array(langs),
                    "source": pa.array(sources),
                    "n_chars": pa.array(
                        [len(t) for t in new_text], type=pa.int64()
                    ),
                }
            ).cast(docs.schema)
        )
    pq.write_table(
        pa.concat_tables(d_chunks),
        os.path.join(out_dir, "documents.parquet"),
        row_group_size=4096,  # real datasets have many row groups — one
        # giant group caps scan parallelism at 1-2 tasks (see PERF.md
        # round-3 split-parallelism finding)
    )

    emb = pq.read_table(os.path.join(BASE_SF, "embeddings.parquet"))
    vec_ids = emb["vec_id"].to_pylist()
    vecs = emb["embedding"].to_pylist()
    labels = emb["label"].to_pylist()
    hot_vec = None
    if skew:
        hot_vec = list(vecs[vec_ids.index(_HOT_VEC_BASE)])
    e_chunks = []
    for r in range(mult):
        if r == 0 and not skew:
            e_chunks.append(emb)
            continue
        new_vecs = []
        for i, v in enumerate(vecs):
            w = list(v)
            if r > 0:
                w[(i + r) % len(w)] += 0.001 * r  # deterministic perturbation
            if (
                skew
                and vec_ids[i] >= 137
                and (vec_ids[i] - 37) % 100 == 0
            ):
                # The hot cluster: one fixed vector, 1e-6 row-unique
                # nudge (same bucket/list everywhere, never identical).
                w = list(hot_vec)
                w[vec_ids[i] % len(w)] += 1e-6 * (r * 1000 + i % 997 + 1)
            new_vecs.append(w)
        e_chunks.append(
            pa.table(
                {
                    "vec_id": pa.array(
                        [x + r * SHIFT for x in vec_ids], type=pa.int64()
                    ),
                    "embedding": pa.array(
                        new_vecs, type=emb.schema.field("embedding").type
                    ),
                    "label": pa.array(labels),
                }
            ).cast(emb.schema)
        )
    pq.write_table(
        pa.concat_tables(e_chunks),
        os.path.join(out_dir, "embeddings.parquet"),
        row_group_size=2048,
    )
    return out_dir


def main() -> None:
    mults = [1, 4, 10]
    if "--mults" in sys.argv:
        mults = [int(x) for x in sys.argv[sys.argv.index("--mults") + 1].split(",")]
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    hot_join = "--skew-join" in sys.argv
    skew = "--skew" in sys.argv and not hot_join

    from weather_analysis_bigdata__spark.registry import all_queries
    from weather_analysis_bigdata__spark.session import get_spark

    spark = get_spark("scale-exponent")
    registry = all_queries()
    spark.range(1).count()

    if hot_join:
        base_probe = _SKEWJOIN_PROBE
    elif skew:
        base_probe = _SKEW_PROBE
    else:
        base_probe = _probe_names()
    probe = [n for n in base_probe if n in registry]
    if only is not None:
        probe = [n for n in probe if n in only] + [
            n for n in only if n in registry and n not in probe
        ]
    dirs = {m: build_corpus(m, skew=skew, hot_join=hot_join) for m in mults}
    times: dict[str, dict[int, float]] = {q: {} for q in probe}
    for m in mults:
        sf_dir = dirs[m]
        for name in probe:
            q = registry[name]
            if q.prepare is not None:  # index builds off the timed path
                q.prepare(spark, sf_dir)
            per_run = []
            for _ in range(2):
                t0 = time.time()
                q.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                per_run.append(time.time() - t0)
            times[name][m] = round(min(per_run), 3)

    hi, lo = max(mults), sorted(mults)[-2]
    out = {}
    for name, ts in times.items():
        exp = math.log(ts[hi] / ts[lo]) / math.log(hi / lo) if ts[lo] > 0 else None
        out[name] = {
            **{f"x{m}": ts[m] for m in mults},
            "exponent": round(exp, 2) if exp is not None else None,
        }

    if hot_join:
        _finish_skew_join(spark, registry, probe, dirs, mults, out)
        return
    if skew:
        _finish_skew(spark, registry, probe, dirs, mults, out)
        return
    # "sf" stamp mirrors bench.py's BENCH_DETAIL sections (advice r5):
    # the probe's base is a fixed SF directory, recorded numerically.
    # Tolerant parse (advice r5 again): a BASE_SF dir not named exactly
    # 'sf<number>' stamps null instead of killing the probe after the
    # measurements were already taken.
    m = re.fullmatch(r"sf([0-9.]+)", os.path.basename(BASE_SF.rstrip("/")))
    try:
        sf_val = float(m.group(1)) if m else None
    except ValueError:
        sf_val = None
    record = {
        "base": BASE_SF,
        "sf": sf_val,
        "mults": mults,
        "queries": out,
    }
    # Round 4: persist into BENCH_DETAIL.json (merge — bench.py
    # preserves keys it didn't compute, and so does this tool).
    detail_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json",
    )
    try:
        with open(detail_path) as f:
            detail = json.load(f)
    except (OSError, json.JSONDecodeError):
        detail = {}
    prev = detail.get("scale_exponents", {})
    if only is not None and prev.get("mults") == mults:
        # --only re-measures a subset: merge into the existing record
        # instead of discarding every other query's exponents.
        prev.setdefault("queries", {}).update(out)
        detail["scale_exponents"] = prev
    else:
        detail["scale_exponents"] = record
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(record, indent=1))


def _finish_skew(spark, registry, probe, dirs, mults, out) -> None:
    """Skew-mode tail: DuckDB value-hash checks on the skewed corpus at
    the second-largest mult (compute-dominated but oracle-affordable),
    uniform-exponent comparison, and the BENCH_DETAIL skew_exponents
    merge-write."""
    from tools.check_oracle import compare, duck_conn

    hash_mult = sorted(mults)[-2] if len(mults) > 1 else mults[0]
    hash_dir = dirs[hash_mult]
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = hash_dir
    con = duck_conn(hash_dir)
    detail_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json",
    )
    try:
        with open(detail_path) as f:
            detail = json.load(f)
    except (OSError, json.JSONDecodeError):
        detail = {}
    uniform = detail.get("scale_exponents", {}).get("queries", {})
    for name in probe:
        q = registry[name]
        try:
            spark_pdf = q.fn(spark, hash_dir).toPandas()
            duck_pdf = con.execute(q.oracle_text()).df()
            res = compare(name, spark_pdf, duck_pdf)
            out[name]["hash_status"] = res["status"]
            out[name]["hash_rows"] = res.get("rows")
        except Exception as e:  # noqa: BLE001
            out[name]["hash_status"] = f"ERROR: {type(e).__name__}: {e}"[:200]
        u = uniform.get(name, {}).get("exponent")
        out[name]["uniform_exponent"] = u
        e = out[name]["exponent"]
        out[name]["le_uniform"] = (
            None if (u is None or e is None) else bool(e <= u + 0.05)
        )
        out[name]["le_linear"] = None if e is None else bool(e <= 1.05)
        for m in mults:
            ut = uniform.get(name, {}).get(f"x{m}")
            st = out[name].get(f"x{m}")
            out[name][f"skew_overhead_x{m}"] = (
                round(st / ut, 2) if (ut and st) else None
            )
    record = {
        "base": BASE_SF,
        "mults": mults,
        "hash_mult": hash_mult,
        "hot_doc_rule": f"doc_id % {_HOT_DOC_MOD} == {_HOT_DOC_RES} "
        f"(+{len(_HOT_BLOCK.split())}-token unsuffixed hot block, "
        "paragraph-aligned)",
        "hot_vec_rule": "(vec_id - 37) % 100 == 0 AND vec_id >= 137 "
        f"(copies of vec {_HOT_VEC_BASE} + 1e-6 nudge)",
        "queries": out,
    }
    prev = detail.get("skew_exponents", {})
    if prev.get("mults") == mults and "--only" in sys.argv:
        prev.setdefault("queries", {}).update(out)
        detail["skew_exponents"] = prev
    else:
        detail["skew_exponents"] = record
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(record, indent=1))


def _unsalted_join_twin(spark, sf_dir: str):
    """salted_join_demo minus the salt — the disease the salt cures.
    Kept HERE (probe-only) so the registry never carries a known-bad
    plan; column-identical to the registered query."""
    from pyspark.sql import functions as F

    from weather_analysis_bigdata__spark.functions.deterministic import dec
    from weather_analysis_bigdata__spark.sources.files import load_table

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    net = F.round(
        dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), 2
    ).cast("double")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_custkey", net.alias("net_price")
    )


def _finish_skew_join(spark, registry, probe, dirs, mults, out) -> None:
    """Hot-key join mode tail: DuckDB value-hash checks on the skewed
    corpus, le_linear gates, and the salted-vs-unsalted pair measured
    in the no-broadcast / no-AQE-skew-split regime (the 100 TB shape
    the manual salt exists for)."""
    from tools.check_oracle import compare, duck_conn

    hash_mult = sorted(mults)[-2] if len(mults) > 1 else mults[0]
    hash_dir = dirs[hash_mult]
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = hash_dir
    con = duck_conn(hash_dir)
    for name in probe:
        q = registry[name]
        try:
            spark_pdf = q.fn(spark, hash_dir).toPandas()
            duck_pdf = con.execute(q.oracle_text()).df()
            res = compare(name, spark_pdf, duck_pdf)
            out[name]["hash_status"] = res["status"]
            out[name]["hash_rows"] = res.get("rows")
        except Exception as e:  # noqa: BLE001
            out[name]["hash_status"] = f"ERROR: {type(e).__name__}: {e}"[:200]
        e = out[name]["exponent"]
        out[name]["le_linear"] = None if e is None else bool(e <= 1.05)

    # Salted vs unsalted under the planted hot order key, with the
    # broadcast path and AQE skew-split disabled for BOTH forms —
    # isolating the mechanism the salt provides. Conf restored after.
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.skewJoin.enabled": spark.conf.get(
            "spark.sql.adaptive.skewJoin.enabled"
        ),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    pair: dict = {"salted": {}, "unsalted": {}}
    try:
        for m in mults:
            sf_dir = dirs[m]
            for tag, build in (
                ("salted", registry["salted_join_demo"].fn),
                ("unsalted", _unsalted_join_twin),
            ):
                per_run = []
                for _ in range(2):
                    t0 = time.time()
                    build(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    per_run.append(time.time() - t0)
                pair[tag][f"x{m}"] = round(min(per_run), 3)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    hi = max(mults)
    pair["salted_lt_unsalted_at_max"] = bool(
        pair["salted"][f"x{hi}"] < pair["unsalted"][f"x{hi}"]
    )
    pair["regime"] = (
        "autoBroadcastJoinThreshold=-1, adaptive.skewJoin=false "
        "(neither side broadcasts; no runtime skew split — the "
        "bucketed-layout 100 TB regime the manual salt is for)"
    )

    record = {
        "base": BASE_SF,
        "mults": mults,
        "hash_mult": hash_mult,
        "hot_user_rule": f"event_id % {_HOT_EVENT_MOD} == {_HOT_EVENT_RES} "
        f"-> user_id = {_HOT_USER} "
        f"({100 // _HOT_EVENT_MOD}% of events per replica; share sized "
        "so hot > 1/cores — see module comment)",
        "hot_order_rule": f"l_orderkey % {_HOT_LI_MOD} == {_HOT_LI_RES} "
        f"-> l_orderkey = {_HOT_ORDERKEY} "
        f"({100 // _HOT_LI_MOD}% of lineitems per replica)",
        "queries": out,
        "salted_vs_unsalted": pair,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json",
    )
    try:
        with open(detail_path) as f:
            detail = json.load(f)
    except (OSError, json.JSONDecodeError):
        detail = {}
    prev = detail.get("skew_join_exponents", {})
    if prev.get("mults") == mults and "--only" in sys.argv:
        prev.setdefault("queries", {}).update(out)
        detail["skew_join_exponents"] = prev
    else:
        detail["skew_join_exponents"] = record
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
