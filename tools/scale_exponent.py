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
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_scale"
SHIFT = 10_000_000

PROBE = [
    "dedup_minhash_lsh",
    "dedup_shared_ngram_spans",
    "dedup_ngram_jaccard",
    "sim_search_topk",
    "sim_search_lsh",
    "sim_search_lsh_multiprobe",
    "ivf_probe_topk",
    "tfidf_cosine_topk",
    "dedup_semantic_clustered",
    "dedup_semantic_capped",
    # round-3 additions: the new rungs + incremental ingest kernels
    "sim_search_binary_hamming",
    "sim_search_matryoshka",
    "dedup_minhash_incremental",
    "ivf_index_upsert",
]

#: Tables the probe queries read; only these are replicated.
TABLES = ("documents", "embeddings")


def build_corpus(mult: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(ROOT, f"x{mult}")
    if all(
        os.path.exists(os.path.join(out_dir, f"{t}.parquet")) for t in TABLES
    ):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    docs = pq.read_table(os.path.join(BASE_SF, "documents.parquet"))
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    sources = docs["source"].to_pylist()
    d_chunks = []
    for r in range(mult):
        if r == 0:
            d_chunks.append(docs)
            continue
        suff = f"q{r}"
        new_text = [
            " ".join(w + suff for w in t.split()) for t in texts
        ]
        d_chunks.append(
            pa.table(
                {
                    "doc_id": pa.array(
                        [d + r * SHIFT for d in doc_ids], type=pa.int64()
                    ),
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
    e_chunks = []
    for r in range(mult):
        if r == 0:
            e_chunks.append(emb)
            continue
        new_vecs = []
        for i, v in enumerate(vecs):
            w = list(v)
            w[(i + r) % len(w)] += 0.001 * r  # deterministic perturbation
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

    from weather_analysis_bigdata__spark.registry import all_queries
    from weather_analysis_bigdata__spark.session import get_spark

    spark = get_spark("scale-exponent")
    registry = all_queries()
    spark.range(1).count()

    dirs = {m: build_corpus(m) for m in mults}
    times: dict[str, dict[int, float]] = {q: {} for q in PROBE}
    for m in mults:
        sf_dir = dirs[m]
        for name in PROBE:
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
    print(json.dumps({"base": BASE_SF, "mults": mults, "queries": out}, indent=1))


if __name__ == "__main__":
    main()
