"""Round-3 operator batch: modern embedding-serving rungs and corpus
mixture control for the LLM-data-pipeline surface.

- Binary (sign-bit) quantization + Hamming search: 64-dim float vectors
  collapse to ONE 64-bit integer (64× compression); candidate
  generation is ``bit_count(xor)`` — the cheapest ANN rung there is —
  followed by exact-cosine re-rank, with recall against the exact
  top-k audited in the same output.
- Matryoshka (MRL) prefix-dimension search: rank on the first 16
  dimensions, re-rank candidates on all 64 — the adaptive-retrieval
  pattern for Matryoshka-trained embeddings (Kusupati et al. 2022).
- Temperature-scaled corpus mixture: per-source sampling rates
  ∝ share^α (α = ½), applied with a deterministic md5 hash gate — the
  domain-reweighting step every pre-training mixture runs (cf. The
  Pile / GPT-3 mixture weights).

Determinism follows the repo rules (functions/deterministic.py,
functions/vectorops.py): exact scaled-integer dot products, one
correctly-rounded double op per ratio/sqrt, fully tie-broken ranks,
hash gates on md5 hex — bit-identical on Spark and DuckDB.

Reference parity note: the reference notebook has none of this — the
batch is charter-extension breadth (SURVEY.md §7.2 M4/M5), extending
the ANN ladder (brute → LSH → IVF → PQ → SQ8) with the binary and
matryoshka rungs and the sampling family with temperature mixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.functions.distributed import ranked_topk
from weather_analysis_bigdata__spark.functions.vectorops import (
    cosine,
    norm,
    scaled_vec,
    sql_dot,
    sql_norm,
)
from weather_analysis_bigdata__spark.registry import register
from weather_analysis_bigdata__spark.sources.files import load_table

_DIMS = 64
_BIN_CANDS = 50  # Hamming-stage candidate pool
_BIN_K = 10
_MRL_PREFIX = 16  # matryoshka prefix dims
_MRL_CANDS = 50
_MRL_K = 10


def _sign_code_halves(emb) -> tuple:
    """Pack the 64 sign bits into two 32-bit halves (kept < 2^32 each so
    the fold never overflows a signed long under ANSI mode). Bit order:
    dimension i → bit (31 − (i mod 32)) of half i div 32 — any fixed
    order works; the oracle compares signs per element, which the hash
    match proves equivalent to the packed form."""
    bits = F.transform(
        emb,
        lambda x: F.when(x.cast("double") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
    )
    return fold(F.slice(bits, 1, 32)), fold(F.slice(bits, 33, 32))


def _sql_hamming(a: str, b: str) -> str:
    """DuckDB: Hamming distance between the sign patterns of two FLOAT[]
    vectors (per-element comparison — the unpacked mirror of the
    packed-bit XOR+popcount the Spark plan runs)."""
    return (
        f"CAST(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CASE WHEN ({a}[i] > 0) <> ({b}[i] > 0) THEN 1 ELSE 0 END)) "
        f"AS BIGINT)"
    )


@register(
    "sim_search_binary_hamming",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm
      FROM embeddings
    ),
    q AS (SELECT embedding, nrm FROM n WHERE vec_id = 0),
    scored AS (
      SELECT c.vec_id,
             {_sql_hamming('q.embedding', 'c.embedding')} AS hamming,
             {sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm)
               AS cosine_sim
      FROM n c, q WHERE c.vec_id <> 0
    ),
    cand AS (
      SELECT vec_id, hamming, cosine_sim,
             CAST(row_number() OVER (ORDER BY hamming ASC, vec_id ASC)
                  AS BIGINT) AS ham_rank
      FROM scored QUALIFY ham_rank <= {_BIN_CANDS}
    ),
    exact AS (
      SELECT vec_id FROM scored
      QUALIFY row_number() OVER (ORDER BY cosine_sim DESC, vec_id ASC)
              <= {_BIN_K}
    )
    SELECT CAST(row_number() OVER (ORDER BY c.cosine_sim DESC, c.vec_id ASC)
                AS BIGINT) AS rank,
           c.vec_id, c.hamming, c.ham_rank, c.cosine_sim,
           c.vec_id IN (SELECT vec_id FROM exact) AS in_exact_topk
    FROM cand c
    QUALIFY rank <= {_BIN_K}
    """,
    doc=f"Binary (sign-bit) quantization ANN — the cheapest rung of the "
    "ladder, now below SQ8/PQ: every 64-dim float vector collapses to "
    "ONE 64-bit code (64× compression; 256-byte vector → 8 bytes), "
    f"candidates are the top-{_BIN_CANDS} by Hamming distance computed "
    "as bit_count(XOR) over two packed 32-bit halves (functions here; "
    "halves keep the ANSI-safe fold exact), and the final "
    f"top-{_BIN_K} is an exact scaled-integer cosine re-rank of "
    "candidates only. in_exact_topk audits recall against the exact "
    "full-precision top-k IN THE SAME OUTPUT — the measured argument "
    "for whether one extra re-rank stage suffices. The oracle computes "
    "Hamming per element; the hash match proves the packed-bit plan "
    "computes the identical function. At 100 TB: codes are 8 bytes/row "
    "(a 100 TB corpus's code table is ~1.6 TB, memory-resident across "
    "a small cluster), XOR+popcount is SIMD-friendly, and both stages "
    "are rank-within-k TakeOrdered plans — no global window, no "
    "all-pairs.",
)
def sim_search_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        scaled_vec("embedding").alias("sva"),
        norm(scaled_vec("embedding")).alias("nrm"),
    )
    lo, hi = _sign_code_halves(F.col("embedding"))
    coded = emb.select("vec_id", "sva", "nrm", lo.alias("lo"), hi.alias("hi"))
    q = coded.filter(F.col("vec_id") == 0).select(
        F.col("sva").alias("q_sva"),
        F.col("nrm").alias("q_nrm"),
        F.col("lo").alias("q_lo"),
        F.col("hi").alias("q_hi"),
    )
    scored = (
        coded.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "sva",
            "nrm",
            "q_sva",
            "q_nrm",
            (
                F.bit_count(F.col("lo").bitwiseXOR(F.col("q_lo")))
                + F.bit_count(F.col("hi").bitwiseXOR(F.col("q_hi")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    cand = ranked_topk(
        scored, [F.col("hamming"), F.col("vec_id")], _BIN_CANDS,
        rank_col="ham_rank",
    ).withColumn(
        "cosine_sim",
        cosine(F.col("q_sva"), F.col("sva"), F.col("q_nrm"), F.col("nrm")),
    )
    # exact full-precision top-k over ALL vectors (the recall yardstick)
    exact = ranked_topk(
        scored.select(
            "vec_id",
            cosine(
                F.col("q_sva"), F.col("sva"), F.col("q_nrm"), F.col("nrm")
            ).alias("cs"),
        ),
        [-F.col("cs"), F.col("vec_id")],
        _BIN_K,
    ).select(F.col("vec_id").alias("ev"), F.lit(True).alias("hit"))
    return (
        ranked_topk(
            cand.select("vec_id", "hamming", "ham_rank", "cosine_sim"),
            [-F.col("cosine_sim"), F.col("vec_id")],
            _BIN_K,
        )
        .join(F.broadcast(exact), F.col("vec_id") == F.col("ev"), "left")
        .select(
            "rank",
            "vec_id",
            "hamming",
            "ham_rank",
            "cosine_sim",
            F.coalesce("hit", F.lit(False)).alias("in_exact_topk"),
        )
    )


@register(
    "sim_search_matryoshka",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding,
             {sql_norm('embedding')} AS nrm,
             {sql_norm(f'(embedding[1:{_MRL_PREFIX}])')} AS pnrm
      FROM embeddings
    ),
    q AS (SELECT embedding, nrm, pnrm FROM n WHERE vec_id = 0),
    scored AS (
      SELECT c.vec_id,
             {sql_dot(f'(q.embedding[1:{_MRL_PREFIX}])', f'(c.embedding[1:{_MRL_PREFIX}])')}
               / (q.pnrm * c.pnrm) AS prefix_sim,
             {sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm)
               AS cosine_sim
      FROM n c, q WHERE c.vec_id <> 0
    ),
    cand AS (
      SELECT vec_id, prefix_sim, cosine_sim,
             CAST(row_number() OVER (ORDER BY prefix_sim DESC, vec_id ASC)
                  AS BIGINT) AS prefix_rank
      FROM scored QUALIFY prefix_rank <= {_MRL_CANDS}
    ),
    exact AS (
      SELECT vec_id FROM scored
      QUALIFY row_number() OVER (ORDER BY cosine_sim DESC, vec_id ASC)
              <= {_MRL_K}
    )
    SELECT CAST(row_number() OVER (ORDER BY c.cosine_sim DESC, c.vec_id ASC)
                AS BIGINT) AS rank,
           c.vec_id, c.prefix_rank, c.prefix_sim, c.cosine_sim,
           c.vec_id IN (SELECT vec_id FROM exact) AS in_exact_topk
    FROM cand c
    QUALIFY rank <= {_MRL_K}
    """,
    doc=f"Matryoshka (MRL) adaptive retrieval (Kusupati et al. 2022): "
    f"stage 1 ranks by cosine over the FIRST {_MRL_PREFIX} of "
    f"{_DIMS} dimensions ({_DIMS // _MRL_PREFIX}× cheaper per "
    f"comparison and a {_DIMS // _MRL_PREFIX}× smaller scan if the "
    "prefix is stored as its own column/index), stage 2 exactly "
    f"re-ranks the top-{_MRL_CANDS} candidates with all dimensions. "
    "Both similarities are exact scaled-integer rationals; "
    "in_exact_topk audits recall against the full-precision top-k in "
    "the same output (the funnel-quality evidence MRL serving "
    "decisions need). Both rankings are TakeOrdered rank-within-k — "
    "no global windows. At 100 TB the prefix stage reads a quarter of "
    "the bytes and the re-rank touches only candidate ids — the same "
    "serve economics as IVF but with zero training state.",
)
def sim_search_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        scaled_vec("embedding").alias("sva"),
        scaled_vec(F.slice("embedding", 1, _MRL_PREFIX)).alias("pva"),
        norm(scaled_vec("embedding")).alias("nrm"),
        norm(scaled_vec(F.slice("embedding", 1, _MRL_PREFIX))).alias("pnrm"),
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("sva").alias("q_sva"),
        F.col("pva").alias("q_pva"),
        F.col("nrm").alias("q_nrm"),
        F.col("pnrm").alias("q_pnrm"),
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cosine(
                F.col("q_pva"), F.col("pva"), F.col("q_pnrm"), F.col("pnrm")
            ).alias("prefix_sim"),
            cosine(
                F.col("q_sva"), F.col("sva"), F.col("q_nrm"), F.col("nrm")
            ).alias("cosine_sim"),
        )
    )
    cand = ranked_topk(
        scored, [-F.col("prefix_sim"), F.col("vec_id")], _MRL_CANDS,
        rank_col="prefix_rank",
    )
    exact = ranked_topk(
        scored.select("vec_id", "cosine_sim"),
        [-F.col("cosine_sim"), F.col("vec_id")],
        _MRL_K,
    ).select(F.col("vec_id").alias("ev"), F.lit(True).alias("hit"))
    return (
        ranked_topk(
            cand.select("vec_id", "prefix_rank", "prefix_sim", "cosine_sim"),
            [-F.col("cosine_sim"), F.col("vec_id")],
            _MRL_K,
        )
        .join(F.broadcast(exact), F.col("vec_id") == F.col("ev"), "left")
        .select(
            "rank",
            "vec_id",
            "prefix_rank",
            "prefix_sim",
            "cosine_sim",
            F.coalesce("hit", F.lit(False)).alias("in_exact_topk"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled corpus mixture (domain reweighting)
# ---------------------------------------------------------------------------
_MIX_ALPHA_NUM, _MIX_ALPHA_DEN = 1, 2  # α = 1/2 (sqrt temperature)
_MIX_GATE_BITS = 20  # hash gate resolution: rate quantized to /2^20


def _sql_hex5_to_long(hex_expr: str) -> str:
    """DuckDB: first 5 hex chars of a digest → BIGINT (20 bits) via a
    strpos Horner chain — mirror of Spark's conv(substr(md5,1,5),16,10)
    (same trick as textops.sql_hex15_to_long, shorter width)."""
    from weather_analysis_bigdata__spark.functions.textops import sql_hexval

    acc = "0"
    for i in range(1, 6):
        acc = f"({acc} * 16 + {sql_hexval(f'substr({hex_expr}, {i}, 1)')})"
    return f"CAST({acc} AS BIGINT)"


@register(
    "corpus_temperature_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_docs) AS n FROM counts),
    w AS (
      SELECT source, n_docs,
             sqrt(CAST(n_docs AS DOUBLE)) AS wgt
      FROM counts
    ),
    z AS (SELECT list_reduce(list_sort(list(wgt)), (a, b) -> a + b) AS zsum
          FROM w),
    rates AS (
      SELECT source, n_docs,
             wgt / (SELECT zsum FROM z) AS target_share,
             CAST(floor(
               LEAST(1.0,
                 (wgt / (SELECT zsum FROM z))
                   * (SELECT n FROM tot) / n_docs * 0.5)
               * {2 ** _MIX_GATE_BITS}) AS BIGINT) AS gate
      FROM w
    ),
    gated AS (
      SELECT d.doc_id, d.source,
             {_sql_hex5_to_long("md5(CAST(d.doc_id AS VARCHAR))")} AS h,
             r.gate, r.target_share
      FROM documents d JOIN rates r USING (source)
    )
    SELECT source,
           CAST(MAX(gate) AS BIGINT) AS gate,
           MAX(target_share) AS target_share,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN h < gate THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected
    FROM gated GROUP BY source
    """,
    doc="Temperature-scaled mixture sampling (α = ½): per-source "
    "target shares ∝ n_s^α — the domain-reweighting rule pre-training "
    "mixtures use to up-sample small domains without discarding large "
    "ones (the multilingual-sampling temperature of mBERT/XLM-R, the "
    "mixture-weight idea of GPT-3/The Pile). Selection is a "
    "DETERMINISTIC md5 hash gate per doc_id: keep iff the first 20 "
    "hash bits fall below floor(rate·2^20) with rate = "
    "share·N/(2·n_s) (the ½ keeps every gate < 1 ⇒ a true subsample). "
    "sqrt and the one divide are correctly-rounded IEEE ops on both "
    "engines; the sqrt-weight normalizer is summed over the SORTED "
    "weight list so the double addition order is engine-identical. "
    "Shape: one count aggregate, an O(sources) broadcast of gates, one "
    "stateless gate scan — at 100 TB this is a single pass with no "
    "shuffle beyond the per-source count, and re-running it yields the "
    "same sample bit-for-bit (reproducible data recipes).",
)
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("n"))
    w = counts.select(
        "source", "n_docs", F.sqrt(F.col("n_docs").cast("double")).alias("wgt")
    )
    # order-free normalizer: fold the SORTED weight list (same trick as
    # chisq_independence) so the double sum is engine-identical
    z = w.agg(
        F.aggregate(
            F.array_sort(F.collect_list("wgt")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("zsum")
    )
    rates = (
        w.crossJoin(F.broadcast(z))
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            (F.col("wgt") / F.col("zsum")).alias("target_share"),
            F.floor(
                F.least(
                    F.lit(1.0),
                    F.col("wgt")
                    / F.col("zsum")
                    * F.col("n")
                    / F.col("n_docs")
                    * F.lit(0.5),
                )
                * F.lit(2 ** _MIX_GATE_BITS)
            )
            .cast("long")
            .alias("gate"),
        )
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 5), 16, 10
    ).cast("long")
    gated = d.join(F.broadcast(rates), "source").select(
        "source",
        "gate",
        "target_share",
        h.alias("h"),
    )
    return gated.groupBy("source").agg(
        F.max("gate").alias("gate"),
        F.max("target_share").alias("target_share"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("h") < F.col("gate"), 1).otherwise(0))
        .cast("long")
        .alias("n_selected"),
    )
