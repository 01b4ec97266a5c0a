"""Round-2 corpus/lakehouse operator batteries (charter extensions).

RAG-prep chunking, sparse TF-IDF similarity (the inverted-index
complement to the dense ANN ladder), near-dup cluster representative
selection (what a production dedup actually keeps), CDC ordered-upsert
apply, last-touch attribution, equi-width histograms, bloom-filter
membership, scalar (SQ8) vector quantization, and broadcast geo
nearest-neighbor assignment.

Same determinism rules as the rest of the registry: integer/decimal
arithmetic across every aggregation boundary, IEEE-correctly-rounded
sqrt only at the final scalar step, fully tie-broken top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.functions.textops import SQL_TOKENS, tokens
from weather_analysis_bigdata__spark.registry import register
from weather_analysis_bigdata__spark.sources.files import load_table

# ---------------------------------------------------------------------------
# RAG-prep: token-window chunking with overlap
# ---------------------------------------------------------------------------
_CHUNK_W = 32  # window (tokens per chunk)
_CHUNK_S = 24  # stride (overlap = W - S = 8 tokens)


@register(
    "chunk_documents_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS.format(c='text')} AS toks FROM documents
    ),
    c AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= {_CHUNK_W} THEN 1
                  ELSE ((len(toks) - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S}) + 1
             END AS n_chunks
      FROM t
    ),
    e AS (
      SELECT doc_id, toks, n, n_chunks,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
      FROM c
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(len(list_slice(toks, chunk_idx * {_CHUNK_S} + 1,
                               least(chunk_idx * {_CHUNK_S} + {_CHUNK_W}, n)))
                AS BIGINT) AS chunk_len,
           md5(array_to_string(
                 list_slice(toks, chunk_idx * {_CHUNK_S} + 1,
                            least(chunk_idx * {_CHUNK_S} + {_CHUNK_W}, n)),
                 ' ')) AS chunk_md5
    FROM e
    """,
    doc="RAG-prep chunking: split each document into overlapping "
    f"{_CHUNK_W}-token windows at stride {_CHUNK_S} (8-token overlap so "
    "retrieval never loses a sentence to a chunk boundary). Chunk count "
    "is exact integer ceil arithmetic ((n-W+S-1) DIV S + 1), chunk "
    "extraction is slice() over the token array, and each chunk is "
    "pinned by md5 of its re-joined text. Cardinality-expanding but "
    "row-local: sequence+posexplode generates chunk indices inside the "
    "row, so the operator is shuffle-free and scales linearly — the "
    "100 TB chunking pass is a map-only job whose output feeds the "
    "embedding stage directly.",
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    W, S = _CHUNK_W, _CHUNK_S
    t = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("toks"))
        .withColumn("n", F.size("toks"))
    )
    c = t.withColumn(
        "n_chunks",
        F.when(F.col("n") <= W, F.lit(1).cast("long")).otherwise(
            F.expr(f"CAST((n - {W} + {S} - 1) DIV {S} AS BIGINT) + 1")
        ),
    )
    e = c.select(
        "doc_id",
        "toks",
        "n_chunks",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)).alias(
            "chunk_idx"
        ),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_idx") * S + 1, F.lit(W))
    return e.select(
        "doc_id",
        "chunk_idx",
        "n_chunks",
        F.size(chunk).cast("long").alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# Sparse TF-IDF cosine similarity (inverted-index, term-at-a-time)
# ---------------------------------------------------------------------------
_TFIDF_DF_CAP = 100  # vocabulary = terms appearing in ≤ this many docs
_TFIDF_SCALE = 1_000_000  # integer idf scaling (floor division, exact)
_TFIDF_K = 20


@register(
    "tfidf_cosine_topk",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (
        SELECT doc_id, unnest({SQL_TOKENS.format(c='text')}) AS term
        FROM documents
      )
      GROUP BY doc_id, term
    ),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    w AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (((SELECT n_docs FROM nd) + 1) * {_TFIDF_SCALE}
                      // (dfreq.df + 1)) AS w
      FROM tf JOIN dfreq USING (term)
      WHERE dfreq.df <= {_TFIDF_DF_CAP}
    ),
    norms AS (
      SELECT doc_id,
             SUM(CAST(w AS DECIMAL(18,0)) * CAST(w AS DECIMAL(18,0))) AS nsq
      FROM w GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             SUM(CAST(a.w AS DECIMAL(18,0)) * CAST(b.w AS DECIMAL(18,0))) AS dt,
             COUNT(*) AS n_shared_terms
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_shared_terms AS BIGINT) AS n_shared_terms,
           CAST(dt AS DOUBLE)
             / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE)) AS cosine
    FROM dots
    JOIN norms na ON doc_a = na.doc_id
    JOIN norms nb ON doc_b = nb.doc_id
    ORDER BY cosine DESC, doc_a ASC, doc_b ASC
    LIMIT {_TFIDF_K}
    """,
    doc="Sparse TF-IDF cosine similarity via an inverted index — the "
    "term-at-a-time sparse complement to the dense-embedding ANN "
    "ladder. Vocabulary is df-capped (terms in ≤"
    f"{_TFIDF_DF_CAP} docs), which simultaneously bounds every "
    "posting list (the quadratic hot-term risk at 100 TB, same "
    "mitigation as dedup_jaccard_dfcapped) and is the TF-IDF-correct "
    "choice: high-df terms carry no discriminative weight. IDF is the "
    f"scaled-integer rational floor((N+1)·{_TFIDF_SCALE}/(df+1)) — no "
    "transcendental log, so weights are exact integers; dot products "
    "and squared norms accumulate as DECIMAL(18,0)×DECIMAL(18,0) "
    "products (order-independent, overflow-proof), and the only float "
    "op is the final correctly-rounded sqrt+divide. Scale shape: one "
    "shuffle on term (bounded postings), one on the pair key; top-k "
    "fully tie-broken.",
)
def tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = (
        tf.join(dfreq.filter(F.col("df") <= _TFIDF_DF_CAP), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.expr(
                f"tf * ((n_docs + 1) * {_TFIDF_SCALE} DIV (df + 1))"
            ).alias("w"),
        )
    )
    wd = F.col("w").cast("decimal(18,0)")
    norms = w.groupBy("doc_id").agg(F.sum(wd * wd).alias("nsq"))
    dots = (
        w.alias("a")
        .join(
            w.alias("b"),
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.sum(
                F.col("a.w").cast("decimal(18,0)")
                * F.col("b.w").cast("decimal(18,0)")
            ).alias("dt"),
            F.count(F.lit(1)).alias("n_shared_terms"),
        )
    )
    return (
        dots.join(norms.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(norms.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_shared_terms",
            (
                F.col("dt").cast("double")
                / F.sqrt(
                    F.col("na.nsq").cast("double")
                    * F.col("nb.nsq").cast("double")
                )
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("doc_a").asc(), F.col("doc_b").asc())
        .limit(_TFIDF_K)
    )


# ---------------------------------------------------------------------------
# Near-dup cluster representative selection (what a dedup actually keeps)
# ---------------------------------------------------------------------------
def _round2_cc_oracle() -> str:
    from weather_analysis_bigdata__spark.queries_llmops import SQL_CC_COMP

    return f"""
    WITH RECURSIVE {SQL_CC_COMP},
    qual AS (
      SELECT d.doc_id, len({SQL_TOKENS.format(c='d.text')}) AS n_tokens
      FROM docs d
    ),
    ranked AS (
      SELECT c.component_id, c.doc_id, q.n_tokens,
             row_number() OVER (PARTITION BY c.component_id
                                ORDER BY q.n_tokens DESC, c.doc_id ASC) AS rk
      FROM comp c JOIN qual q ON c.doc_id = q.doc_id
    )
    SELECT component_id,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(MAX(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS rep_doc_id,
           CAST(MAX(CASE WHEN rk = 1 THEN n_tokens END) AS BIGINT)
             AS rep_n_tokens,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM ranked
    GROUP BY component_id
    """


@register(
    "dedup_cluster_representative",
    oracle=_round2_cc_oracle(),
    doc="The KEEP side of near-dup dedup: connected components over "
    "word-3-gram Jaccard edges (same chained-copy corpus and edge "
    "pipeline as dedup_connected_components — clusters only emerge "
    "through label propagation) resolved to ONE representative per "
    "cluster by a quality criterion (here max token count, ties to "
    "the lowest doc_id) instead of the naive min-id. The chained "
    "corpus makes the distinction observable: the longest chain "
    "member C (A+50 filler tokens) wins, not the original A with the "
    "minimal id — i.e., the representative is a real arg-max over "
    "quality, exactly what production dedup (keep the best-quality "
    "duplicate, drop the rest) needs. Per-cluster selection is a "
    "row_number window over the O(cluster) component table, never "
    "raw text; at 100 TB the component labels are the only shuffled "
    "state after edge construction.",
)
def dedup_cluster_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.operators.components import (
        connected_components,
    )
    from weather_analysis_bigdata__spark.queries_llmops import (
        cc_chained_docs,
        cc_jaccard_edges,
    )

    docs = cc_chained_docs(spark, sf_dir)
    comp = connected_components(cc_jaccard_edges(docs))
    qual = docs.select("doc_id", F.size(tokens("text")).alias("n_tokens"))
    ranked = (
        comp.select(F.col("node").alias("doc_id"), F.col("comp").alias("component_id"))
        .join(qual, "doc_id")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("component_id").orderBy(
                    F.col("n_tokens").desc(), F.col("doc_id").asc()
                )
            ),
        )
    )
    return ranked.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("rep_doc_id"),
        F.max(F.when(F.col("rk") == 1, F.col("n_tokens")))
        .cast("long")
        .alias("rep_n_tokens"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
    )
