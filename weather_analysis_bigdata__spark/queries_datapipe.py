"""Training-data-pipeline operators, batch 2: corpus hygiene and
retrieval shapes a 100 TB pre-training pipeline runs alongside dedup.

- Gopher/C4-style repetition filtering (top-bigram coverage),
- BM25 keyword retrieval (rational-idf variant — no transcendental
  functions, so the score is bit-identical across engines),
- PII extraction / redaction battery (emails, URLs, phone numbers),
- Z-order (Morton) clustering keys for multi-dimensional file layout.

Everything is built-in-function composition (JVM-side, codegen-capable);
no Python UDFs. Cross-engine determinism follows the repo's rules
(functions/deterministic.py): exact integer/decimal accumulation, one
final IEEE double division per ratio, mirrored expression trees.

Reference parity note: the reference notebook has no text corpus — this
module is charter-extension breadth (SURVEY.md §7.2 M4, "LLM-data-
pipeline operators"); its dedup-adjacent hygiene rules complement
queries_llmops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.functions.textops import (
    SQL_TOKENS,
    md5s,
    sql_hex15_to_long,
    sql_word_ngrams,
    tokens,
    word_ngrams,
)
from weather_analysis_bigdata__spark.registry import register
from weather_analysis_bigdata__spark.sources.files import (
    load_table,
    spread_small_scan,
)


# ---------------------------------------------------------------------------
# Gopher-style repetition filter
# ---------------------------------------------------------------------------
def repetition_feature_cols(text_col) -> dict:
    """Row-local Gopher-repetition features as named Columns — shared
    by :func:`repetition_topgram_filter` and the quality-ensemble
    fusion (queries_quality.py)."""
    toks = tokens(text_col)
    sorted_b = F.array_sort(word_ngrams(toks, 2))
    # One pass over the sorted bigram array: (prev, current-run, best-run).
    top_c = F.aggregate(
        sorted_b,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            (F.when(x == acc["prev"], acc["run"]).otherwise(F.lit(0)) + 1).alias(
                "run"
            ),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"]).otherwise(F.lit(0)) + 1,
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_tok = F.size(toks)
    rep = top_c.cast("double") * 2 / F.nullif(n_tok, F.lit(0)).cast("double")
    return {
        "n_tokens": n_tok.cast("bigint"),
        "top_bigram_count": top_c.cast("bigint"),
        "rep_fraction": rep,
        "keep": rep < 0.125,
    }


@register(
    "repetition_topgram_filter",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {SQL_TOKENS.format(c='text')} AS toks FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest({sql_word_ngrams('toks', 2)}) AS bigram
        FROM t
    ),
    cnt AS (SELECT doc_id, bigram, count(*) AS c FROM g GROUP BY doc_id, bigram),
    top AS (SELECT doc_id, max(c) AS top_c FROM cnt GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT)            AS n_tokens,
           CAST(coalesce(top.top_c, 0) AS BIGINT) AS top_bigram_count,
           CAST(coalesce(top.top_c, 0) * 2 AS DOUBLE)
             / CAST(NULLIF(len(t.toks), 0) AS DOUBLE) AS rep_fraction,
           (CAST(coalesce(top.top_c, 0) * 2 AS DOUBLE)
             / CAST(NULLIF(len(t.toks), 0) AS DOUBLE) < 0.125) AS keep
    FROM t LEFT JOIN top USING (doc_id)
    """,
    doc="Gopher-style repetition filter: fraction of tokens covered by "
    "the single most frequent word bigram (Rae et al. 2021 use the same "
    "family of duplicate-n-gram-coverage rules). Spark side is entirely "
    "row-local — bigrams via the O(n) zip_with shingle builder, then the "
    "max duplicate count from a SINGLE aggregate pass over the SORTED "
    "bigram array (max run length of equal adjacent elements ≡ max "
    "multiplicity). No explode, no shuffle: at 100 TB this scans and "
    "filters in place, while the oracle's unnest+GROUP BY form (clearer, "
    "but a shuffle) verifies it at test scale.",
)
def repetition_topgram_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread_small_scan: this op's thesis (and plan contract) is the
    # shuffle-free in-place scan — see the docstring
    d = load_table(spark, sf_dir, "documents")
    c = repetition_feature_cols(F.col("text"))
    return d.select(
        "doc_id", *[v.alias(k) for k, v in c.items()]
    )


# ---------------------------------------------------------------------------
# BM25 keyword retrieval
# ---------------------------------------------------------------------------
_BM25_TERMS = ("spark", "join", "window")
_K1 = "1.2"
_B = "0.75"


#: Shared with hybrid_search_rrf (queries_round2.py) as a module-level
#: constant — no private-registry read, no import-order coupling.
SQL_BM25_TOPK = f"""
    WITH per_doc AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS dl,
               {', '.join(
                   f"CAST(len(list_filter(toks, t -> t = '{w}')) AS BIGINT) AS tf{i}"
                   for i, w in enumerate(_BM25_TERMS)
               )}
        FROM (SELECT doc_id, {SQL_TOKENS.format(c='text')} AS toks FROM documents)
    ),
    stats AS (
        SELECT count(*) AS n_docs,
               sum(dl) AS sum_dl,
               {', '.join(
                   f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
                   for i in range(len(_BM25_TERMS))
               )}
        FROM per_doc
    )
    SELECT doc_id, dl, tf0, tf1, tf2,
           ({' + '.join(
               f"(((CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE)) + 0.5)"
               f" / (CAST(df{i} AS DOUBLE) + 0.5))"
               f" * ((CAST(tf{i} AS DOUBLE) * ({_K1} + 1.0))"
               f" / (CAST(tf{i} AS DOUBLE) + {_K1} * ((1.0 - {_B}) + {_B}"
               f" * (CAST(dl AS DOUBLE)"
               f" / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))"
               for i in range(len(_BM25_TERMS))
           )}) AS score
    FROM per_doc, stats
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """


@register(
    "bm25_search_topk",
    oracle=SQL_BM25_TOPK,
    doc="BM25 top-10 keyword retrieval for a 3-term query. Uses the "
    "rational idf variant idf = (N - df + ½)/(df + ½) — monotone in the "
    "standard log idf, but free of transcendental functions, so both "
    "engines produce bit-identical IEEE doubles (every +,×,/ is "
    "correctly rounded and the expression trees mirror exactly). "
    "Per-doc term frequencies fold in ONE aggregate pass over the token "
    "array (PERF.md: sibling expressions re-evaluate an inlined split() "
    "per reference; the explode(array(struct)) Generate node is a "
    "collapse barrier that materializes the fold once). Corpus stats "
    "(N, Σdl, df) are one exact-integer global aggregate broadcast to "
    "every scorer; top-k is TakeOrdered — no global sort.",
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(
        load_table(spark, sf_dir, "documents")
    )  # engage all cores on this compute-heavy row-local stage
    toks = tokens("text")
    nt = len(_BM25_TERMS)
    # [dl, tf0, tf1, tf2] in one pass; finish folds into a struct.
    sig = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), nt + 1),
        lambda acc, x: F.array(
            acc[0] + 1,
            *[
                acc[i + 1]
                + F.when(x == _BM25_TERMS[i], F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
                for i in range(nt)
            ],
        ),
        lambda acc: F.struct(
            acc[0].alias("dl"), *[acc[i + 1].alias(f"tf{i}") for i in range(nt)]
        ),
    )
    # explode(array(s)): a Generate node CollapseProject cannot inline
    # through — the aggregate fold runs once per row, not once per field.
    per_doc = d.select(
        "doc_id", F.explode(F.array(sig)).alias("s")
    ).select("doc_id", "s.*")

    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(nt)
        ],
    )

    def fdbl(c: str) -> F.Column:
        return F.col(c).cast("double")

    avgdl = fdbl("sum_dl") / fdbl("n_docs")
    score = None
    for i in range(nt):
        idf = ((fdbl("n_docs") - fdbl(f"df{i}")) + F.lit(0.5)) / (
            fdbl(f"df{i}") + F.lit(0.5)
        )
        w = (fdbl(f"tf{i}") * (F.lit(1.2) + F.lit(1.0))) / (
            fdbl(f"tf{i}")
            + F.lit(1.2)
            * ((F.lit(1.0) - F.lit(0.75)) + F.lit(0.75) * (fdbl("dl") / avgdl))
        )
        term = idf * w
        score = term if score is None else score + term
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .select("doc_id", "dl", "tf0", "tf1", "tf2", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# PII extraction / redaction
# ---------------------------------------------------------------------------
# Simple character-class patterns only — no lookaround, no backrefs — so
# Java regex (Spark) and RE2 (DuckDB) agree on every match.
_PAT_EMAIL = r"[a-z0-9._]+@[a-z0-9.]+\.[a-z]+"
_PAT_URL = r"https?://[a-z0-9./_-]+"
_PAT_PHONE = r"\b\d{3}-\d{4}\b"


@register(
    "pii_extract_redact",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text
                 || CASE WHEN doc_id % 7 = 0
                         THEN ' contact u' || doc_id
                              || '@mail.example.com or http://ex.example.com/p/'
                              || doc_id
                         ELSE '' END
                 || CASE WHEN doc_id % 11 = 0
                         THEN ' call 555-0' || lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0')
                         ELSE '' END AS text2
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text2, '{_PAT_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text2, '{_PAT_URL}')) AS BIGINT)   AS n_urls,
           CAST(len(regexp_extract_all(text2, '{_PAT_PHONE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(text2, '{_PAT_EMAIL}', '<EMAIL>', 'g'),
                   '{_PAT_URL}', '<URL>', 'g'),
                 '{_PAT_PHONE}', '<PHONE>', 'g')) AS redacted_md5
    FROM aug
    """,
    doc="PII scrubbing battery: extract-count and redact emails / URLs / "
    "phone numbers. The test corpus contains no PII, so deterministic "
    "synthetic PII is appended to a doc_id-selected subset — mirrored "
    "verbatim in the oracle (the repo's standard trick for null-free / "
    "PII-free test tables). Patterns are plain character classes so the "
    "Java-regex and RE2 engines agree; redaction order is fixed "
    "(email → URL → phone; prefixes don't overlap) and verified via md5 "
    "of the fully-redacted text. Row-local → shuffle-free at any scale. "
    "DuckDB regexp_replace needs the explicit 'g' flag for "
    "replace-all parity with Spark.",
)
def pii_extract_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    text2 = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact u"),
                did.cast("string"),
                F.lit("@mail.example.com or http://ex.example.com/p/"),
                did.cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" call 555-0"),
                F.lpad((did % 100).cast("string"), 3, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text2, _PAT_EMAIL, "<EMAIL>"),
            _PAT_URL,
            "<URL>",
        ),
        _PAT_PHONE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(text2, F.lit(_PAT_EMAIL), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(text2, F.lit(_PAT_URL), 0))
        .cast("bigint")
        .alias("n_urls"),
        F.size(F.regexp_extract_all(text2, F.lit(_PAT_PHONE), 0))
        .cast("bigint")
        .alias("n_phones"),
        md5s(redacted).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering keys
# ---------------------------------------------------------------------------
def _zkey_sql(xe: str, ye: str, bits: int, div: str) -> str:
    """Bit-interleave via pure integer arithmetic — ((v div 2^i) % 2) *
    2^(2i[+1]) — identical formula on both engines; only the integer-
    division token differs (Spark ``div``, DuckDB ``//``). Inputs are
    non-negative so truncating and flooring division coincide."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xe}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({ye}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_ZX = "user_id % 1024"
_ZBITS = 10


@register(
    "zorder_cluster_stats",
    oracle=f"""
    WITH k AS (
        SELECT event_id,
               {_ZX} AS x,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 1024 AS y
        FROM events
    ),
    z AS (
        SELECT event_id, x, y,
               {_zkey_sql('x', 'y', _ZBITS, '//')} AS zkey
        FROM k
    )
    SELECT zkey // {1 << 8} AS zbucket,
           count(*) AS n_events,
           CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
           CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
    FROM z
    GROUP BY zbucket
    """,
    doc="Z-order (Morton) clustering key over (user bucket, day): "
    "interleave 10 bits of each dimension, then report per-zbucket "
    "min/max envelopes of BOTH dimensions. This is the layout primitive "
    "behind multi-dimensional data skipping (Delta/Iceberg Z-ORDER BY): "
    "sorting 100 TB of files by zkey bounds every file's (x, y) "
    "envelope, so parquet min/max stats prune scans on EITHER predicate "
    "column — a 1-D sort can only prune one. The interleave is pure "
    "integer arithmetic (shift-free, engine-portable), row-local, and "
    "the bucket aggregation is one shuffle.",
)
def zorder_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = e.select(
        "event_id",
        F.expr(_ZX).alias("x"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 1024).alias("y"),
    )
    z = k.select(
        "event_id", "x", "y", F.expr(_zkey_sql("x", "y", _ZBITS, "div")).alias("zkey")
    )
    return (
        z.groupBy(F.expr(f"zkey div {1 << 8}").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
    )


# ---------------------------------------------------------------------------
# Exact heavy hitters (Misra-Gries two-pass)
# ---------------------------------------------------------------------------
@register(
    "heavy_hitters_tokens",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({SQL_TOKENS.format(c='text')}) AS token FROM documents
    ),
    tot AS (SELECT count(*) AS n_total FROM tok),
    cnt AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
    SELECT token, cnt FROM cnt CROSS JOIN tot WHERE cnt * 30 > n_total
    """,
    doc="Exact corpus heavy hitters: tokens whose frequency exceeds "
    "1/30 of the total token count, computed by the two-pass "
    "Misra-Gries scheme in operators/heavyhitters.py — a bounded-memory "
    "mapInPandas candidate sketch (k counters per partition, no "
    "shuffle) followed by an exact broadcast-semi-join recount. The "
    "candidate set is partitioning-DEPENDENT; the final answer is "
    "partitioning-INVARIANT because any MG superset recounts to the "
    "same exact result — the oracle is the plain GROUP BY + HAVING "
    "the sketch replaces at scale. Threshold comparison is integer "
    "(cnt·k > n), no division.",
)
def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.operators.heavyhitters import (
        frequent_tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    tok_df = d.select(F.explode(tokens("text")).alias("token"))
    return frequent_tokens(tok_df, "token", k=30)


# ---------------------------------------------------------------------------
# PageRank over the event-type transition graph
# ---------------------------------------------------------------------------
def _pagerank_oracle(iters: int, scale: int) -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (aggregation
    inside a recursive term is not portable SQL; 5 unrolled steps are)."""
    parts = [
        f"""
    WITH pairs AS (
        SELECT event_type AS src,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS dst
        FROM events
    ),
    edges AS (SELECT src, dst, count(*) AS w FROM pairs
              WHERE dst IS NOT NULL GROUP BY src, dst),
    outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
    e AS (SELECT edges.src, edges.dst, edges.w, outw.out_w
          FROM edges JOIN outw USING (src)),
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM edges
               UNION ALL SELECT dst FROM edges)),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST({scale} // n AS BIGINT) AS rank_scaled
           FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    r{i} AS (
        SELECT nodes.node,
               CAST((15 * {scale}) // (100 * nn.n)
                    + coalesce(c.s, 0) AS BIGINT) AS rank_scaled
        FROM nodes CROSS JOIN nn
        LEFT JOIN (SELECT e.dst AS node,
                          sum((r.rank_scaled * 85 * e.w) // (100 * e.out_w)) AS s
                   FROM e JOIN r{i - 1} r ON e.src = r.node
                   GROUP BY e.dst) c ON c.node = nodes.node
    )"""
        )
    parts.append(
        f"""
    SELECT node, rank_scaled,
           CAST(rank_scaled AS DOUBLE) / 1e10 AS rank
    FROM r{iters}"""
    )
    return "".join(parts)


from weather_analysis_bigdata__spark.operators.pagerank import (  # noqa: E402
    SCALE as _PR_SCALE,
)
from weather_analysis_bigdata__spark.operators.pagerank import (  # noqa: E402
    pagerank_fixed_point,
)


@register(
    "pagerank_event_types",
    oracle=_pagerank_oracle(5, _PR_SCALE),
    doc="PageRank (5 iterations, damping 0.85) over the event-type "
    "transition graph: edges are consecutive-event pairs per user "
    "(LEAD over (user_id, ts)), weighted by transition count — the "
    "'which states dominate user journeys' question. Runs the exact "
    "fixed-point iterative operator (operators/pagerank.py): ranks are "
    "10^10-scaled BIGINTs, every superstep is integer multiply / floor-"
    "divide / sum, so the result is bit-identical across engines and "
    "reduction orders. The oracle unrolls the same five supersteps as "
    "chained CTEs (aggregation inside a recursive CTE term is not "
    "portable; WITH RECURSIVE stays the Spark-side tool for traversal "
    "shapes — see recursive_cte_ancestors). Each Spark superstep is one "
    "broadcast join + one aggregate with lineage truncated by eager "
    "localCheckpoint, the components.py pattern.",
)
def pagerank_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    edges = (
        pairs.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank_fixed_point(edges, iters=5)
    return ranks.select(
        "node",
        "rank_scaled",
        (F.col("rank_scaled").cast("double") / F.lit(1e10)).alias("rank"),
    )


# ---------------------------------------------------------------------------
# Welch's t-test (A/B experiment readout)
# ---------------------------------------------------------------------------
@register(
    "ab_test_welch",
    oracle="""
    WITH s AS (
      SELECT
        CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE) AS na,
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE) AS nb,
        CAST(SUM(CASE WHEN event_type = 'click'
                      THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sxa,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sxb,
        CAST(SUM(CASE WHEN event_type = 'click'
                      THEN CAST(value AS DECIMAL(18,2))
                           * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sxxa,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(value AS DECIMAL(18,2))
                           * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sxxb
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           sxa / na AS mean_a, sxb / nb AS mean_b,
           ((sxa / na) - (sxb / nb))
             / sqrt((((sxxa - sxa * sxa / na) / (na - 1.0)) / na)
                    + (((sxxb - sxb * sxb / nb) / (nb - 1.0)) / nb)) AS t_stat,
           ((((sxxa - sxa * sxa / na) / (na - 1.0)) / na)
            + (((sxxb - sxb * sxb / nb) / (nb - 1.0)) / nb))
           * ((((sxxa - sxa * sxa / na) / (na - 1.0)) / na)
              + (((sxxb - sxb * sxb / nb) / (nb - 1.0)) / nb))
             / (((((sxxa - sxa * sxa / na) / (na - 1.0)) / na)
                 * (((sxxa - sxa * sxa / na) / (na - 1.0)) / na)) / (na - 1.0)
                + ((((sxxb - sxb * sxb / nb) / (nb - 1.0)) / nb)
                   * (((sxxb - sxb * sxb / nb) / (nb - 1.0)) / nb)) / (nb - 1.0))
             AS welch_dof
    FROM s
    """,
    doc="Welch's unequal-variance t-test between two event cohorts "
    "(click vs purchase values) — the A/B experiment readout, in ONE "
    "conditional-aggregate pass (no self-join, no two subqueries: "
    "count/Σx/Σx² per arm via CASE). Moments are exact decimal sums; "
    "the t statistic and Welch–Satterthwaite dof are then pure IEEE "
    "arithmetic (+,×,/,sqrt are all correctly rounded) over mirrored "
    "expression trees → bit-identical across engines, same discipline "
    "as dispersion_stats/a8_pearson_corr.",
)
def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.functions.deterministic import dec

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    v = dec("value")
    is_a = F.col("event_type") == "click"
    is_b = F.col("event_type") == "purchase"
    s = e.agg(
        F.count(F.when(is_a, 1)).cast("double").alias("na"),
        F.count(F.when(is_b, 1)).cast("double").alias("nb"),
        F.sum(F.when(is_a, v)).cast("double").alias("sxa"),
        F.sum(F.when(is_b, v)).cast("double").alias("sxb"),
        F.sum(F.when(is_a, v * v)).cast("double").alias("sxxa"),
        F.sum(F.when(is_b, v * v)).cast("double").alias("sxxb"),
    )
    na, nb = F.col("na"), F.col("nb")
    sxa, sxb, sxxa, sxxb = (F.col(c) for c in ("sxa", "sxb", "sxxa", "sxxb"))
    se_a = ((sxxa - sxa * sxa / na) / (na - F.lit(1.0))) / na
    se_b = ((sxxb - sxb * sxb / nb) / (nb - F.lit(1.0))) / nb
    t = ((sxa / na) - (sxb / nb)) / F.sqrt(se_a + se_b)
    dof = (se_a + se_b) * (se_a + se_b) / (
        (se_a * se_a) / (na - F.lit(1.0)) + (se_b * se_b) / (nb - F.lit(1.0))
    )
    return s.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        (sxa / na).alias("mean_a"),
        (sxb / nb).alias("mean_b"),
        t.alias("t_stat"),
        dof.alias("welch_dof"),
    )


# ---------------------------------------------------------------------------
# Native session windows
# ---------------------------------------------------------------------------
#: Shared with streaming_session_window_replay (queries_streaming.py) —
#: a module-level constant, not a private-registry read, so the two
#: modules have no import-order coupling (the SQL_CC_COMP pattern).
SQL_SESSION_WINDOW = """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    islands AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL '30 minutes' AS TIMESTAMP) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM islands GROUP BY user_id, session_id
    """


@register(
    "session_window_native",
    oracle=SQL_SESSION_WINDOW,
    doc="Spark's NATIVE session_window aggregation (dynamic-gap session "
    "windows merged by the engine, usable identically in batch and "
    "Structured Streaming) — complementing the two hand-built forms "
    "already covered (gaps-and-islands SQL in events_sessionize_30m, "
    "custom state in streaming/sessionize.py). Session end = last "
    "event + gap, per session_window semantics. Oracle reconstructs "
    "the same sessions via the lag→flag→running-sum islands idiom. "
    "One user_id shuffle; session state in streaming mode is bounded "
    "by the watermark.",
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured analytics (Spark 4)
# ---------------------------------------------------------------------------
@register(
    "variant_json_ops",
    oracle="""
    WITH aug AS (
      SELECT event_type,
             CASE WHEN event_id % 13 = 0 THEN '{bad json' ELSE props END AS props2
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN NOT json_valid(props2) THEN 1 END) AS BIGINT)
             AS n_malformed,
           CAST(sum(CASE WHEN json_valid(props2)
                         THEN CAST(json_extract(props2, '$.k') AS BIGINT) END)
                AS BIGINT) AS sum_k,
           CAST(max(CASE WHEN json_valid(props2)
                         THEN CAST(json_extract(props2, '$.k') AS BIGINT) END)
                AS BIGINT) AS max_k
    FROM aug GROUP BY event_type
    """,
    doc="Semi-structured analytics through Spark 4's VARIANT type: "
    "try_parse_json → binary variant encoding → try_variant_get path "
    "extraction, with malformed rows injected (event_id % 13) to pin "
    "the null-safe parse path — try_parse_json yields NULL instead of "
    "failing the query under ANSI mode. VARIANT keeps the parsed tree "
    "in a compact binary form, so repeated path extraction avoids "
    "re-parsing the JSON text per access (the from_json_typed_agg "
    "query covers the fixed-schema alternative; VARIANT is the "
    "schema-flexible path). Oracle mirrors with json_valid + "
    "json_extract.",
)
def variant_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "props2",
        F.when(F.col("event_id") % 13 == 0, F.lit("{bad json")).otherwise(
            F.col("props")
        ),
    )
    v = e.withColumn("v", F.expr("try_parse_json(props2)")).withColumn(
        "k", F.expr("try_variant_get(v, '$.k', 'bigint')")
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("v").isNull(), 1)).alias("n_malformed"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Custom Python DataSource scan (Spark 4 connector API)
# ---------------------------------------------------------------------------
@register(
    "python_datasource_scan",
    oracle="""
    WITH gen AS (
      SELECT 'STATION_' || CAST(s.i AS VARCHAR) AS station,
             CAST(d.j AS INT) AS day,
             ((s.i * 37 + d.j * 13) % 400 - 100) / 10.0 AS tmax_c,
             ((s.i * 7 + d.j * 3) % 250) / 10.0 AS prcp_mm
      FROM generate_series(0, 4) AS s(i), generate_series(0, 364) AS d(j)
    )
    SELECT station,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(SUM(CAST(tmax_c AS DECIMAL(18,1))) AS DOUBLE) / count(*)
             AS mean_tmax_c,
           CAST(SUM(CAST(prcp_mm AS DECIMAL(18,1))) AS DOUBLE) AS total_prcp_mm
    FROM gen GROUP BY station
    """,
    doc="A pluggable connector via Spark 4's Python DataSource API "
    "(sources/pyds.py): named format registration, options, declared "
    "schema, one InputPartition per station with read() executed ON "
    "EXECUTORS — the packaged form of the reference's driver-side REST "
    "pagination loop (Weather_API.py:50-113), horizontally scalable "
    "like any scan. The generator is integer-derived so the oracle "
    "regenerates identical rows with generate_series; aggregation uses "
    "the repo's exact-decimal sums.",
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.functions.deterministic import dec
    from weather_analysis_bigdata__spark.sources.pyds import (
        register_synthetic_weather,
    )

    register_synthetic_weather(spark)
    w = (
        spark.read.format("synthetic_weather")
        .option("stations", 5)
        .option("days", 365)
        .load()
    )
    return w.groupBy("station").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum(dec("tmax_c", 1)).cast("double") / F.count(F.lit(1))).alias(
            "mean_tmax_c"
        ),
        F.sum(dec("prcp_mm", 1)).cast("double").alias("total_prcp_mm"),
    )


# ---------------------------------------------------------------------------
# mapInArrow byte-level stats
# ---------------------------------------------------------------------------
@register(
    "multimodal_arrow_byte_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
           CAST(list_sum(list_transform(generate_series(1, length(text)),
                                        i -> ascii(substr(text, i, 1))))
                AS BIGINT) AS byte_sum
    FROM documents
    """,
    doc="Byte-level payload statistics through mapInArrow (raw Arrow "
    "RecordBatches, no pandas conversion — the right Python stage for "
    "codec sniffing / magic-number checks over binary columns; "
    "operators/multimodal.py::arrow_byte_stats, numpy frombuffer on "
    "the payload buffers). byte_sum doubles as a content checksum the "
    "oracle recomputes char-wise (ASCII corpus ⇒ codepoint = byte). "
    "Shuffle-free, same plan shape as the mapInPandas stages.",
)
def multimodal_arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.operators.multimodal import (
        arrow_byte_stats,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return arrow_byte_stats(d, id_col="doc_id", payload_col="payload")


# ---------------------------------------------------------------------------
# Empty-input aggregate semantics
# ---------------------------------------------------------------------------
@register(
    "empty_input_aggregates",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(l_quantity) AS BIGINT) AS n_nonnull,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(min(l_quantity) AS DOUBLE) AS min_qty,
           CAST(max(l_quantity) AS DOUBLE) AS max_qty,
           CAST(avg(l_quantity) AS DOUBLE) AS avg_qty,
           coalesce(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0)
             AS sum_qty_defaulted,
           CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags
    FROM lineitem WHERE l_quantity < -1
    """,
    doc="Global aggregates over a provably EMPTY input (l_quantity is "
    "never negative): COUNT returns 0, every other aggregate returns "
    "NULL — the SQL edge case that silently breaks dashboards and "
    "downstream NOT NULL sinks when a partition filter matches nothing "
    "(e.g. a backfill of a day with no data). Pins that Spark's ANSI "
    "mode and DuckDB agree row-for-row, including the COALESCE "
    "defaulting idiom. One degenerate plan: the filter folds to an "
    "empty scan, the aggregate still emits its single global row.",
)
def empty_input_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.functions.deterministic import dec

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < -1)
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_nonnull"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        F.avg("l_quantity").cast("double").alias("avg_qty"),
        F.coalesce(F.sum(dec("l_quantity")).cast("double"), F.lit(0.0)).alias(
            "sum_qty_defaulted"
        ),
        F.count_distinct(F.col("l_returnflag")).alias("n_flags"),
    )


# ---------------------------------------------------------------------------
# Graph: triangle counting (supplier co-occurrence)
# ---------------------------------------------------------------------------
@register(
    "triangle_count",
    oracle="""
    WITH e AS (
      SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
                      greatest(a.l_suppkey, b.l_suppkey) AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles FROM e e1
      JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(DISTINCT s) FROM (
             SELECT u AS s FROM e UNION SELECT v FROM e)) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM tri
    """,
    doc="Triangle counting over the supplier co-occurrence graph (edge = "
    "two suppliers fulfilled the same order): the canonical wedge-close "
    "join — edges oriented u<v, wedges (e1,e2) sharing the low endpoint "
    "closed by probing the third edge. Per-order pair generation is "
    "bounded (O(items²) per order, items ≤ 7), so edge building never "
    "blows up. At 100 TB orient edges by (degree, id) instead of raw id "
    "— every wedge is then generated at its LOWEST-degree vertex, "
    "bounding per-key fanout by O(sqrt(|E|)) (the arboricity bound) and "
    "with it the worst shuffle partition; the join structure is "
    "unchanged. Output: node/edge/triangle counts — the graph-health "
    "triple used to monitor clustering in entity-resolution graphs.",
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.least("a.l_suppkey", "b.l_suppkey").alias("u"),
            F.greatest("a.l_suppkey", "b.l_suppkey").alias("v"),
        )
        .distinct()
    )
    # graph joins need no sorted output — hash join beats sort-merge.
    # The hint goes on the JOINED aliases only: hinting `e` itself
    # leaks the hint into the union/aggregate branches below, where it
    # reaches the final cross joins and is warned-then-ignored (the
    # round-9 driver-tail hygiene pass).
    e1 = e.alias("e1")
    e2 = e.hint("shuffle_hash").alias("e2")
    e3 = e.hint("shuffle_hash").alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e2.u") == F.col("e1.u")) & (F.col("e2.v") > F.col("e1.v")),
        )
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("u").alias("s"))
        .union(e.select("v"))
        .agg(F.countDistinct("s").alias("n_nodes"))
    )
    edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return nodes.crossJoin(edges).crossJoin(tri)


# ---------------------------------------------------------------------------
# Privacy: k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------
@register(
    "k_anonymity_audit",
    oracle="""
    WITH q AS (
      SELECT c_nationkey,
             c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balance_band,
             c_custkey
      FROM customer
    )
    SELECT c_nationkey, c_mktsegment, balance_band,
           CAST(COUNT(*) AS BIGINT) AS k,
           COUNT(*) < 5 AS reidentification_risk
    FROM q
    GROUP BY c_nationkey, c_mktsegment, balance_band
    """,
    doc="k-anonymity audit — the privacy gate a training-data release "
    "runs before shipping user-derived records: group by the "
    "quasi-identifier tuple (nation, market segment, coarse balance "
    "band) and measure every equivalence class's size k; classes with "
    "k < 5 are re-identification risks that must be suppressed or "
    "generalized. One hash aggregate on the QI tuple — at 100 TB this "
    "is a single shuffle, and the suppression pass reuses the same "
    "grouping (semi-join the risk classes back). Generalization ladders "
    "(widen the band, drop a QI) just re-run the audit with a coarser "
    "tuple.",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias(
                "balance_band"
            ),
        )
        .groupBy("c_nationkey", "c_mktsegment", "balance_band")
        .agg(F.count(F.lit(1)).alias("k"))
        .select(
            "*", (F.col("k") < 5).alias("reidentification_risk")
        )
    )


# ---------------------------------------------------------------------------
# Web-corpus prep: URL parsing battery (Spark parse_url vs known shape)
# ---------------------------------------------------------------------------
@register(
    "url_parse_battery",
    oracle="""
    SELECT doc_id,
           'www.' || source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           'lang=' || lang || '&ref=' || CAST(doc_id % 7 AS VARCHAR) AS query,
           lang AS lang_param,
           source AS registrable_org
    FROM documents
    """,
    doc="URL decomposition battery for web-corpus pipelines (source "
    "filtering, per-domain dedup keys, UTM stripping): documents get a "
    "synthetic but fully-formed URL, and Spark's native parse_url "
    "extracts HOST / PATH / QUERY / a single query parameter, plus the "
    "registrable organization from the host split. The oracle "
    "reconstructs each component from the known format, so a hash match "
    "proves parse_url's decomposition exactly. Row-local, codegen'd, "
    "shuffle-free — and the per-domain keys it emits are what the "
    "dedup/bucketing stages group on at 100 TB.",
)
def url_parse_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&ref="),
        (F.col("doc_id") % 7).cast("string"),
    )
    with_url = d.select("doc_id", url.alias("url"))
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return with_url.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
        F.split_part(host, F.lit("."), F.lit(2)).alias("registrable_org"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------
@register(
    "weighted_sample_topk",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id,
             1 + doc_id % 5 AS weight,
             ln((CAST({sql_hex15_to_long(
                 "md5('ws:' || CAST(doc_id AS VARCHAR))")} AS DOUBLE)
                 + 0.5) / 1152921504606846976.0)
             / (1 + doc_id % 5) AS es_key
      FROM documents
    )
    SELECT source, doc_id, CAST(weight AS BIGINT) AS weight,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY source ORDER BY es_key DESC, doc_id) AS rn
      FROM keyed)
    WHERE rn <= 5
    """,
    doc="Weighted sampling WITHOUT replacement (Efraimidis–Spirakis "
    "A-ES): each record draws u~Uniform(0,1] from a deterministic "
    "60-bit hash (so distinct records never share u, and no two u's sit "
    "in an exact power relation that could make ln(u)/w "
    "mathematically-equal-but-differently-computed across engines) and "
    "keeps key = ln(u)/w; the top-k keys per stratum ARE a weighted "
    "sample without replacement. One pass + a per-group top-k "
    "(TakeOrdered shape) — the distributed replacement for sequential "
    "reservoir sampling, and the standard way a 100 TB corpus draws "
    "quality-weighted training subsets per source. The sampled ids are "
    "compared exactly; the transcendental key is ordering-only (never "
    "emitted), keeping the oracle hash-stable.",
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    weight = 1 + F.col("doc_id") % 5
    digest = F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")))
    # 60-bit uniform → double (rounded identically on both engines)
    h60 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("double")
    es_key = F.log((h60 + 0.5) / float(1 << 60)) / weight
    keyed = d.select(
        "source",
        "doc_id",
        weight.cast("long").alias("weight"),
        es_key.alias("es_key"),
    )
    w = Window.partitionBy("source").orderBy(F.col("es_key").desc(), "doc_id")
    return (
        keyed.select(
            "source", "doc_id", "weight",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


# ---------------------------------------------------------------------------
# Bigram-LM fluency score (CCNet-style quality signal, rational form)
# ---------------------------------------------------------------------------
@register(
    "lm_bigram_quality",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {SQL_TOKENS.format(c='text')} AS toks FROM documents
    ),
    bg AS (
      SELECT doc_id, unnest({sql_word_ngrams('toks', 2)}) AS bigram FROM tok
    ),
    c12 AS (SELECT bigram, COUNT(*) AS n12 FROM bg GROUP BY bigram),
    c1 AS (
      SELECT split_part(bigram, ' ', 1) AS w1, COUNT(*) AS n1
      FROM bg GROUP BY 1
    ),
    scored AS (
      SELECT b.doc_id,
             CAST(c12.n12 AS DOUBLE) / c1.n1 AS cond_p
      FROM bg b
      JOIN c12 ON b.bigram = c12.bigram
      JOIN c1 ON split_part(b.bigram, ' ', 1) = c1.w1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           list_reduce(list_sort(list(cond_p)), (a, b) -> a + b) / COUNT(*)
             AS mean_cond_prob
    FROM scored
    GROUP BY doc_id
    """,
    doc="Corpus-LM fluency score (the CCNet/Wikipedia-LM quality signal "
    "reduced to its distributable core): a bigram model is 'trained' as "
    "corpus counts — c(w1,w2) and c(w1·) — and each document scores the "
    "mean conditional probability c(w1,w2)/c(w1·) of its own bigrams. "
    "Fluent in-distribution text scores high; boilerplate/garbage "
    "scores low — rank-threshold downstream for filtering. "
    "Determinism: every ratio is ONE exact-integer IEEE division, and "
    "the per-doc mean folds the SORTED ratio list (identical addition "
    "order on both engines ⇒ bit-exact, the chisq/BM25 pattern — no "
    "transcendental perplexity needed for a monotone quality rank). "
    "Cost shape at 100 TB: two count aggregates over exploded bigrams, "
    "then an inverted join of doc-bigrams to the count tables — the "
    "same bounded posting-join shape as the Jaccard dedup; the count "
    "tables are Zipf-small relative to the corpus and broadcastable "
    "after a frequency floor.",
)
def lm_bigram_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bg = d.select(
        "doc_id",
        F.explode(word_ngrams(tokens("text"), 2)).alias("bigram"),
    )
    c12 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n12"))
    c1 = (
        bg.select(F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("n1"))
    )
    scored = (
        bg.join(c12, "bigram")
        .join(
            c1,
            F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)) == F.col("w1"),
        )
        .select(
            "doc_id", (F.col("n12").cast("double") / F.col("n1")).alias("cond_p")
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.aggregate(
                F.array_sort(F.collect_list("cond_p")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1))
        ).alias("mean_cond_prob"),
    )


# ---------------------------------------------------------------------------
# Unicode script profile (corpus-prep language/garbage triage)
# ---------------------------------------------------------------------------
@register(
    "text_script_profile",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
               AS n_alpha,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
               AS n_digit,
             CAST(length(regexp_replace(text, '[^ \\t\\n]', '', 'g')) AS BIGINT)
               AS n_space
      FROM documents
    )
    SELECT doc_id, n_chars, n_alpha, n_digit, n_space,
           CAST(n_chars - n_alpha - n_digit - n_space AS BIGINT) AS n_other,
           CAST(n_alpha AS DOUBLE) / n_chars AS alpha_ratio,
           (CAST(n_alpha AS DOUBLE) / n_chars >= 0.6) AS looks_textual
    FROM m
    """,
    doc="Unicode script profile — the first-pass triage a web corpus "
    "runs before language ID: per-document counts of alphabetic, "
    "digit, whitespace and other characters (counted by deleting the "
    "complement class — one regexp_replace per class, identical "
    "semantics on both regex engines), with the C4-style "
    "alphabetic-ratio gate. Entirely row-local and codegen'd: zero "
    "shuffles, embarrassingly parallel at 100 TB, and the cheap "
    "upstream filter that keeps the expensive quality/dedup stages "
    "from ever seeing binary spew.",
)
def text_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("bigint")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("bigint")
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("bigint")
    n_space = F.length(F.regexp_replace("text", "[^ \\t\\n]", "")).cast("bigint")
    alpha_ratio = n_alpha.cast("double") / n_chars
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_alpha.alias("n_alpha"),
        n_digit.alias("n_digit"),
        n_space.alias("n_space"),
        (n_chars - n_alpha - n_digit - n_space).cast("bigint").alias("n_other"),
        alpha_ratio.alias("alpha_ratio"),
        (alpha_ratio >= 0.6).alias("looks_textual"),
    )


# ---------------------------------------------------------------------------
# C4 boilerplate filter (stop-phrases + code heuristic)
# ---------------------------------------------------------------------------
def c4_feature_cols(text_col) -> dict:
    """Row-local C4-boilerplate features as named Columns — shared by
    :func:`c4_boilerplate_filter` and the quality-ensemble fusion
    (queries_quality.py)."""
    low = F.lower(text_col)
    has_lorem = low.contains("lorem ipsum")
    has_web = (
        low.contains("javascript")
        | low.contains("cookie policy")
        | low.contains("terms of use")
    )
    n_braces = F.length(F.regexp_replace(text_col, "[^{}]", "")).cast("bigint")
    brace_ratio = n_braces.cast("double") / F.length(text_col)
    return {
        "has_lorem": has_lorem,
        "has_web_boilerplate": has_web,
        "n_braces": n_braces,
        "brace_ratio": brace_ratio,
        "keep": ~has_lorem & ~has_web & (brace_ratio < 0.01),
    }


@register(
    "c4_boilerplate_filter",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             (lower(text) LIKE '%lorem ipsum%') AS has_lorem,
             (lower(text) LIKE '%javascript%'
              OR lower(text) LIKE '%cookie policy%'
              OR lower(text) LIKE '%terms of use%') AS has_web_boilerplate,
             CAST(length(regexp_replace(text, '[^{}]', '', 'g')) AS BIGINT)
               AS n_braces,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT doc_id, has_lorem, has_web_boilerplate, n_braces,
           CAST(n_braces AS DOUBLE) / n_chars AS brace_ratio,
           (NOT has_lorem AND NOT has_web_boilerplate
            AND CAST(n_braces AS DOUBLE) / n_chars < 0.01) AS keep
    FROM m
    """,
    doc="C4's documented boilerplate rules (Raffel et al. 2020, §2.2) "
    "as one row-local pass: drop documents containing 'lorem ipsum', "
    "the web-policy stop phrases ('javascript'/'cookie policy'/'terms "
    "of use'), or a curly-brace density that marks leaked source code. "
    "All predicates are substring/character-class tests — identical "
    "across engines, shuffle-free, and cheap enough to run before "
    "every other corpus stage at 100 TB. Emits per-rule booleans "
    "rather than just the verdict so filter attrition is auditable "
    "per rule (the no-silent-caps principle).",
)
def c4_boilerplate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    c = c4_feature_cols(F.col("text"))
    return d.select("doc_id", *[v.alias(k) for k, v in c.items()])
