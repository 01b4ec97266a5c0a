"""Round-8 batch: pricing audits and composition capstones on top of
the round-7 families.

- **Span-cap loss audit** (`dedup_span_cap_audit`): the maximal-span
  dedup family (queries_round7.py) drops any 8-gram with more than
  ``_SPAN_OCC_CAP`` = 16 corpus occurrences from pairing — the skew
  guard that bounds the dotplot at N·cap points. But text repeated
  hundreds of times (license headers, nav boilerplate) is exactly the
  most-duplicated content in a web crawl, and it silently escapes all
  three span rungs. This audit prices that loss the way
  ``dedup_paragraph_bloom_audit`` prices Bloom false drops and
  ``dedup_semantic_cap_audit`` prices the SemDeDup cluster cap: run the
  SAME kernel at the production cap and at a higher-cap yardstick, and
  report the span tokens only the yardstick sees, in ppm. Because the
  synthetic corpus has no organic gram above 4 occurrences (measured at
  sf0.01/sf0.1), the audit PLANTS a 24-copy boilerplate block — 24 > 16
  so the production rung is blind to it by construction, and the
  planted row's missed_span_tokens > 0 is the positive control proving
  the audit detects cap loss (a zero there means the audit itself is
  broken, the failing-gate role no_missed_duplicates plays for Bloom).

Reference parity note: the reference (Weather_API.py) has no substring
dedup at all — charter-extension breadth on the `documents` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.functions.textops import (
    SQL_TOKENS,
    tokens,
)
from weather_analysis_bigdata__spark.queries_round7 import (
    _SPAN_MIN_TOKENS,
    _SPAN_N,
    _SPAN_OCC_CAP,
    _SQL_GRAM_CAT,
    _span_iv_union,
    _span_pairs_from,
    _span_postings,
)
from weather_analysis_bigdata__spark.registry import register
from weather_analysis_bigdata__spark.sources.files import (
    load_table,
    spread_small_scan,
)

# ---------------------------------------------------------------------------
# Span-cap loss audit
# ---------------------------------------------------------------------------
#: Audit yardstick cap. NOT production config: a gram kept here pairs
#: up to cap_hi² dots, so the yardstick runs at test SFs only (the
#: dedup_semantic_clustered role). Chosen above the planted copy count
#: (24) and well above the organic maximum (4 at sf0.1) so the
#: yardstick itself is exhaustive on this corpus — the residual it
#: CANNOT see is reported as overcap_occurrences, which must be 0 here.
_CAP_AUDIT_HI = 64
#: Planted boilerplate: 24 copies (> the production cap of 16, ≤ the
#: yardstick) of a 32-token block (≥ _SPAN_MIN_TOKENS = 20), each
#: wrapped in per-copy unique pre/suf tokens so detection is genuinely
#: span-granular (the wrapper grams are singletons, excluded by the
#: occ ≥ 2 rule on both sides).
_PLANT_COPIES = 24
_PLANT_BOILER_TOKENS = 32
_PLANT_BOILER = " ".join(f"capaudit{j:02d}" for j in range(_PLANT_BOILER_TOKENS))


def _cap_audit_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ the planted boilerplate block (negative doc_ids)."""
    organic = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    # Built from range(), not createDataFrame: an Arrow LocalRelation
    # reports unknown sizeInBytes, which poisons the union's stats and
    # flips every downstream gram join from broadcast to sort-merge.
    idx = F.lpad(F.col("id").cast("string"), 2, "0")
    planted = spark.range(_PLANT_COPIES).select(
        (F.lit(-1000001) - F.col("id")).cast("long").alias("doc_id"),
        F.concat(
            F.lit("plantpre"),
            idx,
            F.lit(f" {_PLANT_BOILER} plantsuf"),
            idx,
        ).alias("text"),
    )
    return organic.unionByName(planted)


_SQL_PLANTED = f"""planted AS (
      SELECT CAST(-1000001 - i AS BIGINT) AS doc_id,
             'plantpre' || lpad(CAST(i AS VARCHAR), 2, '0') || ' ' ||
             '{_PLANT_BOILER}' ||
             ' plantsuf' || lpad(CAST(i AS VARCHAR), 2, '0') AS text
      FROM unnest(generate_series(0, {_PLANT_COPIES - 1})) AS g(i)
    ),
    alldocs AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id, text FROM planted
    ),
    t AS (
      SELECT doc_id, {SQL_TOKENS.format(c='text')} AS toks FROM alldocs
    ),
    p AS (
      SELECT doc_id, i AS pos, {_SQL_GRAM_CAT} AS gram
      FROM t, unnest(generate_series(1, len(toks) - {_SPAN_N - 1})) AS u(i)
    ),
    occ AS (SELECT gram, COUNT(*) AS c FROM p GROUP BY gram)"""


def _sql_cap_level(cap: int, sfx: str) -> str:
    """One span-kernel CTE chain (postings→pairs→spans→per-doc interval
    union) at occurrence cap ``cap``, CTE names suffixed — the exact
    algebra of queries_round7's _SQL_SPAN_BASE + _SQL_SPAN_IV_CTES."""
    return f"""pc{sfx} AS (
      SELECT p.* FROM p JOIN occ USING (gram)
      WHERE occ.c BETWEEN 2 AND {cap}
    ),
    pairs{sfx} AS (
      SELECT a.doc_id AS da, a.pos AS pa, b.doc_id AS db,
             b.pos - a.pos AS diag
      FROM pc{sfx} a JOIN pc{sfx} b USING (gram) WHERE a.doc_id < b.doc_id
    ),
    isl{sfx} AS (
      SELECT da, db, diag, pa,
             pa - row_number() OVER (
               PARTITION BY da, db, diag ORDER BY pa) AS isl
      FROM pairs{sfx}
    ),
    spans{sfx} AS (
      SELECT da, db, diag, MIN(pa) AS a_start,
             CAST(MAX(pa) - MIN(pa) + {_SPAN_N} AS BIGINT) AS span_tokens
      FROM isl{sfx} GROUP BY da, db, diag, isl
      HAVING MAX(pa) - MIN(pa) + {_SPAN_N} >= {_SPAN_MIN_TOKENS}
    ),
    iv{sfx} AS (
      SELECT DISTINCT doc_id, s, e FROM (
        SELECT da AS doc_id, a_start AS s,
               a_start + span_tokens - 1 AS e FROM spans{sfx}
        UNION ALL
        SELECT db AS doc_id, a_start + diag AS s,
               a_start + diag + span_tokens - 1 AS e FROM spans{sfx}
      )
    ),
    flagged{sfx} AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) THEN 1 ELSE 0 END AS opens
      FROM iv{sfx}
    ),
    grouped{sfx} AS (
      SELECT doc_id, s, e,
             SUM(opens) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM flagged{sfx}
    ),
    merged{sfx} AS (
      SELECT doc_id, grp, MIN(s) AS ms, MAX(e) AS me
      FROM grouped{sfx} GROUP BY doc_id, grp
    ),
    per_doc{sfx} AS (
      SELECT doc_id, CAST(SUM(me - ms + 1) AS BIGINT) AS dup_tokens
      FROM merged{sfx} GROUP BY doc_id
    )"""


@register(
    "dedup_span_cap_audit",
    oracle=f"""
    WITH {_SQL_PLANTED},
    {_sql_cap_level(_SPAN_OCC_CAP, '16')},
    {_sql_cap_level(_CAP_AUDIT_HI, 'hi')},
    spine AS (
      SELECT doc_id, doc_id < 0 AS is_planted,
             CAST(len(toks) AS BIGINT) AS total_tokens
      FROM t
    ),
    perdoc AS (
      SELECT s.is_planted, s.total_tokens,
             COALESCE(c.dup_tokens, 0) AS dt_cap,
             COALESCE(h.dup_tokens, 0) AS dt_hi
      FROM spine s
      LEFT JOIN per_doc16 c USING (doc_id)
      LEFT JOIN per_dochi h USING (doc_id)
    ),
    oc AS (
      SELECT p.doc_id < 0 AS is_planted,
             CAST(COUNT(*) AS BIGINT) AS overcap_occurrences
      FROM p JOIN occ USING (gram)
      WHERE occ.c > {_CAP_AUDIT_HI}
      GROUP BY p.doc_id < 0
    ),
    agg AS (
      SELECT is_planted,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(total_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(dt_cap) AS BIGINT) AS dup_tokens_capped,
             CAST(SUM(dt_hi) AS BIGINT) AS dup_tokens_yardstick,
             CAST(SUM(dt_hi - dt_cap) AS BIGINT) AS missed_span_tokens,
             CAST(COUNT(*) FILTER (dt_hi > dt_cap) AS BIGINT)
               AS n_docs_missed
      FROM perdoc GROUP BY is_planted
    )
    SELECT a.is_planted, a.n_docs, a.total_tokens, a.dup_tokens_capped,
           a.dup_tokens_yardstick, a.missed_span_tokens, a.n_docs_missed,
           CAST((1000000 * a.missed_span_tokens)
                // NULLIF(a.total_tokens, 0) AS BIGINT) AS missed_ppm,
           CAST(COALESCE(o.overcap_occurrences, 0) AS BIGINT)
             AS overcap_occurrences
    FROM agg a LEFT JOIN oc o ON a.is_planted = o.is_planted
    """,
    doc="SPAN-CAP loss audit — prices what the maximal-span family's "
    f"{_SPAN_OCC_CAP}-occurrence gram cap misses, exactly as "
    "dedup_paragraph_bloom_audit prices Bloom false drops and "
    "dedup_semantic_cap_audit prices the SemDeDup cluster cap: the "
    "SAME dotplot kernel (_span_pairs_from, cap parameterized) runs at "
    f"the production cap and at a {_CAP_AUDIT_HI}-cap yardstick over "
    "documents ∪ a planted 24-copy 32-token boilerplate block, and the "
    "per-doc interval-union token counts diff into missed_span_tokens "
    "(+ ppm) per is_planted group. The planted row is the positive "
    "control: 24 copies > cap means the production rung is blind to it "
    "BY CONSTRUCTION, so missed_span_tokens must be 24×32 = 768 there "
    "(pytest-gated) — license-header-class boilerplate escaping the "
    "cap is exactly what a web crawl serves. overcap_occurrences "
    "reports the residual the yardstick itself cannot see (grams above "
    f"{_CAP_AUDIT_HI} occurrences; 0 on this corpus) — the "
    "scale-honesty line a 100 TB run reads before trusting the ppm. "
    "Cost: the audit runs the kernel at both caps by definition (the "
    "lsh_recall_audit pattern) and the yardstick's dotplot is "
    "N·cap_hi-bounded — an audit-tier query, not the production path.",
)
def dedup_span_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _cap_audit_corpus(spark, sf_dir)
    dt_cap = _span_iv_union(_span_pairs_from(docs, _SPAN_OCC_CAP)).select(
        "doc_id", F.col("dup_tokens").alias("dt_cap")
    )
    dt_hi = _span_iv_union(_span_pairs_from(docs, _CAP_AUDIT_HI)).select(
        "doc_id", F.col("dup_tokens").alias("dt_hi")
    )
    spine = docs.select(
        "doc_id",
        (F.col("doc_id") < 0).alias("is_planted"),
        F.size(tokens("text")).cast("long").alias("total_tokens"),
    )
    perdoc = (
        spine.join(dt_cap.hint("shuffle_hash"), "doc_id", "left")
        .join(dt_hi.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "is_planted",
            "total_tokens",
            F.coalesce("dt_cap", F.lit(0)).alias("dt_cap"),
            F.coalesce("dt_hi", F.lit(0)).alias("dt_hi"),
        )
    )
    p = _span_postings(docs)
    hot = p.groupBy("gh").agg(F.count(F.lit(1)).alias("c")).filter(
        F.col("c") > _CAP_AUDIT_HI
    )
    oc = (
        p.join(hot.select("gh"), "gh")
        .groupBy((F.col("doc_id") < 0).alias("is_planted"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("overcap_occurrences")
        )
    )
    agg = perdoc.groupBy("is_planted").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("total_tokens").cast("long").alias("total_tokens"),
        F.sum("dt_cap").cast("long").alias("dup_tokens_capped"),
        F.sum("dt_hi").cast("long").alias("dup_tokens_yardstick"),
        F.sum(F.col("dt_hi") - F.col("dt_cap"))
        .cast("long")
        .alias("missed_span_tokens"),
        F.sum(F.when(F.col("dt_hi") > F.col("dt_cap"), 1).otherwise(0))
        .cast("long")
        .alias("n_docs_missed"),
    )
    return agg.join(oc.hint("shuffle_hash"), "is_planted", "left").select(
        "is_planted",
        "n_docs",
        "total_tokens",
        "dup_tokens_capped",
        "dup_tokens_yardstick",
        "missed_span_tokens",
        "n_docs_missed",
        F.expr(
            "(1000000 * missed_span_tokens) div nullif(total_tokens, 0)"
        ).alias("missed_ppm"),
        F.coalesce("overcap_occurrences", F.lit(0))
        .cast("long")
        .alias("overcap_occurrences"),
    )
