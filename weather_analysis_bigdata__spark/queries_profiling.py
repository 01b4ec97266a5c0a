"""Dataset-profiling and mergeable-aggregation operators.

The shapes a 100 TB lakehouse runs continuously *around* its queries:

- **HLL sketch build/merge** — the mergeable distinct-count primitive
  (build per partition/day, union across shards; re-aggregation without
  re-scanning raw data). Spark's DataSketches HLL via ``hll_sketch_agg``
  / ``hll_union_agg`` (Spark 3.5+).
- **Algebraic partial re-aggregation** — daily partial aggregates merged
  to monthly without touching raw rows: the pre-aggregate / rollup-cube
  maintenance pattern (sum-of-sums, min-of-mins, count-of-counts).
- **Robust statistics** — winsorized means and MAD computed from exact
  order statistics with fully tie-broken ranks (no engine-specific
  quantile conventions in the comparison path).
- **Lexical diversity** — per-document type/token and Gini-impurity
  scores in exact integer arithmetic, shuffle-free.
- **Column profiling** — per-column null/distinct/min/max in ONE scan,
  emitted long-format (the stats-collection pass table formats run at
  write time).
- **Spark 4 collation** — case-insensitive grouping via ``UTF8_LCASE``
  collation instead of lower() normalization.
- **unionByName schema evolution** — mixed-generation scans where newer
  files carry extra columns.

Reference parity note: the reference notebook profiles by eyeball
(printSchema/show/count, Weather_API.py:198-210) and re-aggregates by
re-running the full lineage (SURVEY.md §3.2); these operators are the
scalable replacements, charter-extension breadth per SURVEY.md §7.2 M4.

Determinism: every oracle-checked value is exact (integer / decimal /
order-statistic) or a single final IEEE division; the HLL *estimate* is
engine-specific by design, so the query emits an error-bound boolean the
oracle pins to TRUE instead of the raw estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.functions.deterministic import (
    dec,
    dsum,
    sql_dec,
    sql_dsum,
)
from weather_analysis_bigdata__spark.functions.textops import SQL_TOKENS, tokens
from weather_analysis_bigdata__spark.registry import register
from weather_analysis_bigdata__spark.sources.files import load_table


# ---------------------------------------------------------------------------
# HLL sketches: build per shard, merge, estimate
# ---------------------------------------------------------------------------
@register(
    "hll_sketch_partition_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(DISTINCT user_id % 8) AS BIGINT) AS n_shards,
           TRUE AS est_within_5pct
    FROM events
    GROUP BY event_type
    """,
    doc="Mergeable distinct-count sketches: one DataSketches HLL per "
    "(event_type, shard) via hll_sketch_agg, shards merged with "
    "hll_union_agg, estimate read with hll_sketch_estimate — the exact "
    "pattern that lets 100 TB pipelines maintain per-day sketches and "
    "answer any-date-range COUNT DISTINCT by merging kilobyte state "
    "instead of re-scanning raw data. Sketch bytes are engine-specific, "
    "so the oracle pins the |estimate-exact|/exact ≤ 5% bound (lgK=12 "
    "keeps relative error ≈1.6%), plus the exact count computed "
    "alongside.",
)
def hll_sketch_partition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Shard = what a file/partition boundary would be at scale.
    shards = ev.groupBy(
        "event_type", (F.col("user_id") % 8).alias("shard")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sketch"))
    merged = shards.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users"),
        F.count(F.lit(1)).alias("n_shards"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        "n_shards",
        (
            F.abs(F.col("est_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("est_within_5pct"),
    )


# ---------------------------------------------------------------------------
# Algebraic partial re-aggregation (pre-aggregate maintenance)
# ---------------------------------------------------------------------------
@register(
    "partial_reagg_monthly",
    oracle=f"""
    SELECT event_type,
           date_trunc('month', ts) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS total_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           ({sql_dsum('value')} / COUNT(*)) AS avg_value
    FROM events
    GROUP BY event_type, date_trunc('month', ts)
    """,
    doc="Pre-aggregate maintenance: daily partials (count, exact-decimal "
    "sum, min, max) merged to monthly via the algebraic merge "
    "(sum-of-counts, sum-of-sums, min-of-mins, max-of-maxes; avg derived "
    "at the end from merged sum/count — never averaged-of-averages). "
    "The oracle aggregates the raw rows directly, proving merge ≡ "
    "direct. At 100 TB the daily table is ~10⁶× smaller than the fact "
    "table, so monthly/yearly rollups and backfills read partials only. "
    "Two map-side-combinable hash aggregates, keys nested so AQE can "
    "coalesce the second (tiny) shuffle.",
)
def partial_reagg_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("value")).alias("dsum"),  # stays decimal until merged
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    return daily.groupBy(
        "event_type", F.date_trunc("month", "day").alias("month")
    ).agg(
        F.sum("cnt").alias("n_events"),
        F.sum("dsum").cast("double").alias("total_value"),
        F.min("vmin").alias("min_value"),
        F.max("vmax").alias("max_value"),
        (F.sum("dsum").cast("double") / F.sum("cnt")).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# Robust statistics from exact, tie-broken order statistics
# ---------------------------------------------------------------------------
_CENTS = f"CAST({sql_dec('l_extendedprice')} * 100 AS BIGINT)"


@register(
    "winsorized_robust_stats",
    oracle=f"""
    WITH ranked AS (
      SELECT l_returnflag AS flag, {_CENTS} AS v,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
      FROM lineitem
    ),
    bounds AS (
      SELECT flag,
             MAX(CASE WHEN rn = GREATEST(CAST(ceil(0.01 * cnt) AS BIGINT), 1)
                      THEN v END) AS lo,
             MAX(CASE WHEN rn = CAST(ceil(0.99 * cnt) AS BIGINT) THEN v END) AS hi,
             MAX(CASE WHEN rn = (cnt + 1) // 2 THEN v END)
               + MAX(CASE WHEN rn = (cnt + 2) // 2 THEN v END) AS med2,
             MAX(cnt) AS cnt
      FROM ranked GROUP BY flag
    ),
    devs AS (
      SELECT r.flag, r.v, b.lo, b.hi, b.cnt,
             abs(2 * r.v - b.med2) AS dev2,
             row_number() OVER (PARTITION BY r.flag
                                ORDER BY abs(2 * r.v - b.med2), r.rn) AS drn
      FROM ranked r JOIN bounds b USING (flag)
    )
    SELECT flag AS l_returnflag,
           CAST(MAX(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(lo) AS DOUBLE) / 100 AS p01,
           CAST(MAX(hi) AS DOUBLE) / 100 AS p99,
           CAST(SUM(LEAST(GREATEST(v, lo), hi)) AS DOUBLE) / (100 * MAX(cnt))
             AS winsorized_mean,
           CAST(MAX(CASE WHEN drn = (cnt + 1) // 2 THEN dev2 END)
                + MAX(CASE WHEN drn = (cnt + 2) // 2 THEN dev2 END) AS DOUBLE)
             / 400 AS mad
    FROM devs
    GROUP BY flag
    """,
    doc="Winsorized mean + MAD (median absolute deviation) per group — "
    "the outlier-robust scaling pass ML feature pipelines run before "
    "training. Every order statistic is an explicit, fully tie-broken "
    "rank (row_number over value+unique key), so no engine-specific "
    "percentile convention enters the comparison; all intermediate "
    "arithmetic is integer CENTS (2×median and 2×|deviation| stay "
    "integral through the even-count midpoint), with ONE final IEEE "
    "double division per output — bit-identical across engines. Cost: "
    "two rank windows + one broadcast of 3 group rows. At 100 TB swap "
    "the exact ranks for approx_percentile, keep the clamp/deviation "
    "algebra.",
)
def winsorized_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("flag").orderBy("v", "l_orderkey", "l_linenumber")
    wc = Window.partitionBy("flag")
    ranked = li.select(
        F.col("l_returnflag").alias("flag"),
        (dec("l_extendedprice") * 100).cast("long").alias("v"),
        "l_orderkey",
        "l_linenumber",
    ).select(
        "flag",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    at = lambda rank_expr, col: F.max(  # noqa: E731 — value at an exact rank
        F.when(F.col("rn") == rank_expr, F.col(col))
    )
    lo_mid = F.floor((F.col("cnt") + 1) / 2)
    hi_mid = F.floor((F.col("cnt") + 2) / 2)
    bounds = ranked.groupBy("flag").agg(
        at(F.greatest(F.ceil(0.01 * F.col("cnt")), F.lit(1)), "v").alias("lo"),
        at(F.ceil(0.99 * F.col("cnt")), "v").alias("hi"),
        (at(lo_mid, "v") + at(hi_mid, "v")).alias("med2"),
        F.max("cnt").alias("cnt"),
    )
    dev2 = F.abs(2 * F.col("v") - F.col("med2"))
    wd = Window.partitionBy("flag").orderBy(dev2, "rn")
    devs = ranked.join(F.broadcast(bounds.drop("cnt")), "flag").select(
        "flag",
        "v",
        "lo",
        "hi",
        "cnt",
        dev2.alias("dev2"),
        F.row_number().over(wd).alias("drn"),
    )
    dat = lambda rank_expr: F.max(  # noqa: E731
        F.when(F.col("drn") == rank_expr, F.col("dev2"))
    )
    return devs.groupBy("flag").agg(
        F.max("cnt").alias("n_rows"),
        (F.max("lo").cast("double") / 100).alias("p01"),
        (F.max("hi").cast("double") / 100).alias("p99"),
        (
            F.sum(F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi")))
            .cast("double")
            / (100 * F.max("cnt"))
        ).alias("winsorized_mean"),
        ((dat(lo_mid) + dat(hi_mid)).cast("double") / 400).alias("mad"),
    ).withColumnRenamed("flag", "l_returnflag")


# ---------------------------------------------------------------------------
# Lexical diversity: type-token ratio + Gini impurity, shuffle-free
# ---------------------------------------------------------------------------
@register(
    "token_gini_diversity",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS.format(c='text')} AS toks FROM documents
    ),
    cnt AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
      GROUP BY doc_id, tok
    ),
    s AS (
      SELECT doc_id, COUNT(*) AS n_types, SUM(c * c) AS sumsq
      FROM cnt GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(s.n_types AS BIGINT) AS n_types,
           CAST(len(t.toks) * len(t.toks) - s.sumsq AS DOUBLE)
             / (len(t.toks) * len(t.toks)) AS gini
    FROM t JOIN s USING (doc_id)
    """,
    doc="Per-document lexical diversity: type count and Gini impurity "
    "1 − Σ(cᵢ/N)² of the token distribution — an entropy-family quality "
    "score with NO transcendental functions, so the value is an exact "
    "integer ratio (N²−Σc²)/N² and bit-identical across engines (the "
    "log-based Shannon form would not be). Spark side is entirely "
    "row-local: Σc² comes from ONE aggregate pass over the sorted token "
    "array (sum of squared run lengths ≡ sum of squared multiplicities) "
    "— no explode, no shuffle; the oracle's unnest+GROUP BY form "
    "verifies it. Repetitive/templated documents score low → dedup-"
    "adjacent corpus hygiene signal.",
)
def token_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sorted_t = F.array_sort(tokens("text"))
    # One fold: carry (prev token, current run length, Σ(run²) so far);
    # finish adds the last open run.
    sumsq = F.aggregate(
        sorted_t,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("acc"),
        ),
        lambda s, t: F.struct(
            t.alias("prev"),
            F.when(t == s.prev, s.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(t == s.prev, s.acc)
            .otherwise(s.acc + s.run * s.run)
            .alias("acc"),
        ),
        lambda s: s.acc + s.run * s.run,
    )
    n = F.size(sorted_t).cast("long")
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(sorted_t)).cast("long").alias("n_types"),
        ((n * n - sumsq).cast("double") / (n * n)).alias("gini"),
    )


# ---------------------------------------------------------------------------
# One-scan column profiling, long-format output
# ---------------------------------------------------------------------------
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_returnflag")


@register(
    "table_profile_stats",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST({sql_dec(f'MIN({c})', 3) if c != 'l_returnflag' else f'MIN({c})'} AS VARCHAR) AS min_value,
           CAST({sql_dec(f'MAX({c})', 3) if c != 'l_returnflag' else f'MAX({c})'} AS VARCHAR) AS max_value
    FROM lineitem
    """
        for c in _PROFILE_COLS
    ),
    doc="Per-column profile (null count, exact distinct count, min/max) "
    "for four lineitem columns in ONE scan — the stats-collection pass "
    "that feeds query optimizers and data-quality monitors; at 100 TB "
    "this runs at write time per file/partition and merges like the "
    "partial_reagg pattern. Spark computes all per-column aggregates in "
    "a single wide Aggregate (one pass, map-side combinable except the "
    "exact distincts, which Catalyst EXPANDs — the documented exact "
    "mode; swap to HLL sketches for the approximate mode), then "
    "explodes a 4-struct array to long format. Numeric min/max are "
    "stringified via decimal(18,3) so both engines print identical "
    "fixed-scale text; the string flag's min/max runs on its ASCII "
    "codepoint (string agg buffers force SortAggregate — PERF.md); the "
    "oracle is 4 UNION ALL scans proving the single-pass form.",
)
def table_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        if c == "l_returnflag":
            # MIN/MAX over a string buffer falls off the HashAggregate
            # fast path (SortAggregate — the PERF.md string-agg cliff).
            # The flag is one character, so min/max its codepoint and
            # decode after the aggregate: integer buffers stay hashed.
            mn = F.char(F.min(F.ascii(c)))
            mx = F.char(F.max(F.ascii(c)))
        else:
            mn, mx = dec(F.min(c), 3), dec(F.max(c), 3)
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            mn.cast("string").alias(f"{c}__min"),
            mx.cast("string").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(f"{c}__nulls").alias("n_nulls"),
                        F.col(f"{c}__distinct").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_value"),
                        F.col(f"{c}__max").alias("max_value"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


# ---------------------------------------------------------------------------
# Spark 4 collation: case-insensitive grouping without lower()
# ---------------------------------------------------------------------------
@register(
    "collation_ci_group",
    oracle="""
    WITH k AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN upper(source)
                  WHEN doc_id % 3 = 1 THEN source
                  ELSE concat(upper(substr(source, 1, 1)), substr(source, 2))
             END AS key,
             n_chars
      FROM documents
    )
    SELECT lower(key) AS source_ci,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM k GROUP BY lower(key)
    """,
    doc="Case-insensitive grouping via Spark 4 UTF8_LCASE collation: the "
    "synthetic mixed-case key (UPPER / as-is / Capitalized by doc_id "
    "mod 3) groups as one under collate(key, 'UTF8_LCASE') with NO "
    "normalization expression on the grouping path — the collation-aware "
    "hash/compare does it, which at 100 TB also lets collated parquet "
    "stats and join keys skip the derived-column materialization. "
    "Output canonicalizes with lower(key) carried as a SECOND grouping "
    "key (functionally dependent on the collated key, so groups are "
    "unchanged — and no string MIN aggregate is needed, which would "
    "fall to SortAggregate); oracle = classic GROUP BY lower().",
)
def collation_ci_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    key = (
        F.when(F.col("doc_id") % 3 == 0, F.upper("source"))
        .when(F.col("doc_id") % 3 == 1, F.col("source"))
        .otherwise(
            F.concat(
                F.upper(F.substring("source", 1, 1)),
                F.expr("substr(source, 2)"),
            )
        )
    )
    return (
        d.select(key.alias("key"), "n_chars")
        .groupBy(
            F.collate("key", "UTF8_LCASE").alias("key_ci"),
            F.lower("key").alias("source_ci"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select("source_ci", "n_docs", "total_chars")
    )


# ---------------------------------------------------------------------------
# unionByName schema evolution (mixed-generation scans)
# ---------------------------------------------------------------------------
@register(
    "union_by_name_evolution",
    oracle=f"""
    WITH unioned AS (
      SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority,
             'gen1' AS gen
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderpriority, 'gen2' AS gen
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT gen,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT) AS null_priority,
           {sql_dsum('o_totalprice')} AS total_price
    FROM unioned GROUP BY gen
    """,
    doc="Schema evolution across file generations: an old projection "
    "without o_orderpriority unioned with a new one that has it, via "
    "unionByName(allowMissingColumns=True) — position-independent, "
    "missing columns null-filled (plain UNION would silently "
    "misalign). The same resolution parquet mergeSchema applies at scan "
    "time (see parquet_schema_merge); here it is the in-plan operator "
    "form. Aggregate proves both generations survive with correct "
    "null accounting and exact-decimal totals.",
)
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    gen1 = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .withColumn("gen", F.lit("gen1"))
    )
    gen2 = (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .withColumn("gen", F.lit("gen2"))
    )
    unioned = gen1.unionByName(gen2, allowMissingColumns=True)
    return unioned.groupBy("gen").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.count(F.lit(1)) - F.count("o_orderpriority")).alias("null_priority"),
        dsum("o_totalprice").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Exact distinct at scale: bucketed-bitmap merge (the HLL complement)
# ---------------------------------------------------------------------------
@register(
    "bitmap_exact_distinct_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(DISTINCT user_id % 4 * 1000000 + user_id) AS BIGINT)
             AS exact_users_check
    FROM events
    GROUP BY event_type
    """,
    doc="EXACT mergeable distinct counting via bucketed bitmaps "
    "(bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg "
    "/ bitmap_or_agg — Spark 3.5+): ids are bucketed into 32k-bit "
    "ranges, each (group, bucket, shard) builds a bitmap, shards merge "
    "with bitmap OR (commutative/idempotent — re-aggregation and "
    "at-least-once replays are safe), and the distinct count is the sum "
    "of per-bucket popcounts. This is the exact complement to "
    "hll_sketch_partition_merge: same build-per-partition/merge shape, "
    "zero error, state O(id-range/8) bytes per group. The shard key is "
    "event_id-derived (independent of user_id) so the OR-merge is "
    "genuinely exercised. Oracle pins the count twice (plain + a "
    "residue-tagged variant ≡ same value since the tag is injective).",
)
def bitmap_exact_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_shard = ev.groupBy(
        "event_type",
        F.bitmap_bucket_number("user_id").alias("bucket"),
        (F.col("event_id") % 4).alias("shard"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    merged = per_shard.groupBy("event_type", "bucket").agg(
        F.bitmap_or_agg("bm").alias("bm")
    )
    return merged.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("exact_users"),
        F.sum(F.bitmap_count("bm")).alias("exact_users_check"),
    )
