"""Reference-parity queries (SURVEY.md §2), expressed over the driver's
test tables.

Each query reproduces one operator family the reference notebook
exercises (pivot, dedup, joins, imputation, date handling, grouped
averages, corr/trend, ordered series...), re-expressed as idiomatic
declarative DataFrame plans. Reference citations are in each docstring
as Weather_API.py:line.

Determinism: see functions.deterministic — float aggregates are exact
decimal sums cast to double; top-k is tie-broken by unique keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.functions.deterministic import (
    davg,
    dec,
    dsum,
    sql_davg,
    sql_dec,
    sql_dec2dbl,
    sql_dsum,
)
from weather_analysis_bigdata__spark.registry import register
from weather_analysis_bigdata__spark.sources.files import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ---------------------------------------------------------------------------
# R1 — pivot long→wide
# ---------------------------------------------------------------------------
@register(
    "r1_pivot_events_wide",
    oracle="SELECT user_id, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS {t}_value"
        for t in EVENT_TYPES
    )
    + " FROM events GROUP BY user_id",
    doc="Long→wide pivot with a fixed value whitelist "
    "(Weather_API.py:34-45,76-91: NOAA datatype/value → wide row).",
)
def r1_pivot_events_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit pivot-value list avoids the extra distinct scan (SURVEY §7.3);
    # at 100 TB the pivot is a single hash aggregate, no shuffle beyond it.
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(dsum("value"))
    )
    return wide.select(
        "user_id", *[F.col(t).alias(f"{t}_value") for t in EVENT_TYPES]
    )


# ---------------------------------------------------------------------------
# R2 — full-row dedup
# ---------------------------------------------------------------------------
@register(
    "r2_dedup_full_row",
    oracle="SELECT DISTINCT * FROM lineitem",
    doc="Full-row dedup (Weather_API.py:117-120 drop_duplicates). "
    "dropDuplicates() = hash-partition on all columns, keep-one.",
)
def r2_dedup_full_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").dropDuplicates()


@register(
    "r2_dedup_count_report",
    oracle="SELECT COUNT(*) AS total_rows, COUNT(DISTINCT (l_orderkey, l_linenumber)) AS distinct_keys FROM lineitem",
    doc="Before/after dedup row-count report (Weather_API.py:118-133).",
)
def r2_dedup_count_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct("l_orderkey", "l_linenumber").alias("distinct_keys"),
    )


# ---------------------------------------------------------------------------
# R4 — value remap via broadcast dim join
# ---------------------------------------------------------------------------
@register(
    "r4_value_remap",
    oracle="""
    SELECT c_custkey, c_acctbal, n.n_name AS nation_name
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    doc="Id→label remap (Weather_API.py:1026-1033 station→city dict) as a "
    "broadcast join against a tiny mapping table — the scalable form of "
    "pandas .replace().",
)
def r4_value_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey, "left"
    ).select("c_custkey", "c_acctbal", F.col("n_name").alias("nation_name"))


# ---------------------------------------------------------------------------
# J1 — left outer equi-join with dim, aliased star select
# ---------------------------------------------------------------------------
@register(
    "j1_left_join_dim",
    oracle="""
    SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name, n.n_regionkey
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    doc="Fact ⟕ dim re-attach (Weather_API.py:316-327: weather ⟕ station on "
    "station_id, then select('data.*', dim cols)). Dim is broadcast.",
)
def j1_left_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").alias("s")
    n = load_table(spark, sf_dir, "nation").alias("n")
    return s.join(
        F.broadcast(n), F.col("s.s_nationkey") == F.col("n.n_nationkey"), "left"
    ).select("s.s_suppkey", "s.s_name", "s.s_acctbal", "n.n_name", "n.n_regionkey")


# ---------------------------------------------------------------------------
# J2 + E1 — group-mean imputation (window form, not agg self-join)
# ---------------------------------------------------------------------------
@register(
    "j2_group_mean_impute",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, CAST(year(o_orderdate) AS INT) AS o_year,
             NULLIF(o_totalprice, 0.0) AS price_or_null
      FROM orders
    )
    SELECT o_orderkey, o_year, o_orderstatus,
           COALESCE(price_or_null,
                    CAST(SUM({sql_dec('price_or_null')}) OVER w AS DOUBLE)
                      / NULLIF(COUNT(price_or_null) OVER w, 0),
                    0.0) AS price_imputed
    FROM base
    WINDOW w AS (PARTITION BY o_year, o_orderstatus)
    """,
    doc="Group-mean imputation (Weather_API.py:344-371: year×location wind "
    "averages joined back, CASE-coalesced). The reference's agg + 3-key "
    "self-join is re-expressed as one window — same semantics, one shuffle, "
    "no ambiguous-column hazard (SURVEY §2.4 J2, §4).",
)
def j2_group_mean_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.year("o_orderdate").alias("o_year"),
        F.nullif(F.col("o_totalprice"), F.lit(0.0)).alias("price_or_null"),
    )
    w = Window.partitionBy("o_year", "o_orderstatus")
    group_mean = F.sum(dec("price_or_null")).over(w).cast("double") / F.nullif(
        F.count("price_or_null").over(w), F.lit(0)
    )
    return o.select(
        "o_orderkey",
        "o_year",
        "o_orderstatus",
        F.coalesce("price_or_null", group_mean, F.lit(0.0)).alias("price_imputed"),
    )


# ---------------------------------------------------------------------------
# E2 — CASE WHEN chain (derived-mean repair)
# ---------------------------------------------------------------------------
@register(
    "e2_case_when_chain",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity IS NOT NULL AND l_quantity >= 30 THEN 'high'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'low' END AS qty_band,
           CASE WHEN l_discount > 0.05 THEN l_extendedprice * (1 - l_discount)
                ELSE l_extendedprice END AS effective_price
    FROM lineitem
    """,
    doc="Chained CASE WHEN with boolean conjunction and arithmetic "
    "(Weather_API.py:407-413: avg_temperature = keep | (min+max)/2 | 0).",
)
def e2_case_when_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.col("l_quantity").isNotNull() & (F.col("l_quantity") >= 30), "high"
        )
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("low")
        .alias("qty_band"),
        F.when(
            F.col("l_discount") > 0.05,
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
        )
        .otherwise(F.col("l_extendedprice"))
        .alias("effective_price"),
    )


# ---------------------------------------------------------------------------
# E3/E4/F5 — fillna + numeric coercion (try_cast)
# ---------------------------------------------------------------------------
@register(
    "e3_fill_and_coerce",
    oracle="""
    SELECT event_id, user_id,
           COALESCE(TRY_CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS INT), 0) AS k_value,
           COALESCE(value, 0.0) AS value_filled
    FROM events
    """,
    doc="Constant fillna (Weather_API.py:426,448 — incl. the intended "
    "string-'0' semantics, SURVEY §0) + pd.to_numeric(errors='coerce') "
    "as ANSI-safe try_cast (Weather_API.py:1150).",
)
def e3_fill_and_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (-?\d+)', 1)
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(k.try_cast("int"), F.lit(0)).alias("k_value"),
        F.coalesce("value", F.lit(0.0)).alias("value_filled"),
    )


# ---------------------------------------------------------------------------
# D1/D2/D5 — date parse / extract / month key
# ---------------------------------------------------------------------------
@register(
    "d2_date_roundtrip",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS date_str,
           CAST(CAST(strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS DATE) AS TIMESTAMP) AS date_parsed,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(month(o_orderdate) AS INT) AS o_month,
           strftime(o_orderdate, '%Y-%m') AS month_key
    FROM orders
    """,
    doc="ISO-string → date parse (Weather_API.py:469 to_date yyyy-MM-dd'T'HH:mm:ss), "
    "year/month extraction (:341, :913, :1037), yyyy-MM month key (:846).",
)
def d2_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    date_str = F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss")
    return o.select(
        "o_orderkey",
        date_str.alias("date_str"),
        F.to_date(date_str, "yyyy-MM-dd'T'HH:mm:ss").cast("timestamp").alias("date_parsed"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month_key"),
    )


# ---------------------------------------------------------------------------
# A1/A4/A5 — grouped averages at several granularities
# ---------------------------------------------------------------------------
@register(
    "a1_group_multi_avg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    doc="Grouped multi-average with aliases (Weather_API.py:344-349 "
    "year×lat×lon wind averages) — partial+final hash aggregate.",
)
def a1_group_multi_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "a4_yearly_mean",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           {sql_davg('o_totalprice')} AS avg_total_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
    """,
    doc="Yearly mean (Weather_API.py:981-984 groupby(year).mean).",
)
def a4_yearly_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        davg("o_totalprice").alias("avg_total_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "a5_group_by_key_month",
    oracle=f"""
    SELECT l_returnflag, CAST(month(l_shipdate) AS INT) AS ship_month,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY 1, 2
    """,
    doc="Key×month mean (Weather_API.py:1037-1042 station×month temperature).",
)
def a5_group_by_key_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        "l_returnflag", F.month("l_shipdate").alias("ship_month")
    ).agg(
        davg("l_quantity").alias("avg_qty"),
        dsum("l_extendedprice").alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# A2/A3 — distinct & scalar count
# ---------------------------------------------------------------------------
@register(
    "a2_distinct_values",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
    doc="Category enumeration (Weather_API.py:438-440 distinct weather_type_1).",
)
def a2_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@register(
    "a3_scalar_count",
    oracle="SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem",
    doc="Full-table count (Weather_API.py:204).",
)
def a3_scalar_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


# ---------------------------------------------------------------------------
# A8 — Pearson correlation (closed form over exact sums)
# ---------------------------------------------------------------------------
CORR_SQL = f"""
    WITH s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             {sql_dec2dbl(f"SUM({sql_dec('l_quantity')})")} AS sx,
             {sql_dec2dbl(f"SUM({sql_dec('l_extendedprice')})")} AS sy,
             {sql_dec2dbl(f"SUM({sql_dec('l_quantity')} * {sql_dec('l_quantity')})")} AS sxx,
             {sql_dec2dbl(f"SUM({sql_dec('l_extendedprice')} * {sql_dec('l_extendedprice')})")} AS syy,
             {sql_dec2dbl(f"SUM({sql_dec('l_quantity')} * {sql_dec('l_extendedprice')})")} AS sxy
      FROM lineitem
    )
    SELECT (n * sxy - sx * sy) /
           NULLIF(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0.0)
           AS corr_qty_price
    FROM s
"""


@register(
    "a8_pearson_corr",
    oracle=CORR_SQL,
    doc="Pearson correlation (Weather_API.py:1171 precipitation↔temperature "
    ".corr()). Closed form over exact decimal sums so the result is "
    "bit-deterministic under any partitioning (F.corr's float accumulation "
    "is not).",
)
def a8_pearson_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    denom = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return s.select(
        ((n * sxy - sx * sy) / F.nullif(denom, F.lit(0.0))).alias("corr_qty_price")
    )


# ---------------------------------------------------------------------------
# A9 — OLS degree-1 trend (slope/intercept)
# ---------------------------------------------------------------------------
TREND_SQL = f"""
    WITH s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(year(o_orderdate)) AS DOUBLE) AS sx,
             {sql_dec2dbl(f"SUM({sql_dec('o_totalprice')})")} AS sy,
             CAST(SUM(year(o_orderdate) * year(o_orderdate)) AS DOUBLE) AS sxx,
             {sql_dec2dbl(f"SUM(year(o_orderdate) * {sql_dec('o_totalprice')})")} AS sxy
      FROM orders
    )
    SELECT (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0) AS slope,
           (sy - sx * ((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0))) / n AS intercept
    FROM s
"""


@register(
    "a9_ols_trend",
    oracle=TREND_SQL,
    doc="Linear trend y=price over x=year (Weather_API.py:987-993 "
    "np.polyfit(year, temp, 1)) in closed form from exact sums — the "
    "distributed equivalent of regr_slope/regr_intercept (SURVEY §2.5 A9) "
    "with deterministic results.",
)
def a9_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    xi = F.year("o_orderdate").cast("long")
    yv = dec("o_totalprice")
    s = o.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(xi).cast("double").alias("sx"),
        F.sum(yv).cast("double").alias("sy"),
        F.sum(xi * xi).cast("double").alias("sxx"),
        F.sum(xi * yv).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return s.select(
        slope.alias("slope"), ((sy - sx * slope) / n).alias("intercept")
    )


# ---------------------------------------------------------------------------
# F1/P2/O1 — filtered, projected, ordered series
# ---------------------------------------------------------------------------
@register(
    "o1_filtered_series",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders WHERE o_custkey = 7
    ORDER BY o_orderdate, o_orderkey
    """,
    doc="Per-entity ordered time series (Weather_API.py:522-529: "
    "filter(station==X).select(...).orderBy(Date_1)) — parameterized "
    "instead of 5 copy-pasted cells.",
)
def o1_filtered_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_custkey") == 7)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
    )


@register(
    "f3_year_filter",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem WHERE year(l_shipdate) = 2000
    """,
    doc="Year filter (Weather_API.py:913 dt.year == 2024). With the layer "
    "partitioned by year this prunes whole directories at scale.",
)
def f3_year_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.year("l_shipdate") == 2000).select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"
    )


@register(
    "o2_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Top-k preview (Weather_API.py:222 display(limit(10)) + orderBy), "
    "fully tie-broken by the unique order key. Spark executes as TakeOrdered "
    "(per-partition heap + driver merge) — no global sort.",
)
def o2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# E5 — round
# ---------------------------------------------------------------------------
@register(
    "e5_round",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(round({sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')}), 2) AS DOUBLE)
             AS disc_price_rounded
    FROM lineitem
    """,
    doc="Round to 2 decimals into a new column (Weather_API.py:483-490). "
    "Rounding is done in exact decimal arithmetic: rounding the *double* "
    "product differs between engines at .xx50 ties, decimal rounding "
    "doesn't.",
)
def e5_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(disc_price, 2).cast("double").alias("disc_price_rounded"),
    )
