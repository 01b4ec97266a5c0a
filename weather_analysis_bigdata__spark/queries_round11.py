"""Round-11 batch: the streaming-operations diagnostics this round's
out-of-order work makes first-class.

- **Disorder profile** (`events_disorder_profile`): before choosing a
  watermark (the allowed-lateness bound every order-robust streaming
  operator in this engine is parameterized by — see
  streaming/order_sensitivity.py), an operator of a real pipeline
  measures how disordered the source actually is. This query computes
  the EXACT per-event lateness distribution of a delivery sequence:
  lateness = running-max(event time) over arrival order minus the
  event's own time, bucketed by decimal digit count (an exact
  string-length bucket both engines compute identically — no float
  log), with integer-ppm cumulative coverage and a `covers_p99`
  marker on the first bucket whose coverage reaches 99% — i.e. "a
  watermark of 10^k µs admits ≥99% of this traffic", the number you
  set `sessionize_stream_reorder`'s watermark (and the windowed
  operators' allowed lateness) from.

  The driver's events table is perfectly time-ordered by event_id
  (verified: zero inversions at every SF), so the query SIMULATES an
  at-least-once delivery with the repo's planted-control idiom:
  arrival position = event_id, except event_id % 17 = 5 arrives 40
  positions late (queue jitter) and event_id % 101 = 7 arrives 5000
  positions late (a retried-batch straggler class). Both engines
  derive the same plant, so the profile is deterministic and the
  hash match proves the lateness accounting end-to-end.

  Scale: one user-keyed window sort (the sessionize shuffle shape),
  one small aggregation to ≤ 14 digit-bucket rows, and a cumulative
  window over those ≤ 14 rows (bounded-O(k) single-partition window,
  the documented plan-audit exception class).

Reference parity note: the reference (Weather_API.py) has no
streaming surface — charter-extension depth on the `events` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.registry import register
from weather_analysis_bigdata__spark.sources.files import load_table

#: Planted delivery simulation: % 17 = 5 → +40 positions (jitter),
#: % 101 = 7 → +5000 positions (straggler). Shared by both engines.
_ARRIVAL_SQL = (
    "event_id + CASE WHEN event_id % 17 = 5 THEN 40 "
    "WHEN event_id % 101 = 7 THEN 5000 ELSE 0 END"
)

_P99_PPM = 990_000


@register(
    "events_disorder_profile",
    oracle=f"""
    WITH arr AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             {_ARRIVAL_SQL} AS arrival_pos
      FROM events
    ),
    late AS (
      SELECT GREATEST(
               max(ts_us) OVER (PARTITION BY user_id
                                ORDER BY arrival_pos, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - ts_us,
               0) AS lateness_us
      FROM arr
    ),
    buckets AS (
      SELECT CAST(LENGTH(CAST(lateness_us AS VARCHAR)) AS BIGINT)
               AS lateness_digits,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(*) FILTER (lateness_us > 0) AS BIGINT)
               AS n_inverted,
             CAST(MAX(lateness_us) AS BIGINT) AS max_lateness_us
      FROM late GROUP BY 1
    ),
    cum AS (
      SELECT *,
             CAST(SUM(n_events) OVER (ORDER BY lateness_digits
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_events,
             CAST(SUM(n_events) OVER () AS BIGINT) AS total_events
      FROM buckets
    )
    SELECT lateness_digits, n_events, n_inverted, max_lateness_us,
           cum_events,
           CAST(cum_events * 1000000 // total_events AS BIGINT)
             AS cum_ppm,
           (cum_events * 1000000 // total_events >= {_P99_PPM}
            AND COALESCE(LAG(cum_events * 1000000 // total_events)
                  OVER (ORDER BY lateness_digits) < {_P99_PPM}, TRUE))
             AS covers_p99
    FROM cum
    """,
    doc="EXACT lateness distribution of a (planted) at-least-once "
    "delivery of the events stream — the watermark-sizing diagnostic: "
    "per-event lateness vs the per-user running arrival-order max, "
    "bucketed by decimal digits (exact string-length bucketing, "
    "engine-identical), integer-ppm cumulative coverage, and a "
    "covers_p99 marker on the first bucket admitting >= 99% of "
    "traffic — the number the reorder sessionizer's watermark and "
    "the windowed operators' allowed lateness are set from. One "
    "user-keyed window shuffle + a <= 14-row bucket aggregate.",
)
def events_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.expr(_ARRIVAL_SQL).alias("arrival_pos"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("arrival_pos", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = e.select(
        F.greatest(
            F.max("ts_us").over(w_run) - F.col("ts_us"), F.lit(0)
        ).alias("lateness_us")
    )
    buckets = late.groupBy(
        F.length(F.col("lateness_us").cast("string"))
        .cast("long")
        .alias("lateness_digits")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("lateness_us") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_inverted"),
        F.max("lateness_us").cast("long").alias("max_lateness_us"),
    )
    # cumulative coverage over the <= 14 bucket rows: a bounded-O(k)
    # single-partition window (documented plan-audit exception class)
    w_cum = Window.orderBy("lateness_digits").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("lateness_digits").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = buckets.select(
        "*",
        F.sum("n_events").over(w_cum).cast("long").alias("cum_events"),
        F.sum("n_events").over(w_all).cast("long").alias("total_events"),
    )
    # integer division (DIV) on both engines — a double divide +
    # floor can misround exact-integer quotients (repo rule)
    ppm_int = F.expr("(cum_events * 1000000) DIV total_events").cast("long")
    prev_ppm = F.lag(ppm_int).over(Window.orderBy("lateness_digits"))
    return cum.select(
        "lateness_digits",
        "n_events",
        "n_inverted",
        "max_lateness_us",
        "cum_events",
        ppm_int.alias("cum_ppm"),
        (
            (ppm_int >= _P99_PPM)
            & F.coalesce(prev_ppm < _P99_PPM, F.lit(True))
        ).alias("covers_p99"),
    )
