"""Temporal-join catalog queries over the ``events`` table: as-of
attribution, interval-context range join, and a gap-filled time-bucket
rollup (hypertable-style continuous aggregate).

Scale notes (100 TB mindset):

- ``events_asof_attribution``: one Exchange on user_id (union-merge
  as-of, `operators/temporal.py`); both side filters sit on scan
  columns so parquet pushdown prunes before the shuffle.
- ``events_range_error_context``: bin-explode(≤2) + equi-join on
  (user_id, bucket) — never a per-key nested loop; the final left join
  back to purchases keys on the unique event_id (no skew).
- ``events_hourly_gapfill``: the big table shuffles once into a
  map-side-combinable agg; gap-filling then operates on the *already
  aggregated* (types × hours) frame, which is tiny at any scale, so the
  grid cross-join and left join are broadcast-sized by construction.

Oracle-exactness: DOUBLE sums go through DECIMAL(18,6) accumulators
(order-independent) and cast back to DOUBLE at the end; gaps are emitted
as integer microseconds, never float seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cep_examples_spark.operators.temporal import asof_join, range_join
from flink_cep_examples_spark.queries import register
from flink_cep_examples_spark.sources.tables import load_table


def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute each click to the user's most recent view within 1
    hour (ASOF backward join, LEFT OUTER: unattributed clicks keep
    nulls). Mirrors DuckDB ``ASOF LEFT JOIN`` + tolerance post-filter."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        "ts",
        F.col("value").alias("view_value"),
    )
    out = asof_join(
        clicks,
        views,
        on="user_id",
        left_time="ts",
        tolerance_seconds=3600,
    )
    # null-free output: nullable ints round-trip pandas as float64 and
    # nulls hash engine-dependently; -1 sentinels keep the column long
    return out.select(
        "click_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.coalesce("view_id", F.lit(-1)).alias("view_id"),
        F.coalesce("view_value", F.lit(0.0)).alias("view_value"),
        F.coalesce(
            F.unix_micros("ts") - F.unix_micros("ts_r"), F.lit(-1)
        ).alias("gap_us"),
    )


ORACLE_ASOF = """
SELECT l.click_id, l.user_id, l.click_ts,
       CASE WHEN ok THEN r.view_id ELSE -1 END AS view_id,
       CASE WHEN ok THEN r.view_value ELSE 0.0 END AS view_value,
       CASE WHEN ok THEN date_diff('microsecond', r.ts, l.click_ts)
            ELSE -1 END AS gap_us
FROM (SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT event_id AS view_id, user_id, ts, value AS view_value
                FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.click_ts >= r.ts,
LATERAL (SELECT r.ts IS NOT NULL
                AND l.click_ts - r.ts <= INTERVAL 1 HOUR AS ok) t
"""


def events_range_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: how many error events the same user produced
    within ±10 minutes (interval self-join). Purchases with no nearby
    errors are kept with a zero count."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("err_ts"), F.col("event_id").alias("err_id")
    )
    pairs = range_join(
        purchases,
        errors,
        on="user_id",
        left_time="ts",
        right_time="err_ts",
        lower_seconds=-600,
        upper_seconds=600,
    )
    counts = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_errors"),
        F.min(F.unix_micros("err_ts")).alias("first_err_us"),
    )
    return (
        purchases.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
            F.coalesce("first_err_us", F.lit(-1)).alias("first_err_us"),
        )
    )


ORACLE_RANGE = """
SELECT p.event_id, p.user_id, p.ts,
       COUNT(e.event_id) AS n_errors,
       COALESCE(MIN(epoch_us(e.ts)), -1) AS first_err_us
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
LEFT JOIN (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND e.ts >= p.ts - INTERVAL 10 MINUTE
 AND e.ts <= p.ts + INTERVAL 10 MINUTE
GROUP BY p.event_id, p.user_id, p.ts
"""


def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: per event_type, 1-hour
    buckets spanning the table's full [min, max] hour range, with empty
    buckets materialized as n_events=0 / sum_value=null (gap-fill)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    return grid.join(F.broadcast(agg), ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


# DuckDB 1.0 generate_series takes only constants, so the oracle builds
# the hour grid from a constant integer range (1 year cap) filtered to
# the table's actual [lo, hi] — same rows, constant-foldable.
ORACLE_GAPFILL = """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo,
         date_trunc('hour', MAX(ts)) AS hi
  FROM events
), grid AS (
  SELECT t.event_type, bounds.lo + to_hours(i.h) AS hour
  FROM (SELECT DISTINCT event_type FROM events) t,
       bounds,
       (SELECT unnest(range(0, 24 * 366)) AS h) i
  WHERE bounds.lo + to_hours(i.h) <= bounds.hi
), agg AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT grid.event_type, grid.hour,
       COALESCE(agg.n_events, 0) AS n_events,
       COALESCE(agg.sum_value, 0.0) AS sum_value
FROM grid LEFT JOIN agg USING (event_type, hour)
"""


def events_funnel_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase funnel: every (click, purchase) pair by the same
    user with the purchase in [click, click + 30 min] — the interval
    join (Flink ``intervalJoin``). The SAME operator drives the
    streaming twin (``streaming/joins.py``): in batch the equi-key +
    range condition plans as a sort-merge join on user_id with the
    range as residual filter (one Exchange per side, never a nested
    loop); in streaming it is Spark's watermarked stream-stream join
    with state evicted past the interval."""
    from flink_cep_examples_spark.streaming.joins import interval_join_stream

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return interval_join_stream(
        clicks,
        purchases,
        on="user_id",
        left_time="click_ts",
        right_time="purchase_ts",
        lower_seconds=0,
        upper_seconds=1800,
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias(
            "delay_us"
        ),
        "purchase_value",
    )


ORACLE_FUNNEL = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       date_diff('microsecond', c.ts, p.ts) AS delay_us,
       p.value AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'click') c
JOIN (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


register("events_asof_attribution", events_asof_attribution, ORACLE_ASOF, driver=False,  # r7 rotation: driver-verified green r3-r6; pytest-gated now
)
register(
    "events_funnel_interval_join", events_funnel_interval_join, ORACLE_FUNNEL,
    driver=False,  # r7 rotation: driver-verified green r3-r6; pytest-gated now
)
register(
    "events_range_error_context",
    events_range_error_context,
    ORACLE_RANGE,
    # r8 rotation: 5 green rounds (r3-r7), most-verified in the gate -
    # demoted to make room (COVERAGE.md policy); still pytest-oracled
    driver=False,
)
register("events_hourly_gapfill", events_hourly_gapfill, ORACLE_GAPFILL, driver=False,  # r7 rotation: driver-verified green r3-r6; pytest-gated now
)
