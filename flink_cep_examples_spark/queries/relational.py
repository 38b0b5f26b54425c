"""Relational query catalog over the driver's synthetic TPC-H-ish star
schema (SURVEY.md §7 milestone 6 — "thin engine surface": these are pure
Spark SQL plans, present so the engine's relational capabilities are
pinned by DuckDB oracles and benchmarked at scale).

Scale design notes (100 TB mindset):

- Join strategy: ``broadcast()`` hints are applied ONLY to
  fixed-cardinality sides — ``nation``/``region`` (25/5 rows at every
  SF) and one-row scalar aggregates. ``customer``/``supplier``/``part``
  scale linearly with SF (150k/10k/200k × SF): at warehouse scale
  (SF ≈ 10⁵ for the 100 TB target) a forced broadcast of customer is
  billions of rows — a guaranteed broadcast-OOM — so those joins carry
  NO hint and AQE picks broadcast vs shuffled-hash from runtime sizes
  (it still broadcasts them at small SF; the plan is scale-safe either
  way). ``tests/test_plans.py`` audits exactly this invariant.
- Filters are applied directly on the scan columns (no UDFs) so Catalyst
  pushes them into the parquet reader (check: ``PushedFilters`` in
  ``.explain``), and only referenced columns are read (``ReadSchema``).
- Aggregates run map-side partial first (Spark's default hash aggregate)
  — the shuffle carries pre-combined partials, not raw rows.
- Top-k uses ``ORDER BY ... LIMIT k`` which Spark executes as
  ``TakeOrderedAndProject`` (per-partition heap + driver merge of k
  rows), not a global sort.

Oracle-exactness: money/value aggregates are computed in DECIMAL (exact,
order-independent) and cast to DOUBLE at the end, so Spark's parallel
partial aggregation and DuckDB's sequential one produce bit-identical
doubles. Every top-k has a unique-key tiebreak so LIMIT is
deterministic. Timestamps are emitted as formatted strings (UTC both
sides — session.py pins ``spark.sql.session.timeZone=UTC``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cep_examples_spark.queries import register
from flink_cep_examples_spark.sources.tables import load_table

_D = "decimal(14,4)"  # exact money type: keeps every decimal product precision <= 38 (no Spark precision-loss rounding)
_R = "decimal(8,6)"  # exact rate type (discount, tax)


def _dec(c: str):
    return F.col(c).cast(_D)


def _d4(sum_col):
    """Exact decimal aggregate → hash-stable DOUBLE: round to scale 4
    FIRST, so the decimal→double conversion's scaled integer fits in
    2^53 on both engines. DuckDB's wide DECIMAL(38,s≥10)→DOUBLE cast
    is not correctly rounded (hugeint→double, then a divide) — it
    flipped q1's sum_charge by 1 ulp at sf0.01 — while Spark's is;
    at scale 4 both conversions are exact, and ROUND-half-away
    matches between the engines (verified bitwise, round 6). Every
    oracle mirrors with CAST(ROUND(SUM(…), 4) AS DOUBLE)."""
    return F.round(sum_col, 4).cast("double")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adapted: pricing summary for shipped lineitems.

    Capability parity target: grouped aggregation with multiple
    aggregates (reference has none — north-star extension per
    SURVEY.md §2.2 note / §7 M6)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_discount").cast(_R)
    tax = F.col("l_tax").cast(_R)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            _d4(
                F.sum(_dec("l_extendedprice") * (F.lit(1) - disc))
            ).alias("sum_disc_price"),
            _d4(
                F.sum(
                    _dec("l_extendedprice")
                    * (F.lit(1) - disc)
                    * (F.lit(1) + tax)
                )
            ).alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                * (1 - CAST(l_discount AS DECIMAL(8,6)))
                * (1 + CAST(l_tax AS DECIMAL(8,6)))), 4) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adapted: top-10 open BUILDING-segment orders by pending
    revenue. Demonstrates fact-fact join + AQE-chosen dim join +
    TakeOrdered."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-03-15")
    )
    disc = F.col("l_discount").cast(_R)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _d4(
                F.sum(_dec("l_extendedprice") * (F.lit(1) - disc))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_Q3 = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '2000-03-15'
  AND l_shipdate > TIMESTAMP '2000-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 adapted: revenue by region where customer and supplier
    share a nation. Six-way join; fixed dims (nation/region) broadcast,
    SF-scaling dims (customer/supplier) AQE-chosen."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    disc = F.col("l_discount").cast(_R)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _d4(
                F.sum(_dec("l_extendedprice") * (F.lit(1) - disc))
            ).alias("revenue")
        )
    )


ORACLE_Q5 = """
SELECT r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 adapted: top-20 customers by revenue lost to returns."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    disc = F.col("l_discount").cast(_R)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            _d4(
                F.sum(_dec("l_extendedprice") * (F.lit(1) - disc))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, n_name, c_acctbal,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def customer_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: each customer's top-3 orders by total price
    (row_number with unique tiebreak), with running spend (lag-style
    frame). Covers the rank/lag/frames surface SURVEY.md §2.2 lists as
    out-of-reference but engine-provided."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rnk"),
            F.sum(F.col("o_totalprice").cast(_D))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            .alias("running_spend"),
        )
        .filter(F.col("rnk") <= 3)
    )


ORACLE_RANKS = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk, running_spend
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER w AS rnk,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(24,4))) OVER
              (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
) t
WHERE rnk <= 3
"""


def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation on the event stream table — the
    batch twin of the streaming windowed agg (same ``window()`` op runs
    under Structured Streaming with a watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_D)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ORACLE_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(24,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) 1-hour windows every 15 minutes per
    event_type — the third standard window type (Flink's
    ``SlidingEventTimeWindows``) next to tumbling and session. Each
    event lands in exactly size/slide = 4 windows; Spark's ``window``
    with a slide does the replication inside the aggregation operator
    (map-side combined), so the shuffle carries pre-aggregated
    (window, type) partials, not 4× the events. The same expression
    runs under Structured Streaming
    (streaming/analytics.py::sliding_counts_stream)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )


#: DuckDB twin: replicate each event into the 4 window starts
#: s = time_bucket(15min) - k*15min, k in 0..3 — exactly the windows
#: with s <= ts < s + 1h on the 15-minute grid.
ORACLE_SLIDING = """
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events
FROM (
  SELECT event_type,
         unnest([time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE
                 FOR k IN range(0, 4)]) AS ws
  FROM events)
GROUP BY 1, 2
"""


def events_rolling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour rolling aggregate per user — the
    time-RANGE window frame (``RANGE BETWEEN INTERVAL PRECEDING AND
    CURRENT ROW``), the remaining standard window-frame family next to
    ROWS frames and tumbling/sliding/session groups. Frame bounds are
    exact µs integers; the rolling SUM goes through DECIMAL so the
    incremental frame arithmetic is order-independent and bit-identical
    to the oracle's.

    Scale shape: one shuffle (hash by user), per-partition sort, then a
    single forward sweep with an O(1) sliding frame — no self-join, no
    explode; the classic windowed-aggregation plan."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast(_D)).over(w).cast("double").alias(
            "sum_trailing_1h"
        ),
    )


ORACLE_ROLLING = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(value AS DECIMAL(24,4))) OVER w AS DOUBLE)
         AS sum_trailing_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
"""


def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via Spark's
    native ``session_window``; the oracle derives sessions independently
    with a lag/cumulative-sum reformulation — two different algorithms,
    one answer."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


ORACLE_SESSIONS = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_id
"""


def priority_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-of-aggregate: each order priority's share of total
    spend — a groupBy feeding a window over the aggregate output (tiny:
    5 rows after the first agg, so the window stage is trivial)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.sum(_dec("o_totalprice")).alias("spend_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    total = Window.partitionBy()
    return agg.select(
        "o_orderpriority",
        F.col("spend_dec").cast("double").alias("spend"),
        "n_orders",
        (
            F.col("spend_dec").cast("double")
            / F.sum("spend_dec").over(total).cast("double")
        ).alias("share"),
    )


ORACLE_SHARE = """
WITH agg AS (
  SELECT o_orderpriority,
         SUM(CAST(o_totalprice AS DECIMAL(24,4))) AS spend_dec,
         COUNT(*) AS n_orders
  FROM orders
  GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(spend_dec AS DOUBLE) AS spend,
       n_orders,
       CAST(spend_dec AS DOUBLE) / CAST(SUM(spend_dec) OVER () AS DOUBLE) AS share
FROM agg
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-function surface: parse the ``props`` JSON column with a
    typed ``from_json`` schema (not schema inference — the engine's
    fixed-schema philosophy, SURVEY §1.4) and aggregate the extracted
    field per event type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_JSON = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(props ->> 'k' AS BIGINT)) AS min_k,
       MAX(CAST(props ->> 'k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


register(
    "q1_pricing_summary", q1_pricing_summary, ORACLE_Q1,
    driver=False,  # r7 rotation: driver-verified green r1/r2/r3/r6 (incl. the _d4 ROUND change in r6); pytest-gated now
)
register(
    "events_json_props", events_json_props, ORACLE_JSON,
    driver=False,  # r6 rotation: driver-verified green r4+r5; pytest-gated
)
register("q3_top_unshipped_orders", q3_top_unshipped_orders, ORACLE_Q3, driver=False,  # r4 rotation: driver-verified green in r2+r3; pytest-gated now
)
register("q5_regional_revenue", q5_regional_revenue, ORACLE_Q5, driver=False,  # r4 rotation: driver-verified green in r2+r3; pytest-gated now
)
register(
    "q10_returned_revenue", q10_returned_revenue, ORACLE_Q10,
    driver=False,  # r7 rotation: driver-verified green r1/r2/r4/r5/r6; pytest-gated now
)
register(
    "customer_order_ranks", customer_order_ranks, ORACLE_RANKS,
    driver=False,  # r5 rotation: driver-verified green r3+r4; pytest-gated now
)
register("events_hourly_by_type", events_hourly_by_type, ORACLE_HOURLY, driver=False,  # r4 rotation: driver-verified green in r2+r3; pytest-gated now
)
register(
    "events_sliding_counts", events_sliding_counts, ORACLE_SLIDING,
    driver=False,  # r6 rotation: driver-verified green r4+r5; pytest-gated
)
register(
    "events_rolling_value", events_rolling_value, ORACLE_ROLLING,
    driver=False,  # r6 rotation: driver-verified green r4+r5; pytest-gated
)
register("events_sessions", events_sessions, ORACLE_SESSIONS, driver=False,  # r5.2 rotation: driver-verified green r3+r4; pytest-gated now
)
register(
    "priority_share", priority_share, ORACLE_SHARE,
    driver=False,  # r6 rotation: driver-verified green r4+r5; pytest-gated
)


# ---------------------------------------------------------------------------
# Round 4: four more TPC-H-shaped plans, each a distinct plan pattern
# (adapted to the driver schema — no commit/receipt dates or shipmode).
# ---------------------------------------------------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 adapted: share of revenue from PROMO parts in one
    month. Plan pattern: fact scan with a pushed date-range filter,
    AQE-chosen part join, single scalar aggregate with a conditional
    numerator (map-side combinable)."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    disc = F.col("l_discount").cast(_R)
    rev = _dec("l_extendedprice") * (F.lit(1) - disc)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-02-01"))
        )
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * _d4(
                    F.sum(
                        F.when(F.col("p_type") == "PROMO", rev).otherwise(
                            F.lit(0).cast(_D)
                        )
                    )
                )
                / _d4(F.sum(rev))
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_Q14 = """
SELECT 100.0
       * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(14,4))
                            * (1 - CAST(l_discount AS DECIMAL(8,6)))
                       ELSE CAST(0 AS DECIMAL(14,4)) END), 4) AS DOUBLE)
       / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,4))
                  * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-02-01'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 adapted: customers with any order whose total quantity
    exceeds a threshold. Plan pattern: pre-aggregate the fact on the
    join key FIRST (HAVING pushes the heavy groupBy below the joins,
    shrinking the join input to qualifying orders only), then join
    orders + customer (AQE-chosen strategy), top-k by total price."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 55)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


ORACLE_Q18 = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING total_qty > 55
)
SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice AS totalprice, total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, o_orderkey ASC
LIMIT 20
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adapted: revenue from three OR'd brand/size/quantity
    bands. Plan pattern: a disjunctive join-filter — the per-band
    conjuncts reference both sides, so they evaluate post-join, but the
    OR of the part-side prefixes (brand/size) and the lineitem-side
    quantity bounds still push to the scans; AQE-chosen part join."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    disc = F.col("l_discount").cast(_R)
    qty = F.col("l_quantity")
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & (F.col("p_size").between(1, 10))
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & (F.col("p_size").between(1, 15))
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & (F.col("p_size").between(1, 25))
            & qty.between(20, 30)
        )
    )
    return (
        li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(
            _d4(
                F.sum(_dec("l_extendedprice") * (F.lit(1) - disc))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q19 = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,4))
               * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 20 AND 30)
"""


def q12_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no shipmode column): per order-priority
    class, how many orders shipped late (> 30 days after the order
    date) vs on time. Plan pattern: fact-fact equi-join (lineitem x
    orders, both shuffled on the order key), conditional counts via
    datediff — a date-arithmetic conditional aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 30
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.when(urgent, F.lit("high")).otherwise(F.lit("low")).alias(
                "priority_class"
            )
        )
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_items"),
            F.sum(F.when(~late, 1).otherwise(0)).alias("ontime_items"),
        )
        .orderBy("priority_class")
    )


ORACLE_Q12 = """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'high' ELSE 'low' END AS priority_class,
       CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 30
                THEN 1 ELSE 0 END) AS BIGINT) AS late_items,
       CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 30
                THEN 0 ELSE 1 END) AS BIGINT) AS ontime_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


register(
    "q14_promo_revenue", q14_promo_revenue, ORACLE_Q14,
    driver=False,  # r13 rotation: 8 green rounds (r5-r12); pytest-gated now
)
register(
    "q18_large_orders", q18_large_orders, ORACLE_Q18,
    driver=False,  # r13 rotation: 8 green rounds (r5-r12); pytest-gated now
)
register(
    "q19_disjunctive_revenue", q19_disjunctive_revenue, ORACLE_Q19,
    # r12 rotation: 7 green rounds (r5-r11), most-verified — demoted
    # for cep_group_alt_mixed_agg (COVERAGE.md policy)
    driver=False,
)
register(
    "q12_priority_late_ship", q12_priority_late_ship, ORACLE_Q12,
    # r14 rotation: driver-verified green r6-r13; pytest-gated now
    driver=False,
)
