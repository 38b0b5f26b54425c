"""Relational join/aggregate shapes the base catalog lacks: semi-join
(EXISTS), anti-join (NOT EXISTS) with a scalar subquery, scalar
single-row aggregation, and a per-group-average correlated join —
the remaining TPC-H query archetypes (Q4 / Q22 / Q6 / Q17 adapted to
the driver's synthetic star schema).

Scale design notes (100 TB mindset):

- The semi/anti joins keep the *orders*/*customer* side intact and
  join ``lineitem``/``orders`` as the probe: Spark plans LeftSemi /
  LeftAnti, which deduplicates the probe side during the build and
  never materializes the (potentially huge) inner match multiplicity.
- The Q22 scalar threshold is a one-row aggregate crossJoin(broadcast)
  — no collect(), no second scan of customer.
- Q17's per-part average is a map-side-combinable groupBy on the
  (already brand-filtered) lineitem subset, then an AQE-chosen
  back-join (``qlim`` scales with |part| — no forced broadcast); the
  big table shuffles once on l_partkey.
- Filters sit directly on scan columns (parquet pushdown); sums that
  feed cross-engine hash comparison go through exact DECIMAL.

Oracle-exactness notes: ``l_quantity`` is integral (verified ≤ 50) so
double sums/avgs over it are exact in any order; money columns always
aggregate as DECIMAL and cast to DOUBLE at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cep_examples_spark.queries import register
from flink_cep_examples_spark.sources.tables import load_table

_D = "decimal(24,4)"  # exact money accumulator (matches relational.py)
_R = "decimal(8,6)"  # exact rate type


def q4_late_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted: per-priority count of first-half-1996 orders
    with at least one lineitem shipped more than 60 days after the
    order date. EXISTS → LeftSemi join; the lineitem side is pruned to
    two columns and the match multiplicity never materializes."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


ORACLE_Q4 = """
SELECT o_orderpriority, COUNT(*) AS n_late_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 adapted: scalar (single-row) aggregate — forecast
    revenue delta from 1996 shipments in a discount band with small
    quantities. Every predicate sits on a scan column, so the parquet
    reader receives all four pushed filters and the aggregate sees only
    qualifying rows; the shuffle is one pre-combined partial row per
    task."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(_D) * F.col("l_discount").cast(_R))
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


ORACLE_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
              * CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE) AS revenue_delta,
       COUNT(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 adapted: average yearly revenue lost if Brand#4
    orders below half their part's average quantity were dropped.
    The correlated scalar subquery (per-part AVG) becomes an explicit
    aggregate + AQE-chosen back-join (``qlim`` scales with |part|); ``l_quantity`` is integral so the
    double AVG is order-independent and exact in both engines."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#4"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(
        part, li.l_partkey == part.p_partkey
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    qlim = branded.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qlim")
    )
    return (
        branded.join(qlim, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qlim"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_D)).cast("double") / 7.0)
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


ORACLE_Q17 = """
WITH branded AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#4'
), qlim AS (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS qlim
  FROM branded GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_small
FROM branded JOIN qlim USING (l_partkey)
WHERE l_quantity < qlim
"""


def q22_quiet_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: per-segment count + balance of customers with
    above-average (positive-balance average) account balance and no
    order over 300k. NOT EXISTS → LeftAnti against the *filtered*
    orders probe (big-ticket orders only — tiny after pushdown); the
    global threshold is a one-row broadcast crossJoin, not a collect."""
    cust = load_table(spark, sf_dir, "customer")
    thr = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(_D)).cast("double") / F.count(F.lit(1)))
            .alias("thr")
        )
    )
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast(_D)).cast("double").alias("total_bal"),
        )
    )


ORACLE_Q22 = """
WITH thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(24,4))) AS DOUBLE) / COUNT(*) AS thr
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(24,4))) AS DOUBLE) AS total_bal
FROM customer, thr
WHERE c_acctbal > thr
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY c_mktsegment
"""


register("q4_late_order_counts", q4_late_order_counts, ORACLE_Q4, driver=False,  # r5.2 rotation: driver-verified green r3+r4; pytest-gated now
)
register("q6_revenue_delta", q6_revenue_delta, ORACLE_Q6, driver=False,  # r5.2 rotation: driver-verified green r3+r4; pytest-gated now
)
register("q17_small_quantity_revenue", q17_small_quantity_revenue, ORACLE_Q17, driver=False,  # r7 rotation: driver-verified green r3-r6; pytest-gated now
)
register("q22_quiet_rich_customers", q22_quiet_rich_customers, ORACLE_Q22, driver=False,  # r7 rotation: driver-verified green r3-r6; pytest-gated now
)
