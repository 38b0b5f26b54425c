"""The remaining TPC-H plan shapes (Q2 Q7 Q8 Q9 Q11 Q13 Q15 Q16 Q20
Q21), completing all 22 archetypes in the catalog (with relational.py:
Q1/3/5/10/12/14/18/19 and relational_shapes.py: Q4/6/17/22).

The driver's star schema has no ``partsupp`` and no comment columns,
so the part-supplier queries (Q2/11/16/20) use the (l_partkey,
l_suppkey) pairs observed in ``lineitem`` as the part-supplier
relation and Q21 derives lateness from ``l_shipdate - o_orderdate``
— each adaptation keeps the ORIGINAL query's plan shape (the thing
being pinned): correlated min, two-sided nation join, conditional
market share, outer-join distribution, scalar-max view, distinct
count with anti-join exclusion, nested semi-joins, and the
double-correlated EXISTS / NOT EXISTS.

Scale design notes (100 TB mindset), matching relational.py:

- fixed-cardinality dims (nation 25, region 5) carry explicit
  ``broadcast()`` hints; SF-scaling dims (part/supplier/customer and
  their filtered subsets) carry NO hint — AQE picks broadcast vs
  shuffled-hash from runtime sizes, so the plan survives SF ≈ 10⁵
  where a forced broadcast of a 150k×SF-row dim would OOM;
- per-group → global "best/threshold" values are one-row aggregates
  crossJoined back broadcast (Q11/Q15) or per-key aggregates
  back-joined with AQE-chosen strategy (Q2), never collect();
- Q21's EXISTS / NOT EXISTS are real LeftSemi / LeftAnti joins on the
  order key with a supplier-inequality residual — the anti side is
  pre-filtered to LATE rows only before the join;
- money sums run in exact DECIMAL and cast to DOUBLE at the end
  (order-independent across Spark's partial aggregation and DuckDB's
  sequential scan); every top-k carries a unique tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cep_examples_spark.queries import register
from flink_cep_examples_spark.queries.relational import _d4
from flink_cep_examples_spark.sources.tables import load_table

_D = "decimal(24,4)"  # exact money accumulator
_R = "decimal(8,6)"  # exact rate type


def _dec(c: str):
    return F.col(c).cast(_D)


def _rev():
    return _dec("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast(_R)
    )


# ---------------------------------------------------------------- Q2 --
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted: for each LARGE-type part, the supplier(s)
    offering it at the minimum observed price (MIN l_extendedprice
    over that (part, supplier) pair), suppliers restricted to the
    EUROPE region. The correlated MIN subquery becomes a per-part
    aggregate back-joined onto the offers (AQE-chosen strategy —
    ``best`` scales with |part|, so no forced broadcast)."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "LARGE")
        .select("p_partkey", "p_type")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    offers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("offer"))
    )
    best = offers.groupBy("p_partkey").agg(F.min("offer").alias("best"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    euro_supp = (
        supp.join(
            F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    return (
        offers.join(best, "p_partkey")
        .filter(F.col("offer") == F.col("best"))
        .join(euro_supp, offers.l_suppkey == euro_supp.s_suppkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "offer")
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(20)
    )


ORACLE_Q2 = """
WITH offers AS (
  SELECT p_partkey, l_suppkey, MIN(l_extendedprice) AS offer
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'LARGE'
  GROUP BY p_partkey, l_suppkey
), best AS (
  SELECT p_partkey, MIN(offer) AS best FROM offers GROUP BY p_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, offer
FROM offers
JOIN best USING (p_partkey)
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE offer = best AND r_name = 'EUROPE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


# ---------------------------------------------------------------- Q7 --
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between two nations (either
    direction), by supplier nation / customer nation / ship year."""
    n1, n2 = "NATION_1", "NATION_2"
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.filter(F.col("n_name").isin(n1, n2))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.filter(F.col("n_name").isin(n1, n2))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(_d4(F.sum(_rev())).alias("revenue"))
    )


ORACLE_Q7 = """
SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS INT) AS l_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------- Q8 --
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of PROMO-part revenue sold to ASIA
    customers, per order year — conditional-sum ratio over one
    aggregate pass."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    asia_cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    vol = _rev()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(asia_cust, orders.o_custkey == asia_cust.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                _d4(
                    F.sum(
                        F.when(
                            F.col("supp_nation") == "NATION_3", vol
                        ).otherwise(F.lit(0).cast(_D))
                    )
                )
                / _d4(F.sum(vol))
            ).alias("mkt_share")
        )
    )


ORACLE_Q8 = """
SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                     THEN CAST(l_extendedprice AS DECIMAL(24,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,6)))
                     ELSE CAST(0 AS DECIMAL(24,4)) END), 4) AS DOUBLE)
       / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                  * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE)
         AS mkt_share
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n1.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------- Q9 --
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: profit on red parts by supplier nation and
    order year; the missing ps_supplycost becomes 10% of
    p_retailprice × quantity. Revenue and cost accumulate as separate
    exact DECIMAL sums, combined in DOUBLE at the end."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    cost = _dec("p_retailprice") * F.col("l_quantity").cast(_D)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                _d4(F.sum(_rev()))
                - F.lit(0.1) * _d4(F.sum(cost))
            ).alias("sum_profit")
        )
    )


ORACLE_Q9 = """
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE)
       - 0.1 * CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(24,4))
                        * CAST(l_quantity AS DECIMAL(24,4))), 4) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------- Q11 --
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: per-part sales value for NATION_9 suppliers,
    keeping parts whose value exceeds 0.0005 of the nation's total —
    group-vs-global-scalar shape (one-row aggregate crossJoined back,
    no collect)."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_9"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    national = li.join(supp, li.l_suppkey == supp.s_suppkey)
    per_part = national.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice")).alias("value_dec")
    )
    total = national.agg(
        F.sum(_dec("l_extendedprice")).alias("total_dec")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double")
            > F.lit(0.0005) * F.col("total_dec").cast("double")
        )
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("value")
        )
    )


ORACLE_Q11 = """
WITH national AS (
  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(24,4)) AS price
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_9'
), total AS (
  SELECT CAST(SUM(price) AS DOUBLE) AS total FROM national
)
SELECT l_partkey, CAST(SUM(price) AS DOUBLE) AS value
FROM national, total
GROUP BY l_partkey, total
HAVING CAST(SUM(price) AS DOUBLE) > 0.0005 * total
"""


# --------------------------------------------------------------- Q13 --
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts (non-urgent
    orders only), customers with zero orders included — LEFT OUTER
    join with an ON-clause filter, then two aggregation levels."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------- Q15 --
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum Q1-1996 revenue — the
    revenue view + scalar MAX subquery, as a per-supplier aggregate
    and a one-row MAX crossJoined back broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        _d4(F.sum(_rev())).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                  * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# --------------------------------------------------------------- Q16 --
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct suppliers per (brand, type, size)
    for small sizes, excluding Brand#1 / PROMO parts and
    negative-balance suppliers (the "complaints" stand-in) via a
    LeftAnti join — distinct-count + exclusion shape."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 10)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(
            bad_supp,
            li.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size <= 10
  AND NOT EXISTS (
    SELECT 1 FROM supplier
    WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------- Q20 --
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: NATION_9 suppliers who shipped more than 30
    units of some small* part during 1996 — nested semi-join chain
    (part filter → per-(supplier, part) quantity threshold → supplier
    semi-join)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_9"
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


ORACLE_Q20 = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_9'
  AND EXISTS (
    SELECT 1
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_suppkey = s_suppkey
      AND p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_partkey
    HAVING SUM(l_quantity) > 30)
"""


# --------------------------------------------------------------- Q21 --
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted: NATION_9 suppliers who were the ONLY late
    shipper (l_shipdate > o_orderdate + 90 days) on a finished
    multi-supplier order. The double correlation is two real joins on
    the order key with a supplier-inequality residual: LeftSemi
    against all other-supplier rows, LeftAnti against other-supplier
    LATE rows."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    ).select("l_orderkey", "l_suppkey")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_9"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    l1 = late.join(
        supp, late.l_suppkey == supp.s_suppkey
    ).select("l_orderkey", "l_suppkey", "s_name")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            l2,
            (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == l3.o3) & (l1.l_suppkey != l3.s3),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


ORACLE_Q21 = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_9'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


register(
    "q2_min_cost_supplier", q2_min_cost_supplier, ORACLE_Q2,
    driver=False,  # r6 rotation: driver-verified green r4.2+r5; pytest-gated
)
register(
    "q7_volume_shipping", q7_volume_shipping, ORACLE_Q7,
    driver=False,  # r10 rotation: most-verified (green r5-r9); demoted
    # for cep_group_nested3 — stays pytest-oracled every run
)
register(
    "q8_market_share", q8_market_share, ORACLE_Q8,
    driver=False,  # r8 rotation: 3 green rounds (r5-r7) — demoted to
    # make room for cep_group_nested (COVERAGE.md policy)
)
register(
    "q9_product_type_profit", q9_product_type_profit, ORACLE_Q9,
    driver=False,  # r8 rotation: 3 green rounds (r5-r7) — demoted to
    # make room for docs_segment_dedup (COVERAGE.md policy)
)
register("q11_important_stock", q11_important_stock, ORACLE_Q11,
         driver=False)  # r13 rotation: 8 green rounds (r5-r12); pytest-gated
register(
    "q13_order_count_distribution",
    q13_order_count_distribution,
    ORACLE_Q13,
    driver=False,  # r6 rotation: driver-verified green r4.2+r5; pytest-gated
)
register("q15_top_supplier", q15_top_supplier, ORACLE_Q15,
         driver=False)  # r13 rotation: 8 green rounds (r5-r12); pytest-gated
register(
    "q16_supplier_part_counts", q16_supplier_part_counts, ORACLE_Q16,
    driver=False,  # r13 rotation: 8 green rounds (r5-r12); pytest-gated now
)
register(
    "q20_part_promotion_suppliers",
    q20_part_promotion_suppliers,
    ORACLE_Q20,
    driver=False,  # r12 rotation: 7 green rounds (r5-r11), most-
    # verified — demoted for cep_group_alt_agg (COVERAGE.md policy)
)
register(
    "q21_waiting_suppliers", q21_waiting_suppliers, ORACLE_Q21,
    driver=False,  # r7 rotation: driver-verified green r4/r5/r6; pytest-gated now
)
