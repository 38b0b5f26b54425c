"""Bucketed co-location: a fact-fact join on the bucket key must plan
with ZERO Exchange (both scans report the bucket spec; Catalyst elides
the shuffle), and produce the same rows as the shuffled join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_cep_examples_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from flink_cep_examples_spark.sources.tables import load_table


def _clean(spark, *tables):
    import shutil
    from urllib.parse import urlparse

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # an orphaned location (table dropped with a dead session)
        # blocks saveAsTable; remove it too
        loc = urlparse(warehouse).path
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    _clean(spark, "orders_b", "lineitem_b")
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8)
    write_bucketed(li, "lineitem_b", ["l_orderkey"], 8)
    yield "orders_b", "lineitem_b"
    _clean(spark, "orders_b", "lineitem_b")


@pytest.fixture
def no_broadcast(spark):
    """Force the shuffle-join path: at real scale neither fact side
    broadcasts, which is exactly the regime bucketing exists for. The
    tiny test tables would otherwise broadcast and hide the story."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _joined(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o = read_bucketed(spark, ot)
    l = read_bucketed(spark, lt)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    out = _joined(spark, bucketed_tables)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the join inputs must not shuffle — the only Exchange allowed is
    # the one for the tiny groupBy ABOVE the join
    join_part = plan.split("Join")[-1]
    assert "Exchange" not in join_part
    assert plan.count("Exchange") <= 1


def test_bucketed_join_matches_shuffled_join(spark, bucketed_tables, sf_small):
    bucketed = {
        (r.o_orderpriority, r.n) for r in _joined(spark, bucketed_tables).collect()
    }
    o = load_table(spark, sf_small, "orders")
    l = load_table(spark, sf_small, "lineitem")
    plain = {
        (r.o_orderpriority, r.n)
        for r in l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert bucketed == plain
