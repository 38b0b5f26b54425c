"""Salted aggregation must be row-identical to the direct groupBy, and
its plan must show the two-phase shape (two Exchanges: salted shard,
then key)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_cep_examples_spark.operators.skew import salted_agg
from flink_cep_examples_spark.sources.tables import load_table


def test_salted_agg_equals_direct(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    aggs = {
        "n_events": ("count", F.lit(1)),
        "sum_value": ("sum", F.col("value").cast("decimal(14,4)")),
        "min_ts": ("min", F.col("ts")),
        "max_ts": ("max", F.col("ts")),
    }
    salted = salted_agg(ev, ["user_id"], aggs, salt=8)
    direct = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(14,4)")).alias("sum_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    s = sorted(map(tuple, salted.collect()))
    d = sorted(map(tuple, direct.collect()))
    assert s == d


def test_salted_agg_rejects_non_decomposable(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(ev, ["user_id"], {"a": ("avg", F.col("value"))})


@pytest.fixture()
def _skew_confs(spark):
    """Tighten AQE's skew thresholds so a test-sized hot key trips the
    same OptimizeSkewedJoin rule that fires at 100 TB, then restore."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark, _skew_confs):
    """One hot key holding ~99% of the fact rows: AQE must mark the
    sort-merge join skew=true (hot partition split at runtime) and the
    result must still be exact."""
    from pyspark.sql import Row

    n_hot, n_cold = 40_000, 400
    fact = spark.range(n_hot + n_cold).select(
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise((F.col("id") % 37) + 1)
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )
    dim = spark.createDataFrame(
        [Row(k=i, label=f"label-{i}") for i in range(38)]
    )
    # keep the wide payload live through the join: column pruning would
    # otherwise shrink the hot partition below the (test-sized) threshold
    joined = fact.join(dim, "k").groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.max("payload").alias("max_payload")
    )
    got = {r["label"]: r["n"] for r in joined.collect()}
    assert got["label-0"] == n_hot
    assert sum(got.values()) == n_hot + n_cold
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan
