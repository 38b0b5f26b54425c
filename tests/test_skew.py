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
