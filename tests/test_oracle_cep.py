"""CEP queries vs DuckDB oracles on the driver's synthetic events table
(SURVEY §5 strategy #3). Three independent implementations — Spark NFA,
Spark window fast path, DuckDB closed form — must agree exactly."""

from __future__ import annotations

import pytest

from flink_cep_examples_spark.queries import QUERIES, ORACLES, load_all

from tests.oracle_harness import compare

load_all()

CEP_QUERY_NAMES = [n for n in QUERIES if n.startswith("cep_")]


@pytest.mark.parametrize("name", CEP_QUERY_NAMES)
def test_cep_query_vs_oracle(spark, sf_small, name):
    ok, msg = compare(QUERIES[name](spark, sf_small), ORACLES[name], sf_small)
    assert ok, f"{name}: {msg}"
