"""Query catalog: every operator exposed as a (spark, sf_dir) → DataFrame
callable plus (where SQL-expressible) a DuckDB oracle string.

Modules register into QUERIES / ORACLES; ``__spark_entry__.py`` re-exports
them for the driver's correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

#: Names exported to the driver's correctness gate via
#: ``__spark_entry__.queries()``. The gate records at most 50 rows (first
#: 50 in registration order), so the catalog keeps the driver set at
#: exactly 50 — one row per distinct operator family member — and marks
#: near-duplicate / shape-overlapping queries ``driver=False``. Those
#: stay in QUERIES and are still oracle-gated every run by
#: ``tests/test_oracle_extensions.py``.
DRIVER_QUERIES: list[str] = []


def register(
    name: str, fn, oracle: str | None = None, *, driver: bool = True
) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle
    if driver:
        DRIVER_QUERIES.append(name)


def load_all() -> None:
    """Import every query module (idempotent)."""
    from flink_cep_examples_spark.queries import (  # noqa: F401
        cep,
        curation,
        decontam,
        dedup,
        ivf,
        multimodal,
        packing,
        percentiles,
        pipeline,
        relational,
        relational_shapes,
        relational_tpch,
        sampling,
        similarity,
        temporal,
        text,
    )
