"""Bucketed table layout: pre-shuffle once at write time so repeated
joins/aggregations on the bucket key run with NO exchange at read time
— the canonical 100 TB co-location strategy (Hive-style bucketing;
Spark's scan reports the bucket spec and Catalyst elides the shuffle
when both join sides agree on key and bucket count).

Usage shape for a training pipeline: land ``lineitem``/``orders``
bucketed by the join key once; every downstream join of the two fact
tables is then map-side (one scan each, zero Exchange), which at
100 TB removes the single largest network cost in the DAG.

Bucketed output requires the table catalog (``saveAsTable``) — plain
``.parquet(path)`` writes no bucket metadata. Tables land in the
session's warehouse dir; use a Hive/Glue/Unity catalog on a real
cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (optionally per-bucket sorted) parquet
    table. Sorting within buckets additionally enables sort-merge joins
    without a per-read sort."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (the catalog carries the bucket spec; the
    scan exposes it to the planner)."""
    return spark.table(table)
