"""SparkSession factory.

Pins the semantics the reference depends on:
- UTC session timezone (timestamps parsed at ``ZoneOffset.ofHours(0)``,
  reference FlinkCEPExample.scala:32-37) — also required for DuckDB
  oracle comparison (duckdb timestamps are UTC-naive).
- Arrow enabled (all Python-side operators are Arrow-batched).
- AQE on: runtime coalescing + skew-join handling, the default posture
  for a 1000-executor cluster; harmless locally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink-cep-examples-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master``/``shuffle_partitions`` default from env
    (``SPARK_GRAFT_CPUS``) so tests, bench and the driver harness share
    one code path. On a real cluster, pass ``master=None`` with a
    pre-configured ``spark-submit`` and these settings are inherited.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        # driver-generated events.parquet carries TIMESTAMP(NANOS), which
        # Spark's parquet reader rejects; read as int64 nanos and convert
        # in the loader (sources/tables.py) — ns→µs truncation matches
        # DuckDB's own ns→µs handling.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
