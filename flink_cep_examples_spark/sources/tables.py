"""Parquet table loaders for the driver's synthetic TPC-H-ish tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_session_confs(spark: SparkSession) -> None:
    """Self-heal an externally-created SparkSession (the driver harness
    passes its own): the confs every query depends on are all
    runtime-settable. Idempotent, called from load_table."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table. Parquet → full predicate pushdown and
    column pruning from Catalyst; no schema inference needed (parquet is
    self-describing).

    ``events.ts`` is normalized to a session-UTC ``TimestampType``
    regardless of how the driver generated the parquet that round:
    TIMESTAMP(NANOS) (with ``nanosAsLong`` it arrives as int64 nanos,
    truncated here to µs exactly as DuckDB truncates) or timestamp[us]
    without tz (arrives TIMESTAMP_NTZ; a cast under the UTC session tz
    is value-preserving), keeping every downstream query
    oracle-comparable."""
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            # `ts div 1000` is integer division on the int64 nanos. A float
            # division (`/ 1000` then cast) would promote ~1.7e18 values past
            # double's 2^53 exact range and can land 1 µs off DuckDB's exact
            # integer truncation — enough to flip boundary `within` checks.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # Cast to the concrete LTZ type, not the "timestamp" alias: the
            # alias resolves via spark.sql.timestampType, so a caller setting
            # that conf to TIMESTAMP_NTZ would make the cast a silent no-op.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition to the session's default parallelism ahead of a
    CPU-heavy per-row pipeline (higher-order functions / md5 hashing
    evaluate interpreted, outside whole-stage codegen).

    Rationale: the synthetic tables arrive as one parquet row group →
    one task, which serializes interpreted compute locally. On a real
    cluster the scan has thousands of splits and this repartition is a
    cheap rebalance of raw rows — far cheaper than the compute it
    parallelizes. Results never depend on partitioning."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *key_cols) if key_cols else df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
