"""Idempotent parquet sink for streaming jobs — the exactly-once-ish
landing pattern: ``foreachBatch`` + batch-id-keyed dynamic partition
overwrite. Structured Streaming guarantees at-least-once delivery of
each micro-batch to ``foreachBatch``; writing every batch into its own
``_batch_id=K`` partition with dynamic partitionOverwriteMode makes the
replay of a batch (after a crash between write and checkpoint commit)
OVERWRITE its own partition instead of appending duplicates — write ∘
write = write.

Readers see exactly-once output: ``read_idempotent`` just drops the
bookkeeping column. At scale the per-batch partition also gives
natural file-size batching and cheap retention (drop old ``_batch_id``
dirs); compact downstream if batch cadence is high.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

BATCH_COL = "_batch_id"


def write_stream_idempotent(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming write of ``df`` to ``path`` with replay-safe
    batch-partitioned parquet output."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn(BATCH_COL, F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy(BATCH_COL)
                .parquet(path)
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )

    w = df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_idempotent(spark: SparkSession, path: str) -> DataFrame:
    """Read the sink's output without the bookkeeping column."""
    return spark.read.parquet(path).drop(BATCH_COL)
