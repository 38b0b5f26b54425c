"""Streaming deduplication: the ingest-time twin of the batch dedup
catalog (queries/dedup.py). A training-data pipeline dedups records as
they arrive — state cannot grow forever, so uniqueness is enforced
within the watermark horizon via Spark's
``dropDuplicatesWithinWatermark`` (first occurrence wins; the key's
state is dropped once the watermark passes its event time + delay).

Scale notes (100 TB mindset):

- State is keyed by the dedup key only (a 32-byte md5 for content
  dedup), never the payload, and is bounded by the watermark horizon —
  at 1000 executors this is the same per-key hash state as a streaming
  aggregation, sharded by the shuffle on the key.
- Content keying hashes scan-side (JVM ``md5``), so the exchange
  carries the digest, not the document body.
- Exactly the same first-occurrence contract as batch
  ``dropDuplicates`` on the key — pinned by the agreement test
  (tests/test_streaming_dedup.py) — EXCEPT that two occurrences more
  than ``watermark_delay`` apart are both kept (state already aged
  out). That horizon is the documented streaming-dedup trade-off, not
  a bug; batch remains the global-dedup path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    event_time_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """First-occurrence exact dedup on ``key_cols`` within the
    watermark horizon."""
    return df.withWatermark(
        event_time_col, watermark_delay
    ).dropDuplicatesWithinWatermark(list(key_cols))


def dedup_content_stream(
    df: DataFrame,
    content_col: str = "text",
    event_time_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Content dedup: key = md5(content), computed scan-side so the
    dedup shuffle ships the 32-byte digest, not the payload."""
    keyed = df.withColumn("content_key", F.md5(F.col(content_col)))
    return dedup_exact_stream(
        keyed, ["content_key"], event_time_col, watermark_delay
    )
