"""Online lexical index maintenance: stream arriving documents into a
persisted BM25 inverted index (round 15) — the streaming twin of
``queries/text.py::bm25_append_docs``, completing the ingest story the
IVF side already has (``ivf_append_vectors`` ↔ ``ann_serve_stream``).

Reference scope: the reference engine (kosmag/flink-cep-examples) has
no retrieval surface — this is north-star extension territory for the
100-TB training-data pipeline, where the corpus index must absorb
ingest continuously rather than rebuild per batch.

Exactly-once shape: foreachBatch may REPLAY a batch after a failure,
so every write is partitioned by ``batch=<id>`` FIRST and uses dynamic
partition overwrite — a replayed batch rewrites its own partitions
instead of appending duplicates (the same recipe ``ann_serve_stream``
pins). ``bm25_search_persisted`` keeps pruning on ``term_bucket``
(partition filters apply to any partition column, whatever its depth)
and SUMs the stats ledger, so streamed postings serve immediately and
exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter


def bm25_index_stream(
    spark: SparkSession,
    index_dir: str,
    doc_stream: DataFrame,
) -> DataStreamWriter:
    """Ingest a streaming DataFrame of (``doc_id``, ``text``) docs
    into the persisted index at ``index_dir``. Per micro-batch, ONE
    tokenize + (doc, term) aggregation (the build-path expression
    tree, so streamed postings are bit-identical to a rebuild's) and
    two idempotent writes into the DELTA tier (the base build's
    directories keep their own layout — base + streamed delta is the
    compact-then-absorb index design, and the serve path unions the
    two tiers):

    - postings → ``{index_dir}/postings_delta`` partitioned
      ``batch=<id>/term_bucket=<b>`` (dynamic overwrite — replay-safe,
      committed batches never rewritten);
    - ONE (n_docs, total_dl) delta row → ``{index_dir}/stats_delta``
      partitioned ``batch=<id>``.

    Returns the un-started writer so the caller owns
    trigger/checkpoint options. The index must already exist
    (``write_bm25_index`` / ``ensure_bm25_index``)."""
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.queries.text import (
        _bm25_postings_frame,
        _bm25_stats_frame,
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select("doc_id", "text")
        if docs.isEmpty():
            return
        _bm25_postings_frame(docs).withColumn(
            "batch", F.lit(batch_id)
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch", "term_bucket").parquet(
            f"{index_dir}/postings_delta"
        )
        _bm25_stats_frame(docs).withColumn(
            "batch", F.lit(batch_id)
        ).coalesce(1).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch").parquet(f"{index_dir}/stats_delta")

    return doc_stream.writeStream.outputMode("update").foreachBatch(ingest)
