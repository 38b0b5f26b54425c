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
    *,
    max_delta_batches: int | None = None,
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

    ``max_delta_batches`` (round 16) arms the automatic compaction
    policy: after each ingest the batch tail calls
    ``maybe_compact_bm25``, so the delta tier stays bounded without an
    operator remembering to compact — serving is bit-equal through
    every triggered compaction (the pinned contract). ``None`` leaves
    compaction fully manual (the round-15 behavior).

    Returns the un-started writer so the caller owns
    trigger/checkpoint options. The index must already exist
    (``write_bm25_index`` / ``ensure_bm25_index``)."""
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.index_manifest import read_manifest
    from flink_cep_examples_spark.queries.text import (
        _bm25_postings_frame,
        _bm25_stats_frame,
        maybe_compact_bm25,
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select("doc_id", "text")
        if docs.isEmpty():
            return
        # absorbed-replay guard (round 16): an id in the manifest's
        # absorbed list means THIS BATCH'S CONTENT already lives in the
        # compacted base (Structured Streaming replays an epoch with
        # identical data), so the correct replay action is no write at
        # all — re-writing would double-count against the base. This is
        # what makes compaction safe to run even against a final batch
        # whose checkpoint commit didn't land. The flip side is the
        # operational contract in bm25_compact_index's docstring: an
        # index dir is married to its ingest checkpoint (a brand-new
        # checkpoint restarts ids at 0 and would be skip-guarded here —
        # use a fresh index dir or rebuild, which bumps the epoch and
        # resets absorbed).
        man = read_manifest(index_dir)
        if int(batch_id) in set(man["absorbed"]):
            return
        _bm25_postings_frame(docs).withColumn(
            "batch", F.lit(batch_id)
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch", "term_bucket").parquet(
            f"{index_dir}/postings_delta"
        )
        # the ledger row records the manifest EPOCH it was written
        # under (round 16): a rebuild racing this batch bumps the
        # epoch, and serving's epoch gate then excludes the row —
        # stale content can never serve against a fresh base
        _bm25_stats_frame(docs).withColumn(
            "batch", F.lit(batch_id)
        ).withColumn("epoch", F.lit(int(man["epoch"]))).coalesce(
            1
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch").parquet(f"{index_dir}/stats_delta")
        if max_delta_batches is not None:
            maybe_compact_bm25(
                spark, index_dir, max_delta_batches=max_delta_batches
            )

    return doc_stream.writeStream.outputMode("update").foreachBatch(ingest)
