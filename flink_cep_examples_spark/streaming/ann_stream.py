"""Online ANN serving: score a STREAM of query vectors against the
frozen persisted IVF index — the serve half of ``queries/ivf.py``'s
train-once machinery (``write_ivf_index`` / ``ensure_ivf_index``).

The deployment shape: a retrieval tier receives query embeddings (user
requests, recsys candidates, dedup lookups) continuously; the index is
trained offline and versioned. Every arriving micro-batch must read
ONLY its own probe lists, not the corpus.

Why ``foreachBatch`` and not a stream-static join: partition pruning
on the static side needs the probe ``cid`` set at PLAN time, but each
micro-batch's queries probe different lists — a static plan would scan
every list every batch (the 100-TB failure mode). ``foreachBatch`` is
Spark's idiomatic escape hatch for exactly this: per micro-batch the
bounded query set (qid + DIM doubles per request — the online request
load, never the corpus) is collected, its probe-cid UNION computed
driver-side over the broadcast-sized centroids, and ONE
partition-pruned batch read serves the whole batch through the SAME
:func:`~flink_cep_examples_spark.queries.ivf.ivf_search_persisted_many`
kernel the batch tier uses — so streamed results are bit-equal to
batch serving by construction (pinned by
tests/test_ann_stream.py).

Reference parity: the reference engine (kosmag/flink-cep-examples) has
no retrieval surface; this is north-star extension territory — the
Flink analogue would be an async-IO enrichment operator against an
external index service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter


def ann_serve_stream(
    spark: SparkSession,
    index_dir: str,
    query_stream: DataFrame,
    sink_path: str,
    *,
    nprobe: int | None = None,
    top_k: int | None = None,
) -> DataStreamWriter:
    """Serve a streaming DataFrame of queries (``qid`` long, ``qv``
    array<double>) off the persisted index at ``index_dir``; append
    per-query top-k rows (qid, vec_id, label, cid, cos) to
    ``sink_path`` as parquet. Returns the un-started writer so the
    caller owns trigger/checkpoint options.

    Exactly-once: foreachBatch may REPLAY a batch after a failure, so
    the write is idempotent per batch id — each replayed batch
    overwrites its own ``batch=<id>`` partition instead of appending
    duplicates (the documented foreachBatch dedup recipe).

    Duplicate-qid semantics (ADVICE r14, deliberate and now stated):

    - WITHIN a micro-batch, duplicate qids collapse to one dict entry
      (last row wins) — one answer per qid per batch, matching the
      batch serve-many contract (``ivf_search_persisted_many`` takes a
      qid-keyed dict).
    - ACROSS micro-batches, the same qid resubmitted later is served
      again under its new ``batch=`` partition — the sink as a whole
      may hold multiple result sets for one qid. Consumers reading the
      WHOLE sink must pick per qid (e.g. max ``batch`` = the freshest
      answer); readers of a single batch partition see exactly one.
    """
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.queries.ivf import (
        NPROBE,
        ivf_search_persisted_many,
    )
    from flink_cep_examples_spark.queries.similarity import TOP_K

    n_probe = NPROBE if nprobe is None else nprobe
    k = TOP_K if top_k is None else top_k

    def serve_batch(batch_df: DataFrame, batch_id: int) -> None:
        queries = {
            int(r.qid): [float(x) for x in r.qv]
            for r in batch_df.select("qid", "qv").collect()
        }
        if not queries:
            return
        out = ivf_search_persisted_many(
            spark, index_dir, queries, nprobe=n_probe, top_k=k
        ).withColumn("batch", F.lit(batch_id))
        out.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch").parquet(sink_path)

    return query_stream.writeStream.outputMode("update").foreachBatch(
        serve_batch
    )
